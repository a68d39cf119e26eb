package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join: pair each point with every interval containing it
  * (`start <= point <= end`, per join key).
  *
  * Scale design — binned equi-join, not an inequality join: Spark
  * plans a bare `l.key = r.key AND point BETWEEN start AND end` as a
  * sort-merge on the key followed by a per-key quadratic filter (or,
  * keyless, a broadcast nested loop). Quantizing the domain into
  * fixed-width bins turns containment into equality: an interval owns
  * every bin it overlaps (explode), a point lives in exactly one bin,
  * and the join runs on (key, bin) through the normal hash-shuffle
  * machinery — candidate pairs are only those sharing a bin, refined
  * by the exact BETWEEN. With binWidth ~ typical interval length,
  * intervals explode to ~2 bins each and per-bin occupancy stays
  * bounded as data grows; this is the same trick Spark's own
  * storage-partitioned range joins and Sedona's spatial joins use.
  */
object RangeJoin {

  /** Inner point-in-interval join on a numeric (long) domain.
    *
    * `points` and `intervals` must share ONLY the `keys` columns; all
    * other column names must be disjoint (both sides' columns survive
    * into the output).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty, s"non-key columns must be disjoint, got: $overlap")
    def bin(c: Column): Column = floor(c / binWidth)
    val p = points.withColumn("_graft_bin", bin(col(pointCol)))
    val iv = intervals
      .withColumn("_graft_bin",
        explode(sequence(bin(col(startCol)), bin(greatest(col(endCol), col(startCol))))))
    p.join(iv, keys :+ "_graft_bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_graft_bin")
  }

  /** Inner interval-OVERLAP join on a numeric (long) domain: pair
    * every left interval with every right interval it overlaps
    * (`lStart <= rEnd AND rStart <= lEnd`, closed ends, per key) —
    * the genomics/time-range workhorse the point-in-interval join
    * can't express.
    *
    * Scale design — same binned equi-join, both sides exploded: each
    * interval owns every bin it touches, candidates are pairs sharing
    * a bin, refined by the exact overlap predicate. A pair of
    * overlapping intervals shares EVERY bin their intersection
    * touches, so to emit each pair exactly once the join keeps only
    * the bin containing the overlap's start (`greatest(lStart,
    * rStart)`) — that bin is inside both intervals by definition, so
    * dedup is a filter, not a distinct (no second shuffle). With
    * binWidth ~ typical interval length each side explodes to ~2
    * bins; per-bin occupancy, not corpus size, bounds the quadratic
    * term.
    *
    * `left` and `right` must share ONLY the `keys` columns.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lStartCol: String, lEndCol: String,
      rStartCol: String, rEndCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(overlap.isEmpty, s"non-key columns must be disjoint, got: $overlap")
    def bin(c: Column): Column = floor(c / binWidth)
    def explodeBins(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("_graft_bin",
        explode(sequence(bin(col(s)), bin(greatest(col(e), col(s))))))
    val l = explodeBins(left, lStartCol, lEndCol)
    val r = explodeBins(right, rStartCol, rEndCol)
    l.join(r, keys :+ "_graft_bin")
      .filter(col(lStartCol) <= col(rEndCol) && col(rStartCol) <= col(lEndCol))
      .filter(col("_graft_bin") === bin(greatest(col(lStartCol), col(rStartCol))))
      .drop("_graft_bin")
  }
}
