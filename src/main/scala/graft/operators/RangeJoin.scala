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
}
