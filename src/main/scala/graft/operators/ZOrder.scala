package graft.operators

import graft.functions.ZOrderFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: lay rows out so that every file
  * holds a NARROW range of every clustering column — the
  * multi-column generalization of the reference's linear clustering
  * sort (generate_hudi_table.py:150-156,
  * `hoodie.clustering.plan.strategy.sort.columns`; Hudi and Delta
  * both offer z-order for exactly this reason). A linear sort gives
  * perfect skipping on the leading column and none on the others; the
  * Morton curve gives ~√-quality skipping on all of them, which is
  * what makes multi-predicate scans prune at 100 TB.
  *
  * Two passes: one tiny min/max aggregate (the same stats pass
  * Hudi/Delta OPTIMIZE run), then a range-repartition + local sort by
  * the codegen'd interleaved key — the standard write-amplification
  * shape of any clustering rewrite.
  */
object ZOrder {

  /** Add `_graft_z`: the Morton code of the given numeric columns,
    * each min/max-scaled to 16-bit resolution (resolution beyond
    * file-level skipping granularity buys nothing).
    */
  def withZValue(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.size <= 4, "z-order over 1..4 columns")
    val statAggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double").as(s"mn_$c"), max(col(c)).cast("double").as(s"mx_$c")))
    val row = df.agg(statAggs.head, statAggs.tail: _*).collect()(0)
    val stats = cols.zipWithIndex.map { case (c, i) =>
      // empty/all-null column: stats come back null; any constant
      // range works (every row scales to the same bucket)
      if (row.isNullAt(2 * i)) c -> (0.0, 1.0)
      else c -> (row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }.toMap
    val scaled = cols.map { c =>
      val (mn, mx) = stats(c)
      val span = if (mx > mn) mx - mn else 1.0
      floor((col(c).cast("double") - lit(mn)) / lit(span) * 65535.0).cast("int")
    }
    df.withColumn("_graft_z", ZOrderFunctions.interleaveBits(scaled))
  }

  /** Cluster into `numPartitions` z-ordered ranges (each output file
    * covers a contiguous stretch of the curve).
    */
  def cluster(df: DataFrame, cols: Seq[String], numPartitions: Int): DataFrame =
    withZValue(df, cols)
      .repartitionByRange(numPartitions, col("_graft_z"))
      .sortWithinPartitions(col("_graft_z"))
      .drop("_graft_z")
}
