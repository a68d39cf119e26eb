package graft.operators

import graft.functions.{toColumn, toExpr}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join pruning — the runtime-filter pattern made
  * an explicit operator: build a compact Bloom filter over the (small,
  * post-filter) dimension's join keys, then drop fact rows that
  * cannot match BEFORE the join's shuffle. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling
  * only the ~selectivity fraction that can survive the join: the
  * filter is a few MB regardless of fact size, ships once per
  * executor, and evaluates as a codegen'd predicate at the scan.
  *
  * False positives only cost a little extra shuffle; false negatives
  * are impossible (same xxhash64 key feeds build and probe), so the
  * exact join that follows returns exactly the plain-join result.
  *
  * Spark's own AQE injects this shape automatically in some plans
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); the explicit
  * operator covers the cases the heuristic skips and makes the prune
  * testable (reference analog: pruning the event feed against the
  * report's customer set, template.py:471-516).
  */
object BloomPrune {

  /** Serialized Bloom filter over `xxhash64(keys)` of `dim`.
    * Distributed build: partial filters per partition, OR-merged by
    * the aggregate — the driver only ever sees the final few-MB
    * bitset. Returns None for an empty dimension.
    */
  def dimBloom(dim: DataFrame, keys: Seq[String], expectedKeys: Long,
      fpp: Double): Option[Array[Byte]] = {
    val numBits = BloomFilter.optimalNumOfBits(expectedKeys, fpp)
    val hashed = toExpr(xxhash64(keys.map(col): _*))
    val agg = new BloomFilterAggregate(hashed, Literal(expectedKeys), Literal(numBits))
    Option(dim.select(toColumn(agg.toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]]("bf"))
  }

  /** Codegen'd `might_contain` probe over the same xxhash64 key. */
  def mightContain(bloom: Array[Byte], keys: Seq[Column]): Column =
    toColumn(BloomFilterMightContain(
      Literal(bloom, BinaryType), toExpr(xxhash64(keys: _*))))

  /** Inner equi-join with the fact side Bloom-pruned before the
    * shuffle. Result is exactly `fact ⋈ dim` — the trailing join is
    * exact; the Bloom stage only sheds guaranteed non-matches early.
    */
  def prunedJoin(fact: DataFrame, factKeys: Seq[String], dim: DataFrame,
      dimKeys: Seq[String], expectedKeys: Long = 1L << 22,
      fpp: Double = 0.01): DataFrame = {
    val cond = factKeys.zip(dimKeys)
      .map { case (f, d) => fact(f) === dim(d) }
      .reduce(_ && _)
    dimBloom(dim, dimKeys, expectedKeys, fpp) match {
      case None => fact.filter(lit(false)).join(dim, cond) // empty dim ⇒ empty join
      case Some(bytes) =>
        fact.filter(mightContain(bytes, factKeys.map(fact(_)))).join(dim, cond)
    }
  }
}
