package graft.operators

import graft.functions.FreqSketchFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact heavy hitters at sketch prices: Misra-Gries candidates, then
  * one verified count.
  *
  * The naive exact plan aggregates EVERY distinct value (a shuffle
  * keyed on the full domain — at 100 TB, the domain is the problem).
  * This plan: (1) one constant-memory freq_sketch pass produces <=
  * `capacity` candidates, with the mergeable-summaries guarantee that
  * every value with true share > 1/(capacity+1) survives; (2) the
  * candidate list (tiny) broadcasts back for an exact count of just
  * those values; (3) the share filter runs on exact counts. Provided
  * capacity > 1/minShare, the result is EXACTLY the heavy-hitter set
  * — the sketch only prunes the shuffle, never the answer.
  */
object HeavyHitters {

  def frequent(
      df: DataFrame,
      valueCol: String,
      minShare: Double,
      capacity: Int = 4096): DataFrame = {
    require(minShare > 0 && minShare < 1, "minShare must be in (0, 1)")
    require(capacity > 1 / minShare,
      s"capacity $capacity must exceed 1/minShare=${1 / minShare} or heavy values may be pruned")
    // shares are measured against the NON-NULL population: the sketch
    // and the candidate join both skip nulls, so the denominator must
    // too, or a null-heavy column silently raises the threshold
    val nonNull = df.filter(col(valueCol).isNotNull)
    val candidates = nonNull
      .agg(FreqSketchFunctions.freq_sketch(col(valueCol), capacity).as("_sk"))
      .select(explode(col("_sk")).as("_hit"))
      .select(col("_hit.value").as(valueCol))
    verified(df, valueCol, candidates, minShare)
  }

  /** The exact-verify half on its own: given an EXTERNAL candidate
    * list (one `valueCol` column — e.g. the incrementally-maintained
    * MG state from [[IncrementalAgg.readFreqCandidates]]), count just
    * the candidates exactly and apply the share filter. The result is
    * EXACTLY the heavy-hitter set whenever the candidates are a
    * superset of it — which the MG summary guarantees while its
    * capacity exceeds 1/minShare (the bound holds across merged/
    * streamed summaries, not just one pass).
    */
  def verified(
      df: DataFrame,
      valueCol: String,
      candidates: DataFrame,
      minShare: Double): DataFrame = {
    require(minShare > 0 && minShare < 1, "minShare must be in (0, 1)")
    val nonNull = df.filter(col(valueCol).isNotNull)
    val total = nonNull.agg(count(lit(1)).as("n_total"))
    nonNull.join(broadcast(candidates.select(col(valueCol)).distinct()), valueCol)
      .groupBy(col(valueCol))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") >= col("n_total") * minShare)
  }
}
