package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-reproducible approximate aggregates — the
  * sketch family's distinct and quantile members, re-grounded so the
  * driver's DuckDB gate can hash-match them (the previous
  * `approx_count_distinct` / `approx_percentile` forms were
  * order-or-partitioning-sensitive internals no other engine can
  * replay; these are pure functions of the input SET).
  *
  * Reference scope: the reference pipeline's reporting layer exposes
  * approximate rollups the same way any warehouse does — the exact
  * algorithm is our choice, and we choose ones with cross-engine
  * reproducibility built in.
  */
object Sketches {

  /** Approximate distinct count per group via a KMV/theta sketch over
    * `xxhash64(value)` ([[graft.functions.KmvFunctions.kmv_distinct]]):
    * O(k) mergeable state, map-side combined, never a shuffle of the
    * raw values — the 100 TB shape for COUNT(DISTINCT) dashboards.
    * Returns groupCols + (approx_distinct BIGINT, n_rows BIGINT).
    */
  def approxDistinctKmv(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int = 64): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        graft.functions.KmvFunctions.kmv_distinct(xxhash64(col(valueCol)), k)
          .as("approx_distinct"),
        count(lit(1)).as("n_rows"))

  /** Approximate per-group quantiles from a DETERMINISTIC Bernoulli
    * sample: keep a row iff its multiplicative key hash clears the
    * fraction cut (the same engine-reproducible formula as
    * [[Sampling.reproducibleStratified]] — the sampled SET, not just
    * its size, is pinned cross-engine), then take EXACT interpolated
    * percentiles of the sample. Error is O(1/√(f·n)) per group —
    * spec-bounded against the exact quantiles. The sample is trivially
    * mergeable (a union of per-partition samples IS the sample of the
    * union), and per-group counts stay exact over the full input.
    *
    * Returns groupCols + one column per requested percentile
    * (`p<pct>`) + n_rows. Groups whose sample came up EMPTY are
    * dropped (inner join) — loud in row counts, never a silent null.
    */
  def sampledQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      keyCol: Column,
      percentiles: Seq[Double],
      fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction in (0, 1]")
    val m31 = 2147483648L
    val cut = math.round(fraction * m31.toDouble)
    val keep = ((keyCol % m31) * 2654435761L) % m31 < cut
    val sampled = df.filter(keep)
      .groupBy(groupCols.map(col): _*)
      .agg(percentile(col(valueCol), array(percentiles.map(lit): _*)).as("_p"))
      .select(groupCols.map(col) ++
        percentiles.zipWithIndex.map { case (p, i) =>
          element_at(col("_p"), i + 1).as(s"p${(p * 100).toInt}") }: _*)
    val counts = df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("n_rows"))
    counts.join(sampled, groupCols)
  }
}
