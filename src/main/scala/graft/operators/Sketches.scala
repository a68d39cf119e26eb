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

  /** Audience-overlap analysis at sketch cost: distinct-count
    * estimates for two segments AND their union from three O(k) KMV
    * sketches, with the intersection by inclusion-exclusion
    * (|A∩B| = |A|+|B|−|A∪B|, clamped at 0) and a floor-quantized
    * Jaccard in basis points — "how many purchasers also click"
    * without ever shuffling user ids. The KMV union is EXACTLY
    * mergeable (bottom-k of two bottom-k sketches IS the union
    * set's sketch), so the union estimate comes from the two segment
    * sketches, not a third scan; everything is a pure function of the
    * input sets, which is why q_kmv_overlap's oracle re-derives all
    * three estimates from first principles and hash-matches.
    *
    * Scale shape: ONE map-side-combined scan of the two segments into
    * two k-long sketches; the merge, estimates and ratios are
    * constant-size driver-free arithmetic on 1-row frames. Error is
    * the KMV bound O(1/√k) per estimate; the intersection inherits
    * roughly the sum of the three — size k to the overlap you need
    * to resolve.
    */
  def kmvOverlap(
      df: DataFrame,
      segmentCol: String,
      valueCol: String,
      segA: String,
      segB: String,
      k: Int = 64): DataFrame = {
    import graft.functions.KmvFunctions._
    // ONE global aggregate builds BOTH segment sketches from one scan
    // (the kmv aggregate skips the null the off-segment CASE yields),
    // so the one-scan property is structural — a single Aggregate
    // node, not a ReuseExchange coincidence — and the op returns
    // exactly one row even when a segment (or both) has no members:
    // an absent segment is the EMPTY sketch, estimate 0, not a
    // silently-vanished result row.
    val sk = df
      .filter(col(segmentCol).isin(segA, segB))
      .select(col(segmentCol).as("_seg"), xxhash64(col(valueCol)).as("_h"))
      .agg(
        kmv_sketch(when(col("_seg") === segA, col("_h")), k).as("ska"),
        kmv_sketch(when(col("_seg") === segB, col("_h")), k).as("skb"))
    // union sketch by MERGE, not re-scan: bottom-k (unsigned order)
    // of the two sketches' distinct union IS the union set's sketch —
    // pure array arithmetic on the one aggregate row. The comparator
    // mirrors the sketch's unsigned order (negative longs rank last).
    val unsignedAsc = (a: Column, b: Column) =>
      when(a === b, lit(0))
        .otherwise(when((a < 0) === (b < 0), when(a < b, lit(-1)).otherwise(lit(1)))
          .otherwise(when(a < 0, lit(1)).otherwise(lit(-1))))
    sk
      .withColumn("sku",
        slice(array_sort(array_union(col("ska"), col("skb")), unsignedAsc), 1, k))
      .select(
        kmv_estimate_from(col("ska"), k).as("approx_a"),
        kmv_estimate_from(col("skb"), k).as("approx_b"),
        kmv_estimate_from(col("sku"), k).as("approx_union"))
      .withColumn("approx_intersection",
        greatest(lit(0L), col("approx_a") + col("approx_b") - col("approx_union")))
      .withColumn("jaccard_bp",
        when(col("approx_union") === 0L, lit(0L))
          .otherwise(expr("approx_intersection * 10000 div approx_union")))
  }

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
