package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the "what's in this table" pass every pipeline
  * run wants before trusting a source (the reference trusts its Glue
  * catalog; graft computes the facts).
  *
  * One aggregate pass over the table produces every column's stats,
  * then a local explode unpivots the single summary row into one row
  * per column. The exact-distinct counts make Spark plan an Expand
  * (one input row fans to #cols+1 aggregation lanes) — still ONE
  * shuffle, with partial aggregation per lane; swap `count_distinct`
  * for `approx_count_distinct` when a ±2% answer is enough at 100 TB
  * (that variant needs no Expand at all).
  */
object Profiler {

  /** Per-column stats: row count, nulls, exact distinct, min/max
    * (stringified so heterogeneous column types share one schema).
    */
  def profile(df: DataFrame, cols: Seq[String], exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_nn_$c"),
        (if (exactDistinct) count_distinct(col(c)) else approx_count_distinct(col(c))).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val summary = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_nn_$c")).as("n_null"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_min_$c").as("min_value"),
        col(s"_max_$c").as("max_value"))
    }
    summary
      .select(explode(array(perCol: _*)).as("p"))
      .select(col("p.*"))
  }

  /** Equi-width histogram per group over an integral-valued column:
    * per-group min/max fix the range, `width = ceil(span / bins)` in
    * PURE INTEGER arithmetic ((span + bins - 1) div bins), so every
    * engine derives identical bin edges — no float division anywhere.
    *
    * Plan: one stats pass (shuffle on the group key), stats broadcast
    * back, one counting pass — same two-scan shape as iqrOutliers.
    * Empty bins are absent (sparse output), which is what you want at
    * 100 TB: bins-with-data is O(bins·groups), a dense fill would be
    * a cross join.
    */
  def histogram(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      bins: Int = 20): DataFrame = {
    require(bins > 0, "bins must be positive")
    val v = col(valueCol).cast("long")
    val stats = df.groupBy(col(groupCol))
      .agg(min(v).as("_vmin"), max(v).as("_vmax"))
      // `div` is integer division (Column./ would be double division)
      .withColumn("_width",
        greatest(lit(1L), expr(s"(_vmax - _vmin + $bins) div $bins")))
    df.join(broadcast(stats), groupCol)
      .withColumn("_v", v)
      .withColumn("bin", expr("(_v - _vmin) div _width"))
      .groupBy(col(groupCol), col("bin"),
        (col("_vmin") + col("bin") * col("_width")).as("bin_lo"),
        (col("_vmin") + (col("bin") + 1) * col("_width") - 1).as("bin_hi"))
      .agg(count(lit(1)).as("n"))
  }

  /** Tukey IQR outlier fences per group: quartiles, the
    * [p25 - k·IQR, p75 + k·IQR] fence, and how many rows fall
    * outside it — the robust "is this batch's distribution sane"
    * check (fixed thresholds drift; quartile fences track the data).
    *
    * Plan: one grouped percentile pass (shuffle on the group key),
    * fence table broadcast back onto the input, one counting pass —
    * the input is scanned twice but never joined shuffle-to-shuffle.
    * Cross-engine exactness: feed an INTEGRAL-valued double column
    * (counts, cents) — quartile interpolation lands on exact
    * quarters, and k·IQR stays dyadic-exact for dyadic k (1.5 default).
    */
  /** Winsorization: clamp a value column to its per-group
    * [pLo, pHi] interpolated percentiles — the standard "tame the
    * tails before training on the feature" step (clipping keeps the
    * row; the IQR fence above only counts it).
    *
    * Cross-engine exactness contract: call it on INTEGRAL values
    * (e.g. cents) with DYADIC percentiles (defaults 1/8, 7/8). The
    * interpolation position p·(n-1) is then an exact double, so both
    * engines land on the identical clamp bounds bit-for-bit — the
    * same trick as the quartile fences, generalized to any p = k/2^m.
    *
    * Plan shape: one stats shuffle per group, bounds broadcast back,
    * clamp is a pure map-side projection — the fact table never
    * shuffles. At 100 TB swap the exact percentile for
    * `approx_percentile` and nothing else changes.
    */
  def winsorize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pLo: Double = 0.125,
      pHi: Double = 0.875): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, "need 0 <= pLo < pHi <= 1")
    val v = col(valueCol)
    val bounds = df.groupBy(col(groupCol))
      .agg(percentile(v, array(lit(pLo), lit(pHi))).as("_q"))
      .select(col(groupCol),
        element_at(col("_q"), 1).as("clip_lo"),
        element_at(col("_q"), 2).as("clip_hi"))
    df.join(broadcast(bounds), groupCol)
      .withColumn(s"${valueCol}_clipped",
        least(greatest(v.cast("double"), col("clip_lo")), col("clip_hi")))
  }

  /** Pairwise sufficient statistics per group — the one-pass
    * (n, Σx, Σy, Σxy, Σx², Σy²) kernel under covariance, correlation
    * and OLS slope. Inputs must be INTEGRAL longs (scale doubles to
    * cents first): every sum is then exact in BIGINT, and the derived
    * covariance/slope are single exact-integer divisions — correctly
    * rounded doubles, bit-identical on any engine. (Built-ins like
    * covar_pop accumulate running doubles — order-dependent, so never
    * cross-engine stable. corr needs a sqrt, which is libm-dependent —
    * derive it from these sums downstream if ±1 ulp is acceptable.)
    *
    * One shuffle on the group key with map-side partial aggregation;
    * products stay in 63 bits for |x| ≤ ~1e6, |y| ≤ ~1e6, n ≤ ~1e4
    * per group — scale wider inputs down (or split sums) before use.
    */
  def pairStats(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("long"); val y = col(yCol).cast("long")
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sum_x"), sum(y).as("sum_y"),
        sum(x * y).as("sum_xy"),
        sum(x * x).as("sum_x2"), sum(y * y).as("sum_y2"))
      .withColumn("cov_pop",
        (col("n") * col("sum_xy") - col("sum_x") * col("sum_y")).cast("double") /
          (col("n") * col("n")).cast("double"))
      .withColumn("slope",
        when(col("n") * col("sum_x2") === col("sum_x") * col("sum_x"), lit(null))
          .otherwise(
            (col("n") * col("sum_xy") - col("sum_x") * col("sum_y")).cast("double") /
              (col("n") * col("sum_x2") - col("sum_x") * col("sum_x")).cast("double")))
  }

  /** Distribution drift between two slices of the same table (old
    * period vs new period, yesterday vs today): per bin, the absolute
    * proportion shift in basis points, computed CROSS-MULTIPLIED so
    * the result is exact integer arithmetic on any engine —
    * |n1/T1 - n2/T2| in bp = |n1·T2 - n2·T1| · 10000 ÷ (T1·T2),
    * integer (floor) division. The PSI/chi-square alternatives need a
    * log/division per bin; this gate is the exact-arithmetic screen a
    * scheduled pipeline can hash-compare and alert on. ONE
    * map-side-combined aggregation over the union of both slices; the
    * 1-row totals broadcast back onto the per-bin rows.
    *
    * The cross products are computed in decimal(38,0): with BIGINT
    * arithmetic, n·T·10000 wraps silently past ~3e7-row slices (ANSI
    * off), and a drift gate that returns negative garbage at scale is
    * worse than no gate. decimal(38,0) is exact up to T ≈ 1e17 rows
    * per slice — comfortably past a 100 TB table. An EMPTY slice
    * (T_old = 0 or T_new = 0) is a full distribution shift by
    * definition, so every bin reports the 10000 bp maximum instead of
    * a silent null — the gate alarms rather than passes vacuously.
    */
  def proportionDrift(df: DataFrame, binCol: String, inOld: Column): DataFrame = {
    val perBin = df.groupBy(col(binCol))
      .agg(
        sum(when(inOld, 1L).otherwise(0L)).as("n_old"),
        sum(when(inOld, 0L).otherwise(1L)).as("n_new"))
    val totals = perBin.agg(
      sum(col("n_old")).as("_t_old"), sum(col("n_new")).as("_t_new"))
    perBin.join(broadcast(totals))
      .withColumn("drift_bp",
        when(col("_t_old") === 0L || col("_t_new") === 0L, lit(10000L))
          .otherwise(expr(
            """CAST(abs(CAST(n_old AS DECIMAL(38,0)) * _t_new
              |         - CAST(n_new AS DECIMAL(38,0)) * _t_old) * 10000
              |     DIV (CAST(_t_old AS DECIMAL(38,0)) * _t_new) AS BIGINT)"""
              .stripMargin)))
      .drop("_t_old", "_t_new")
  }

  /** Z-score outlier flags over an integral column, in EXACT integer
    * arithmetic: |x - mean| > k·σ is cross-multiplied to
    * (n·x - s)² > k²·(n·ss - s²) — no division, no floats, so the
    * flag set is bit-identical on any engine. Sufficient stats
    * (n, Σx, Σx²) are one map-side-combined agg; the per-row test is
    * a broadcast join (|groups| rows). decimal(38,0) keeps the
    * squared terms exact far past BIGINT range (n·x up to ~1e19
    * before precision loss — a 100 TB event log qualifies).
    */
  def zscoreOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 3): DataFrame = {
    val x = col(valueCol).cast("decimal(38,0)")
    val stats = df
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("decimal(38,0)").as("_n"),
        sum(x).as("_s"),
        sum(x * x).as("_ss"))
    df.join(broadcast(stats), Seq(groupCol))
      .filter(
        (col("_n") * x - col("_s")) * (col("_n") * x - col("_s")) >
          lit(k * k) * (col("_n") * col("_ss") - col("_s") * col("_s")))
      .drop("_n", "_s", "_ss")
  }

  /** Value-based quantile binning (feature discretization): per
    * group, interpolated quartile fences from one percentile
    * aggregate, then each row labels itself against the broadcast
    * fences — the QuantileDiscretizer shape without an ML fit/
    * transform pass. Bucket k means value < p(k/4), bucket 4 is the
    * rest; boundary rows go UP (v < fence, not <=), which both
    * engines evaluate identically since the fences are the same
    * interpolated doubles the oracle computes.
    */
  def quantileBins(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol)
    val fences = df
      .groupBy(col(groupCol))
      .agg(percentile(v, array(lit(0.25), lit(0.5), lit(0.75))).as("_q"))
      .select(col(groupCol),
        element_at(col("_q"), 1).as("p25"),
        element_at(col("_q"), 2).as("p50"),
        element_at(col("_q"), 3).as("p75"))
    df.join(broadcast(fences), Seq(groupCol))
      .withColumn("bin",
        when(v < col("p25"), 1)
          .when(v < col("p50"), 2)
          .when(v < col("p75"), 3)
          .otherwise(4))
      .drop("p25", "p50", "p75")
  }

  /** Group-mean null imputation (feature cleaning): missing values
    * fill with their group's mean over the PRESENT values, computed
    * exactly (decimal sum → double ÷ long count, both bit-defined);
    * an all-null group stays null. One aggregate + a broadcast join —
    * no window, no second scan.
    */
  def imputeMean(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      outCol: String): DataFrame = {
    val present = df.filter(col(valueCol).isNotNull)
    val means = present
      .groupBy(col(groupCol))
      .agg((sum(col(valueCol).cast("decimal(28,6)")).cast("double") /
        count(lit(1))).as("_mean"))
    df.join(broadcast(means), Seq(groupCol), "left")
      .withColumn(outCol, coalesce(col(valueCol), col("_mean")))
      .drop("_mean")
  }

  def iqrOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Double = 1.5): DataFrame = {
    val v = col(valueCol)
    val fences = df
      .groupBy(col(groupCol))
      .agg(percentile(v, array(lit(0.25), lit(0.75))).as("_q"))
      .select(col(groupCol),
        element_at(col("_q"), 1).as("p25"),
        element_at(col("_q"), 2).as("p75"))
      .withColumn("fence_lo", col("p25") - lit(k) * (col("p75") - col("p25")))
      .withColumn("fence_hi", col("p75") + lit(k) * (col("p75") - col("p25")))
    df.join(broadcast(fences), groupCol)
      .groupBy(col(groupCol), col("p25"), col("p75"), col("fence_lo"), col("fence_hi"))
      .agg(
        sum(when(v < col("fence_lo") || v > col("fence_hi"), 1L).otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n_total"))
  }

  /** MAD outliers — the robust-statistics completion of the fence
    * family (IQR fences, exact z-scores): flag rows whose absolute
    * deviation from the group MEDIAN exceeds k × the median absolute
    * deviation. Immune to the outliers themselves (breakdown point
    * 50%, vs 25% for IQR and 0% for z-scores). Two percentile passes
    * (median, then median of deviations) with the per-group stats
    * broadcast back — the fact table never shuffles. Interpolated
    * percentiles match DuckDB's quantile_cont exactly (established by
    * q_percentiles), and the deviation/threshold arithmetic is plain
    * IEEE, so the flagged SET is engine-exact.
    */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Double = 3.0): DataFrame = {
    val v = col(valueCol)
    val med = df.groupBy(col(groupCol)).agg(percentile(v, lit(0.5)).as("med"))
    val mad = df.join(broadcast(med), groupCol)
      .groupBy(col(groupCol), col("med"))
      .agg(percentile(abs(v - col("med")), lit(0.5)).as("mad"))
    df.join(broadcast(mad), groupCol)
      .filter(abs(v - col("med")) > lit(k) * col("mad"))
  }

  /** Merkle-style per-group content digest — the anti-entropy check
    * of replicated/synced tables (compare digests per partition
    * instead of shipping rows; only mismatched groups re-sync).
    *
    * digest(group) = Σ fnv64(canonical-row-string) over the group,
    * mod 2⁶³: an ORDER-INDEPENDENT combine (addition commutes), so
    * partitioning, shuffle order, and file layout never change it —
    * only content does. The row hash is the codegen'd FNV kernel;
    * the sum runs in decimal(38,0) so engines agree bit-for-bit (no
    * silent long wrap), and the final mod folds back into BIGINT
    * range for cross-engine comparison. One hash-aggregate with
    * map-side combine; nothing but (group, digest, count) shuffles.
    *
    * The caller supplies the canonical string — column order and
    * formatting ARE the digest contract (cast money through decimal,
    * never raw doubles).
    */
  def contentDigest(df: DataFrame, groupCols: Seq[String], canonical: Column): DataFrame = {
    require(groupCols.nonEmpty, "digest needs at least one group column")
    val two64 = lit(BigDecimal("18446744073709551616")).cast("decimal(38,0)")
    val two63 = lit(BigDecimal("9223372036854775808")).cast("decimal(38,0)")
    val h = graft.functions.HashFunctions.fingerprint64(canonical)
    val unsigned = when(h < 0, h.cast("decimal(38,0)") + two64)
      .otherwise(h.cast("decimal(38,0)"))
    df.select((groupCols.map(col) :+ unsigned.as("_hu")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("_hu")) % two63).cast("long").as("digest"))
  }
}
