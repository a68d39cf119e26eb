package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment (A/B test) analysis: deterministic unit→variant
  * assignment and the exact two-proportion test — the readout loop
  * for curation/ranking experiments, in engine-exact integer
  * arithmetic end to end (assignment and verdict both hash-match a
  * SQL re-derivation; no float p-hacking drift between engines).
  */
object Experiment {

  /** Deterministic 50/50 variant assignment from an integral unit id:
    * Knuth multiplicative hash on the unit, cut at 2³⁰ of the 2³¹
    * range — the same engine-reproducible splitter the stratified
    * hash sample uses (any engine computes the identical assignment,
    * so a re-analysis elsewhere reproduces the same groups — the
    * property that makes an experiment auditable). Salt shifts the
    * hash for independent experiments on the same population.
    */
  def assignVariant(unit: Column, salt: Long = 0L): Column =
    when((pmod(unit.cast("long") + lit(salt), lit(2147483648L)) * 2654435761L)
      % 2147483648L < 1073741824L, lit("A")).otherwise(lit("B"))

  /** Exact two-proportion z² (= 1-df χ²) between variants A and B
    * over per-UNIT conversion rows — unit-level, not event-level,
    * because repeated events of one unit are correlated and would
    * fake narrow confidence (the classic A/B analysis mistake).
    *
    * With x conversions of n units per arm, pooled X = x_a+x_b,
    * N = n_a+n_b:
    * z² = N·(x_a·n_b − x_b·n_a)² / (n_a·n_b·X·(N−X)) — emitted ×10⁴
    * through one DECIMAL(38,0) integral division (N·(Δ)² wraps a long
    * at ~10⁵ units; the widening is on the multiplicands). Rates and
    * lift in exact basis points. z²≥3.84·10⁴/10⁴ ⇒ p<0.05 (1 df) —
    * left to the caller, thresholds are policy.
    *
    * Scale envelope: |Δ| ≤ n_a·n_b ≤ N²/4, so the numerator
    * N·Δ²·10⁴ ≤ N⁵·10⁴/16 fits DECIMAL(38,0) only while
    * N ≲ 1.09·10⁷ units; past that Spark decimal multiply NULLs
    * silently — indistinguishable from the documented degenerate-arm
    * NULL. A loud raise_error guard fires at N > 10⁷ instead:
    * at that size, collapse each arm to its (n, x) pair (this
    * function's own first aggregate — two longs at any N) and
    * compute the division off-engine in unbounded arithmetic.
    *
    * Plan: one map-side-combined groupBy(variant) collapses any
    * number of units to two rows; everything after is constant-size.
    * Returns ONE row: (n_a, x_a, rate_a_bp, n_b, x_b, rate_b_bp,
    * lift_bp, z2_x10000); z² NULL when a denominator factor is 0
    * (empty arm, all-converted, none-converted).
    */
  def twoProportionZ2(units: DataFrame, variantCol: Column, convertedCol: Column): DataFrame = {
    val byArm = units
      .select(variantCol.as("v"),
        when(convertedCol.cast("boolean"), 1L).otherwise(0L).as("c"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("x"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val wide = byArm
      .agg(
        sum(when(col("v") === "A", col("n")).otherwise(0L)).as("n_a"),
        sum(when(col("v") === "A", col("x")).otherwise(0L)).as("x_a"),
        sum(when(col("v") === "B", col("n")).otherwise(0L)).as("n_b"),
        sum(when(col("v") === "B", col("x")).otherwise(0L)).as("x_b"))
    def bp(num: String, den: String): Column = expr(
      s"""CASE WHEN $den = 0 THEN CAST(NULL AS BIGINT)
         |     ELSE CAST(CAST($num AS DECIMAL(38,0)) * 10000
         |               DIV CAST($den AS DECIMAL(38,0)) AS BIGINT) END""".stripMargin)
    wide
      .withColumn("rate_a_bp", bp("x_a", "n_a"))
      .withColumn("rate_b_bp", bp("x_b", "n_b"))
      .withColumn("lift_bp", col("rate_b_bp") - col("rate_a_bp"))
      .withColumn("_xx", col("x_a") + col("x_b"))
      .withColumn("_nn", col("n_a") + col("n_b"))
      // guard BEFORE the products: decimal overflow NULLs silently,
      // and a NULL z² here would read as a degenerate arm
      .withColumn("_guard",
        when(col("_nn") > 10000000L,
          raise_error(lit("twoProportionZ2: N^5*10^4/16 exceeds the exact " +
            "DECIMAL(38,0) envelope (N > 1e7 units) — take the per-arm (n, x) " +
            "aggregates and divide off-engine in unbounded arithmetic")).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("_d",
        dec(col("x_a")) * dec(col("n_b")) - dec(col("x_b")) * dec(col("n_a"))
          + dec(col("_guard")))
      .withColumn("z2_x10000",
        when(dec(col("n_a")) * dec(col("n_b")) * dec(col("_xx")) *
            dec(col("_nn") - col("_xx")) === 0, lit(null).cast("long"))
          .otherwise(expr(
            """CAST(CAST(_nn AS DECIMAL(38,0)) * _d * _d * 10000
              |     DIV (CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))
              |          * CAST(_xx AS DECIMAL(38,0)) * CAST(_nn - _xx AS DECIMAL(38,0)))
              |     AS BIGINT)""".stripMargin)))
      .select(col("n_a"), col("x_a"), col("rate_a_bp"),
        col("n_b"), col("x_b"), col("rate_b_bp"),
        col("lift_bp"), col("z2_x10000"))
  }
}
