package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation metrics over scored tables — the feedback half of
  * the curation loop (reference: the report surface's SQL transform
  * slot, template.py:319-322): once a quality classifier (#62) or a
  * perplexity filter scores the corpus, these measure how well the
  * score separates the classes, in EXACT integer arithmetic so the
  * verdict hash-matches on any engine.
  */
object Evaluation {

  /** Exact ROC AUC of an integral score against a binary label, with
    * ties handled by the Mann-Whitney convention (a tied
    * positive/negative pair contributes ½).
    *
    * Computed on the GROUPED score distribution, never on row pairs:
    * one map-side-combined aggregation collapses the table to
    * (score, n_pos, n_neg) — the score domain is bounded (integral
    * scores: token counts, basis points, cents), so the follow-up
    * running-sum window runs over |distinct scores| rows, not |rows|.
    * The pairwise definition is O(n²); this is one shuffle keyed on
    * score plus a vocabulary-sized window — the same shape at 100 TB.
    *
    * Exactness: AUC = U / (P·N) where
    * U = Σ_s pos_s · (neg_below_s + neg_s/2). To stay in integers the
    * numerator is doubled: auc_num = Σ_s pos_s · (2·neg_below_s +
    * neg_s), auc_den = 2·P·N, and auc_bp = ⌊10⁴·num/den⌋ in
    * decimal(38,0) cross-multiplication (BIGINT wraps past ~3e9·3e9
    * products; a 100 TB log overflows long arithmetic silently).
    *
    * Returns one row: (n_pos, n_neg, auc_num, auc_den, auc_bp).
    */
  def aucExact(df: DataFrame, labelCol: Column, scoreCol: Column): DataFrame = {
    val byScore = df
      .select(scoreCol.cast("long").as("score"),
        when(labelCol, 1L).otherwise(0L).as("p"))
      .groupBy(col("score"))
      .agg(sum(col("p")).as("n_pos"), sum(lit(1L) - col("p")).as("n_neg"))
    // neg mass strictly below this score: the rank basis of U
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("neg_below", coalesce(sum(col("n_neg")).over(w), lit(0L)))
      .agg(
        sum(col("n_pos")).as("n_pos"),
        sum(col("n_neg")).as("n_neg"),
        sum(col("n_pos") * (col("neg_below") * 2L + col("n_neg"))).as("auc_num"))
      .withColumn("auc_den", col("n_pos") * col("n_neg") * 2L)
      .withColumn("auc_bp",
        when(col("auc_den") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            """CAST(CAST(auc_num AS DECIMAL(38,0)) * 10000
              |     DIV CAST(auc_den AS DECIMAL(38,0)) AS BIGINT)""".stripMargin)))
  }

  /** Per-class precision/recall/F1 of a hard prediction against the
    * true label, exact rational arithmetic: each class row carries
    * (tp, fp, fn) plus basis-point precision = ⌊10⁴·tp/(tp+fp)⌋,
    * recall = ⌊10⁴·tp/(tp+fn)⌋ and F1 = ⌊2·10⁴·tp/(2·tp+fp+fn)⌋ —
    * the harmonic mean rewritten divisionless so one floor division
    * is the only rounding anywhere.
    *
    * Two map-side-combined aggregations (per-truth and per-pred
    * marginals folded from one (truth, pred) contingency pass) —
    * state is |classes|², never |rows|.
    */
  def classificationReport(df: DataFrame, truthCol: Column, predCol: Column): DataFrame = {
    val cells = df
      .select(truthCol.as("truth"), predCol.as("pred"))
      .groupBy(col("truth"), col("pred"))
      .agg(count(lit(1)).as("n"))
    val tp = cells.filter(col("truth") === col("pred"))
      .select(col("truth").as("label"), col("n").as("tp"))
    val byTruth = cells.groupBy(col("truth").as("label"))
      .agg(sum(col("n")).as("n_truth"))
    val byPred = cells.groupBy(col("pred").as("label"))
      .agg(sum(col("n")).as("n_pred"))
    byTruth
      .join(byPred, Seq("label"), "full_outer")
      .join(tp, Seq("label"), "left")
      .select(
        col("label"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("n_truth"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"))
      .withColumn("precision_bp",
        when(col("tp") + col("fp") === 0L, lit(null).cast("long"))
          .otherwise(col("tp") * 10000L divide (col("tp") + col("fp")) cast "long"))
      .withColumn("recall_bp",
        when(col("tp") + col("fn") === 0L, lit(null).cast("long"))
          .otherwise(col("tp") * 10000L divide (col("tp") + col("fn")) cast "long"))
      .withColumn("f1_bp",
        when(col("tp") * 2L + col("fp") + col("fn") === 0L, lit(null).cast("long"))
          .otherwise(col("tp") * 20000L divide (col("tp") * 2L + col("fp") + col("fn")) cast "long"))
  }
}
