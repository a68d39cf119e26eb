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

  /** Plan-level guard for the GLOBAL (unpartitioned-window) variants:
    * their one ordered window runs over the distinct-score table,
    * which is vocabulary-sized for the integral scores these are
    * built for (token counts, basis points, cents) — but a
    * high-resolution score column could push it to corpus scale and
    * silently serialize the plan through one sort partition. The
    * guard rides the SAME sort as a zero-valued addend folded into a
    * live column (so column pruning can't drop it, and no extra pass
    * runs): the moment the window sees more than `cap` distinct
    * scores it raises loudly, pointing at the two contracts that
    * scale — quantize the score before calling, or use the
    * group-partitioned *By form.
    */
  private def distinctScoreGuard(rn: Column, cap: Long, what: String): Column =
    when(rn > cap,
      raise_error(lit(s"$what: more than $cap distinct score values in the global " +
        "ordered window — quantize the score (e.g. to basis points) or use the " +
        "partitioned *By variant, which spreads by segment")).cast("long"))
      .otherwise(lit(0L))

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
  def aucExact(df: DataFrame, labelCol: Column, scoreCol: Column,
      maxDistinctScores: Long = 4000000L): DataFrame = {
    val byScore = df
      // rows with a NULL label have no class: excluded (documented
      // contract — they would otherwise silently count as negatives).
      // cast("boolean") admits the common 0/1 integral label alongside
      // a true boolean.
      .filter(labelCol.isNotNull)
      .select(scoreCol.cast("long").as("score"),
        when(labelCol.cast("boolean"), 1L).otherwise(0L).as("p"))
      .groupBy(col("score"))
      .agg(sum(col("p")).as("n_pos"), sum(lit(1L) - col("p")).as("n_neg"))
    // neg mass strictly below this score: the rank basis of U
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // every product in DECIMAL(38,0) BEFORE it is formed: auc_num ≈
    // 2·P·N, which wraps a BIGINT once P,N ≳ 2.1e9 — exactly the
    // 100 TB case. A post-hoc decimal cast would launder the wrapped
    // value, so the widening has to happen on the multiplicands.
    val dec = (c: Column) => c.cast("decimal(38,0)")
    byScore
      .withColumn("neg_below", coalesce(sum(col("n_neg")).over(w), lit(0L)) +
        distinctScoreGuard(row_number().over(Window.orderBy(col("score"))),
          maxDistinctScores, "aucExact"))
      .agg(
        sum(col("n_pos")).as("n_pos"),
        sum(col("n_neg")).as("n_neg"),
        sum(dec(col("n_pos")) * (dec(col("neg_below")) * 2 + dec(col("n_neg"))))
          .cast("decimal(38,0)").as("auc_num"))
      .withColumn("auc_den", (dec(col("n_pos")) * dec(col("n_neg")) * 2).cast("decimal(38,0)"))
      .withColumn("auc_bp",
        when(col("auc_den") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST(auc_num * 10000 DIV auc_den AS BIGINT)")))
  }

  /** Per-GROUP exact ROC AUC: aucExact partitioned by a segment
    * column (per-language, per-source, per-shard model quality — the
    * slice view that catches a classifier that's great on average and
    * broken on one segment). Same grouped-distribution algorithm and
    * exactness as [[aucExact]], but the running-sum window partitions
    * by the group — so unlike the global variant's single ordered
    * frame, this shape spreads across the cluster by group and is the
    * PREFERRED form at scale whenever a segmentation exists.
    *
    * Returns one row per group:
    * (group, n_pos, n_neg, auc_num, auc_den, auc_bp); single-class
    * groups yield NULL auc_bp.
    */
  def aucExactBy(df: DataFrame, groupCol: Column, labelCol: Column,
      scoreCol: Column): DataFrame = {
    val byScore = df
      .filter(labelCol.isNotNull)
      .select(groupCol.as("grp"), scoreCol.cast("long").as("score"),
        when(labelCol.cast("boolean"), 1L).otherwise(0L).as("p"))
      .groupBy(col("grp"), col("score"))
      .agg(sum(col("p")).as("n_pos"), sum(lit(1L) - col("p")).as("n_neg"))
    val w = Window.partitionBy(col("grp")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    byScore
      .withColumn("neg_below", coalesce(sum(col("n_neg")).over(w), lit(0L)))
      .groupBy(col("grp"))
      .agg(
        sum(col("n_pos")).as("n_pos"),
        sum(col("n_neg")).as("n_neg"),
        sum(dec(col("n_pos")) * (dec(col("neg_below")) * 2 + dec(col("n_neg"))))
          .cast("decimal(38,0)").as("auc_num"))
      .withColumn("auc_den", (dec(col("n_pos")) * dec(col("n_neg")) * 2).cast("decimal(38,0)"))
      .withColumn("auc_bp",
        when(col("auc_den") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST(auc_num * 10000 DIV auc_den AS BIGINT)")))
  }

  /** Exact average precision (the PR-AUC companion to [[aucExact]]):
    * AP = Σ_thresholds ΔRecall · Precision with one threshold per
    * DISTINCT score (the step-interpolated estimator — scikit-learn's
    * `average_precision_score` convention), so all rows of a tied
    * score enter as one block: ΔR = pos_s/P, Precision at the block =
    * tp_s/(tp_s+fp_s) with tp/fp cumulative at-or-above s. ROC AUC
    * can look great on a 1:10⁶-imbalanced corpus-curation label where
    * PR-AUC exposes the classifier — this is the metric that matters
    * when positives are rare.
    *
    * Same grouped-distribution shape as aucExact: one map-side-
    * combined groupBy(score), one |distinct scores| descending
    * running-sum window (never row pairs), one final fold.
    *
    * Exactness/determinism: precision per block is floor-quantized
    * once to 10⁻¹² (prec_q12 = ⌊10¹²·tp/cum⌋ — an IntegralDivide of
    * DECIMAL(38,0) products, so tp·10¹² cannot wrap a long), then
    * ap_num = Σ pos_s·prec_q12 accumulates in DECIMAL(38,0)
    * (≤ P·10¹² ≈ 10²¹ at P = 10⁹ — far inside 38 digits where a
    * BIGINT is long gone) and ap_bp = ⌊10⁴·ap_num/(P·10¹²)⌋. The
    * per-block floor under-counts AP by < |blocks|/10¹² — invisible
    * at basis-point output, and bit-identical on any engine, which is
    * what the cross-engine hash gate needs.
    *
    * Returns one row: (n_pos, n_neg, ap_bp); NULL ap_bp when either
    * class is absent.
    */
  def averagePrecision(df: DataFrame, labelCol: Column, scoreCol: Column,
      maxDistinctScores: Long = 4000000L): DataFrame = {
    val byScore = df
      .filter(labelCol.isNotNull)
      .select(scoreCol.cast("long").as("score"),
        when(labelCol.cast("boolean"), 1L).otherwise(0L).as("p"))
      .groupBy(col("score"))
      .agg(sum(col("p")).as("n_pos"), sum(lit(1L) - col("p")).as("n_neg"))
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    byScore
      .withColumn("tp", sum(col("n_pos")).over(w) +
        distinctScoreGuard(row_number().over(Window.orderBy(col("score").desc)),
          maxDistinctScores, "averagePrecision"))
      .withColumn("fp", sum(col("n_neg")).over(w))
      // ⌊10¹²·tp/(tp+fp)⌋ ≤ 10¹² — IntegralDivide emits a long that
      // always fits; the decimal widening is on the product, where
      // the wrap would happen
      .withColumn("prec_q12", expr(
        """CAST(CAST(tp AS DECIMAL(38,0)) * 1000000000000
          |     DIV CAST(tp + fp AS DECIMAL(38,0)) AS BIGINT)""".stripMargin))
      .agg(
        sum(col("n_pos")).as("n_pos"),
        sum(col("n_neg")).as("n_neg"),
        sum(dec(col("n_pos")) * dec(col("prec_q12")))
          .cast("decimal(38,0)").as("ap_num"))
      .withColumn("ap_bp",
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """CAST(ap_num * 10000
              |     DIV (CAST(n_pos AS DECIMAL(38,0)) * 1000000000000) AS BIGINT)""".stripMargin)))
      .select(col("n_pos"), col("n_neg"), col("ap_bp"))
  }

  /** Per-GROUP exact average precision: [[averagePrecision]]
    * partitioned by a segment column — the PR-side slice view
    * matching [[aucExactBy]], and the preferred shape at scale: the
    * descending running-sum window partitions by the group and
    * spreads across the cluster instead of one global ordered frame.
    *
    * Returns one row per group: (grp, n_pos, n_neg, ap_bp);
    * single-class groups yield NULL ap_bp.
    */
  def averagePrecisionBy(df: DataFrame, groupCol: Column, labelCol: Column,
      scoreCol: Column): DataFrame = {
    val byScore = df
      .filter(labelCol.isNotNull)
      .select(groupCol.as("grp"), scoreCol.cast("long").as("score"),
        when(labelCol.cast("boolean"), 1L).otherwise(0L).as("p"))
      .groupBy(col("grp"), col("score"))
      .agg(sum(col("p")).as("n_pos"), sum(lit(1L) - col("p")).as("n_neg"))
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    byScore
      .withColumn("tp", sum(col("n_pos")).over(w))
      .withColumn("fp", sum(col("n_neg")).over(w))
      .withColumn("prec_q12", expr(
        """CAST(CAST(tp AS DECIMAL(38,0)) * 1000000000000
          |     DIV CAST(tp + fp AS DECIMAL(38,0)) AS BIGINT)""".stripMargin))
      .groupBy(col("grp"))
      .agg(
        sum(col("n_pos")).as("n_pos"),
        sum(col("n_neg")).as("n_neg"),
        sum(dec(col("n_pos")) * dec(col("prec_q12")))
          .cast("decimal(38,0)").as("ap_num"))
      .withColumn("ap_bp",
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """CAST(ap_num * 10000
              |     DIV (CAST(n_pos AS DECIMAL(38,0)) * 1000000000000) AS BIGINT)""".stripMargin)))
      .select(col("grp"), col("n_pos"), col("n_neg"), col("ap_bp"))
  }

  /** ROUGE-N overlap between document pairs — the n-gram-overlap
    * metric of summarization/generation eval (Lin 2004), and a
    * quantitative companion to the near-dup pair list: how MUCH do
    * two candidate documents overlap, as exact multiset n-gram
    * recall/precision/F1 in basis points.
    *
    * For a pair (a, b) with n-gram multisets A, B:
    * overlap = Σ_g min(count_A(g), count_B(g)),
    * precision = overlap/|A|, recall = overlap/|B| (b is the
    * reference side), F1 = 2·overlap/(|A|+|B|) — the harmonic mean
    * rewritten divisionless, so each metric is ONE floor division in
    * DECIMAL(38,0) basis points.
    *
    * Plan: one pass builds per-doc n-gram COUNTS (map-side combined
    * on (doc, gram)); the pair list joins each side by doc id and the
    * overlap closes with an equi-join on (pair, gram) — everything
    * keyed, nothing all-pairs; cost is O(pairs × shared grams), and
    * the pair list itself comes from a bounded candidate generator
    * (LSH/shingle join), never the cross product.
    *
    * Returns (doc_a, doc_b, overlap, n_a, n_b, rouge_p_bp,
    * rouge_r_bp, rouge_f1_bp). Pairs where either side has no
    * n-gram (fewer than n tokens) are dropped — no denominator is 0.
    */
  def rougeN(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, n: Int = 2): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val words = docs.select(col(idCol).as("_doc"),
      filter(split(col(textCol), " "), x => x =!= "").as("w"))
    val grams = words
      .filter(size(col("w")) >= n)
      .select(col("_doc"), explode(expr(
        s"transform(sequence(1, size(w) - ${n - 1}), i -> concat_ws(' ', slice(w, i, $n)))"))
        .as("gram"))
      .groupBy(col("_doc"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val sizes = grams.groupBy(col("_doc")).agg(sum(col("cnt")).as("ntot"))
    val p = pairs.select(col("doc_a"), col("doc_b"))
    val withA = p
      .join(grams.select(col("_doc").as("doc_a"), col("gram"), col("cnt").as("ca")), "doc_a")
    val ov = withA
      .join(grams.select(col("_doc").as("doc_b"), col("gram"), col("cnt").as("cb")),
        Seq("doc_b", "gram"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(least(col("ca"), col("cb"))).as("overlap"))
    def bp(num: String, den: String): Column = expr(
      s"""CAST(CAST($num AS DECIMAL(38,0)) * 10000
         |     DIV CAST($den AS DECIMAL(38,0)) AS BIGINT)""".stripMargin)
    // left join from the pair list: zero-overlap pairs still report
    p.join(sizes.select(col("_doc").as("doc_a"), col("ntot").as("n_a")), "doc_a")
      .join(sizes.select(col("_doc").as("doc_b"), col("ntot").as("n_b")), "doc_b")
      .join(ov, Seq("doc_a", "doc_b"), "left")
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
      .withColumn("rouge_p_bp", bp("overlap", "n_a"))
      .withColumn("rouge_r_bp", bp("overlap", "n_b"))
      .withColumn("rouge_f1_bp", bp("overlap * 2", "n_a + n_b"))
      .select(col("doc_a"), col("doc_b"), col("overlap"), col("n_a"), col("n_b"),
        col("rouge_p_bp"), col("rouge_r_bp"), col("rouge_f1_bp"))
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
  def classificationReport(df: DataFrame, truthCol: Column, predCol: Column): DataFrame =
    reportFromCells(df
      .select(truthCol.as("truth"), predCol.as("pred"))
      .groupBy(col("truth"), col("pred"))
      .agg(count(lit(1)).as("n")))

  /** The report derived from an already-aggregated contingency table
    * (truth, pred, n). Split out because contingency cells are
    * ADDITIVE counts — exactly the shape IncrementalAgg maintains —
    * so a continuously-updated model-quality report is this function
    * over an incrementally-folded cell state, equal to the one-shot
    * run by associativity (oracled as q_eval_report_inc).
    */
  def reportFromCells(cells: DataFrame): DataFrame = {
    // NULL is a class like any other here: the diagonal and the
    // marginal joins use null-safe equality, so NULL-labeled rows
    // fold into ONE consistent report row instead of splitting into
    // a phantom truth group and a phantom pred group.
    val tp = cells.filter(col("truth") <=> col("pred"))
      .select(col("truth").as("tp_label"), col("n").as("tp"))
    val byTruth = cells.groupBy(col("truth").as("t_label"))
      .agg(sum(col("n")).as("n_truth"))
    val byPred = cells.groupBy(col("pred").as("p_label"))
      .agg(sum(col("n")).as("n_pred"))
    // one floor division per metric, in DECIMAL(38,0) integral DIV:
    // tp*10000 passes 2^53 around tp ≈ 9e11 (plausible row counts at
    // 100 TB), where Column.divide's IEEE double path silently loses
    // integer precision — and tp*10000L itself can wrap a long
    def bp(num: String, den: String): Column = expr(
      s"""CASE WHEN $den = 0 THEN CAST(NULL AS BIGINT)
         |     ELSE CAST(CAST($num AS DECIMAL(38,0)) * 10000
         |               DIV CAST($den AS DECIMAL(38,0)) AS BIGINT) END""".stripMargin)
    byTruth
      .join(byPred, col("t_label") <=> col("p_label"), "full_outer")
      .join(tp, coalesce(col("t_label"), col("p_label")) <=> col("tp_label"), "left")
      .select(
        coalesce(col("t_label"), col("p_label")).as("label"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("n_truth"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"))
      .withColumn("precision_bp", bp("tp", "tp + fp"))
      .withColumn("recall_bp", bp("tp", "tp + fn"))
      .withColumn("f1_bp", bp("tp * 2", "tp * 2 + fp + fn"))
  }

  /** Per-GROUP calibration: [[calibration]] partitioned by a segment
    * column — bin(s) = ⌊rows_below(s)·nBins/n⌋ computed WITHIN each
    * group (rows_below and n are the group's own), so every segment
    * gets its full set of rank bands and the windows spread across
    * the cluster by group. The per-segment companion to
    * [[aucExactBy]]: a score can be calibrated on average and badly
    * mis-calibrated on one slice.
    *
    * Returns (grp, bin, n, n_pos, pos_rate_bp, min_score, max_score).
    */
  def calibrationBy(df: DataFrame, groupCol: Column, labelCol: Column,
      scoreCol: Column, nBins: Int = 10): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    val byScore = df
      .filter(labelCol.isNotNull)
      .select(groupCol.as("grp"), scoreCol.cast("long").as("score"),
        when(labelCol.cast("boolean"), 1L).otherwise(0L).as("p"))
      .groupBy(col("grp"), col("score"))
      .agg(sum(col("p")).as("n_pos"), count(lit(1)).as("n"))
    val w = Window.partitionBy(col("grp")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("rows_below", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("n_total", sum(col("n")).over(Window.partitionBy(col("grp"))))
      .withColumn("bin", expr(
        s"CAST(CAST(rows_below AS DECIMAL(38,0)) * $nBins DIV CAST(n_total AS DECIMAL(38,0)) AS BIGINT)"))
      .groupBy(col("grp"), col("bin"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("n_pos")).as("n_pos"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))
      .withColumn("pos_rate_bp", expr(
        """CAST(CAST(n_pos AS DECIMAL(38,0)) * 10000
          |     DIV CAST(n AS DECIMAL(38,0)) AS BIGINT)""".stripMargin))
      .select(col("grp"), col("bin"), col("n"), col("n_pos"), col("pos_rate_bp"),
        col("min_score"), col("max_score"))
  }

  /** Operating-threshold selection: the SMALLEST score cutoff t such
    * that predicting positive on score ≥ t achieves the target
    * precision — how a curation classifier's gate is actually picked
    * ("keep docs the model is ≥95% sure about"). Smallest because
    * among qualifying cutoffs it keeps the most rows (highest recall
    * at the required precision). Precision can be non-monotone in t,
    * so the argmin is over the explicit cumulative curve, not a
    * binary search.
    *
    * Same grouped-distribution shape as aucExact: one score-keyed
    * combine, a |distinct scores| descending running sum, exact
    * DECIMAL basis points. Returns ONE row
    * (threshold, tp, fp, precision_bp, n_kept) — all-NULL when no
    * cutoff reaches the target.
    */
  def precisionThreshold(df: DataFrame, labelCol: Column, scoreCol: Column,
      targetBp: Long, maxDistinctScores: Long = 4000000L): DataFrame = {
    require(targetBp >= 0 && targetBp <= 10000, "target precision is basis points in [0, 10000]")
    val byScore = df
      .filter(labelCol.isNotNull)
      .select(scoreCol.cast("long").as("score"),
        when(labelCol.cast("boolean"), 1L).otherwise(0L).as("p"))
      .groupBy(col("score"))
      .agg(sum(col("p")).as("n_pos"), sum(lit(1L) - col("p")).as("n_neg"))
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = byScore
      .withColumn("tp", sum(col("n_pos")).over(w) +
        distinctScoreGuard(row_number().over(Window.orderBy(col("score").desc)),
          maxDistinctScores, "precisionThreshold"))
      .withColumn("fp", sum(col("n_neg")).over(w))
      .withColumn("precision_bp", expr(
        """CAST(CAST(tp AS DECIMAL(38,0)) * 10000
          |     DIV CAST(tp + fp AS DECIMAL(38,0)) AS BIGINT)""".stripMargin))
    cum.filter(col("precision_bp") >= targetBp)
      .agg(min(col("score")).as("threshold"))
      .join(cum, col("threshold") === col("score"), "left")
      .select(col("threshold"), col("tp"), col("fp"), col("precision_bp"),
        (col("tp") + col("fp")).as("n_kept"))
  }

  /** Score-calibration table: does a higher score actually mean a
    * higher positive rate? Rows are bucketed into `nBins` rank bands
    * of the score distribution and each band reports its exact
    * positive rate in basis points.
    *
    * Binning is defined on the GROUPED distribution, not per row:
    * bin(s) = ⌊rows_below(s) · nBins / n⌋, so every row with the same
    * score lands in the same bin — deterministic on any engine, no
    * per-row tiebreak, and no global row sort. The plan is the
    * aucExact shape: one map-side-combined groupBy(score), a
    * |distinct scores|-sized running-sum window, and a second small
    * aggregation — the same cost at 100 TB as at 1 GB once the score
    * domain is bounded (integral scores). Under heavy ties bins can
    * be unequal-sized or empty (a value band holds all its rows);
    * emitted bins are exactly those that own ≥1 row.
    *
    * Returns (bin, n, n_pos, pos_rate_bp, min_score, max_score),
    * pos_rate_bp = ⌊10⁴·n_pos/n⌋ via integral DECIMAL division.
    */
  def calibration(df: DataFrame, labelCol: Column, scoreCol: Column,
      nBins: Int = 10, maxDistinctScores: Long = 4000000L): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    val byScore = df
      .filter(labelCol.isNotNull)
      .select(scoreCol.cast("long").as("score"),
        when(labelCol.cast("boolean"), 1L).otherwise(0L).as("p"))
      .groupBy(col("score"))
      .agg(sum(col("p")).as("n_pos"), count(lit(1)).as("n"))
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("rows_below", coalesce(sum(col("n")).over(w), lit(0L)) +
        distinctScoreGuard(row_number().over(Window.orderBy(col("score"))),
          maxDistinctScores, "calibration"))
      .withColumn("n_total", sum(col("n")).over(Window.partitionBy()))
      // ⌊rows_below·nBins/n⌋ in decimal: rows_below·nBins wraps a long
      // once n ≳ 9e17/nBins — the same silent-overflow class as AUC
      .withColumn("bin", expr(
        s"CAST(CAST(rows_below AS DECIMAL(38,0)) * $nBins DIV CAST(n_total AS DECIMAL(38,0)) AS BIGINT)"))
      .groupBy(col("bin"))
      .agg(
        sum(col("n")).as("n"),
        sum(col("n_pos")).as("n_pos"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))
      .withColumn("pos_rate_bp", expr(
        """CAST(CAST(n_pos AS DECIMAL(38,0)) * 10000
          |     DIV CAST(n AS DECIMAL(38,0)) AS BIGINT)""".stripMargin))
      .select(col("bin"), col("n"), col("n_pos"), col("pos_rate_bp"),
        col("min_score"), col("max_score"))
  }

  /** Cohen's kappa between two labelings (truth vs prediction, or two
    * classifiers): chance-corrected agreement, exact in cross-
    * multiplied basis points. From the same one-pass contingency as
    * classificationReport: with n = Σ cells, observed Σtp and
    * expected Σ(n_truth·n_pred),
    * κ = (n·Σtp − Σ(nt·np)) / (n² − Σ(nt·np)) — one integral division
    * over DECIMAL(38,0) products (n² wraps a long past n ≈ 3e9).
    * κ may be negative (worse than chance); the division TRUNCATES
    * toward zero (Spark DIV semantics — a floor-division engine must
    * sign-fold to match). NULL labels fold in null-safely, matching
    * classificationReport.
    *
    * Returns one row: (n, observed_agree, kappa_bp); κ of a
    * constant-label degenerate table (denominator 0) is NULL.
    */
  def cohensKappa(df: DataFrame, truthCol: Column, predCol: Column): DataFrame = {
    val cells = df
      .select(truthCol.as("truth"), predCol.as("pred"))
      .groupBy(col("truth"), col("pred"))
      .agg(count(lit(1)).as("n"))
    val byTruth = cells.groupBy(col("truth").as("t_label"))
      .agg(sum(col("n")).as("n_truth"))
    val byPred = cells.groupBy(col("pred").as("p_label"))
      .agg(sum(col("n")).as("n_pred"))
    val expected = byTruth
      .join(byPred, col("t_label") <=> col("p_label"), "inner")
      .agg(coalesce(sum(expr(
        "CAST(n_truth AS DECIMAL(38,0)) * CAST(n_pred AS DECIMAL(38,0))")),
        lit(0).cast("decimal(38,0)")).as("sum_exp"))
    cells
      .agg(
        sum(col("n")).as("n"),
        coalesce(sum(when(col("truth") <=> col("pred"), col("n"))), lit(0L))
          .as("observed_agree"))
      .crossJoin(expected)
      .withColumn("kappa_bp", expr(
        """CASE WHEN CAST(n AS DECIMAL(38,0)) * n - sum_exp = 0 THEN CAST(NULL AS BIGINT)
          |     ELSE CAST((CAST(n AS DECIMAL(38,0)) * observed_agree - sum_exp) * 10000
          |               DIV (CAST(n AS DECIMAL(38,0)) * n - sum_exp) AS BIGINT) END""".stripMargin))
      .select(col("n"), col("observed_agree"), col("kappa_bp"))
  }
}
