package graft

import graft.pipeline._
import graft.sources.{IncrementalReader, TableLoader, UpsertWriter}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline slice 1: text analysis, quality, dedup families, sketches — one trait of the linear
  * [[Queries]] stack; see Queries.scala for the registry and the
  * catalog-wide numeric policy.
  */
trait LlmCurationQueries extends StreamingQueries {

  // ---------------------------------------------------------------

  protected val enStops = graft.operators.TextAnalysis.Stopwords.toMap.apply("en")
  protected def duckList(words: Seq[String]): String = words.map(w => s"'$w'").mkString("[", ", ", "]")
  protected def duckHits(words: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), x -> list_contains(${duckList(words)}, x)))"

  /** #32 Token counting: whitespace and BPE-ish regex tokens. */
  val qTextTokens: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.TextAnalysis.withTokenCounts(t(s, dir, "documents"))
        .select(col("doc_id"), col("ws_tokens").cast("long").as("ws_tokens"),
          col("bpe_ish_tokens").cast("long").as("bpe_ish_tokens")),
    oracle = Some(
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_ish_tokens
        |FROM documents""".stripMargin))

  /** #31 Quality scoring: length/token/stopword metrics + composite. */
  val qTextQuality: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.TextAnalysis.withQuality(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_chars"), col("n_tokens"),
          col("avg_token_len"), col("stopword_ratio"), col("quality_score")),
    oracle = Some(
      s"""WITH q AS (
         |  SELECT doc_id,
         |    length(text) AS nc,
         |    len(string_split(text, ' ')) AS nt,
         |    ${duckHits(enStops)} AS hits
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CAST(nc AS BIGINT) AS n_chars,
         |  CAST(nt AS BIGINT) AS n_tokens,
         |  CAST(nc - (nt - 1) AS DOUBLE) / nt AS avg_token_len,
         |  CAST(hits AS DOUBLE) / nt AS stopword_ratio,
         |  least(1.0, (CAST(nt AS DOUBLE) / 100) * 0.5 + ((CAST(hits AS DOUBLE) / nt) * 5) * 0.5) AS quality_score
         |FROM q""".stripMargin))

  /** Shared DuckDB re-derivation of the stopword-vote language ID:
    * the h/m CTE block and the winner CASE — used by the langid
    * query and by its classification-report evaluation (#84b).
    */
  protected val langidCtes: String = {
    val hits = graft.operators.TextAnalysis.Stopwords
      .map { case (code, words) => s"${duckHits(words)} AS c_$code" }
      .mkString(",\n    ")
    val codes = graft.operators.TextAnalysis.Stopwords.map(_._1)
    s"""h AS (
       |  SELECT doc_id, lang, $hits
       |  FROM documents
       |), m AS (
       |  SELECT *, greatest(${codes.map("c_" + _).mkString(", ")}) AS m FROM h
       |)""".stripMargin
  }
  protected val langidCase: String = {
    val whens = graft.operators.TextAnalysis.Stopwords.map(_._1)
      .map(c => s"WHEN c_$c = m THEN '$c'").mkString(" ")
    s"CASE WHEN m = 0 THEN 'und' $whens ELSE 'und' END"
  }

  /** #30 Language ID by stopword voting; deterministic tie-break. */
  val qTextLangid: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.TextAnalysis.withLangId(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("lang_pred")),
    oracle = Some(
      s"""WITH $langidCtes
         |SELECT doc_id, lang,
         |  $langidCase AS lang_pred
         |FROM m""".stripMargin))

  /** #84b Classification report of the langid heuristic against the
    * corpus truth label: per-class (tp, fp, fn) from one contingency
    * pass, precision/recall/F1 in floor-divided basis points — all
    * integer arithmetic, so the whole evaluation hash-matches DuckDB
    * (see [[graft.operators.Evaluation.classificationReport]]).
    */
  val qEvalLangid: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.classificationReport(
        graft.operators.TextAnalysis.withLangId(t(s, dir, "documents")),
        col("lang"), col("lang_pred")),
    oracle = Some(
      s"""WITH $langidCtes, p AS (
         |  SELECT lang AS truth, $langidCase AS pred FROM m
         |), cells AS (
         |  SELECT truth, pred, count(*) AS n FROM p GROUP BY 1, 2
         |), tpx AS (
         |  SELECT truth AS label, n AS tp FROM cells WHERE truth = pred
         |), bt AS (
         |  SELECT truth AS label, sum(n) AS n_truth FROM cells GROUP BY 1
         |), bpp AS (
         |  SELECT pred AS label, sum(n) AS n_pred FROM cells GROUP BY 1
         |), j AS (
         |  SELECT coalesce(bt.label, bpp.label) AS label,
         |         coalesce(tpx.tp, 0) AS tp,
         |         coalesce(bpp.n_pred, 0) - coalesce(tpx.tp, 0) AS fp,
         |         coalesce(bt.n_truth, 0) - coalesce(tpx.tp, 0) AS fn
         |  FROM bt FULL JOIN bpp ON bt.label = bpp.label
         |  LEFT JOIN tpx ON coalesce(bt.label, bpp.label) = tpx.label
         |)
         |SELECT label, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
         |  CAST(fn AS BIGINT) AS fn,
         |  CASE WHEN tp + fp = 0 THEN NULL
         |       ELSE CAST(tp * 10000 // (tp + fp) AS BIGINT) END AS precision_bp,
         |  CASE WHEN tp + fn = 0 THEN NULL
         |       ELSE CAST(tp * 10000 // (tp + fn) AS BIGINT) END AS recall_bp,
         |  CASE WHEN tp * 2 + fp + fn = 0 THEN NULL
         |       ELSE CAST(tp * 20000 // (tp * 2 + fp + fn) AS BIGINT) END AS f1_bp
         |FROM j""".stripMargin))

  /** #84f Incremental classification-report maintenance: the
    * contingency cells are ADDITIVE counts, so the model-quality
    * report stays current as batches arrive by folding each batch's
    * cells into the replay-safe IncrementalAgg state and deriving the
    * report from the stored cells — continuous eval monitoring at
    * O(batch) cost, never rescoring history. Associativity makes the
    * result equal the one-shot report bit-for-bit (SAME oracle as
    * q_eval_report); batch 2 is replayed to prove the fold is
    * exactly-once under at-least-once delivery.
    */
  val qEvalReportInc: QueryDef = QueryDef(
    run = (s, dir) => {
      val statePath = scratch("eval-report-inc")
      val scored = graft.operators.TextAnalysis.withLangId(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang").as("truth"), col("lang_pred").as("pred"),
          lit(1L).as("one"))
      def fold(batch: org.apache.spark.sql.DataFrame, id: Long) =
        graft.operators.IncrementalAgg.refreshTable(
          s, statePath, batch.drop("doc_id"), Seq("truth", "pred"), "one",
          batchId = Some(id))
      fold(scored.filter(col("doc_id") % 2 === 0), 1L)
      fold(scored.filter(col("doc_id") % 2 === 1), 2L)
      fold(scored.filter(col("doc_id") % 2 === 1), 2L) // replay: must be a no-op
      graft.operators.Evaluation.reportFromCells(
        graft.operators.IncrementalAgg.read(s, statePath, Seq("truth", "pred"))
          .select(col("truth"), col("pred"), col("n")))
    },
    oracle = qEvalLangid.oracle)

  /** #84g Operating-threshold selection: smallest word-count cutoff
    * at which the quality gate holds with ≥ 80% precision — the
    * highest-recall cutoff meeting the precision bar, from the exact
    * cumulative curve (precision is non-monotone, so this is an
    * argmin over the curve, not a binary search; see
    * [[graft.operators.Evaluation.precisionThreshold]]).
    */
  val qEvalThreshold: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.precisionThreshold(
        graft.operators.TextAnalysis.qualityLinear(t(s, dir, "documents")),
        col("q_pass"), col("n_words"), targetBp = 8000L),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), m AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS BIGINT) AS stop_hits
        |  FROM t
        |), f AS (
        |  SELECT n_words, stop_hits,
        |    CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END AS mwl10
        |  FROM m
        |), s AS (
        |  SELECT (2 * least(n_words, 100) + 25 * stop_hits - abs(mwl10 - 50)) >= 220 AS label,
        |         n_words AS score
        |  FROM f
        |), bys AS (
        |  SELECT score,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
        |    sum(CASE WHEN label THEN 0 ELSE 1 END) AS n_neg
        |  FROM s GROUP BY score
        |), cum AS (
        |  SELECT score,
        |    sum(n_pos) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS tp,
        |    sum(n_neg) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS fp
        |  FROM bys
        |), curve AS (
        |  SELECT score, tp, fp, CAST(tp * 10000 // (tp + fp) AS BIGINT) AS precision_bp
        |  FROM cum
        |), best AS (
        |  SELECT min(score) AS threshold FROM curve WHERE precision_bp >= 8000
        |)
        |SELECT best.threshold,
        |  CAST(curve.tp AS BIGINT) AS tp, CAST(curve.fp AS BIGINT) AS fp,
        |  curve.precision_bp,
        |  CAST(curve.tp + curve.fp AS BIGINT) AS n_kept
        |FROM best LEFT JOIN curve ON curve.score = best.threshold""".stripMargin))

  /** #84 Exact ROC AUC of the linear quality score against the
    * is-English label, Mann-Whitney tie convention, computed on the
    * grouped score distribution (one aggregation + a
    * |distinct scores|-sized window — never row pairs; see
    * [[graft.operators.Evaluation.aucExact]]). Doubled-U numerator
    * and floor division keep it integer-exact end to end.
    */
  val qEvalAuc: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.aucExact(
        graft.operators.TextAnalysis.qualityLinear(t(s, dir, "documents")),
        col("lang") === "en", col("q_score"))
        .select(col("n_pos"), col("n_neg"), col("auc_bp")),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
        |), m AS (
        |  SELECT doc_id, lang,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS BIGINT) AS stop_hits
        |  FROM t
        |), f AS (
        |  SELECT doc_id, lang, n_words, stop_hits,
        |    CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END AS mwl10
        |  FROM m
        |), scored AS (
        |  SELECT (lang = 'en') AS label,
        |    2 * least(n_words, 100) + 25 * stop_hits - abs(mwl10 - 50) AS score
        |  FROM f
        |), bys AS (
        |  SELECT score,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
        |    sum(CASE WHEN label THEN 0 ELSE 1 END) AS n_neg
        |  FROM scored GROUP BY score
        |), r AS (
        |  SELECT *, coalesce(sum(n_neg) OVER (ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
        |  FROM bys
        |)
        |SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
        |       CAST(sum(n_neg) AS BIGINT) AS n_neg,
        |       CAST(sum(n_pos * (2 * neg_below + n_neg)) * 10000
        |            // (2 * sum(n_pos) * sum(n_neg)) AS BIGINT) AS auc_bp
        |FROM r""".stripMargin))

  /** #84e Per-segment exact ROC AUC (grouped by `source`): the slice
    * view that catches a classifier that's great on average and
    * broken on one segment. The running-sum window partitions by the
    * group — the preferred scale shape whenever a segmentation
    * exists (see [[graft.operators.Evaluation.aucExactBy]]).
    */
  val qEvalAucBy: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.aucExactBy(
        graft.operators.TextAnalysis.qualityLinear(t(s, dir, "documents")),
        col("source"), col("lang") === "en", col("q_score"))
        .select(col("grp").as("source"), col("n_pos"), col("n_neg"), col("auc_bp")),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM documents
        |), m AS (
        |  SELECT doc_id, lang, source,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS BIGINT) AS stop_hits
        |  FROM t
        |), f AS (
        |  SELECT doc_id, lang, source, n_words, stop_hits,
        |    CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END AS mwl10
        |  FROM m
        |), scored AS (
        |  SELECT source, (lang = 'en') AS label,
        |    2 * least(n_words, 100) + 25 * stop_hits - abs(mwl10 - 50) AS score
        |  FROM f
        |), bys AS (
        |  SELECT source, score,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
        |    sum(CASE WHEN label THEN 0 ELSE 1 END) AS n_neg
        |  FROM scored GROUP BY 1, 2
        |), r AS (
        |  SELECT *, coalesce(sum(n_neg) OVER (PARTITION BY source ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
        |  FROM bys
        |)
        |SELECT source,
        |  CAST(sum(n_pos) AS BIGINT) AS n_pos,
        |  CAST(sum(n_neg) AS BIGINT) AS n_neg,
        |  CASE WHEN sum(n_pos) = 0 OR sum(n_neg) = 0 THEN NULL
        |       ELSE CAST(sum(n_pos * (2 * neg_below + n_neg)) * 10000
        |                 // (2 * sum(n_pos) * sum(n_neg)) AS BIGINT) END AS auc_bp
        |FROM r GROUP BY source""".stripMargin))

  /** #85 Exact average precision (PR-AUC) of the linear quality score
    * against the is-English label — the imbalance-robust companion to
    * #84: step-interpolated AP with one threshold per distinct score
    * (tied rows enter as one block), computed on the grouped score
    * distribution with per-block precision floor-quantized to 10⁻¹²
    * (see [[graft.operators.Evaluation.averagePrecision]]).
    */
  val qEvalPrAuc: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.averagePrecision(
        graft.operators.TextAnalysis.qualityLinear(t(s, dir, "documents")),
        col("lang") === "en", col("q_score")),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
        |), m AS (
        |  SELECT doc_id, lang,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS BIGINT) AS stop_hits
        |  FROM t
        |), f AS (
        |  SELECT doc_id, lang, n_words, stop_hits,
        |    CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END AS mwl10
        |  FROM m
        |), scored AS (
        |  SELECT (lang = 'en') AS label,
        |    2 * least(n_words, 100) + 25 * stop_hits - abs(mwl10 - 50) AS score
        |  FROM f
        |), bys AS (
        |  SELECT score,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
        |    sum(CASE WHEN label THEN 0 ELSE 1 END) AS n_neg
        |  FROM scored GROUP BY score
        |), cum AS (
        |  SELECT n_pos, n_neg,
        |    sum(n_pos) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS tp,
        |    sum(n_neg) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS fp
        |  FROM bys
        |), q AS (
        |  SELECT n_pos, n_neg,
        |    CAST(tp AS HUGEINT) * 1000000000000 // (tp + fp) AS prec_q12
        |  FROM cum
        |)
        |SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
        |       CAST(sum(n_neg) AS BIGINT) AS n_neg,
        |       CAST(sum(CAST(n_pos AS HUGEINT) * prec_q12) * 10000
        |            // (CAST(sum(n_pos) AS HUGEINT) * 1000000000000) AS BIGINT) AS ap_bp
        |FROM q""".stripMargin))

  /** #85b Per-segment exact average precision (grouped by `source`):
    * the PR-side slice view matching #84e — per-segment windows are
    * the preferred scale shape (see
    * [[graft.operators.Evaluation.averagePrecisionBy]]).
    */
  val qEvalPrAucBy: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.averagePrecisionBy(
        graft.operators.TextAnalysis.qualityLinear(t(s, dir, "documents")),
        col("source"), col("lang") === "en", col("q_score"))
        .select(col("grp").as("source"), col("n_pos"), col("n_neg"), col("ap_bp")),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM documents
        |), m AS (
        |  SELECT doc_id, lang, source,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS BIGINT) AS stop_hits
        |  FROM t
        |), f AS (
        |  SELECT doc_id, lang, source, n_words, stop_hits,
        |    CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END AS mwl10
        |  FROM m
        |), scored AS (
        |  SELECT source, (lang = 'en') AS label,
        |    2 * least(n_words, 100) + 25 * stop_hits - abs(mwl10 - 50) AS score
        |  FROM f
        |), bys AS (
        |  SELECT source, score,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
        |    sum(CASE WHEN label THEN 0 ELSE 1 END) AS n_neg
        |  FROM scored GROUP BY 1, 2
        |), cum AS (
        |  SELECT source, n_pos, n_neg,
        |    sum(n_pos) OVER (PARTITION BY source ORDER BY score DESC
        |      ROWS UNBOUNDED PRECEDING) AS tp,
        |    sum(n_neg) OVER (PARTITION BY source ORDER BY score DESC
        |      ROWS UNBOUNDED PRECEDING) AS fp
        |  FROM bys
        |), q AS (
        |  SELECT source, n_pos, n_neg,
        |    CAST(tp AS HUGEINT) * 1000000000000 // (tp + fp) AS prec_q12
        |  FROM cum
        |)
        |SELECT source,
        |  CAST(sum(n_pos) AS BIGINT) AS n_pos,
        |  CAST(sum(n_neg) AS BIGINT) AS n_neg,
        |  CASE WHEN sum(n_pos) = 0 OR sum(n_neg) = 0 THEN NULL
        |       ELSE CAST(sum(CAST(n_pos AS HUGEINT) * prec_q12) * 10000
        |            // (CAST(sum(n_pos) AS HUGEINT) * 1000000000000) AS BIGINT) END AS ap_bp
        |FROM q GROUP BY source""".stripMargin))

  /** #84c Score-calibration table: the quality score rank-bucketed
    * into 10 bands on the grouped distribution (bin(s) =
    * ⌊rows_below(s)·10/n⌋ — all rows of one score share a bin, no
    * per-row tiebreak, no global row sort), per-band exact positive
    * rate in basis points (see [[graft.operators.Evaluation.calibration]]).
    */
  val qEvalCalibration: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.calibration(
        graft.operators.TextAnalysis.qualityLinear(t(s, dir, "documents")),
        col("lang") === "en", col("q_score"), nBins = 10),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
        |), m AS (
        |  SELECT doc_id, lang,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS BIGINT) AS stop_hits
        |  FROM t
        |), f AS (
        |  SELECT doc_id, lang, n_words, stop_hits,
        |    CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END AS mwl10
        |  FROM m
        |), scored AS (
        |  SELECT (lang = 'en') AS label,
        |    2 * least(n_words, 100) + 25 * stop_hits - abs(mwl10 - 50) AS score
        |  FROM f
        |), bys AS (
        |  SELECT score,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
        |    count(*) AS n
        |  FROM scored GROUP BY score
        |), r AS (
        |  SELECT *,
        |    coalesce(sum(n) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rows_below,
        |    sum(n) OVER () AS n_total
        |  FROM bys
        |), b AS (
        |  SELECT rows_below * 10 // n_total AS bin, n, n_pos, score FROM r
        |)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |  CAST(sum(n) AS BIGINT) AS n,
        |  CAST(sum(n_pos) AS BIGINT) AS n_pos,
        |  CAST(sum(n_pos) * 10000 // sum(n) AS BIGINT) AS pos_rate_bp,
        |  CAST(min(score) AS BIGINT) AS min_score,
        |  CAST(max(score) AS BIGINT) AS max_score
        |FROM b GROUP BY bin""".stripMargin))

  /** #84h Per-segment calibration (grouped by `source`, 4 bands):
    * each segment gets its own rank bands over ITS score
    * distribution — a score calibrated on average can be
    * mis-calibrated on one slice (see
    * [[graft.operators.Evaluation.calibrationBy]]).
    */
  val qEvalCalibrationBy: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.calibrationBy(
        graft.operators.TextAnalysis.qualityLinear(t(s, dir, "documents")),
        col("source"), col("lang") === "en", col("q_score"), nBins = 4)
        .withColumnRenamed("grp", "source"),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM documents
        |), m AS (
        |  SELECT doc_id, lang, source,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS BIGINT) AS stop_hits
        |  FROM t
        |), f AS (
        |  SELECT doc_id, lang, source, n_words, stop_hits,
        |    CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END AS mwl10
        |  FROM m
        |), scored AS (
        |  SELECT source, (lang = 'en') AS label,
        |    2 * least(n_words, 100) + 25 * stop_hits - abs(mwl10 - 50) AS score
        |  FROM f
        |), bys AS (
        |  SELECT source, score,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
        |    count(*) AS n
        |  FROM scored GROUP BY 1, 2
        |), r AS (
        |  SELECT *,
        |    coalesce(sum(n) OVER (PARTITION BY source ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rows_below,
        |    sum(n) OVER (PARTITION BY source) AS n_total
        |  FROM bys
        |), b AS (
        |  SELECT source, rows_below * 4 // n_total AS bin, n, n_pos, score FROM r
        |)
        |SELECT source, CAST(bin AS BIGINT) AS bin,
        |  CAST(sum(n) AS BIGINT) AS n,
        |  CAST(sum(n_pos) AS BIGINT) AS n_pos,
        |  CAST(sum(n_pos) * 10000 // sum(n) AS BIGINT) AS pos_rate_bp,
        |  CAST(min(score) AS BIGINT) AS min_score,
        |  CAST(max(score) AS BIGINT) AS max_score
        |FROM b GROUP BY source, bin""".stripMargin))

  /** #84d Cohen's kappa of the langid heuristic vs the truth label:
    * chance-corrected agreement from the same contingency pass as the
    * classification report, cross-multiplied exact, division
    * truncating toward zero on BOTH engines (DuckDB's `//` floors, so
    * the oracle sign-folds; see [[graft.operators.Evaluation.cohensKappa]]).
    */
  val qEvalKappa: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.cohensKappa(
        graft.operators.TextAnalysis.withLangId(t(s, dir, "documents")),
        col("lang"), col("lang_pred")),
    oracle = Some(
      s"""WITH $langidCtes, p AS (
         |  SELECT lang AS truth, $langidCase AS pred FROM m
         |), cells AS (
         |  SELECT truth, pred, count(*) AS n FROM p GROUP BY 1, 2
         |), bt AS (
         |  SELECT truth AS label, sum(n) AS n_truth FROM cells GROUP BY 1
         |), bpp AS (
         |  SELECT pred AS label, sum(n) AS n_pred FROM cells GROUP BY 1
         |), ex AS (
         |  SELECT coalesce(sum(n_truth * n_pred), 0) AS sum_exp
         |  FROM bt JOIN bpp ON bt.label = bpp.label
         |), ag AS (
         |  SELECT sum(n) AS n,
         |    coalesce(sum(n) FILTER (truth = pred), 0) AS observed_agree
         |  FROM cells
         |)
         |SELECT CAST(n AS BIGINT) AS n,
         |  CAST(observed_agree AS BIGINT) AS observed_agree,
         |  CASE WHEN n * n - sum_exp = 0 THEN NULL
         |       WHEN n * observed_agree - sum_exp < 0 THEN
         |         CAST(-((-(n * observed_agree - sum_exp)) * 10000
         |               // (n * n - sum_exp)) AS BIGINT)
         |       ELSE
         |         CAST((n * observed_agree - sum_exp) * 10000
         |              // (n * n - sum_exp) AS BIGINT) END AS kappa_bp
         |FROM ag, ex""".stripMargin))

  /** #33 Fingerprint: 64-bit FNV-1a rolling hash (custom codegen'd
    * expression), fully oracled: the hash is deterministic integer
    * arithmetic, so DuckDB re-derives it from first principles —
    * normalize, expand codepoints to UTF-8 bytes (1–4 byte
    * sequences), then fold h = (h XOR byte) · prime in HUGEINT with
    * an explicit mod-2⁶⁴ wrap (the XOR only ever touches the low
    * byte, so it runs in BIGINT on acc%256), and re-sign the result
    * into BIGINT range at the end.
    */
  val qTextFingerprint: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.TextAnalysis.withFingerprint(t(s, dir, "documents"))
        .select(col("doc_id"), col("fingerprint")),
    oracle = Some(
      """WITH norm AS (
        |  SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS s FROM documents
        |), by AS (
        |  SELECT doc_id, flatten(list_transform(range(1, length(s)+1), i -> CASE
        |    WHEN unicode(s[i]) < 128 THEN [unicode(s[i])]
        |    WHEN unicode(s[i]) < 2048 THEN
        |      [192 + unicode(s[i]) // 64, 128 + unicode(s[i]) % 64]
        |    WHEN unicode(s[i]) < 65536 THEN
        |      [224 + unicode(s[i]) // 4096, 128 + (unicode(s[i]) // 64) % 64,
        |       128 + unicode(s[i]) % 64]
        |    ELSE
        |      [240 + unicode(s[i]) // 262144, 128 + (unicode(s[i]) // 4096) % 64,
        |       128 + (unicode(s[i]) // 64) % 64, 128 + unicode(s[i]) % 64]
        |  END)) AS bs
        |  FROM norm
        |), fp AS (
        |  SELECT doc_id, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |                 list_transform(bs, b -> CAST(b AS HUGEINT))),
        |    (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                 * 1099511628211) % 18446744073709551616
        |  ) AS h
        |  FROM by
        |)
        |SELECT doc_id,
        |  CAST(h - CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |                THEN CAST(18446744073709551616 AS HUGEINT)
        |                ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS fingerprint
        |FROM fp""".stripMargin))

  /** #23 Exact dedup: lowest doc_id survives per identical text. */
  val qDedupExact: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Dedup.exact(t(s, dir, "documents"), "text", "doc_id"),
    oracle = Some(
      """SELECT doc_id, text, lang, source, n_chars FROM (
        |  SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM documents
        |) WHERE rn = 1""".stripMargin))

  /** #26 Word-5-gram Jaccard near-dup pairs (inverted-index join). */
  val qDedupNgramJaccard: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text", n = 5, threshold = 0.5),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), s AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' '))) AS sh
        |  FROM t
        |), sizes AS (
        |  SELECT doc_id, count(*) AS nsh FROM s GROUP BY doc_id
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b,
        |       CAST(common AS DOUBLE) / (sa.nsh + sb.nsh - common) AS jaccard
        |FROM pairs
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE CAST(common AS DOUBLE) / (sa.nsh + sb.nsh - common) >= 0.5""".stripMargin))

  /** #26d Prefix-filtered Jaccard pairs (PPJoin): provably EXACT
    * result of the full inverted-index join from a fraction of the
    * candidate space — the oracle is therefore dedup_ngram_jaccard's
    * oracle verbatim.
    */
  val qDedupPrefix: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Dedup.prefixFilteredJaccardPairs(
        t(s, dir, "documents"), "doc_id", "text", n = 5, threshold = 0.5),
    oracle = qDedupNgramJaccard.oracle)

  /** #26b Edit-distance near-dup pairs: shingle-Jaccard candidates
    * (>= 0.2) verified by bounded Levenshtein (<= 30). Spark trades
    * hashed 8-byte shingles and short-circuits the DP at the
    * threshold; the oracle re-runs BOTH defining filters on raw
    * strings.
    */
  val qDedupEditdist: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Dedup.editDistancePairs(t(s, dir, "documents"), "doc_id", "text"),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
        |), s AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' '))) AS sh
        |  FROM t
        |), sizes AS (
        |  SELECT doc_id, count(*) AS nsh FROM s GROUP BY doc_id
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), cand AS (
        |  SELECT doc_a, doc_b FROM pairs
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE CAST(common AS DOUBLE) / (sa.nsh + sb.nsh - common) >= 0.2
        |)
        |SELECT c.doc_a, c.doc_b,
        |       CAST(levenshtein(ta.text, tb.text) AS INT) AS edit_dist
        |FROM cand c
        |JOIN t ta ON ta.doc_id = c.doc_a
        |JOIN t tb ON tb.doc_id = c.doc_b
        |WHERE levenshtein(ta.text, tb.text) <= 30""".stripMargin))

  /** #26c Containment near-dup pairs (one-sided Jaccard >= 0.8):
    * ordered "a mostly inside b" — the metric that catches
    * quote-and-expand duplication symmetric Jaccard misses.
    */
  val qDedupContainment: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Dedup.containmentPairs(
        t(s, dir, "documents"), "doc_id", "text", n = 5, threshold = 0.8),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), s AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' '))) AS sh
        |  FROM t
        |), sizes AS (
        |  SELECT doc_id, count(*) AS nsh FROM s GROUP BY doc_id
        |), pairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), j AS (
        |  SELECT da, db, common, sa.nsh AS nsh_a, sb.nsh AS nsh_b
        |  FROM pairs JOIN sizes sa ON sa.doc_id = da
        |             JOIN sizes sb ON sb.doc_id = db
        |), dirs AS (
        |  SELECT da AS doc_a, db AS doc_b,
        |         CAST(common AS DOUBLE) / nsh_a AS containment FROM j
        |  UNION ALL
        |  SELECT db, da, CAST(common AS DOUBLE) / nsh_b FROM j
        |)
        |SELECT doc_a, doc_b, containment FROM dirs
        |WHERE containment >= 0.8""".stripMargin))

  /** #24 MinHash LSH near-dup pairs, fully oracled: "approximate"
    * here means approximate RECALL of true near-dups — the pipeline
    * itself (FNV word hashes → 5-gram mix-chain shingles → 64
    * splitmix minima → 16 folded band keys → candidate join → exact
    * Jaccard verify) is deterministic integer arithmetic end to end,
    * so DuckDB re-derives the same candidate set and the same
    * verified pairs from first principles. The splitmix mixer's
    * 64-bit wrapping multiplies exceed int128, so the oracle (built
    * by `minhashOracleSql`) decomposes them into 32-bit halves and
    * materializes each mix step as its own CTE stage (inline lateral
    * aliases re-expand exponentially across the 5-mix chain).
    * Signature minima compare in SIGNED order via a top-bit flip,
    * matching the JVM kernel's Long comparisons.
    */
  val qDedupMinhashLsh: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text"),
    oracle = Some(minhashOracleSql))

  /** #24b Incremental MinHash-LSH near-dup: two batches fold into
    * persisted band/set state (one marker-committed version per
    * refresh); each refresh pairs only the batch against
    * state-so-far. The union of refresh emissions must equal the
    * one-shot pair set — SAME exact oracle as dedup_minhash_lsh.
    * Batch 2's emission is taken from an at-least-once REPLAY of the
    * batch: the replay appends no state and re-derives the original
    * emission from the version it was applied as, so a duplicated
    * band row or a lost/duplicated pair would fail the oracle hash.
    */
  val qDedupMinhashInc: QueryDef = QueryDef(
    run = (s, dir) => {
      val statePath = scratch("minhash-inc-state")
      val docs = t(s, dir, "documents")
      val p1 = graft.operators.Dedup.minhashLshIncremental(
        statePath, docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        batchId = Some(1L))
      graft.operators.Dedup.minhashLshIncremental(
        statePath, docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        batchId = Some(2L))
      val p2replayed = graft.operators.Dedup.minhashLshIncremental(
        statePath, docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        batchId = Some(2L))
      p1.unionByName(p2replayed)
    },
    oracle = Some(minhashOracleSql))

  /** #22o Streaming near-dup dedup-on-ingest: documents staged as 4
    * hash-split micro-batches stream through
    * `EventStream.streamNearDup` — each batch folds into the
    * persisted LSH state and emits the pairs involving it, written
    * idempotently per batch id. A pair surfaces exactly once (when
    * its later member arrives), so the union over batches equals the
    * one-shot LSH pair set and the SAME exact DuckDB oracle as
    * `dedup_minhash_lsh` applies — batch boundaries provably don't
    * change the answer.
    */
  val qStreamNearDup: QueryDef = QueryDef(
    run = (s, dir) => {
      val state = scratch("stream-neardup-state")
      // the durable source checkpoint is a SIBLING of the state dir —
      // scratch it with the state or a prior run's bookkeeping
      // references a dead staged-source path (see q_stream_inc_agg)
      scratch("stream-neardup-state_ckpt")
      val out = scratch("stream-neardup-out")
      val split = graft.streaming.EventStream.splitDir(
        s, s"$dir/documents.parquet", 4, keyCol = "doc_id")
      graft.streaming.EventStream.streamNearDup(s, split, state, out,
        queryName = "graft_stream_neardup_" +
          java.util.UUID.randomUUID().toString.replace("-", ""))
      s.read.parquet(out).select(col("doc_a"), col("doc_b"), col("jaccard"))
    },
    oracle = Some(minhashOracleSql))

  /** Generates the dedup_minhash_lsh oracle (see there). Mirrors
    * `GraftHash.hashedShingles` + `MinHashMix.{mix,signature,bandKeys}`
    * with n=5, numHashes=64, bands=16, threshold=0.5.
    */
  protected def minhashOracleSqlWith(tail: String): String = {
    val M = "18446744073709551616"
    val B32 = "4294967296"
    val OFF = "14695981039346656037"
    val C1 = BigInt("11400714819323198485") // 0x9e3779b97f4a7c15
    val C2 = BigInt("13787848793156543929") // 0xbf58476d1ce4e5b9
    val C3 = BigInt("10723151780598845931") // 0x94d049bb133111eb
    val TOP = "9223372036854775808"
    def hi(c: BigInt) = c / 4294967296L
    def lo(c: BigInt) = c % 4294967296L
    // mix(h, s) over rows of `src`, one CTE per step; returns
    // (cteSql, lastCte, outCol)
    def mixCtes(name: String, src: String, keep: Seq[String], h: String, s: String)
        : (String, String, String) = {
      val k = keep.mkString(", ")
      val steps = Seq(
        s"${name}_1" -> s"SELECT $k, (($h) + ((CAST($s AS HUGEINT) + 1) * $C1) % $M) % $M AS z0 FROM $src",
        s"${name}_2" -> s"SELECT $k, xor(z0, z0 >> 30) AS x0 FROM ${name}_1",
        s"${name}_3" -> s"SELECT $k, x0 // $B32 AS ah, x0 % $B32 AS al FROM ${name}_2",
        s"${name}_4" -> s"SELECT $k, (((al * ${hi(C2)} + ah * ${lo(C2)}) % $B32) * $B32 + al * ${lo(C2)}) % $M AS z1 FROM ${name}_3",
        s"${name}_5" -> s"SELECT $k, xor(z1, z1 >> 27) AS x1 FROM ${name}_4",
        s"${name}_6" -> s"SELECT $k, x1 // $B32 AS ah, x1 % $B32 AS al FROM ${name}_5",
        s"${name}_7" -> s"SELECT $k, (((al * ${hi(C3)} + ah * ${lo(C3)}) % $B32) * $B32 + al * ${lo(C3)}) % $M AS z2 FROM ${name}_6",
        s"${name}_8" -> s"SELECT $k, xor(z2, z2 >> 31) AS mo FROM ${name}_7")
      (steps.map { case (n, q) => s"$n AS ($q)" }.mkString(",\n"), s"${name}_8", "mo")
    }
    val fnvWord =
      s"""list_reduce(
         |    list_prepend(CAST($OFF AS HUGEINT),
         |      list_transform(flatten(list_transform(range(1, length(w)+1), i -> CASE
         |        WHEN unicode(w[i]) < 128 THEN [unicode(w[i])]
         |        WHEN unicode(w[i]) < 2048 THEN [192 + unicode(w[i]) // 64, 128 + unicode(w[i]) % 64]
         |        WHEN unicode(w[i]) < 65536 THEN [224 + unicode(w[i]) // 4096, 128 + (unicode(w[i]) // 64) % 64, 128 + unicode(w[i]) % 64]
         |        ELSE [240 + unicode(w[i]) // 262144, 128 + (unicode(w[i]) // 4096) % 64, 128 + (unicode(w[i]) // 64) % 64, 128 + unicode(w[i]) % 64]
         |      END)), b -> CAST(b AS HUGEINT))),
         |    (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT))) * 1099511628211) % $M
         |  )""".stripMargin
    val parts = Seq.newBuilder[String]
    parts +=
      s"""ws AS (
         |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
         |), words AS (
         |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS wi, l[CAST(i AS INT)] AS w
         |  FROM (SELECT doc_id, l, unnest(range(1, len(l)+1)) AS i FROM ws)
         |), wh AS MATERIALIZED (
         |  SELECT doc_id, wi, $fnvWord AS uh FROM words
         |), windows AS MATERIALIZED (
         |  SELECT a0.doc_id, a0.wi AS p,
         |         a0.uh AS w0, a1.uh AS w1, a2.uh AS w2, a3.uh AS w3, a4.uh AS w4
         |  FROM wh a0
         |  JOIN wh a1 ON a1.doc_id = a0.doc_id AND a1.wi = a0.wi + 1
         |  JOIN wh a2 ON a2.doc_id = a0.doc_id AND a2.wi = a0.wi + 2
         |  JOIN wh a3 ON a3.doc_id = a0.doc_id AND a3.wi = a0.wi + 3
         |  JOIN wh a4 ON a4.doc_id = a0.doc_id AND a4.wi = a0.wi + 4
         |)""".stripMargin
    // shingle chain: h = OFF; for j in 0..4: h = mix(h ^ w_j, 5)
    var src = "windows"
    var h = s"CAST($OFF AS HUGEINT)"
    for (j <- 0 until 5) {
      val keep = Seq("doc_id", "p") ++ ((j + 1) until 5).map(i => s"w$i")
      val (sql, nsrc, out) = mixCtes(s"c$j", src, keep, s"xor($h, w$j)", "5")
      parts += sql; src = nsrc; h = out
    }
    parts +=
      s"""shingles AS MATERIALIZED (
         |  SELECT DISTINCT doc_id, $h AS sh FROM $src
         |), sigrows AS (
         |  SELECT doc_id, sh, r.s AS s FROM shingles, range(0, 64) r(s)
         |)""".stripMargin
    val (gSql, gSrc, gOut) = mixCtes("g", "sigrows", Seq("doc_id", "s"), "sh", "s")
    parts += gSql
    parts +=
      s"""sig AS MATERIALIZED (
         |  SELECT doc_id, s, xor(min(xor($gOut, CAST($TOP AS HUGEINT))), CAST($TOP AS HUGEINT)) AS sv
         |  FROM $gSrc GROUP BY doc_id, s
         |), bandp AS (
         |  SELECT doc_id, s // 4 AS band,
         |    min(CASE WHEN s % 4 = 0 THEN sv END) AS s0,
         |    min(CASE WHEN s % 4 = 1 THEN sv END) AS s1,
         |    min(CASE WHEN s % 4 = 2 THEN sv END) AS s2,
         |    min(CASE WHEN s % 4 = 3 THEN sv END) AS s3
         |  FROM sig GROUP BY doc_id, s // 4
         |)""".stripMargin
    // band fold: k = mix(band, 64); k = mix(k ^ s_i, band*4+i)
    src = "bandp"
    val (b0Sql, b0Src, b0Out) = mixCtes("b0", src,
      Seq("doc_id", "band", "s0", "s1", "s2", "s3"), "CAST(band AS HUGEINT)", "64")
    parts += b0Sql; src = b0Src
    var k = b0Out
    for (i <- 0 until 4) {
      val keep = Seq("doc_id", "band") ++ ((i + 1) until 4).map(j => s"s$j")
      val (sql, nsrc, out) = mixCtes(s"b${i + 1}", src, keep, s"xor($k, s$i)", s"band*4+$i")
      parts += sql; src = nsrc; k = out
    }
    parts +=
      s"""bkeys AS MATERIALIZED (
         |  SELECT doc_id, band, $k AS bkey FROM $src
         |), sets AS (
         |  SELECT doc_id, list(sh) AS hs, count(*) AS nsh FROM shingles GROUP BY doc_id
         |)""".stripMargin
    "WITH " + parts.result().mkString(",\n") + "\n" + tail
  }

  /** The one-corpus minhash oracle: within-table candidates (a < b). */
  protected def minhashOracleSql: String = minhashOracleSqlWith(
    """, cands AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bkeys a JOIN bkeys b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
      |)
      |SELECT doc_a, doc_b,
      |  CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
      |    / (CAST(sa.nsh + sb.nsh AS DOUBLE) - CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)) AS jaccard
      |FROM cands
      |JOIN sets sa ON sa.doc_id = doc_a
      |JOIN sets sb ON sb.doc_id = doc_b
      |WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
      |    / (CAST(sa.nsh + sb.nsh AS DOUBLE) - CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)) >= 0.5""".stripMargin)

  /** The cross-corpus (fuzzy-decontamination) tail: candidates join
    * the train side (doc_id % 10 <> 0) against the holdout side
    * (doc_id % 10 = 0) on band keys — no a<b ordering.
    */
  protected def minhashCrossOracleSql: String = minhashOracleSqlWith(
    """, cands AS (
      |  SELECT DISTINCT a.doc_id AS train_id, b.doc_id AS holdout_id
      |  FROM bkeys a JOIN bkeys b ON a.band = b.band AND a.bkey = b.bkey
      |  WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
      |)
      |SELECT train_id, holdout_id,
      |  CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
      |    / (CAST(sa.nsh + sb.nsh AS DOUBLE) - CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)) AS jaccard
      |FROM cands
      |JOIN sets sa ON sa.doc_id = train_id
      |JOIN sets sb ON sb.doc_id = holdout_id
      |WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
      |    / (CAST(sa.nsh + sb.nsh AS DOUBLE) - CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)) >= 0.5""".stripMargin)

  /** #45c Fuzzy benchmark decontamination: training docs flagged as
    * MinHash-LSH near-duplicates of holdout docs — the
    * paraphrase-robust complement of the exact shared-8-gram gate
    * (#45). Same deterministic kernel as dedup_minhash_lsh, so the
    * whole pipeline (both corpora banded, cross-candidates, exact
    * Jaccard verify) is re-derived from first principles in DuckDB.
    */
  val qDecontamFuzzy: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Curation.decontaminateFuzzy(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0))
    },
    oracle = Some(minhashCrossOracleSql))

  /** #25 SimHash near-dup pairs (Hamming <= 3 via 16-bit banding),
    * fully oracled: the 4×16-bit pigeonhole banding provably catches
    * EVERY pair at Hamming ≤ 3, so the output is exactly the set
    * {(a,b) : a < b, hamming(sig_a, sig_b) ≤ 3} — and the signature
    * is deterministic integer arithmetic DuckDB re-derives from first
    * principles (per-token FNV fold as in `text_fingerprint`, 64 bit
    * tallies, sign bits assembled in HUGEINT and re-signed).
    */
  val qDedupSimhash: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text"),
    oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |), by AS (
        |  SELECT doc_id, flatten(list_transform(range(1, length(tok)+1), i -> CASE
        |    WHEN unicode(tok[i]) < 128 THEN [unicode(tok[i])]
        |    WHEN unicode(tok[i]) < 2048 THEN
        |      [192 + unicode(tok[i]) // 64, 128 + unicode(tok[i]) % 64]
        |    WHEN unicode(tok[i]) < 65536 THEN
        |      [224 + unicode(tok[i]) // 4096, 128 + (unicode(tok[i]) // 64) % 64,
        |       128 + unicode(tok[i]) % 64]
        |    ELSE
        |      [240 + unicode(tok[i]) // 262144, 128 + (unicode(tok[i]) // 4096) % 64,
        |       128 + (unicode(tok[i]) // 64) % 64, 128 + unicode(tok[i]) % 64]
        |  END)) AS bs
        |  FROM toks
        |), th AS (
        |  SELECT doc_id, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |                 list_transform(bs, b -> CAST(b AS HUGEINT))),
        |    (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                 * 1099511628211) % 18446744073709551616
        |  ) AS h
        |  FROM by
        |), votes AS (
        |  SELECT doc_id, r.b AS b,
        |    sum(CASE WHEN (h >> CAST(r.b AS HUGEINT)) % 2 = 1 THEN 1 ELSE -1 END) AS tally
        |  FROM th, range(0, 64) r(b) GROUP BY doc_id, r.b
        |), sigs AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN tally > 0 THEN (CAST(1 AS HUGEINT) << CAST(b AS HUGEINT))
        |                  ELSE CAST(0 AS HUGEINT) END)
        |      - CASE WHEN max(CASE WHEN b = 63 AND tally > 0 THEN 1 ELSE 0 END) = 1
        |             THEN CAST(18446744073709551616 AS HUGEINT)
        |             ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS sig
        |  FROM votes GROUP BY doc_id
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin))

  /** #27 Embedding near-dup pairs: cosine >= 0.45 (exact kernel;
    * DuckDB list_dot_product verified bit-identical to the codegen'd
    * sequential loop).
    */
  protected val cosSql =
    "list_dot_product(va, vb) / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb)))"

  val qDedupEmbedding: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Similarity.embeddingNearDupPairs(t(s, dir, "embeddings"), threshold = 0.45),
    oracle = Some(
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
         |), p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id
         |)
         |SELECT id_a, id_b, round($cosSql, 9) AS sim
         |FROM p WHERE $cosSql >= 0.45""".stripMargin))

  /** #27b Embedding near-dup pairs, LSH-banded (the scale path for
    * #27): cosine only within shared random-hyperplane buckets, L
    * independent tables for recall amplification. FULLY ORACLED:
    * the plane components are xxhash64-int chains and the buckets
    * sign patterns of sequential dot folds, all re-derived from
    * first principles in DuckDB ([[OracleSql.embLshPairsSql]]); the
    * recall spec vs the exact kernel stays as the semantic check.
    * (b=2, L=8) suits this LOOSE 0.45 threshold: per-plane separation
    * p ≈ 0.35 ⇒ per-table collision 0.65² ≈ 0.42 ⇒ recall ≈ 0.99.
    */
  val qDedupEmbeddingLsh: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Similarity.embeddingNearDupPairsLsh(
        t(s, dir, "embeddings"), threshold = 0.45, numTables = 8, planesPerTable = 2),
    oracle = Some(OracleSql.embLshPairsSql(0.45, numTables = 8, planesPerTable = 2)))

  /** #27c SemDeDup semantic dedup: k-means cells + within-cell min-id
    * cosine pruning — FULLY ORACLED: the hash-ordered sample and the
    * 10 Lloyd iterations are deterministic arithmetic DuckDB replays
    * exactly ([[OracleSql.semanticDedupSql]]); the spec pins planted
    * duplicates and the drop rule.
    */
  val qDedupSemantic: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Similarity.semanticDedup(
        t(s, dir, "embeddings"), threshold = 0.45, nclusters = 16),
    oracle = Some(OracleSql.semanticDedupSql(0.45, nclusters = 16)))

  /** #28f Hard-negative mining: per anchor (vec_id < 10), the top-5
    * most-similar corpus rows with a DIFFERENT label — exact kernel,
    * fully oracled like the other exact-cosine queries.
    */
  val qSimHardNegatives: QueryDef = QueryDef(
    run = (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10), k = 5)
    },
    oracle = Some(
      s"""WITH e AS (
         |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.v AS va, q.v AS vb
         |  FROM e c, e q
         |  WHERE q.vec_id < 10 AND c.vec_id != q.vec_id AND c.label != q.label
         |), r AS (
         |  SELECT query_id, neighbor_id, $cosSql AS sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY $cosSql DESC, neighbor_id) AS rk
         |  FROM scored
         |)
         |SELECT query_id, CAST(rk AS BIGINT) AS "rank", neighbor_id, round(sim, 9) AS sim
         |FROM r WHERE rk <= 5""".stripMargin))

  /** #28g Embedding L2 normalization (ingest step that turns cosine
    * into plain dot at scale), oracled exactly: both engines fold the
    * norm sequentially and quantize each normalized coordinate to
    * fixed-point, so the projection is hash-matched coordinate by
    * coordinate.
    */
  val qEmbNormalize: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Similarity.normalizeEmbeddings(t(s, dir, "embeddings"))
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          floor(col("x") * lit(1e9d)).cast("long").as("x_fp")),
    oracle = Some(
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
        |), m AS (
        |  SELECT vec_id, v,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), v), (acc, x) -> acc + x*x)) AS nrm
        |  FROM n
        |), ex AS (
        |  SELECT vec_id, unnest(range(0, length(v))) AS pos, v, nrm FROM m
        |)
        |SELECT vec_id, CAST(pos AS BIGINT) AS pos,
        |  CAST(floor((CASE WHEN nrm = 0 THEN v[CAST(pos+1 AS INT)]
        |                   ELSE v[CAST(pos+1 AS INT)]/nrm END) * 1e9) AS BIGINT) AS x_fp
        |FROM ex""".stripMargin))

  /** #28 Brute-force cosine top-k: queries vec_id < 10, k = 5. */
  val qSimBruteforceTopk: QueryDef = QueryDef(
    run = (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
    },
    oracle = Some(
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
         |), scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.v AS va, q.v AS vb
         |  FROM e c, e q WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
         |), r AS (
         |  SELECT query_id, neighbor_id, $cosSql AS sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY $cosSql DESC, neighbor_id) AS rk
         |  FROM scored
         |)
         |SELECT query_id, CAST(rk AS BIGINT) AS "rank", neighbor_id, round(sim, 9) AS sim
         |FROM r WHERE rk <= 5""".stripMargin))

  /** #29 LSH-bucketed approximate top-k (multi-probe radius 1) —
    * FULLY ORACLED via the xxhash64-derived plane re-derivation
    * ([[OracleSql.lshTopkSql]]); the recall spec stays as the
    * semantic check. */
  val qSimLshTopk: QueryDef = QueryDef(
    run = (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
        numPlanes = 4, probeRadius = 1)
    },
    oracle = Some(OracleSql.lshTopkSql(k = 5, numPlanes = 4)))

  /** Shared oracle prefix for the curation pipelines: stopword-hit
    * scoring, language ID, and the quality/length filter as DuckDB
    * CTEs (`h`/`m`/`scored`/`filtered`) — one definition so the two
    * curation oracles can never drift from each other.
    */
  protected lazy val curateFilteredPrefix: String = {
    val hits = graft.operators.TextAnalysis.Stopwords
      .map { case (code, words) => s"${duckHits(words)} AS c_$code" }
      .mkString(",\n    ")
    val codes = graft.operators.TextAnalysis.Stopwords.map(_._1)
    val whens = codes.map(c => s"WHEN c_$c = m THEN '$c'").mkString(" ")
    s"""h AS (
       |  SELECT doc_id, lang, text,
       |    len(string_split(text, ' ')) AS nt,
       |    $hits
       |  FROM documents
       |), m AS (
       |  SELECT *, greatest(${codes.map("c_" + _).mkString(", ")}) AS m FROM h
       |), scored AS (
       |  SELECT doc_id, lang, text,
       |    CAST(nt AS BIGINT) AS n_tokens,
       |    least(1.0, (CAST(nt AS DOUBLE) / 100) * 0.5 + ((CAST(c_en AS DOUBLE) / nt) * 5) * 0.5) AS quality_score,
       |    CASE WHEN m = 0 THEN 'und' $whens ELSE 'und' END AS lang_pred
       |  FROM m
       |), filtered AS (
       |  SELECT * FROM scored WHERE quality_score >= 0.45 AND n_tokens >= 20
       |)""".stripMargin
  }

  /** #35 End-to-end corpus curation: quality scoring → language ID →
    * quality/length filter → exact dedup, the composed
    * training-data-prep pipeline over the documents table. Every stage
    * is one of the already-oracled operators; this query checks the
    * COMPOSITION against a single SQL oracle.
    */
  val qCurateDocs: QueryDef = QueryDef(
    run = (s, dir) => {
      import graft.operators.{Dedup, TextAnalysis}
      val scored = TextAnalysis.withLangId(TextAnalysis.withQuality(t(s, dir, "documents")))
      val filtered = scored.filter(col("quality_score") >= 0.45 && col("n_tokens") >= 20)
      Dedup.exact(filtered, "text", "doc_id")
        .select(col("doc_id"), col("lang"), col("lang_pred"), col("n_tokens"), col("quality_score"))
    },
    oracle = Some(
      s"""WITH $curateFilteredPrefix, dedup AS (
         |  SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM filtered
         |)
         |SELECT doc_id, lang, lang_pred, n_tokens, quality_score FROM dedup WHERE rn = 1""".stripMargin))

  /** #35b Curation with NEAR-dup removal: the same quality/langid
    * filter, then greedy pair-drop over 5-gram Jaccard >= 0.5 pairs —
    * every doc appearing as the higher id of a near-dup pair is
    * dropped (the practical one-pass near-dedup; full transitive
    * clustering is dedup_clusters). Pairs are computed on the
    * FILTERED set, exactly as the oracle does.
    */
  val qCurateNeardup: QueryDef = QueryDef(
    run = (s, dir) => {
      import graft.operators.{Dedup, TextAnalysis}
      val scored = TextAnalysis.withLangId(TextAnalysis.withQuality(t(s, dir, "documents")))
      val filtered = scored.filter(col("quality_score") >= 0.45 && col("n_tokens") >= 20)
      val losers = Dedup.ngramJaccardPairs(filtered, "doc_id", "text", n = 5, threshold = 0.5)
        .select(col("doc_b").as("doc_id")).distinct()
      filtered.join(losers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang_pred"), col("n_tokens"))
    },
    oracle = Some(
      s"""WITH $curateFilteredPrefix, tkn AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM filtered
         |), sh AS (
         |  SELECT DISTINCT doc_id,
         |         unnest(list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' '))) AS sh
         |  FROM tkn
         |), sizes AS (
         |  SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id
         |), cnt AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), losers AS (
         |  SELECT DISTINCT doc_b AS doc_id
         |  FROM cnt
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE CAST(common AS DOUBLE) / (sa.nsh + sb.nsh - common) >= 0.5
         |)
         |SELECT doc_id, lang_pred, n_tokens FROM filtered
         |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin))

  /** #37 Document chunking: 50-token chunks, stride 40 (10-token
    * overlap) — the doc→training-sample splitter.
    */
  val qTextChunk: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.TextAnalysis.chunk(t(s, dir, "documents"), chunkTokens = 50, stride = 40)
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          col("chunk_text"), col("chunk_tokens")),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), c AS (
        |  SELECT doc_id, w,
        |    1 + greatest(0, CAST(ceil((len(w) - 50) / 40.0) AS INT)) AS nch
        |  FROM t
        |), e AS (
        |  SELECT doc_id, w, unnest(range(0, nch)) AS i FROM c
        |)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        |  array_to_string(w[i*40 + 1 : i*40 + 50], ' ') AS chunk_text,
        |  CAST(least(50, len(w) - i*40) AS BIGINT) AS chunk_tokens
        |FROM e""".stripMargin))

  /** #38 PII redaction over text with synthesized PII (the corpus has
    * none): an email, a phone, and an IP derived from doc_id are
    * appended identically on both engines, then scrubbed. Counts come
    * from the pre-redaction text.
    */
  /** #32b Canonical normalization: a deliberately-messied projection
    * of the corpus (injected case, tabs, padding) must normalize
    * identically on both engines — character-class regexes only, so
    * the semantics can't drift between regex dialects.
    */
  val qTextNormalize: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.TextAnalysis.normalized(
        t(s, dir, "documents").withColumn("messy",
          concat(lit("  "), upper(expr("substring(text, 1, 50)")),
            lit("\t\t"), expr("substring(text, 51)"))),
        "messy", "text_norm")
        .select(col("doc_id"), col("text_norm")),
    oracle = Some(
      """SELECT doc_id,
        |  lower(trim(regexp_replace(regexp_replace(
        |    '  ' || upper(substr(text, 1, 50)) || chr(9) || chr(9) || substr(text, 51),
        |    '[\x00-\x1f\x7f]', ' ', 'g'), '[ \t\n\r]+', ' ', 'g'))) AS text_norm
        |FROM documents""".stripMargin))

  val qTextRedact: QueryDef = QueryDef(
    run = (s, dir) => {
      val withPii = t(s, dir, "documents").withColumn("text",
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-000-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" from 10.0."), pmod(col("doc_id"), lit(256)), lit(".7")))
      graft.operators.TextAnalysis.redact(withPii)
        .select(col("doc_id"), col("redacted"), col("n_email"), col("n_phone"), col("n_ipv4"))
    },
    oracle = {
      val Seq(email, phone, ipv4) = graft.operators.TextAnalysis.RedactPatterns.map(_._2)
      Some(
        s"""WITH p AS (
           |  SELECT doc_id,
           |    text || ' contact user' || doc_id || '@example.com or +1-555-000-' ||
           |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
           |    ' from 10.0.' || (doc_id % 256) || '.7' AS text
           |  FROM documents
           |)
           |SELECT doc_id,
           |  regexp_replace(regexp_replace(regexp_replace(text,
           |    '$email', '[EMAIL]', 'g'),
           |    '$phone', '[PHONE]', 'g'),
           |    '$ipv4', '[IPV4]', 'g') AS redacted,
           |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_email,
           |  CAST(len(regexp_extract_all(text, '$phone')) AS BIGINT) AS n_phone,
           |  CAST(len(regexp_extract_all(text, '$ipv4')) AS BIGINT) AS n_ipv4
           |FROM p""".stripMargin)
    })

  /** #39 Near-dup clusters: connected components (min-label
    * propagation) over the n-gram Jaccard pairs. Oracle computes the
    * same components with a recursive CTE — two very different
    * algorithms must agree on every cluster assignment.
    */
  val qDedupClusters: QueryDef = QueryDef(
    run = (s, dir) => {
      val pairs = graft.operators.Dedup.ngramJaccardPairs(
        t(s, dir, "documents"), "doc_id", "text", n = 5, threshold = 0.5)
      graft.operators.Dedup.clusters(pairs, "doc_a", "doc_b")
    },
    oracle = Some(
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), s AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' '))) AS sh
        |  FROM t
        |), sizes AS (
        |  SELECT doc_id, count(*) AS nsh FROM s GROUP BY doc_id
        |), cnt AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT doc_a, doc_b
        |  FROM cnt
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE CAST(common AS DOUBLE) / (sa.nsh + sb.nsh - common) >= 0.5
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b, doc_a FROM pairs
        |), reach AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
        |)
        |SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id""".stripMargin))

  /** #35d Cluster-aware dedup retention: near-dup pairs → connected
    * components → keep the argmax-quality member per cluster (ties
    * to lowest id) plus every unclustered doc — the production
    * near-dup policy (greedy pair-drop can evict the best copy; the
    * cluster argmax provably keeps it). Whole path oracled: shingle
    * pairs, recursive-CTE components, quality argmax.
    */
  val qCurateClusterBest: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", n = 5, threshold = 0.5)
      val quality = graft.operators.TextAnalysis.qualityLinear(docs)
        .select(col("doc_id"), col("q_score"))
      graft.operators.Curation.keepBestPerCluster(docs, pairs, quality)
    },
    oracle = Some(
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), s AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' '))) AS sh
        |  FROM t
        |), sizes AS (
        |  SELECT doc_id, count(*) AS nsh FROM s GROUP BY doc_id
        |), cnt AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT doc_a, doc_b
        |  FROM cnt
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE CAST(common AS DOUBLE) / (sa.nsh + sb.nsh - common) >= 0.5
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b, doc_a FROM pairs
        |), reach AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
        |), comp AS (
        |  SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id
        |), qm AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS BIGINT) AS stop_hits
        |  FROM t
        |), q AS (
        |  SELECT doc_id,
        |    2 * least(n_words, 100) + 25 * stop_hits
        |      - abs(CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END - 50) AS q_score
        |  FROM qm
        |), best AS (
        |  SELECT doc_id FROM (
        |    SELECT c.doc_id,
        |      row_number() OVER (PARTITION BY c.cluster_rep
        |                         ORDER BY q.q_score DESC, c.doc_id ASC) AS rn
        |    FROM comp c JOIN q ON q.doc_id = c.doc_id)
        |  WHERE rn = 1
        |), keep AS (
        |  SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM comp)
        |  UNION ALL
        |  SELECT doc_id FROM best
        |)
        |SELECT k.doc_id, q.q_score FROM keep k JOIN q ON q.doc_id = k.doc_id""".stripMargin))

  /** #40 Mergeable approximate distinct — a KMV/theta sketch over
    * xxhash64 ([[graft.operators.Sketches.approxDistinctKmv]]):
    * distinct users per event type in O(k) mergeable state.
    * Replaces the earlier `approx_count_distinct` (HLL++) form whose
    * register/bias internals no other engine can replay — the KMV
    * estimate is a pure integer function of the input set, so the
    * driver's DuckDB gate re-derives it exactly
    * ([[OracleSql.kmvDistinctSql]]); the spec still bounds error vs
    * the exact distinct count (σ ≈ 1/√(k−2)).
    */
  val qApproxDistinct: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Sketches.approxDistinctKmv(
        t(s, dir, "events"), Seq("event_type"), "user_id", k = 64)
        .select(col("event_type"), col("approx_distinct").as("approx_users"),
          col("n_rows").as("n_events")),
    oracle = Some(OracleSql.kmvDistinctSql(64)))

  /** #18e4 KMV audience overlap ([[graft.operators.Sketches.kmvOverlap]]):
    * distinct purchasers, distinct clickers, their union from the
    * MERGED segment sketches (KMV union is exactly mergeable), the
    * inclusion-exclusion intersection and floor-quantized Jaccard —
    * audience overlap without shuffling user ids. The oracle
    * re-derives all three estimates from first principles.
    */
  val qKmvOverlap: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Sketches.kmvOverlap(
      t(s, dir, "events"), "event_type", "user_id", "purchase", "click", k = 64),
    oracle = Some(OracleSql.kmvOverlapSql(64, "purchase", "click")))

  /** #18e3 Incremental distinct-count sketch maintenance: the events
    * table arrives as two batches (one replayed — recognized no-op),
    * each folding its per-type KMV sketch into the versioned O(k)
    * state; the read-time estimate must equal the whole-corpus sketch
    * EXACTLY (the sketch is a pure function of the input set and
    * merge is associative re-insertion) — which the oracle proves by
    * re-deriving the full-corpus estimate from first principles.
    */
  val qKmvInc: QueryDef = QueryDef(
    run = (s, dir) => {
      val state = scratch("kmv-inc")
      val ev = t(s, dir, "events")
      val b1 = ev.filter(col("event_id") % 2 === 0)
      val b2 = ev.filter(col("event_id") % 2 === 1)
      graft.operators.IncrementalAgg.refreshKmv(s, state, b1, Seq("event_type"), "user_id",
        k = 64, batchId = Some(1L))
      graft.operators.IncrementalAgg.refreshKmv(s, state, b2, Seq("event_type"), "user_id",
        k = 64, batchId = Some(2L))
      // crash-redelivery: replayed batch id is a recognized no-op
      graft.operators.IncrementalAgg.refreshKmv(s, state, b2, Seq("event_type"), "user_id",
        k = 64, batchId = Some(2L))
      graft.operators.IncrementalAgg.readKmvEstimate(s, state, Seq("event_type"), k = 64)
    },
    oracle = Some(OracleSql.kmvDistinctSql(64, withCounts = false, estimateAs = "approx_distinct")))

  /** #18f2 Mergeable approximate quantiles — a deterministic
    * hash-sample sketch ([[graft.operators.Sketches.sampledQuantiles]]):
    * the engine-reproducible Bernoulli cut pins the sampled SET, and
    * exact interpolated percentiles of the sample are the estimate
    * (error O(1/√(f·n)), spec-bounded vs the exact percentiles).
    * Replaces the earlier `approx_percentile` (GK) form, whose answer
    * depends on partition merge order no other engine can replay —
    * this one is a pure function of the data and hash-matches DuckDB.
    */
  val qApproxQuantiles: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Sketches.sampledQuantiles(
        t(s, dir, "lineitem"), Seq("l_returnflag"), "l_quantity",
        col("l_orderkey") * 8 + col("l_linenumber"), Seq(0.5, 0.9), fraction = 0.125)
        .select(col("l_returnflag"), col("p50").as("approx_p50"),
          col("p90").as("approx_p90"), col("n_rows").as("n")),
    oracle = Some(
      """WITH s AS (
        |  SELECT l_returnflag, l_quantity FROM lineitem
        |  WHERE (((l_orderkey * 8 + l_linenumber) % 2147483648) * 2654435761) % 2147483648
        |        < 268435456
        |), q AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_quantity, 0.50) AS approx_p50,
        |    quantile_cont(l_quantity, 0.90) AS approx_p90
        |  FROM s GROUP BY l_returnflag
        |), n AS (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag)
        |SELECT n.l_returnflag, q.approx_p50, q.approx_p90, n.n
        |FROM n JOIN q USING (l_returnflag)""".stripMargin))

  /** #81 TextRank keyword scores: 10 fixed-point integer PageRank
    * steps over the word-adjacency graph (see
    * [[graft.operators.TextRank]]). The oracle UNROLLS the ten power
    * iterations as generated chained CTEs — floor division (`//`) and
    * long addition reproduce Spark's `div`/`+` exactly, so the final
    * ranks hash-match as plain BIGINTs.
    */
  val qTextPagerank: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.TextRank.rank(t(s, dir, "documents"), iterations = 10),
    oracle = Some {
      val graph =
        """WITH tok AS (
          |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
          |), pos AS (
          |  SELECT doc_id, ts, unnest(range(len(ts) - 1)) AS i FROM tok
          |), und AS (
          |  SELECT DISTINCT least(ts[i+1], ts[i+2]) AS a, greatest(ts[i+1], ts[i+2]) AS b
          |  FROM pos WHERE ts[i+1] <> ts[i+2]
          |), edges AS (
          |  SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und
          |), deg AS (
          |  SELECT src, count(*) AS d FROM edges GROUP BY src
          |), r0 AS (
          |  SELECT src AS word, CAST(1000000000000 AS BIGINT) AS r FROM deg
          |)""".stripMargin
      val steps = (1 to 10).map { k =>
        s""", r$k AS (
           |  SELECT n.src AS word, CAST(150000000000 + coalesce(c.s, 0) AS BIGINT) AS r
           |  FROM deg n LEFT JOIN (
           |    SELECT e.dst, sum((p.r * 85) // (100 * d.d)) AS s
           |    FROM r${k - 1} p JOIN edges e ON p.word = e.src JOIN deg d ON d.src = e.src
           |    GROUP BY e.dst) c ON c.dst = n.src
           |)""".stripMargin
      }.mkString
      graph + steps + "\nSELECT word, r AS rank FROM r10"
    })

  /** #44 Vocabulary build: top-200 terms by frequency with document
    * frequency and deterministic token ids.
    */
  val qTextVocab: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.TextAnalysis.vocab(t(s, dir, "documents"), topK = 200),
    oracle = Some(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), agg AS (
        |  SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
        |), top AS (
        |  SELECT *, row_number() OVER (ORDER BY tf DESC, term) AS token_id FROM agg
        |)
        |SELECT CAST(token_id AS BIGINT) AS token_id, term, tf, df
        |FROM top WHERE token_id <= 200""".stripMargin))

  /** #40b Inverted index (postings) over the top-50 vocab terms:
    * term → sorted doc-id list + df. Postings sort inside each
    * aggregation buffer, never globally.
    */
  val qTextPostings: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      // The operator's natural output is a list-valued posting column;
      // the gate needs a scalar per cell (pandas can't hash arrays), so
      // the query serializes the (already sorted) posting to CSV.
      graft.operators.TextAnalysis.postings(
        docs, graft.operators.TextAnalysis.vocab(docs, topK = 50))
        .select(col("term"),
          array_join(col("posting").cast("array<string>"), ",").as("posting"),
          col("df"))
    },
    oracle = Some(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), agg AS (
        |  SELECT term, count(*) AS tf FROM tok GROUP BY term
        |), v AS (
        |  SELECT term FROM agg ORDER BY tf DESC, term LIMIT 50
        |), d AS (
        |  SELECT DISTINCT doc_id, term FROM tok
        |)
        |SELECT term, array_to_string(list_sort(list(doc_id)), ',') AS posting, count(*) AS df
        |FROM d JOIN v USING (term)
        |GROUP BY term""".stripMargin))

  /** #40c Skip-gram co-occurrence counts (window 2): the word2vec
    * training-pair table. Oracle slices the token list per position
    * in SQL.
    */
  val qTextSkipgrams: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.TextAnalysis.skipgrams(t(s, dir, "documents"), window = 2),
    oracle = Some(
      """WITH tok AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |), pos AS (
        |  SELECT unnest(w) AS a, unnest(range(len(w))) AS i, w FROM tok
        |), pairs AS (
        |  SELECT a, unnest(w[i + 2:i + 3]) AS b FROM pos
        |)
        |SELECT a, b, count(*) AS n FROM pairs GROUP BY a, b""".stripMargin))

  /** #42 TF-IDF top-3 terms per document (rational idf for
    * cross-engine bit-exactness — see TextAnalysis.tfIdf).
    */
  val qTextTfidf: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.TextAnalysis.tfIdf(t(s, dir, "documents"), topK = 3),
    oracle = Some(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
        |), n AS (
        |  SELECT count(*) AS n_docs FROM documents
        |), scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |         CAST(tf.tf * n.n_docs AS DOUBLE) / dfreq.df AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
        |)
        |SELECT doc_id, rk, term, tf, df, tfidf FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
        |  FROM scored
        |) WHERE rk <= 3""".stripMargin))

  /** #39b Triangle enumeration on the word co-occurrence graph
    * (skip-gram pairs collapsed to undirected edges, weight >= 100):
    * degree-ordered wedge enumeration (O(m^1.5) candidates) must
    * produce exactly the same triangle set as the oracle's naive
    * id-ordered 3-way self-join — two different algorithms, one
    * answer. The graph is vocab-bounded (same gate philosophy as
    * TextRank), so the fixture's density is stable across SFs.
    */
  val qTriangles: QueryDef = QueryDef(
    run = (s, dir) => {
      val sg = graft.operators.TextAnalysis.skipgrams(t(s, dir, "documents"), window = 2)
      val edges = sg.filter(col("a") =!= col("b"))
        .groupBy(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .agg(sum(col("n")).as("n"))
        .filter(col("n") >= 100L)
      graft.operators.GraphAnalytics.triangles(edges, "u", "v")
    },
    oracle = Some(
      """WITH tok AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |), pos AS (
        |  SELECT unnest(w) AS a, unnest(range(len(w))) AS i, w FROM tok
        |), prs AS (
        |  SELECT a, unnest(w[i + 2:i + 3]) AS b FROM pos
        |), dirw AS (
        |  SELECT a, b, count(*) AS n FROM prs GROUP BY 1, 2
        |), e AS (
        |  SELECT least(a, b) AS u, greatest(a, b) AS v
        |  FROM dirw WHERE a <> b
        |  GROUP BY 1, 2 HAVING sum(n) >= 100
        |)
        |SELECT p1.u AS x, p1.v AS y, p2.v AS z
        |FROM e p1 JOIN e p2 ON p2.u = p1.v
        |JOIN e p3 ON p3.u = p1.u AND p3.v = p2.v""".stripMargin))

  /** #39c Link prediction ([[graft.operators.GraphAnalytics.linkPrediction]]):
    * the word co-occurrence graph's non-adjacent pairs ranked by
    * common neighbors, integer resource-allocation (Σ⌊10⁶/deg(z)⌋ —
    * a shared rare neighbor outweighs a shared hub), and
    * preferential attachment — the "which near-dup pairs did LSH
    * probably miss" scores. The oracle re-derives the whole chain:
    * adjacency, degrees, wedge join, floor-divided RA sum, and the
    * NOT-EXISTS non-adjacency gate.
    */
  val qLinkPredict: QueryDef = QueryDef(
    run = (s, dir) => {
      val sg = graft.operators.TextAnalysis.skipgrams(t(s, dir, "documents"), window = 2)
      val edges = sg.filter(col("a") =!= col("b"))
        .groupBy(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .agg(sum(col("n")).as("n"))
        .filter(col("n") >= 100L)
      graft.operators.GraphAnalytics.linkPrediction(edges, "u", "v")
    },
    oracle = Some(
      """WITH tok AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |), pos AS (
        |  SELECT unnest(w) AS a, unnest(range(len(w))) AS i, w FROM tok
        |), prs AS (
        |  SELECT a, unnest(w[i + 2:i + 3]) AS b FROM pos
        |), dirw AS (
        |  SELECT a, b, count(*) AS n FROM prs GROUP BY 1, 2
        |), e AS (
        |  SELECT least(a, b) AS u, greatest(a, b) AS v
        |  FROM dirw WHERE a <> b
        |  GROUP BY 1, 2 HAVING sum(n) >= 100
        |), adj AS (
        |  SELECT u AS n, v AS nbr FROM e UNION ALL SELECT v AS n, u AS nbr FROM e
        |), deg AS (
        |  SELECT n, count(*) AS d FROM adj GROUP BY 1
        |), cand AS (
        |  SELECT a1.nbr AS x, a2.nbr AS y, count(*) AS cn,
        |         CAST(sum(1000000 // dz.d) AS BIGINT) AS ra_x1e6
        |  FROM adj a1
        |  JOIN adj a2 ON a2.n = a1.n AND a1.nbr < a2.nbr
        |  JOIN deg dz ON dz.n = a1.n
        |  GROUP BY 1, 2
        |)
        |SELECT c.x, c.y, c.cn, c.ra_x1e6, dx.d * dy.d AS pa
        |FROM cand c
        |JOIN deg dx ON dx.n = c.x
        |JOIN deg dy ON dy.n = c.y
        |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = c.x AND e.v = c.y)""".stripMargin))

  /** #48b Count-Min sketch token-frequency estimates: the corpus
    * folds into ONE depth×width=4×16 long buffer (mergeable,
    * map-side-combined), then the top-20 true-frequency terms probe
    * it. Buckets are salted-FNV mod width — fully deterministic, so
    * the oracle rebuilds the identical sketch cell-for-cell in
    * DuckDB and the estimates (incl. every collision's overcount)
    * hash-match exactly. width=16 < vocab size forces real
    * collisions; the min over 4 rows is what keeps estimates tight.
    */
  val qCmsCounts: QueryDef = QueryDef(
    run = (s, dir) => {
      import graft.functions.CmsFunctions
      val tok = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
      val sketch = tok.agg(CmsFunctions.cmsSketch(col("term"), 4, 16).as("sk"))
      val top = tok.groupBy(col("term")).agg(count(lit(1)).as("true_n"))
        .orderBy(col("true_n").desc, col("term")).limit(20)
      top.crossJoin(broadcast(sketch))
        .select(col("term"), col("true_n"),
          CmsFunctions.cmsEstimate(col("sk"), col("term"), 4, 16).as("cms_est"))
    },
    oracle = Some(
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents
        |), cnt AS (
        |  SELECT term, count(*) AS true_n FROM tok GROUP BY 1
        |), rws AS (
        |  SELECT unnest([0, 1, 2, 3]) AS r
        |), bk AS (
        |  SELECT term, true_n, r,
        |    list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |      list_transform(range(1, length(term || chr(1) || CAST(r AS VARCHAR)) + 1),
        |        i -> CAST(unicode((term || chr(1) || CAST(r AS VARCHAR))[i]) AS HUGEINT))),
        |      (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                   * 1099511628211) % 18446744073709551616) % 16 AS bucket
        |  FROM cnt CROSS JOIN rws
        |), cells AS (
        |  SELECT r, bucket, sum(true_n) AS cell FROM bk GROUP BY 1, 2
        |), est AS (
        |  SELECT bk.term, bk.true_n, min(cells.cell) AS cms_est
        |  FROM bk JOIN cells ON cells.r = bk.r AND cells.bucket = bk.bucket
        |  GROUP BY 1, 2
        |), top AS (
        |  SELECT term, true_n FROM cnt ORDER BY true_n DESC, term LIMIT 20
        |)
        |SELECT est.term, est.true_n, CAST(est.cms_est AS BIGINT) AS cms_est
        |FROM est JOIN top USING (term, true_n)""".stripMargin))

}
