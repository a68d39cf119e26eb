package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical association operators for corpus curation: which
  * tokens predict a label (χ² feature selection — the classic
  * preprocessing step before training a quality/domain classifier),
  * and which adjacent word pairs are real collocations (PMI-family
  * ratio — phrase mining for tokenizer/vocab construction). Both in
  * engine-exact integer arithmetic so the scores hash-match a SQL
  * re-derivation.
  */
object Association {

  /** Per-token χ² association with a binary document label, from the
    * 2×2 presence contingency (a = labeled docs containing the token,
    * b = unlabeled docs containing it, c/d the complements):
    * χ² = N·(ad−bc)²/((a+b)(c+d)(a+c)(b+d)), emitted ×10⁴ as one
    * DECIMAL(38,0) integral division — the standard feature-selection
    * ranking, exact (no doubles anywhere).
    *
    * Plan: one explode→distinct for presence pairs (map-side combine
    * on (token, doc)), one groupBy(token) carrying the label count as
    * a sum, and a broadcast 1-row total — no join touches the corpus
    * twice. State is |vocab|, not |rows|.
    *
    * Scale envelope: the numerator N·(ad−bc)²·10⁴ is bounded by
    * N⁵·10⁴/16 (|ad−bc| ≤ N²/4 under a+b+c+d = N), which stays
    * inside DECIMAL(38,0) only while N ≲ 1.09·10⁷ labeled docs —
    * NOT 10⁹ (Spark decimal multiply NULLs silently past 38 digits,
    * the exact wrong answer the guard exists to prevent). Beyond
    * 10⁷ docs, pre-aggregate the per-token contingency (a/b/c/d are
    * plain longs at any N) and compute the ratio offline in
    * unbounded arithmetic, or select per shard. The guard raises
    * loudly rather than wrapping silently.
    *
    * Returns (token, df, n_pos_docs, chi2_x10000) for tokens with
    * document frequency ≥ `minDf`.
    */
  def chi2Features(docs: DataFrame, idCol: Column, textCol: Column, labelCol: Column,
      minDf: Long = 2L): DataFrame = {
    val pres = docs
      .filter(labelCol.isNotNull)
      .select(idCol.as("_doc"),
        when(labelCol.cast("boolean"), 1L).otherwise(0L).as("p"),
        split(textCol, " ").as("w"))
      .select(col("_doc"), col("p"), explode(col("w")).as("token"))
      .filter(col("token") =!= "")
      .distinct()
    val totals = docs.filter(labelCol.isNotNull)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(labelCol.cast("boolean"), 1L).otherwise(0L)).as("n_pos"))
    val byToken = pres.groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("p")).as("a"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    byToken
      .filter(col("df") >= minDf)
      .crossJoin(broadcast(totals))
      // guard BEFORE the products: a silent decimal overflow would
      // null out, not wrap — still a wrong answer with no error
      .withColumn("_guard",
        when(col("n_docs") > 10000000L,
          raise_error(lit("chi2Features: N^5*10^4/16 exceeds the exact DECIMAL(38,0) " +
            "envelope (N > 1e7 labeled docs) — pre-aggregate the contingency " +
            "and divide offline, or run per segment/shard")).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("b", col("df") - col("a") + col("_guard"))
      .withColumn("c", col("n_pos") - col("a"))
      .withColumn("d", col("n_docs") - col("n_pos") - col("b"))
      .withColumn("admbc", dec(col("a")) * dec(col("d")) - dec(col("b")) * dec(col("c")))
      .withColumn("den",
        dec(col("a") + col("b")) * dec(col("c") + col("d")) *
          dec(col("a") + col("c")) * dec(col("b") + col("d")))
      .withColumn("chi2_x10000",
        when(col("den") === 0, lit(null).cast("long"))
          .otherwise(expr(
            """CAST(CAST(n_docs AS DECIMAL(38,0)) * admbc * admbc * 10000
              |     DIV den AS BIGINT)""".stripMargin)))
      .select(col("token"), col("df"), col("a").as("n_pos_docs"), col("chi2_x10000"))
  }

  /** Adjacent-bigram collocations ranked by the PMI ratio
    * p(xy)/(p(x)·p(y)) — emitted ×10⁴ WITHOUT the log (the log is
    * monotone, so ranking and thresholding are unchanged, and the
    * ratio stays in exact integers: ratio = n_xy·M·U² /
    * (n_x·n_y·M²) with M bigram and U unigram totals — simplified
    * here to the standard estimator n_xy·M/(n_x·n_y) over
    * within-bigram unigram counts). "new york"-style phrases score
    * high; frequent-but-independent pairs score ~10⁴ (ratio 1).
    *
    * One pass builds bigrams positionally (zip of the token array
    * with its tail — no self-join), one groupBy each for bigram and
    * unigram counts, the totals broadcast. n_xy·M ≤ M² stays inside
    * DECIMAL(38,0) to M ≈ 10¹⁹ tokens — beyond any corpus.
    *
    * Returns (w1, w2, n_xy, ratio_x10000) for pairs seen ≥ `minCount`
    * times.
    */
  def pmiCollocations(docs: DataFrame, textCol: Column, minCount: Long = 5L): DataFrame = {
    val words = docs.select(split(textCol, " ").as("w"))
      .select(filter(col("w"), x => x =!= "").as("w"))
    // positional zip: bigram i = (w[i-1], w[i]), codegen-friendly, no
    // explode-join. The size guard matters: Spark's sequence(1, 0)
    // DESCENDS — an unguarded single-token doc would fabricate a
    // null-padded bigram instead of none.
    val bigrams = words
      .filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w1, w[i] AS w2))")).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
    val unigrams = words.select(explode(col("w")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
    val bg = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_xy"))
    val totals = bigrams.agg(count(lit(1)).as("m"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    bg.filter(col("n_xy") >= minCount)
      .join(unigrams.withColumnRenamed("tok", "w1").withColumnRenamed("n_tok", "n_x"), "w1")
      .join(unigrams.withColumnRenamed("tok", "w2").withColumnRenamed("n_tok", "n_y"), "w2")
      .crossJoin(broadcast(totals))
      .withColumn("ratio_x10000", expr(
        """CAST(CAST(n_xy AS DECIMAL(38,0)) * m * 10000
          |     DIV (CAST(n_x AS DECIMAL(38,0)) * CAST(n_y AS DECIMAL(38,0))) AS BIGINT)""".stripMargin))
      .select(col("w1"), col("w2"), col("n_xy"), col("ratio_x10000"))
  }
}
