package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable multinomial Naive Bayes document classifier — the
  * TRAINABLE complement of the fixed-weight linear gate (#62,
  * `QualityChecks.qualityScore`): class-conditional token counts are
  * learned from a labeled corpus (pure counting — one shuffle on
  * (label, token)), and classification is the standard
  * argmax_c [log P(c) + Σ_w log P(w|c)] with Laplace smoothing,
  * quantized to EXACT INTEGER surprisal magnitudes so the verdict is
  * bit-reproducible on any engine (a libm-log NB never is):
  *
  *   bucket(w, c) = ⌊log₁₀((n_c + V)/(n_wc + 1))⌋
  *               = digits((n_c + V) div (n_wc + 1)) − 1
  *
  * — the decimal-magnitude reduction `TextAnalysis.surprisal` and the
  * CCNet perplexity filter already prove cross-engine exact. The
  * prediction is argMIN of total surprisal (prior bucket + token
  * buckets), ties to the lexicographically smallest label.
  *
  * Scale shape: training is one map-side-combined count shuffle;
  * apply is the token stream × |classes| (a handful) with the model
  * tables broadcast — no window over the corpus, no driver loops.
  * Unseen tokens smooth to bucket(⌊(n_c+V)/1⌋) naturally via the
  * LEFT join + coalesce.
  */
object NaiveBayes {

  /** Tokens of (labelCol, textCol) — whitespace split, the corpus
    * convention every text operator here shares.
    */
  private def tokens(df: DataFrame, keep: Column, textCol: String): DataFrame =
    df.select(keep.as("_k"), explode(split(col(textCol), " ")).as("tok"))

  /** Classify `test` rows with a model trained on `train`.
    * Returns (idCol, pred_label, nb_score) — nb_score is the winning
    * class's total integer surprisal (lower = more likely).
    */
  def classify(
      train: DataFrame,
      test: DataFrame,
      labelCol: String = "lang",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val trTok = tokens(train, col(labelCol), textCol)
      .withColumnRenamed("_k", "label")
    // model: class-conditional token counts, class token totals,
    // vocabulary size, document priors — all pure counts
    val counts = trTok.groupBy(col("label"), col("tok")).agg(count(lit(1)).as("n_wc"))
    val classTotals = trTok.groupBy(col("label")).agg(count(lit(1)).as("n_c"))
    val vocab = trTok.agg(countDistinct(col("tok")).as("vsz"))
    val nTrain = train.agg(count(lit(1)).as("n_docs"))
    val priors = train.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("n_d"))
      .crossJoin(broadcast(nTrain))
      .withColumn("prior_b",
        (length(expr("CAST(n_docs DIV n_d AS STRING)")) - 1).cast("long"))
      .select(col("label"), col("prior_b"))

    val teTok = tokens(test, col(idCol), textCol).withColumnRenamed("_k", idCol)
    val classes = classTotals.crossJoin(broadcast(vocab))
      .select(col("label"), (col("n_c") + col("vsz")).as("num"))

    val scored = teTok
      .crossJoin(broadcast(classes))
      .join(broadcast(counts), Seq("label", "tok"), "left")
      .withColumn("bucket",
        (length(expr("CAST(num DIV (coalesce(n_wc, 0L) + 1) AS STRING)")) - 1).cast("long"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("bucket")).as("tok_score"))
      .join(broadcast(priors), "label")
      .withColumn("nb_score", col("prior_b") + col("tok_score"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("nb_score"), col("label"))
    scored.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col(idCol), col("label").as("pred_label"), col("nb_score"))
  }
}
