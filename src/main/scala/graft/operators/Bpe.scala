package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training over a document corpus —
  * the vocabulary-construction step of a training-data pipeline
  * (the reference's surface ends at reports; a corpus this engine
  * curates feeds a tokenizer, and BPE is the standard one).
  *
  * Scale design: the corpus is collapsed ONCE to the distinct-word
  * frequency table (`wordCounts` — one shuffle over the corpus),
  * and every BPE iteration then runs over |vocab| rows, not corpus
  * rows — the classic trick that makes distributed BPE tractable:
  * at 100 TB the corpus has billions of rows but only millions of
  * distinct words, so the per-merge pair-count aggregation is a
  * small-table job with a driver-side top-1 pick (a few KB
  * collected per iteration). Merge application is a pure
  * `aggregate` HOF fold over each word's symbol array — no UDF, no
  * per-row JVM closure serialization — and the loop
  * `localCheckpoint`s every few iterations so plan lineage stays
  * bounded.
  */
object Bpe {

  /** Distinct words with weights: one corpus shuffle, everything
    * after runs on this table.
    */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word")
      .agg(count(lit(1)).as("n"))

  /** Seed symbol table: each word split into single characters. */
  def toSymbols(words: DataFrame): DataFrame =
    words.withColumn("syms", split(col("word"), ""))

  /** Weighted adjacent-pair counts over the symbol table: the
    * statistics one BPE iteration ranks. zip_with of the array with
    * its own tail forms the pairs; weights are the word counts.
    */
  def pairCounts(symbols: DataFrame): DataFrame =
    symbols
      .filter(size(col("syms")) >= 2)
      .select(col("n"), explode(
        zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("left"), b.as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("n")).as("pair_n"))

  /** Apply one merge (left,right → left||right) to every word:
    * greedy left-to-right fold, the standard BPE apply order.
    */
  private def applyMerge(symbols: DataFrame, left: String, right: String): DataFrame = {
    val l = lit(left)
    val r = lit(right)
    symbols.withColumn("syms",
      aggregate(
        col("syms"),
        array().cast("array<string>"),
        (acc, x) =>
          when(size(acc) > 0 && element_at(acc, -1) === l && x === r,
            concat(slice(acc, lit(1), size(acc) - 1), array(concat(l, r))))
            .otherwise(concat(acc, array(x)))))
  }

  /** Train `iters` merges. Returns the merge table:
    * (rank, left, right, pair_n). Deterministic: best pair = highest
    * weighted count, ties to the lexicographically smallest
    * (left, right).
    */
  def train(docs: DataFrame, iters: Int, textCol: String = "text"): Seq[(Int, String, String, Long)] = {
    // materialize the word table ONCE — otherwise every early
    // iteration's pair-count job re-scans and re-tokenizes the whole
    // corpus (measured 9.4s → 4.9s for 8 merges at sf0.1)
    var symbols = toSymbols(wordCounts(docs, textCol)).localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < iters && !exhausted) {
      val top = pairCounts(symbols)
        .orderBy(col("pair_n").desc, col("left"), col("right"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((i + 1, l, r, n))
        symbols = applyMerge(symbols, l, r)
        // bound lineage: each merge stacks a HOF projection; every few
        // iterations materialize and truncate the plan
        if ((i + 1) % 4 == 0) symbols = symbols.localCheckpoint(true)
        i += 1
      }
    }
    merges.result()
  }

  /** The learned merges as a DataFrame (for the query registry). */
  def trainDf(spark: SparkSession, docs: DataFrame, iters: Int): DataFrame = {
    import spark.implicits._
    train(docs, iters).toDF("rank", "left", "right", "pair_n")
  }

  /** Encode words with a learned merge list: the merges replayed in
    * rank order (each a fold), yielding each word's final symbol
    * sequence — what a tokenizer ships to production.
    */
  def segment(words: DataFrame, merges: Seq[(Int, String, String, Long)]): DataFrame =
    merges.sortBy(_._1).foldLeft(toSymbols(words)) { case (acc, (_, l, r, _)) =>
      applyMerge(acc, l, r)
    }
}
