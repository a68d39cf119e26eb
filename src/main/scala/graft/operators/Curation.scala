package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation filters that treat their criteria as DATA, not
  * literals — crawl denylists run to millions of domains and change
  * daily, so they arrive as a table, never an IN-list baked into the
  * plan.
  */
object Curation {

  /** Drop rows whose `sourceCol` appears in the blocklist table:
    * broadcast LEFT ANTI join. The fact side stays shuffle-free while
    * the blocklist fits the broadcast threshold and degrades to a
    * shuffled anti join past it — either way no row of the corpus is
    * ever duplicated or re-ordered, so the filter composes with
    * downstream dedup/split stages.
    */
  def dropBlockedSources(
      df: DataFrame,
      sourceCol: String,
      blocklist: DataFrame,
      blockCol: String): DataFrame =
    df.join(broadcast(blocklist), df(sourceCol) === blocklist(blockCol), "left_anti")

  /** Benchmark decontamination: find training documents sharing any
    * word n-gram with the evaluation set. Both sides trade on 64-bit
    * hashed shingles (the codegen'd GraftHash kernel, distinct per
    * doc by construction) — the join shuffles 8-byte longs, never
    * n-word strings, which is what survives at 100 TB. Returns one
    * row per CONTAMINATED training doc: the count of distinct shared
    * n-grams and of distinct test docs hit; anti-join against this to
    * scrub.
    */
  def decontaminate(
      train: DataFrame,
      test: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 8): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    val tr = train.select(col(idCol).as("doc_id"),
      explode(Dedup.hashedShingles(col(textCol), n)).as("_sh"))
    val te = test.select(col(idCol).as("_test_id"),
      explode(Dedup.hashedShingles(col(textCol), n)).as("_sh"))
    tr.join(te, "_sh")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("_sh")).as("n_shared_ngrams"),
        count_distinct(col("_test_id")).as("n_test_docs"))
  }

  /** Sequence packing, concatenate-and-cut style: documents are laid
    * end-to-end per partition (deterministic `orderCol` order) and
    * the token stream is cut into `budget`-sized packs; each doc gets
    * the pack containing its first token plus its offset inside that
    * pack. One running-sum window per partition — at production scale
    * partition by shard (not a global order) so the sort stays
    * bounded; the arithmetic is exact long division, never
    * double-rounded.
    */
  def pack(
      df: DataFrame,
      partitionCol: String,
      orderCol: String,
      weightCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(partitionCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cast ONCE and use the long in both the sum and the subtraction:
    // a fractional weight column must not promote _start to double
    // (the div/% below would then truncate through an implicit cast)
    val wgt = col(weightCol).cast("long")
    df.withColumn("_start", sum(wgt).over(w) - wgt)
      .withColumn("pack_id", expr(s"_start div $budget"))
      .withColumn("pack_off", expr(s"_start % $budget"))
      .drop("_start")
  }
}
