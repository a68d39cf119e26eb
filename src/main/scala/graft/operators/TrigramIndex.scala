package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-trigram inverted index for substring search — the
  * "index-accelerated LIKE" that turns a full-corpus `contains()`
  * scan into a postings intersection plus a verify step on the few
  * surviving candidates (pg_trgm's design, re-expressed in Spark).
  *
  * Scale design: the postings build is one explode + distinct over
  * the corpus (shuffle keyed on trigram — 26³-ish distinct keys,
  * heavily compressible); at 100 TB you materialize it ONCE
  * (bucketed by trigram) and serve every subsequent search from the
  * index. A search touches only the needle's trigrams' postings —
  * the original documents are read back only for the candidate set
  * (semi-join), never rescanned wholesale. The trailing exact
  * `contains` verify makes false positives harmless, and a needle
  * shorter than 3 chars degrades to the exact scan.
  */
object TrigramIndex {

  /** Distinct (id, trigram) postings of every document. Pure
    * projection + explode — no shuffle until a consumer aggregates.
    */
  def postings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val txt = col(textCol)
    val grams = when(length(txt) >= 3,
      array_distinct(transform(sequence(lit(1), length(txt) - 2),
        i => txt.substr(i, lit(3)))))
      .otherwise(array())
    docs.select(col(idCol), explode(grams).as("trigram"))
  }

  /** All documents whose text contains `needle`, by postings
    * intersection (a doc qualifies only if it has EVERY needle
    * trigram) then exact verify. Equivalent to
    * `docs.filter(contains(text, needle))` — the index only changes
    * the access path.
    */
  def search(docs: DataFrame, needle: String, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    if (needle.length < 3) return docs.filter(col(textCol).contains(needle))
    val grams = needle.sliding(3).toSeq.distinct
    val candidates = postings(docs, idCol, textCol)
      .filter(col("trigram").isin(grams: _*))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_hits")) // postings are distinct per doc
      .filter(col("_hits") === grams.size)
      .select(col(idCol))
    docs.join(candidates, Seq(idCol), "left_semi")
      .filter(col(textCol).contains(needle)) // false-positive verify
  }
}
