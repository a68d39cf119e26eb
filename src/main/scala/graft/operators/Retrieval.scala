package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — the production RAG-stack shape where one
  * request fans out to a LEXICAL leg (BM25 over the inverted text
  * index) and a SEMANTIC leg (embedding top-k), and the union of
  * candidates is re-ranked by Reciprocal Rank Fusion. RRF is the
  * standard score-free fusion (Cormack et al.): it needs only each
  * leg's RANKS, so incomparable score scales (BM25 fixed-point vs
  * cosine) never have to be calibrated against each other.
  *
  * Engine-exact: the classic Σ 1/(rrfK + rank) is rational, so each
  * contribution is floor-quantized at `scale` (10⁶ default) BEFORE
  * summing — floor(scale/(rrfK+rank)) is plain integer division any
  * engine reproduces bit-for-bit, and quantized contributions sum
  * exactly (the same discipline as BM25's 1e-9 contribution floor).
  * Ranks ≤ a few hundred with rrfK = 60 keep adjacent-rank
  * contributions distinct at 10⁶ (floor(10⁶/61) = 16393 vs
  * floor(10⁶/62) = 16129), so fusion granularity is not lost to the
  * quantization. Ties break by doc_id.
  *
  * Scale shape: every leg is top-K-bounded by construction — the
  * fusion touches O(k · legs) rows however large the corpus behind
  * the legs, and the legs themselves are the scale paths (BM25's
  * pruned term scan; IVF/PQ instead of brute force for the semantic
  * leg — any (doc_id, rk) table plugs in). One hash aggregate over a
  * k-bounded union, then TakeOrdered; the rank window runs over the
  * final k rows only.
  */
object Retrieval {

  /** Fuse ranked legs — each a `(doc_id, rk)` table with 1-based
    * ranks — into the RRF top-`k`: (doc_id, rrf_fp, n_legs, rk).
    * Docs appearing in only some legs receive those legs'
    * contributions (fusion over the union, the standard form).
    */
  def rrfFuse(legs: Seq[DataFrame], k: Int, rrfK: Int = 60, scale: Long = 1000000L): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one ranked leg")
    require(k > 0 && rrfK >= 0 && scale > 0, "k/rrfK/scale must be positive")
    import org.apache.spark.sql.expressions.Window
    val contribs = legs
      .map(_.select(col("doc_id"),
        // DIV, not /: Spark's / on integrals is DOUBLE division —
        // the whole point here is exact integer quantization
        expr(s"CAST(${scale}L DIV ($rrfK + CAST(rk AS BIGINT)) AS BIGINT)").as("c")))
      .reduce(_ unionByName _)
    contribs
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("rrf_fp"), count(lit(1)).as("n_legs"))
      .orderBy(col("rrf_fp").desc, col("doc_id"))
      .limit(k)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("rrf_fp").desc, col("doc_id"))))
  }
}
