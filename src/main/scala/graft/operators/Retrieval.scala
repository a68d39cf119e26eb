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

  /** The NDCG rank-discount table, fixed-point: disc(r) =
    * ⌊scale / log₂(r+1)⌋ for ranks 1..k. Computed ONCE on the driver
    * (StrictMath, so the doubles are identical on every JVM) and
    * shipped into the plan — and into the ORACLE SQL — as integer
    * literals, so both engines sum the exact same integers and
    * cross-engine float drift is structurally impossible. The same
    * move as BM25's quantized contributions: transcendental constants
    * are fine as long as they are frozen before the data touches them.
    */
  def discounts(k: Int, scale: Long = 1000000L): Seq[Long] =
    (1 to k).map(r =>
      (scale.toDouble / (StrictMath.log(r + 1.0) / StrictMath.log(2.0))).toLong)

  /** Graded ranking evaluation — NDCG@k and reciprocal rank, the IR
    * metrics that score a retrieval stack (BM25 / ANN / hybrid-RRF
    * runs alike) against graded relevance judgments.
    *
    * Inputs: `run` = (query_id, doc_id, rk) with 1-based ranks;
    * `qrels` = (query_id, doc_id, rel) with integer grades (rel ≤ 0
    * rows are non-relevant and ignored). Output, one row per run
    * query — queries with NO relevant docs still report (ndcg 0,
    * rr 0): silently dropping them is how retrieval evals lie, the
    * same contract as [[Similarity.recallAtK]]:
    *   (query_id, dcg_fp, idcg_fp, ndcg_bp, rr_fp, n_rel_found, n_rel)
    *
    * Exact integers end to end: gain(rel) = 2^rel − 1 (the burgess
    * exponential gain, exact via shiftleft), discount from
    * [[discounts]]' frozen table, DCG/IDCG are plain BIGINT sums,
    * ndcg_bp = ⌊10⁴·DCG/IDCG⌋ and rr_fp = ⌊scale/first_rel_rank⌋ are
    * integer division. Any engine reproduces every row bit-for-bit.
    *
    * Scale shape: the run is k-bounded per query by construction, so
    * the (query, doc) equi-join against qrels and every aggregate
    * touch O(queries·k) rows; the ideal ordering is a window
    * PARTITIONed by query over each query's own qrels (never a global
    * window). Nothing anywhere is corpus-sized — the legs being
    * evaluated are the scale paths.
    */
  def ndcgAtK(run: DataFrame, qrels: DataFrame, k: Int, scale: Long = 1000000L): DataFrame = {
    require(k > 0 && scale > 0, "k/scale must be positive")
    import org.apache.spark.sql.expressions.Window
    val disc = typedLit(discounts(k, scale))
    // SQL-form shiftleft: the Scala wrapper only takes a literal count
    val gain = expr("CAST(shiftleft(1L, rel) - 1L AS BIGINT)").as("gain")
    val rels = qrels.filter(col("rel") > 0)
      .select(col("query_id"), col("doc_id"), col("rel").cast("int").as("rel"))
    val topk = run.filter(col("rk") <= k)
      .select(col("query_id"), col("doc_id"), col("rk").cast("int").as("rk"))
    // DCG over the run ∩ qrels — both sides k-bounded per query
    val hit = topk.join(rels, Seq("query_id", "doc_id"))
      .select(col("query_id"), col("rk"), gain)
    val dcg = hit.groupBy(col("query_id")).agg(
      sum(col("gain") * element_at(disc, col("rk"))).as("dcg_fp"),
      count(lit(1)).as("n_rel_found"),
      min(col("rk")).as("_first_rk"))
    // IDCG: each query's qrels in ideal order (rel desc, doc_id ties)
    val iw = Window.partitionBy(col("query_id")).orderBy(col("rel").desc, col("doc_id"))
    val idcg = rels.withColumn("_irk", row_number().over(iw))
      .groupBy(col("query_id")).agg(
        sum(when(col("_irk") <= k,
          expr("CAST(shiftleft(1L, rel) - 1L AS BIGINT)")
            * element_at(disc, col("_irk")))).as("idcg_fp"),
        count(lit(1)).as("n_rel"))
    run.select(col("query_id")).distinct()
      .join(dcg, Seq("query_id"), "left")
      .join(idcg, Seq("query_id"), "left")
      .select(
        col("query_id"),
        coalesce(col("dcg_fp"), lit(0L)).as("dcg_fp"),
        coalesce(col("idcg_fp"), lit(0L)).as("idcg_fp"),
        when(coalesce(col("idcg_fp"), lit(0L)) === 0L, lit(0L))
          .otherwise(expr("CAST(coalesce(dcg_fp, 0) * 10000 DIV idcg_fp AS BIGINT)"))
          .as("ndcg_bp"),
        coalesce(expr(s"CAST(${scale}L DIV _first_rk AS BIGINT)"), lit(0L)).as("rr_fp"),
        coalesce(col("n_rel_found"), lit(0L)).as("n_rel_found"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"))
  }
}
