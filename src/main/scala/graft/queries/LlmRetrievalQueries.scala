package graft

import graft.pipeline._
import graft.sources.{IncrementalReader, TableLoader, UpsertWriter}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline slice 2: retrieval, similarity/ANN, packing, multimodal, linkage — one trait of the linear
  * [[Queries]] stack; see Queries.scala for the registry and the
  * catalog-wide numeric policy.
  */
trait LlmRetrievalQueries extends LlmCurationQueries {

  /** #42b BM25 retrieval: top-10 docs for a 3-term bag-of-words
    * query, Okapi BM25 (k1 = 6/5, b = 3/4) with rational idf and
    * per-term 1e-9 floor quantization — every step integer-exact, so
    * score AND ranking are pinned cross-engine (see
    * TextAnalysis.bm25).
    */
  val qTextBm25: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.TextAnalysis.bm25(
      t(s, dir, "documents"), queryTerms = Seq("join", "vector", "stream"), topK = 10),
    oracle = Some(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), dl AS (
        |  SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
        |), tot AS (
        |  SELECT (SELECT count(*) FROM documents) AS n_docs,
        |         (SELECT count(*) FROM tok) AS t_tok
        |), qt AS (
        |  SELECT unnest(['join', 'vector', 'stream']) AS term
        |), q AS (
        |  SELECT doc_id, term FROM tok JOIN qt USING (term)
        |), dfreq AS (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM q GROUP BY 1
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM q GROUP BY 1, 2
        |), contrib AS (
        |  SELECT tf.doc_id,
        |    CAST(CAST(2*n_docs - 2*df + 1 AS HUGEINT) * (11*tf) * (4*t_tok) * 1000000000
        |      // (CAST(2*df + 1 AS HUGEINT)
        |          * (CAST(20 AS HUGEINT)*tf*t_tok + 6*t_tok
        |             + CAST(18 AS HUGEINT)*dl.dl*n_docs)) AS BIGINT) AS c
        |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
        |)
        |SELECT doc_id, score_fp, n_terms_hit, rk FROM (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_fp,
        |         count(*) AS n_terms_hit,
        |         row_number() OVER (ORDER BY sum(c) DESC, doc_id) AS rk
        |  FROM contrib GROUP BY doc_id
        |) WHERE rk <= 10""".stripMargin))

  /** #100 Hybrid retrieval (RRF fusion): one request, two legs — the
    * BM25 lexical top-20 for a 3-term query and the cosine semantic
    * top-20 around doc 0's embedding — fused by Reciprocal Rank
    * Fusion with floor-quantized integer contributions
    * (⌊10⁶/(60+rank)⌋, [[graft.operators.Retrieval.rrfFuse]]). The
    * RAG-stack production shape: score scales never calibrated, only
    * ranks fused. FULLY ORACLED: both legs' rankings are already
    * first-principles-derivable (the BM25 cross-multiplied rational
    * and the cosine kernel), and the fusion is plain integer
    * division, so DuckDB re-derives the ENTIRE hybrid pipeline.
    */
  val qHybridSearch: QueryDef = QueryDef(
    run = (s, dir) => {
      val lex = graft.operators.TextAnalysis.bm25(
        t(s, dir, "documents"), queryTerms = Seq("join", "vector", "stream"), topK = 20)
        .select(col("doc_id"), col("rk"))
      val emb = t(s, dir, "embeddings")
      val sem = graft.operators.Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") === 0), k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rank").as("rk"))
      graft.operators.Retrieval.rrfFuse(Seq(lex, sem), k = 10)
    },
    oracle = Some(
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
         |), dl AS (
         |  SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
         |), tot AS (
         |  SELECT (SELECT count(*) FROM documents) AS n_docs,
         |         (SELECT count(*) FROM tok) AS t_tok
         |), qt AS (
         |  SELECT unnest(['join', 'vector', 'stream']) AS term
         |), q AS (
         |  SELECT doc_id, term FROM tok JOIN qt USING (term)
         |), dfreq AS (
         |  SELECT term, count(DISTINCT doc_id) AS df FROM q GROUP BY 1
         |), tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM q GROUP BY 1, 2
         |), contrib AS (
         |  SELECT tf.doc_id,
         |    CAST(CAST(2*n_docs - 2*df + 1 AS HUGEINT) * (11*tf) * (4*t_tok) * 1000000000
         |      // (CAST(2*df + 1 AS HUGEINT)
         |          * (CAST(20 AS HUGEINT)*tf*t_tok + 6*t_tok
         |             + CAST(18 AS HUGEINT)*dl.dl*n_docs)) AS BIGINT) AS c
         |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
         |), lex AS (
         |  SELECT doc_id, rk FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY sum(c) DESC, doc_id) AS rk
         |    FROM contrib GROUP BY doc_id
         |  ) WHERE rk <= 20
         |), e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
         |), scored AS (
         |  SELECT c.vec_id AS doc_id, c.v AS va, q.v AS vb
         |  FROM e c, e q WHERE q.vec_id = 0 AND c.vec_id != 0
         |), sem AS (
         |  SELECT doc_id, rk FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY $cosSql DESC, doc_id) AS rk
         |    FROM scored
         |  ) WHERE rk <= 20
         |), legs AS (
         |  SELECT doc_id, rk FROM lex UNION ALL SELECT doc_id, rk FROM sem
         |), fused AS (
         |  SELECT doc_id, CAST(sum(1000000 // (60 + rk)) AS BIGINT) AS rrf_fp,
         |         count(*) AS n_legs
         |  FROM legs GROUP BY doc_id
         |)
         |SELECT doc_id, rrf_fp, n_legs, rk FROM (
         |  SELECT doc_id, rrf_fp, n_legs,
         |         row_number() OVER (ORDER BY rrf_fp DESC, doc_id) AS rk
         |  FROM fused
         |) WHERE rk <= 10""".stripMargin))

  /** #100b Graded retrieval evaluation — NDCG@10 + reciprocal rank
    * per query ([[graft.operators.Retrieval.ndcgAtK]]): the exact
    * cosine top-10 as the run, graded qrels derived from embedding
    * labels (same label → rel 2, adjacent label → rel 1), and the
    * whole metric chain in frozen integers — gains 2^rel−1, the
    * ⌊10⁶/log₂(r+1)⌋ discount table computed ONCE on the driver and
    * inlined as literals into BOTH the plan and this oracle, DCG/IDCG
    * as BIGINT sums, ndcg_bp/rr_fp as integer division. DuckDB
    * re-derives the run (cosine ranking), the qrels, the ideal
    * ordering, and every metric bit-for-bit. Queries with no
    * relevant docs still report zeros (the recallAtK anti-lying
    * contract).
    */
  val qEvalNdcg: QueryDef = QueryDef(
    run = (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val run = graft.operators.Similarity.bruteForceTopK(emb, q, k = 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank").as("rk"))
      val qrels = emb.select(col("vec_id").as("doc_id"), col("label").as("_dl"))
        .crossJoin(broadcast(q.select(col("vec_id").as("query_id"), col("label").as("_ql"))))
        .filter(col("doc_id") =!= col("query_id"))
        .withColumn("rel",
          when(col("_dl") === col("_ql"), 2)
            .when(abs(col("_dl") - col("_ql")) === 1, 1).otherwise(0))
        .select(col("query_id"), col("doc_id"), col("rel"))
      graft.operators.Retrieval.ndcgAtK(run, qrels, k = 10)
    },
    oracle = Some {
      // the SAME frozen discount literals the plan ships (see
      // Retrieval.discounts) — interpolated, never recomputed in SQL
      val discVals = graft.operators.Retrieval.discounts(10)
        .zipWithIndex.map { case (d, i) => s"(${i + 1}, ${d})" }.mkString(", ")
      s"""WITH e AS (
         |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), sc AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id, c.v AS va, q.v AS vb
         |  FROM e c, e q WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
         |), run AS (
         |  SELECT query_id, doc_id, rk FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY $cosSql DESC, doc_id) AS rk
         |    FROM sc) WHERE rk <= 10
         |), qr AS (
         |  SELECT q.vec_id AS query_id, d.vec_id AS doc_id,
         |         CASE WHEN d.label = q.label THEN 2 ELSE 1 END AS rel
         |  FROM e d, e q
         |  WHERE q.vec_id < 10 AND d.vec_id != q.vec_id
         |    AND (d.label = q.label OR abs(d.label - q.label) = 1)
         |), disc AS (
         |  SELECT * FROM (VALUES $discVals) AS t(rk, d)
         |), hit AS (
         |  SELECT r.query_id, r.rk, CASE qr.rel WHEN 2 THEN 3 ELSE 1 END AS gain
         |  FROM run r JOIN qr ON qr.query_id = r.query_id AND qr.doc_id = r.doc_id
         |), dcg AS (
         |  SELECT query_id, sum(gain * d.d) AS dcg_fp, count(*) AS n_rel_found,
         |         min(rk) AS frk
         |  FROM hit JOIN disc d USING (rk) GROUP BY 1
         |), ideal AS (
         |  SELECT query_id, rel,
         |         row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id) AS irk
         |  FROM qr
         |), idcg AS (
         |  SELECT query_id,
         |    sum(CASE WHEN irk <= 10
         |             THEN (CASE rel WHEN 2 THEN 3 ELSE 1 END) * d.d END) AS idcg_fp,
         |    count(*) AS n_rel
         |  FROM ideal LEFT JOIN disc d ON d.rk = irk GROUP BY 1
         |)
         |SELECT qq.query_id,
         |  CAST(coalesce(dcg_fp, 0) AS BIGINT) AS dcg_fp,
         |  CAST(coalesce(idcg_fp, 0) AS BIGINT) AS idcg_fp,
         |  CAST(CASE WHEN coalesce(idcg_fp, 0) = 0 THEN 0
         |            ELSE coalesce(dcg_fp, 0) * 10000 // idcg_fp END AS BIGINT) AS ndcg_bp,
         |  CAST(coalesce(1000000 // frk, 0) AS BIGINT) AS rr_fp,
         |  CAST(coalesce(n_rel_found, 0) AS BIGINT) AS n_rel_found,
         |  CAST(coalesce(n_rel, 0) AS BIGINT) AS n_rel
         |FROM (SELECT DISTINCT query_id FROM run) qq
         |LEFT JOIN dcg USING (query_id) LEFT JOIN idcg USING (query_id)""".stripMargin
    })

  /** #43 Language-balanced capping: at most 60 docs per language,
    * deterministically by doc_id — rebalances the en-heavy corpus.
    * The seeded-hash order variant is spec-tested (no cross-engine
    * hash to oracle against); doc_id order IS the oracle-able one.
    */
  val qLangBalance: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Sampling.capPerGroup(
        t(s, dir, "documents"), groupCol = "lang", orderCol = "doc_id", k = 60,
        seqCol = "lang_seq")
        .select(col("doc_id"), col("lang"), col("lang_seq")),
    oracle = Some(
      """SELECT doc_id, lang, lang_seq FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS lang_seq
        |  FROM documents
        |) WHERE lang_seq <= 60""".stripMargin))

  /** #41c Engine-reproducible stratified sample: en documents
    * downsampled to 25% by multiplicative key hash, other strata kept
    * — the oracle runs the identical integer formula, so the sampled
    * SET (not just its size) is pinned cross-engine.
    */
  val qHashSample: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Sampling.reproducibleStratified(
        t(s, dir, "documents"), "lang", "doc_id", Map("en" -> 0.25))
        .select(col("doc_id"), col("lang"), col("source")),
    oracle = Some(
      """SELECT doc_id, lang, source FROM documents
        |WHERE ((doc_id % 2147483648) * 2654435761) % 2147483648
        |      < CASE WHEN lang = 'en'
        |             THEN CAST(round(0.25 * 2147483648) AS BIGINT)
        |             ELSE 2147483648 END""".stripMargin))

  /** #41e Deterministic WEIGHTED priority sample per language: the 40
    * docs per lang with the smallest hash(doc_id)/n_chars priority —
    * longer documents proportionally likelier, zero randomness, and
    * the oracle regenerates the IDENTICAL sample (integer hash +
    * IEEE-exact division only — see Sampling.weightedPriorityPerGroup
    * for why exponential keys can't cross engines).
    */
  val qWeightedSample: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Sampling.weightedPriorityPerGroup(
        t(s, dir, "documents"), groupCol = "lang", keyCol = "doc_id",
        weightCol = "n_chars", k = 40)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("pri_rank")),
    oracle = Some(
      """SELECT doc_id, lang, n_chars, pri_rank FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY
        |      CAST(((doc_id % 2147483648) * 2654435761) % 2147483648 AS DOUBLE)
        |        / n_chars,
        |      doc_id) AS pri_rank
        |  FROM documents WHERE n_chars > 0
        |) WHERE pri_rank <= 40""".stripMargin))

  /** #43c Deterministic negative sampling: 3 pseudo-random contrast
    * partners per document from a fixed integer schedule — the oracle
    * regenerates the identical (doc_id, j, neg_id) triples, so the
    * training pairs themselves are pinned cross-engine.
    */
  val qNegSample: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Sampling.negativeSamples(
        t(s, dir, "documents"), "doc_id", k = 3),
    oracle = Some(
      """SELECT doc_id, j,
        |  ((doc_id % 2147483648) * 2654435761 + j * 40503) % 2147483648
        |    % (SELECT count(*) FROM documents) AS neg_id
        |FROM documents, unnest([1, 2, 3]) AS t(j)""".stripMargin))

  /** #43b Deterministic corpus shuffle + sharding: multiplicative-
    * hash pseudo-random order, reproducible engine-to-engine (the
    * oracle runs the identical integer formula) — training-data read
    * order without `ORDER BY rand()` or a global sort.
    */
  val qShuffleShard: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Sampling.shuffleShard(
        t(s, dir, "documents").select(col("doc_id")), "doc_id", shards = 8),
    oracle = Some(
      """WITH h AS (
        |  SELECT doc_id,
        |    ((doc_id % 2147483648) * 2654435761) % 2147483648 AS hv
        |  FROM documents
        |)
        |SELECT doc_id, hv % 8 AS shard,
        |  row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) AS pos
        |FROM h""".stripMargin))

  /** #44 Source-blocklist filtering: drop documents from denylisted
    * sources via broadcast anti join (the blocklist is a TABLE — see
    * Curation.dropBlockedSources).
    */
  protected val blockedSources = Seq("src3", "src7", "src13")
  val qBlocklist: QueryDef = QueryDef(
    run = (s, dir) => {
      import s.implicits._
      val block = blockedSources.toDF("blocked_source")
      graft.operators.Curation.dropBlockedSources(
        t(s, dir, "documents"), "source", block, "blocked_source")
        .select(col("doc_id"), col("lang"), col("source"))
    },
    oracle = Some(
      // `IS NULL OR NOT IN` matches left-anti semantics: the anti join
      // KEEPS null sources, plain NOT IN would drop them
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE source IS NULL OR source NOT IN (${blockedSources.map(b => s"'$b'").mkString(", ")})""".stripMargin))

  /** #45 Benchmark decontamination: training docs (doc_id % 10 != 9)
    * sharing any 8-gram with the holdout (doc_id % 10 == 9). Spark
    * joins on 64-bit hashed shingles (codegen'd kernel, 8-byte
    * shuffle); the oracle joins raw n-gram strings — identical
    * results barring a 2^-64 hash collision.
    */
  val qDecontam: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 9)
      val test = docs.filter(pmod(col("doc_id"), lit(10)) === 9)
      graft.operators.Curation.decontaminate(train, test, n = 8)
    },
    oracle = Some(
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), tr AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(w) - 6), i -> array_to_string(w[i:i+7], ' '))) AS sh
        |  FROM w WHERE doc_id % 10 != 9
        |), te AS (
        |  SELECT DISTINCT doc_id AS test_id,
        |         unnest(list_transform(range(1, len(w) - 6), i -> array_to_string(w[i:i+7], ' '))) AS sh
        |  FROM w WHERE doc_id % 10 = 9
        |)
        |SELECT tr.doc_id,
        |       count(DISTINCT sh) AS n_shared_ngrams,
        |       count(DISTINCT test_id) AS n_test_docs
        |FROM tr JOIN te USING (sh)
        |GROUP BY tr.doc_id""".stripMargin))

  /** #45b Incremental decontamination: holdout n-gram index built
    * ONCE, two train batches checked against it at O(batch) each;
    * union of batch outputs == the one-shot run — same oracle as
    * decontam_ngram.
    */
  val qDecontamInc: QueryDef = QueryDef(
    run = (s, dir) => {
      val idx = scratch("decontam-index")
      val docs = t(s, dir, "documents")
      val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 9)
      graft.operators.Curation.buildDecontamIndex(
        docs.filter(pmod(col("doc_id"), lit(10)) === 9), idx, n = 8)
      val b1 = graft.operators.Curation.decontaminateIncremental(
        s, idx, train.filter(col("doc_id") % 2 === 0), n = 8)
      val b2 = graft.operators.Curation.decontaminateIncremental(
        s, idx, train.filter(col("doc_id") % 2 === 1), n = 8)
      b1.unionByName(b2)
    },
    oracle = qDecontam.oracle)

  /** #46 Sequence packing: per-language concatenate-and-cut into
    * 512-token packs (see Curation.pack) — the doc→training-batch
    * layout step.
    */
  val qTextPack: QueryDef = QueryDef(
    run = (s, dir) => {
      val withTok = graft.operators.TextAnalysis.withTokenCounts(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("ws_tokens").cast("long").as("n_tokens"))
      graft.operators.Curation.pack(withTok,
        partitionCol = "lang", orderCol = "doc_id", weightCol = "n_tokens", budget = 512L)
    },
    oracle = Some(
      """WITH tkn AS (
        |  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM tkn
        |)
        |SELECT doc_id, lang, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id,
        |  CAST((cum - n_tokens) % 512 AS BIGINT) AS pack_off
        |FROM c""".stripMargin))

  /** #84 BUDGET-BOUNDED corpus selection
    * ([[graft.operators.Curation.selectUnderBudget]]): keep the
    * best-scored documents until a global token/char budget fills —
    * the "select the top of the corpus up to N tokens" step every
    * fixed-budget training run needs. Semantically ONE global window
    * (rank by score DESC, key ASC; keep while running − size <
    * budget, crossing row included) — but the implementation never
    * sorts the corpus: one score histogram, a driver walk to the
    * single crossing score-class, a plain filter for every better
    * class, and a window over just the boundary class. The oracle IS
    * the single global window, so the kept SET (not just its size) is
    * pinned cross-engine; here budget = total chars ÷ 4, scored by
    * doc length.
    */
  val qBudgetSelect: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      val total = docs.agg(sum(col("n_chars"))).head().getLong(0)
      graft.operators.Curation.selectUnderBudget(
        docs, scoreCol = "n_chars", sizeCol = "n_chars", keyCol = "doc_id",
        budget = total / 4)
        .select(col("doc_id"), col("lang"), col("source"))
    },
    oracle = Some(
      """WITH b AS (SELECT sum(n_chars) // 4 AS budget FROM documents),
        |ranked AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    sum(n_chars) OVER (ORDER BY n_chars DESC, doc_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents)
        |SELECT doc_id, lang, source FROM ranked, b WHERE cum - n_chars < budget"""
        .stripMargin))

  /** #46b Whole-document bin packing (first-fit decreasing): docs
    * never split across packs — attention-boundary-safe batching.
    * The placement rule is sequential per shard, but DETERMINISTIC
    * integer arithmetic — so the oracle replays it exactly with a
    * recursive CTE that places one document per recursion step,
    * carrying each shard's bin fills as a list (first fit =
    * `nullif(list_position(...), 0)`, DuckDB's 0 = not-found).
    * Invariants (budget, ceil(total/budget) lower bound,
    * bit-reproducibility) are additionally spec-tested.
    */
  val qTextPackFfd: QueryDef = QueryDef(
    run = (s, dir) => {
      val withTok = graft.operators.TextAnalysis.withTokenCounts(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("ws_tokens").cast("long").as("n_tokens"))
      graft.operators.Curation.packFfd(withTok,
        partitionCol = "lang", idCol = "doc_id", weightCol = "n_tokens", budget = 512L)
    },
    oracle = Some(
      """WITH RECURSIVE tkn AS (
        |  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents
        |), items AS (
        |  SELECT lang, doc_id, n_tokens,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_tokens DESC, doc_id) AS rn
        |  FROM tkn
        |), steps AS (
        |  SELECT lang, CAST(0 AS BIGINT) AS rn, CAST([] AS BIGINT[]) AS fills,
        |         CAST([] AS STRUCT(id BIGINT, w BIGINT, pack INT, off BIGINT)[]) AS asg
        |  FROM (SELECT DISTINCT lang FROM items)
        |  UNION ALL
        |  SELECT s.lang, i.rn,
        |    CASE WHEN coalesce(nullif(list_position(list_transform(s.fills, f -> f + i.n_tokens <= 512), true), 0), len(s.fills)+1) <= len(s.fills)
        |         THEN list_transform(s.fills, (f, ix) -> CASE WHEN ix = coalesce(nullif(list_position(list_transform(s.fills, f2 -> f2 + i.n_tokens <= 512), true), 0), len(s.fills)+1) THEN f + i.n_tokens ELSE f END)
        |         ELSE list_append(s.fills, i.n_tokens) END AS fills,
        |    list_append(s.asg, {id: i.doc_id, w: i.n_tokens,
        |      pack: CAST(coalesce(nullif(list_position(list_transform(s.fills, f -> f + i.n_tokens <= 512), true), 0), len(s.fills)+1) - 1 AS INT),
        |      off: coalesce(s.fills[coalesce(nullif(list_position(list_transform(s.fills, f -> f + i.n_tokens <= 512), true), 0), len(s.fills)+1)], 0)}) AS asg
        |  FROM steps s JOIN items i ON i.lang = s.lang AND i.rn = s.rn + 1
        |), final AS (
        |  SELECT lang, asg, row_number() OVER (PARTITION BY lang ORDER BY rn DESC) AS rk FROM steps
        |)
        |SELECT lang, u.a.id AS doc_id, u.a.w AS n_tokens, u.a.pack AS pack_id, u.a.off AS pack_off
        |FROM (SELECT lang, unnest(asg) AS a FROM final WHERE rk = 1) u(lang, a)""".stripMargin))

  /** #82 DSIR-style importance weights (hashed-unigram frequency
    * ratios vs the English target domain, add-one smoothed, exact
    * integer arithmetic — see Curation.importanceWeights). The
    * oracle re-derives word buckets from the FNV fold over ASCII
    * codepoints and the same floor-divided ratio in HUGEINT.
    */
  val qImportance: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Curation.importanceWeights(
      t(s, dir, "documents"), isTarget = col("lang") === "en"),
    oracle = Some(
      """WITH tok AS (
        |  SELECT doc_id, lang = 'en' AS t, w
        |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE strlen(w) >= 1
        |), wh AS (
        |  SELECT w, CAST(list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |      list_transform(range(1, strlen(w)+1), i -> CAST(unicode(w[i]) AS HUGEINT))),
        |    (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                 * 1099511628211) % 18446744073709551616
        |  ) % 256 AS BIGINT) AS b
        |  FROM (SELECT DISTINCT w FROM tok)
        |), bc AS (
        |  SELECT b,
        |    sum(CASE WHEN t THEN 1 ELSE 0 END) AS tc,
        |    sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS rc
        |  FROM tok JOIN wh USING (w) GROUP BY b
        |), tot AS (
        |  SELECT CAST(sum(tc) AS HUGEINT) AS ttot, CAST(sum(rc) AS HUGEINT) AS rtot FROM bc
        |), r AS (
        |  SELECT b, CAST((CAST(tc + 1 AS HUGEINT) * rtot * 10000)
        |                 // (CAST(rc + 1 AS HUGEINT) * ttot) AS BIGINT) AS ratio
        |  FROM bc, tot
        |)
        |SELECT doc_id, count(*) AS n_tokens, CAST(sum(ratio) AS BIGINT) AS importance
        |FROM tok JOIN wh USING (w) JOIN r USING (b)
        |GROUP BY doc_id""".stripMargin))

  /** #82b Importance RESAMPLING — the selection half DSIR's weights
    * exist for: keep doc i with P = importanceᵢ/max(importance),
    * drawn deterministically (hash₃₁(id)·wMax < w·2³¹,
    * division-free cross-multiplication) so the kept SET is
    * byte-identical on any engine — oracled by suffixing the
    * resample onto the full importance-weight re-derivation (see
    * [[graft.operators.Sampling.weightedBernoulli]]).
    */
  val qImportanceResample: QueryDef = QueryDef(
    run = (s, dir) => {
      val w = graft.operators.Curation.importanceWeights(
        t(s, dir, "documents"), isTarget = col("lang") === "en")
      graft.operators.Sampling.weightedBernoulli(w, col("doc_id"), col("importance"))
    },
    oracle = Some {
      val imp = qImportance.oracle.get
      val cut = imp.lastIndexOf("SELECT doc_id, count(*) AS n_tokens")
      require(cut > 0, "importance oracle shape changed; fix the resample suffix")
      imp.substring(0, cut) +
        """, imp AS (
          |  SELECT doc_id, count(*) AS n_tokens, CAST(sum(ratio) AS BIGINT) AS importance
          |  FROM tok JOIN wh USING (w) JOIN r USING (b)
          |  GROUP BY doc_id
          |), mx AS (
          |  SELECT CAST(max(importance) AS HUGEINT) AS m FROM imp
          |)
          |SELECT doc_id, n_tokens, importance
          |FROM imp CROSS JOIN mx
          |WHERE CAST(((doc_id % 2147483648) * 2654435761) % 2147483648 AS HUGEINT) * m
          |      < CAST(importance AS HUGEINT) * 2147483648""".stripMargin
    })

  /** #47 Repetition metrics: within-doc duplicate 3-gram signals
    * (see TextAnalysis.repetitionMetrics).
    */
  val qTextRepetition: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.TextAnalysis.repetitionMetrics(t(s, dir, "documents"), n = 3),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), g AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))) AS g
        |  FROM t WHERE len(w) >= 3
        |), c AS (
        |  SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2
        |)
        |SELECT doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_ngrams,
        |  count(*) AS n_distinct,
        |  CAST(max(c) AS BIGINT) AS max_rep,
        |  CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dup_ratio
        |FROM c GROUP BY doc_id""".stripMargin))

  /** #48 Heavy-hitter terms (share >= 0.5%): Misra-Gries candidates +
    * exact verification (see HeavyHitters) — the oracle is the plain
    * exact HAVING query, which the sketch-pruned plan must reproduce
    * EXACTLY by the survival guarantee.
    */
  val qHeavyTerms: QueryDef = QueryDef(
    run = (s, dir) => {
      val tokens = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
      graft.operators.HeavyHitters.frequent(tokens, "term", minShare = 0.005)
    },
    oracle = Some(
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents
        |), n AS (
        |  SELECT count(*) AS n_total FROM tok
        |)
        |SELECT term, count(*) AS n, (SELECT n_total FROM n) AS n_total
        |FROM tok GROUP BY term
        |HAVING count(*) >= 0.005 * (SELECT n_total FROM n)""".stripMargin))

  /** #49 Token-id encoding against the built vocabulary (top-200
    * covers the corpus; OOV stays null by LEFT-join semantics).
    */
  val qTextEncode: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.TextAnalysis.encode(
        docs, graft.operators.TextAnalysis.vocab(docs, topK = 200))
    },
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(range(len(w))) AS pos, unnest(w) AS term FROM t
        |), agg AS (
        |  SELECT term, count(*) AS tf FROM tok GROUP BY term
        |), vocab AS (
        |  SELECT term, row_number() OVER (ORDER BY tf DESC, term) AS token_id FROM agg
        |  QUALIFY token_id <= 200
        |)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos, v.token_id
        |FROM tok LEFT JOIN vocab v USING (term)""".stripMargin))

  /** #28b Per-label embedding centroids: elementwise mean via
    * posexplode + one hash aggregate — map-side partial combine
    * collapses the exploded rows to labels × dims before the shuffle.
    * Accumulation is FIXED-POINT (floor(v·1e9) summed as longs): an
    * order-independent, rounding-mode-free quantization — decimal
    * casts of a dyadic float differ between engines (Spark HALF_UP vs
    * DuckDB HALF_EVEN at the cut digit), while floor after an exact
    * float→double widen is bit-defined everywhere. 1e-9 resolution
    * dwarfs float32 input precision.
    */
  val qEmbCentroids: QueryDef = QueryDef(
    run = (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(
          (sum(floor(col("v").cast("double") * 1e9).cast("long")).cast("double")
            / count(lit(1)) / 1e9).as("centroid"),
          count(lit(1)).as("n_vectors"))
        .withColumn("pos", col("pos").cast("long")),
    oracle = Some(
      """WITH e AS (
        |  SELECT label,
        |         unnest(range(len(embedding))) AS pos,
        |         unnest(embedding) AS v
        |  FROM embeddings
        |)
        |SELECT label, CAST(pos AS BIGINT) AS pos,
        |  CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000000.0) AS BIGINT)) AS DOUBLE)
        |    / count(*) / 1000000000.0 AS centroid,
        |  count(*) AS n_vectors
        |FROM e GROUP BY label, pos""".stripMargin))

  /** #28c Int8 scalar quantization of embeddings (bounded to
    * vec_id < 200 for the dump; the operator is corpus-generic) —
    * floor-based so codes are bit-identical across engines.
    */
  val qEmbQuantize: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Similarity.scalarQuantize(
        t(s, dir, "embeddings").filter(col("vec_id") < 200)),
    oracle = Some(
      """WITH e AS (
        |  SELECT vec_id,
        |         CAST(list_min(embedding) AS DOUBLE) AS mn,
        |         CAST(list_max(embedding) AS DOUBLE) AS mx,
        |         unnest(range(len(embedding))) AS pos,
        |         unnest(embedding) AS v
        |  FROM embeddings WHERE vec_id < 200
        |)
        |SELECT vec_id, CAST(pos AS BIGINT) AS pos,
        |  CAST(CASE WHEN mx = mn THEN 0
        |       ELSE least(255, floor((CAST(v AS DOUBLE) - mn) * 255 / (mx - mn))) END AS INT) AS code
        |FROM e""".stripMargin))

  /** #29b IVF (KMeans coarse quantizer) approximate top-k — FULLY
    * ORACLED: sample order, the 10 Lloyd iterations, float-cast cell
    * assignment, probes, and the in-cell cosine top-k are all
    * re-derived in DuckDB ([[OracleSql.ivfTopkSql]]); the recall spec
    * against brute force stays as the semantic check. */
  val qSimIvfTopk: QueryDef = QueryDef(
    run = (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
    },
    oracle = Some(OracleSql.ivfTopkSql()))

  /** #29c Persisted IVF index: built once (centroids + cell-
    * partitioned corpus on disk), queried with explicit partition
    * pruning — probe work AND I/O are ~nprobe/nlist of the corpus.
    * Shares sim_ivf_topk's oracle: centroids round-trip parquet as
    * exact doubles, so the persisted index must answer exactly what
    * the inline computation answers — the gate now PROVES the
    * equality the spec used to assert.
    */
  val qSimIvfIndexTopk: QueryDef = QueryDef(
    run = (s, dir) => {
      val idx = scratch("ivf-index")
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.buildIvfIndex(emb, idx, nlist = 16)
      graft.operators.Similarity.ivfIndexTopK(s, idx, emb.filter(col("vec_id") < 10),
        k = 5, nprobe = 2)
    },
    oracle = Some(OracleSql.ivfTopkSql()))

  /** #34 Multimodal plumbing, ORACLED: binary payloads → batch
    * decode stub → feature columns, with the 8-dim content embedding
    * EXPLODED to (dim, fval) rows. Every output is deterministic
    * integer-or-IEEE arithmetic DuckDB re-derives from first
    * principles: dims/frames as modular arithmetic on the payload's
    * FNV-1a64 (the q_mm_decode derivation), and each feature value
    * as one more FNV fold step (payload ++ dim byte) divided by
    * Long.MaxValue — integer→double casts, division, and the
    * double→float demotion are all correctly-rounded IEEE ops, so
    * the floats match bit-for-bit cross-engine. Only byte_entropy
    * (log-based, libm-dependent) stays out of the gate projection;
    * the ScalaTest spec covers it.
    */
  val qMmFeatures: QueryDef = QueryDef(
    run = (s, dir) => {
      val media = graft.operators.Multimodal.mediaFromDocuments(t(s, dir, "documents"))
      graft.operators.Multimodal.decodeStub(media).toDF()
        .select(col("media_id"), col("modality"), col("n_bytes"), col("width"),
          col("height"), col("n_frames"), posexplode(col("feature")).as(Seq("dim", "fval")))
    },
    oracle = Some(
      """WITH by AS (
        |  SELECT doc_id, flatten(list_transform(range(1, length(text)+1), i -> CASE
        |    WHEN unicode(text[i]) < 128 THEN [unicode(text[i])]
        |    WHEN unicode(text[i]) < 2048 THEN
        |      [192 + unicode(text[i]) // 64, 128 + unicode(text[i]) % 64]
        |    WHEN unicode(text[i]) < 65536 THEN
        |      [224 + unicode(text[i]) // 4096, 128 + (unicode(text[i]) // 64) % 64,
        |       128 + unicode(text[i]) % 64]
        |    ELSE
        |      [240 + unicode(text[i]) // 262144, 128 + (unicode(text[i]) // 4096) % 64,
        |       128 + (unicode(text[i]) // 64) % 64, 128 + unicode(text[i]) % 64]
        |  END)) AS bs
        |  FROM documents
        |), fp AS (
        |  SELECT doc_id, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |                 list_transform(bs, b -> CAST(b AS HUGEINT))),
        |    (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                 * 1099511628211) % 18446744073709551616
        |  ) AS h
        |  FROM by
        |), fd AS (
        |  SELECT doc_id, h, unnest(range(0, 8)) AS dim FROM fp
        |), fv AS (
        |  SELECT doc_id, dim,
        |    ((h - h % 256 + xor(CAST(h % 256 AS BIGINT), CAST(dim AS BIGINT)))
        |     * 1099511628211) % 18446744073709551616 AS hd
        |  FROM fd
        |)
        |SELECT doc_id AS media_id,
        |  CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(64 + (CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |                  THEN CAST(18446744073709551616 AS HUGEINT) - h
        |                  ELSE h END) % 1024 AS INT) AS width,
        |  CAST(64 + (h // 131072) % 1024 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 2
        |            THEN 1 + (h // 2147483648) % 32 ELSE 1 END AS INT) AS n_frames,
        |  CAST(dim AS INT) AS dim,
        |  CAST(CAST(CASE WHEN hd >= CAST(9223372036854775808 AS HUGEINT)
        |                 THEN hd - CAST(18446744073709551616 AS HUGEINT)
        |                 ELSE hd END AS DOUBLE)
        |       / CAST(9223372036854775807 AS DOUBLE) AS REAL) AS fval
        |FROM fv JOIN fp USING (doc_id) JOIN documents USING (doc_id)""".stripMargin))

  /** #34b Multimodal metadata rollup, ORACLED: per-modality counts
    * and byte-size stats computed on the opaque `binary` payload
    * (length() over binary = payload bytes). The oracle reconstructs
    * the media table's metadata from documents (payload = UTF-8 text
    * bytes; the corpus is ASCII, so strlen == octet count — asserted
    * by the hash match itself).
    */
  val qMmMetadata: QueryDef = QueryDef(
    run = (s, dir) => {
      val media = graft.operators.Multimodal.mediaFromDocuments(t(s, dir, "documents"))
      media.toDF()
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n_media"),
          sum(length(col("content"))).as("total_bytes"),
          min(length(col("content"))).as("min_bytes"),
          max(length(col("content"))).as("max_bytes"))
    },
    oracle = Some(
      """SELECT CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  count(*) AS n_media,
        |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        |  CAST(min(strlen(text)) AS INTEGER) AS min_bytes,
        |  CAST(max(strlen(text)) AS INTEGER) AS max_bytes
        |FROM documents GROUP BY 1""".stripMargin))

  /** #34c Multimodal decode-stub dimensions, ORACLED: the stub's
    * width/height/frame outputs are pure integer functions of the
    * payload's FNV-1a64 (decodeOne, Multimodal.scala), so DuckDB
    * re-derives them from first principles — UTF-8 byte expansion of
    * the RAW text payload (no normalization, unlike the fingerprint),
    * the same HUGEINT FNV fold, then width/height/frames as modular
    * arithmetic on the unsigned hash. byte_entropy and the float
    * feature vector stay under mm_features' rows-only check.
    */
  val qMmDecode: QueryDef = QueryDef(
    run = (s, dir) => {
      val media = graft.operators.Multimodal.mediaFromDocuments(t(s, dir, "documents"))
      graft.operators.Multimodal.decodeStub(media).toDF()
        .select(col("media_id"), col("modality"), col("n_bytes"),
          col("width"), col("height"), col("n_frames"))
    },
    oracle = Some(
      """WITH by AS (
        |  SELECT doc_id, flatten(list_transform(range(1, length(text)+1), i -> CASE
        |    WHEN unicode(text[i]) < 128 THEN [unicode(text[i])]
        |    WHEN unicode(text[i]) < 2048 THEN
        |      [192 + unicode(text[i]) // 64, 128 + unicode(text[i]) % 64]
        |    WHEN unicode(text[i]) < 65536 THEN
        |      [224 + unicode(text[i]) // 4096, 128 + (unicode(text[i]) // 64) % 64,
        |       128 + unicode(text[i]) % 64]
        |    ELSE
        |      [240 + unicode(text[i]) // 262144, 128 + (unicode(text[i]) // 4096) % 64,
        |       128 + (unicode(text[i]) // 64) % 64, 128 + unicode(text[i]) % 64]
        |  END)) AS bs
        |  FROM documents
        |), fp AS (
        |  SELECT doc_id, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |                 list_transform(bs, b -> CAST(b AS HUGEINT))),
        |    (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                 * 1099511628211) % 18446744073709551616
        |  ) AS h
        |  FROM by
        |)
        |SELECT doc_id AS media_id,
        |  CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(64 + (CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |                  THEN CAST(18446744073709551616 AS HUGEINT) - h
        |                  ELSE h END) % 1024 AS INT) AS width,
        |  CAST(64 + (h // 131072) % 1024 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 2
        |            THEN 1 + (h // 2147483648) % 32 ELSE 1 END AS INT) AS n_frames
        |FROM fp JOIN documents USING (doc_id)""".stripMargin))

  /** #34d Perceptual-hash multimodal near-dup (dHash): 64-bit
    * signature from an 8×9 block-mean downsample of the binary
    * payload (adjacent-mean comparison bits — the real dHash shape
    * with the pixel decode stubbed to the byte signal), banded by the
    * same 4×16-bit pigeonhole as dedup_simhash (provably complete at
    * Hamming ≤ 3). The corpus is the media table PLUS a re-encoded
    * copy of every payload (first byte changed, id offset 10⁶) — the
    * re-saved-image scenario perceptual hashing exists for: a 1-byte
    * difference moves one block sum, flipping at most the two
    * comparisons that block borders, so every (original, copy) pair
    * is within Hamming 2 and provably caught. FULLY ORACLED: block
    * sums are exact integer arithmetic over the payload's UTF-8
    * bytes, mean comparisons are cross-multiplied sums (no division
    * anywhere), so DuckDB re-derives every signature from first
    * principles and checks the complete pair set brute-force.
    */
  val qDedupPhash: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      val reencoded = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        overlay(col("text"), lit("x"), lit(1)).as("text"),
        col("source"))
      val media = graft.operators.Multimodal
        .mediaFromDocuments(docs.select(col("doc_id"), col("text"), col("source"))
          .unionByName(reencoded)).toDF()
      graft.operators.Dedup.phashPairs(media, "media_id", "content")
    },
    oracle = Some(
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'x' || substr(text, 2) FROM documents
        |), by AS (
        |  SELECT doc_id, flatten(list_transform(range(1, length(text)+1), i -> CASE
        |    WHEN unicode(text[i]) < 128 THEN [unicode(text[i])]
        |    WHEN unicode(text[i]) < 2048 THEN
        |      [192 + unicode(text[i]) // 64, 128 + unicode(text[i]) % 64]
        |    WHEN unicode(text[i]) < 65536 THEN
        |      [224 + unicode(text[i]) // 4096, 128 + (unicode(text[i]) // 64) % 64,
        |       128 + unicode(text[i]) % 64]
        |    ELSE
        |      [240 + unicode(text[i]) // 262144, 128 + (unicode(text[i]) // 4096) % 64,
        |       128 + (unicode(text[i]) // 64) % 64, 128 + unicode(text[i]) % 64]
        |  END)) AS bs
        |  FROM corpus
        |), blocks AS (
        |  SELECT doc_id, r.b AS b,
        |    coalesce(list_sum(bs[(r.b * len(bs) // 72) + 1 : ((r.b + 1) * len(bs) // 72)]), 0) AS s,
        |    ((r.b + 1) * len(bs) // 72) - (r.b * len(bs) // 72) AS n
        |  FROM by, range(0, 72) r(b)
        |), bits AS (
        |  SELECT b0.doc_id, (b0.b // 9) * 8 + (b0.b % 9) AS pos,
        |    CASE WHEN b1.s * b0.n > b0.s * b1.n THEN 1 ELSE 0 END AS bit
        |  FROM blocks b0 JOIN blocks b1 ON b1.doc_id = b0.doc_id AND b1.b = b0.b + 1
        |  WHERE b0.b % 9 < 8
        |), sigs AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN bit = 1 THEN (CAST(1 AS HUGEINT) << CAST(pos AS HUGEINT))
        |                  ELSE CAST(0 AS HUGEINT) END)
        |      - CASE WHEN max(CASE WHEN pos = 63 AND bit = 1 THEN 1 ELSE 0 END) = 1
        |             THEN CAST(18446744073709551616 AS HUGEINT)
        |             ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS sig
        |  FROM bits GROUP BY doc_id
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin))

  /** #34e Chunk-level media payload dedup via content-defined
    * chunking ([[graft.operators.Multimodal.chunkStoreStats]]): the
    * media corpus PLUS a footer-appended re-encode of every payload
    * (id +3·10⁶ so modality assignment is preserved) — the appended-
    * metadata scenario CDC exists for. Because boundaries are decided
    * by a local 16-byte window hash (positions independent, mod-32
    * gear), appending bytes at the END changes no interior boundary:
    * every chunk of the copy except the tail region hits the chunk
    * store, and the per-modality stored/total ratio shows it. FULLY
    * ORACLED: the UTF-8 byte expansion, every window hash, every
    * chunk hash and the store stats are re-derived in DuckDB with
    * the same HUGEINT FNV fold (mod-32 of the unsigned fold equals
    * the JVM's signed floorMod — 32 divides 2⁶⁴).
    */
  val qMmChunkDedup: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      val copies = docs.select((col("doc_id") + 3000000L).as("doc_id"),
        concat(col("text"), lit("#footer")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      val media = graft.operators.Multimodal.mediaFromDocuments(docs.unionByName(copies))
      graft.operators.Multimodal.chunkStoreStats(media.toDF(), w = 16, div = 32)
    },
    oracle = Some(
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 3000000, text || '#footer' FROM documents
        |), by AS (
        |  SELECT doc_id, flatten(list_transform(range(1, length(text)+1), i -> CASE
        |    WHEN unicode(text[i]) < 128 THEN [unicode(text[i])]
        |    WHEN unicode(text[i]) < 2048 THEN
        |      [192 + unicode(text[i]) // 64, 128 + unicode(text[i]) % 64]
        |    WHEN unicode(text[i]) < 65536 THEN
        |      [224 + unicode(text[i]) // 4096, 128 + (unicode(text[i]) // 64) % 64,
        |       128 + unicode(text[i]) % 64]
        |    ELSE
        |      [240 + unicode(text[i]) // 262144, 128 + (unicode(text[i]) // 4096) % 64,
        |       128 + (unicode(text[i]) // 64) % 64, 128 + unicode(text[i]) % 64]
        |  END)) AS bs
        |  FROM corpus
        |), bd AS (
        |  SELECT doc_id, bs,
        |    [0] || list_filter(range(16, len(bs)), p ->
        |      list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |        list_transform(bs[p-15:p], b -> CAST(b AS HUGEINT))),
        |        (acc, b) -> ((acc - acc % 256
        |                      + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                     * 1099511628211) % 18446744073709551616
        |      ) % 32 = 0) || [len(bs)] AS edges
        |  FROM by
        |), ch AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(edges)), j ->
        |    {h: list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |          list_transform(bs[edges[j]+1:edges[j+1]], b -> CAST(b AS HUGEINT))),
        |          (acc, b) -> ((acc - acc % 256
        |                        + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                       * 1099511628211) % 18446744073709551616),
        |     l: edges[j+1] - edges[j]})) AS c
        |  FROM bd
        |), rows_ AS (
        |  SELECT CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |              ELSE 'video' END AS modality,
        |         c.h AS hash, c.l AS len
        |  FROM ch WHERE c.l > 0
        |), g AS (
        |  SELECT modality, hash, len, count(*) AS n FROM rows_ GROUP BY 1, 2, 3
        |)
        |SELECT modality,
        |  CAST(sum(n) AS BIGINT) AS n_chunks,
        |  CAST(count(*) AS BIGINT) AS n_distinct_chunks,
        |  CAST(sum(len * n) AS BIGINT) AS total_bytes,
        |  CAST(sum(len) AS BIGINT) AS stored_bytes,
        |  CAST(sum(len) * 10000 // sum(len * n) AS BIGINT) AS dedup_bp
        |FROM g GROUP BY 1""".stripMargin))

  /** #14o Merkle-style table content digest per partition — the
    * anti-entropy primitive of table replication (compare digests,
    * re-sync only mismatched groups). Order-independent: Σ fnv64 of
    * a canonical row string in decimal, mod 2⁶³ — so file layout and
    * shuffle order never matter, only content. The oracle re-derives
    * the FNV fold over the canonical string's ASCII codepoints and
    * the same modular sum in HUGEINT.
    */
  val qTableDigest: QueryDef = QueryDef(
    run = (s, dir) => {
      val canonical = concat_ws("\u001f",
        col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)"))
      graft.operators.Profiler.contentDigest(
        t(s, dir, "orders"), Seq("o_orderpriority"), canonical)
    },
    oracle = Some(
      """WITH c AS (
        |  SELECT o_orderpriority,
        |    CAST(o_orderkey AS VARCHAR) || chr(31) || CAST(o_custkey AS VARCHAR) || chr(31)
        |      || o_orderpriority || chr(31) || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS s
        |  FROM orders
        |), h AS (
        |  SELECT o_orderpriority, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |      list_transform(range(1, length(s)+1), i -> CAST(unicode(s[i]) AS HUGEINT))),
        |    (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                 * 1099511628211) % 18446744073709551616
        |  ) AS hu
        |  FROM c
        |)
        |SELECT o_orderpriority, count(*) AS n_rows,
        |  CAST(sum(hu) % 9223372036854775808 AS BIGINT) AS digest
        |FROM h GROUP BY o_orderpriority""".stripMargin))

  /** #56b Fixed-point EWMA per user (α = ½): s₁ = x₁,
    * sₜ = ⌊(sₜ₋₁+xₜ)/2⌋ over cents in (ts, event_id) order — see
    * EventAnalytics.ewma. The oracle replays the recurrence with a
    * recursive CTE stepping row_number per user (values are
    * non-negative, so `//` floor = Spark `div` truncation).
    */
  val qEwma: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.EventAnalytics.ewma(
      t(s, dir, "events").withColumn("cents", round(col("value") * 100).cast("long")),
      entityCol = "user_id", tsCol = "ts", idCol = "event_id", centsCol = "cents"),
    oracle = Some(
      """WITH RECURSIVE e AS (
        |  SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |), r AS (
        |  SELECT user_id, event_id, ts, cents, rn, cents AS ewma FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.ts, e.cents, e.rn, (r.ewma + e.cents) // 2
        |  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
        |)
        |SELECT user_id, event_id, ts, cents, CAST(ewma AS BIGINT) AS ewma FROM r""".stripMargin))

  /** #56c Time-weighted average value per user (TWAP): each event's
    * value holds until the next event; weights in epoch-micros,
    * cents through decimal(18,2), weighted sum in decimal(38,0),
    * final division integer DIV — exact on any engine (cents are
    * non-negative, so floor = truncation).
    */
  val qTwap: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.EventAnalytics.timeWeightedAvg(
      t(s, dir, "events"), entityCol = "user_id", tsCol = "ts",
      idCol = "event_id", valueCol = "value"),
    oracle = Some(
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |), led AS (
        |  SELECT user_id, ts_us, cents,
        |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS next_us
        |  FROM e
        |), agg AS (
        |  SELECT user_id, count(*) AS n_events,
        |         max(ts_us) - min(ts_us) AS span_us,
        |         sum(CASE WHEN next_us IS NOT NULL
        |             THEN CAST(cents AS HUGEINT) * (next_us - ts_us)
        |             ELSE CAST(0 AS HUGEINT) END) AS num
        |  FROM led GROUP BY user_id
        |)
        |SELECT user_id, n_events, span_us, CAST(num // span_us AS BIGINT) AS twap_cents
        |FROM agg WHERE span_us > 0""".stripMargin))

  /** #56d Throttle / debounce: per (user, type), keep an event only
    * when >= 1h has passed since the last KEPT event — a true
    * recurrence (see EventAnalytics.throttle), oracled like q_ewma
    * by replaying the fold one row per step in a recursive CTE.
    */
  val qThrottle: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.EventAnalytics.throttle(
      t(s, dir, "events"), entityCol = "user_id", channelCol = "event_type",
      tsCol = "ts", idCol = "event_id", minGap = lit(3600L)),
    oracle = Some(
      """WITH RECURSIVE e AS (
        |  SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
        |  FROM events
        |), r AS (
        |  SELECT user_id, event_type, event_id, ts, ts_us, rn,
        |         ts_us AS last_kept, TRUE AS kept
        |  FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_type, e.event_id, e.ts, e.ts_us, e.rn,
        |    CASE WHEN e.ts_us >= r.last_kept + 3600000000 THEN e.ts_us ELSE r.last_kept END,
        |    e.ts_us >= r.last_kept + 3600000000
        |  FROM r JOIN e ON e.user_id = r.user_id AND e.event_type = r.event_type
        |                AND e.rn = r.rn + 1
        |)
        |SELECT user_id, event_type, event_id, ts FROM r WHERE kept""".stripMargin))

  /** #20g Interval-overlap join: click-intervals × view-intervals
    * per user ([ts, ts + value minutes], closed ends) through the
    * binned equi-join — the oracle is the plain inequality join the
    * optimizer-unfriendly formulation would run. 10-minute bins;
    * each pair emits once (the bin owning the overlap's start).
    */
  val qIntervalJoin: QueryDef = QueryDef(
    run = (s, dir) => {
      val ev = t(s, dir, "events")
      def side(tp: String, pfx: String) = ev.filter(col("event_type") === tp)
        .select(col("user_id"), col("event_id").as(s"${pfx}_id"),
          unix_micros(col("ts").cast("timestamp")).as(s"${pfx}_start"),
          (unix_micros(col("ts").cast("timestamp")) +
            (col("value").cast("decimal(18,2)") * 100).cast("long") * 600000L)
            .as(s"${pfx}_end"))
      graft.operators.RangeJoin.intervalOverlap(
        side("click", "c"), side("view", "v"), Seq("user_id"),
        "c_start", "c_end", "v_start", "v_end", binWidth = 600L * 1000000L)
    },
    oracle = Some(
      """WITH b AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS s_us,
        |    epoch_us(CAST(ts AS TIMESTAMP))
        |      + CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) * 600000 AS e_us
        |  FROM events
        |)
        |SELECT c.user_id, c.event_id AS c_id, c.s_us AS c_start, c.e_us AS c_end,
        |       v.event_id AS v_id, v.s_us AS v_start, v.e_us AS v_end
        |FROM b c JOIN b v ON c.user_id = v.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND c.s_us <= v.e_us AND v.s_us <= c.e_us""".stripMargin))

  /** #14p MAD outliers: |x − median| > 3 × median-absolute-deviation
    * per event type — the 50%-breakdown robust fence next to IQR and
    * z-scores. Percentile interpolation parity with quantile_cont
    * plus IEEE deviation arithmetic makes the flagged set exact.
    */
  val qMadOutliers: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Profiler.madOutliers(
        t(s, dir, "events").withColumn("cents", round(col("value") * 100).cast("long")),
        "event_type", "cents", k = 3.0)
      .select(col("event_id"), col("event_type"), col("cents"), col("med"), col("mad")),
    oracle = Some(
      """WITH c AS (
        |  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
        |), m AS (
        |  SELECT event_type, quantile_cont(cents, 0.5) AS med FROM c GROUP BY 1
        |), d AS (
        |  SELECT event_type, quantile_cont(abs(cents - med), 0.5) AS mad
        |  FROM c JOIN m USING (event_type) GROUP BY 1
        |)
        |SELECT c.event_id, c.event_type, c.cents, m.med, d.mad
        |FROM c JOIN m USING (event_type) JOIN d USING (event_type)
        |WHERE abs(c.cents - m.med) > 3 * d.mad""".stripMargin))

  /** #14h Winsorization: per-type clamp of integral cents to the
    * [12.5%, 87.5%] interpolated percentiles. Dyadic percentile
    * positions (k/2³) over integral values interpolate exactly in
    * double on both engines — the quartile-fence trick generalized.
    */
  val qWinsorize: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Profiler.winsorize(
        t(s, dir, "events").withColumn("cents", round(col("value") * 100)),
        "event_type", "cents")
        .select(col("event_id"), col("event_type"), col("cents"),
          col("clip_lo"), col("clip_hi"), col("cents_clipped")),
    oracle = Some(
      """WITH c AS (
        |  SELECT event_id, event_type, round(value * 100) AS cents FROM events
        |), q AS (
        |  SELECT event_type,
        |    quantile_cont(cents, 0.125) AS clip_lo,
        |    quantile_cont(cents, 0.875) AS clip_hi
        |  FROM c GROUP BY event_type
        |)
        |SELECT c.event_id, c.event_type, c.cents, q.clip_lo, q.clip_hi,
        |  least(greatest(c.cents, q.clip_lo), q.clip_hi) AS cents_clipped
        |FROM c JOIN q USING (event_type)""".stripMargin))

  /** #14i Pairwise sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²)
    * per event_type over (cents, props.k) — exact BIGINT sums, so the
    * derived covariance and OLS slope are single exact-integer
    * divisions, bit-identical cross-engine (built-in covar_pop runs
    * order-dependent double accumulation — never oracle-able).
    */
  val qPairStats: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Profiler.pairStats(
        t(s, dir, "events")
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long")),
        "event_type", "cents", "k"),
    oracle = Some(
      """WITH c AS (
        |  SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS x,
        |    CAST(json_extract(props, 'k') AS BIGINT) AS y
        |  FROM events
        |)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
        |  CAST(sum(x * y) AS BIGINT) AS sum_xy,
        |  CAST(sum(x * x) AS BIGINT) AS sum_x2, CAST(sum(y * y) AS BIGINT) AS sum_y2,
        |  CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
        |    / CAST(count(*) * count(*) AS DOUBLE) AS cov_pop,
        |  CASE WHEN count(*) * sum(x * x) = sum(x) * sum(x) THEN NULL
        |       ELSE CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
        |              / CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
        |  END AS slope
        |FROM c GROUP BY event_type""".stripMargin))

  /** Deterministic synthetic URL per document (the corpus carries
    * opaque source ids, not URLs): provenance fields a web corpus
    * derives from the crawl URL.
    */
  protected def docUrl: Column =
    concat(lit("https://www."), col("source"), lit("-mirror.org/"),
      col("lang"), lit("/doc/"), col("doc_id").cast("string"),
      lit("?p="), pmod(col("doc_id"), lit(7)).cast("string"))

  /** #50 URL parsing (host/path/query/registered domain) via the
    * codegen'd parse_url built-in; oracle re-derives the same parts
    * with regexes.
    */
  val qUrlParse: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.WebCuration.parseUrls(
        t(s, dir, "documents").select(col("doc_id"), docUrl.as("url"))),
    oracle = Some(
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://www.' || source || '-mirror.org/' || lang || '/doc/' || doc_id
        |      || '?p=' || (doc_id % 7) AS url
        |  FROM documents
        |)
        |SELECT doc_id, url,
        |  regexp_extract(url, 'https?://([^/?#]+)', 1) AS host,
        |  regexp_extract(url, 'https?://[^/?#]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS "query",
        |  regexp_extract(regexp_extract(url, 'https?://([^/?#]+)', 1),
        |                 '([^.]+\.[^.]+)$', 1) AS domain
        |FROM u""".stripMargin))

  /** #50b Per-domain quota (C4-style): at most 10 docs per registered
    * domain, best-first by n_chars (quality proxy), doc_id tiebreak.
    */
  val qDomainCap: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.WebCuration.domainCap(
        graft.operators.WebCuration.parseUrls(
          t(s, dir, "documents").select(col("doc_id"), col("n_chars"), docUrl.as("url"))),
        k = 10, orderCol = "n_chars")
        .select(col("doc_id"), col("domain"), col("n_chars"), col("domain_rank")),
    oracle = Some(
      """WITH p AS (
        |  SELECT doc_id, n_chars,
        |    regexp_extract('www.' || source || '-mirror.org', '([^.]+\.[^.]+)$', 1) AS domain
        |  FROM documents
        |)
        |SELECT doc_id, domain, n_chars, domain_rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY domain
        |    ORDER BY n_chars DESC, doc_id) AS domain_rank
        |  FROM p
        |) WHERE domain_rank <= 10""".stripMargin))

  /** #23b Paragraph-level exact dedup: 10-word chunks deduped
    * corpus-wide (first (doc, position) wins), docs reassembled from
    * surviving chunks.
    */
  val qDedupParagraph: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Dedup.paragraphs(t(s, dir, "documents"), chunkTokens = 10),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), n AS (
        |  SELECT doc_id, w, greatest(1, (len(w) + 9) // 10) AS n_chunks FROM t
        |), c AS (
        |  SELECT doc_id, n_chunks, unnest(range(n_chunks)) AS idx, w FROM n
        |), ch AS (
        |  SELECT doc_id, n_chunks, idx,
        |    array_to_string(w[idx * 10 + 1 : idx * 10 + 10], ' ') AS chunk
        |  FROM c
        |), keep AS (
        |  SELECT *, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
        |  FROM ch
        |)
        |SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks, count(*) AS n_kept,
        |       string_agg(chunk, ' ' ORDER BY idx) AS text_kept
        |FROM keep WHERE rn = 1
        |GROUP BY doc_id, n_chunks""".stripMargin))

  /** #23d Incremental exact dedup: two document batches fold into the
    * content-keyed survivor state (lowest doc_id wins, no rescans of
    * prior batches); the final state must equal `exact` over the full
    * corpus bit-for-bit — same oracle as dedup_exact.
    */
  val qDedupIncremental: QueryDef = QueryDef(
    run = (s, dir) => {
      val statePath = scratch("dedup-inc-state")
      val docs = t(s, dir, "documents")
      graft.operators.Dedup.incrementalExact(
        statePath, docs.filter(col("doc_id") % 2 === 0), "text", "doc_id")
      graft.operators.Dedup.incrementalExact(
        statePath, docs.filter(col("doc_id") % 2 === 1), "text", "doc_id")
      graft.operators.Dedup.incrementalExactRead(s, statePath)
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    },
    oracle = Some(
      """SELECT doc_id, text, lang, source, n_chars FROM (
        |  SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM documents
        |) WHERE rn = 1""".stripMargin))

  /** #23c Duplicated-substring excision (Lee et al. ExactSubstr
    * shape): every 8-token window occurring ≥2× corpus-wide is a
    * duplicated span; covered tokens are cut from every doc. The
    * oracle re-derives the duplicated-window set by grouping the
    * window STRINGS themselves (DuckDB-side exact; the Spark side
    * groups their 64-bit hashes — identical result absent a hash
    * collision, which the hash match itself certifies).
    */
  val qDedupSubstring: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Dedup.duplicatedSpanExcision(t(s, dir, "documents"), w = 8),
    oracle = Some(
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents
        |), win AS (
        |  SELECT doc_id, ts, unnest(range(greatest(n - 8 + 1, 0))) AS p FROM base
        |), ws AS (
        |  SELECT doc_id, p, array_to_string(ts[p + 1 : p + 8], ' ') AS wstr FROM win
        |), dup AS (
        |  SELECT wstr FROM ws GROUP BY wstr HAVING count(*) >= 2
        |), st AS (
        |  SELECT w.doc_id, w.p, unnest(range(8)) AS o
        |  FROM ws w JOIN dup d ON w.wstr = d.wstr
        |), cov AS (
        |  SELECT DISTINCT doc_id, p + o AS pos FROM st
        |), covagg AS (
        |  SELECT doc_id, count(*) AS n_removed, list(pos) AS cl FROM cov GROUP BY doc_id
        |)
        |SELECT b.doc_id,
        |  coalesce(array_to_string(
        |    list_filter(b.ts, (t, i) -> NOT list_contains(coalesce(c.cl, []), i - 1)),
        |    ' '), '') AS clean_text,
        |  CAST(b.n AS BIGINT) AS n_tokens,
        |  CAST(coalesce(c.n_removed, 0) AS BIGINT) AS n_removed
        |FROM base b LEFT JOIN covagg c USING (doc_id)""".stripMargin))

  /** #10g Schema-drift union: two snapshots whose schemas diverged
    * (one gained a column) merged with unionByName + missing-column
    * null-fill — the "old files lack the new field" ETL reality.
    * Oracle is DuckDB's UNION ALL BY NAME, the same semantic.
    */
  val qSchemaUnion: QueryDef = QueryDef(
    run = (s, dir) => {
      val ord = t(s, dir, "orders")
      val old = ord.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val grown = ord.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
      old.unionByName(grown, allowMissingColumns = true)
    },
    oracle = Some(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL BY NAME
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin))

  /** #22j Streaming incremental-aggregate maintenance: micro-batches
    * folded into the versioned rollup by foreachBatch →
    * IncrementalAgg.refreshTable (4 hash-split files, one batch
    * each). count + decimal sum are associative AND commutative, so
    * the final state is batch-boundary- and order-independent ==
    * the batch groupBy bit-for-bit.
    */
  val qStreamIncAgg: QueryDef = QueryDef(
    run = (s, dir) => {
      val statePath = scratch("stream-inc-agg-state")
      // the source checkpoint is a SIBLING of the state dir (see
      // streamIncAgg) — scratch it too, or a previous run's batch
      // bookkeeping survives the state wipe and the restarted query
      // either references a dead staged-source path or skips every
      // batch as already-applied against empty state
      scratch("stream-inc-agg-state_ckpt")
      val keys = Seq("user_id", "event_type")
      val split = graft.streaming.EventStream.splitDir(s, s"$dir/events.parquet", 4)
      graft.streaming.EventStream.streamIncAgg(s, split, statePath, keys, "value",
        queryName = "graft_stream_inc_agg_" +
          java.util.UUID.randomUUID().toString.replace("-", ""))
      // crash-redelivery simulation: re-fold an already-applied batch
      // id (the stream applied ids 0..3); the high-water mark inside
      // the state commit makes it a no-op or the oracle hash fails
      graft.operators.IncrementalAgg.refreshTable(
        s, statePath, t(s, dir, "events"), keys, "value", batchId = Some(0L))
      graft.operators.IncrementalAgg.read(s, statePath, keys)
        .select(col("user_id"), col("event_type"), col("n"),
          col("sum_dec").cast("double").as("sum_value"))
    },
    oracle = Some(
      """SELECT user_id, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id, event_type""".stripMargin))

  /** #22q Streaming distinct-count sketch maintenance: micro-batches
    * fold per-type KMV sketches into the versioned O(k) state
    * (foreachBatch → IncrementalAgg.refreshKmv; 4 hash-split files,
    * one batch each, plus an inline redelivery that must no-op). The
    * sketch is a pure function of the input SET and the fold is
    * associative/commutative, so the streamed state answers EXACTLY
    * what the one-shot whole-corpus sketch answers — re-derived from
    * first principles by the oracle.
    */
  val qStreamKmv: QueryDef = QueryDef(
    run = (s, dir) => {
      val statePath = scratch("stream-kmv-state")
      scratch("stream-kmv-state_ckpt")
      val split = graft.streaming.EventStream.splitDir(s, s"$dir/events.parquet", 4)
      graft.streaming.EventStream.streamKmv(s, split, statePath, Seq("event_type"), "user_id",
        queryName = "graft_stream_kmv_" +
          java.util.UUID.randomUUID().toString.replace("-", ""))
      // crash-redelivery simulation: an already-applied batch id
      graft.operators.IncrementalAgg.refreshKmv(
        s, statePath, t(s, dir, "events"), Seq("event_type"), "user_id", batchId = Some(0L))
      graft.operators.IncrementalAgg.readKmvEstimate(s, statePath, Seq("event_type"))
    },
    oracle = Some(OracleSql.kmvDistinctSql(64, withCounts = false, estimateAs = "approx_distinct")))

  /** #22r Streaming frequent-items maintenance: micro-batches fold
    * Misra-Gries summaries into the persisted O(capacity) state
    * (foreachBatch → IncrementalAgg.refreshFreq; 4 hash-split files,
    * one batch each, plus an inline redelivery that must no-op),
    * then the candidates are VERIFIED with one exact filtered count
    * — exact heavy hitters from a streamed sketch, because the MG
    * superset guarantee (capacity 256 > 1/minShare = 200) holds
    * across merged summaries. The oracle re-derives the exact answer
    * with no sketch at all: if the stream state lost a heavy user or
    * the redelivery double-counted, the hash breaks.
    */
  val qStreamHeavy: QueryDef = QueryDef(
    run = (s, dir) => {
      val statePath = scratch("stream-freq-state")
      scratch("stream-freq-state_ckpt")
      val split = graft.streaming.EventStream.splitDir(s, s"$dir/events.parquet", 4)
      graft.streaming.EventStream.streamFreq(s, split, statePath, "user_id", capacity = 256,
        queryName = "graft_stream_freq_" +
          java.util.UUID.randomUUID().toString.replace("-", ""))
      // crash-redelivery simulation: an already-applied batch id
      graft.operators.IncrementalAgg.refreshFreq(
        s, statePath, t(s, dir, "events"), "user_id", capacity = 256, batchId = Some(0L))
      val cands = graft.operators.IncrementalAgg.readFreqCandidates(s, statePath)
        .select(col("value").as("user_key"))
      graft.operators.HeavyHitters.verified(
        t(s, dir, "events").select(col("user_id").cast("string").as("user_key")),
        "user_key", cands, minShare = 0.005)
    },
    oracle = Some(
      """WITH t AS (
        |  SELECT CAST(user_id AS VARCHAR) AS user_key FROM events
        |), tot AS (
        |  SELECT count(*) AS n_total FROM t
        |)
        |SELECT user_key, count(*) AS n, n_total
        |FROM t CROSS JOIN tot
        |GROUP BY user_key, n_total
        |HAVING count(*) >= n_total * 0.005""".stripMargin))

  /** #90 A/B experiment readout: engine-reproducible 50/50 variant
    * assignment (Knuth multiplicative hash on user_id — any engine
    * recomputes identical groups, the auditability property), UNIT-
    * level conversion (a user converts once however many purchase
    * events they fire — event-level rows would fake narrow
    * confidence), and the exact two-proportion z² in one
    * DECIMAL(38,0) integral division (see
    * [[graft.operators.Experiment.twoProportionZ2]]).
    */
  val qAbTest: QueryDef = QueryDef(
    run = (s, dir) => {
      val units = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
        .withColumn("variant", graft.operators.Experiment.assignVariant(col("user_id")))
      graft.operators.Experiment.twoProportionZ2(units, col("variant"), col("converted"))
    },
    oracle = Some(
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c,
        |    CASE WHEN ((user_id % 2147483648) * 2654435761) % 2147483648 < 1073741824
        |         THEN 'A' ELSE 'B' END AS v
        |  FROM events GROUP BY user_id
        |), a AS (
        |  SELECT count(*) AS n_a, sum(c) AS x_a FROM u WHERE v = 'A'
        |), b AS (
        |  SELECT count(*) AS n_b, sum(c) AS x_b FROM u WHERE v = 'B'
        |)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS x_a,
        |  CAST(CAST(x_a AS HUGEINT) * 10000 // n_a AS BIGINT) AS rate_a_bp,
        |  CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS x_b,
        |  CAST(CAST(x_b AS HUGEINT) * 10000 // n_b AS BIGINT) AS rate_b_bp,
        |  CAST(CAST(x_b AS HUGEINT) * 10000 // n_b
        |     - CAST(x_a AS HUGEINT) * 10000 // n_a AS BIGINT) AS lift_bp,
        |  CAST(CAST(n_a + n_b AS HUGEINT)
        |       * (CAST(x_a AS HUGEINT) * n_b - CAST(x_b AS HUGEINT) * n_a)
        |       * (CAST(x_a AS HUGEINT) * n_b - CAST(x_b AS HUGEINT) * n_a) * 10000
        |     // (CAST(n_a AS HUGEINT) * n_b * (x_a + x_b)
        |         * ((n_a + n_b) - (x_a + x_b))) AS BIGINT) AS z2_x10000
        |FROM a CROSS JOIN b""".stripMargin))

}
