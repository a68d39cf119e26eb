package graft

/** Generated DuckDB SQL that re-derives the approximate ANN /
  * clustering family FROM FIRST PRINCIPLES, so the driver's DuckDB
  * gate can hash-match queries that were previously `no_oracle`
  * (rows-only). Everything these queries compute is deterministic:
  *
  *  - the training sample is ordered by Spark's `xxhash64(vec_id, 42)`
  *    — XXH64 is pure integer arithmetic, re-implemented here as
  *    chained CTE steps over HUGEINT mod 2⁶⁴ (multiply-mod via 32-bit
  *    limb split, rotate/xor/shift as division and `xor()`), verified
  *    value-for-value against Spark's `XxHash64Function`;
  *  - Lloyd's k-means ([[graft.operators.Similarity.lloyd]]) is a
  *    fixed-iteration fold: init = first k sample points, assignment
  *    by strictly-sequential squared-distance accumulation (ties to
  *    the lowest center), per-center means summed IN SAMPLE ORDER —
  *    mirrored with `list_reduce(list_prepend(0.0, list(x ORDER BY
  *    si)), +)` so every double op happens in the same order;
  *  - cell assignment ([[graft.functions.CentroidKernels.nearestCells]])
  *    scores ‖c‖² − 2·(v·float(c)) with double norms and FLOAT-cast
  *    centroid components — mirrored with an explicit
  *    `CAST(CAST(x AS FLOAT) AS DOUBLE)` (IEEE demotion is correctly
  *    rounded in both engines) and `list_dot_product` (proven
  *    bit-identical to the codegen'd sequential loop in prior rounds);
  *  - hyperplane-LSH plane components
  *    ([[graft.functions.LshKernels.planeComponent]]) are
  *    `xxhash64_int(d, xxhash64_int(p, 42)) / Long.MaxValue` — the
  *    int-input XXH64 variant, also re-derived here;
  *  - PQ codebooks/codes/ADC mirror [[graft.functions.CentroidKernels.pqEncode]]
  *    (double norms, float-cast codebooks, strict-< argmin ties to the
  *    lowest code) and the per-subspace dot sum in subspace order.
  *
  * The generated SQL leans on MATERIALIZED CTEs: DuckDB inlines plain
  * CTEs per reference, and a 10-iteration Lloyd chain re-expanded at
  * every step is exponential — materialization makes it the same
  * linear computation Spark runs.
  */
private[graft] object OracleSql {

  private val M = BigInt(1) << 64
  private val B32 = BigInt(1) << 32
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)

  /** Ordered CTE accumulator; `add` returns the cte name for chaining. */
  private final class Ctes {
    private val parts = Vector.newBuilder[String]
    def add(name: String, body: String, mat: Boolean = false): String = {
      parts += s"$name AS ${if (mat) "MATERIALIZED " else ""}($body)"
      name
    }
    def sql(tail: String): String = "WITH " + parts.result().mkString(",\n") + "\n" + tail
  }

  /** (x * c) mod 2⁶⁴ for a non-negative HUGEINT expr and constant c:
    * 32-bit limb split keeps every intermediate under 2⁶⁵ (HUGEINT-safe).
    */
  private def mulmod(x: String, c: BigInt): String = {
    val hi = c >> 32
    val lo = c & (B32 - 1)
    s"((((($x) % $B32) * $hi + (($x) // $B32) * $lo) % $B32) * $B32 + (($x) % $B32) * $lo) % $M"
  }

  /** 64-bit rotate-left of a non-negative HUGEINT expr. */
  private def rotl(x: String, r: Int): String = {
    val low = BigInt(1) << (64 - r)
    s"((($x) % $low) * ${BigInt(1) << r} + (($x) // $low))"
  }

  /** Two's-complement reinterpretation of a u64 HUGEINT as BIGINT. */
  private def signed(x: String): String =
    s"CAST($x - CASE WHEN $x >= ${BigInt(1) << 63} THEN CAST($M AS HUGEINT) ELSE 0 END AS BIGINT)"

  /** Strictly-sequential left fold sum of an ORDERED double list —
    * the SQL mirror of `var s = 0.0; while (...) s += t(i)`.
    */
  private def sumfold(orderedList: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $orderedList), (acc, t) -> acc + t)"

  /** XXH64 finalization mix appended as 5 CTE steps. */
  private def fmixSteps(cs: Ctes, name: String, src: String, keep: String, h: String): (String, String) = {
    var s = cs.add(s"${name}_f1", s"SELECT ${keep}xor($h, $h // ${BigInt(1) << 33}) AS ${h}a FROM $src")
    s = cs.add(s"${name}_f2", s"SELECT $keep${mulmod(h + "a", P2)} AS ${h}b FROM $s")
    s = cs.add(s"${name}_f3", s"SELECT ${keep}xor(${h}b, ${h}b // ${BigInt(1) << 29}) AS ${h}c FROM $s")
    s = cs.add(s"${name}_f4", s"SELECT $keep${mulmod(h + "c", P3)} AS ${h}d FROM $s")
    s = cs.add(s"${name}_f5", s"SELECT ${keep}xor(${h}d, ${h}d // ${BigInt(1) << 32}) AS ${h}e FROM $s")
    (s, s"${h}e")
  }

  /** Spark `XXH64.hashLong(inp, seed)` as chained CTEs; `inp`/`seed`
    * are u64 HUGEINT exprs over `src`'s columns; `keep` columns are
    * carried through. Returns (last cte, output column).
    */
  private def xxhLong(cs: Ctes, name: String, src: String, keep: Seq[String],
      inp: String, seed: String): (String, String) = {
    val k = if (keep.isEmpty) "" else keep.mkString(", ") + ", "
    val (x, h, t) = (s"x_$name", s"h_$name", s"t_$name")
    var s = cs.add(s"${name}_0",
      s"SELECT $k($inp) % $M AS $x, (($seed) + $P5 + 8) % $M AS $h FROM $src")
    s = cs.add(s"${name}_1", s"SELECT $k$h, ${mulmod(x, P2)} AS $t FROM $s")
    s = cs.add(s"${name}_2", s"SELECT $k$h, ${rotl(t, 31)} AS ${t}2 FROM $s")
    s = cs.add(s"${name}_3", s"SELECT $k$h, ${mulmod(t + "2", P1)} AS ${t}3 FROM $s")
    s = cs.add(s"${name}_4", s"SELECT ${k}xor($h, ${t}3) AS ${h}4 FROM $s")
    s = cs.add(s"${name}_5", s"SELECT $k${rotl(h + "4", 27)} AS ${h}5 FROM $s")
    s = cs.add(s"${name}_6", s"SELECT $k(${mulmod(h + "5", P1)} + $P4) % $M AS $h FROM $s")
    fmixSteps(cs, name, s, k, h)
  }

  /** Spark `XXH64.hashInt(inp, seed)` (4-byte path) as chained CTEs;
    * `inp` must be a non-negative int expr (plane/dim indices are).
    */
  private def xxhInt(cs: Ctes, name: String, src: String, keep: Seq[String],
      inp: String, seed: String): (String, String) = {
    val k = if (keep.isEmpty) "" else keep.mkString(", ") + ", "
    val (x, h) = (s"x_$name", s"h_$name")
    var s = cs.add(s"${name}_0",
      s"SELECT ${k}CAST(($inp) AS HUGEINT) % $B32 AS $x, (($seed) + $P5 + 4) % $M AS $h FROM $src")
    s = cs.add(s"${name}_1", s"SELECT ${k}xor($h, ${mulmod(x, P1)}) AS ${h}1 FROM $s")
    s = cs.add(s"${name}_2", s"SELECT $k${rotl(h + "1", 23)} AS ${h}2 FROM $s")
    s = cs.add(s"${name}_3", s"SELECT $k(${mulmod(h + "2", P2)} + $P3) % $M AS $h FROM $s")
    fmixSteps(cs, name, s, k, h)
  }

  /** embeddings as (vec_id, v DOUBLE[]) — the float→double cast is
    * exact, matching the kernels' `getFloat(i).toDouble` reads.
    */
  private def corpusCte(cs: Ctes): String =
    cs.add("corp",
      "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings",
      mat = true)

  /** The deterministic training sample ([[graft.operators.Similarity.sampleVecs]]):
    * top-`n` by (xxhash64(vec_id, 42), vec_id) — Spark's two-argument
    * xxhash64 folds hashLong(vec_id, 42) then hashLong(42, ·).
    * Emits (si ∈ [0, n), grp = 0, v) in sample order.
    */
  private def sampleCtes(cs: Ctes, corp: String, where: Option[String], n: Int = 4096): String = {
    val src = where match {
      case Some(w) => cs.add("trn", s"SELECT vec_id, v FROM $corp WHERE $w")
      case None    => corp
    }
    val (s1, o1) = xxhLong(cs, "sh1", src, Seq("vec_id", "v"),
      s"CAST(vec_id AS HUGEINT) + CASE WHEN vec_id < 0 THEN CAST($M AS HUGEINT) ELSE 0 END", "42")
    val (s2, o2) = xxhLong(cs, "sh2", s1, Seq("vec_id", "v"), "42", o1)
    cs.add("smp",
      s"SELECT row_number() OVER (ORDER BY ${signed(o2)}, vec_id) - 1 AS si, 0 AS grp, v " +
        s"FROM $s2 ORDER BY ${signed(o2)}, vec_id LIMIT $n",
      mat = true)
  }

  /** Lloyd's iterations over `points` (grp, si, v DOUBLE[dim]) —
    * the SQL unroll of [[graft.operators.Similarity.lloyd]]: init =
    * first k points per grp, `iters` rounds of (sequential-fold
    * distances, strict-< argmin ties to the lowest center, means
    * summed in sample order, empty clusters keep their center).
    * Returns the final centroid cte (grp, c, v).
    */
  private def lloydCtes(cs: Ctes, prefix: String, points: String, k: Int, iters: Int, dim: Int): String = {
    var prev = cs.add(s"${prefix}_c0", s"SELECT grp, si AS c, v FROM $points WHERE si < $k")
    for (i <- 1 to iters) {
      val dist = sumfold(s"list_transform(range(1, $dim + 1), j -> (p.v[j] - c.v[j]) * (p.v[j] - c.v[j]))")
      val d = cs.add(s"${prefix}_d$i",
        s"SELECT p.grp, p.si, p.v AS v, c.c, $dist AS d FROM $points p JOIN $prev c ON c.grp = p.grp")
      val a = cs.add(s"${prefix}_a$i",
        s"SELECT grp, si, v, c FROM (SELECT grp, si, v, c, " +
          s"row_number() OVER (PARTITION BY grp, si ORDER BY d, c) AS rk FROM $d) WHERE rk = 1",
        mat = true)
      val m = cs.add(s"${prefix}_m$i",
        s"SELECT grp, c, r.j AS j, ${sumfold("list(v[j] ORDER BY si)")} AS s, count(*) AS n " +
          s"FROM $a, range(1, $dim + 1) r(j) GROUP BY grp, c, r.j")
      val nm = cs.add(s"${prefix}_n$i",
        s"SELECT grp, c, list(s / n ORDER BY j) AS v FROM $m GROUP BY grp, c")
      prev = cs.add(s"${prefix}_c$i",
        s"SELECT o.grp, o.c, coalesce(n.v, o.v) AS v FROM $prev o " +
          s"LEFT JOIN $nm n ON n.grp = o.grp AND n.c = o.c",
        mat = true)
    }
    prev
  }

  /** NearestCells scoring of every corpus row against `cent` (grp
    * ignored — single-grp centroids): float-cast components, double
    * norms, rank by (score, center). Returns the ranked cte
    * (vec_id, c, rk).
    */
  private def rankedCellsCtes(cs: Ctes, cent: String, corp: String): String = {
    val f = cs.add("centf",
      s"SELECT c, list_transform(v, x -> CAST(CAST(x AS FLOAT) AS DOUBLE)) AS vf, " +
        s"${sumfold("list_transform(v, x -> x * x)")} AS nrm FROM $cent",
      mat = true)
    val sc = cs.add("cellscore",
      s"SELECT $corp.vec_id, $f.c, $f.nrm - 2.0 * list_dot_product($corp.v, $f.vf) AS d FROM $corp, $f")
    cs.add("rankedcells",
      s"SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rk FROM $sc",
      mat = true)
  }

  private val cosCv = "list_dot_product(cv, qv) / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv)))"

  /** Exact-cosine top-k tail over a candidate cte (qid, cid):
    * the mirror of [[graft.operators.Similarity.topKPerQuery]]
    * (ties sim DESC then cid ASC, score rounded at output).
    */
  private def topkTail(cs: Ctes, cand: String, corp: String, k: Int): String = {
    val sc = cs.add("rrscore",
      s"SELECT p.qid, p.cid, $cosCv AS sim FROM " +
        s"(SELECT qid, cid, cc.v AS cv, qc.v AS qv FROM $cand " +
        s"JOIN $corp cc ON cc.vec_id = cid JOIN $corp qc ON qc.vec_id = qid) p")
    val rk = cs.add("rrrank",
      s"SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk FROM $sc")
    cs.sql(
      s"""SELECT qid AS query_id, CAST(rk AS INT) AS "rank", cid AS neighbor_id, round(sim, 9) AS sim
         |FROM $rk WHERE rk <= $k""".stripMargin)
  }

  // ---------------------------------------------------------------
  // IVF family
  // ---------------------------------------------------------------

  /** sim_ivf_topk / sim_ivf_index_topk / sim_ivf_inc_topk: quantizer
    * trained on the (optionally filtered) corpus sample, every corpus
    * row assigned to its nearest cell, queries (vec_id < 10) probe
    * their `nprobe` nearest cells, exact cosine + top-k inside. The
    * persisted-index variants hit the same SQL because centroids
    * round-trip parquet as exact doubles and routing is a pure
    * function of them (incremental-equals-rebuild is spec-verified).
    */
  def ivfTopkSql(trainWhere: Option[String] = None, k: Int = 5,
      nlist: Int = 16, nprobe: Int = 2, iters: Int = 10): String = {
    val cs = new Ctes
    val corp = corpusCte(cs)
    val smp = sampleCtes(cs, corp, trainWhere)
    val cent = lloydCtes(cs, "ll", smp, nlist, iters, 64)
    val ranked = rankedCellsCtes(cs, cent, corp)
    val cells = cs.add("cells", s"SELECT vec_id, c AS cell FROM $ranked WHERE rk = 1")
    val probes = cs.add("probes",
      s"SELECT vec_id AS qid, c AS cell FROM $ranked WHERE rk <= $nprobe AND vec_id < 10")
    val cand = cs.add("cand",
      s"SELECT p.qid, c.vec_id AS cid FROM $probes p " +
        s"JOIN $cells c ON c.cell = p.cell AND c.vec_id <> p.qid")
    topkTail(cs, cand, corp, k)
  }

  // ---------------------------------------------------------------
  // Hyperplane-LSH family
  // ---------------------------------------------------------------

  /** (p, d) → plane component h_p[d] = xxhash64_int(d, xxhash64_int(p, 42))
    * / Long.MaxValue, plus per-(vector, table) sign-pattern buckets —
    * the mirror of [[graft.functions.LshKernels]]. Returns the bucket
    * cte (vec_id, tbl, bucket).
    */
  private def lshBucketCtes(cs: Ctes, corp: String, numTables: Int, planesPerTable: Int): String = {
    val np = numTables * planesPerTable
    val pl0 = cs.add("pl0", s"SELECT p.p, d.d FROM range(0, $np) p(p), range(0, 64) d(d)")
    val (s1, o1) = xxhInt(cs, "ph1", pl0, Seq("p", "d"), "p", "42")
    val (s2, o2) = xxhInt(cs, "ph2", s1, Seq("p", "d"), "d", o1)
    val planes = cs.add("planes",
      s"SELECT p, d, CAST(${signed(o2)} AS DOUBLE) / CAST(9223372036854775807 AS DOUBLE) AS comp FROM $s2",
      mat = true)
    val vd = cs.add("vd",
      s"SELECT vec_id, r.d AS d, v[r.d + 1] AS x FROM $corp, range(0, 64) r(d)", mat = true)
    val dots = cs.add("lshdots",
      s"SELECT vec_id, p, ${sumfold("list(x * comp ORDER BY d)")} AS dot " +
        s"FROM $vd JOIN $planes USING (d) GROUP BY vec_id, p")
    cs.add("bks",
      s"SELECT vec_id, p // $planesPerTable AS tbl, " +
        s"sum(CASE WHEN dot >= 0 THEN (1 << CAST(p % $planesPerTable AS INT)) ELSE 0 END) AS bucket " +
        s"FROM $dots GROUP BY vec_id, p // $planesPerTable",
      mat = true)
  }

  /** sim_lsh_topk: one table of `numPlanes` sign bits, radius-1
    * multi-probe on the QUERY side, exact cosine + top-k in-bucket.
    */
  def lshTopkSql(k: Int = 5, numPlanes: Int = 4): String = {
    val cs = new Ctes
    val corp = corpusCte(cs)
    val bks = lshBucketCtes(cs, corp, 1, numPlanes)
    val probeList = ("bucket" +: (0 until numPlanes).map(p => s"xor(bucket, ${1 << p})")).mkString(", ")
    val probes = cs.add("probes",
      s"SELECT vec_id AS qid, unnest([$probeList]) AS bucket FROM $bks WHERE vec_id < 10")
    val cand = cs.add("cand",
      s"SELECT p.qid, c.vec_id AS cid FROM $probes p " +
        s"JOIN $bks c ON c.bucket = p.bucket AND c.vec_id <> p.qid")
    topkTail(cs, cand, corp, k)
  }

  /** dedup_embedding_lsh: `numTables` independent b-plane tables,
    * candidate pairs collide in ≥ 1 table, exact cosine ≥ threshold,
    * DISTINCT (id_a, id_b, sim) output.
    */
  def embLshPairsSql(threshold: Double, numTables: Int = 8, planesPerTable: Int = 2): String = {
    val cs = new Ctes
    val corp = corpusCte(cs)
    val bks = lshBucketCtes(cs, corp, numTables, planesPerTable)
    val cand = cs.add("cand",
      s"SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b FROM $bks a " +
        s"JOIN $bks b ON b.tbl = a.tbl AND b.bucket = a.bucket AND a.vec_id < b.vec_id")
    val sc = cs.add("pairscore",
      s"SELECT id_a, id_b, " +
        "list_dot_product(av, bv) / (sqrt(list_dot_product(av, av)) * sqrt(list_dot_product(bv, bv))) AS sim " +
        s"FROM (SELECT id_a, id_b, a.v AS av, b.v AS bv FROM $cand " +
        s"JOIN $corp a ON a.vec_id = id_a JOIN $corp b ON b.vec_id = id_b)")
    cs.sql(s"SELECT DISTINCT id_a, id_b, round(sim, 9) AS sim FROM $sc WHERE sim >= $threshold")
  }

  /** dedup_semantic: k-means cells over the full-corpus sample, a row
    * is dropped iff a smaller-id same-cell row has cosine ≥ threshold;
    * survivors return (vec_id, cell).
    */
  def semanticDedupSql(threshold: Double, nclusters: Int = 16, iters: Int = 10): String = {
    val cs = new Ctes
    val corp = corpusCte(cs)
    val smp = sampleCtes(cs, corp, None)
    val cent = lloydCtes(cs, "ll", smp, nclusters, iters, 64)
    val ranked = rankedCellsCtes(cs, cent, corp)
    val cells = cs.add("cells", s"SELECT vec_id, c AS cell FROM $ranked WHERE rk = 1", mat = true)
    val pairs = cs.add("sempairs",
      s"SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM $cells a " +
        s"JOIN $cells b ON b.cell = a.cell AND a.vec_id < b.vec_id")
    val dropped = cs.add("dropped",
      s"SELECT DISTINCT id_b FROM (SELECT id_b, a.v AS av, b.v AS bv FROM $pairs " +
        s"JOIN $corp a ON a.vec_id = id_a JOIN $corp b ON b.vec_id = id_b) " +
        "WHERE list_dot_product(av, bv) / (sqrt(list_dot_product(av, av)) * sqrt(list_dot_product(bv, bv))) " +
        s">= $threshold")
    cs.sql(s"SELECT c.vec_id, c.cell FROM $cells c WHERE c.vec_id NOT IN (SELECT id_b FROM $dropped)")
  }

  // ---------------------------------------------------------------
  // PQ family
  // ---------------------------------------------------------------

  /** Shared PQ machinery: subspace codebooks (m Lloyd runs over
    * slices of the SAME sample, unified through the grp column),
    * corpus codes (pqEncode semantics), and ADC scores for the
    * eligible (qid, cid) pair set. Emits the ADC cte (qid, cid, sim).
    */
  private def adcCtes(cs: Ctes, corp: String, smp: String, pairs: String,
      m: Int, ksub: Int, iters: Int): String = {
    val dsub = 64 / m
    val sub = cs.add("subpts",
      s"SELECT g.grp AS grp, si, list_transform(range(1, $dsub + 1), i -> v[g.grp * $dsub + i]) AS v " +
        s"FROM $smp, range(0, $m) g(grp)",
      mat = true)
    val cb = lloydCtes(cs, "pq", sub, ksub, iters, dsub)
    val cbf = cs.add("cbf",
      s"SELECT grp, c, list_transform(v, x -> CAST(CAST(x AS FLOAT) AS DOUBLE)) AS vf, " +
        s"${sumfold("list_transform(v, x -> x * x)")} AS nrm FROM $cb",
      mat = true)
    val sl = cs.add("cslice",
      s"SELECT vec_id, g.grp AS grp, list_transform(range(1, $dsub + 1), i -> v[g.grp * $dsub + i]) AS sv " +
        s"FROM $corp, range(0, $m) g(grp)",
      mat = true)
    val es = cs.add("escore",
      s"SELECT s.vec_id, s.grp, f.c, f.nrm - 2.0 * list_dot_product(s.sv, f.vf) AS d " +
        s"FROM $sl s JOIN $cbf f ON f.grp = s.grp")
    val codes = cs.add("codes",
      s"SELECT vec_id, grp, c AS code FROM (SELECT vec_id, grp, c, " +
        s"row_number() OVER (PARTITION BY vec_id, grp ORDER BY d, c) AS rk FROM $es) WHERE rk = 1",
      mat = true)
    val terms = cs.add("adcterms",
      s"SELECT p.qid, p.cid, k.grp, list_dot_product(q.sv, f.vf) AS t " +
        s"FROM $pairs p JOIN $codes k ON k.vec_id = p.cid " +
        s"JOIN $cbf f ON f.grp = k.grp AND f.c = k.code " +
        s"JOIN $sl q ON q.vec_id = p.qid AND q.grp = k.grp")
    // sum in subspace order with NO seed — the mirror of `.reduce(_ + _)`
    cs.add("adc",
      s"SELECT qid, cid, list_reduce(list(t ORDER BY grp), (acc, t) -> acc + t) AS sim " +
        s"FROM $terms GROUP BY qid, cid",
      mat = true)
  }

  private def adcRankCte(cs: Ctes, adc: String): String =
    cs.add("adcrank",
      s"SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk FROM $adc")

  /** sim_pq_topk / sim_pq_rerank: full compressed-domain ADC scan
    * (every corpus row vs every query), top-k by ADC — then, for the
    * rerank variant, exact cosine over the candMult·k survivors.
    */
  def pqTopkSql(k: Int = 5, rerank: Boolean = false, candMult: Int = 4,
      m: Int = 8, ksub: Int = 16, iters: Int = 10): String = {
    val cs = new Ctes
    val corp = corpusCte(cs)
    val smp = sampleCtes(cs, corp, None)
    val pairs = cs.add("pqpairs",
      s"SELECT q.vec_id AS qid, c.vec_id AS cid FROM $corp c, $corp q " +
        "WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id")
    val adc = adcCtes(cs, corp, smp, pairs, m, ksub, iters)
    val rk = adcRankCte(cs, adc)
    if (!rerank)
      cs.sql(
        s"""SELECT qid AS query_id, CAST(rk AS INT) AS "rank", cid AS neighbor_id, round(sim, 9) AS sim
           |FROM $rk WHERE rk <= $k""".stripMargin)
    else {
      val cand = cs.add("rcand", s"SELECT qid, cid FROM $rk WHERE rk <= ${k * candMult}")
      topkTail(cs, cand, corp, k)
    }
  }

  // ---------------------------------------------------------------
  // KMV distinct sketch
  // ---------------------------------------------------------------

  /** q_approx_distinct: the KMV/theta estimate re-derived from first
    * principles — xxhash64(user_id) via the chain above, the k-th
    * smallest distinct hash per event_type by a rank window (UNSIGNED
    * order = plain HUGEINT order on the u64 chain output), and the
    * ⌊(k−1)·2⁶⁴/θ⌋ estimate in exact HUGEINT arithmetic — the mirror
    * of [[graft.functions.KmvBuffer.estimate]].
    */
  def kmvDistinctSql(k: Int, withCounts: Boolean = true,
      estimateAs: String = "approx_users"): String = {
    val cs = new Ctes
    val base = cs.add("kbase", "SELECT DISTINCT event_type, user_id FROM events")
    val (chain, out) = xxhLong(cs, "kh", base, Seq("event_type"),
      s"CAST(user_id AS HUGEINT) + CASE WHEN user_id < 0 THEN CAST($M AS HUGEINT) ELSE 0 END", "42")
    val d = cs.add("kd", s"SELECT DISTINCT event_type, $out AS hu FROM $chain")
    val r = cs.add("kr",
      s"SELECT event_type, hu, row_number() OVER (PARTITION BY event_type ORDER BY hu) AS rk FROM $d")
    val sk = cs.add("ks",
      s"SELECT event_type, max(CASE WHEN rk = $k THEN hu END) AS theta, count(*) AS nk " +
        s"FROM $r WHERE rk <= $k GROUP BY event_type")
    val est = s"CAST(CASE WHEN s.nk < $k THEN s.nk " +
      s"ELSE ${BigInt(k - 1) << 64} // s.theta END AS BIGINT) AS $estimateAs"
    if (withCounts) {
      val n = cs.add("kn", "SELECT event_type, count(*) AS n_events FROM events GROUP BY event_type")
      cs.sql(s"SELECT n.event_type, $est, n.n_events FROM $n n JOIN $sk s USING (event_type)")
    } else
      cs.sql(s"SELECT s.event_type, $est FROM $sk s")
  }

  /** q_kmv_overlap: segment / union KMV estimates re-derived from
    * first principles (same XXH64 chain and ⌊(k−1)·2⁶⁴/θ⌋ estimate as
    * [[kmvDistinctSql]], over three tagged distinct sets), then the
    * inclusion-exclusion intersection and floor-quantized Jaccard bp.
    * The union estimate is computed from the union SET directly —
    * valid as the oracle precisely because KMV union is exactly
    * mergeable (bottom-k of two bottom-k's = the union set's
    * bottom-k), the property the Spark side exploits in reverse.
    */
  def kmvOverlapSql(k: Int, segA: String, segB: String): String = {
    val cs = new Ctes
    val base = cs.add("obase",
      s"SELECT 'a' AS tag, user_id FROM (SELECT DISTINCT user_id FROM events WHERE event_type = '$segA') " +
        s"UNION ALL SELECT 'b', user_id FROM (SELECT DISTINCT user_id FROM events WHERE event_type = '$segB') " +
        s"UNION ALL SELECT 'u', user_id FROM (SELECT DISTINCT user_id FROM events WHERE event_type IN ('$segA', '$segB'))")
    val (chain, out) = xxhLong(cs, "oh", base, Seq("tag"),
      s"CAST(user_id AS HUGEINT) + CASE WHEN user_id < 0 THEN CAST($M AS HUGEINT) ELSE 0 END", "42")
    val d = cs.add("od", s"SELECT DISTINCT tag, $out AS hu FROM $chain")
    val r = cs.add("orank",
      s"SELECT tag, hu, row_number() OVER (PARTITION BY tag ORDER BY hu) AS rk FROM $d")
    val sk = cs.add("osk",
      s"SELECT tag, max(CASE WHEN rk = $k THEN hu END) AS theta, count(*) AS nk " +
        s"FROM $r WHERE rk <= $k GROUP BY tag")
    val est = cs.add("oest",
      s"SELECT tag, CAST(CASE WHEN nk < $k THEN nk ELSE ${BigInt(k - 1) << 64} // theta END AS BIGINT) AS est FROM $sk")
    // coalesce: a segment with no members is the EMPTY set — estimate
    // 0, one result row always (matches Sketches.kmvOverlap's
    // empty-sketch semantics; a missing tag must not become NULL)
    val piv = cs.add("opiv",
      s"SELECT coalesce(max(CASE WHEN tag = 'a' THEN est END), 0) AS approx_a, " +
        s"coalesce(max(CASE WHEN tag = 'b' THEN est END), 0) AS approx_b, " +
        s"coalesce(max(CASE WHEN tag = 'u' THEN est END), 0) AS approx_union FROM $est")
    cs.sql(
      s"""SELECT approx_a, approx_b, approx_union,
         |  greatest(0, approx_a + approx_b - approx_union) AS approx_intersection,
         |  CASE WHEN approx_union = 0 THEN 0
         |       ELSE greatest(0, approx_a + approx_b - approx_union) * 10000 // approx_union
         |  END AS jaccard_bp
         |FROM $piv""".stripMargin)
  }

  /** sim_ivfpq_topk / sim_ivfpq_rerank: IVF cell routing (full-vector
    * quantizer) composed with PQ ADC scoring over the probed cells
    * only — both quantizers trained on the same sample.
    */
  def ivfPqTopkSql(k: Int = 5, rerank: Boolean = false, candMult: Int = 4,
      nlist: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 16, iters: Int = 10): String = {
    val cs = new Ctes
    val corp = corpusCte(cs)
    val smp = sampleCtes(cs, corp, None)
    val cent = lloydCtes(cs, "ll", smp, nlist, iters, 64)
    val ranked = rankedCellsCtes(cs, cent, corp)
    val cells = cs.add("cells", s"SELECT vec_id, c AS cell FROM $ranked WHERE rk = 1", mat = true)
    val probes = cs.add("probes",
      s"SELECT vec_id AS qid, c AS cell FROM $ranked WHERE rk <= $nprobe AND vec_id < 10")
    val pairs = cs.add("pqpairs",
      s"SELECT p.qid, c.vec_id AS cid FROM $probes p " +
        s"JOIN $cells c ON c.cell = p.cell AND c.vec_id <> p.qid")
    val adc = adcCtes(cs, corp, smp, pairs, m, ksub, iters)
    val rk = adcRankCte(cs, adc)
    if (!rerank)
      cs.sql(
        s"""SELECT qid AS query_id, CAST(rk AS INT) AS "rank", cid AS neighbor_id, round(sim, 9) AS sim
           |FROM $rk WHERE rk <= $k""".stripMargin)
    else {
      val cand = cs.add("rcand", s"SELECT qid, cid FROM $rk WHERE rk <= ${k * candMult}")
      topkTail(cs, cand, corp, k)
    }
  }
}
