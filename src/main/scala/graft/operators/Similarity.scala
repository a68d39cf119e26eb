package graft.operators

import graft.functions.{TopKFunctions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteForceTopK` is the exact baseline: broadcast the (small)
  * query set against the corpus, one codegen'd cosine per
  * (query, corpus) pair, and a bounded top-k heap aggregate — the
  * corpus is scanned once, never shuffled, and only k rows per query
  * survive the map side.
  *
  * `lshTopK` is the 100 TB path: random-hyperplane LSH buckets the
  * corpus by sign pattern; each query probes only its own bucket
  * (plus optional multi-probe neighbors), so per-query work stays
  * ~constant as the corpus grows. Recall < 1 by design; the spec
  * measures it against the brute-force baseline.
  */
object Similarity {

  /** Exact cosine top-k: for each query vector, the k most similar
    * corpus vectors (excluding itself), deterministic tie-break on id.
    *
    * `dims = Some(d)` scores on the FIRST d coordinates only — the
    * Matryoshka-truncation evaluation axis: run full and truncated,
    * feed both to [[recallAtK]], and the harness quantifies what the
    * dimension cut costs in neighbor fidelity.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dims: Option[Int] = None): DataFrame = {
    val vec = (c: Column) => dims.fold(c)(d => slice(c, 1, d))
    val c = corpus.select(col("vec_id").as("cid"), vec(col("embedding")).as("cvec"))
    val q = queries.select(col("vec_id").as("qid"), vec(col("embedding")).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .withColumn("sim", VectorFunctions.cosine(col("cvec"), col("qvec")))
    scored
      .groupBy(col("qid"))
      .agg(TopKFunctions.top_k(col("sim"), col("cid"), k).as("hits"))
      .select(col("qid"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(
        col("qid").as("query_id"),
        (col("pos") + 1).as("rank"),
        col("hit.id").as("neighbor_id"),
        round(col("hit.score"), 9).as("sim"))
  }

  /** ANN quality harness: recall@k of an approximate neighbor table
    * against the exact one — the measurement that turns "we use IVF/
    * PQ/LSH/truncated dims" from a hope into a number. Inputs are any
    * two (query_id, neighbor_id) tables (rank/score columns ignored);
    * output is one row per exact-side query: (query_id, n_hits,
    * recall_bp = ⌊10⁴·|approx ∩ exact|/k⌋). Queries the approximate
    * index missed entirely still report (recall 0) — silently
    * dropping them is how ANN evaluations lie.
    *
    * One equi-join on (query, neighbor) + one combine — both sides
    * are k-bounded per query, so cost is O(queries·k) however large
    * the corpus that produced them. Both sides are deduplicated on
    * (query, neighbor) first: a neighbor table carrying repeats (a
    * union of shards, a re-ranked list with ties kept twice) would
    * otherwise multiply through the join and report recall_bp above
    * 10⁴.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val e = exact.select(col("query_id"), col("neighbor_id")).distinct()
    val a = approx.select(col("query_id"), col("neighbor_id")).distinct()
    val hits = e.join(a, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    e.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("recall_bp", expr(
        s"CAST(CAST(n_hits AS DECIMAL(38,0)) * 10000 DIV $k AS BIGINT)"))
  }

  /** LSH bucket key: sign pattern across `numPlanes` deterministic
    * pseudo-random hyperplanes (component h[d] of plane p =
    * xxhash64(p, d) scaled to [-1, 1); seeded — stable across runs).
    * One codegen'd kernel (`LshBuckets`) with the plane matrix cached
    * per dimension — the earlier per-plane `zip_with`/`aggregate` HOF
    * chain was evaluated interpreted, re-hashing every (row, plane,
    * dim) triple.
    */
  def withLshBucket(df: DataFrame, numPlanes: Int = 8): DataFrame =
    df.withColumn("bucket",
      graft.functions.LshFunctions.lshBuckets(col("embedding"), 1, numPlanes).getItem(0))

  /** Approximate top-k: candidates share the query's LSH bucket.
    *
    * `probeRadius = 1` enables multi-probe: each QUERY also probes the
    * `numPlanes` buckets one sign-flip away (the likeliest homes of
    * near neighbors that landed across a hyperplane). Multi-probe
    * multiplies only the tiny query side — the corpus stays bucketed
    * exactly once, which is what keeps this shape viable at 100 TB
    * (the standard alternative, replicating the corpus into every
    * nearby bucket, multiplies the big side instead).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, numPlanes: Int = 8,
      probeRadius: Int = 0): DataFrame = {
    require(probeRadius == 0 || probeRadius == 1, "probeRadius 0 or 1")
    val c = withLshBucket(corpus, numPlanes)
      .select(col("bucket"), col("vec_id").as("cid"), col("embedding").as("cvec"))
    val qBase = withLshBucket(queries, numPlanes)
    val probes =
      if (probeRadius == 0) array(col("bucket"))
      else array((col("bucket") +: (0 until numPlanes).map(p =>
        col("bucket").bitwiseXOR(lit(1 << p)))): _*)
    val q = qBase
      .select(explode(probes).as("bucket"), col("vec_id").as("qid"), col("embedding").as("qvec"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("sim", VectorFunctions.cosine(col("cvec"), col("qvec")))
    scored
      .groupBy(col("qid"))
      .agg(TopKFunctions.top_k(col("sim"), col("cid"), k).as("hits"))
      .select(col("qid"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(
        col("qid").as("query_id"),
        (col("pos") + 1).as("rank"),
        col("hit.id").as("neighbor_id"),
        round(col("hit.score"), 9).as("sim"))
  }

  /** IVF (inverted-file) approximate top-k — the other classic ANN
    * scale path beside hyperplane LSH: a KMeans coarse quantizer
    * partitions the corpus into `nlist` cells; each query probes its
    * `nprobe` nearest cells (by the same L2 geometry the quantizer
    * assigns with) and brute-forces only those. Candidate work per
    * query ≈ nprobe/nlist of the corpus, independent of corpus growth
    * when nlist scales with it. Seeded — deterministic across runs.
    *
    * The quantizer trains on a bounded, hash-ordered SAMPLE collected
    * to the driver (standard IVF practice — centroid quality needs
    * thousands of points, not the corpus): one top-N pass over the
    * corpus, Lloyd's locally, done. Cell assignment is then a pure
    * codegen'd projection (nlist dot products + argmin per row) — no
    * iterative cluster jobs, no per-row model UDF, no extra shuffle.
    * An earlier MLlib-KMeans variant was measured and discarded: fit +
    * transform cost tens of seconds of full-corpus passes per call.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 2,
      seed: Long = 42L,
      trainSample: Int = 4096,
      lloydIters: Int = 10): DataFrame = {
    // --- train: deterministic sample (top-N by seeded hash = one
    // TakeOrdered pass, no full sort) → Lloyd's on the driver.
    val sample = sampleVecs(corpus, seed, trainSample)
    val centroids = lloyd(sample, nlist, lloydIters)

    val assigned = corpus.select(
      graft.functions.CentroidFunctions.nearestCells(col("embedding"), centroids, 1)
        .getItem(0).as("cell"),
      col("vec_id").as("cid"), col("embedding").as("cvec"))

    val probed = probedCells(queries, centroids, nprobe)

    val scored = assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("sim", VectorFunctions.cosine(col("cvec"), col("qvec")))
    topKPerQuery(scored, k)
  }

  /** Build a PERSISTED IVF index: the trained centroid table plus the
    * corpus laid out cell-partitioned on disk. At 100 TB an ANN index
    * is built once and queried forever — retraining the quantizer and
    * re-assigning every vector per query batch (what ivfTopK does,
    * correctly, at verify scale) is not the production shape. Here
    * the assignment scan happens exactly once at build; every later
    * query prunes to its probed cells' PARTITION DIRECTORIES and
    * never touches the rest of the corpus on disk.
    */
  def buildIvfIndex(
      corpus: DataFrame,
      indexPath: String,
      nlist: Int = 16,
      seed: Long = 42L,
      trainSample: Int = 4096,
      lloydIters: Int = 10,
      trainOn: Option[DataFrame] = None): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample = sampleVecs(trainOn.getOrElse(corpus), seed, trainSample)
    val centroids = lloyd(sample, nlist, lloydIters)
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/centroids")
    corpus.select(
        graft.functions.CentroidFunctions.nearestCells(col("embedding"), centroids, 1)
          .getItem(0).as("cell"),
        col("vec_id"), col("embedding"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$indexPath/corpus")
  }

  /** Incremental maintenance of a persisted IVF index: a batch of new
    * vectors is routed with the FROZEN quantizer (the centroids
    * trained at build time — FAISS's train-then-add contract) and
    * appended as one marker-committed version of a [[graft.sources.VersionedLog]]
    * at `indexPath/log`, cell-partitioned like the base corpus so the
    * query path prunes increments and base alike. Routing is a pure
    * function of the centroids, so an incrementally-grown index holds
    * EXACTLY the cell contents a from-scratch rebuild (same
    * centroids) would — spec-verified, not asserted.
    *
    * Replay-safe like every graft incremental state: the batch id
    * rides the atomic log commit, and a redelivered id ≤ the
    * high-water mark is recognized and skipped (returns false).
    * `VersionedLog.compact(indexPath/log, partitionBy = cells)` is
    * the matching table service when append-files accumulate.
    */
  def ivfIndexAppend(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      batch: DataFrame,
      batchId: Option[Long] = None): Boolean = {
    import graft.sources.VersionedLog
    val log = s"$indexPath/log"
    if (batchId.exists(id => VersionedLog.appliedHwm(spark, log).exists(id <= _)))
      return false
    val centroids = readCentroids(spark, indexPath)
    val routed = batch.select(
      graft.functions.CentroidFunctions.nearestCells(col("embedding"), centroids, 1)
        .getItem(0).as("cell"),
      col("vec_id"), col("embedding"))
    VersionedLog.append(spark, log, Map("corpus" -> routed), batchId,
      partitionBy = Map("corpus" -> Seq("cell")))
    true
  }

  private def readCentroids(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Array[Array[Double]] =
    spark.read.parquet(s"$indexPath/centroids")
      .orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)

  /** Query a persisted IVF index: route each query to its `nprobe`
    * cells (centroids are a tiny one-file table, collected once),
    * then scan ONLY those cells via an explicit partition filter —
    * static pruning the planner can verify (`PartitionFilters: cell
    * IN ...`), not a hope that DPP fires. Candidate work per batch is
    * ~nprobe/nlist of the corpus, now also ~nprobe/nlist of the I/O.
    */
  def ivfIndexTopK(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 2): DataFrame = {
    val centroids = readCentroids(spark, indexPath)
    val probed = probedCells(queries, centroids, nprobe)
    val cells = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    // base cells plus any committed incremental append's cells: each
    // root is read separately (mixed-depth partition roots cannot
    // share one scan) and UNIONED — every scan keeps its own static
    // cell partition filter, and compaction bounds the root count
    val hconf = spark.sparkContext.hadoopConfiguration
    val logDirs = graft.sources.VersionedLog
      .committed(spark, s"$indexPath/log")
      .map(v => new org.apache.hadoop.fs.Path(v.dir, "corpus"))
      .filter(p => p.getFileSystem(hconf).exists(p))
      .map(_.toString)
    val corpus = (s"$indexPath/corpus" +: logDirs)
      .map(d => spark.read.parquet(d)
        .select(col("cell"), col("vec_id"), col("embedding"))
        .filter(col("cell").isin(cells: _*)))
      .reduce(_ unionByName _)
    val scored = corpus.join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("vec_id").as("cid"), col("qid"),
        VectorFunctions.cosine(col("embedding"), col("qvec")).as("sim"))
    topKPerQuery(scored, k)
  }

  /** Deterministic training sample: top-N by seeded hash — one
    * TakeOrdered pass over the corpus, no full sort, no RNG.
    * Element-type agnostic: the plan-side cast accepts float
    * embeddings (the raw table) and double embeddings (the
    * `normalizeEmbeddings` ingest output) alike — the codegen
    * kernels match on both, and the collect side must too.
    */
  private def sampleVecs(corpus: DataFrame, seed: Long, n: Int): Array[Array[Double]] =
    corpus
      .select(col("embedding").cast("array<double>"))
      .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
      .limit(n)
      .collect()
      .map(_.getSeq[Double](0).toArray)

  /** Queries exploded to their `nprobe` nearest cells:
    * (qid, qvec, cell) — the tiny side that broadcasts into the
    * cell-partitioned corpus. Cell routing is the `NearestCells`
    * kernel: centroids ride the plan as a reference object, so the
    * generated code stays constant-size however large nlist grows
    * (the expanded-struct alternative killed Janino at nlist = 64).
    */
  private def probedCells(
      queries: DataFrame,
      centroids: Array[Array[Double]],
      nprobe: Int): DataFrame =
    queries
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        explode(graft.functions.CentroidFunctions.nearestCells(
          col("embedding"), centroids, nprobe)).as("cell"))

  /** Plain Lloyd's iterations on an in-memory sample. Deterministic:
    * init = first k sample points (the sample is already hash-shuffled),
    * fixed iteration count, empty clusters keep their previous center.
    */
  private[operators] def lloyd(points: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(points.nonEmpty, "IVF training sample is empty")
    val dim = points(0).length
    var centers = Array.tabulate(math.min(k, points.length))(i => points(i).clone())
    // fewer distinct points than k: duplicate the first so shapes hold
    if (centers.length < k) centers = centers ++ Array.fill(k - centers.length)(points(0).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      points.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var j = 0
          while (j < dim) { val t = p(j) - centers(c)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += p(j); j += 1 }
        counts(best) += 1
      }
      centers = Array.tabulate(k) { c =>
        if (counts(c) == 0) centers(c)
        else { val s = sums(c); Array.tabulate(dim)(j => s(j) / counts(c)) }
      }
    }
    centers
  }

  /** k-NN classification: each query labeled by majority vote of its
    * k exact-cosine nearest labeled neighbors — deterministic winner:
    * highest vote count, ties to the smallest label. The vote table
    * is k·|queries| rows —
    * tiny — so the winner pick is one window over it; the corpus-side
    * cost is exactly bruteForceTopK's (one scan, no shuffle). The
    * labels come back via a join of the tiny hit list against the
    * corpus — at 100 TB that join broadcasts the hits, never the
    * corpus.
    */
  def knnClassify(corpus: DataFrame, queries: DataFrame, k: Int,
      labelCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hits = bruteForceTopK(corpus, queries, k)
      .select(col("query_id"), col("neighbor_id"))
    val labeled = corpus.select(col("vec_id").as("neighbor_id"), col(labelCol))
      .join(broadcast(hits), "neighbor_id")
    val votes = labeled.groupBy(col("query_id"), col(labelCol))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col(labelCol))
    votes.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("query_id"), col(labelCol).as("pred_label"), col("votes"))
  }

  /** PQ candidates + exact re-rank: the standard two-stage ANN — the
    * compressed-domain ADC score surfaces `candMult·k` candidates per
    * query (pqTopK), then ONLY those rows fetch their full vectors
    * for an exact cosine and the true top-k ordering. At 100 TB the
    * candidate list (candMult·k·|queries| ids) broadcasts into the
    * corpus scan, so full vectors are read for a vanishing fraction
    * of the corpus and the rerank output order is exact over
    * whatever the first stage surfaced.
    */
  def pqRerankTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      candMult: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      seed: Long = 42L): DataFrame =
    rerank(corpus, queries,
      pqTopK(corpus, queries, k * candMult, m, ksub, seed), k)

  /** IVFPQ candidates + exact re-rank — the full FAISS production
    * shape: cell routing bounds the candidate work (`ivfPqTopK`),
    * ADC compression bounds the scan's memory, and only the
    * `candMult·k · |queries|` surviving rows ever read their full
    * vectors, for an exact cosine ordering over what the index
    * surfaced.
    */
  def ivfPqRerankTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      candMult: Int = 4,
      nlist: Int = 16,
      nprobe: Int = 2,
      m: Int = 8,
      ksub: Int = 16,
      seed: Long = 42L): DataFrame =
    rerank(corpus, queries,
      ivfPqTopK(corpus, queries, k * candMult, nlist, nprobe, m, ksub, seed), k)

  /** Exact-cosine re-rank of a (query_id, neighbor_id) candidate
    * list: the tiny candidate set broadcasts INTO the corpus scan, so
    * full vectors are read for a vanishing fraction of the corpus.
    */
  private def rerank(
      corpus: DataFrame,
      queries: DataFrame,
      candidates: DataFrame,
      k: Int): DataFrame = {
    val cand = candidates.select(col("query_id"), col("neighbor_id"))
    val withVecs = corpus
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      .join(broadcast(cand), col("cid") === col("neighbor_id"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val scored = withVecs.join(broadcast(q), col("query_id") === col("qid"))
      .withColumn("sim", VectorFunctions.cosine(col("cvec"), col("qvec")))
    topKPerQuery(scored, k)
  }

  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("qid"))
      .agg(TopKFunctions.top_k(col("sim"), col("cid"), k).as("hits"))
      .select(col("qid"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(
        col("qid").as("query_id"),
        (col("pos") + 1).as("rank"),
        col("hit.id").as("neighbor_id"),
        round(col("hit.score"), 9).as("sim"))

  /** Embedding near-dup pairs: all (a < b) with cosine >= threshold.
    * Exact kernel over the full pair space — correct at verify scale;
    * the LSH bucket join above is the same operator's scale path.
    */
  /** Per-vector scalar quantization to `levels` codes (int8 = 256):
    * code = floor((v - min) · (levels-1) / (max - min)), clamped at
    * levels-1 for the max element, 0 for constant vectors — the
    * memory-compression step in front of a large ANN index (4× over
    * float32). Every step (min/max, widen, subtract, multiply,
    * divide, floor) is correctly rounded and rounding-MODE-free, so
    * codes are bit-identical across engines — `round()` would not be
    * (HALF_UP vs HALF_EVEN). Emits one row per (vector, position):
    * explode-then-scalar keeps the arithmetic in whole-stage codegen
    * (an array-level HOF lambda would be interpreted and re-inlined
    * per consumer).
    */
  def scalarQuantize(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", levels: Int = 256): DataFrame = {
    require(levels >= 2, "levels must be >= 2")
    val top = lit(levels - 1)
    val exploded = df.select(
      col(idCol),
      array_min(col(vecCol)).cast("double").as("_mn"),
      array_max(col(vecCol)).cast("double").as("_mx"),
      posexplode(col(vecCol)).as(Seq("pos", "_v")))
    exploded.select(
      col(idCol), col("pos").cast("long").as("pos"),
      when(col("_mx") === col("_mn"), lit(0))
        .otherwise(least(top,
          floor((col("_v").cast("double") - col("_mn")) * top / (col("_mx") - col("_mn")))))
        .cast("int").as("code"))
  }

  /** Product-quantization approximate top-k (ADC — asymmetric
    * distance computation). The memory-side ANN scale path: each
    * corpus vector compresses to `m` one-byte codes (64-dim float32 →
    * 8 bytes, 32× smaller), so a 100 TB embedding corpus's index fits
    * in RAM where raw vectors never would; PQ composes with the IVF
    * cell routing above (IVF picks candidate cells, PQ scores inside
    * them) exactly as in the FAISS IVFPQ design.
    *
    * Training mirrors `ivfTopK`: bounded hash-ordered sample to the
    * driver, Lloyd's per SUBSPACE (m independent k-means over
    * dim/m-dim slices), codebooks become plan literals. Encoding is a
    * codegen-friendly projection (per subspace: ksub dot products +
    * struct-argmin). Search keeps the query side EXACT: approximate
    * score = Σ_j q_j · c_{j,code_j} — the inner product of the query
    * with the corpus vector's reconstruction — computed per pair from
    * the codes; only codes ever leave the corpus scan.
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      m: Int = 8,
      ksub: Int = 16,
      seed: Long = 42L,
      trainSample: Int = 4096,
      lloydIters: Int = 10): DataFrame = {
    val sample = sampleVecs(corpus, seed, trainSample)
    val (codebooks, dsub) = trainPqCodebooks(sample, m, ksub, lloydIters)
    val encoded = corpus.select(
      col("vec_id").as("cid"),
      pqCodes(col("embedding"), codebooks, dsub).as("codes"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val scored = encoded.join(broadcast(q), col("cid") =!= col("qid"))
      .withColumn("sim", adcScore(col("qvec"), col("codes"), codebooks, dsub))
    topKPerQuery(scored, k)
  }

  /** m independent codebooks, each trained on its own dim/m slice of
    * the sample. Returns (codebooks, dsub).
    */
  private def trainPqCodebooks(
      sample: Array[Array[Double]],
      m: Int,
      ksub: Int,
      lloydIters: Int): (Array[Array[Array[Double]]], Int) = {
    require(sample.nonEmpty, "PQ training sample is empty")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val codebooks = Array.tabulate(m) { j =>
      lloyd(sample.map(_.slice(j * dsub, (j + 1) * dsub)), ksub, lloydIters)
    }
    (codebooks, dsub)
  }

  /** PQ encoding: per subspace, argmin_c ||x_j - c||² = ||c||² - 2·x_j·c
    * (+ ||x_j||² constant), ties to the lowest code — the `PqEncode`
    * kernel, codebooks as a plan reference object (constant-size
    * generated code at any m × ksub; real indexes use ksub = 256).
    */
  private def pqCodes(
      vec: org.apache.spark.sql.Column,
      codebooks: Array[Array[Array[Double]]],
      dsub: Int): org.apache.spark.sql.Column =
    graft.functions.CentroidFunctions.pqEncode(vec, codebooks, dsub)

  /** ADC score: Σ_j q_j · codebook[j][code_j] — the inner product of
    * the query with the corpus vector's reconstruction. Codebooks are
    * plan literals, so the lookup is element_at + a dsub-wide dot —
    * no join against a centroid table, no corpus vectors read.
    */
  private def adcScore(
      qvec: org.apache.spark.sql.Column,
      codes: org.apache.spark.sql.Column,
      codebooks: Array[Array[Array[Double]]],
      dsub: Int): org.apache.spark.sql.Column =
    codebooks.indices.map { j =>
      VectorFunctions.dot(
        slice(qvec, j * dsub + 1, dsub),
        element_at(typedLit(codebooks(j).map(_.map(_.toFloat).toSeq).toSeq),
          codes.getItem(j) + 1))
    }.reduce(_ + _)

  /** IVFPQ approximate top-k — the FAISS IVF+PQ composition, and the
    * shape that actually holds at 100 TB: the IVF coarse quantizer
    * routes each query to its `nprobe` nearest cells, and the PQ ADC
    * score runs ONLY over the codes inside those cells — candidate
    * work per query ≈ nprobe/nlist of the corpus (vs `pqTopK`'s full
    * compressed-domain scan), while only 1-byte codes ever leave the
    * corpus scan (vs `ivfTopK` shipping raw vectors into the join).
    * Codes here quantize the RAW vectors, not the cell residuals
    * (FAISS `by_residual=false`): residual encoding would need a
    * per-row centroid lookup inside the encode expression for a
    * precision gain the recall spec doesn't require — the simpler
    * form keeps both train and encode identical to `pqTopK`, so the
    * two stages compose without retraining.
    *
    * Training is one driver pass (bounded hash-ordered sample) for
    * BOTH quantizers; cell assignment and PQ encoding are codegen'd
    * projections over one corpus scan; the exploded (qid, cell) probe
    * list broadcasts.
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 2,
      m: Int = 8,
      ksub: Int = 16,
      seed: Long = 42L,
      trainSample: Int = 4096,
      lloydIters: Int = 10): DataFrame = {
    val sample = sampleVecs(corpus, seed, trainSample)
    val centroids = lloyd(sample, nlist, lloydIters)
    val (codebooks, dsub) = trainPqCodebooks(sample, m, ksub, lloydIters)
    val encoded = corpus.select(
      graft.functions.CentroidFunctions.nearestCells(col("embedding"), centroids, 1)
        .getItem(0).as("cell"),
      col("vec_id").as("cid"),
      pqCodes(col("embedding"), codebooks, dsub).as("codes"))
    val probed = probedCells(queries, centroids, nprobe)
    val scored = encoded.join(broadcast(probed), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("sim", adcScore(col("qvec"), col("codes"), codebooks, dsub))
    topKPerQuery(scored, k)
  }

  /** Hard-negative mining for contrastive training: for each anchor,
    * the k most similar corpus rows with a DIFFERENT label — the
    * negatives that actually move a contrastive loss, as opposed to
    * the uniform-random partners `Sampling.negativeSamples` draws.
    * Same scale contract as `bruteForceTopK`: anchors broadcast into
    * one corpus scan, a bounded top-k heap per anchor, and only
    * k·|anchors| rows survive the map side; swap the scan for the
    * IVFPQ route when the corpus outgrows it.
    */
  def hardNegatives(
      corpus: DataFrame,
      anchors: DataFrame,
      k: Int,
      labelCol: String = "label"): DataFrame = {
    val c = corpus.select(
      col("vec_id").as("cid"), col("embedding").as("cvec"), col(labelCol).as("_clabel"))
    val q = anchors.select(
      col("vec_id").as("qid"), col("embedding").as("qvec"), col(labelCol).as("_qlabel"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid") && col("_clabel") =!= col("_qlabel"))
      .withColumn("sim", VectorFunctions.cosine(col("cvec"), col("qvec")))
    topKPerQuery(scored, k)
  }

  /** L2 normalization of the embedding column — the ingest-time step
    * that turns every later cosine into a plain dot product (ANN at
    * scale normalizes ONCE instead of re-deriving two norms per pair;
    * see `DotProduct`). Zero vectors pass through unchanged rather
    * than dividing by zero. Pure projection: no shuffle, no UDF,
    * the norm is one sequential `aggregate` fold so the result is
    * reproducible cross-engine.
    */
  def normalizeEmbeddings(
      df: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol)
    val norm = sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x.cast("double") * x))
    df.withColumn(vecCol,
      when(norm === 0.0d, v.cast("array<double>"))
        .otherwise(transform(v, x => x.cast("double") / norm)))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): the
    * corpus is partitioned into k-means cells (bounded-sample Lloyd
    * quantizer, cell assignment via the constant-size `NearestCells`
    * kernel), and WITHIN each cell a row is dropped iff some
    * smaller-id row of the same cell has cosine ≥ threshold — the
    * deterministic min-id variant of the paper's keep-one-per-group
    * rule (pruning chains transitively: b dropped by a can itself
    * drop c). Pairwise cosine runs only inside cells, so the pair
    * space is Σ|cell|² with |cells| scaling as nclusters grows with
    * the corpus — the same contract as the paper's clustered
    * implementation, never an all-pairs join.
    *
    * Returns the SURVIVORS with their cell id (for audit); rows in
    * singleton cells always survive.
    */
  def semanticDedup(
      df: DataFrame,
      threshold: Double,
      nclusters: Int = 64,
      seed: Long = 42L,
      trainSample: Int = 4096,
      lloydIters: Int = 10): DataFrame = {
    val centroids = lloyd(sampleVecs(df, seed, trainSample), nclusters, lloydIters)
    val assigned = df.select(
      graft.functions.CentroidFunctions.nearestCells(col("embedding"), centroids, 1)
        .getItem(0).as("cell"),
      col("vec_id"), col("embedding"))
    val a = assigned.select(
      col("cell"), col("vec_id").as("id_a"), col("embedding").as("vec_a"))
    val b = assigned.select(
      col("cell"), col("vec_id").as("id_b"), col("embedding").as("vec_b"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(VectorFunctions.cosine(col("vec_a"), col("vec_b")) >= threshold)
      .select(col("id_b").as("vec_id"))
      .distinct()
    assigned.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
  }

  /** Sparse random projection (Achlioptas) to `kOut` dimensions with
    * a HASH-DERIVED projection matrix: r(i,j) ∈ {+1, −1, 0} with
    * probabilities (1/6, 1/6, 2/3) comes from the same multiplicative
    * integer hash the sampling operators use, so the matrix needs no
    * storage, no broadcast, and ANY engine regenerates it bit-
    * identically — the output is oracle-able, which a Gaussian RNG
    * matrix never is. Input values quantize to fixed-point longs
    * (floor(v·1e9), exact for float32 inputs), so each output
    * coordinate is an exact ±sum of longs: y(j) = Σ_i r(i,j)·q(v_i).
    * Johnson–Lindenstrauss applies to the ±1 construction, and the
    * 2/3 zeros mean only a third of the terms are touched at 100 TB.
    */
  def randomProject(df: DataFrame, kOut: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(kOut > 0, "kOut must be positive")
    val q = floor(col("_v").cast("double") * 1e9).cast("long")
    val h = (col("pos") % 2147483648L) * 2654435761L + col("j") * 40503L
    val r = when(pmod(h, lit(2147483648L)) % 6 === 0, 1L)
      .when(pmod(h, lit(2147483648L)) % 6 === 1, -1L)
      .otherwise(0L)
    df.select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "_v")))
      .withColumn("pos", col("pos").cast("long"))
      .crossJoin(broadcast(
        df.sparkSession.range(kOut).select(col("id").as("j"))))
      .groupBy(col(idCol), col("j"))
      .agg(sum(r * q).as("y_fp"))
  }

  /** EXACT embedding near-dup pairs — an all-pairs cosine join,
    * O(n²) by definition. Its role is the small-corpus oracle
    * baseline the LSH path's recall is measured against; the size
    * guard makes pointing it at a big table a loud error instead of
    * a cluster-melting cartesian (same philosophy as the TextRank /
    * clusters size gates). `maxExactRows` costs one count() — noise
    * next to the n² join it bounds.
    */
  def embeddingNearDupPairs(df: DataFrame, threshold: Double,
      maxExactRows: Long = 100000L): DataFrame = {
    val n = df.count()
    require(n <= maxExactRows,
      s"embeddingNearDupPairs is the EXACT all-pairs kernel (n² = $n²): corpus exceeds " +
        s"maxExactRows=$maxExactRows — use embeddingNearDupPairsLsh (the banded scale path) " +
        "or embeddingNearDupPairsAuto (size-routed)")
    val a = df.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"))
    val b = df.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", VectorFunctions.cosine(col("vec_a"), col("vec_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 9).as("sim"))
  }

  /** Size-routed embedding near-dup: the exact all-pairs kernel when
    * the corpus fits under `maxExactRows` (bit-exact, oracle-able),
    * the LSH-banded path beyond it (approximate RECALL, same
    * verified-cosine output columns). The routing is explicit in the
    * name — callers who need exactness guarantees at any size should
    * call the exact kernel and own its cost.
    */
  def embeddingNearDupPairsAuto(df: DataFrame, threshold: Double,
      maxExactRows: Long = 100000L,
      numTables: Int = 16,
      planesPerTable: Int = 8): DataFrame =
    if (df.count() <= maxExactRows) embeddingNearDupPairs(df, threshold, maxExactRows)
    else embeddingNearDupPairsLsh(df, threshold, numTables, planesPerTable)

  /** Embedding near-dup pairs, LSH-banded — the 100 TB path for the
    * exact kernel above, same OR-of-ANDs amplification as
    * `Dedup.minhashLshPairs`: `numTables` independent hash tables,
    * each keyed by the sign pattern of `planesPerTable` random
    * hyperplanes (distinct planes per table). A pair is a candidate
    * iff it collides in AT LEAST ONE table, so for a pair at angle θ
    * (separation probability p = θ/π per plane) the recall is
    * 1 − (1 − (1−p)^b)^L — tunable arbitrarily close to 1 while
    * cosine runs only within buckets: the pair space is
    * Σ_tables Σ_buckets |bucket|², an equi-join on (table, bucket),
    * never an all-pairs nested loop. A pair colliding in several
    * tables is scored per collision and collapsed by `.distinct()`
    * on the (id_a, id_b, sim) OUTPUT (sim is deterministic, so the
    * rows are bit-identical; candidates are smaller on the wire than
    * vectors would be in a pre-score dedup).
    *
    * Tuning at scale: buckets per table = 2^b, so b must grow with
    * the corpus for per-bucket pair counts to stay bounded (b ≈
    * log2(n/targetBucketSize)), and L grows with b to hold recall:
    * L ≈ ln(1/missRate) / (1−p)^b. The defaults suit a HIGH
    * threshold (0.9 ⇒ p ≈ 0.14, b = 8 ⇒ per-table 0.29, L = 16 ⇒
    * recall ≈ 0.996); looser thresholds need smaller b / larger L —
    * the spec measures 0.45 with (b=2, L=8) against the exact kernel,
    * which stays the oracle baseline.
    */
  /** (numTables, planesPerTable) derived from corpus size — the
    * lever SCALE.md shows must move with the data (fixed planes at
    * 10× rows = 10× bucket occupancy = superlinear pair work).
    * Planes per table b grows with log₂(n/targetBucketRows), so
    * EXPECTED bucket size stays ≈ targetBucketRows however large the
    * corpus; tables L then holds recall at the threshold using the
    * hyperplane-LSH collision model: a pair at cosine t agrees with
    * one random hyperplane w.p. p = 1 − arccos(t)/π, collides in a
    * table w.p. p^b, so L = ⌈ln(1−R)/ln(1−p^b)⌉ gives
    * 1 − (1−p^b)^L ≥ R. Bucket work per table shrinks 2× per added
    * plane while L grows far slower — net candidate work flattens.
    */
  def tunedCosineLshParams(
      nRows: Long,
      threshold: Double,
      targetRecall: Double = 0.95,
      targetBucketRows: Long = 64L,
      maxTables: Int = 64,
      maxPlanes: Int = 24): (Int, Int) = {
    require(threshold > 0 && threshold < 1, "threshold in (0, 1)")
    require(targetRecall > 0 && targetRecall < 1, "targetRecall in (0, 1)")
    val p = 1.0 - math.acos(threshold) / math.Pi
    val b = math.max(2, math.min(maxPlanes,
      math.ceil(math.log(math.max(2.0, nRows.toDouble / targetBucketRows)) / math.log(2.0)).toInt))
    val perTable = math.pow(p, b)
    val l = math.max(1, math.min(maxTables,
      math.ceil(math.log(1 - targetRecall) / math.log(1 - perTable)).toInt))
    (l, b)
  }

  /** `embeddingNearDupPairsLsh` with corpus-derived parameters — the
    * call for a corpus whose size is not known in advance.
    */
  def embeddingNearDupPairsLshAuto(
      df: DataFrame,
      threshold: Double,
      targetRecall: Double = 0.95,
      targetBucketRows: Long = 64L): DataFrame = {
    val (l, b) = tunedCosineLshParams(df.count(), threshold, targetRecall, targetBucketRows)
    embeddingNearDupPairsLsh(df, threshold, l, b)
  }

  def embeddingNearDupPairsLsh(
      df: DataFrame,
      threshold: Double,
      numTables: Int = 16,
      planesPerTable: Int = 8): DataFrame = {
    require(numTables >= 1 && planesPerTable >= 1, "need >=1 table and >=1 plane")
    // table t uses planes [t*b, (t+1)*b) — hashing the global plane
    // index makes every table's hyperplanes independent; all tables'
    // buckets come from ONE kernel evaluation per row
    val indexed = df.select(
      col("vec_id"), col("embedding"),
      posexplode(graft.functions.LshFunctions.lshBuckets(
        col("embedding"), numTables, planesPerTable)).as(Seq("tbl", "bucket")))
    val a = indexed.select(
      col("tbl"), col("bucket"), col("vec_id").as("id_a"), col("embedding").as("vec_a"))
    val b = indexed.select(
      col("tbl"), col("bucket"), col("vec_id").as("id_b"), col("embedding").as("vec_b"))
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", VectorFunctions.cosine(col("vec_a"), col("vec_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 9).as("sim"))
      .distinct()
  }
}
