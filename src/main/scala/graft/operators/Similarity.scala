package graft.operators

import graft.functions.{TopKFunctions, VectorFunctions}
import org.apache.spark.sql.DataFrame
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
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
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

  /** Deterministic pseudo-random hyperplanes: component h[d] of plane
    * p derived from xxhash64(p, d) scaled to [-1, 1). Seeded — stable
    * across runs and engines.
    */
  private def hyperplaneSign(vec: org.apache.spark.sql.Column, plane: Int): org.apache.spark.sql.Column = {
    // dot(vec, h_p) where h_p[d] = scaled hash — computed via
    // aggregate over the element index, all codegen'd.
    val dims = size(vec)
    val dotExpr = aggregate(
      zip_with(vec, sequence(lit(0), dims - 1),
        (x, d) => x * (xxhash64(lit(plane), d).cast("double") / lit(Long.MaxValue.toDouble))),
      lit(0.0), (acc, x) => acc + x)
    when(dotExpr >= 0, lit(1)).otherwise(lit(0))
  }

  /** LSH bucket key: sign pattern across `numPlanes` hyperplanes. */
  def withLshBucket(df: DataFrame, numPlanes: Int = 8): DataFrame = {
    val bits = (0 until numPlanes).map(p => hyperplaneSign(col("embedding"), p) * (1 << p))
    df.withColumn("bucket", bits.reduce(_ + _))
  }

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
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 2,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    import spark.implicits._

    val corpusV = corpus.withColumn("fv", array_to_vector(col("embedding")))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(corpusV)
    val assigned = model.transform(corpusV)
      .select(col("cell"), col("vec_id").as("cid"), col("embedding").as("cvec"))

    // nlist is small: centroids ship as a broadcast table; per-query
    // cell ranking by ||c||² - 2·q·c (the ||q||² term is constant per
    // query), matching the quantizer's L2 assignment geometry.
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat), c.toArray.map(x => x * x).sum)
    }.toSeq.toDF("cell", "centroid", "cnorm2")

    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("d", col("cnorm2") - lit(2.0) * VectorFunctions.dot(col("qvec"), col("centroid")))
      .withColumn("rk", row_number().over(Window.partitionBy("qid").orderBy(col("d"), col("cell"))))
      .filter(col("rk") <= nprobe)
      .select(col("cell"), col("qid"), col("qvec"))

    val scored = assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
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
  def embeddingNearDupPairs(df: DataFrame, threshold: Double): DataFrame = {
    val a = df.select(col("vec_id").as("id_a"), col("embedding").as("vec_a"))
    val b = df.select(col("vec_id").as("id_b"), col("embedding").as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", VectorFunctions.cosine(col("vec_a"), col("vec_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 9).as("sim"))
  }
}
