package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal: replays the headline operators at ~10× the bench
  * scale (an sf1 approximation) to substantiate the 100 TB design
  * claims with measurements rather than assertions.
  *
  * The driver ships no sf1 dataset, so one is DERIVED from sf0.1:
  * fact tables are replicated `copies` times with shifted surrogate
  * keys; text gets a per-epoch marker token (so near-dup structure is
  * preserved within an epoch instead of every document gaining 9
  * exact clones); embeddings get a per-epoch perturbation of one
  * coordinate (same geometry, distinct vectors). Dimension tables are
  * NOT scaled — facts grow, dims don't, which is exactly the shape
  * that keeps broadcast joins broadcastable at 100 TB.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.Scale [copies]"
  * Prints one JSON line per query: {"query":…,"sf01_sec":…,"sf1_sec":…}.
  */
object Scale {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val outRoot = "/root/repo/target/scale-sf1"
    val f = new java.io.File(outRoot)
    if (!f.exists()) {
      f.mkdirs()
      buildScaled(spark, sfDir, outRoot, copies)
    }

    def t01(name: String) = sources.TableLoader.table(spark, sfDir, name)
    def t1(name: String) =
      sources.TableLoader.normalizeNanos(
        spark.read.parquet(s"$outRoot/$name.parquet"), "ts")

    // headline operators: one thunk per (name, docs-input)
    val runs: Seq[(String, DataFrame => DataFrame)] = Seq(
      "dedup_exact" -> ((docs: DataFrame) =>
        operators.Dedup.exact(docs, "text", "doc_id")),
      "dedup_minhash_lsh" -> ((docs: DataFrame) =>
        // corpus-tuned bands/hashes: rows-per-band grows with the
        // measured corpus, keeping bucket occupancy flat at 10×
        operators.Dedup.minhashLshPairsAuto(docs, "doc_id", "text")),
      "dedup_prefix" -> ((docs: DataFrame) =>
        operators.Dedup.prefixFilteredJaccardPairs(docs, "doc_id", "text", n = 5, threshold = 0.5)),
      "dedup_substring" -> ((docs: DataFrame) =>
        operators.Dedup.duplicatedSpanExcision(docs, w = 8)),
      "text_pagerank" -> ((docs: DataFrame) =>
        operators.TextRank.rank(docs, iterations = 10)),
      "text_tfidf" -> ((docs: DataFrame) =>
        operators.TextAnalysis.tfIdf(docs)),
      "decontam_ngram" -> ((docs: DataFrame) =>
        operators.Curation.decontaminate(
          docs, docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", n = 8)),
      "curate_docs" -> ((docs: DataFrame) => {
        val scored = operators.TextAnalysis.withLangId(
          operators.TextAnalysis.withQuality(docs))
        operators.Dedup.exact(
          scored.filter(col("quality_score") >= 0.45 && col("n_tokens") >= 20),
          "text", "doc_id")
      }),
      // evaluation family: one score-keyed combine + a vocab-sized
      // window — corpus-linear scan, constant-size window state
      "q_eval_auc" -> ((docs: DataFrame) =>
        operators.Evaluation.aucExact(
          operators.TextAnalysis.qualityLinear(docs),
          col("lang") === "en", col("q_score"))),
      "q_eval_calibration" -> ((docs: DataFrame) =>
        operators.Evaluation.calibration(
          operators.TextAnalysis.qualityLinear(docs),
          col("lang") === "en", col("q_score"))),
      // round-10 additions: PR-AUC shares the grouped-distribution
      // shape with AUC (expect sub-linear); chi2/PMI are one-combine
      // token aggregations; k-core peels a VOCAB-sized graph (edge
      // build is the corpus-linear part); ROUGE is pair-list-bounded
      "q_eval_pr_auc" -> ((docs: DataFrame) =>
        operators.Evaluation.averagePrecision(
          operators.TextAnalysis.qualityLinear(docs),
          col("lang") === "en", col("q_score"))),
      "q_chi2_features" -> ((docs: DataFrame) =>
        operators.Association.chi2Features(
          docs, col("doc_id"), col("text"), col("lang") === "en", minDf = 2L)),
      "q_pmi_collocations" -> ((docs: DataFrame) =>
        operators.Association.pmiCollocations(docs, col("text"), minCount = 5L)),
      "q_kcore" -> ((docs: DataFrame) => {
        val words = docs.select(split(col("text"), " ").as("w"))
          .select(filter(col("w"), x => x =!= "").as("w"))
        val bg = words.filter(size(col("w")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w1, w[i] AS w2))")).as("bg"))
          .select(col("bg.w1"), col("bg.w2"))
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
        val edges = bg.filter(col("w1") =!= col("w2"))
          .select(least(col("w1"), col("w2")).as("a"),
            greatest(col("w1"), col("w2")).as("b"), col("n"))
          .groupBy(col("a"), col("b")).agg(sum(col("n")).as("n"))
          .filter(col("n") >= 65L)
        operators.GraphAnalytics.kCore(edges, "a", "b", k = 6)
      }),
      // CDC chunk-store dedup: one explode + one chunk-keyed combine —
      // cost linear in payload BYTES; the ratio should track the 10×
      // byte growth, never the chunk-pair space
      "q_mm_chunk_dedup" -> ((docs: DataFrame) => {
        val d = docs.select(col("doc_id"), col("text"), col("source"))
        val copies = d.select((col("doc_id") + 30000000L).as("doc_id"),
          concat(col("text"), lit("#footer")).as("text"), col("source"))
        operators.Multimodal.chunkStoreStats(
          operators.Multimodal.mediaFromDocuments(d.unionByName(copies)).toDF())
      }),
      "q_rouge" -> ((docs: DataFrame) => {
        val pairs = operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 5, threshold = 0.5)
        operators.Evaluation.rougeN(docs, "doc_id", "text", pairs, n = 2)
      }))

    val embRuns: Seq[(String, DataFrame => DataFrame)] = Seq(
      "dedup_embedding_lsh" -> ((emb: DataFrame) =>
        // corpus-tuned planes/tables: planes grow with log2(n), so
        // expected bucket size stays constant as the corpus grows
        operators.Similarity.embeddingNearDupPairsLshAuto(
          emb, threshold = 0.45, targetRecall = 0.85)),
      "sim_pq_topk" -> ((emb: DataFrame) =>
        operators.Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10), k = 5)),
      "sim_ivfpq_topk" -> ((emb: DataFrame) =>
        operators.Similarity.ivfPqTopK(
          emb, emb.filter(col("vec_id") < 10), k = 5, nlist = 64, nprobe = 8)),
      // NDCG@10 over the exact cosine run: the run generation is the
      // O(corpus·queries) part (the leg being evaluated); the metric
      // chain itself touches O(queries·k) rows at ANY corpus size
      "q_eval_ndcg" -> ((emb: DataFrame) => {
        val q = emb.filter(col("vec_id") < 10)
        val run = operators.Similarity.bruteForceTopK(emb, q, k = 10)
          .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank").as("rk"))
        val qrels = emb.select(col("vec_id").as("doc_id"), col("label").as("_dl"))
          .crossJoin(broadcast(q.select(col("vec_id").as("query_id"), col("label").as("_ql"))))
          .filter(col("doc_id") =!= col("query_id"))
          .withColumn("rel", when(col("_dl") === col("_ql"), 2)
            .when(abs(col("_dl") - col("_ql")) === 1, 1).otherwise(0))
          .select(col("query_id"), col("doc_id"), col("rel"))
        operators.Retrieval.ndcgAtK(run, qrels, k = 10)
      }))

    def q1Shape(li: DataFrame): DataFrame =
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_base_price"),
          count(lit(1)).as("count_order"))

    val out = Seq.newBuilder[String]
    // local iteration: SPARK_GRAFT_SCALE_ONLY=a,b re-measures a
    // subset without replaying the whole rehearsal (by-name thunks —
    // skipped entries never run their jobs)
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY").map(_.split(",").map(_.trim).toSet)
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    def rehearse(name: String, small: => DataFrame, big: => DataFrame): Unit = if (wanted(name)) {
      val (_, tSmall) = timed(small.write.mode("overwrite").format("noop").save())
      val (_, tBig) = timed(big.write.mode("overwrite").format("noop").save())
      out += f"""{"query":"$name","sf01_sec":$tSmall%.3f,"sf1_sec":$tBig%.3f,"ratio":${tBig / tSmall}%.2f}"""
      println(out.result().last)
    }

    val docs01 = t01("documents"); val docs1 = spark.read.parquet(s"$outRoot/documents.parquet")
    runs.foreach { case (n, q) => rehearse(n, q(docs01), q(docs1)) }
    val emb01 = t01("embeddings"); val emb1 = spark.read.parquet(s"$outRoot/embeddings.parquet")
    embRuns.foreach { case (n, q) => rehearse(n, q(emb01), q(emb1)) }

    val li01 = t01("lineitem"); val li1 = spark.read.parquet(s"$outRoot/lineitem.parquet")
    rehearse("q1_agg", q1Shape(li01), q1Shape(li1))

    // star join: scaled facts, UNSCALED broadcast dims
    rehearse("q5_star_join", starJoin(spark, t01("lineitem"), t01("orders"), sfDir),
      starJoin(spark, li1, spark.read.parquet(s"$outRoot/orders.parquet"), sfDir))

    // streaming windowed agg over the scaled events table
    rehearse("q_window_running",
      windowRunning(t01("events")), windowRunning(t1("events")))

    // Holt double recurrence: groupBy shuffle + per-entity fold —
    // linear in events (the fold is in-array, no per-step joins)
    def holtShape(ev: DataFrame): DataFrame =
      operators.EventAnalytics.holt(
        ev.withColumn("cents", round(col("value") * 100).cast("long")),
        "user_id", "ts", "event_id", "cents")
    rehearse("q_holt", holtShape(t01("events")), holtShape(t1("events")))

    // Holt-Winters: same shuffle + fold shape as Holt with an m-deep
    // in-array lookback — per-row cost is flat, the ratio must match
    // q_holt's
    def hwShape(ev: DataFrame): DataFrame =
      operators.EventAnalytics.holtWinters(
        ev.withColumn("cents", round(col("value") * 100).cast("long")),
        "user_id", "ts", "event_id", "cents", m = 7)
    rehearse("q_holt_winters", hwShape(t01("events")), hwShape(t1("events")))

    // A/B readout: one unit-level combine collapses everything
    def abShape(ev: DataFrame): DataFrame = {
      val units = ev.groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
        .withColumn("variant", operators.Experiment.assignVariant(col("user_id")))
      operators.Experiment.twoProportionZ2(units, col("variant"), col("converted"))
    }
    rehearse("q_ab_test", abShape(t01("events")), abShape(t1("events")))

    // record linkage: block sizes are bounded by key design, so the
    // blocking join must scale with Σ|block|² (flat per record here);
    // the 10× leg links 10 shifted customer copies
    def linkShape(cust: DataFrame): DataFrame = {
      val base = cust.select(
        col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_nationkey").cast("long").as("nation"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").as("bal_cents"))
      val typoA = base.filter(col("id") % 4 === 0).select(
        (col("id") + 1000000000L).as("id"),
        regexp_replace(col("name"), "#", "@").as("name"),
        col("nation"), (col("bal_cents") + 7L).as("bal_cents"))
      val records = base.unionByName(typoA)
      val blockKeys = Seq(
        expr("substring(name, length(name) - 4, 5)"),
        concat(col("nation").cast("string"), lit(":"),
          expr("CAST((bal_cents + 1000000) DIV 10000 AS STRING)")))
      val nameDist = levenshtein(col("a_name"), col("b_name"))
      val score =
        when(nameDist === 0, 40L).when(nameDist <= 2, 25L).otherwise(0L) +
        when(col("a_nation") === col("b_nation"), 20L).otherwise(0L) +
        when(abs(col("a_bal_cents") - col("b_bal_cents")) <= 10L, 15L).otherwise(0L)
      operators.RecordLinkage.scoredMatches(records, "id", blockKeys, score, 50L)
    }
    val cust01 = t01("customer")
    val cust1 = (0 until copies).map(i => cust01.withColumn("c_custkey",
      col("c_custkey") + lit(i.toLong * 100000000L))).reduce(_ unionByName _)
    rehearse("q_linkage_matches", linkShape(cust01), linkShape(cust1))

    // -------------------------------------------------------------
    // Round-7 state ops: the incremental/persisted-state family.
    // Stateful runs — each thunk owns a fresh scratch state dir.
    // -------------------------------------------------------------
    def rehearseUnit(name: String)(small: => Unit)(big: => Unit): Unit = if (wanted(name)) {
      val (_, tSmall) = timed(small)
      val (_, tBig) = timed(big)
      out += f"""{"query":"$name","sf01_sec":$tSmall%.3f,"sf1_sec":$tBig%.3f,"ratio":${tBig / tSmall}%.2f}"""
      println(out.result().last)
    }
    def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()

    // incremental MinHash-LSH: 4 batches folded into persisted
    // band/set state — per-batch cost must track the BATCH (plus its
    // matched candidates), not the accumulated state. DECOMPOSED
    // (round-10 verdict #3): the per-fold premium split into the
    // append phase (band+write, O(batch)) vs the emit phase
    // (candidate join + verify, O(state bands) + O(matches)), with
    // the state-compaction service wired in after fold 2 — the
    // designed-in answer to version accumulation, timed separately.
    def minhashIncFoldSplit(docs: DataFrame, state: String): (Double, Double, Double) = {
      var tAppend = 0.0; var tEmit = 0.0; var tCompact = 0.0
      (0 until 4).foreach { k =>
        val batch = docs.filter(col("doc_id") % 4 === k)
        val (banded, sets) = operators.Dedup.minhashBandBatch(batch, "doc_id", "text", 5, 64, 16)
        val (upTo, ta) = timed(sources.VersionedLog.append(
          spark, state, Map("bands" -> banded, "sets" -> sets), Some(k.toLong)))
        tAppend += ta
        val (_, te) = timed(noop(
          operators.Dedup.minhashIncEmit(spark, state, banded, 0.5, upTo)))
        tEmit += te
        if (k == 1) {
          val (_, tc) = timed(operators.Dedup.minhashLshCompactState(spark, state))
          tCompact += tc
        }
      }
      (tAppend, tEmit, tCompact)
    }
    if (wanted("dedup_minhash_inc")) {
      val (a01, e01, c01) = minhashIncFoldSplit(docs01, scaleScratch("mh-inc-01"))
      val (a1, e1, c1) = minhashIncFoldSplit(docs1, scaleScratch("mh-inc-1"))
      val (t01s, t1s) = (a01 + e01 + c01, a1 + e1 + c1)
      out += f"""{"query":"dedup_minhash_inc","sf01_sec":$t01s%.3f,"sf1_sec":$t1s%.3f,"ratio":${t1s / t01s}%.2f}"""
      println(out.result().last)
      out += f"""{"query":"dedup_minhash_inc_phases","append":[$a01%.3f,$a1%.3f,${a1 / a01}%.2f],"emit":[$e01%.3f,$e1%.3f,${e1 / e01}%.2f],"compact":[$c01%.3f,$c1%.3f,${c1 / c01}%.2f]}"""
      println(out.result().last)
    }

    // incremental join-view maintenance: scaled fact increments, the
    // UNSCALED customer dim (facts grow, dims don't) — state stays
    // O(distinct keys) so the read side should barely move
    def incJoinMaintain(o: DataFrame, fs: String, ds: String): Unit = {
      import operators.IncrementalJoinView
      val cut = lit("1995-01-01").cast("timestamp_ntz")
      IncrementalJoinView.refreshFact(
        spark, fs, o.filter(col("o_orderdate") <= cut), "o_custkey", "o_totalprice",
        batchId = Some(1L))
      IncrementalJoinView.refreshFact(
        spark, fs, o.filter(col("o_orderdate") > cut), "o_custkey", "o_totalprice",
        batchId = Some(2L))
      val c = sources.TableLoader.table(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")).withColumn("_ver", lit(1L))
      IncrementalJoinView.refreshDim(spark, ds, c, "c_custkey", "_ver")
      noop(IncrementalJoinView.read(spark, fs, ds,
        joinKey = "o_custkey", dimKey = "c_custkey", groupCol = "c_mktsegment"))
    }
    val ord01 = t01("orders"); val ord1 = spark.read.parquet(s"$outRoot/orders.parquet")
    rehearseUnit("q_inc_join") {
      incJoinMaintain(ord01, scaleScratch("ij-fact-01"), scaleScratch("ij-dim-01"))
    } { incJoinMaintain(ord1, scaleScratch("ij-fact-1"), scaleScratch("ij-dim-1")) }

    // whole-document FFD packing: sequential placement bounded
    // per-shard, corpus-linear across shards
    def ffd(docs: DataFrame): DataFrame = {
      val withTok = operators.TextAnalysis.withTokenCounts(docs)
        .select(col("doc_id"), col("lang"), col("ws_tokens").cast("long").as("n_tokens"))
      operators.Curation.packFfd(withTok,
        partitionCol = "lang", idCol = "doc_id", weightCol = "n_tokens", budget = 512L)
    }
    rehearse("text_pack_ffd", ffd(docs01), ffd(docs1))

    // persisted IVF index: build is one corpus-linear clustered write
    // (constant-size sampled training); the query side reads ONLY the
    // probed cells' partitions — the I/O pruning is quantified below
    // from the cell directory sizes
    val idx01 = scaleScratch("ivf-idx-01"); val idx1 = scaleScratch("ivf-idx-1")
    rehearseUnit("sim_ivf_index_build") {
      operators.Similarity.buildIvfIndex(emb01, idx01, nlist = 64)
    } { operators.Similarity.buildIvfIndex(emb1, idx1, nlist = 64) }
    rehearseUnit("sim_ivf_index_topk") {
      noop(operators.Similarity.ivfIndexTopK(
        spark, idx01, emb01.filter(col("vec_id") < 10), k = 5, nprobe = 8))
    } { noop(operators.Similarity.ivfIndexTopK(
        spark, idx1, emb1.filter(col("vec_id") < 10), k = 5, nprobe = 8)) }
    if (wanted("sim_ivf_index_build")) println("IVF_INDEX_IO " + ivfIndexIo(idx1, nprobe = 8))

    // 1k-merge BPE train: ONE corpus shuffle (wordCounts) + the
    // in-memory delta loop — merge depth costs driver time, not jobs
    rehearseUnit("text_bpe_merges_1k") {
      operators.Bpe.train(docs01, iters = 1000); ()
    } { operators.Bpe.train(docs1, iters = 1000); () }

    // round-10 sketch family: KMV distinct is one map-side-combined
    // O(k)-state aggregate — corpus-linear scan, constant shuffle
    val ev01 = t01("events"); val ev1 = t1("events")
    rehearse("q_approx_distinct",
      operators.Sketches.approxDistinctKmv(ev01, Seq("event_type"), "user_id"),
      operators.Sketches.approxDistinctKmv(ev1, Seq("event_type"), "user_id"))

    // incremental KMV maintenance: two batches folded into O(k)
    // versioned state — per-batch cost tracks the batch scan
    def kmvFold(ev: DataFrame, state: String): Unit = {
      (0 until 2).foreach { k =>
        operators.IncrementalAgg.refreshKmv(spark, state,
          ev.filter(col("event_id") % 2 === k), Seq("event_type"), "user_id",
          batchId = Some(k.toLong))
      }
      noop(operators.IncrementalAgg.readKmvEstimate(spark, state, Seq("event_type")))
    }
    rehearseUnit("q_kmv_inc") {
      kmvFold(ev01, scaleScratch("kmv-01"))
    } { kmvFold(ev1, scaleScratch("kmv-1")) }

    // trainable NB classifier: counting shuffle + broadcast-model
    // apply over the token stream x |classes|
    def nb(docs: DataFrame): DataFrame =
      operators.NaiveBayes.classify(
        docs.filter(col("doc_id") % 10 =!= 0), docs.filter(col("doc_id") % 10 === 0))
    rehearse("q_nb_classify", nb(docs01), nb(docs1))

    // -------------------------------------------------------------
    // Round-11 continuation ops
    // -------------------------------------------------------------

    // CUSUM: identical shuffle+fold shape to Holt — per-entity series
    // are 10x longer here (event ids shift, users don't), so the
    // ratio tracks the in-array fold cost like q_holt's
    def cusumShape(ev: DataFrame): DataFrame =
      operators.EventAnalytics.cusum(
        ev.withColumn("cents", round(col("value") * 100).cast("long")),
        "user_id", "ts", "event_id", "cents", kCents = 6000L, hCents = 20000L)
    rehearse("q_cusum", cusumShape(ev01), cusumShape(ev1))

    // link prediction: the co-occurrence threshold is a RATE, so it
    // scales with the corpus (100 -> 1000 at 10x) to hold the graph
    // comparable; hubs drop under the documented lower-bound contract
    def lpShape(docs: DataFrame, minCount: Long): DataFrame = {
      val sg = operators.TextAnalysis.skipgrams(docs, window = 2)
      val edges = sg.filter(col("a") =!= col("b"))
        .groupBy(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .agg(sum(col("n")).as("n"))
        .filter(col("n") >= minCount)
      operators.GraphAnalytics.linkPrediction(edges, "u", "v",
        maxCenterDegree = 1000, dropHubs = true)
    }
    rehearse("q_link_predict", lpShape(docs01, 100L), lpShape(docs1, 1000L))

    // retraction-aware rollup maintenance: the CDC fold shuffles the
    // CHANGE SET (map-side combined), joins touched keys, upserts —
    // state is O(distinct keys) at both scales
    def cdcFold(ev: DataFrame, state: String): Unit = {
      val keys = Seq("user_id", "event_type")
      operators.IncrementalAgg.refreshTable(spark, state, ev, keys, "value",
        batchId = Some(1L))
      val next = ev.filter(col("event_type") =!= "error" && col("event_type") =!= "purchase")
        .unionByName(ev.filter(col("event_type") === "purchase")
          .withColumn("value", col("value") * 2))
      val feed = operators.SnapshotDiff.changeFeed(ev, next, Seq("event_id"))
      operators.IncrementalAgg.refreshFromChanges(spark, state, feed, keys, "value",
        batchId = Some(2L))
      noop(operators.IncrementalAgg.readLive(spark, state, keys))
    }
    rehearseUnit("q_inc_agg_cdc") {
      cdcFold(ev01, scaleScratch("cdc-01"))
    } { cdcFold(ev1, scaleScratch("cdc-1")) }

    // bloom file index: build is one map-side-combined scan (state
    // bounded at m ints per file); the probe reads candidate files
    // only — both corpus-linear at worst
    def bloomLayout(o: DataFrame, dir: String): String = {
      o.repartition(64, col("o_orderkey")).write.mode("overwrite").parquet(dir); dir
    }
    if (wanted("q_bloom_index")) {
      val bl01 = bloomLayout(ord01, scaleScratch("bloom-01"))
      val bl1 = bloomLayout(ord1, scaleScratch("bloom-1"))
      rehearseUnit("q_bloom_index_build") {
        noop(operators.BloomFileIndex.build(spark, bl01, "o_custkey"))
      } { noop(operators.BloomFileIndex.build(spark, bl1, "o_custkey")) }
      val i01 = operators.BloomFileIndex.build(spark, bl01, "o_custkey").cache()
      val i1 = operators.BloomFileIndex.build(spark, bl1, "o_custkey").cache()
      i01.count(); i1.count()
      rehearseUnit("q_bloom_index_probe") {
        noop(operators.BloomFileIndex.prunedRead(spark, bl01, i01, "o_custkey",
          Seq(7L, 371L, 1297L)))
      } { noop(operators.BloomFileIndex.prunedRead(spark, bl1, i1, "o_custkey",
          Seq(7L, 371L, 1297L))) }
      i01.unpersist(); i1.unpersist()
    }

    // KMV audience overlap: one map-side-combined scan into two
    // k-long sketches; union/intersection are constant-size arithmetic
    def overlapShape(ev: DataFrame): DataFrame =
      operators.Sketches.kmvOverlap(ev, "event_type", "user_id", "purchase", "click", k = 64)
    rehearse("q_kmv_overlap", overlapShape(ev01), overlapShape(ev1))

    // GDPR purge: O(retained versions x snapshot bytes) BY DESIGN —
    // the erasure-from-history cost; the rehearsal confirms it stays
    // a clean rewrite (linear), not superlinear
    def purgeSetup(ev: DataFrame, state: String): String = {
      sources.UpsertWriter.upsert(ev.filter(col("event_id") % 2 === 0), state,
        Seq("event_id"), "ts", keepVersions = 3)
      sources.UpsertWriter.upsert(ev.filter(col("event_id") % 2 === 1), state,
        Seq("event_id"), "ts", keepVersions = 3)
      state
    }
    if (wanted("q_purge")) {
      val p01 = purgeSetup(ev01, scaleScratch("purge-01"))
      val p1 = purgeSetup(ev1, scaleScratch("purge-1"))
      rehearseUnit("q_purge") {
        sources.UpsertWriter.purge(spark, p01,
          ev01.filter(col("user_id") % 97 === 0).select("user_id"), Seq("user_id")); ()
      } { sources.UpsertWriter.purge(spark, p1,
          ev1.filter(col("user_id") % 97 === 0).select("user_id"), Seq("user_id")); () }
    }

    // -------------------------------------------------------------
    // Round-12 rehearsals: the 13 round-11 ops that shipped without
    // an sf1 data point, plus the new incremental bloom refresh.
    // -------------------------------------------------------------

    // hybrid RRF retrieval: each leg is its own corpus-shaped work
    // (BM25 one shuffle; brute-force cosine corpus-linear vs ONE
    // query row); fusion itself is O(k·legs) regardless of corpus
    def hybridShape(docs: DataFrame, emb: DataFrame): DataFrame = {
      val lex = operators.TextAnalysis.bm25(
        docs, queryTerms = Seq("join", "vector", "stream"), topK = 20)
        .select(col("doc_id"), col("rk"))
      val sem = operators.Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") === 0), k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rank").as("rk"))
      operators.Retrieval.rrfFuse(Seq(lex, sem), k = 10)
    }
    rehearse("q_hybrid_search", hybridShape(docs01, emb01), hybridShape(docs1, emb1))

    // position-based attribution: one lookback range join (conversions
    // × in-window touches) + per-conversion window — work tracks the
    // touch fan-in, which the 10x events grow linearly
    def attrShape(ev: DataFrame): DataFrame = {
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("conv_id"), col("user_id"),
          col("ts").as("conv_ts"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val touches = ev.filter(col("event_type").isin("click", "view", "signup"))
        .select(col("event_id").as("touch_id"), col("user_id"),
          col("ts").as("touch_ts"), col("event_type").as("channel"))
      operators.EventAnalytics.attributePositionBased(
        conv, touches, userCol = "user_id",
        convIdCol = "conv_id", convTsCol = "conv_ts", centsCol = "cents",
        touchIdCol = "touch_id", touchTsCol = "touch_ts", channelCol = "channel",
        lookback = expr("INTERVAL 7 DAYS"))
    }
    rehearse("q_attribution", attrShape(ev01), attrShape(ev1))

    // nearest as-of: ONE window over the tagged union — the same
    // single-shuffle shape as the backward as-of, at any scale
    def asofShape(ev: DataFrame): DataFrame = {
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
      operators.AsOfJoin.asofNearest(
        purchases, clicks, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts", rightPayload = Seq("ts", "event_id"))
    }
    rehearse("q_asof_nearest", asofShape(ev01), asofShape(ev1))

    // perceptual-hash near-dup: signature extraction is map-side
    // projection; the pair space is pigeonhole band buckets, never
    // all-pairs — planted near-dups double the corpus at both scales
    def phashShape(docs: DataFrame): DataFrame = {
      val reencoded = docs.select(
        (col("doc_id") + 1000000000L).as("doc_id"),
        overlay(col("text"), lit("x"), lit(1)).as("text"),
        col("source"))
      val media = operators.Multimodal.mediaFromDocuments(
        docs.select(col("doc_id"), col("text"), col("source"))
          .unionByName(reencoded)).toDF()
      operators.Dedup.phashPairs(media, "media_id", "content")
    }
    rehearse("dedup_phash", phashShape(docs01), phashShape(docs1))

    // UNPIVOT: one Expand over the 25-row aggregate — the melt is
    // free; the measured cost is the star join + agg feeding it
    def unpivotShape(o: DataFrame): DataFrame = {
      val cents = expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
      val wide = o
        .join(t01("customer"), col("o_custkey") === col("c_custkey"))
        .join(t01("nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents).cast("long").as("total_cents"),
          max(cents).as("max_cents"))
      wide.unpivot(
        Array(col("n_name")),
        Array(col("n_orders"), col("total_cents"), col("max_cents")),
        "metric", "value")
    }
    rehearse("q_unpivot", unpivotShape(ord01), unpivotShape(ord1))

    // WAP lifecycle: stage upsert + audit aggregates + one merge
    // commit — every phase corpus-linear with a constant commit tax
    def wapShape(o: DataFrame, path: String): Unit = {
      val base = o.select(
        col("o_orderkey").as("k"), col("o_custkey"),
        col("o_orderstatus").as("status"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"),
        lit(1L).as("prec"))
      sources.UpsertWriter.upsert(base, path, Seq("k"), "prec", keepVersions = 3)
      def audit(staged: DataFrame): Seq[DataFrame] = Seq(
        operators.QualityChecks.notNull(staged, "status", "status_not_null"),
        operators.QualityChecks.inRange(staged, "cents", 0, 1e12, "cents_in_range"))
      val good = base.filter(col("k") % 10 === 3)
        .withColumn("cents", col("cents") + 5L).withColumn("prec", lit(2L))
      val r = sources.Wap.writeAuditPublish(good, path, Seq("k"), "prec", audit)
      require(r.published, s"rehearsal WAP batch must publish, got $r")
    }
    rehearseUnit("q_wap_publish") {
      wapShape(ord01, scaleScratch("wap-01"))
    } { wapShape(ord1, scaleScratch("wap-1")) }

    // deep clone: pure file copy of the retained history — O(bytes)
    def cloneShape(ev: DataFrame, src: String, dst: String): Unit = {
      sources.UpsertWriter.upsert(ev.filter(col("event_id") % 2 === 0), src,
        Seq("event_id"), "ts", keepVersions = 3)
      sources.UpsertWriter.upsert(ev.filter(col("event_id") % 2 === 1), src,
        Seq("event_id"), "ts", keepVersions = 3)
      sources.TableClone.deepClone(spark, src, dst); ()
    }
    rehearseUnit("q_clone") {
      cloneShape(ev01, scaleScratch("clone-src-01"), scaleScratch("clone-dst-01"))
    } { cloneShape(ev1, scaleScratch("clone-src-1"), scaleScratch("clone-dst-1")) }

    // cardinality-guarded join: two sketch pre-pass scans (now with
    // the KMV-auto width) + the guarded join itself
    def safeShape(o: DataFrame, li: DataFrame, maxRows: Long): DataFrame =
      operators.SafeJoin.guardedEquiJoin(
        o.select(col("o_orderkey").as("k"), col("o_orderpriority")),
        li.select(col("l_orderkey").as("k"), col("l_extendedprice")),
        "k", maxRows = maxRows)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
    rehearse("q_safe_join", safeShape(ord01, li01, 10000000L),
      safeShape(ord1, li1, 100000000L))

    // k-anonymity audit: one map-side-combined shuffle of QI combos
    def kanonShape(c: DataFrame): DataFrame =
      operators.Privacy.kAnonymityAudit(
        c.withColumn("bal_band", floor(col("c_acctbal") / lit(5000.0)).cast("long")),
        Seq("c_nationkey", "c_mktsegment", "bal_band"), k = 5L)
    rehearse("q_kanon", kanonShape(cust01), kanonShape(cust1))

    // pseudonymization: a pure map-side token projection + rollup
    def pseudoShape(ev: DataFrame): DataFrame =
      operators.Privacy.pseudonymize(ev, Seq("user_id"), salt = "epoch7")
        .groupBy(col("user_id").as("user_token"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"))
    rehearse("q_pseudonymize", pseudoShape(ev01), pseudoShape(ev1))

    // group-aware k-fold: map-side hash projection + rollup
    def kfoldShape(ev: DataFrame): DataFrame =
      operators.Sampling.kFoldByGroup(ev, "user_id", k = 5)
        .groupBy(col("fold"))
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
    rehearse("q_kfold", kfoldShape(ev01), kfoldShape(ev1))

    // phonetic (soundex) blocking linkage: Σ|block|² work — the
    // 10x leg links shifted supplier copies under the same key design
    def phoneticShape(supp: DataFrame): DataFrame = {
      val base = supp
        .join(sources.TableLoader.table(spark, sfDir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("id"),
          concat(col("n_name"), lit("-"), (col("s_suppkey") % 50).cast("string")).as("name"),
          col("s_nationkey").cast("long").as("nation"),
          expr("CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").as("bal_cents"))
      val typo = base.filter(col("id") % 3 === 0).select(
        (col("id") + 1000000000L).as("id"),
        expr("substr(name, 1, 1) || replace(substr(name, 2), 'I', 'Y')").as("name"),
        col("nation"), col("bal_cents"))
      val records = base.unionByName(typo)
      val blockKeys = Seq(concat(
        operators.RecordLinkage.soundexKey("name"),
        lit(":"), col("nation").cast("string")))
      val nameDist = levenshtein(col("a_name"), col("b_name"))
      val score =
        when(nameDist === 0, 40L).when(nameDist <= 2, 25L).otherwise(0L) +
        when(col("a_nation") === col("b_nation"), 20L).otherwise(0L) +
        when(abs(col("a_bal_cents") - col("b_bal_cents")) <= 10L, 15L).otherwise(0L)
      operators.RecordLinkage.link(records, "id", blockKeys, score, threshold = 50L)
    }
    val supp01 = t01("supplier")
    val supp1 = (0 until copies).map(i => supp01.withColumn("s_suppkey",
      col("s_suppkey") + lit(i.toLong * 100000000L))).reduce(_ unionByName _)
    rehearse("q_linkage_phonetic", phoneticShape(supp01), phoneticShape(supp1))

    // distributed bloom probe (semi-join variant): same pruning, no
    // driver collect — measured on the same layouts as the build
    if (wanted("q_bloom_index_semi")) {
      val bl01 = bloomLayout(ord01, scaleScratch("bloom-semi-01"))
      val bl1 = bloomLayout(ord1, scaleScratch("bloom-semi-1"))
      val i01 = operators.BloomFileIndex.build(spark, bl01, "o_custkey").cache()
      val i1 = operators.BloomFileIndex.build(spark, bl1, "o_custkey").cache()
      i01.count(); i1.count()
      val probes = spark.range(0, 3).select(
        when(col("id") === 0, 7L).when(col("id") === 1, 371L)
          .otherwise(1297L).as("pk"))
      rehearseUnit("q_bloom_index_semi") {
        noop(operators.BloomFileIndex.prunedReadSemiJoin(
          spark, bl01, i01, "o_custkey", probes, "pk"))
      } { noop(operators.BloomFileIndex.prunedReadSemiJoin(
          spark, bl1, i1, "o_custkey", probes, "pk")) }
      i01.unpersist(); i1.unpersist()
    }

    // incremental bloom refresh: the O(changes) claim measured the
    // strongest way — the SAME-SIZED batch appends to the sf0.1 and
    // sf1 tables, so if refresh cost tracks the APPEND (not the
    // table) the ratio must stay ~1 even though the table is 10x
    if (wanted("q_bloom_refresh")) {
      def refreshSetup(o: DataFrame, dir: String, idx: String): Unit = {
        o.repartition(64, col("o_orderkey")).write.mode("overwrite").parquet(dir)
        operators.BloomFileIndex.refresh(spark, dir, idx, "o_custkey"); ()
      }
      val rb01 = scaleScratch("bloom-ref-01"); val ri01 = scaleScratch("bloom-ref-i01")
      val rb1 = scaleScratch("bloom-ref-1"); val ri1 = scaleScratch("bloom-ref-i1")
      refreshSetup(ord01, rb01, ri01)
      refreshSetup(ord1, rb1, ri1)
      val batch = ord01.withColumn("o_orderkey", col("o_orderkey") + lit(9000000000L))
      batch.repartition(8, col("o_orderkey")).write.mode("append").parquet(rb01)
      batch.repartition(8, col("o_orderkey")).write.mode("append").parquet(rb1)
      rehearseUnit("q_bloom_refresh") {
        operators.BloomFileIndex.refresh(spark, rb01, ri01, "o_custkey"); ()
      } { operators.BloomFileIndex.refresh(spark, rb1, ri1, "o_custkey"); () }
    }

    // -------------------------------------------------------------
    // Round-12 new ops: deletion vectors, MV rewrite/build/fold,
    // footer min/max, zone-map refresh. (q_stream_bloom is the
    // composition of two already-rehearsed legs — 22e ingestion +
    // 10s3 per-commit refresh — and is not re-measured separately.)
    // -------------------------------------------------------------

    // deletion vectors: mark = one scan writing positions; read =
    // scan + broadcast anti join sized by |deletes|, never the table
    if (wanted("q_deletion_vectors")) {
      def dvRun(li: DataFrame, root: String): Unit = {
        val table = root + "/t"; val dv = root + "/v"
        li.repartition(16).write.mode("overwrite").parquet(table)
        sources.DeletionVectors.markDeleted(spark, table, col("l_discount") > 0.07, dv)
        sources.DeletionVectors.markDeleted(spark, table, col("l_linenumber") >= 5, dv)
        noop(sources.DeletionVectors.read(spark, table, dv))
      }
      rehearseUnit("q_deletion_vectors") {
        dvRun(li01, scaleScratch("dv-01"))
      } { dvRun(li1, scaleScratch("dv-1")) }
    }

    // materialized views: the BUILD is corpus-shaped (one rollup
    // scan) — expected ~linear; the REWRITTEN QUERY is |groups|-
    // shaped and must be ~FLAT at 10x base size (that is the whole
    // point of an MV); the incremental FOLD takes the same-sized
    // batch against both views and must be ~flat too
    if (wanted("q_mv_rewrite")) {
      def mvBase(li: DataFrame, dir: String): String = {
        li.repartition(16).write.mode("overwrite").parquet(dir); dir
      }
      val b01 = mvBase(li01, scaleScratch("mv-b01"))
      val b1 = mvBase(li1, scaleScratch("mv-b1"))
      def defineMv(base: String, mvDir: String) =
        plans.MaterializedViews.define(spark, base,
          Seq("l_returnflag", "l_linestatus"), Seq("l_quantity", "l_extendedprice"), mvDir)
      var d01 = defineMv(b01, scaleScratch("mv-v01"))
      var d1 = defineMv(b1, scaleScratch("mv-v1"))
      rehearseUnit("q_mv_build") {
        d01 = defineMv(b01, scaleScratch("mv-v01"))
      } {
        d1 = defineMv(b1, scaleScratch("mv-v1"))
      }
      def report(base: String): DataFrame = spark.read.parquet(base)
        .where(col("l_linestatus") === "F")
        .groupBy("l_returnflag")
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"),
          min(col("l_extendedprice")).as("mn"), max(col("l_extendedprice")).as("mx"))
      rehearseUnit("q_mv_rewrite") { noop(report(b01)) } { noop(report(b1)) }
      val batch = li01.limit(200000)
      rehearseUnit("q_mv_refresh_inc") {
        plans.MaterializedViews.refreshIncremental(spark, d01, batch); ()
      } { plans.MaterializedViews.refreshIncremental(spark, d1, batch); () }
      // CDC fold: the same-sized change feed (deletes that hit group
      // extremes + inserts) against both views — sums/counts fold
      // O(feed); the targeted min/max recompute scans base rows of
      // the DIRTY groups only, so the 10x base shows up only there
      val feedSmall = li01.limit(50000)
      def cdcFeed(src: DataFrame) = src
        .withColumn("change_type",
          when(pmod(col("l_orderkey"), lit(2)) === 0, lit("delete")).otherwise(lit("insert")))
        .withColumn("l_orderkey",
          when(col("change_type") === "insert", col("l_orderkey") + lit(7000000000L))
            .otherwise(col("l_orderkey")))
      rehearseUnit("q_mv_refresh_cdc") {
        plans.MaterializedViews.refreshFromChanges(spark, d01, cdcFeed(feedSmall)); ()
      } { plans.MaterializedViews.refreshFromChanges(spark, d1, cdcFeed(feedSmall)); () }
      plans.MaterializedViews.deregister(b01)
      plans.MaterializedViews.deregister(b1)
    }

    // metadata-only min/max: cost tracks FILE COUNT (one footer read
    // per file, distributed), never data bytes — both tables written
    // at the same file count, so the ratio must be ~1 at 10x bytes
    if (wanted("q_minmax_meta")) {
      val mm01 = scaleScratch("mm-01"); val mm1 = scaleScratch("mm-1")
      li01.repartition(32).write.mode("overwrite").parquet(mm01)
      li1.repartition(32).write.mode("overwrite").parquet(mm1)
      rehearseUnit("q_minmax_meta") {
        noop(operators.ZoneMaps.minMaxFromFooters(spark, mm01, "l_orderkey"))
      } { noop(operators.ZoneMaps.minMaxFromFooters(spark, mm1, "l_orderkey")) }
    }

    // incremental zone-map refresh: the same-sized batch appends to
    // the sf0.1 and sf1 tables — if refresh cost tracks the APPEND
    // (file-list diff + scan of new files only) the ratio stays ~1
    if (wanted("q_zonemap_refresh")) {
      def zmSetup(o: DataFrame, dir: String, idx: String): Unit = {
        o.repartitionByRange(64, col("o_orderkey"))
          .write.mode("overwrite").parquet(dir)
        operators.ZoneMaps.refresh(spark, dir, idx, "o_orderkey"); ()
      }
      val zb01 = scaleScratch("zm-ref-01"); val zi01 = scaleScratch("zm-ref-i01")
      val zb1 = scaleScratch("zm-ref-1"); val zi1 = scaleScratch("zm-ref-i1")
      zmSetup(ord01, zb01, zi01)
      zmSetup(ord1, zb1, zi1)
      val zbatch = ord01.withColumn("o_orderkey", col("o_orderkey") + lit(9000000000L))
      zbatch.repartitionByRange(8, col("o_orderkey")).write.mode("append").parquet(zb01)
      zbatch.repartitionByRange(8, col("o_orderkey")).write.mode("append").parquet(zb1)
      rehearseUnit("q_zonemap_refresh") {
        operators.ZoneMaps.refresh(spark, zb01, zi01, "o_orderkey"); ()
      } { operators.ZoneMaps.refresh(spark, zb1, zi1, "o_orderkey"); () }
    }

    // -------------------------------------------------------------
    // Round-13 sweep: the round-12 ops not yet rehearsed
    // (q_time_travel_ts, q_dv_pruned, upsertChecked, q_stream_mv,
    // needsCompaction) plus the round-13 additions (join-view MV,
    // streaming retraction MV, the external Delta reader).
    // -------------------------------------------------------------

    // timestamp time travel: resolving the version is marker-mtime
    // metadata (flat); READING the resolved snapshot is linear in its
    // bytes — the honest expectation is ~bytes ratio
    if (wanted("q_time_travel_ts")) {
      def ttSetup(o: DataFrame, dir: String): Long = {
        sources.UpsertWriter.upsert(o, dir, Seq("o_orderkey"), "o_orderdate", keepVersions = 4)
        val t1 = sources.UpsertWriter.commitInstants(spark, dir).last._2
        sources.UpsertWriter.upsert(
          o.limit(10000).withColumn("o_orderkey", col("o_orderkey") + lit(9000000000L)),
          dir, Seq("o_orderkey"), "o_orderdate", keepVersions = 4)
        t1
      }
      val tt01 = scaleScratch("tt-01"); val tt1 = scaleScratch("tt-1")
      val i01 = ttSetup(ord01, tt01); val i1 = ttSetup(ord1, tt1)
      rehearseUnit("q_time_travel_ts") {
        noop(sources.UpsertWriter.readAsOf(spark, tt01, i01))
      } { noop(sources.UpsertWriter.readAsOf(spark, tt1, i1)) }
    }

    // zone-map-pruned read over a deletion-vectored table: the range
    // predicate prunes to the same few files at both scales (range-
    // clustered layout, same file count), and the DV anti join is
    // |deletes|-sized — the read must be ~FLAT at 10x table bytes
    if (wanted("q_dv_pruned")) {
      def dvpSetup(li: DataFrame, root: String): (String, String, DataFrame) = {
        val table = root + "/t"; val dv = root + "/v"
        li.repartitionByRange(64, col("l_orderkey"))
          .sortWithinPartitions(col("l_orderkey"))
          .write.mode("overwrite").parquet(table)
        sources.DeletionVectors.markDeleted(spark, table, col("l_discount") > 0.07, dv)
        val zm = operators.ZoneMaps.build(spark, table, "l_orderkey")
        (table, dv, zm)
      }
      val (t01d, dv01, zm01) = dvpSetup(li01, scaleScratch("dvp-01"))
      val (t1d, dv1, zm1) = dvpSetup(li1, scaleScratch("dvp-1"))
      rehearseUnit("q_dv_pruned") {
        noop(sources.DeletionVectors.readPruned(spark, t01d, dv01, zm01, "l_orderkey", 2000L, 9000L))
      } { noop(sources.DeletionVectors.readPruned(spark, t1d, dv1, zm1, "l_orderkey", 2000L, 9000L)) }
    }

    // constraint-gated upsert: the checks run on the (same-sized)
    // BATCH, but the COW merge reads the existing snapshot — the
    // honest expectation is ~bytes ratio for the merge leg
    if (wanted("q_upsert_checked")) {
      val uc01 = scaleScratch("uc-01"); val uc1 = scaleScratch("uc-1")
      sources.UpsertWriter.upsert(ord01, uc01, Seq("o_orderkey"), "o_orderdate")
      sources.UpsertWriter.upsert(ord1, uc1, Seq("o_orderkey"), "o_orderdate")
      val batch = ord01.limit(20000)
        .withColumn("o_orderkey", col("o_orderkey") + lit(9100000000L))
      def checks(b: DataFrame): Seq[DataFrame] = Seq(
        operators.QualityChecks.notNull(b, "o_orderkey", "key_not_null"),
        operators.QualityChecks.unique(b, Seq("o_orderkey"), "key_unique"))
      rehearseUnit("q_upsert_checked") {
        sources.UpsertWriter.upsertChecked(batch, uc01, Seq("o_orderkey"), "o_orderdate", checks)
      } { sources.UpsertWriter.upsertChecked(batch, uc1, Seq("o_orderkey"), "o_orderdate", checks) }
    }

    // compaction advisor: pure file listing at identical file counts
    // — must be FLAT however large the files got
    if (wanted("q_needs_compaction")) {
      val nc01 = scaleScratch("nc-01"); val nc1 = scaleScratch("nc-1")
      li01.repartition(64).write.mode("overwrite").parquet(nc01)
      li1.repartition(64).write.mode("overwrite").parquet(nc1)
      rehearseUnit("q_needs_compaction") {
        sources.UpsertWriter.needsCompaction(spark, nc01): Unit
      } { sources.UpsertWriter.needsCompaction(spark, nc1): Unit }
    }

    // streaming MV maintenance: 3 micro-batches (splitDir at both
    // scales), each batch 10x bigger on the sf1 leg — per-batch fold
    // is O(batch + groups), so the honest expectation is ~bytes ratio
    // (the stream machinery itself is flat per trigger)
    if (wanted("q_stream_mv")) {
      val ev01Path = s"$sfDir/events.parquet"
      val ev1Path = s"$outRoot/events.parquet"
      val split01 = streaming.EventStream.splitDir(spark, ev01Path, 3, keyCol = "event_id")
      val split1 = streaming.EventStream.splitDir(spark, ev1Path, 3, keyCol = "event_id")
      rehearseUnit("q_stream_mv") {
        val d = streaming.EventStream.streamMaintainMv(
          spark, split01, scaleScratch("smv-01") + "/t", scaleScratch("smv-01-mv"),
          Seq("user_id", "event_type"), Seq("value"), queryName = "graft_scale_smv01")
        plans.MaterializedViews.deregister(d.basePath)
      } {
        val d = streaming.EventStream.streamMaintainMv(
          spark, split1, scaleScratch("smv-1") + "/t", scaleScratch("smv-1-mv"),
          Seq("user_id", "event_type"), Seq("value"), queryName = "graft_scale_smv1")
        plans.MaterializedViews.deregister(d.basePath)
      }
    }

    // join-view MV: BUILD pays the join once (~bytes ratio); the
    // REWRITTEN report is |groups|-shaped and must be ~FLAT; the
    // fact-side fold takes the same-sized batch through the unscaled
    // dim join at both scales and must be ~flat too
    if (wanted("q_mv_join_rewrite")) {
      val jb01 = scaleScratch("mvj-b01"); val jb1 = scaleScratch("mvj-b1")
      ord01.repartition(16).write.mode("overwrite").parquet(jb01)
      ord1.repartition(16).write.mode("overwrite").parquet(jb1)
      val dimPath = scaleScratch("mvj-dim")
      t01("customer").write.mode("overwrite").parquet(dimPath) // dims don't scale
      def defineJ(base: String, mv: String) = plans.MaterializedViews.defineJoin(
        spark, base, dimPath, Seq(("o_custkey", "c_custkey")),
        Seq("c_mktsegment", "o_orderpriority"), Seq("o_totalprice"), mv)
      var dj01 = defineJ(jb01, scaleScratch("mvj-v01"))
      var dj1 = defineJ(jb1, scaleScratch("mvj-v1"))
      rehearseUnit("q_mv_join_build") {
        dj01 = defineJ(jb01, scaleScratch("mvj-v01"))
      } { dj1 = defineJ(jb1, scaleScratch("mvj-v1")) }
      def jreport(base: String): DataFrame = {
        val f = spark.read.parquet(base)
        val c = spark.read.parquet(dimPath)
        f.join(c, f("o_custkey") === c("c_custkey"))
          .where(col("o_orderpriority") === "1-URGENT")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("mn"),
            max(col("o_totalprice")).as("mx"))
      }
      rehearseUnit("q_mv_join_rewrite") { noop(jreport(jb01)) } { noop(jreport(jb1)) }
      val jbatch = ord01.limit(100000)
        .withColumn("o_orderkey", col("o_orderkey") + lit(9200000000L))
      rehearseUnit("q_mv_join_refresh_inc") {
        plans.MaterializedViews.refreshJoinIncremental(spark, dj01, jbatch): Unit
      } { plans.MaterializedViews.refreshJoinIncremental(spark, dj1, jbatch): Unit }
      plans.MaterializedViews.deregisterJoin(jb01, dimPath)
      plans.MaterializedViews.deregisterJoin(jb1, dimPath)
    }

    // streaming retraction MV: the SAME-SIZED change feed applies to
    // a 10x mirror — the COW apply leg is O(table) by design (the
    // known applyChanges cost), the MV fold legs are O(batch+groups);
    // the composed ratio sits between those two honest bounds
    if (wanted("q_stream_mv_cdc")) {
      def smcRun(ev: DataFrame, root: String, tag: String): Unit = {
        val feed = root + "/feed"; val mirror = root + "/mirror"
        val v1 = ev.filter(pmod(col("user_id"), lit(4)) === 0)
        val v2 = v1.filter(col("event_type") =!= "view")
          .withColumn("value", when(col("event_type") === "purchase", col("value") * 2)
            .otherwise(col("value")))
        operators.SnapshotDiff.changeFeed(v1, v2, Seq("event_id"))
          .repartition(3, col("event_id")).write.mode("overwrite").parquet(feed)
        sources.UpsertWriter.upsert(v1, mirror, Seq("event_id"), "ts")
        val d = streaming.TableStream.runCdcApplyWithMv(
          spark, feed, mirror, Seq("event_id"), "ts",
          Seq("user_id", "event_type"), Seq("value"), root + "/mv",
          queryName = s"graft_scale_smc_$tag")
        plans.MaterializedViews.deregister(d.basePath)
      }
      rehearseUnit("q_stream_mv_cdc") {
        smcRun(t01("events"), scaleScratch("smc-01"), "a")
      } { smcRun(t1("events"), scaleScratch("smc-1"), "b") }
    }

    // external Delta reader: snapshot is a distributed scan of the
    // active files (~bytes ratio); the log replay itself is driver
    // metadata and the incremental read of a SAME-SIZED appended
    // commit must be ~FLAT at 10x table size
    if (wanted("q_delta_snapshot")) {
      def deltaFixture(o: DataFrame, root: String): String = {
        val table = root + "/t"
        new java.io.File(table).mkdirs()
        def dataFile(df: DataFrame, name: String): Unit = {
          val tmp = table + s"/.stage-$name"
          df.coalesce(4).write.mode("overwrite").parquet(tmp)
          val parts = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet"))
          parts.zipWithIndex.foreach { case (p, i) =>
            java.nio.file.Files.copy(p.toPath,
              new java.io.File(table, s"$name-$i.parquet").toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
          val commit = parts.indices.map(i =>
            s"""{"add":{"path":"$name-$i.parquet","partitionValues":{},"size":1,""" +
              s""""modificationTime":1700000000000,"dataChange":true}}""")
          val v = new java.io.File(table, "_delta_log").listFiles() match {
            case null => 0L
            case fs => fs.count(_.getName.endsWith(".json")).toLong
          }
          val dir = new java.io.File(table, "_delta_log"); dir.mkdirs()
          val header = if (v == 0L) Seq(
            """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
            """{"metaData":{"id":"fx","format":{"provider":"parquet","options":{}},""" +
              """"schemaString":"{\"type\":\"struct\",\"fields\":[]}",""" +
              """"partitionColumns":[],"configuration":{},"createdTime":0}}""") else Nil
          val w = new java.io.PrintWriter(new java.io.File(dir, f"$v%020d.json"), "UTF-8")
          try (header ++ commit).foreach(w.println) finally w.close()
        }
        dataFile(o, "base")
        table
      }
      val dt01 = deltaFixture(ord01, scaleScratch("delta-01"))
      val dt1 = deltaFixture(ord1, scaleScratch("delta-1"))
      rehearseUnit("q_delta_snapshot") {
        noop(sources.DeltaTableReader.snapshot(spark, dt01))
      } { noop(sources.DeltaTableReader.snapshot(spark, dt1)) }
      // same-sized appended commit on both tables: flat incremental
      val inc = ord01.limit(50000).withColumn("o_orderkey", col("o_orderkey") + lit(9300000000L))
      // append as commit 1 on both (helper writes the next version)
      Seq(dt01, dt1).foreach { t =>
        val tmp = t + "/.stage-inc"
        inc.coalesce(2).write.mode("overwrite").parquet(tmp)
        val parts = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet"))
        parts.zipWithIndex.foreach { case (p, i) =>
          java.nio.file.Files.copy(p.toPath, new java.io.File(t, s"inc-$i.parquet").toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        val w = new java.io.PrintWriter(new java.io.File(t + "/_delta_log", f"${1L}%020d.json"), "UTF-8")
        try parts.indices.foreach(i => w.println(
          s"""{"add":{"path":"inc-$i.parquet","partitionValues":{},"size":1,""" +
            s""""modificationTime":1700000000001,"dataChange":true}}""")) finally w.close()
      }
      rehearseUnit("q_delta_incremental") {
        noop(sources.DeltaTableReader.incrementalSince(spark, dt01, 0L))
      } { noop(sources.DeltaTableReader.incrementalSince(spark, dt1, 0L)) }
    }

    // external Hudi COW reader: snapshot scans the active slices
    // (~bytes ratio); the incremental read of a SAME-SIZED later
    // commit touches only that commit's file groups — ~flat at 10x
    if (wanted("q_hudi_snapshot")) {
      def hudiFixture(o: DataFrame, root: String): String = {
        val table = root + "/t"
        new java.io.File(table).mkdirs()
        def baseFile(df: DataFrame, instant: String, fid: String): String = {
          val tmp = table + s"/.stage-$fid"
          df.withColumn("_hoodie_commit_time", lit(instant))
            .coalesce(4).write.mode("overwrite").parquet(tmp)
          val parts = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet"))
          parts.zipWithIndex.map { case (p, i) =>
            val name = s"${fid}_$i-0-0_$instant.parquet"
            java.nio.file.Files.copy(p.toPath, new java.io.File(table, name).toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            s"""{"fileId":"$fid-$i","path":"$name","numWrites":1,"numUpdateWrites":0,"totalWriteBytes":1,"prevCommit":"null"}"""
          }.mkString(",")
        }
        def commit(instant: String, stats: String): Unit = {
          val dir = new java.io.File(table, ".hoodie"); dir.mkdirs()
          val w = new java.io.PrintWriter(new java.io.File(dir, s"$instant.commit"), "UTF-8")
          try w.println(s"""{"partitionToWriteStats":{"":[$stats]},"operationType":"UPSERT"}""")
          finally w.close()
        }
        commit("20240101090000", baseFile(o, "20240101090000", "base"))
        commit("20240102090000",
          baseFile(o.limit(50000).withColumn("o_orderkey", col("o_orderkey") + lit(9400000000L)),
            "20240102090000", "inc"))
        table
      }
      val ht01 = hudiFixture(ord01, scaleScratch("hudi-01"))
      val ht1 = hudiFixture(ord1, scaleScratch("hudi-1"))
      rehearseUnit("q_hudi_snapshot") {
        noop(sources.HudiTableReader.snapshot(spark, ht01))
      } { noop(sources.HudiTableReader.snapshot(spark, ht1)) }
      rehearseUnit("q_hudi_incremental") {
        noop(sources.HudiTableReader.incrementalSince(spark, ht01, "20240101090000"))
      } { noop(sources.HudiTableReader.incrementalSince(spark, ht1, "20240101090000")) }
    }

    // external Iceberg reader: snapshot scans the live files (~bytes
    // ratio); the incremental read of a SAME-SIZED appended snapshot
    // reads that snapshot's manifests only — ~flat at 10x
    if (wanted("q_iceberg_snapshot")) {
      def iceFixture(o: DataFrame, root: String): String = {
        val table = root + "/t"
        val listSchema = new org.apache.avro.Schema.Parser().parse(
          """{"type":"record","name":"manifest_file","fields":[
            |{"name":"manifest_path","type":"string"},
            |{"name":"manifest_length","type":"long","default":0},
            |{"name":"added_snapshot_id","type":["null","long"],"default":null},
            |{"name":"content","type":"int","default":0}]}""".stripMargin)
        val entrySchema = new org.apache.avro.Schema.Parser().parse(
          """{"type":"record","name":"manifest_entry","fields":[
            |{"name":"status","type":"int"},
            |{"name":"snapshot_id","type":["null","long"],"default":null},
            |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
            |  {"name":"content","type":"int","default":0},
            |  {"name":"file_path","type":"string"},
            |  {"name":"file_format","type":"string","default":"PARQUET"},
            |  {"name":"record_count","type":"long","default":0}]}}]}""".stripMargin)
        def avro(path: String, schema: org.apache.avro.Schema,
            rs: Seq[org.apache.avro.generic.GenericRecord]): Unit = {
          val f = new java.io.File(path); f.getParentFile.mkdirs()
          val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
            new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
          w.create(schema, f)
          try rs.foreach(w.append) finally w.close()
        }
        def entry(snapId: Long, path: String) = {
          val df = new org.apache.avro.generic.GenericData.Record(
            entrySchema.getField("data_file").schema())
          df.put("content", 0); df.put("file_path", path)
          df.put("file_format", "PARQUET"); df.put("record_count", 1L)
          val r = new org.apache.avro.generic.GenericData.Record(entrySchema)
          r.put("status", 1); r.put("snapshot_id", snapId); r.put("data_file", df)
          r
        }
        def listRec(mp: String, addedBy: Long) = {
          val r = new org.apache.avro.generic.GenericData.Record(listSchema)
          r.put("manifest_path", mp); r.put("manifest_length", 1024L)
          r.put("added_snapshot_id", addedBy); r.put("content", 0)
          r
        }
        def dataFiles(df: DataFrame, prefix: String): Seq[String] = {
          val tmp = table + s"/.stage-$prefix"
          df.coalesce(4).write.mode("overwrite").parquet(tmp)
          val parts = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet"))
          parts.zipWithIndex.map { case (p, i) =>
            val rel = s"data/$prefix-$i.parquet"
            val dst = new java.io.File(table, rel)
            dst.getParentFile.mkdirs()
            java.nio.file.Files.copy(p.toPath, dst.toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            rel
          }.toSeq
        }
        val base = dataFiles(o, "base")
        val inc = dataFiles(
          o.limit(50000).withColumn("o_orderkey", col("o_orderkey") + lit(9500000000L)), "inc")
        avro(s"$table/metadata/m1.avro", entrySchema, base.map(entry(1L, _)))
        avro(s"$table/metadata/m2.avro", entrySchema, inc.map(entry(2L, _)))
        avro(s"$table/metadata/snap-1.avro", listSchema, Seq(listRec("metadata/m1.avro", 1L)))
        avro(s"$table/metadata/snap-2.avro", listSchema,
          Seq(listRec("metadata/m1.avro", 1L), listRec("metadata/m2.avro", 2L)))
        val w = new java.io.PrintWriter(new java.io.File(s"$table/metadata", "v2.metadata.json"), "UTF-8")
        try w.println(
          s"""{"format-version":2,"table-uuid":"fx","location":"$table","current-snapshot-id":2,""" +
            """"snapshots":[""" +
            """{"snapshot-id":1,"timestamp-ms":1,"summary":{"operation":"append"},"manifest-list":"metadata/snap-1.avro"},""" +
            """{"snapshot-id":2,"parent-snapshot-id":1,"timestamp-ms":2,"summary":{"operation":"append"},"manifest-list":"metadata/snap-2.avro"}]}""")
        finally w.close()
        val h = new java.io.PrintWriter(new java.io.File(s"$table/metadata", "version-hint.text"), "UTF-8")
        try h.println("2") finally h.close()
        table
      }
      val it01 = iceFixture(ord01, scaleScratch("ice-01"))
      val it1 = iceFixture(ord1, scaleScratch("ice-1"))
      rehearseUnit("q_iceberg_snapshot") {
        noop(sources.IcebergTableReader.snapshot(spark, it01))
      } { noop(sources.IcebergTableReader.snapshot(spark, it1)) }
      rehearseUnit("q_iceberg_incremental") {
        noop(sources.IcebergTableReader.incrementalSince(spark, it01, 1L))
      } { noop(sources.IcebergTableReader.incrementalSince(spark, it1, 1L)) }
    }

    // ---- round 14: interop depth ----

    // Delta DV read: the data scan is ~bytes ratio; DV decode +
    // anti join are bounded by |deleted positions| (~1% here), so the
    // composed read must stay ~bytes-ratio at 10x
    if (wanted("q_delta_dv") || wanted("q_external_time_travel")) {
      def dvFixture(o: DataFrame, root: String): String = {
        val table = root + "/t"
        sources.DeltaTableWriter.create(o, table)
        val files = sources.DeltaTableReader.activeFiles(spark, table)
        val byName = files.map(f => f.path.split('/').last -> f.path).toMap
        // ~1% of rows marked deleted, positions off the scan's own metadata
        val hit = spark.read.parquet(files.map(f => s"$table/${f.path}"): _*)
          .where(pmod(col("o_orderkey"), lit(97)) === 0)
          .select(col("_metadata.file_path").as("f"), col("_metadata.row_index").as("p"))
          .collect()
          .groupBy(r => byName(r.getString(0).split('/').last))
          .map { case (rel, rows) => rel -> rows.map(_.getLong(1)).toSeq }
        val conf = spark.sparkContext.hadoopConfiguration
        val rels = hit.keys.toSeq.sorted
        val descs = sources.DeltaDv.writeSidecar(conf, table, rels.map(hit))
        val lines = rels.zip(descs).flatMap { case (rel, d) =>
          Seq(
            s"""{"remove":{"path":"$rel","deletionTimestamp":1,"dataChange":true}}""",
            s"""{"add":{"path":"$rel","partitionValues":{},"size":1,"modificationTime":1,""" +
              s""""dataChange":true,"deletionVector":${sources.DeltaDv.descriptorJson(d)}}}""")
        }
        val w = new java.io.PrintWriter(
          new java.io.File(s"$table/_delta_log", f"${1L}%020d.json"), "UTF-8")
        try lines.foreach(w.println) finally w.close()
        table
      }
      val dv01 = dvFixture(ord01, scaleScratch("dv-01"))
      val dv1 = dvFixture(ord1, scaleScratch("dv-1"))
      rehearseUnit("q_delta_dv") {
        noop(sources.DeltaTableReader.snapshot(spark, dv01))
      } { noop(sources.DeltaTableReader.snapshot(spark, dv1)) }
      // VERSION AS OF 0 on the same tables: replay cut is driver
      // metadata; the scan is the same files pre-DV — ~bytes ratio
      rehearseUnit("q_external_time_travel") {
        noop(sources.DeltaTableReader.snapshotAsOf(spark, dv01, 0L))
      } { noop(sources.DeltaTableReader.snapshotAsOf(spark, dv1, 0L)) }
    }

    // Delta writer: distributed parquet write + driver commit of
    // |files| add actions — ~bytes ratio end-to-end
    if (wanted("q_delta_write")) {
      rehearseUnit("q_delta_write") {
        val t = scaleScratch("dwr-01") + "/t"
        sources.DeltaTableWriter.create(ord01, t)
        noop(sources.DeltaTableReader.snapshot(spark, t))
      } {
        val t = scaleScratch("dwr-1") + "/t"
        sources.DeltaTableWriter.create(ord1, t)
        noop(sources.DeltaTableReader.snapshot(spark, t))
      }
    }

    // Hudi writer: same shape as the Delta writer — ~bytes ratio
    if (wanted("q_hudi_write")) {
      rehearseUnit("q_hudi_write") {
        val t = scaleScratch("hwr-01") + "/t"
        sources.HudiTableWriter.create(ord01, t)
        noop(sources.HudiTableReader.snapshot(spark, t))
      } {
        val t = scaleScratch("hwr-1") + "/t"
        sources.HudiTableWriter.create(ord1, t)
        noop(sources.HudiTableReader.snapshot(spark, t))
      }
    }

    // Hudi MOR read-optimized: base files only — the log entry adds
    // O(1) timeline metadata, the read is ~bytes of the base files
    if (wanted("q_hudi_mor_ro")) {
      def morFixture(o: DataFrame, root: String): String = {
        val t = root + "/t"
        val c1 = sources.HudiTableWriter.create(o, t)
        // a deltacommit whose writes are log files only (opaque to RO)
        new java.io.File(t, s".g1_$c1.log.1_0-0-0").createNewFile()
        val w = new java.io.PrintWriter(
          new java.io.File(s"$t/.hoodie", s"${c1}1.deltacommit"), "UTF-8")
        try w.println(
          s"""{"partitionToWriteStats":{"":[{"fileId":"g1","path":".g1_$c1.log.1_0-0-0",""" +
            s""""numWrites":1,"numUpdateWrites":1,"totalWriteBytes":1,"prevCommit":"$c1"}]},""" +
            s""""operationType":"UPSERT"}""")
        finally w.close()
        t
      }
      val m01 = morFixture(ord01, scaleScratch("mor-ro-01"))
      val m1 = morFixture(ord1, scaleScratch("mor-ro-1"))
      rehearseUnit("q_hudi_mor_ro") {
        noop(sources.HudiTableReader.readOptimized(spark, m01))
      } { noop(sources.HudiTableReader.readOptimized(spark, m1)) }
    }

    // Iceberg position deletes: data scan ~bytes; the delete-file
    // scan + anti join are bounded by |deleted positions| (~1%)
    if (wanted("q_iceberg_pos_delete")) {
      def posDelFixture(o: DataFrame, root: String): String = {
        val table = root + "/t"
        // data parquet via a stage write
        val stage = table + "/.stage"
        o.coalesce(4).write.mode("overwrite").parquet(stage)
        val parts = new java.io.File(stage).listFiles().filter(_.getName.endsWith(".parquet"))
        val rels = parts.zipWithIndex.map { case (p, i) =>
          val rel = s"data/base-$i.parquet"
          val dst = new java.io.File(table, rel); dst.getParentFile.mkdirs()
          java.nio.file.Files.copy(p.toPath, dst.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          rel
        }.toSeq
        // ~1% position deletes, file_path kept relative like the manifests
        spark.read.parquet(rels.map(r => s"$table/$r"): _*)
          .where(pmod(col("o_orderkey"), lit(97)) === 0)
          .select(
            concat(lit("data/"),
              element_at(split(col("_metadata.file_path"), "/"), -1)).as("file_path"),
            col("_metadata.row_index").as("pos"))
          .coalesce(1).write.mode("overwrite").parquet(table + "/.delstage")
        val delSrc = new java.io.File(table + "/.delstage").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.copy(delSrc.toPath,
          new java.io.File(s"$table/data", "del.parquet").toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        // minimal avro metadata (same record shapes the reader spec locks)
        val listSchema = new org.apache.avro.Schema.Parser().parse(
          """{"type":"record","name":"manifest_file","fields":[
            |{"name":"manifest_path","type":"string"},
            |{"name":"added_snapshot_id","type":["null","long"],"default":null},
            |{"name":"content","type":"int","default":0}]}""".stripMargin)
        val entrySchema = new org.apache.avro.Schema.Parser().parse(
          """{"type":"record","name":"manifest_entry","fields":[
            |{"name":"status","type":"int"},
            |{"name":"snapshot_id","type":["null","long"],"default":null},
            |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
            |  {"name":"content","type":"int","default":0},
            |  {"name":"file_path","type":"string"}]}}]}""".stripMargin)
        def avro(path: String, schema: org.apache.avro.Schema,
            rs: Seq[org.apache.avro.generic.GenericRecord]): Unit = {
          val f = new java.io.File(path); f.getParentFile.mkdirs()
          val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
            new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
          w.create(schema, f)
          try rs.foreach(w.append) finally w.close()
        }
        def entry(path: String, content: Int) = {
          val df = new org.apache.avro.generic.GenericData.Record(
            entrySchema.getField("data_file").schema())
          df.put("content", content); df.put("file_path", path)
          val r = new org.apache.avro.generic.GenericData.Record(entrySchema)
          r.put("status", 1); r.put("snapshot_id", 1L); r.put("data_file", df)
          r
        }
        def lrec(mp: String, content: Int) = {
          val r = new org.apache.avro.generic.GenericData.Record(listSchema)
          r.put("manifest_path", mp); r.put("added_snapshot_id", 1L); r.put("content", content)
          r
        }
        avro(s"$table/metadata/m1.avro", entrySchema, rels.map(entry(_, 0)))
        avro(s"$table/metadata/md.avro", entrySchema, Seq(entry("data/del.parquet", 1)))
        avro(s"$table/metadata/snap-1.avro", listSchema,
          Seq(lrec("metadata/m1.avro", 0), lrec("metadata/md.avro", 1)))
        val w = new java.io.PrintWriter(new java.io.File(s"$table/metadata", "v1.metadata.json"), "UTF-8")
        try w.println(
          s"""{"format-version":2,"table-uuid":"fx","location":"$table","current-snapshot-id":1,""" +
            """"snapshots":[{"snapshot-id":1,"timestamp-ms":1,"summary":{"operation":"delete"},"manifest-list":"metadata/snap-1.avro"}]}""")
        finally w.close()
        val h = new java.io.PrintWriter(new java.io.File(s"$table/metadata", "version-hint.text"), "UTF-8")
        try h.println("1") finally h.close()
        table
      }
      val p01 = posDelFixture(ord01, scaleScratch("icepd-01"))
      val p1 = posDelFixture(ord1, scaleScratch("icepd-1"))
      rehearseUnit("q_iceberg_pos_delete") {
        noop(sources.IcebergTableReader.snapshot(spark, p01))
      } { noop(sources.IcebergTableReader.snapshot(spark, p1)) }
    }

    // Iceberg writer: distributed write + driver manifest/metadata
    // commit bounded by |files| — ~bytes ratio
    if (wanted("q_iceberg_write")) {
      rehearseUnit("q_iceberg_write") {
        val t = scaleScratch("iwr-01") + "/t"
        sources.IcebergTableWriter.create(ord01, t)
        noop(sources.IcebergTableReader.snapshot(spark, t))
      } {
        val t = scaleScratch("iwr-1") + "/t"
        sources.IcebergTableWriter.create(ord1, t)
        noop(sources.IcebergTableReader.snapshot(spark, t))
      }
    }

    // streaming Delta sink: per-batch append + txn-watermark probe;
    // batches are 10x bigger on the sf1 leg, batch count fixed
    if (wanted("q_stream_delta_sink")) {
      def sinkRun(src: String, root: String): Unit = {
        val t = root + "/t"
        streaming.DeltaSink.streamEventsToDelta(spark, src, t, "graft-scale-sink",
          queryName = "graft_scale_dsink_" +
            java.util.UUID.randomUUID().toString.replace("-", ""))
        noop(sources.DeltaTableReader.snapshot(spark, t))
      }
      val src01 = streaming.EventStream.streamableDir(spark, s"$sfDir/events.parquet")
      val src1 = streaming.EventStream.streamableDir(spark, s"$outRoot/events.parquet")
      rehearseUnit("q_stream_delta_sink") {
        sinkRun(src01, scaleScratch("dsink-01"))
      } { sinkRun(src1, scaleScratch("dsink-1")) }
    }

    // format-agnostic CDC open on a graft table: the feed is one
    // full-outer join of the two snapshots — ~bytes ratio
    if (wanted("q_open_incremental")) {
      def openIncRun(ev: DataFrame, root: String): Unit = {
        val t = root + "/t"
        sources.UpsertWriter.upsert(ev, t, Seq("event_id"), "ts", keepVersions = 3)
        sources.UpsertWriter.upsert(
          ev.filter(col("event_type") === "purchase")
            .withColumn("value", col("value") * 2)
            .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR")),
          t, Seq("event_id"), "ts", keepVersions = 3)
        noop(sources.TableLoader.openIncremental(spark, t, "1"))
      }
      rehearseUnit("q_open_incremental") {
        openIncRun(t01("events"), scaleScratch("openinc-01"))
      } { openIncRun(t1("events"), scaleScratch("openinc-1")) }
    }

    // round-15 interop additions: each QueryDef runs UNCHANGED on the
    // sf0.1 dir and the derived-sf1 dir (same table file names), so
    // the rehearsal times the full fixture-build + read lifecycle —
    // MOR log merge/compaction, Delta change feed + DV-delete writer,
    // columnMapping reads, Iceberg equality deletes and the
    // partitioned writer's manifest pruning
    Seq("q_hudi_mor_snapshot", "q_hudi_mor_write", "q_hudi_mor_incremental",
      "q_hudi_part_write", "q_delta_cdc", "q_delta_colmap", "q_delta_skipping",
      "q_iceberg_eq_delete", "q_iceberg_part_write", "q_iceberg_del_write",
      "q_delta_dv_write", "q_format_convert",
      "q_delta_upsert", "q_hudi_upsert", "q_iceberg_upsert",
      "q_mirror_pipeline", "q_iceberg_cdc", "q_delta_colmap_id",
      "q_stream_iceberg_sink", "q_stream_hudi_sink",
      "q_delta_v2_checkpoint", "q_uniform_mirror", "q_iceberg_skipping",
      "q_delta_restore", "q_iceberg_tag", "q_hudi_mor_upsert", "q_delta_cdf_write", "q_hudi_cdc",
      // round-16 additions: transform partitioning, archived-timeline
      // read, additive evolution, cdc-image write+serve
      "q_iceberg_transform_write", "q_hudi_archived", "q_delta_schema_evolve",
      "q_hudi_cdc_write", "q_hudi_skipping", "q_delta_colmap_write",
      "q_hudi_schema_evolve", "q_iceberg_dv_write", "q_budget_select",
      "q_hudi_record_index", "q_iceberg_rename", "q_delta_rename",
      // round-17 additions: incremental metadata-index maintenance
      // (refresh cost must stay flat in table size — the refreshes
      // scan only touched groups / new files by require-proven
      // contract), the MOR metadata lift (log-aware record index,
      // group-grained col-stats, schema evolution), nested columns
      // across the adapters, mapped-Delta writes, bloom-accelerated
      // upserts
      // (q_delta_colmap_write / q_delta_colmap_id already rehearse in
      // the common block above — not repeated here)
      "q_hudi_ridx_inc", "q_hudi_cstats_inc",
      "q_hudi_ridx_mor", "q_hudi_cstats_mor", "q_hudi_schema_evolve_mor",
      "q_delta_nested", "q_iceberg_nested", "q_hudi_nested",
      // inspection views: metadata-only by require — the rows prove it
      "q_iceberg_meta", "q_hudi_timeline", "q_delta_history",
      // round-18: type promotion (int-created half + long-appended
      // half served widened — the scan-side widening cost is what the
      // ratio shows)
      "q_iceberg_promote",
      // round-19: the clustered-layout family — Delta clusterBy +
      // checkpoint-served domain, Iceberg declared sort order, and
      // the log-compaction read that must hold replay flat; each
      // fixture's range shuffle is the dominant cost and scales with
      // rows, the metadata legs must not
      "q_delta_cluster", "q_iceberg_sorted", "q_delta_log_compact",
      // row tracking's id arithmetic is column math over a broadcast
      // |files| map (scales with rows only through the scan); the
      // partition-stats census is O(manifest entries) driver work
      "q_delta_rowids", "q_iceberg_pstats")
      .foreach { name =>
        rehearseUnit(name) { noop(Queries.all(name).run(spark, sfDir)) } {
          noop(Queries.all(name).run(spark, outRoot))
        }
      }

    // round-18: the Hudi bloom-filter index tradeoff DECOMPOSED (r17
    // verdict: "the maintenance write should be measured separately
    // from the probe win"). Three units on identical COW tables:
    // the upsert WITHOUT the index (every group joins the
    // key-matching scan), the index MAINTENANCE write alone, and the
    // same upsert WITH the index present (provably-absent groups
    // prune before any I/O). The tradeoff is visible per-SF: at sf0.1
    // the build costs more than it saves; at sf1 the probe win pays.
    // gate on the UNIT names themselves (a one-unit subset builds the
    // shared fixtures and re-measures exactly that unit; the full run
    // wants them all)
    if (Seq("q_hudi_upsert_noidx", "q_hudi_bloom_maint", "q_hudi_upsert_idx")
        .exists(wanted)) {
      import graft.sources.HudiTableWriter
      def cowTable(o: DataFrame, dir: String): String = {
        HudiTableWriter.create(o.repartition(16), dir,
          tableName = "orders_bloom", recordKeys = Seq("o_orderkey")); dir
      }
      def batch(o: DataFrame): DataFrame =
        o.filter(col("o_orderkey") % 997 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
      val n01 = cowTable(ord01, scaleScratch("hbloom-noidx-01"))
      val n1 = cowTable(ord1, scaleScratch("hbloom-noidx-1"))
      rehearseUnit("q_hudi_upsert_noidx") {
        { HudiTableWriter.upsert(batch(ord01), n01); () }
      } { { HudiTableWriter.upsert(batch(ord1), n1); () } }
      val i01 = cowTable(ord01, scaleScratch("hbloom-idx-01"))
      val i1 = cowTable(ord1, scaleScratch("hbloom-idx-1"))
      rehearseUnit("q_hudi_bloom_maint") {
        { HudiTableWriter.writeBloomIndex(spark, i01); () }
      } { { HudiTableWriter.writeBloomIndex(spark, i1); () } }
      // a subset skipping the maint unit still needs the index ON the
      // tables before the with-index upsert measures (untimed here)
      if (!wanted("q_hudi_bloom_maint") && wanted("q_hudi_upsert_idx")) {
        HudiTableWriter.writeBloomIndex(spark, i01): Unit
        HudiTableWriter.writeBloomIndex(spark, i1): Unit
      }
      rehearseUnit("q_hudi_upsert_idx") {
        { HudiTableWriter.upsert(batch(ord01), i01); () }
      } { { HudiTableWriter.upsert(batch(ord1), i1); () } }
    }

    println("SCALE_DONE " + out.result().mkString("[", ",", "]"))
    spark.stop()
  }

  /** Fresh state dir for a stateful rehearsal run. */
  private def scaleScratch(name: String): String = {
    val f = new java.io.File(s"/root/repo/target/scale-tmp/$name")
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
      x.delete(); ()
    }
    if (f.exists()) rm(f)
    f.mkdirs()
    f.getPath
  }

  /** Quantify the persisted index's partition pruning from the cell
    * directory layout: bytes a nprobe-cell query plans in vs the
    * whole index (cells are near-balanced, so probed bytes ≈
    * nprobe/nlist of the total — reported measured, not assumed).
    */
  private def ivfIndexIo(indexPath: String, nprobe: Int): String = {
    val cells = Option(new java.io.File(s"$indexPath/corpus").listFiles())
      .getOrElse(Array.empty).filter(f => f.isDirectory && f.getName.startsWith("cell="))
    def bytes(d: java.io.File): Long =
      Option(d.listFiles()).getOrElse(Array.empty).filter(_.isFile).map(_.length()).sum
    val sizes = cells.map(bytes).sorted
    val total = sizes.sum
    val probed = sizes.takeRight(nprobe).sum // worst case: the biggest cells
    f"""{"n_cells":${sizes.length},"total_mb":${total / 1e6}%.1f,"worst_${nprobe}_probed_mb":${probed / 1e6}%.1f,"probed_frac":${probed.toDouble / total}%.3f}"""
  }

  private def windowRunning(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("ts"), col("event_id"), col("value"),
      sum(col("value")).over(w).as("running_value"),
      row_number().over(w).as("rn"))
  }

  private def starJoin(spark: SparkSession, li: DataFrame, o: DataFrame, sfDir: String): DataFrame = {
    val c = sources.TableLoader.table(spark, sfDir, "customer")
    val n = sources.TableLoader.table(spark, sfDir, "nation")
    val r = sources.TableLoader.table(spark, sfDir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("revenue"))
  }

  /** Derive the ~10× dataset: shifted keys, per-epoch text marker,
    * per-epoch embedding perturbation; dims untouched (read from the
    * source dir at run time).
    */
  private def buildScaled(spark: SparkSession, sfDir: String, outRoot: String, copies: Int): Unit = {
    def epochs(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(i => f(df, i)).reduce(_ unionByName _)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    epochs(docs, (d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
        .withColumn("text",
          if (i == 0) col("text") else concat(col("text"), lit(s" epoch$i"))))
      .repartition(32).write.mode("overwrite").parquet(s"$outRoot/documents.parquet")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    epochs(emb, (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else transform(col("embedding"), (x, idx) =>
            when(idx === 0, x + lit(i * 1e-3f)).otherwise(x))))
      .repartition(32).write.mode("overwrite").parquet(s"$outRoot/embeddings.parquet")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    epochs(li, (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 100000000L)))
      .repartition(32).write.mode("overwrite").parquet(s"$outRoot/lineitem.parquet")

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    epochs(orders, (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 100000000L)))
      .repartition(32).write.mode("overwrite").parquet(s"$outRoot/orders.parquet")

    val events = spark.read.parquet(s"$sfDir/events.parquet")
    epochs(events, (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i.toLong * 100000000L)))
      .repartition(32).write.mode("overwrite").parquet(s"$outRoot/events.parquet")
  }
}
