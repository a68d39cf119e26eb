package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch-curation operators: blocklist filtering, group-balanced
  * capping, TF-IDF keyword extraction.
  */
class CurationSpec extends SparkSpec {

  test("dropBlockedSources equals the literal NOT IN filter and is an anti join") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "srcA"), (2L, "srcB"), (3L, "srcA"), (4L, "srcC"))
      .toDF("doc_id", "source")
    val block = Seq("srcA").toDF("b")
    val out = Curation.dropBlockedSources(docs, "source", block, "b")
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
    assert(out.queryExecution.executedPlan.treeString.contains("LeftAnti"))
  }

  test("capPerGroup keeps exactly min(k, group size) rows, lowest order keys first") {
    val s = spark; import s.implicits._
    val df = Seq(("en", 5L), ("en", 1L), ("en", 3L), ("de", 9L), ("de", 2L))
      .toDF("lang", "doc_id")
    val out = Sampling.capPerGroup(df, "lang", "doc_id", k = 2)
      .select("lang", "doc_id", "grp_seq")
      .as[(String, Long, Int)].collect().toSet
    assert(out == Set(("en", 1L, 1), ("en", 3L, 2), ("de", 2L, 1), ("de", 9L, 2)))
  }

  test("capPerGroup rejects non-positive k") {
    val s = spark; import s.implicits._
    intercept[IllegalArgumentException] {
      Sampling.capPerGroup(Seq(("a", 1L)).toDF("g", "id"), "g", "id", k = 0)
    }
  }

  test("tfIdf: hand-computed scores, deterministic tie-break on term") {
    val docs = docsDf(Seq((1L, "a b a"), (2L, "a c"), (3L, "c c d")))
    val out = TextAnalysis.tfIdf(docs, topK = 2)
      .select("doc_id", "rk", "term", "tfidf")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3))).toSet
    // n=3; df: a=2 b=1 c=2 d=1. Ties (3.0) break on term asc.
    assert(out == Set(
      (1L, 1, "a", 3.0), (1L, 2, "b", 3.0),
      (2L, 1, "a", 1.5), (2L, 2, "c", 1.5),
      (3L, 1, "c", 3.0), (3L, 2, "d", 3.0)))
  }

  test("decontaminate flags exactly the train docs sharing an n-gram with the test set") {
    val train = docsDf(Seq(
      (1L, "the quick brown fox jumps over it"), // shares "quick brown fox" with test 100
      (2L, "completely different words here entirely"),
      (3L, "quick brown fox quick brown fox again"))) // same shared 3-gram, twice (distinct once)
    val test = docsDf(Seq(
      (100L, "a quick brown fox appeared"),
      (101L, "nothing in common at all")))
    val out = Curation.decontaminate(train, test, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 3 shares two distinct 3-grams: "quick brown fox" and "brown fox quick"? no —
    // its grams: [quick brown fox, brown fox quick, fox quick brown, quick brown fox,
    // brown fox again...]; only "quick brown fox" exists in test 100.
    assert(out == Set((1L, 1L, 1L), (3L, 1L, 1L)))
  }

  test("keepBestPerCluster: argmax-quality survivor per component; greedy pair-drop would lose it") {
    val s = spark
    import s.implicits._
    // chain cluster 1-2-3 (pairs (1,2),(2,3)): best quality is doc 2.
    // greedy min-id pair-drop keeps 1 and drops 2 and 3 — the policy
    // difference this operator exists for.
    val docs = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val quality = Seq((1L, 10L), (2L, 99L), (3L, 50L), (9L, 7L)).toDF("doc_id", "q_score")
    val kept = Curation.keepBestPerCluster(docs, pairs, quality)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == Set((2L, 99L), (9L, 7L)), s"got $kept")
    // quality tie breaks to the lowest id
    val tied = Seq((1L, 50L), (2L, 50L), (3L, 50L), (9L, 7L)).toDF("doc_id", "q_score")
    val keptTied = Curation.keepBestPerCluster(docs, pairs, tied)
      .collect().map(_.getLong(0)).toSet
    assert(keptTied == Set(1L, 9L))
  }

  test("pack lays docs end-to-end and cuts at the budget") {
    val s = spark; import s.implicits._
    val df = Seq(("en", 1L, 300L), ("en", 2L, 300L), ("en", 3L, 100L), ("de", 9L, 600L))
      .toDF("lang", "doc_id", "n_tokens")
    val out = Curation.pack(df, "lang", "doc_id", "n_tokens", budget = 512L)
      .select("doc_id", "pack_id", "pack_off")
      .as[(Long, Long, Long)].collect().toSet
    // en stream offsets: doc1@0 -> pack0, doc2@300 -> pack0 off300, doc3@600 -> pack1 off88
    assert(out == Set((1L, 0L, 0L), (2L, 0L, 300L), (3L, 1L, 88L), (9L, 0L, 0L)))
  }

  test("repetitionMetrics: hand-computed duplicate 3-gram counts") {
    val docs = docsDf(Seq(
      (1L, "a b a b a b"),  // grams: aba, bab, aba, bab -> 4 total, 2 distinct
      (2L, "x y"),          // too short: dropped
      (3L, "p q r s")))     // pqr, qrs -> no dups
    val out = TextAnalysis.repetitionMetrics(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(out == Set(
      (1L, 4L, 2L, 2L, 0.5),
      (3L, 2L, 2L, 1L, 0.0)))
  }

  test("packFfd: hand-checked FFD placement hits the optimal bin count") {
    val s = spark
    import s.implicits._
    // weights 6,5,4,3,2,1 at budget 10 -> FFD gives {6,4},{5,3,2},{1}
    val df = Seq((1L, 6L), (2L, 5L), (3L, 4L), (4L, 3L), (5L, 2L), (6L, 1L))
      .toDF("id", "w").withColumn("shard", lit("s"))
    val out = Curation.packFfd(df, "shard", "id", "w", budget = 10L)
      .collect().map(r => r.getLong(1) -> ((r.getInt(3), r.getLong(4)))).toMap
    assert(out(1L) == ((0, 0L)) && out(3L) == ((0, 6L)))
    assert(out(2L) == ((1, 0L)) && out(4L) == ((1, 5L)) && out(5L) == ((1, 8L)))
    assert(out(6L) == ((2, 0L)))
  }

  test("packFfd: budget respected, bin count at the lower bound, deterministic, shards independent") {
    val docs = graft.operators.TextAnalysis.withTokenCounts(
      spark.read.parquet(s"$sfDir/documents.parquet"))
      .select(col("doc_id"), col("lang"), col("ws_tokens").cast("long").as("n"))
    def run() = Curation.packFfd(docs, "lang", "doc_id", "n", budget = 256L)
    val out = run().cache()
    val over = out.groupBy(col("lang"), col("pack_id")).agg(sum(col("n")).as("fill"))
      .filter(col("fill") > 256L)
    assert(over.count() == 0, "no pack may exceed the budget")
    val perShard = out.groupBy(col("lang"))
      .agg(sum(col("n")).as("tot"), (max(col("pack_id")) + 1).as("bins"))
      .collect()
    perShard.foreach { r =>
      val lower = (r.getLong(1) + 255) / 256
      assert(r.getInt(2) >= lower, s"bin count below the packing lower bound in ${r.getString(0)}")
      assert(r.getInt(2) <= 2 * lower + 1, s"FFD should stay near the lower bound in ${r.getString(0)}")
    }
    assert(out.exceptAll(run()).isEmpty, "FFD must be bit-reproducible")
    out.unpersist()
  }

  test("importanceWeights: in-domain docs outscore off-domain; scores are reproducible") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def run() = Curation.importanceWeights(docs, isTarget = col("lang") === "en")
    val scored = run().join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("lang"), (col("importance") / col("n_tokens")).as("per_tok"))
      .groupBy("lang").agg(avg(col("per_tok")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the English target's token distribution must score itself above
    // every other language's docs
    scored.filterNot(_._1 == "en").foreach { case (l, m) =>
      assert(scored("en") > m, s"en=${scored("en")} must outscore $l=$m")
    }
    assert(run().exceptAll(run()).isEmpty, "importance must be bit-reproducible")
  }

  test("importanceWeights: a token only in the target scores above one only in raw") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "tgtword tgtword tgtword", true),
      (2L, "rawword rawword rawword", false),
      (3L, "tgtword", false), (4L, "rawword", false))
      .toDF("doc_id", "text", "is_tgt")
    val out = Curation.importanceWeights(df, isTarget = col("is_tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(3L) > out(4L), s"target-domain token must outscore raw-only: $out")
  }

  test("curate_gold: every survivor passes every stage; caps and dedup hold") {
    val docs = graft.sources.TableLoader.table(spark, sfDir, "documents")
    val out = graft.Queries.qCurateGold.run(spark, sfDir).cache()
    val n = out.count()
    assert(n > 0)
    // stage 1+2: survivors pass Gopher and are not in the ppl tail
    val gopherPass = TextAnalysis.gopherRules(docs).filter(col("gopher_pass"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(gopherPass))
    assert(out.filter(col("ppl_bucket") === "tail").count() == 0)
    // stage 3: no two survivors share a text
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ids.toSeq.map(texts).distinct.size == ids.size)
    // stage 4: at most 10 per domain, ranks dense from 1
    val byDomain = out.groupBy(col("domain"))
      .agg(count(lit(1)).as("k"), max(col("domain_rank")).as("mx"))
      .collect()
    byDomain.foreach { r =>
      assert(r.getLong(1) <= 10L && r.getLong(2) == r.getLong(1))
    }
    out.unpersist()
  }

  test("selectUnderBudget: two-phase cutoff ≡ the global window; exact-fit, oversized-budget, histogram-bound edges") {
    val s = spark
    import s.implicits._
    // sizes engineered so the cutoff crosses INSIDE a score class
    val rows = (1 to 100).map(i => (i.toLong, (i % 10).toLong + 1L))
    val df = rows.toDF("id", "sz")
    def naive(budget: Long): Set[Long] = {
      // the single-sequence semantic, computed locally
      var cum = 0L
      rows.sortBy { case (id, szv) => (-szv, id) }.flatMap { case (id, szv) =>
        val keep = cum < budget; cum += szv; if (keep) Some(id) else None
      }.toSet
    }
    Seq(1L, 17L, 100L, 273L, 550L, 551L, 10000L).foreach { budget =>
      val got = graft.operators.Curation
        .selectUnderBudget(df, "sz", "sz", "id", budget)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == naive(budget), s"budget=$budget: $got != ${naive(budget)}")
    }
    // total = 550: an exact-fit budget keeps everything, none over
    assert(graft.operators.Curation.selectUnderBudget(df, "sz", "sz", "id", 550L)
      .count() == 100L)
    // the histogram bound refuses loudly instead of melting the driver
    val e = intercept[IllegalArgumentException](
      graft.operators.Curation.selectUnderBudget(df, "id", "sz", "id", 10L,
        maxDriverScores = 5))
    assert(e.getMessage.contains("distinct"))
    // non-numeric scores refuse
    val e2 = intercept[IllegalArgumentException](
      graft.operators.Curation.selectUnderBudget(
        df.withColumn("s2", col("id").cast("string")), "s2", "sz", "id", 10L))
    assert(e2.getMessage.contains("numeric"))
  }

  test("cube emits all four grouping sets over the rollup's three") {
    val cube = graft.Queries.qCube.run(spark, sfDir)
    val rollup = graft.Queries.qRollup.run(spark, sfDir)
    // gid bit order: (priority, status) -> status-only subtotal has gid 2
    val statusOnly = cube.filter(col("gid") === 2)
    assert(statusOnly.count() > 0)
    assert(cube.count() == rollup.count() + statusOnly.count())
  }
}
