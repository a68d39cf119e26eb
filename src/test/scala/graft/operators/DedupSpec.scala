package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  // A planted corpus: 1=2 identical, 3 near-dup of 1 (one word differs),
  // 4 unrelated, 5 shorter than the shingle width, 6 empty-ish.
  private def corpus = docsDf(Seq(
    1L -> "the quick brown fox jumps over the lazy dog again and again today",
    2L -> "the quick brown fox jumps over the lazy dog again and again today",
    3L -> "the quick brown fox jumps over the lazy cat again and again today",
    4L -> "completely different words in this one nothing shared with others here",
    5L -> "too few words",
    6L -> "x"))

  test("shingles: n-grams, dedup, short docs yield empty (no crash)") {
    val out = corpus.select(col("doc_id"), Dedup.shingles(col("text"), 5).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).head == "the quick brown fox jumps")
    assert(out(1L).size == 13 - 4)
    assert(out(5L).isEmpty) // 3 tokens < n=5: the ADVICE regression
    assert(out(6L).isEmpty)
  }

  test("hashedShingles sets mirror string shingle sets in size") {
    val both = corpus.select(
      size(Dedup.shingles(col("text"), 5)).as("ns"),
      size(Dedup.hashedShingles(col("text"), 5)).as("nh"))
    assert(both.filter(col("ns") =!= col("nh")).count() == 0)
  }

  test("exact: lowest id survives per identical content") {
    val out = Dedup.exact(corpus, "text", "doc_id")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 3L, 4L, 5L, 6L))) // 2 collapsed into 1
  }

  test("ngramJaccardPairs: identical=1.0, near-dup high, unrelated absent") {
    // docs 1/3 differ at one token inside 13: 4 of 9+9 shingles shared
    // -> Jaccard 4/14 ≈ 0.286
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 5, threshold = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(math.abs(pairs((1L, 3L)) - 4.0 / 14.0) < 1e-12)
    assert(pairs.keys.forall { case (a, b) => a < b })
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("prefixFilteredJaccardPairs equals the unfiltered index join on real docs") {
    val docs = graft.sources.TableLoader.table(spark, sfDir, "documents")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))).toSet
    for (t <- Seq(0.5, 0.8)) {
      val full = canon(Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 5, threshold = t))
      val pref = canon(Dedup.prefixFilteredJaccardPairs(docs, "doc_id", "text", n = 5, threshold = t))
      assert(pref == full, s"threshold $t: prefix-filtered join diverged")
    }
  }

  test("prefixFilteredJaccardPairs: planted near-dups survive the filter") {
    val pairs = Dedup.prefixFilteredJaccardPairs(corpus, "doc_id", "text", n = 5, threshold = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(math.abs(pairs((1L, 3L)) - 4.0 / 14.0) < 1e-12)
  }

  test("containmentPairs: quote-and-expand caught one-directionally") {
    val s = spark
    import s.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      10L -> base, // fully quoted inside 11
      11L -> (base + " plus lots of extra words that dilute the jaccard number badly " +
        "more and more filler content keeps arriving here every day"),
      12L -> "unrelated content entirely about something else with different words"
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text", n = 5, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((10L, 11L)) == 1.0, "small doc fully contained in big")
    assert(!out.contains((11L, 10L)), "big doc is NOT contained in small")
    assert(!out.keys.exists { case (a, b) => a == 12L || b == 12L })
    // symmetric jaccard would have missed it
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 5, threshold = 0.9)
    assert(jac.count() == 0)
  }

  test("editDistancePairs: exact bounded distances on candidates; corpus never shuffles for the text join") {
    // 1=2 identical (dist 0); 3 differs from 1 by one word dog->cat
    // (dist 3); 4 shares no shingles -> never even a candidate
    val out = Dedup.editDistancePairs(corpus, "doc_id", "text",
      candidateJaccard = 0.25, maxDist = 2)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(!pairs.contains((1L, 3L)), "dist 3 must be cut by maxDist=2")
    val loose = Dedup.editDistancePairs(corpus, "doc_id", "text",
      candidateJaccard = 0.25, maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(loose((1L, 3L)) == 3)
    // both text joins broadcast the pair-sized side
    val plan = out.queryExecution.executedPlan.treeString
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("minhashLshPairs: exact on candidates, full recall on planted dups") {
    val exactPairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 5, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(corpus, "doc_id", "text", n = 5, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // no false positives (verified), and the planted high-sim pairs recalled
    assert(lsh.map(_._1).toSet.subsetOf(exactPairs))
    assert(lsh.map(_._1).toSet.contains((1L, 2L)))
    assert(lsh.collect { case ((1L, 2L), j) => j }.head == 1.0)
  }

  test("minhashLshPairs recall vs exact on the sf0.001 documents table") {
    val docs = graft.sources.TableLoader.table(spark, sfDir, "documents")
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // verification kills false positives
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.9, s"recall $recall over ${exact.size} true pairs")
    }
  }

  test("minhashLshPairsCross equals the one-shot pair set restricted to straddling pairs") {
    val docs = graft.sources.TableLoader.table(spark, sfDir, "documents")
    val train = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0)
    val holdout = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
    val cross = Dedup.minhashLshPairsCross(train, holdout, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // one-shot within-table pairs, direction-normalized to (train, holdout)
    val oneShot = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .collect {
        case ((a, b), j) if a % 10 != 0 && b % 10 == 0 => ((a, b), j)
        case ((a, b), j) if a % 10 == 0 && b % 10 != 0 => ((b, a), j)
      }.toMap
    assert(cross == oneShot, "cross-corpus banding must surface exactly the straddling near-dups")
    // the fuzzy decontaminator is the same pair set under train/holdout names
    val fuzzy = Curation.decontaminateFuzzy(train, holdout)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(fuzzy == cross)
  }

  test("simhashPairs: identical docs at hamming 0; unrelated absent") {
    val out = Dedup.simhashPairs(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number](2).longValue).toMap
    assert(out((1L, 2L)) == 0L)
    assert(!out.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  // localEdgeThreshold = 0 forces the distributed propagation path;
  // the default (local union-find) is covered by the equality test.
  test("clusters (distributed): chain and clique collapse to min-id components") {
    val s = spark
    import s.implicits._
    // chain 1-2-3 (transitive), clique 10-11-12, pair 20-21
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L), (10L, 12L), (11L, 12L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.clusters(pairs, "doc_a", "doc_b", localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("clusters (local union-find): same fixture, same assignments") {
    val s = spark
    import s.implicits._
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L), (10L, 12L), (11L, 12L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.clusters(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("clusters: long path converges on both paths; local needs no round budget") {
    val s = spark
    import s.implicits._
    val n = 30L
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val dist = Dedup.clusters(pairs, "doc_a", "doc_b", maxRounds = 40, localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist.size == n.toInt && dist.values.forall(_ == 1L))
    // local path: a 30-hop chain is exact regardless of maxRounds
    val local = Dedup.clusters(pairs, "doc_a", "doc_b", maxRounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
  }

  test("clusters: empty pair list yields an empty result, not an NPE") {
    val s = spark
    import s.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = Dedup.clusters(pairs, "doc_a", "doc_b")
    assert(out.columns.toSeq == Seq("doc_id", "cluster_rep"))
    assert(out.count() == 0L)
    // distributed path agrees on the degenerate input
    assert(Dedup.clusters(pairs, "doc_a", "doc_b", localEdgeThreshold = 0L).count() == 0L)
  }

  test("clusters: randomized local-vs-distributed equality") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
      .toDF("doc_a", "doc_b")
    val local = Dedup.clusters(pairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = Dedup.clusters(pairs, "doc_a", "doc_b", maxRounds = 60, localEdgeThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(local == dist)
  }

  test("paragraphs: corpus-wide chunk dedup, first (doc, position) wins, docs reassemble in order") {
    // chunkTokens=3: doc 1 = [A B C][D E F], doc 2 repeats [A B C] then
    // unique [G H I], doc 3 is ALL repeats and must vanish, doc 4
    // repeats a chunk WITHIN itself (second copy drops)
    val df = docsDf(Seq(
      1L -> "a b c d e f",
      2L -> "a b c g h i",
      3L -> "d e f a b c",
      4L -> "j k l j k l"))
    val out = Dedup.paragraphs(df, chunkTokens = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, "a b c d e f")))
    assert(out(2L) == ((2L, 1L, "g h i")))
    assert(!out.contains(3L), "all-repeat doc must vanish")
    assert(out(4L) == ((2L, 1L, "j k l")))
  }

  test("paragraphs: ragged tail chunk kept; single-chunk docs dedup exactly") {
    val df = docsDf(Seq(
      1L -> "a b c d e", // [a b c][d e]
      2L -> "d e"))      // tail of doc 1 repeated as a whole doc
    val out = Dedup.paragraphs(df, chunkTokens = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "a b c d e")
    assert(!out.contains(2L))
  }

  test("incrementalExact: lowest id wins across batches, later arrival included; state never rescans") {
    val s = spark
    import s.implicits._
    val state = tmpDir("graft-dedup-inc-")
    // batch 1 carries id 5 for text A; batch 2 brings id 2 for the
    // SAME text — the later-arriving LOWER id must take over
    Dedup.incrementalExact(state, Seq((5L, "A"), (7L, "B")).toDF("doc_id", "text"), "text", "doc_id")
    Dedup.incrementalExact(state, Seq((2L, "A"), (9L, "C")).toDF("doc_id", "text"), "text", "doc_id")
    val out = Dedup.incrementalExactRead(spark, state)
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(out == Map("A" -> 2L, "B" -> 7L, "C" -> 9L))
    // two refreshes = two committed versions; each reads only state + batch
    assert(graft.sources.UpsertWriter.versions(spark, state).size == 2)
  }

  test("minhashLshIncremental: union of refresh emissions equals the one-shot pair set; no double emission") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val state = tmpDir("graft-minhash-inc-")
    val p1 = Dedup.minhashLshIncremental(state, docs.filter(col("doc_id") % 3 === 0), "doc_id", "text")
    val p2 = Dedup.minhashLshIncremental(state, docs.filter(col("doc_id") % 3 === 1), "doc_id", "text")
    val p3 = Dedup.minhashLshIncremental(state, docs.filter(col("doc_id") % 3 === 2), "doc_id", "text")
    val inc = p1.unionByName(p2).unionByName(p3)
    val full = Dedup.minhashLshPairs(docs, "doc_id", "text")
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "incremental emissions must union to the one-shot pair set")
    assert(inc.count() == inc.distinct().count(), "a pair must surface in exactly one refresh")
  }

  test("minhashLshIncremental: replayed batch appends no state and re-emits its original pairs exactly") {
    import graft.sources.VersionedLog
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val state = tmpDir("graft-minhash-replay-")
    Dedup.minhashLshIncremental(state, docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", batchId = Some(1L))
    val p2 = Dedup.minhashLshIncremental(state, docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", batchId = Some(2L))
    val versionsBefore = VersionedLog.committed(spark, state).map(_.num)
    val bandsBefore = VersionedLog.read(spark, state, "bands").get.count()
    // at-least-once redelivery of batch 2: no new version, no band
    // duplication, and the emission equals the original bit-for-bit
    val p2r = Dedup.minhashLshIncremental(state, docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", batchId = Some(2L))
    assert(VersionedLog.committed(spark, state).map(_.num) == versionsBefore)
    assert(VersionedLog.read(spark, state, "bands").get.count() == bandsBefore)
    assert(p2r.exceptAll(p2).isEmpty && p2.exceptAll(p2r).isEmpty,
      "replay must re-derive the original emission exactly")
    assert(VersionedLog.appliedHwm(spark, state).contains(2L))
  }

  test("minhashLshCompactState: same pairs after compaction, fewer versions; pre-compaction replay is an empty no-op") {
    import graft.sources.VersionedLog
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val state = tmpDir("graft-minhash-compact-")
    val p1 = Dedup.minhashLshIncremental(state, docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", batchId = Some(1L))
    val p2 = Dedup.minhashLshIncremental(state, docs.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", batchId = Some(2L))
    val rowsBefore = VersionedLog.read(spark, state, "bands").get.count()
    val filesBefore = VersionedLog.committed(spark, state).map(v =>
      new java.io.File(new java.net.URI(v.dir + "/bands")).listFiles()
        .count(_.getName.endsWith(".parquet"))).sum
    Dedup.minhashLshCompactState(spark, state)
    // one version, same band rows, fewer files
    assert(VersionedLog.committed(spark, state).size == 1)
    assert(VersionedLog.read(spark, state, "bands").get.count() == rowsBefore)
    val filesAfter = VersionedLog.committed(spark, state).map(v =>
      new java.io.File(new java.net.URI(v.dir + "/bands")).listFiles()
        .count(_.getName.endsWith(".parquet"))).sum
    assert(filesAfter < filesBefore, s"expected fewer band files, got $filesBefore -> $filesAfter")
    // the high-water mark survived: a pre-compaction batch replays as
    // a recognized no-op (empty emission, no state change)
    val replay = Dedup.minhashLshIncremental(state, docs.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", batchId = Some(2L))
    assert(replay.isEmpty)
    assert(VersionedLog.committed(spark, state).size == 1)
    // a genuinely NEW batch over compacted state still emits correctly:
    // union equals the one-shot pair set over all three batches
    val p3 = Dedup.minhashLshIncremental(state, docs.filter(col("doc_id") % 3 === 2),
      "doc_id", "text", batchId = Some(3L))
    val inc = p1.unionByName(p2).unionByName(p3)
    val full = Dedup.minhashLshPairs(docs, "doc_id", "text")
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
  }

  test("duplicatedSpanExcision: cross-doc span cut from every copy, remainder kept") {
    val df = docsDf(Seq(
      1L -> "A B C D E F G H unique1 tail1",
      2L -> "prefix2 A B C D E F G H tail2 x",
      3L -> "alone words that occur nowhere else at all today"))
    val out = Dedup.duplicatedSpanExcision(df, w = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("unique1 tail1", 10L, 8L)))
    assert(out(2L) == (("prefix2 tail2 x", 11L, 8L)))
    assert(out(3L) == (("alone words that occur nowhere else at all today", 9L, 0L)))
  }

  test("duplicatedSpanExcision: self-repetition within one doc counts; short docs pass whole") {
    val df = docsDf(Seq(
      1L -> "R1 R2 R3 R4 R5 R6 R7 R8 mid R1 R2 R3 R4 R5 R6 R7 R8",
      2L -> "too few words"))
    val out = Dedup.duplicatedSpanExcision(df, w = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("mid", 17L, 16L)))
    assert(out(2L) == (("too few words", 3L, 0L)))
  }

  test("duplicatedSpanExcision: overlapping duplicated windows cover their union, not double-count") {
    // docs share a 9-token run -> two overlapping 8-windows each;
    // union of coverage is 9 tokens, n_removed must be 9 (not 16)
    val df = docsDf(Seq(
      1L -> "A B C D E F G H I one1",
      2L -> "A B C D E F G H I two2"))
    val out = Dedup.duplicatedSpanExcision(df, w = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    assert(out(1L) == (("one1", 9L)))
    assert(out(2L) == (("two2", 9L)))
  }

  test("tunedMinhashParams: recall-valid layout; boilerplate skew raises rows-per-band") {
    val s = spark
    import s.implicits._
    val docs = graft.sources.TableLoader.table(spark, sfDir, "documents")
    val (nh, b) = Dedup.tunedMinhashParams(docs, "doc_id", "text")
    assert(nh % b == 0)
    val r = nh / b
    assert(r >= 2)
    // the recall constraint the layout was solved for
    assert(1.0 - math.pow(1.0 - math.pow(0.5, r), b) >= 0.9 - 1e-9)
    // Skewed corpus: 300 docs sharing a 40-token boilerplate prefix
    // with short unique tails. Popular boilerplate shingles win the
    // minhash argmins, so at small r nearly every doc lands in one
    // bucket while true Jaccard stays below the threshold — the
    // occupancy-measuring tuner must buy more rows per band to split
    // those buckets, where any pairwise-similarity model reads
    // "background ~0.4, fine" and would keep r minimal.
    val boiler = (1 to 40).map(i => s"common$i").mkString(" ")
    val skewed = (1 to 300).map(i => (i.toLong, s"$boiler tail${i}a tail${i}b tail${i}c"))
      .toDF("doc_id", "text")
    val (nhS, bS) = Dedup.tunedMinhashParams(skewed, "doc_id", "text")
    val rS = nhS / bS
    assert(rS > r, s"skewed corpus chose r=$rS, baseline r=$r")
    assert(rS >= 4)
  }

  test("minhashLshPairsAuto: tuned layout finds at least the fixed-layout pairs (verified output only)") {
    val docs = graft.sources.TableLoader.table(spark, sfDir, "documents")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = pairs(Dedup.minhashLshPairs(docs, "doc_id", "text", 5, 64, 16, 0.5))
    val auto = pairs(Dedup.minhashLshPairsAuto(docs, "doc_id", "text"))
    // both verify candidates at the same threshold, so every emitted
    // pair is true; the tuned layout (smaller r at this corpus) has a
    // strictly higher per-pair collision probability -> superset
    assert(fixed.subsetOf(auto))
    assert(auto.nonEmpty)
  }
}
