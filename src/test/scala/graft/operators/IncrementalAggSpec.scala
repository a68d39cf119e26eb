package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {

  test("three refreshes equal the full recompute; new keys appear, untouched keys persist") {
    val s = spark
    import s.implicits._
    val statePath = tmpDir("graft-inc-agg-")
    val rows = Seq(
      // (key, grp, value): key k3 only arrives in the third increment
      ("k1", "a", 1.25), ("k1", "a", 2.50), ("k2", "b", 10.0),
      ("k1", "a", 4.25), ("k2", "b", 0.75),
      ("k3", "a", 7.00), ("k1", "b", 3.00))
    val df = rows.toDF("k", "grp", "v")
    val incs = Seq(df.limit(3),
      df.offset(3).limit(2),
      df.offset(5))
    incs.foreach(inc => IncrementalAgg.refreshTable(spark, statePath, inc, Seq("k", "grp"), "v"))

    val got = IncrementalAgg.read(spark, statePath, Seq("k", "grp"))
      .select(col("k"), col("grp"), col("n"), col("sum_dec").cast("double").as("sum"))
    val full = df.groupBy("k", "grp")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(28,6)")).cast("double").as("sum"))
    assert(got.count() == 4)
    assert(got.exceptAll(full).isEmpty && full.exceptAll(got).isEmpty)
    // each refresh commits one new state version (versioned timeline)
    assert(graft.sources.UpsertWriter.versions(spark, statePath).size >= 2)
  }

  test("null grouping keys combine across refreshes (null-safe state join)") {
    val s = spark
    import s.implicits._
    val statePath = tmpDir("graft-inc-agg-null-")
    val df = Seq((Some("k1"), "a", 1.0), (None, "a", 2.0), (None, "b", 4.0))
      .toDF("k", "grp", "v")
    IncrementalAgg.refreshTable(spark, statePath, df, Seq("k", "grp"), "v")
    // second increment touches the null key again: prior n/sum must combine,
    // not reset (the state join is <=> on keys, matching UpsertWriter.merge's
    // null-keys-group-together semantics)
    IncrementalAgg.refreshTable(spark, statePath,
      Seq((Option.empty[String], "a", 3.0)).toDF("k", "grp", "v"),
      Seq("k", "grp"), "v")
    val got = IncrementalAgg.read(spark, statePath, Seq("k", "grp"))
      .select(col("k"), col("grp"), col("n"), col("sum_dec").cast("double").as("sum"))
      .collect().map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set(
      (Some("k1"), "a", 1L, 1.0),
      (None, "a", 2L, 5.0),
      (None, "b", 1L, 4.0)))
  }

  test("empty increment is a no-op on the rollup") {
    val s = spark
    import s.implicits._
    val statePath = tmpDir("graft-inc-agg-empty-")
    val df = Seq(("k1", "a", 1.0)).toDF("k", "grp", "v")
    IncrementalAgg.refreshTable(spark, statePath, df, Seq("k", "grp"), "v")
    val before = IncrementalAgg.read(spark, statePath, Seq("k", "grp")).collect().toSet
    IncrementalAgg.refreshTable(spark, statePath, df.filter(lit(false)), Seq("k", "grp"), "v")
    val after = IncrementalAgg.read(spark, statePath, Seq("k", "grp")).collect().toSet
    assert(before == after)
  }

  test("replayed batch id is a no-op: state bytes and timeline identical after the retry") {
    val s = spark
    import s.implicits._
    val statePath = tmpDir("graft-inc-agg-replay-")
    val df = Seq(("k1", "a", 1.0), ("k2", "b", 2.0)).toDF("k", "grp", "v")
    assert(IncrementalAgg.refreshTable(spark, statePath, df.limit(1), Seq("k", "grp"), "v",
      batchId = Some(1L)))
    assert(IncrementalAgg.refreshTable(spark, statePath, df.offset(1), Seq("k", "grp"), "v",
      batchId = Some(2L)))
    assert(IncrementalAgg.appliedBatchId(spark, statePath).contains(2L))
    val versionsBefore = graft.sources.UpsertWriter.versions(spark, statePath)
    val before = IncrementalAgg.read(spark, statePath, Seq("k", "grp")).collect().toSet
    // at-least-once redelivery: both already-applied ids replay; the
    // fold must be skipped — no new version, no double-counted rows
    assert(!IncrementalAgg.refreshTable(spark, statePath, df.offset(1), Seq("k", "grp"), "v",
      batchId = Some(2L)))
    assert(!IncrementalAgg.refreshTable(spark, statePath, df.limit(1), Seq("k", "grp"), "v",
      batchId = Some(1L)))
    assert(graft.sources.UpsertWriter.versions(spark, statePath) == versionsBefore)
    assert(IncrementalAgg.read(spark, statePath, Seq("k", "grp")).collect().toSet == before)
    // a genuinely new batch still applies and advances the mark
    assert(IncrementalAgg.refreshTable(spark, statePath, df.limit(1), Seq("k", "grp"), "v",
      batchId = Some(3L)))
    assert(IncrementalAgg.appliedBatchId(spark, statePath).contains(3L))
  }

  test("refreshTopK: replayed batch id neither re-inserts ids nor commits a version") {
    val s = spark
    import s.implicits._
    val statePath = tmpDir("graft-inc-topk-replay-")
    val b1 = Seq(("g", 30.0, 1L), ("g", 20.0, 2L)).toDF("key", "score", "id")
    assert(IncrementalAgg.refreshTopK(spark, statePath, b1, Seq("key"), "score", "id", k = 2,
      batchId = Some(1L)))
    val before = IncrementalAgg.readTopK(spark, statePath, Seq("key")).collect().toSet
    val versionsBefore = graft.sources.UpsertWriter.versions(spark, statePath)
    // without the guard, id 1 would occupy two heap slots after replay
    assert(!IncrementalAgg.refreshTopK(spark, statePath, b1, Seq("key"), "score", "id", k = 2,
      batchId = Some(1L)))
    assert(IncrementalAgg.readTopK(spark, statePath, Seq("key")).collect().toSet == before)
    assert(graft.sources.UpsertWriter.versions(spark, statePath) == versionsBefore)
  }

  test("refreshTopK: later batch evicts a stored entry; state stays O(k) per key") {
    val s = spark
    import s.implicits._
    val statePath = tmpDir("graft-inc-topk-")
    // batch 1: key g holds [30, 20] (k=2); batch 2's 25 must evict 20
    IncrementalAgg.refreshTopK(spark, statePath,
      Seq(("g", 30.0, 1L), ("g", 20.0, 2L), ("h", 5.0, 3L)).toDF("key", "score", "id"),
      Seq("key"), "score", "id", k = 2)
    IncrementalAgg.refreshTopK(spark, statePath,
      Seq(("g", 25.0, 4L), ("h", 1.0, 5L)).toDF("key", "score", "id"),
      Seq("key"), "score", "id", k = 2)
    val out = IncrementalAgg.readTopK(spark, statePath, Seq("key"))
      .collect().map(r => (r.getString(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(out == Map(
      ("g", 1) -> 1L, ("g", 2) -> 4L,   // 30 then 25; 20 evicted
      ("h", 1) -> 3L, ("h", 2) -> 5L))
    val arr = graft.sources.UpsertWriter.read(spark, statePath)
      .select(size(col("hits"))).collect().map(_.getInt(0))
    assert(arr.forall(_ <= 2), "state must stay O(k) per key")
  }

  test("refreshFreq: heavy value survives skewed batches at tiny capacity; undercount bounded") {
    val s = spark
    import s.implicits._
    val statePath = tmpDir("graft-inc-freq-")
    // 3 batches, 60 rows total: "hot" appears 24× (share 0.4), the
    // rest are near-unique noise. capacity 2 → trims hard, but the
    // mergeable-summaries bound says hot's stored est undercounts by
    // ≤ 60/3 = 20, so hot MUST survive with est ≥ 4.
    val batches = (0 until 3).map { b =>
      val rows = Seq.fill(8)("hot") ++ (0 until 12).map(i => s"noise-$b-$i")
      rows.toDF("v")
    }
    batches.foreach(b => IncrementalAgg.refreshFreq(spark, statePath, b, "v", capacity = 2))
    val state = IncrementalAgg.readFreqCandidates(spark, statePath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(state.size <= 2, s"state exceeds capacity: $state")
    assert(state.contains("hot"), s"heavy value trimmed away: $state")
    assert(state("hot") >= 24 - 20 && state("hot") <= 24,
      s"est ${state("hot")} outside the MG bound [4, 24]")
    // verified(): exact answer from the candidate superset
    val all = batches.reduce(_ unionByName _)
    val exact = HeavyHitters.verified(all, "v",
      IncrementalAgg.readFreqCandidates(spark, statePath).select(col("value").as("v")),
      minShare = 0.3).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(exact.toSeq == Seq(("hot", 24L, 60L)))
  }

  test("refreshFreq: replayed batch id is a no-op; no-trim fold is exact") {
    val s = spark
    import s.implicits._
    val statePath = tmpDir("graft-inc-freq-")
    IncrementalAgg.refreshFreq(spark, statePath,
      Seq("a", "a", "b").toDF("v"), "v", capacity = 8, batchId = Some(0L))
    IncrementalAgg.refreshFreq(spark, statePath,
      Seq("a", "b", "c").toDF("v"), "v", capacity = 8, batchId = Some(1L))
    def state() = IncrementalAgg.readFreqCandidates(spark, statePath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // under capacity nothing trims: MG estimates are exact counts
    assert(state() == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    val applied = IncrementalAgg.refreshFreq(spark, statePath,
      Seq("a", "a", "b").toDF("v"), "v", capacity = 8, batchId = Some(0L))
    assert(!applied && state() == Map("a" -> 3L, "b" -> 2L, "c" -> 1L),
      "redelivered batch must not double-count")
  }

  test("refreshFromChanges: updates and deletes keep the rollup exact; n=0 tombstones; replay no-op") {
    val s = spark
    import s.implicits._
    val statePath = tmpDir("graft-inc-agg-cdc-")
    val keys = Seq("grp")
    val base = Seq((1L, "a", 10.0), (2L, "a", 5.0), (3L, "b", 7.0), (4L, "c", 2.0))
      .toDF("id", "grp", "v")
    IncrementalAgg.refreshTable(spark, statePath, base, keys, "v", batchId = Some(1L))
    // next snapshot: id=1 value updated, id=2 moves group a->b, id=3 deleted,
    // id=5 inserted, group c deleted entirely (tombstone case)
    val next = Seq((1L, "a", 12.5), (2L, "b", 5.0), (5L, "b", 1.0)).toDF("id", "grp", "v")
    val feed = SnapshotDiff.changeFeed(base, next, keys = Seq("id"))
    assert(IncrementalAgg.refreshFromChanges(spark, statePath, feed, keys, "v", batchId = Some(2L)))
    val live = IncrementalAgg.readLive(spark, statePath, keys)
      .select(col("grp"), col("n"), col("sum_dec").cast("double").as("sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(live == Set(("a", 1L, 12.5), ("b", 2L, 6.0)),
      s"rollup must equal the recompute over next, got $live")
    // the fully-deleted group survives as an n=0 tombstone in raw state
    val raw = IncrementalAgg.read(spark, statePath, keys)
      .filter(col("grp") === "c").collect()
    assert(raw.length == 1 && raw.head.getLong(1) == 0L)
    // a later insert resurrects the tombstoned group additively
    val feed2 = Seq(("insert", "c", 9.0)).toDF("change_type", "grp", "v")
    IncrementalAgg.refreshFromChanges(spark, statePath, feed2, keys, "v", batchId = Some(3L))
    val c = IncrementalAgg.readLive(spark, statePath, keys).filter(col("grp") === "c")
      .select(col("n"), col("sum_dec").cast("double")).collect()
    assert(c.length == 1 && c.head.getLong(0) == 1L && c.head.getDouble(1) == 9.0)
    // replayed CDC batch id is a no-op
    assert(!IncrementalAgg.refreshFromChanges(spark, statePath, feed, keys, "v", batchId = Some(2L)))
  }

  test("refreshFromChanges rejects unknown change types loudly") {
    val s = spark
    import s.implicits._
    val statePath = tmpDir("graft-inc-agg-cdc-bad-")
    val bad = Seq(("upsert", "a", 1.0)).toDF("change_type", "grp", "v")
    val e = intercept[Exception] {
      IncrementalAgg.refreshFromChanges(spark, statePath, bad, Seq("grp"), "v")
    }
    assert(e.getMessage.contains("unknown change type")
      || Option(e.getCause).exists(_.getMessage.contains("unknown change type")))
  }
}
