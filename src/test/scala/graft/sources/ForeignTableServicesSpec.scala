package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Table SERVICES for the three foreign formats — vacuum (Delta),
  * cleaner (Hudi), snapshot expiry (Iceberg). The shared contract:
  * the CURRENT state never changes, retention-window time travel
  * keeps working, expired history fails LOUDLY (at scan / at
  * resolution), and only provably-unreferenced files leave the disk.
  */
class ForeignTableServicesSpec extends SparkSpec {

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"g${i % 4}", i * 2L)).toDF("id", "grp", "v")
  }

  test("Delta vacuum: expired tombstones leave the disk; recent ones and the active set stay") {
    val table = tmpDir("svc-vacuum") + "/t"
    DeltaTableWriter.create(df(1 to 50), table): Unit
    DeltaTableWriter.append(df(51 to 80), table): Unit
    val files = DeltaTableReader.activeFiles(spark, table).map(_.path)
    val (oldDead, newDead) = (files.head, files.last)
    // v2: one file tombstoned 100 days ago, one just now
    val now = System.currentTimeMillis()
    val w = new java.io.PrintWriter(
      new java.io.File(s"$table/_delta_log", f"${2L}%020d.json"), "UTF-8")
    try {
      w.println(s"""{"remove":{"path":"$oldDead","deletionTimestamp":${now - 100L * 86400000L},"dataChange":true}}""")
      w.println(s"""{"remove":{"path":"$newDead","deletionTimestamp":$now,"dataChange":true}}""")
    } finally w.close()
    val liveBefore = DeltaTableReader.snapshot(spark, table).count()
    val deleted = DeltaTableWriter.vacuum(spark, table, retentionMs = 7L * 86400000L)
    assert(deleted == Seq(oldDead), s"only the expired tombstone may go, got $deleted")
    assert(!new java.io.File(table, oldDead).exists())
    assert(new java.io.File(table, newDead).exists(),
      "a tombstone inside retention must survive (time travel still serves it)")
    // the current snapshot is untouched
    assert(DeltaTableReader.snapshot(spark, table).count() == liveBefore)
    // time travel to a version needing the vacuumed file fails loudly
    intercept[Exception](DeltaTableReader.snapshotAsOf(spark, table, 0L).count())
    // a DV re-add tombstone is NOT vacuumable (the path is active)
    val t2 = tmpDir("svc-vacuum-dv") + "/t"
    DeltaTableWriter.create(df(1 to 30), t2): Unit
    DeltaTableWriter.delete(spark, t2, col("id") <= 5L): Unit
    assert(DeltaTableWriter.vacuum(spark, t2, retentionMs = -1L).isEmpty,
      "remove+re-add DV attaches must never vacuum their own data file")
    assert(DeltaTableReader.snapshot(spark, t2).count() == 25L)
  }

  test("Hudi cleaner: superseded slices and their logs clean; the serving window survives") {
    val s = spark
    import s.implicits._
    val table = tmpDir("svc-clean") + "/t"
    HudiTableWriter.createMor(df(1 to 40).coalesce(1), table, recordKeys = Seq("id")): Unit
    HudiTableWriter.updateLog(df(1 to 5).withColumn("v", lit(999L)), table): Unit
    HudiTableWriter.compact(spark, table): Unit
    def dataLike() = new java.io.File(table).listFiles()
      .filter(f => !f.getName.endsWith(".crc") &&
        (f.getName.endsWith(".parquet") || f.getName.contains(".log.")))
      .map(_.getName).toSet
    val before = dataLike()
    assert(before.size == 3, s"expected old base + log + compacted base, got $before")
    // retain >= timeline size: nothing cleans
    assert(HudiTableWriter.clean(spark, table, retainLatestInstants = 5).isEmpty)
    // retain 1: the pre-compaction base and its folded log are
    // superseded at/before the horizon — both clean
    val deleted = HudiTableWriter.clean(spark, table, retainLatestInstants = 1)
    assert(deleted.size == 2, s"expected base+log to clean, got $deleted")
    val after = dataLike()
    assert(after.size == 1 && after.forall(_.endsWith(".parquet")))
    // the current snapshot still serves, log-updated values included
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.count() == 40L)
    assert(snap.where(col("id") === 3L).select("v").head().getLong(0) == 999L)
  }

  test("Delta compaction: fewer files, same rows, invisible to incremental and change feed; DVs materialize") {
    val table = tmpDir("svc-compact-d") + "/t"
    DeltaTableWriter.create(df(1 to 60).repartition(6), table): Unit
    DeltaTableWriter.append(df(61 to 80).repartition(4), table): Unit
    DeltaTableWriter.delete(spark, table, col("id") <= 5L): Unit
    val before = DeltaTableReader.snapshot(spark, table)
    assert(before.count() == 75L)
    assert(DeltaTableReader.activeFiles(spark, table).size >= 10)
    val v = DeltaTableWriter.compact(spark, table, targetFiles = 2)
    val after = DeltaTableReader.snapshot(spark, table)
    assert(after.count() == 75L)
    assert(after.select(min("id")).head().getLong(0) == 6L)
    val state = DeltaTableReader.snapshotState(spark, table)
    assert(state.active.size == 2, s"expected 2 files, got ${state.active.size}")
    assert(state.active.forall(_.dv.isEmpty),
      "compaction must MATERIALIZE deletion vectors, not carry them")
    // dataChange=false: the incremental read treats the compaction as
    // invisible — since v-1 there is nothing to pull
    val e = intercept[IllegalArgumentException](
      DeltaTableReader.incrementalSince(spark, table, v - 1))
    assert(e.getMessage.contains("no data-changing commits"))
    // ... and so does the change feed
    val e2 = intercept[IllegalArgumentException](
      DeltaTableReader.changeFeedSince(spark, table, v - 1))
    assert(e2.getMessage.contains("changed no data"))
    // appends keep working on the compacted base
    DeltaTableWriter.append(df(81 to 90), table): Unit
    assert(DeltaTableReader.snapshot(spark, table).count() == 85L)
  }

  test("Hudi clustering: replacecommit drops input groups, stamps preserved, incremental exact across") {
    val table = tmpDir("svc-cluster-h") + "/t"
    val c1 = HudiTableWriter.create(df(1 to 60).repartition(4), table, recordKeys = Seq("id"))
    val c2 = HudiTableWriter.append(df(61 to 80).repartition(4), table)
    assert(HudiTableReader.activeSlices(spark, table).size == 8)
    HudiTableWriter.cluster(spark, table, targetGroups = 2): Unit
    val slices = HudiTableReader.activeSlices(spark, table)
    assert(slices.size == 2, s"expected 2 clustered groups, got ${slices.size}")
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.count() == 80L)
    // stamps preserved: the clustered rows keep their ORIGINAL commit
    // times, so an incremental pull since c1 still serves exactly c2
    assert(snap.select("_hoodie_commit_time").distinct().count() == 2L)
    val inc = HudiTableReader.incrementalSince(spark, table, c1)
    assert(inc.count() == 20L)
    assert(inc.agg(min("id"), max("id")).head().toSeq == Seq(61L, 80L))
    assert(c2 != null)
    // the cleaner can then reclaim the replaced groups
    val cleaned = HudiTableWriter.clean(spark, table, retainLatestInstants = 1)
    assert(cleaned.size == 8, s"all 8 replaced slices should clean, got $cleaned")
    assert(HudiTableReader.snapshot(spark, table).count() == 80L)
  }

  test("Hudi clustering on a PARTITIONED table: per-partition re-bucket, stamps preserved") {
    val s = spark
    import s.implicits._
    val table = tmpDir("svc-cluster-hp") + "/t"
    def pdf(r: Range) = r.map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "part", "v")
    val c1 = HudiTableWriter.create(pdf(1 to 60).repartition(4), table,
      recordKeys = Seq("id"), partitionBy = Seq("part"))
    HudiTableWriter.append(pdf(61 to 90).repartition(4), table): Unit
    val before = HudiTableReader.activeSlices(spark, table)
    assert(before.size > 6, s"fixture needs many small groups, got ${before.size}")
    HudiTableWriter.cluster(spark, table, targetGroups = 2): Unit
    val after = HudiTableReader.activeSlices(spark, table)
    // per-partition cut: every partition dir holds at most
    // targetGroups groups, and the total shrank
    val byPart = after.groupBy(_.partition).map { case (p, ss) => p -> ss.size }
    assert(byPart.keySet == Set("part=p0", "part=p1", "part=p2"), s"got ${byPart.keySet}")
    assert(byPart.values.forall(_ <= 2), s"per-partition groups must be <= 2: $byPart")
    assert(after.size < before.size)
    // rows, values and STAMPS all preserved
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.count() == 90L)
    assert(snap.where(col("id") === 7L).head().getAs[Long]("v") == 14L)
    assert(snap.select("_hoodie_commit_time").distinct().count() == 2L)
    // incremental exact across the clustering
    val inc = HudiTableReader.incrementalSince(spark, table, c1)
    assert(inc.count() == 30L)
    // partition pruning still serves from the clustered layout
    val p1 = snap.where(col("part") === "p1")
    assert(p1.count() == 30L)
  }

  test("Iceberg rewrite: replace snapshot with a fresh manifest; deletes materialize; expiry reclaims") {
    val table = tmpDir("svc-rewrite-i") + "/t"
    IcebergTableWriter.create(df(1 to 60).repartition(5), table): Unit
    IcebergTableWriter.delete(spark, table, col("id") <= 10L): Unit
    assert(IcebergTableReader.planFiles(spark, table).positionDeletes.nonEmpty)
    IcebergTableWriter.rewriteDataFiles(spark, table, targetFiles = 2): Unit
    val plan = IcebergTableReader.planFiles(spark, table)
    assert(plan.data.size == 2, s"expected 2 rewritten files, got ${plan.data.size}")
    assert(plan.positionDeletes.isEmpty && plan.equalityDeletes.isEmpty,
      "the rewrite must materialize row-level deletes")
    val snap = IcebergTableReader.snapshot(spark, table)
    assert(snap.count() == 50L)
    assert(snap.agg(min("id")).head().getLong(0) == 11L)
    // incremental still refuses across the DELETE snapshot in the
    // range (rows changed, an append-scoped pull can't express it) —
    // the replace alone would be skipped, the delete is what refuses
    val e = intercept[IllegalStateException](
      IcebergTableReader.incrementalSince(spark, table, 1L))
    assert(e.getMessage.contains("not an append") && e.getMessage.contains("'delete'"))
    // expiry after the rewrite reclaims the superseded data + delete files
    val dataDirBefore = new java.io.File(s"$table/data").listFiles().length
    IcebergTableWriter.expireSnapshots(spark, table, keepLast = 1): Unit
    val dataDirAfter = new java.io.File(s"$table/data").listFiles().length
    assert(dataDirAfter < dataDirBefore,
      s"expiry must reclaim unreferenced files ($dataDirBefore -> $dataDirAfter)")
    assert(IcebergTableReader.snapshot(spark, table).count() == 50L)
  }

  test("Iceberg incremental SKIPS replace snapshots: a compacting table keeps its consumers") {
    val table = tmpDir("svc-inc-replace") + "/t"
    val s1 = IcebergTableWriter.create(df(1 to 30).repartition(3), table)
    // consumer checkpoints at s1; the table then appends AND compacts
    val s2 = IcebergTableWriter.append(df(31 to 50).repartition(2), table)
    IcebergTableWriter.rewriteDataFiles(spark, table, targetFiles = 1): Unit
    // the pull across [append, replace] serves EXACTLY the appended
    // rows — the rewrite adds no logical rows and must not refuse
    val inc = IcebergTableReader.incrementalSince(spark, table, s1)
    assert(inc.count() == 20L)
    assert(inc.agg(min(col("id")), max(col("id"))).head() ==
      org.apache.spark.sql.Row(31L, 50L))
    assert(inc.select("_snapshot_id").distinct().head().getLong(0) == s2)
    // a replace-ONLY range is an EMPTY pull in the table's shape, not
    // an error: the consumer's checkpoint advances past the rewrite
    val empty = IcebergTableReader.incrementalSince(spark, table, s2)
    assert(empty.isEmpty)
    assert(empty.columns.contains("_snapshot_id") && empty.columns.contains("id"))
    // an overwrite-class snapshot in range still refuses
    IcebergTableWriter.delete(spark, table, col("id") <= 5L): Unit
    val e = intercept[IllegalStateException](
      IcebergTableReader.incrementalSince(spark, table, s2))
    assert(e.getMessage.contains("not an append"))
  }

  test("Iceberg snapshot expiry: metadata trims, expired-only files leave, shared files stay") {
    val table = tmpDir("svc-expire") + "/t"
    IcebergTableWriter.create(df(1 to 30), table): Unit
    IcebergTableWriter.append(df(31 to 60), table): Unit
    IcebergTableWriter.append(df(61 to 90), table): Unit
    val (snapsBefore, _) = IcebergTableReader.snapshotLog(spark, table)
    assert(snapsBefore.size == 3)
    val listOfS1 = snapsBefore.head.manifestList
    val expired = IcebergTableWriter.expireSnapshots(spark, table, keepLast = 1)
    assert(expired == Seq(1L, 2L))
    val (snapsAfter, currentId) = IcebergTableReader.snapshotLog(spark, table)
    assert(snapsAfter.map(_.id) == Seq(3L) && currentId == 3L)
    // the current snapshot serves everything (manifest reuse keeps
    // every data file referenced by the retained snapshot)
    assert(IcebergTableReader.snapshot(spark, table).count() == 90L)
    // expired manifest LISTS are gone; shared manifests/data stay
    assert(!new java.io.File(table, listOfS1).exists())
    // time travel to an expired id refuses at resolution
    val e = intercept[IllegalArgumentException](
      IcebergTableReader.snapshotAsOf(spark, table, 1L))
    assert(e.getMessage.contains("not in the metadata log"))
    // incremental from an expired checkpoint refuses (not on the chain)
    val e2 = intercept[IllegalArgumentException](
      IcebergTableReader.incrementalSince(spark, table, 1L))
    assert(e2.getMessage.contains("missing from the log") ||
      e2.getMessage.contains("not an ancestor"))
    // schemas/partition-specs survived the JSON-tree rewrite: appends
    // keep working on the trimmed metadata
    IcebergTableWriter.append(df(91 to 100), table): Unit
    assert(IcebergTableReader.snapshot(spark, table).count() == 100L)
    // nothing retained: keepLast >= size is a no-op
    assert(IcebergTableWriter.expireSnapshots(spark, table, keepLast = 10).isEmpty)
  }
}
