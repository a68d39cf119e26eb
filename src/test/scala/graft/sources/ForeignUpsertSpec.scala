package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** UPSERT (merge) into all three foreign formats — the operation the
  * reference's own generator runs against Hudi
  * (generate_hudi_table.py:97-115, operation=upsert), here completed
  * across the interop surface: Hudi COW rewrites matched file groups
  * (new slice, same fileId, carried rows keep their stamps), Delta
  * masks matched rows with deletion vectors and appends the batch in
  * ONE commit, Iceberg lands an equality-delete file plus the batch
  * in ONE snapshot (the Flink-CDC shape — no table scan at write
  * time).
  */
class ForeignUpsertSpec extends SparkSpec {

  private def df(r: Range, v: Long => Long = _ * 2L) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"k$i", v(i.toLong))).toDF("id", "key", "v")
  }

  // ---------------------------------------------------------------- Hudi

  test("hudi: upsert rewrites matched groups in place, inserts new keys; stamps drive incremental") {
    val table = tmpDir("hup-basic") + "/t"
    val c1 = HudiTableWriter.create(df(1 to 60), table, recordKeys = Seq("id"))
    val fidOf: Map[Long, String] = {
      val snap = HudiTableReader.snapshot(spark, table)
        .withColumn("_f", col("_metadata.file_path"))
      snap.select(col("id"), col("_f")).collect()
        .map(r => r.getLong(0) -> r.getString(1).split('/').last.split('_').head).toMap
    }
    // batch: update ids 10..20 (v := id*100), insert ids 61..70
    val batch = df(10 to 20, _ * 100L).union(df(61 to 70))
    val c2 = HudiTableWriter.upsert(batch, table)
    assert(c2 > c1)
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.count() == 70L)
    // replaced rows carry the new value AND the new stamp
    val upd = snap.where(col("id") === 15L).head()
    assert(upd.getAs[Long]("v") == 1500L)
    assert(upd.getAs[String]("_hoodie_commit_time") == c2)
    // carried rows keep value AND ORIGINAL stamp — the incremental contract
    val kept = snap.where(col("id") === 5L).head()
    assert(kept.getAs[Long]("v") == 10L)
    assert(kept.getAs[String]("_hoodie_commit_time") == c1)
    // the matched group was rewritten UNDER ITS OWN fileId (a new
    // slice of the same group, not a new group)
    val fidAfter = HudiTableReader.snapshot(spark, table)
      .withColumn("_f", col("_metadata.file_path"))
      .where(col("id") === 15L)
      .select("_f").head().getString(0).split('/').last.split('_').head
    assert(fidAfter == fidOf(15L), "update must stay in its file group")
    // incremental pull since c1 = exactly the 11 updates + 10 inserts
    val inc = HudiTableReader.incrementalSince(spark, table, c1)
    assert(inc.count() == 21L)
    assert(inc.where(col("id") === 15L).head().getAs[Long]("v") == 1500L)
    // the commit records update stats against the prior instant
    val commitJson = scala.io.Source.fromFile(
      s"$table/.hoodie/$c2.commit").mkString
    assert(commitJson.contains(""""operationType":"UPSERT""""))
    assert(commitJson.contains(s""""prevCommit":"$c1""""))
    // the 11 updated keys may span several file groups — the per-group
    // update counts must SUM to 11
    val updTotal = """"numUpdateWrites":(\d+)""".r
      .findAllMatchIn(commitJson).map(_.group(1).toLong).sum
    assert(updTotal == 11L, s"per-group numUpdateWrites must sum to 11, got $updTotal")
  }

  test("hudi: precombine resolves in-batch duplicates latest-wins; without it they refuse") {
    val s = spark
    import s.implicits._
    val table = tmpDir("hup-precombine") + "/t"
    HudiTableWriter.create(df(1 to 10), table, recordKeys = Seq("id"),
      precombineField = Some("v")): Unit
    // two rows for id=3: precombine v picks the larger
    val batch = Seq((3L, "k3-old", 7L), (3L, "k3-new", 9L)).toDF("id", "key", "v")
    HudiTableWriter.upsert(batch, table): Unit
    val row = HudiTableReader.snapshot(spark, table).where(col("id") === 3L).head()
    assert(row.getAs[String]("key") == "k3-new" && row.getAs[Long]("v") == 9L)

    val noPc = tmpDir("hup-nopc") + "/t"
    HudiTableWriter.create(df(1 to 10), noPc, recordKeys = Seq("id")): Unit
    val e = intercept[Exception](HudiTableWriter.upsert(batch, noPc))
    assert(e.getMessage.contains("duplicate") || e.getMessage.contains("unique"),
      s"got: ${e.getMessage}")
  }

  test("hudi: partition-scoped matching — same key in another partition inserts, old row stays") {
    val s = spark
    import s.implicits._
    val table = tmpDir("hup-part") + "/t"
    val base = Seq((1L, "us", 10L), (2L, "us", 20L), (3L, "eu", 30L))
      .toDF("id", "region", "v")
    HudiTableWriter.create(base, table, recordKeys = Seq("id"),
      partitionBy = Seq("region")): Unit
    // id=1 in its own partition: update; id=3 under a NEW partition: insert
    val batch = Seq((1L, "us", 11L), (3L, "us", 33L)).toDF("id", "region", "v")
    HudiTableWriter.upsert(batch, table): Unit
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.count() == 4L, "partition-scoped index: the eu row must survive")
    assert(snap.where(col("id") === 1L).head().getAs[Long]("v") == 11L)
    assert(snap.where(col("id") === 3L && col("region") === "eu").head()
      .getAs[Long]("v") == 30L)
    assert(snap.where(col("id") === 3L && col("region") === "us").head()
      .getAs[Long]("v") == 33L)
  }

  test("hudi MOR upsert: ONE deltacommit — log blocks for matched keys, new groups for unseen") {
    val table = tmpDir("hup-mor") + "/t"
    HudiTableWriter.createMor(df(1 to 20), table, recordKeys = Seq("id")): Unit
    val before = new java.io.File(s"$table/.hoodie").listFiles()
      .count(_.getName.endsWith(".deltacommit"))
    // batch: updates 5..8, inserts 21..25 — the MOR shape: no base rewritten
    val baseFiles = new java.io.File(table).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    HudiTableWriter.upsert(df(5 to 8, _ * 100L).union(df(21 to 25)), table): Unit
    assert(new java.io.File(s"$table/.hoodie").listFiles()
      .count(_.getName.endsWith(".deltacommit")) == before + 1,
      "the whole merge must be ONE deltacommit")
    assert(baseFiles.subsetOf(new java.io.File(table).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet),
      "no pre-existing base file is rewritten — updates ride the log")
    assert(new java.io.File(table).listFiles().exists(_.getName.contains(".log.")),
      "matched keys must land as log files")
    val rt = HudiTableReader.snapshot(spark, table)
    assert(rt.count() == 25L)
    assert(rt.where(col("id") === 6L).head().getAs[Long]("v") == 600L)
    assert(rt.where(col("id") === 23L).head().getAs[Long]("v") == 46L)
    assert(rt.where(col("id") === 3L).head().getAs[Long]("v") == 6L)
    // compaction folds; the dispatch works through TableLoader too
    HudiTableWriter.compact(spark, table): Unit
    assert(HudiTableReader.readOptimized(spark, table).count() == 25L)
    TableLoader.upsert(df(6 to 6, _ => 7L), table, Seq("id")): Unit
    assert(HudiTableReader.snapshot(spark, table)
      .where(col("id") === 6L).head().getAs[Long]("v") == 7L)
  }

  test("hudi: refusals — schema drift, keyless tables") {
    val s = spark
    import s.implicits._
    val cow = tmpDir("hup-drift") + "/t"
    HudiTableWriter.create(df(1 to 10), cow, recordKeys = Seq("id")): Unit
    val e2 = intercept[IllegalArgumentException](
      HudiTableWriter.upsert(Seq((1L, "x")).toDF("id", "key"), cow))
    assert(e2.getMessage.contains("ADDITIVE"), e2.getMessage)

    val keyless = tmpDir("hup-keyless") + "/t"
    HudiTableWriter.create(df(1 to 10), keyless): Unit
    val e3 = intercept[IllegalArgumentException](HudiTableWriter.upsert(df(1 to 2), keyless))
    assert(e3.getMessage.contains("record key"))
  }

  // ---------------------------------------------------------------- Delta

  test("delta: upsert masks matched rows via DVs and appends the batch in ONE commit") {
    val table = tmpDir("dup-basic") + "/t"
    DeltaTableWriter.create(df(1 to 60), table): Unit
    def dataFiles(): Set[String] = new java.io.File(table).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val before = dataFiles()
    val v0 = DeltaTableReader.snapshotState(spark, table).version
    val batch = df(10 to 20, _ * 100L).union(df(61 to 70))
    val v1 = DeltaTableWriter.upsert(batch, table, Seq("id"))
    assert(v1 == v0 + 1, "the merge must be ONE atomic commit")
    assert(dataFiles().intersect(before) == before,
      "matched rows are DV-masked — no pre-existing data file is rewritten or removed")
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.count() == 70L)
    assert(snap.where(col("id") === 15L).head().getAs[Long]("v") == 1500L)
    assert(snap.where(col("id") === 5L).head().getAs[Long]("v") == 10L)
    assert(snap.where(col("id") === 65L).head().getAs[Long]("v") == 130L)
    // a second upsert layers fresh vectors over the first
    DeltaTableWriter.upsert(df(15 to 16, _ => 7L), table, Seq("id")): Unit
    val snap2 = DeltaTableReader.snapshot(spark, table)
    assert(snap2.count() == 70L)
    assert(snap2.where(col("id") === 15L).head().getAs[Long]("v") == 7L)
  }

  test("delta: changeFeedSince serves an upsert commit as CDC — pre-image deletes + inserts; the fold reproduces the snapshot") {
    val table = tmpDir("dup-cdc") + "/t"
    DeltaTableWriter.create(df(1 to 40), table): Unit
    val batch = df(5 to 10, _ * 100L).union(df(41 to 45))
    DeltaTableWriter.upsert(batch, table, Seq("id")): Unit
    val feed = DeltaTableReader.changeFeedSince(spark, table, sinceVersion = 0L)
    val dels = feed.where(col("_change_type") === "delete")
    val ins = feed.where(col("_change_type") === "insert")
    // deletes: PRE-IMAGES of the six replaced rows, original values
    assert(dels.count() == 6L)
    assert(dels.where(col("id") === 7L).head().getAs[Long]("v") == 14L)
    // inserts: the whole batch (6 replacements + 5 new keys)
    assert(ins.count() == 11L)
    assert(ins.where(col("id") === 7L).head().getAs[Long]("v") == 700L)
    // fold: v0 snapshot minus deleted rows plus inserts == current
    val v0 = DeltaTableReader.snapshotAsOf(spark, table, 0L).select("id", "key", "v")
    val folded = v0.join(dels.select("id", "key", "v"), Seq("id", "key", "v"), "left_anti")
      .unionByName(ins.select("id", "key", "v"))
    val now = DeltaTableReader.snapshot(spark, table).select("id", "key", "v")
    assert(folded.exceptAll(now).isEmpty && now.exceptAll(folded).isEmpty,
      "the folded feed must reproduce the post-upsert snapshot")
  }

  test("delta: the DISTRIBUTED DV build past the driver bound matches the driver build exactly") {
    // same table, same operations — one side forced through the
    // distributed per-file-task sidecar build (maxDriverRows = 0)
    val a = tmpDir("dvd-driver") + "/t"
    val b = tmpDir("dvd-dist") + "/t"
    Seq(a, b).foreach(t => DeltaTableWriter.create(df(1 to 200), t): Unit)
    DeltaTableWriter.delete(spark, a, col("id") % 3 === 0): Unit
    DeltaTableWriter.delete(spark, b, col("id") % 3 === 0, maxDriverRows = 0): Unit
    // second delete MERGES with the first's vectors on both paths
    DeltaTableWriter.delete(spark, a, col("id") % 7 === 0): Unit
    DeltaTableWriter.delete(spark, b, col("id") % 7 === 0, maxDriverRows = 0): Unit
    val sa = DeltaTableReader.snapshot(spark, a).select("id", "key", "v")
    val sb = DeltaTableReader.snapshot(spark, b).select("id", "key", "v")
    assert(sa.exceptAll(sb).isEmpty && sb.exceptAll(sa).isEmpty,
      "driver and distributed DV builds must serve identical snapshots")
    assert(sb.count() == (1 to 200).count(i => i % 3 != 0 && i % 7 != 0).toLong)
    // upsert through the distributed path too
    DeltaTableWriter.upsert(df(10 to 20, _ => 5L), b, Seq("id"), maxDriverRows = 0): Unit
    val after = DeltaTableReader.snapshot(spark, b)
    assert(after.where(col("id") === 11L).head().getAs[Long]("v") == 5L)
    assert(after.count() == sb.count() +
      (10 to 20).count(i => i % 3 == 0 || i % 7 == 0).toLong,
      "masked keys in the batch come back as fresh rows; live ones replace")
  }

  test("delta: unmatched batch degrades to pure append; duplicate batch keys refuse") {
    val table = tmpDir("dup-append") + "/t"
    DeltaTableWriter.create(df(1 to 20), table): Unit
    DeltaTableWriter.upsert(df(21 to 30), table, Seq("id")): Unit
    assert(DeltaTableReader.snapshot(spark, table).count() == 30L)
    val dup = df(5 to 5).union(df(5 to 5))
    val e = intercept[IllegalArgumentException](
      DeltaTableWriter.upsert(dup, table, Seq("id")))
    assert(e.getMessage.contains("duplicate"))
  }

  test("delta: RESTORE re-points to a past version in one commit; history and refusals hold") {
    val table = tmpDir("drestore") + "/t"
    DeltaTableWriter.create(df(1 to 30), table): Unit                      // v0
    DeltaTableWriter.append(df(31 to 50), table): Unit                     // v1
    DeltaTableWriter.delete(spark, table, col("id") % 10 === 0): Unit      // v2 (DV)
    assert(DeltaTableReader.snapshot(spark, table).count() == 45L)
    // restore to v1: the DV commit unwinds (files re-add WITHOUT vectors)
    val v3 = DeltaTableWriter.restore(spark, table, 1L)
    assert(v3 == 3L)
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.count() == 50L, "the restore must resurrect the DV-masked rows")
    // restore to v0: the appended file drops
    DeltaTableWriter.restore(spark, table, 0L): Unit
    assert(DeltaTableReader.snapshot(spark, table).count() == 30L)
    // history preserved: the pre-restore states still time-travel
    assert(DeltaTableReader.snapshotAsOf(spark, table, 2L).count() == 45L)
    assert(DeltaTableReader.snapshotAsOf(spark, table, 3L).count() == 50L)
    // no-op restore refuses
    val e = intercept[IllegalArgumentException](DeltaTableWriter.restore(spark, table, 0L))
    assert(e.getMessage.contains("nothing to restore"))
    // incremental consumers refuse across the restore (rewrite contract)
    val e2 = intercept[IllegalStateException](
      DeltaTableReader.incrementalSince(spark, table, 2L))
    assert(e2.getMessage.contains("removes data files"))
  }

  test("iceberg: tags pin snapshots — time travel by name, expiry refuses, refs survive commits") {
    val table = tmpDir("irefs") + "/t"
    val s1 = IcebergTableWriter.create(df(1 to 20), table)
    IcebergTableWriter.setRef(spark, table, "v1.0", s1)
    IcebergTableWriter.append(df(21 to 40), table): Unit
    IcebergTableWriter.upsert(df(5 to 6, _ => 9L), table, Seq("id")): Unit
    // the tag still reads the pinned snapshot, by NAME
    val tagged = IcebergTableReader.snapshotAsOfRef(spark, table, "v1.0")
    assert(tagged.count() == 20L)
    assert(tagged.where(col("id") === 5L).head().getAs[Long]("v") == 10L,
      "the tag must serve the PRE-upsert state")
    // refs carried forward verbatim across commits; main advanced
    val refs = IcebergTableReader.refs(spark, table)
    assert(refs("v1.0")._1 == s1 && refs("v1.0")._2 == "tag")
    assert(refs("main")._1 == IcebergTableReader.snapshotLog(spark, table)._2)
    // expiry refuses while the tag pins an expiring snapshot
    val e = intercept[IllegalArgumentException](
      IcebergTableWriter.expireSnapshots(spark, table, keepLast = 1))
    assert(e.getMessage.contains("pin"))
    // unknown refs and out-of-history ids refuse
    val e2 = intercept[IllegalArgumentException](
      IcebergTableReader.snapshotAsOfRef(spark, table, "nope"))
    assert(e2.getMessage.contains("no ref named"))
    val e3 = intercept[IllegalArgumentException](
      IcebergTableWriter.setRef(spark, table, "x", 999L))
    assert(e3.getMessage.contains("not in the metadata log"))
  }

  // ---------------------------------------------------------------- Iceberg

  test("iceberg: upsert = equality-delete + data files in ONE snapshot; older rows masked, batch survives") {
    val table = tmpDir("iup-basic") + "/t"
    IcebergTableWriter.create(df(1 to 40), table): Unit
    IcebergTableWriter.append(df(41 to 60), table): Unit
    val batch = df(10 to 20, _ * 100L).union(df(61 to 70))
    val snapId = IcebergTableWriter.upsert(batch, table, Seq("id"))
    val plan = IcebergTableReader.planFiles(spark, table)
    assert(plan.equalityDeletes.nonEmpty, "the merge must land a content=2 delete file")
    assert(plan.equalityDeletes.forall(_.equalityColumns == Seq("id")))
    val snap = IcebergTableReader.snapshot(spark, table)
    assert(snap.count() == 70L)
    assert(snap.where(col("id") === 15L).head().getAs[Long]("v") == 1500L)
    assert(snap.where(col("id") === 5L).head().getAs[Long]("v") == 10L)
    // the PREVIOUS snapshot still serves the pre-merge state (time travel)
    val (snaps, _) = IcebergTableReader.snapshotLog(spark, table)
    val prev = snaps.sortBy(_.id).takeRight(2).head
    assert(prev.id != snapId)
    val old = IcebergTableReader.snapshotAsOf(spark, table, prev.id)
    assert(old.count() == 60L)
    assert(old.where(col("id") === 15L).head().getAs[Long]("v") == 30L)
    // a second upsert with a DIFFERENT key set refuses (one key shape per table)
    val e = intercept[IllegalArgumentException](
      IcebergTableWriter.upsert(df(1 to 2), table, Seq("key")))
    assert(e.getMessage.contains("key"))
    // duplicate batch keys refuse
    val e2 = intercept[IllegalArgumentException](
      IcebergTableWriter.upsert(df(5 to 5).union(df(5 to 5)), table, Seq("id")))
    assert(e2.getMessage.contains("duplicate"))
  }

  test("iceberg: upsert on a PARTITIONED table — batch rows land partitioned, eq-delete applies across partitions") {
    val s = spark
    import s.implicits._
    val table = tmpDir("iup-part") + "/t"
    val base = (1 to 30).map(i => (i.toLong, s"p${i % 3}", i * 2L)).toDF("id", "part", "v")
    IcebergTableWriter.create(base, table, partitionBy = Seq("part")): Unit
    // update ids 4..6 (any partition) + insert 31..32
    val batch = ((4 to 6).map(i => (i.toLong, s"p${i % 3}", 555L)) ++
      (31 to 32).map(i => (i.toLong, s"p${i % 3}", i * 2L))).toDF("id", "part", "v")
    IcebergTableWriter.upsert(batch, table, Seq("id")): Unit
    val snap = IcebergTableReader.snapshot(spark, table)
    assert(snap.count() == 32L)
    assert(snap.where(col("id") === 5L).head().getAs[Long]("v") == 555L)
    assert(snap.where(col("id") === 7L).head().getAs[Long]("v") == 14L)
    // the batch's data files landed with manifest partition values —
    // pruning still cuts the file set
    val pruned = IcebergTableReader.planFilesPruned(spark, table,
      pv => pv.get("part").contains("p1"))
    assert(pruned.data.size < IcebergTableReader.planFiles(spark, table).data.size)
  }

  test("broadcast gate: past-the-gate upserts degrade to a shuffle join, identical results") {
    // maxBroadcastKeys = 0 forces the large-batch (shuffle semi/anti
    // join) path that a backfill-scale merge takes when broadcasting
    // the key set would blow Spark's 8 GiB cap — the lock is that the
    // path EXISTS and lands the same table a broadcast merge would
    val dTable = tmpDir("gate-delta") + "/t"
    DeltaTableWriter.create(df(1 to 60), dTable): Unit
    DeltaTableWriter.upsert(df(10 to 20, _ * 100L).union(df(61 to 70)), dTable,
      Seq("id"), maxBroadcastKeys = 0L): Unit
    val dSnap = DeltaTableReader.snapshot(spark, dTable)
    assert(dSnap.count() == 70L)
    assert(dSnap.where(col("id") === 15L).head().getAs[Long]("v") == 1500L)
    assert(dSnap.where(col("id") === 5L).head().getAs[Long]("v") == 10L)

    val hTable = tmpDir("gate-hudi") + "/t"
    HudiTableWriter.create(df(1 to 60), hTable, recordKeys = Seq("id")): Unit
    HudiTableWriter.upsert(df(10 to 20, _ * 100L).union(df(61 to 70)), hTable,
      maxBroadcastKeys = 0L): Unit
    val hSnap = HudiTableReader.snapshot(spark, hTable)
    assert(hSnap.count() == 70L)
    assert(hSnap.where(col("id") === 15L).head().getAs[Long]("v") == 1500L)
    assert(hSnap.where(col("id") === 5L).head().getAs[Long]("v") == 10L)
  }

  test("iceberg: a backfill-scale key set SHARDS its equality-delete files") {
    val table = tmpDir("iup-shard") + "/t"
    IcebergTableWriter.create(df(1 to 40), table): Unit
    // maxDeleteFileRows=8 forces sharding of the 20-key delete set
    IcebergTableWriter.upsert(df(11 to 30, _ * 10L), table, Seq("id"),
      maxDeleteFileRows = 8L): Unit
    val plan = IcebergTableReader.planFiles(spark, table)
    assert(plan.equalityDeletes.size >= 2,
      s"20 keys over maxRows=8 must shard, got ${plan.equalityDeletes.size} delete files")
    val snap = IcebergTableReader.snapshot(spark, table)
    assert(snap.count() == 40L)
    assert(snap.where(col("id") === 15L).head().getAs[Long]("v") == 150L)
    assert(snap.where(col("id") === 5L).head().getAs[Long]("v") == 10L)
  }

  test("iceberg: repeated upserts stack; each batch's rows survive its own delete") {
    val table = tmpDir("iup-stack") + "/t"
    IcebergTableWriter.create(df(1 to 10), table): Unit
    IcebergTableWriter.upsert(df(5 to 12, _ * 10L), table, Seq("id")): Unit
    IcebergTableWriter.upsert(df(8 to 15, _ * 1000L), table, Seq("id")): Unit
    val snap = IcebergTableReader.snapshot(spark, table)
    assert(snap.count() == 15L)
    assert(snap.where(col("id") === 3L).head().getAs[Long]("v") == 6L)
    assert(snap.where(col("id") === 6L).head().getAs[Long]("v") == 60L)
    assert(snap.where(col("id") === 12L).head().getAs[Long]("v") == 12000L)
  }
}
