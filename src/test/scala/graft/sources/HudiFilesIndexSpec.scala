package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Files-index contract (the metadata-table `files` partition):
  * head-of-timeline planning starts FROM the index and replays only
  * the instants after it — the indexed instants' commit meta files
  * are never opened (proven by corrupting them), and the plan is at
  * exact parity with the full replay.
  */
class HudiFilesIndexSpec extends SparkSpec {

  private def df(r: Range, v: Long => Long = _ * 2L) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"k$i", v(i.toLong))).toDF("id", "key", "v")
  }

  test("COW: indexed planning never opens pre-index metas; parity with full replay") {
    val table = tmpDir("hfidx-cow") + "/t"
    val c1 = HudiTableWriter.create(df(1 to 40).repartition(3), table,
      recordKeys = Seq("id"))
    HudiTableWriter.append(df(41 to 60), table): Unit
    // plan parity: the same input-file set with and without the index
    val replayFiles = HudiTableReader.snapshot(spark, table).inputFiles.sorted.toSeq
    val idxInstant = HudiTableWriter.writeFilesIndex(spark, table)
    assert(new java.io.File(s"$table/.hoodie/metadata/files/$idxInstant.parquet").exists())
    val indexedFiles = HudiTableReader.snapshot(spark, table).inputFiles.sorted.toSeq
    assert(indexedFiles == replayFiles, "index plan must equal the replay plan")
    // corrupt every pre-index commit meta: planning must not read them
    val hoodie = new java.io.File(s"$table/.hoodie")
    val metas = hoodie.listFiles().filter(_.getName.endsWith(".commit"))
    metas.foreach(f => java.nio.file.Files.write(f.toPath, "garbage".getBytes("UTF-8")))
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.count() == 60L)
    assert(snap.where(col("id") === 50L).head().getAs[Long]("v") == 100L)
    // a NEW commit after the index replays incrementally on top
    metas.head // (pre-index metas stay corrupt)
    HudiTableWriter.append(df(61 to 70), table): Unit
    assert(HudiTableReader.snapshot(spark, table).count() == 70L)
    // point-in-time reads (which bypass the index) need real metas —
    // the corrupt ones refuse loudly rather than serving wrong data
    intercept[Exception](
      HudiTableReader.snapshotAsOf(spark, table, c1).count())
  }

  test("MOR: pending logs ride the index; post-index log appends replay on top") {
    val s = spark
    import s.implicits._
    val table = tmpDir("hfidx-mor") + "/t"
    HudiTableWriter.createMor(df(1 to 20), table, recordKeys = Seq("id")): Unit
    HudiTableWriter.updateLog(Seq((3L, "k3", 333L)).toDF("id", "key", "v"), table): Unit
    HudiTableWriter.writeFilesIndex(spark, table): Unit
    // corrupt the pre-index metas; real-time view must still merge
    val hoodie = new java.io.File(s"$table/.hoodie")
    hoodie.listFiles().filter(_.getName.endsWith(".deltacommit"))
      .foreach(f => java.nio.file.Files.write(f.toPath, "garbage".getBytes("UTF-8")))
    val rt = HudiTableReader.snapshot(spark, table)
    assert(rt.count() == 20L)
    assert(rt.where($"id" === 3L).head().getAs[Long]("v") == 333L)
    // a post-index log append replays ON TOP of the indexed state
    HudiTableWriter.updateLog(Seq((7L, "k7", 777L)).toDF("id", "key", "v"), table): Unit
    val rt2 = HudiTableReader.snapshot(spark, table)
    assert(rt2.where($"id" === 7L).head().getAs[Long]("v") == 777L)
    assert(rt2.where($"id" === 3L).head().getAs[Long]("v") == 333L)
  }

  test("an index whose instant left the timeline is ignored, not trusted") {
    val table = tmpDir("hfidx-stale") + "/t"
    HudiTableWriter.create(df(1 to 10), table, recordKeys = Seq("id")): Unit
    HudiTableWriter.writeFilesIndex(spark, table): Unit
    // rename the index to an instant the timeline never saw
    val dir = new java.io.File(s"$table/.hoodie/metadata/files")
    val idx = dir.listFiles().head
    assert(idx.renameTo(new java.io.File(dir, "99999999999999999.parquet")))
    // planning falls back to the full replay and stays correct
    assert(HudiTableReader.snapshot(spark, table).count() == 10L)
  }

  test("col-stats skipping: provable misses prune, unindexed files keep, MOR refuses") {
    val s = spark
    import s.implicits._
    val table = tmpDir("hcs-skip") + "/t"
    // range-clustered layout: 4 files with disjoint id ranges
    HudiTableWriter.create(
      df(1 to 400).repartitionByRange(4, col("id")), table, recordKeys = Seq("id")): Unit
    HudiTableWriter.writeColStatsIndex(spark, table, Seq("id", "v")): Unit
    val all = HudiTableReader.activeSlices(spark, table).size
    assert(all == 4)
    val skipped = HudiTableReader.snapshotSkipping(spark, table, "id", 50.0, 120.0)
    assert(skipped.inputFiles.length < all,
      s"disjoint ranges must prune (${skipped.inputFiles.length} of $all)")
    assert(skipped.where(col("id").between(50, 120)).count() == 71L)
    // files appended AFTER the index are conservatively kept
    HudiTableWriter.append(df(401 to 410), table): Unit
    val after = HudiTableReader.snapshotSkipping(spark, table, "id", 405.0, 406.0)
    assert(after.where(col("id").between(405, 406)).count() == 2L,
      "post-index files must be KEPT, not skipped")
    // a provably-empty interval keeps only the UNINDEXED post-append
    // files (conservative), and the residual filter yields zero rows
    val allNow = HudiTableReader.activeSlices(spark, table).size
    val empty = HudiTableReader.snapshotSkipping(spark, table, "id", 1e9, 2e9)
    assert(empty.inputFiles.length == allNow - 4,
      s"exactly the 4 indexed files must prune (kept ${empty.inputFiles.length} of $allNow)")
    assert(empty.where(col("id") >= 1e9).count() == 0L)
    // MOR tables build GROUP-GRAINED and LOG-AWARE (the compact-first
    // refusal is lifted — HudiIncrementalIndexSpec covers the depth)
    val mor = tmpDir("hcs-mor") + "/t"
    HudiTableWriter.createMor(df(1 to 10), mor, recordKeys = Seq("id")): Unit
    HudiTableWriter.writeColStatsIndex(spark, mor, Seq("id")): Unit
    assert(HudiTableReader.snapshotSkipping(spark, mor, "id", 1.0, 10.0).count() == 10L)
  }
}
