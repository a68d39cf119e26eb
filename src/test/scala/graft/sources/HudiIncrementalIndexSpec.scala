package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** INCREMENTAL metadata-index maintenance (hudi.apache.org: the
  * metadata table folds index updates in per commit — a full rebuild
  * is the O(table) scan the index exists to avoid). Record-index
  * refreshes land delta generations re-enumerating only the touched
  * file groups; col-stats refreshes scan only files absent from the
  * newest index. Both paths require-prove the scan never escapes its
  * increment.
  */
class HudiIncrementalIndexSpec extends SparkSpec {

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"k${i % 5}", i * 2L)).toDF("id", "key", "v")
  }

  private def deltaDirs(table: String): Seq[String] =
    Option(new java.io.File(s"$table/.hoodie/metadata/record_index").listFiles())
      .map(_.toSeq.filter(f => f.isDirectory && f.getName.endsWith(".delta")).map(_.getName))
      .getOrElse(Nil)

  test("record index folds three upserts incrementally: lookups stay exact, deltas land, base stays") {
    val table = tmpDir("ridx-inc") + "/t"
    val s = spark
    import s.implicits._
    HudiTableWriter.create(df(1 to 30), table, recordKeys = Seq("id")): Unit
    HudiTableWriter.append(df(31 to 60), table): Unit
    HudiTableWriter.append(df(61 to 90), table): Unit
    val baseInstant = HudiTableWriter.writeRecordIndex(spark, table)
    // upsert #1 rewrites the group holding id=42
    HudiTableWriter.upsert(Seq((42L, "k2", 1001L)).toDF("id", "key", "v"), table): Unit
    val d1 = HudiTableWriter.refreshRecordIndex(spark, table)
    assert(d1 > baseInstant && deltaDirs(table).size == 1)
    val u1 = HudiTableReader.pointLookup(spark, table, Seq(42L))
    assert(u1.count() == 1L && u1.head().getAs[Long]("v") == 1001L)
    // the lookup prunes: matched group only (no post-index touched
    // fallback needed — the delta covers the upsert's instant)
    assert(HudiTableReader.pointLookupFiles(spark, table, Seq(42L)).size == 1)
    // upsert #2: a NEW key (insert path) plus another update
    HudiTableWriter.upsert(Seq((991L, "k1", 7L), (10L, "k0", 2002L)).toDF("id", "key", "v"),
      table): Unit
    val d2 = HudiTableWriter.refreshRecordIndex(spark, table)
    assert(d2 > d1 && deltaDirs(table).size == 2)
    assert(HudiTableReader.pointLookup(spark, table, Seq(991L)).count() == 1L)
    assert(HudiTableReader.pointLookup(spark, table, Seq(10L))
      .head().getAs[Long]("v") == 2002L)
    // upsert #3: the SAME key moves value again — newest delta wins
    HudiTableWriter.upsert(Seq((42L, "k2", 3003L)).toDF("id", "key", "v"), table): Unit
    val d3 = HudiTableWriter.refreshRecordIndex(spark, table)
    assert(d3 > d2 && deltaDirs(table).size == 3)
    val u3 = HudiTableReader.pointLookup(spark, table, Seq(42L))
    assert(u3.count() == 1L && u3.head().getAs[Long]("v") == 3003L)
    // untouched pre-index keys still resolve through the base
    assert(HudiTableReader.pointLookup(spark, table, Seq(77L)).count() == 1L)
    // absent keys stay empty — a covered group's stale binding never
    // widens the answer
    assert(HudiTableReader.pointLookup(spark, table, Seq(123456L)).isEmpty)
    // the full multi-key cut stays under the snapshot's file set
    val files = HudiTableReader.pointLookupFiles(spark, table, Seq(42L, 77L, 991L))
    assert(files.size < HudiTableReader.activeSlices(spark, table).size)
    // a no-op refresh (nothing after the head) returns the head
    assert(HudiTableWriter.refreshRecordIndex(spark, table) == d3)
  }

  test("clustering rewires groups: refresh covers replaced ids, moved keys resolve, stale bindings die") {
    val table = tmpDir("ridx-cluster") + "/t"
    HudiTableWriter.create(df(1 to 40), table, recordKeys = Seq("id")): Unit
    HudiTableWriter.append(df(41 to 80), table): Unit
    HudiTableWriter.writeRecordIndex(spark, table): Unit
    // clustering replaces every group — keys MOVE to new file groups
    HudiTableWriter.cluster(spark, table, targetGroups = 2): Unit
    HudiTableWriter.refreshRecordIndex(spark, table): Unit
    val got = HudiTableReader.pointLookup(spark, table, Seq(13L))
    assert(got.count() == 1L && got.head().getAs[Long]("v") == 26L)
    // the resolved group is a CLUSTERED group, not the dead one
    val files = HudiTableReader.pointLookupFiles(spark, table, Seq(13L))
    val active = HudiTableReader.activeSlices(spark, table).map(_.fileId).toSet
    assert(files.map(_.fileId).toSet.subsetOf(active))
    assert(files.size == 1)
  }

  test("maxDeltas compacts: the refresh rebuilds the base and clears the delta chain") {
    val table = tmpDir("ridx-compact") + "/t"
    val s = spark
    import s.implicits._
    HudiTableWriter.create(df(1 to 30), table, recordKeys = Seq("id")): Unit
    HudiTableWriter.writeRecordIndex(spark, table): Unit
    HudiTableWriter.upsert(Seq((1L, "k1", 11L)).toDF("id", "key", "v"), table): Unit
    HudiTableWriter.refreshRecordIndex(spark, table): Unit
    HudiTableWriter.upsert(Seq((2L, "k2", 22L)).toDF("id", "key", "v"), table): Unit
    HudiTableWriter.refreshRecordIndex(spark, table): Unit
    assert(deltaDirs(table).size == 2)
    // the chain hit the cap: this refresh compacts to a fresh base
    HudiTableWriter.upsert(Seq((3L, "k3", 33L)).toDF("id", "key", "v"), table): Unit
    HudiTableWriter.refreshRecordIndex(spark, table, maxDeltas = 2): Unit
    assert(deltaDirs(table).isEmpty, "compaction must clear superseded deltas")
    assert(HudiTableReader.pointLookup(spark, table, Seq(3L))
      .head().getAs[Long]("v") == 33L)
    assert(HudiTableReader.pointLookup(spark, table, Seq(1L))
      .head().getAs[Long]("v") == 11L)
  }

  test("col-stats refresh scans only NEW files, drops dead entries, keeps skipping exact") {
    val table = tmpDir("cstats-inc") + "/t"
    val s = spark
    import s.implicits._
    val mk = (r: Range) => r.map(i => (i.toLong, i * 10L)).toDF("id", "m")
      .repartitionByRange(2, col("id"))
    HudiTableWriter.create(mk(1 to 100), table, recordKeys = Seq("id")): Unit
    HudiTableWriter.writeColStatsIndex(spark, table, Seq("m")): Unit
    // refusal without an index comes first-class
    val bare = tmpDir("cstats-bare") + "/t"
    HudiTableWriter.create(mk(1 to 10), bare): Unit
    val e = intercept[IllegalArgumentException](
      HudiTableWriter.refreshColStatsIndex(spark, bare))
    assert(e.getMessage.contains("writeColStatsIndex first"))
    // append a disjoint range, refresh: only the new files scan
    HudiTableWriter.append(mk(201 to 300), table): Unit
    val head = HudiTableWriter.refreshColStatsIndex(spark, table)
    assert(head == HudiTableReader.latestInstant(spark, table))
    // skipping serves exactly through the refreshed index: the high
    // band reads only the appended files
    val all = HudiTableReader.activeSlices(spark, table).size
    val hi = HudiTableReader.snapshotSkipping(spark, table, "m", 2500.0, 2700.0)
    assert(hi.inputFiles.length < all,
      s"refreshed stats must cut the file set (${hi.inputFiles.length} of $all)")
    assert(hi.where(col("m") >= 2500 && col("m") <= 2700).count() == 21L)
    // an upsert rewrites a group: its old file's entry must DIE and
    // the new file's stats must serve (no stale range widens/narrows)
    HudiTableWriter.upsert(Seq((50L, 99999L)).toDF("id", "m"), table): Unit
    HudiTableWriter.refreshColStatsIndex(spark, table): Unit
    val top = HudiTableReader.snapshotSkipping(spark, table, "m", 99000.0, 100000.0)
    assert(top.where(col("m") >= 99000).count() == 1L)
    val idxDir = new java.io.File(s"$table/.hoodie/metadata/col_stats")
    assert(idxDir.listFiles().count(_.getName.endsWith(".parquet")) >= 3)
    // a second no-op refresh returns the same head
    assert(HudiTableWriter.refreshColStatsIndex(spark, table) ==
      HudiTableReader.latestInstant(spark, table))
  }

  test("MOR col-stats: log-aware group stats, stale-group keep, refresh recomputes only touched groups") {
    val table = tmpDir("cstats-mor") + "/t"
    val s = spark
    import s.implicits._
    val mk = (r: Range) => r.map(i => (i.toLong, i * 10L)).toDF("id", "m")
      .repartitionByRange(3, col("id"))
    HudiTableWriter.createMor(mk(1 to 90), table, recordKeys = Seq("id")): Unit
    // a LOG upsert widens one group's range far beyond its base
    HudiTableWriter.upsert(Seq((5L, 777777L)).toDF("id", "m"), table): Unit
    HudiTableWriter.writeColStatsIndex(spark, table, Seq("m")): Unit
    // the band only the log value hits keeps exactly that group
    val all = HudiTableReader.snapshot(spark, table).inputFiles.length
    val hot = HudiTableReader.snapshotSkipping(spark, table, "m", 700000.0, 800000.0)
    assert(hot.inputFiles.length < all,
      s"group stats must cut the base-file set (${hot.inputFiles.length} of $all)")
    assert(hot.where(col("m") === 777777L).count() == 1L,
      "the log-widened group must survive the prune")
    // post-index log activity: the group's stats are STALE — it must
    // keep conservatively even when its indexed range misses
    HudiTableWriter.upsert(Seq((50L, 888888L)).toDF("id", "m"), table): Unit
    val hot2 = HudiTableReader.snapshotSkipping(spark, table, "m", 880000.0, 890000.0)
    assert(hot2.where(col("m") === 888888L).count() == 1L,
      "a post-index log write must not be pruned on stale stats")
    // the refresh recomputes ONLY the touched group (require-proven
    // inside), and the new range then serves through the index
    HudiTableWriter.refreshColStatsIndex(spark, table): Unit
    val hot3 = HudiTableReader.snapshotSkipping(spark, table, "m", 880000.0, 890000.0)
    assert(hot3.inputFiles.length < all)
    assert(hot3.where(col("m") === 888888L).count() == 1L)
  }
}
