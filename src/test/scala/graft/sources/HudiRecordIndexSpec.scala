package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The metadata-table RECORD INDEX (hudi.apache.org `record_index`
  * partition, graft shape): key → file group published from one
  * distributed scan; point lookups scan only the matched groups plus
  * anything touched after the index instant.
  */
class HudiRecordIndexSpec extends SparkSpec {

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"k${i % 5}", i * 2L)).toDF("id", "key", "v")
  }

  test("pointLookup scans only the key's group; post-index commits resolve via the touched set") {
    val table = tmpDir("ridx-basic") + "/t"
    HudiTableWriter.create(df(1 to 30), table, recordKeys = Seq("id")): Unit
    HudiTableWriter.append(df(31 to 60), table): Unit
    HudiTableWriter.append(df(61 to 90), table): Unit
    HudiTableWriter.writeRecordIndex(spark, table): Unit
    val total = HudiTableReader.snapshot(spark, table).inputFiles.length
    assert(total >= 3)
    // a pre-index key: exactly its one group scans
    val files = HudiTableReader.pointLookupFiles(spark, table, Seq(42L))
    assert(files.size == 1, s"one group expected, got ${files.map(_.path)}")
    val row = HudiTableReader.pointLookup(spark, table, Seq(42L))
    assert(row.count() == 1L && row.head().getAs[Long]("v") == 84L)
    // multiple keys across groups: still under the full set
    val multi = HudiTableReader.pointLookup(spark, table, Seq(5L, 45L, 85L))
    assert(multi.count() == 3L)
    assert(multi.inputFiles.length < total)
    // post-index append: the new key lives in a touched group
    HudiTableWriter.append(df(91 to 100), table): Unit
    val fresh = HudiTableReader.pointLookup(spark, table, Seq(95L))
    assert(fresh.count() == 1L)
    // post-index upsert: the UPDATED value serves (touched group wins)
    val s = spark
    import s.implicits._
    HudiTableWriter.upsert(Seq((42L, "k2", 999L)).toDF("id", "key", "v"), table): Unit
    val upd = HudiTableReader.pointLookup(spark, table, Seq(42L))
    assert(upd.count() == 1L && upd.head().getAs[Long]("v") == 999L)
    // an absent key returns empty without scanning the table
    val none = HudiTableReader.pointLookup(spark, table, Seq(123456L))
    assert(none.isEmpty)
  }

  test("fallback and refusals: no index scans everything correctly; MOR and keyless refuse; key-range clustering prunes index files") {
    val table = tmpDir("ridx-fallback") + "/t"
    HudiTableWriter.create(df(1 to 40), table, recordKeys = Seq("id")): Unit
    // no index yet: the full slice set serves, answer exact
    val got = HudiTableReader.pointLookup(spark, table, Seq(7L))
    assert(got.count() == 1L && got.head().getAs[Long]("v") == 14L)
    // the index directory is a key-range-clustered parquet DIR named
    // by its instant
    HudiTableWriter.writeRecordIndex(spark, table, indexFiles = 4): Unit
    val idxDirs = new java.io.File(s"$table/.hoodie/metadata/record_index").listFiles()
    assert(idxDirs.length == 1 && idxDirs.head.isDirectory)
    assert(idxDirs.head.listFiles().count(_.getName.endsWith(".parquet")) > 1,
      "the index must be a multi-file directory, not one serialized task")
    // keyless tables refuse
    val keyless = tmpDir("ridx-keyless") + "/t"
    HudiTableWriter.create(df(1 to 5), keyless): Unit
    val e1 = intercept[IllegalArgumentException](
      HudiTableWriter.writeRecordIndex(spark, keyless))
    assert(e1.getMessage.contains("record key"))
  }

  test("MOR log-aware build pre-compaction: log upserts index, tombstones drop, lookups prune to matched groups") {
    val table = tmpDir("ridx-mor") + "/t"
    val s = spark
    import s.implicits._
    // three groups via createMor + base-appending upserts of NEW keys
    HudiTableWriter.createMor(df(1 to 40), table, recordKeys = Seq("id")): Unit
    HudiTableWriter.upsert(df(41 to 80), table): Unit   // new keys → new base group(s)
    // log upserts: an UPDATE rides a log block; a DELETE tombstones
    HudiTableWriter.upsert(Seq((13L, "k3", 777L)).toDF("id", "key", "v"), table): Unit
    HudiTableWriter.deleteLog(Seq((20L, "k0", 40L)).toDF("id", "key", "v"), table): Unit
    // the index builds PRE-COMPACTION, folding log blocks in
    HudiTableWriter.writeRecordIndex(spark, table): Unit
    // log-updated value serves through the lookup
    val upd = HudiTableReader.pointLookup(spark, table, Seq(13L))
    assert(upd.count() == 1L && upd.head().getAs[Long]("v") == 777L,
      "the log upsert's value must serve through the index")
    // tombstoned key never resurrects
    assert(HudiTableReader.pointLookup(spark, table, Seq(20L)).isEmpty,
      "a log-deleted key must not resurrect via a stale base binding")
    // pruning: one key reads fewer base files than the realtime view
    val full = HudiTableReader.snapshot(spark, table).inputFiles.length
    val one = HudiTableReader.pointLookup(spark, table, Seq(55L))
    assert(one.count() == 1L && one.head().getAs[Long]("v") == 110L)
    assert(one.inputFiles.length < full,
      s"MOR lookup must cut the base-file set (${one.inputFiles.length} of $full)")
    // a post-index log upsert resolves through the touched set, and
    // the refresh folds it in as a delta
    HudiTableWriter.upsert(Seq((13L, "k3", 999L)).toDF("id", "key", "v"), table): Unit
    assert(HudiTableReader.pointLookup(spark, table, Seq(13L))
      .head().getAs[Long]("v") == 999L)
    HudiTableWriter.refreshRecordIndex(spark, table): Unit
    assert(HudiTableReader.pointLookup(spark, table, Seq(13L))
      .head().getAs[Long]("v") == 999L)
    assert(HudiTableReader.pointLookup(spark, table, Seq(20L)).isEmpty)
  }

  test("PLAN-LOCK: the index build scan stays vectorized — broadcast file→fileId join, no UDF node") {
    val table = tmpDir("ridx-plan") + "/t"
    HudiTableWriter.create(df(1 to 30).repartition(3), table, recordKeys = Seq("id")): Unit
    val entries = HudiTableWriter.recordEntriesOf(spark, table,
      HudiTableReader.activeSlices(spark, table))
    // semantics first (also finalizes the AQE plan so codegen spans
    // are visible in the executed tree): every record binds its group
    val rows = entries.collect()
    assert(rows.length == 30 && rows.forall(_.getString(1) != null))
    val planStr = entries.queryExecution.executedPlan.toString
    assert(!planStr.contains("UDF") && !planStr.contains("BatchEvalPython"),
      s"the build scan must not break codegen with a UDF:\n$planStr")
    assert(planStr.contains("BroadcastHashJoin"),
      s"the file→fileId map must attach as a broadcast join:\n$planStr")
    // `*(n)` is the executed plan's whole-stage-codegen marker — the
    // join and the scan-side projections must carry it
    assert(planStr.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("*(")),
      s"the scan must stay inside whole-stage codegen:\n$planStr")
  }
}
