package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The writer's contract is INTEROP: what it lands on disk must be a
  * protocol-conformant Delta table. The round trip goes through
  * [[DeltaTableReader]] — which is itself spec-locked against
  * hand-built protocol fixtures — and through [[TableLoader.open]]'s
  * format auto-detection.
  */
class DeltaTableWriterSpec extends SparkSpec {

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"g${i % 4}", i * 2L)).toDF("id", "grp", "v")
  }

  test("create + append round-trip through the reader; versions and incrementals line up") {
    val table = tmpDir("dwr-basic") + "/t"
    val v0 = DeltaTableWriter.create(df(1 to 100), table)
    assert(v0 == 0L)
    val snap0 = DeltaTableReader.snapshot(spark, table)
    assert(snap0.count() == 100L)
    assert(snap0.columns.toSeq == Seq("id", "grp", "v"))
    // append lands as version 1 and surfaces as exactly its rows
    val v1 = DeltaTableWriter.append(df(101 to 130), table)
    assert(v1 == 1L)
    assert(DeltaTableReader.snapshot(spark, table).count() == 130L)
    val inc = DeltaTableReader.incrementalSince(spark, table, 0L)
    assert(inc.count() == 30L)
    assert(inc.agg(min("id"), max("id")).head().toSeq == Seq(101L, 130L))
    // format auto-detection opens it
    assert(TableLoader.detectFormat(spark, table) == TableLoader.DeltaFormat)
    assert(TableLoader.open(spark, table).count() == 130L)
    // appended columns may arrive in any order; a different SET refuses
    val s = spark
    import s.implicits._
    DeltaTableWriter.append(
      df(131 to 140).select("v", "id", "grp"), table): Unit
    assert(DeltaTableReader.snapshot(spark, table).count() == 140L)
    val e = intercept[IllegalArgumentException](
      DeltaTableWriter.append(Seq((1L, "x")).toDF("id", "grp"), table))
    assert(e.getMessage.contains("schema"))
    // create on an existing table refuses
    val e2 = intercept[IllegalArgumentException](DeltaTableWriter.create(df(1 to 5), table))
    assert(e2.getMessage.contains("already"))
  }

  test("partitioned create: hive dirs land, partition values ride the log, reader re-attaches them") {
    val table = tmpDir("dwr-part") + "/t"
    DeltaTableWriter.create(df(1 to 80), table, partitionBy = Seq("grp")): Unit
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.count() == 80L)
    assert(snap.columns.toSeq == Seq("id", "grp", "v"),
      "column order must follow the declared schema, partition column in place")
    assert(snap.schema("grp").dataType == org.apache.spark.sql.types.StringType)
    assert(snap.where(col("grp") === "g1").count() == 20L)
    assert(snap.where(col("grp").isNull).count() == 0L)
    // the data files themselves must NOT carry the partition column
    // (the protocol strips it; values live in the log)
    val aFile = DeltaTableReader.activeFiles(spark, table).head
    assert(aFile.partitionValues.contains("grp"))
    val raw = spark.read.parquet(s"$table/${aFile.path}")
    assert(!raw.columns.contains("grp"))
    // appends inherit the table's partitioning
    DeltaTableWriter.append(df(81 to 100), table): Unit
    assert(DeltaTableReader.snapshot(spark, table).where(col("grp") === "g0").count() == 25L)
  }

  test("null partition values round-trip as protocol nulls") {
    val s = spark
    import s.implicits._
    val table = tmpDir("dwr-null") + "/t"
    val data = Seq((1L, Some("a"), 10L), (2L, None, 20L), (3L, Some("b"), 30L))
      .toDF("id", "grp", "v")
    DeltaTableWriter.create(data, table, partitionBy = Seq("grp")): Unit
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.count() == 3L)
    assert(snap.where(col("grp").isNull).select("id").head().getLong(0) == 2L)
  }

  test("partition values with spaces survive the encode/decode round trip") {
    val s = spark
    import s.implicits._
    val table = tmpDir("dwr-space") + "/t"
    val data = Seq((1L, "1-URGENT", 10L), (2L, "4-NOT SPECIFIED", 20L),
      (3L, "4-NOT SPECIFIED", 30L)).toDF("id", "prio", "v")
    DeltaTableWriter.create(data, table, partitionBy = Seq("prio")): Unit
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.where(col("prio") === "4-NOT SPECIFIED").count() == 2L,
      "the scan's URI-encoded file_path must still match the partition-values map")
    assert(snap.where(col("prio").isNull).count() == 0L)
  }

  test("txn actions: transaction watermark reads back; DeltaSink batch replay is a no-op") {
    val table = tmpDir("dwr-txn") + "/t"
    assert(DeltaTableReader.lastTransactionVersion(spark, table, "app").isEmpty,
      "no table yet = no watermark")
    assert(graft.streaming.DeltaSink.appendBatch(df(1 to 20), table, "app", 0L))
    assert(graft.streaming.DeltaSink.appendBatch(df(21 to 30), table, "app", 1L))
    assert(DeltaTableReader.lastTransactionVersion(spark, table, "app").contains(1L))
    assert(DeltaTableReader.lastTransactionVersion(spark, table, "other").isEmpty,
      "watermarks are per appId")
    // at-least-once redelivery of both batches: no-ops, table unchanged
    assert(!graft.streaming.DeltaSink.appendBatch(df(1 to 20), table, "app", 0L))
    assert(!graft.streaming.DeltaSink.appendBatch(df(21 to 30), table, "app", 1L))
    assert(DeltaTableReader.snapshot(spark, table).count() == 30L)
    // a NEW batch still lands after replays
    assert(graft.streaming.DeltaSink.appendBatch(df(31 to 35), table, "app", 2L))
    assert(DeltaTableReader.snapshot(spark, table).count() == 35L)
  }

  test("commit CAS: an occupied version slot bumps the writer to the next one") {
    val table = tmpDir("dwr-cas") + "/t"
    DeltaTableWriter.create(df(1 to 10), table): Unit
    // a racing writer already holds version 1
    val w = new java.io.PrintWriter(
      new java.io.File(s"$table/_delta_log", f"${1L}%020d.json"), "UTF-8")
    try w.print("") finally w.close()
    val v = DeltaTableWriter.append(df(11 to 20), table)
    assert(v == 2L, "the CAS must skip the occupied slot, not overwrite it")
    assert(DeltaTableReader.snapshot(spark, table).count() == 20L)
  }
}
