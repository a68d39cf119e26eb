package graft.sources

import graft.SparkSpec
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixture tables reproduce the external writer's on-disk Iceberg
  * layout (iceberg.apache.org/spec): parquet data files, Avro
  * manifests and manifest lists (written with the same avro library
  * real writers use), `vN.metadata.json` + `version-hint.text`. The
  * reader extracts fields BY NAME from whatever record schema the
  * writer used, so real manifests with their many extra columns read
  * the same way these minimal ones do.
  */
class IcebergTableReaderSpec extends SparkSpec {

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long","default":0},
      |{"name":"added_snapshot_id","type":["null","long"],"default":null},
      |{"name":"content","type":"int","default":0}]}""".stripMargin)

  private val manifestEntrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"content","type":"int","default":0},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string","default":"PARQUET"},
      |  {"name":"record_count","type":"long","default":0}]}}]}""".stripMargin)

  private def writeAvro(path: String, schema: Schema, records: Seq[GenericRecord]): Unit = {
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    try records.foreach(w.append) finally w.close()
  }

  private def manifestRec(status: Int, snapshotId: Long, filePath: String,
      content: Int = 0): GenericRecord = {
    val df = new GenericData.Record(manifestEntrySchema.getField("data_file").schema())
    df.put("content", content)
    df.put("file_path", filePath)
    df.put("file_format", "PARQUET")
    df.put("record_count", 1L)
    val r = new GenericData.Record(manifestEntrySchema)
    r.put("status", status)
    r.put("snapshot_id", snapshotId)
    r.put("data_file", df)
    r
  }

  private def listRec(manifestPath: String, addedBy: Long, content: Int = 0): GenericRecord = {
    val r = new GenericData.Record(manifestListSchema)
    r.put("manifest_path", manifestPath)
    r.put("manifest_length", 1024L)
    r.put("added_snapshot_id", addedBy)
    r.put("content", content)
    r
  }

  private def writeDataFile(df: DataFrame, table: String, relPath: String): Unit = {
    val tmp = tmpDir("ice-stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val src = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(table, relPath)
    dst.getParentFile.mkdirs()
    java.nio.file.Files.copy(src.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  private def writeMetadata(table: String, version: Int, currentId: Long,
      snaps: Seq[(Long, Option[Long], String, String)]): Unit = { // (id, parent, op, list)
    val dir = new java.io.File(table, "metadata"); dir.mkdirs()
    val snapJson = snaps.map { case (id, parent, op, list) =>
      val p = parent.map(v => s""""parent-snapshot-id":$v,""").getOrElse("")
      s"""{"snapshot-id":$id,$p"timestamp-ms":1700000000000,""" +
        s""""summary":{"operation":"$op"},"manifest-list":"$list"}"""
    }.mkString(",")
    val w = new java.io.PrintWriter(new java.io.File(dir, s"v$version.metadata.json"), "UTF-8")
    try w.println(
      s"""{"format-version":2,"table-uuid":"fixture","location":"$table",""" +
        s""""current-snapshot-id":$currentId,"snapshots":[$snapJson]}""")
    finally w.close()
    val h = new java.io.PrintWriter(new java.io.File(dir, "version-hint.text"), "UTF-8")
    try h.println(version.toString) finally h.close()
  }

  private def rows(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"g${i % 3}", i * 2L)).toDF("id", "grp", "v")
  }

  test("snapshot reads the current snapshot's live files; incremental walks the parent chain") {
    val table = tmpDir("ice-basic")
    // snapshot 1: fileA + fileB via manifest m1
    writeDataFile(rows(1 to 100), table, "data/fileA.parquet")
    writeDataFile(rows(101 to 160), table, "data/fileB.parquet")
    writeAvro(s"$table/metadata/m1.avro", manifestEntrySchema, Seq(
      manifestRec(1, 1L, "data/fileA.parquet"),
      manifestRec(1, 1L, "data/fileB.parquet")))
    writeAvro(s"$table/metadata/snap-1.avro", manifestListSchema,
      Seq(listRec("metadata/m1.avro", 1L)))
    // snapshot 2 (append): reuses m1, adds m2 with fileC
    writeDataFile(rows(161 to 200), table, "data/fileC.parquet")
    writeAvro(s"$table/metadata/m2.avro", manifestEntrySchema,
      Seq(manifestRec(1, 2L, "data/fileC.parquet")))
    writeAvro(s"$table/metadata/snap-2.avro", manifestListSchema, Seq(
      listRec("metadata/m1.avro", 1L), listRec("metadata/m2.avro", 2L)))
    writeMetadata(table, 2, 2L, Seq(
      (1L, None, "append", "metadata/snap-1.avro"),
      (2L, Some(1L), "append", "metadata/snap-2.avro")))

    val snap = IcebergTableReader.snapshot(spark, table)
    assert(snap.count() == 200L)
    val inc = IcebergTableReader.incrementalSince(spark, table, 1L)
    assert(inc.count() == 40L)
    assert(inc.select("_snapshot_id").distinct().head().getLong(0) == 2L)
    assert(inc.agg(min("id"), max("id")).head().toSeq == Seq(161L, 200L))
    // checkpoint not on the chain refuses
    val e = intercept[IllegalArgumentException](
      IcebergTableReader.incrementalSince(spark, table, 999L))
    assert(e.getMessage.contains("not an ancestor"))
    // SNAPSHOT AS OF: snapshot 1's manifest list is its file inventory
    assert(IcebergTableReader.snapshotAsOf(spark, table, 1L).count() == 160L)
    val eTT = intercept[IllegalArgumentException](
      IcebergTableReader.snapshotAsOf(spark, table, 999L))
    assert(eTT.getMessage.contains("not in the metadata log"))
  }

  test("compaction (deleted entries in a replace snapshot) serves the snapshot; incremental SKIPS it") {
    val table = tmpDir("ice-replace")
    writeDataFile(rows(1 to 80), table, "data/f1.parquet")
    writeDataFile(rows(81 to 120), table, "data/f2.parquet")
    writeAvro(s"$table/metadata/m1.avro", manifestEntrySchema, Seq(
      manifestRec(1, 1L, "data/f1.parquet"), manifestRec(1, 1L, "data/f2.parquet")))
    writeAvro(s"$table/metadata/snap-1.avro", manifestListSchema,
      Seq(listRec("metadata/m1.avro", 1L)))
    // snapshot 2 = replace (compaction): f1+f2 rewritten into fc
    writeDataFile(rows(1 to 120), table, "data/fc.parquet")
    writeAvro(s"$table/metadata/m2.avro", manifestEntrySchema, Seq(
      manifestRec(2, 2L, "data/f1.parquet"), // status 2 = deleted
      manifestRec(2, 2L, "data/f2.parquet"),
      manifestRec(1, 2L, "data/fc.parquet")))
    writeAvro(s"$table/metadata/snap-2.avro", manifestListSchema,
      Seq(listRec("metadata/m2.avro", 2L)))
    writeMetadata(table, 2, 2L, Seq(
      (1L, None, "append", "metadata/snap-1.avro"),
      (2L, Some(1L), "replace", "metadata/snap-2.avro")))
    assert(IcebergTableReader.snapshot(spark, table).count() == 120L,
      "deleted entries must drop; the rewritten file serves the snapshot")
    // a replace adds no logical rows: the incremental pull SKIPS it
    // (Iceberg's own incremental-append semantics — a compacting
    // table must keep its checkpointed consumers) and a replace-only
    // range is the EMPTY pull, not an error
    val inc = IcebergTableReader.incrementalSince(spark, table, 1L)
    assert(inc.isEmpty)
    assert(inc.columns.contains("_snapshot_id"))
  }

  test("without version-hint.text the NUMERICALLY highest metadata wins (v10 beats v9)") {
    val table = tmpDir("ice-vernum")
    // v9 points at a one-file snapshot, v10 at a two-file one — a
    // lexicographic max would pick v9 and serve the stale snapshot
    writeDataFile(rows(1 to 30), table, "data/f1.parquet")
    writeDataFile(rows(31 to 80), table, "data/f2.parquet")
    writeAvro(s"$table/metadata/m1.avro", manifestEntrySchema,
      Seq(manifestRec(1, 1L, "data/f1.parquet")))
    writeAvro(s"$table/metadata/snap-1.avro", manifestListSchema,
      Seq(listRec("metadata/m1.avro", 1L)))
    writeAvro(s"$table/metadata/m2.avro", manifestEntrySchema,
      Seq(manifestRec(1, 2L, "data/f2.parquet")))
    writeAvro(s"$table/metadata/snap-2.avro", manifestListSchema, Seq(
      listRec("metadata/m1.avro", 1L), listRec("metadata/m2.avro", 2L)))
    writeMetadata(table, 9, 1L, Seq((1L, None, "append", "metadata/snap-1.avro")))
    writeMetadata(table, 10, 2L, Seq(
      (1L, None, "append", "metadata/snap-1.avro"),
      (2L, Some(1L), "append", "metadata/snap-2.avro")))
    // writeMetadata leaves version-hint at 10; drop it to force discovery
    assert(new java.io.File(s"$table/metadata", "version-hint.text").delete())
    assert(IcebergTableReader.snapshot(spark, table).count() == 80L,
      "v10.metadata.json must beat v9.metadata.json numerically, not lexicographically")
    // the zero-padded uuid form also resolves numerically
    val f10 = new java.io.File(s"$table/metadata", "v10.metadata.json")
    val f9 = new java.io.File(s"$table/metadata", "v9.metadata.json")
    assert(f9.renameTo(new java.io.File(s"$table/metadata",
      "00009-aaaaaaaa-0000-0000-0000-000000000000.metadata.json")))
    assert(f10.renameTo(new java.io.File(s"$table/metadata",
      "00010-bbbbbbbb-0000-0000-0000-000000000000.metadata.json")))
    assert(IcebergTableReader.snapshot(spark, table).count() == 80L,
      "NNNNN-uuid metadata names must resolve by their numeric sequence")
  }

  test("v2 POSITION deletes are APPLIED; equality deletes refuse; bare file list refuses under deletes") {
    val s = spark
    import s.implicits._
    val table = tmpDir("ice-posdel")
    writeDataFile(rows(1 to 50), table, "data/f1.parquet")   // positions 0..49
    writeDataFile(rows(51 to 80), table, "data/f2.parquet")  // positions 0..29
    writeAvro(s"$table/metadata/m1.avro", manifestEntrySchema, Seq(
      manifestRec(1, 1L, "data/f1.parquet"),
      manifestRec(1, 1L, "data/f2.parquet")))
    writeAvro(s"$table/metadata/snap-1.avro", manifestListSchema,
      Seq(listRec("metadata/m1.avro", 1L)))
    // snapshot 2: a position-delete file kills f1 positions 0..9
    // (ids 1..10) and f2 position 29 (id 80) — file_path kept
    // RELATIVE like the manifests (absolute URIs normalize the same)
    val delRows = (0L until 10L).map(p => ("data/f1.parquet", p)) :+ ("data/f2.parquet", 29L)
    val stDir = tmpDir("ice-del-stage")
    delRows.toDF("file_path", "pos").coalesce(1).write.mode("overwrite").parquet(stDir)
    val delSrc = new java.io.File(stDir).listFiles().find(_.getName.endsWith(".parquet")).get
    new java.io.File(s"$table/data").mkdirs()
    java.nio.file.Files.copy(delSrc.toPath,
      new java.io.File(s"$table/data", "del1.parquet").toPath): Unit
    writeAvro(s"$table/metadata/md.avro", manifestEntrySchema,
      Seq(manifestRec(1, 2L, "data/del1.parquet", content = 1)))
    writeAvro(s"$table/metadata/snap-2.avro", manifestListSchema, Seq(
      listRec("metadata/m1.avro", 1L), listRec("metadata/md.avro", 2L, content = 1)))
    writeMetadata(table, 2, 2L, Seq(
      (1L, None, "append", "metadata/snap-1.avro"),
      (2L, Some(1L), "delete", "metadata/snap-2.avro")))
    val snap = IcebergTableReader.snapshot(spark, table)
    assert(snap.count() == 69L) // 80 - 11 deleted
    assert(snap.agg(min("id"), max("id")).head().toSeq == Seq(11L, 79L))
    // the bare file list refuses under deletes (it would over-return)
    val eAf = intercept[IllegalStateException](IcebergTableReader.activeFiles(spark, table))
    assert(eAf.getMessage.contains("row-level delete"))
    // incremental across the delete snapshot refuses (not an append)
    val eInc = intercept[IllegalStateException](
      IcebergTableReader.incrementalSince(spark, table, 1L))
    assert(eInc.getMessage.contains("not an append"))

    // an equality-delete entry WITHOUT equality_ids has no key to
    // match on — refuse (applying them blind would be a guess)
    val t2 = tmpDir("ice-eqdel")
    writeDataFile(rows(1 to 20), t2, "data/f1.parquet")
    writeAvro(s"$t2/metadata/m1.avro", manifestEntrySchema,
      Seq(manifestRec(1, 1L, "data/f1.parquet")))
    writeAvro(s"$t2/metadata/me.avro", manifestEntrySchema,
      Seq(manifestRec(1, 2L, "data/eq1.parquet", content = 2)))
    writeAvro(s"$t2/metadata/snap-2.avro", manifestListSchema, Seq(
      listRec("metadata/m1.avro", 1L), listRec("metadata/me.avro", 2L, content = 1)))
    writeMetadata(t2, 2, 2L, Seq((2L, None, "delete", "metadata/snap-2.avro")))
    val e = intercept[IllegalStateException](IcebergTableReader.snapshot(spark, t2))
    assert(e.getMessage.contains("equality_ids"),
      s"an id-less equality delete must refuse, got: ${e.getMessage}")
    val notTable = tmpDir("ice-none")
    val e2 = intercept[IllegalArgumentException](IcebergTableReader.snapshot(spark, notTable))
    assert(e2.getMessage.contains("metadata"))
  }

  // v2 entry schema with the delete-scoping fields real writers emit
  private val v2EntrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"content","type":"int","default":0},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string","default":"PARQUET"},
      |  {"name":"record_count","type":"long","default":0},
      |  {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}
      |]}}]}""".stripMargin)

  private def v2Rec(status: Int, snapshotId: Long, seq: Long, filePath: String,
      content: Int = 0, eqIds: Seq[Int] = Nil): GenericRecord = {
    val df = new GenericData.Record(v2EntrySchema.getField("data_file").schema())
    df.put("content", content); df.put("file_path", filePath)
    df.put("file_format", "PARQUET"); df.put("record_count", 1L)
    if (eqIds.nonEmpty) {
      import scala.jdk.CollectionConverters._
      df.put("equality_ids", eqIds.map(Int.box).asJava)
    }
    val r = new GenericData.Record(v2EntrySchema)
    r.put("status", status); r.put("snapshot_id", snapshotId)
    r.put("sequence_number", seq); r.put("data_file", df)
    r
  }

  private def writeMetadataWithSchema(table: String, version: Int, currentId: Long,
      snaps: Seq[(Long, Option[Long], String, String, Long)]): Unit = { // +timestampMs
    val dir = new java.io.File(table, "metadata"); dir.mkdirs()
    val snapJson = snaps.map { case (id, parent, op, list, ts) =>
      val p = parent.map(v => s""""parent-snapshot-id":$v,""").getOrElse("")
      s"""{"snapshot-id":$id,$p"timestamp-ms":$ts,""" +
        s""""summary":{"operation":"$op"},"manifest-list":"$list"}"""
    }.mkString(",")
    val w = new java.io.PrintWriter(new java.io.File(dir, s"v$version.metadata.json"), "UTF-8")
    try w.println(
      s"""{"format-version":2,"table-uuid":"fixture","location":"$table",""" +
        s""""schemas":[{"schema-id":0,"type":"struct","fields":[""" +
        s"""{"id":1,"name":"id","required":false,"type":"long"},""" +
        s"""{"id":2,"name":"grp","required":false,"type":"string"},""" +
        s"""{"id":3,"name":"v","required":false,"type":"long"}]}],""" +
        s""""current-schema-id":0,""" +
        s""""current-snapshot-id":$currentId,"snapshots":[$snapJson]}""")
    finally w.close()
    val h = new java.io.PrintWriter(new java.io.File(dir, "version-hint.text"), "UTF-8")
    try h.println(version.toString) finally h.close()
  }

  test("EQUALITY deletes apply, sequence-scoped: only strictly-older data files lose rows") {
    val s = spark
    import s.implicits._
    val table = tmpDir("ice-eqdel-apply")
    writeDataFile(rows(1 to 50), table, "data/f1.parquet")   // seq 1
    writeDataFile(rows(51 to 70), table, "data/f2.parquet")  // seq 3 (after the delete)
    // the equality-delete file: one row, grp='g1' (field id 2)
    val eqStage = new java.io.File(tmpDir("ice-eq-stage"))
    Seq("g1").toDF("grp").coalesce(1).write.mode("overwrite").parquet(eqStage.toString)
    val src = eqStage.listFiles().find(_.getName.endsWith(".parquet")).get
    new java.io.File(s"$table/data").mkdirs()
    java.nio.file.Files.copy(src.toPath,
      new java.io.File(s"$table/data", "eq1.parquet").toPath): Unit
    writeAvro(s"$table/metadata/m1.avro", v2EntrySchema,
      Seq(v2Rec(1, 1L, 1L, "data/f1.parquet")))
    writeAvro(s"$table/metadata/me.avro", v2EntrySchema,
      Seq(v2Rec(1, 2L, 2L, "data/eq1.parquet", content = 2, eqIds = Seq(2))))
    writeAvro(s"$table/metadata/m2.avro", v2EntrySchema,
      Seq(v2Rec(1, 3L, 3L, "data/f2.parquet")))
    writeAvro(s"$table/metadata/snap-3.avro", manifestListSchema, Seq(
      listRec("metadata/m1.avro", 1L),
      listRec("metadata/me.avro", 2L, content = 1),
      listRec("metadata/m2.avro", 3L)))
    writeMetadataWithSchema(table, 3, 3L, Seq(
      (1L, None, "append", "metadata/snap-3.avro", 1700000000000L),
      (2L, Some(1L), "overwrite", "metadata/snap-3.avro", 1700000001000L),
      (3L, Some(2L), "append", "metadata/snap-3.avro", 1700000002000L)))
    val snap = IcebergTableReader.snapshot(spark, table)
    // f1 (ids 1..50) loses its grp=g1 rows (ids ≡1 mod 3: 17 of them);
    // f2 (ids 51..70, seq 3 > delete seq 2) keeps ALL rows incl g1
    assert(snap.count() == 50L - 17L + 20L)
    assert(snap.where(col("grp") === "g1" && col("id") <= 50L).count() == 0L,
      "older data files must lose their matching rows")
    assert(snap.where(col("grp") === "g1" && col("id") > 50L).count() == 7L,
      "files appended AFTER the delete's sequence must keep matching rows")
    // the bare file list refuses under equality deletes too
    val eAf = intercept[IllegalStateException](IcebergTableReader.activeFiles(spark, table))
    assert(eAf.getMessage.contains("row-level delete"))
  }

  // the spec's INHERITANCE form: ADDED entries carry NULL
  // sequence_number and resolve it from the manifest list's — what
  // real engines' writers actually produce
  private val seqListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long","default":0},
      |{"name":"added_snapshot_id","type":["null","long"],"default":null},
      |{"name":"content","type":"int","default":0},
      |{"name":"sequence_number","type":["null","long"],"default":null}]}"""
      .stripMargin)

  private def seqListRec(manifestPath: String, addedBy: Long, seq: Long,
      content: Int = 0): GenericRecord = {
    val r = new GenericData.Record(seqListSchema)
    r.put("manifest_path", manifestPath)
    r.put("manifest_length", 1024L)
    r.put("added_snapshot_id", addedBy)
    r.put("content", content)
    r.put("sequence_number", seq)
    r
  }

  private def v2RecNullSeq(status: Int, snapshotId: Long, filePath: String,
      content: Int = 0, eqIds: Seq[Int] = Nil): GenericRecord = {
    val df = new GenericData.Record(v2EntrySchema.getField("data_file").schema())
    df.put("content", content); df.put("file_path", filePath)
    df.put("file_format", "PARQUET"); df.put("record_count", 1L)
    if (eqIds.nonEmpty) {
      import scala.jdk.CollectionConverters._
      df.put("equality_ids", eqIds.map(Int.box).asJava)
    }
    val r = new GenericData.Record(v2EntrySchema)
    r.put("status", status); r.put("snapshot_id", snapshotId)
    r.put("data_file", df) // sequence_number stays null → inherited
    r
  }

  test("sequence-number INHERITANCE: null entry sequences resolve from the manifest list; a list without one refuses under equality deletes") {
    val s = spark
    import s.implicits._
    val table = tmpDir("ice-seq-inherit")
    writeDataFile(rows(1 to 50), table, "data/f1.parquet")   // list seq 1
    writeDataFile(rows(51 to 70), table, "data/f2.parquet")  // list seq 3
    val eqStage = new java.io.File(tmpDir("ice-eqi-stage"))
    Seq("g1").toDF("grp").coalesce(1).write.mode("overwrite").parquet(eqStage.toString)
    val src = eqStage.listFiles().find(_.getName.endsWith(".parquet")).get
    new java.io.File(s"$table/data").mkdirs()
    java.nio.file.Files.copy(src.toPath,
      new java.io.File(s"$table/data", "eq1.parquet").toPath): Unit
    // every ENTRY carries a null sequence_number — scoping is entirely
    // manifest-list-inherited, the shape external writers land
    writeAvro(s"$table/metadata/m1.avro", v2EntrySchema,
      Seq(v2RecNullSeq(1, 1L, "data/f1.parquet")))
    writeAvro(s"$table/metadata/me.avro", v2EntrySchema,
      Seq(v2RecNullSeq(1, 2L, "data/eq1.parquet", content = 2, eqIds = Seq(2))))
    writeAvro(s"$table/metadata/m2.avro", v2EntrySchema,
      Seq(v2RecNullSeq(1, 3L, "data/f2.parquet")))
    writeAvro(s"$table/metadata/snap-3.avro", seqListSchema, Seq(
      seqListRec("metadata/m1.avro", 1L, 1L),
      seqListRec("metadata/me.avro", 2L, 2L, content = 1),
      seqListRec("metadata/m2.avro", 3L, 3L)))
    writeMetadataWithSchema(table, 3, 3L, Seq(
      (1L, None, "append", "metadata/snap-3.avro", 1700000000000L),
      (2L, Some(1L), "overwrite", "metadata/snap-3.avro", 1700000001000L),
      (3L, Some(2L), "append", "metadata/snap-3.avro", 1700000002000L)))
    val snap = IcebergTableReader.snapshot(spark, table)
    // identical semantics to the explicit-sequence fixture: f1 (seq 1
    // < delete seq 2) loses its g1 rows, f2 (seq 3) keeps ALL rows
    assert(snap.count() == 50L - 17L + 20L)
    assert(snap.where(col("grp") === "g1" && col("id") <= 50L).count() == 0L,
      "older data files must lose their matching rows")
    assert(snap.where(col("grp") === "g1" && col("id") > 50L).count() == 7L,
      "a file whose INHERITED sequence postdates the delete keeps matching rows")
    // same table, but the manifest list offers no sequence either →
    // the delete's scope is undefined; the read must refuse, not guess
    writeAvro(s"$table/metadata/snap-3.avro", manifestListSchema, Seq(
      listRec("metadata/m1.avro", 1L),
      listRec("metadata/me.avro", 2L, content = 1),
      listRec("metadata/m2.avro", 3L)))
    val e = intercept[IllegalStateException](IcebergTableReader.snapshot(spark, table))
    assert(e.getMessage.contains("sequence number"),
      s"unresolvable sequence under equality deletes must refuse, got: ${e.getMessage}")
  }

  test("changeFeedSince: appends→inserts, upserts→inserts+key-deletes, position deletes→pre-images, replace silent; the fold reproduces the snapshot") {
    import org.apache.spark.sql.DataFrame
    val table = tmpDir("ice-cdc") + "/t"
    val s1 = IcebergTableWriter.create(rows(1 to 30), table)
    IcebergTableWriter.append(rows(31 to 40), table): Unit                  // s2: append
    IcebergTableWriter.delete(spark, table, col("id") % 10 === 0): Unit      // s3: pos delete
    IcebergTableWriter.upsert(rows(5 to 8).withColumn("v", lit(999L)),       // s4: overwrite
      table, Seq("id")): Unit
    IcebergTableWriter.rewriteDataFiles(spark, table, targetFiles = 2): Unit // s5: replace
    val feed = IcebergTableReader.changeFeedSince(spark, table, s1)
    feed.cache()
    // append leg: 10 inserts at s2
    assert(feed.where(col("_snapshot_id") === s1 + 1 &&
      col("_change_type") === "insert").count() == 10L)
    // position-delete leg: FULL pre-images of the live %10 rows
    val preDel = feed.where(col("_snapshot_id") === s1 + 2 && col("_change_type") === "delete")
    assert(preDel.count() == 4L) // 10,20,30,40
    assert(preDel.where(col("v").isNull).count() == 0L, "pre-images carry the full row")
    assert(preDel.where(col("id") === 10L).head().getAs[Long]("v") == 20L)
    // upsert leg: 4 inserts + 4 delete KEY-images (non-key columns null)
    val upsId = s1 + 3
    assert(feed.where(col("_snapshot_id") === upsId &&
      col("_change_type") === "insert").count() == 4L)
    val keyDel = feed.where(col("_snapshot_id") === upsId && col("_change_type") === "delete")
    assert(keyDel.count() == 4L)
    assert(keyDel.where(col("grp").isNull && col("v").isNull).count() == 4L,
      "an equality delete names keys, not rows")
    assert(keyDel.agg(sum("id")).head().getLong(0) == (5 to 8).sum.toLong)
    // replace emits nothing
    assert(feed.where(col("_snapshot_id") === s1 + 4).count() == 0L)
    // THE property: folding the feed onto the bootstrap snapshot
    // reproduces the current snapshot exactly
    var mirror: DataFrame = IcebergTableReader.snapshotAsOf(spark, table, s1)
      .select("id", "grp", "v")
    feed.select("_snapshot_id").distinct().collect().map(_.getLong(0)).sorted.foreach { sid =>
      val dels = feed.where(col("_snapshot_id") === sid && col("_change_type") === "delete")
      val ins = feed.where(col("_snapshot_id") === sid && col("_change_type") === "insert")
        .select("id", "grp", "v")
      // delete-by-key when the image is key-only, delete-by-row otherwise
      mirror =
        (if (dels.isEmpty) mirror
         else if (dels.where(col("grp").isNull).count() == dels.count())
           mirror.join(dels.select("id"), Seq("id"), "left_anti")
         else mirror.join(dels.select("id", "grp", "v"), Seq("id", "grp", "v"), "left_anti"))
          .unionByName(ins)
    }
    val now = IcebergTableReader.snapshot(spark, table).select("id", "grp", "v")
    assert(mirror.exceptAll(now).isEmpty && now.exceptAll(mirror).isEmpty,
      "the folded feed must reproduce the current snapshot")
    feed.unpersist()
    // a non-ancestor checkpoint refuses
    val e = intercept[IllegalArgumentException](
      IcebergTableReader.changeFeedSince(spark, table, 999L))
    assert(e.getMessage.contains("ancestor"))
  }

  test("TIMESTAMP AS OF resolves the latest snapshot at-or-before from the snapshot log") {
    val table = tmpDir("ice-ts")
    writeDataFile(rows(1 to 30), table, "data/f1.parquet")
    writeDataFile(rows(31 to 50), table, "data/f2.parquet")
    writeAvro(s"$table/metadata/m1.avro", manifestEntrySchema,
      Seq(manifestRec(1, 1L, "data/f1.parquet")))
    writeAvro(s"$table/metadata/m2.avro", manifestEntrySchema,
      Seq(manifestRec(1, 2L, "data/f2.parquet")))
    writeAvro(s"$table/metadata/snap-1.avro", manifestListSchema,
      Seq(listRec("metadata/m1.avro", 1L)))
    writeAvro(s"$table/metadata/snap-2.avro", manifestListSchema,
      Seq(listRec("metadata/m1.avro", 1L), listRec("metadata/m2.avro", 2L)))
    writeMetadataWithSchema(table, 2, 2L, Seq(
      (1L, None, "append", "metadata/snap-1.avro", 1700000000000L),
      (2L, Some(1L), "append", "metadata/snap-2.avro", 1700000010000L)))
    // between the two snapshots → the first serves
    assert(IcebergTableReader.snapshotAsOfTimestamp(spark, table, 1700000005000L)
      .count() == 30L)
    // at/after the second → the second
    assert(IcebergTableReader.snapshotAsOfTimestamp(spark, table, 1700000010000L)
      .count() == 50L)
    assert(IcebergTableReader.snapshotAsOfTimestamp(spark, table, 9999999999999L)
      .count() == 50L)
    // before the first refuses
    val e = intercept[IllegalArgumentException](
      IcebergTableReader.snapshotAsOfTimestamp(spark, table, 1600000000000L))
    assert(e.getMessage.contains("no snapshot"))
  }

  test("renamed columns resolve by FIELD ID: pre-rename files serve the renamed column") {
    import org.apache.spark.sql.types._
    val table = tmpDir("ice-rename")
    // files carry parquet FIELD IDS (real engines stamp them); the
    // pre-rename file's column is NAMED 'grp', the post-rename one
    // 'category' — both field id 2
    def withIds(df: org.apache.spark.sql.DataFrame) = {
      val fields = df.schema.fields.zipWithIndex.map { case (f, i) =>
        f.copy(metadata = new MetadataBuilder().putLong("parquet.field.id", i + 1L).build())
      }
      spark.createDataFrame(df.rdd, StructType(fields))
    }
    writeDataFile(withIds(rows(1 to 30)), table, "data/pre.parquet")
    val s = spark
    import s.implicits._
    val post = (31 to 40).map(i => (i.toLong, s"g${i % 3}", i * 2L))
      .toDF("id", "category", "v")
    writeDataFile(withIds(post), table, "data/post.parquet")
    writeAvro(s"$table/metadata/m1.avro", manifestEntrySchema, Seq(
      manifestRec(1, 1L, "data/pre.parquet"),
      manifestRec(1, 1L, "data/post.parquet")))
    writeAvro(s"$table/metadata/snap-1.avro", manifestListSchema,
      Seq(listRec("metadata/m1.avro", 1L)))
    val dir = new java.io.File(table, "metadata")
    val w = new java.io.PrintWriter(new java.io.File(dir, "v1.metadata.json"), "UTF-8")
    try w.println(
      s"""{"format-version":2,"table-uuid":"fixture","location":"$table",""" +
        s""""schemas":[""" +
        s"""{"schema-id":0,"type":"struct","fields":[""" +
        s"""{"id":1,"name":"id","required":false,"type":"long"},""" +
        s"""{"id":2,"name":"grp","required":false,"type":"string"},""" +
        s"""{"id":3,"name":"v","required":false,"type":"long"}]},""" +
        s"""{"schema-id":1,"type":"struct","fields":[""" +
        s"""{"id":1,"name":"id","required":false,"type":"long"},""" +
        s"""{"id":2,"name":"category","required":false,"type":"string"},""" +
        s"""{"id":3,"name":"v","required":false,"type":"long"}]}],""" +
        s""""current-schema-id":1,""" +
        s""""current-snapshot-id":1,"snapshots":[""" +
        s"""{"snapshot-id":1,"timestamp-ms":1700000000000,""" +
        s""""summary":{"operation":"append"},"manifest-list":"metadata/snap-1.avro"}]}""")
    finally w.close()
    val h = new java.io.PrintWriter(new java.io.File(dir, "version-hint.text"), "UTF-8")
    try h.println("1") finally h.close()
    val snap = IcebergTableReader.snapshot(spark, table)
    assert(snap.columns.toSeq == Seq("id", "category", "v"),
      "callers see the CURRENT schema's names")
    assert(snap.count() == 40L)
    assert(snap.where(col("category").isNull).count() == 0L,
      "pre-rename files must serve the renamed column BY FIELD ID, not null-fill it")
    assert(snap.where(col("id") === 5L).head().getAs[String]("category") == "g2")
    assert(snap.where(col("id") === 31L).head().getAs[String]("category") == "g1")
  }
}
