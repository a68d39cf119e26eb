package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** External-writer compatibility: real Hudi writers stamp a schema
  * key on EVERY commit (not just evolution), land the full
  * `_hoodie_` meta quintet, use Avro fixed-type decimals and nested
  * records in their stamped schemas, and (SimpleKeyGenerator) stamp
  * `_hoodie_record_key` as the RAW value. Fixtures reproduce those
  * on-disk shapes from the public hudi.apache.org layout docs — no
  * Hudi library exists in this sandbox, so the layout is the
  * contract under test.
  */
class HudiExternalCompatSpec extends SparkSpec {

  private def writeBaseFile(df: DataFrame, table: String, relPath: String): Unit = {
    val tmp = tmpDir("hudi-ext-stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val src = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(table, relPath)
    dst.getParentFile.mkdirs()
    java.nio.file.Files.copy(src.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  private def writeCommit(table: String, instant: String,
      writes: Seq[(String, String, String)], schemaJson: Option[String]): Unit = {
    val dir = new java.io.File(table, ".hoodie")
    dir.mkdirs()
    val byPart = writes.groupBy(_._1).map { case (p, ws) =>
      s""""$p":[${ws.map { case (_, fid, path) =>
        s"""{"fileId":"$fid","path":"$path","numWrites":1,"numUpdateWrites":0,""" +
          s""""totalWriteBytes":1024,"prevCommit":"null"}"""
      }.mkString(",")}]"""
    }.mkString(",")
    val extra = schemaJson.map { j =>
      val esc = j.replace("\\", "\\\\").replace("\"", "\\\"")
      s""","extraMetadata":{"schema":"$esc"}"""
    }.getOrElse("")
    val w = new java.io.PrintWriter(new java.io.File(dir, s"$instant.commit"), "UTF-8")
    try w.println(s"""{"partitionToWriteStats":{$byPart},"operationType":"UPSERT"$extra}""")
    finally w.close()
  }

  // the full meta quintet a real COW writer stamps, raw-value keys
  private def extRows(r: Range, instant: String, fileName: String) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"n$i", i * 3L)).toDF("id", "name", "v")
      .withColumn("_hoodie_commit_time", lit(instant))
      .withColumn("_hoodie_commit_seqno", concat(lit(instant + "_0_"), col("id")))
      .withColumn("_hoodie_record_key", col("id").cast("string"))
      .withColumn("_hoodie_partition_path", lit(""))
      .withColumn("_hoodie_file_name", lit(fileName))
  }

  private def extSchemaJson(extraField: String = ""): String = {
    val extra = if (extraField.isEmpty) ""
      else s""",{"name":"$extraField","type":["null","long"],"default":null}"""
    """{"type":"record","name":"ext_record","namespace":"hoodie.ext","fields":[""" +
      """{"name":"_hoodie_commit_time","type":["null","string"],"default":null},""" +
      """{"name":"_hoodie_commit_seqno","type":["null","string"],"default":null},""" +
      """{"name":"_hoodie_record_key","type":["null","string"],"default":null},""" +
      """{"name":"_hoodie_partition_path","type":["null","string"],"default":null},""" +
      """{"name":"_hoodie_file_name","type":["null","string"],"default":null},""" +
      """{"name":"id","type":["null","long"],"default":null},""" +
      """{"name":"name","type":["null","string"],"default":null},""" +
      """{"name":"v","type":["null","long"],"default":null}""" + extra + "]}"
  }

  test("every-commit schema stamps without divergence keep footer inference and the full meta quintet") {
    val table = tmpDir("hudi-ext-stamp")
    writeBaseFile(extRows(1 to 20, "20240101090000", "f1.parquet"), table,
      "f1_0-0-0_20240101090000.parquet")
    writeCommit(table, "20240101090000",
      Seq(("", "f1", "f1_0-0-0_20240101090000.parquet")), Some(extSchemaJson()))
    writeBaseFile(extRows(21 to 40, "20240102090000", "f2.parquet"), table,
      "f2_0-0-0_20240102090000.parquet")
    writeCommit(table, "20240102090000",
      Seq(("", "f2", "f2_0-0-0_20240102090000.parquet")), Some(extSchemaJson()))
    // identical stamps on every commit = no evolution: the declared
    // scan must NOT activate (footer inference is exact here)
    assert(HudiTableReader.declaredDataSchema(spark, table).isEmpty,
      "identical every-commit schema stamps are not evolution")
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.count() == 40L)
    Seq("_hoodie_commit_time", "_hoodie_commit_seqno", "_hoodie_record_key",
        "_hoodie_partition_path", "_hoodie_file_name").foreach(c =>
      assert(snap.columns.contains(c), s"external meta column $c must survive"))
  }

  test("diverged external stamps serve the declared scan with footer-derived meta columns") {
    val table = tmpDir("hudi-ext-evolve")
    writeBaseFile(extRows(1 to 20, "20240101090000", "f1.parquet"), table,
      "f1_0-0-0_20240101090000.parquet")
    writeCommit(table, "20240101090000",
      Seq(("", "f1", "f1_0-0-0_20240101090000.parquet")), Some(extSchemaJson()))
    // the second commit ADDS a column — a genuine divergence
    writeBaseFile(extRows(21 to 40, "20240102090000", "f2.parquet")
        .withColumn("score", col("id") * 10L), table,
      "f2_0-0-0_20240102090000.parquet")
    writeCommit(table, "20240102090000",
      Seq(("", "f2", "f2_0-0-0_20240102090000.parquet")),
      Some(extSchemaJson(extraField = "score")))
    val declared = HudiTableReader.declaredDataSchema(spark, table)
    assert(declared.nonEmpty, "diverged stamps ARE evolution")
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.count() == 40L)
    // old files null-fill the added column; meta quintet survives
    // (derived from the files, not a fixed 3-column list)
    assert(snap.where(col("id") === 5L).select("score").head().isNullAt(0))
    assert(snap.where(col("id") === 30L).select("score").head().getLong(0) == 300L)
    Seq("_hoodie_commit_seqno", "_hoodie_file_name").foreach(c =>
      assert(snap.columns.contains(c), s"external meta column $c must survive evolution"))
  }

  test("unmappable stamped schemas fall back to footer inference instead of refusing the read") {
    val table = tmpDir("hudi-ext-unmappable")
    writeBaseFile(extRows(1 to 10, "20240101090000", "f1.parquet"), table,
      "f1_0-0-0_20240101090000.parquet")
    // two DIFFERENT stamps, newest carrying a type fromAvroJson cannot
    // map (a recursive union) — the walk must not throw
    val weird =
      """{"type":"record","name":"w","fields":[""" +
        """{"name":"id","type":["null","long","string"],"default":null}]}"""
    writeCommit(table, "20240101090000",
      Seq(("", "f1", "f1_0-0-0_20240101090000.parquet")), Some(extSchemaJson()))
    writeBaseFile(extRows(11 to 20, "20240102090000", "f2.parquet"), table,
      "f2_0-0-0_20240102090000.parquet")
    writeCommit(table, "20240102090000",
      Seq(("", "f2", "f2_0-0-0_20240102090000.parquet")), Some(weird))
    assert(HudiTableReader.declaredDataSchema(spark, table).isEmpty,
      "an unmappable declared schema must fall back, not refuse")
    assert(HudiTableReader.snapshot(spark, table).count() == 20L)
  }

  test("fromAvroJson maps real-world shapes: fixed decimals, nested records, arrays, maps, enums, millis") {
    import org.apache.spark.sql.types._
    val json =
      """{"type":"record","name":"r","fields":[
        |{"name":"d","type":["null",{"type":"fixed","name":"dfix","size":8,
        |  "logicalType":"decimal","precision":12,"scale":2}],"default":null},
        |{"name":"ts","type":["null",{"type":"long","logicalType":"timestamp-millis"}],"default":null},
        |{"name":"nested","type":["null",{"type":"record","name":"inner","fields":[
        |  {"name":"a","type":["null","int"],"default":null},
        |  {"name":"b","type":["null","string"],"default":null}]}],"default":null},
        |{"name":"tags","type":["null",{"type":"array","items":["null","string"]}],"default":null},
        |{"name":"attrs","type":["null",{"type":"map","values":["null","long"]}],"default":null},
        |{"name":"state","type":["null",{"type":"enum","name":"st","symbols":["A","B"]}],"default":null}
        |]}""".stripMargin
    val st = HudiSchema.fromAvroJson(json)
    assert(st("d").dataType == DecimalType(12, 2))
    assert(st("ts").dataType == TimestampType)
    assert(st("nested").dataType == StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))
    assert(st("tags").dataType == ArrayType(StringType))
    assert(st("attrs").dataType == MapType(StringType, LongType))
    assert(st("state").dataType == StringType)
  }

  test("point lookup probes RAW record-key form: external SimpleKeyGenerator tables resolve") {
    val table = tmpDir("hudi-ext-rawkey")
    // two groups, raw-value keys, recordkey declared in hoodie.properties
    writeBaseFile(extRows(1 to 50, "20240101090000", "g1.parquet"), table,
      "g1_0-0-0_20240101090000.parquet")
    writeBaseFile(extRows(51 to 100, "20240101090000", "g2.parquet"), table,
      "g2_0-0-0_20240101090000.parquet")
    writeCommit(table, "20240101090000", Seq(
      ("", "g1", "g1_0-0-0_20240101090000.parquet"),
      ("", "g2", "g2_0-0-0_20240101090000.parquet")), None)
    val pw = new java.io.PrintWriter(new java.io.File(s"$table/.hoodie", "hoodie.properties"), "UTF-8")
    try {
      pw.println("hoodie.table.name=extraw")
      pw.println("hoodie.table.type=COPY_ON_WRITE")
      pw.println("hoodie.table.recordkey.fields=id")
    } finally pw.close()
    HudiTableWriter.writeRecordIndex(spark, table): Unit
    // the index holds RAW keys ("42"); a field:value-only probe would
    // prune the group away and silently return nothing
    val files = HudiTableReader.pointLookupFiles(spark, table, Seq(42L))
    assert(files.size == 1, s"raw-key probe must match exactly one group, got ${files.map(_.path)}")
    val got = HudiTableReader.pointLookup(spark, table, Seq(42L))
    assert(got.count() == 1L && got.head().getAs[Long]("v") == 126L)
    // a key in the other group resolves too; an absent key stays empty
    assert(HudiTableReader.pointLookup(spark, table, Seq(99L)).count() == 1L)
    assert(HudiTableReader.pointLookup(spark, table, Seq(4242L)).isEmpty)
  }
}
