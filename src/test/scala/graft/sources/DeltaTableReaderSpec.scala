package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixture tables are written BY THE TEST in the external writer's
  * layout (data parquet files + `_delta_log/<v>.json` action lines,
  * optional checkpoint parquet + `_last_checkpoint`), exactly the
  * on-disk shape a delta-io writer leaves behind — no Delta library
  * exists in this sandbox, so the layout itself is the contract under
  * test (delta.io PROTOCOL.md).
  */
class DeltaTableReaderSpec extends SparkSpec {

  private def writeDataFile(df: DataFrame, table: String, name: String): Unit = {
    val tmp = tmpDir("delta-part")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val src = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
    val dstDir = new java.io.File(table, name).getParentFile
    dstDir.mkdirs()
    java.nio.file.Files.copy(src.toPath, new java.io.File(table, name).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  private def writeCommit(table: String, version: Long, lines: Seq[String]): Unit = {
    val dir = new java.io.File(table, "_delta_log")
    dir.mkdirs()
    val f = new java.io.File(dir, f"$version%020d.json")
    val w = new java.io.PrintWriter(f, "UTF-8")
    try lines.foreach(w.println) finally w.close()
  }

  private def meta(partCols: Seq[String], schemaJson: String): String =
    s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":"${schemaJson.replace("\"", "\\\"")}",""" +
      s""""partitionColumns":[${partCols.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""configuration":{},"createdTime":1700000000000}}"""

  private val protocol = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  private def add(path: String, pv: Map[String, String] = Map.empty,
      dataChange: Boolean = true): String = {
    val pvs = pv.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    s"""{"add":{"path":"$path","partitionValues":{$pvs},"size":1024,""" +
      s""""modificationTime":1700000000000,"dataChange":$dataChange}}"""
  }

  private def remove(path: String, dataChange: Boolean = true): String =
    s"""{"remove":{"path":"$path","deletionTimestamp":1700000001000,"dataChange":$dataChange}}"""

  private def rows(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"g${i % 3}", i * 2L)).toDF("id", "grp", "v")
  }

  private val schemaJson =
    """{"type":"struct","fields":[""" +
      """{"name":"id","type":"long","nullable":true,"metadata":{}},""" +
      """{"name":"grp","type":"string","nullable":true,"metadata":{}},""" +
      """{"name":"v","type":"long","nullable":true,"metadata":{}}]}"""

  test("snapshot replays add/remove in version order; incremental reads only the new commits' adds") {
    val table = tmpDir("delta-basic")
    writeDataFile(rows(1 to 100), table, "part-a.parquet")
    writeDataFile(rows(101 to 160), table, "part-b.parquet")
    writeCommit(table, 0L, Seq(protocol, meta(Nil, schemaJson),
      add("part-a.parquet"), add("part-b.parquet")))
    // commit 1: rewrite part-a into part-a2 (delete of ids <= 50), append part-c
    writeDataFile(rows(51 to 100), table, "part-a2.parquet")
    writeDataFile(rows(161 to 200), table, "part-c.parquet")
    writeCommit(table, 1L, Seq(
      remove("part-a.parquet"), add("part-a2.parquet"), add("part-c.parquet")))

    assert(DeltaTableReader.versions(spark, table) == Seq(0L, 1L))
    assert(DeltaTableReader.latestVersion(spark, table) == 1L)
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.count() == 150L) // 51..200
    assert(snap.agg(min("id"), max("id")).head().toSeq == Seq(51L, 200L))

    // incremental since 0 refuses: commit 1 removes data files
    val e = intercept[IllegalStateException](
      DeltaTableReader.incrementalSince(spark, table, 0L))
    assert(e.getMessage.contains("removes data files"))

    // commit 2: pure append — incremental since 1 reads exactly it
    writeDataFile(rows(201 to 230), table, "part-d.parquet")
    writeCommit(table, 2L, Seq(add("part-d.parquet")))
    val inc = DeltaTableReader.incrementalSince(spark, table, 1L)
    assert(inc.count() == 30L)
    assert(inc.select("_commit_version").distinct().head().getLong(0) == 2L)
    // compaction commit (dataChange=false on both sides) is invisible
    writeDataFile(rows(51 to 230), table, "part-compact.parquet")
    writeCommit(table, 3L, Seq(
      remove("part-a2.parquet", dataChange = false),
      remove("part-b.parquet", dataChange = false),
      remove("part-c.parquet", dataChange = false),
      remove("part-d.parquet", dataChange = false),
      add("part-compact.parquet", dataChange = false)))
    assert(DeltaTableReader.snapshot(spark, table).count() == 180L) // 51..230
    val inc2 = DeltaTableReader.incrementalSince(spark, table, 1L)
    assert(inc2.count() == 30L, "a compaction commit must not surface as incremental data")
  }

  test("partitioned table: partition values come back as typed literal columns") {
    val s = spark
    import s.implicits._
    val table = tmpDir("delta-part-tbl")
    val pSchema =
      """{"type":"struct","fields":[""" +
        """{"name":"id","type":"long","nullable":true,"metadata":{}},""" +
        """{"name":"v","type":"long","nullable":true,"metadata":{}},""" +
        """{"name":"day","type":"integer","nullable":true,"metadata":{}}]}"""
    def dayRows(r: Range) = r.map(i => (i.toLong, i * 3L)).toDF("id", "v")
    writeDataFile(dayRows(1 to 40), table, "day=1/f1.parquet")
    writeDataFile(dayRows(41 to 90), table, "day=2/f2.parquet")
    writeCommit(table, 0L, Seq(protocol, meta(Seq("day"), pSchema),
      add("day=1/f1.parquet", Map("day" -> "1")),
      add("day=2/f2.parquet", Map("day" -> "2"))))
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.schema("day").dataType == org.apache.spark.sql.types.IntegerType,
      "partition column must be typed from the table schema, not stringly")
    assert(snap.count() == 90L)
    assert(snap.where(col("day") === 2).count() == 50L)
    // activeFiles exposes partitionValues for pre-I/O pruning
    val acts = DeltaTableReader.activeFiles(spark, table)
    assert(acts.map(_.partitionValues("day")).sorted == Seq("1", "2"))
  }

  test("checkpoint + _last_checkpoint: replay starts at the checkpoint, later JSON commits apply") {
    val s = spark
    import s.implicits._
    val table = tmpDir("delta-ckpt")
    writeDataFile(rows(1 to 80), table, "p0.parquet")
    writeDataFile(rows(81 to 100), table, "p1.parquet")
    writeCommit(table, 0L, Seq(protocol, meta(Nil, schemaJson), add("p0.parquet")))
    writeCommit(table, 1L, Seq(add("p1.parquet")))
    // checkpoint at version 1, in the checkpoint-parquet action shape
    val ckpt = Seq(("p0.parquet"), ("p1.parquet"))
      .toDF("path")
      .select(struct(col("path"),
        map().cast("map<string,string>").as("partitionValues")).as("add"),
        struct(lit("fixture").as("id"), lit(schemaJson).as("schemaString"),
          array().cast("array<string>").as("partitionColumns")).as("metaData"))
    val ckptTmp = tmpDir("delta-ckpt-file")
    ckpt.coalesce(1).write.mode("overwrite").parquet(ckptTmp)
    val src = new java.io.File(ckptTmp).listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(src.toPath,
      new java.io.File(s"$table/_delta_log", f"${1L}%020d.checkpoint.parquet").toPath): Unit
    val w = new java.io.PrintWriter(new java.io.File(s"$table/_delta_log", "_last_checkpoint"), "UTF-8")
    try w.println("""{"version":1,"size":2}""") finally w.close()
    // delete the pre-checkpoint JSON commit: replay MUST come from the checkpoint
    assert(new java.io.File(s"$table/_delta_log", f"${0L}%020d.json").delete())
    // commit 2 after the checkpoint
    writeDataFile(rows(101 to 130), table, "p2.parquet")
    writeCommit(table, 2L, Seq(add("p2.parquet")))
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.count() == 130L,
      "snapshot must replay checkpoint adds + post-checkpoint commits")
    val inc = DeltaTableReader.incrementalSince(spark, table, 1L)
    assert(inc.count() == 30L)
    // MULTI-PART checkpoint: split the same two adds over two parts
    val part1 = Seq("p0.parquet").toDF("path")
      .select(struct(col("path"),
        map().cast("map<string,string>").as("partitionValues")).as("add"),
        struct(lit("fixture").as("id"), lit(schemaJson).as("schemaString"),
          array().cast("array<string>").as("partitionColumns")).as("metaData"))
    val part2 = Seq("p1.parquet").toDF("path")
      .select(struct(col("path"),
        map().cast("map<string,string>").as("partitionValues")).as("add"),
        struct(lit("fixture").as("id"), lit(schemaJson).as("schemaString"),
          array().cast("array<string>").as("partitionColumns")).as("metaData"))
    assert(new java.io.File(s"$table/_delta_log", f"${1L}%020d.checkpoint.parquet").delete())
    Seq((part1, 1), (part2, 2)).foreach { case (df, i) =>
      val tmp2 = tmpDir(s"delta-ckpt-mp$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp2)
      val src2 = new java.io.File(tmp2).listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(src2.toPath,
        new java.io.File(s"$table/_delta_log",
          f"${1L}%020d.checkpoint.$i%010d.${2}%010d.parquet").toPath): Unit
    }
    assert(DeltaTableReader.snapshot(spark, table).count() == 130L,
      "multi-part checkpoints must read as one")
  }

  test("deletion vectors, DV/column-mapping reader features, and column-mapping mode refuse loudly") {
    // per-add deletion vector
    val t1 = tmpDir("delta-dv")
    writeDataFile(rows(1 to 20), t1, "f.parquet")
    writeCommit(t1, 0L, Seq(protocol, meta(Nil, schemaJson),
      """{"add":{"path":"f.parquet","partitionValues":{},"size":1,"modificationTime":0,""" +
        """"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"x","offset":1,"sizeInBytes":8,"cardinality":2}}}"""))
    val e1 = intercept[IllegalStateException](DeltaTableReader.snapshot(spark, t1))
    assert(e1.getMessage.contains("deletion vector"))
    // protocol readerFeatures
    val t2 = tmpDir("delta-feat")
    writeDataFile(rows(1 to 20), t2, "f.parquet")
    writeCommit(t2, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      meta(Nil, schemaJson), add("f.parquet")))
    val e2 = intercept[IllegalStateException](DeltaTableReader.snapshot(spark, t2))
    assert(e2.getMessage.contains("reader features"))
    // column mapping mode in table configuration
    val t3 = tmpDir("delta-cmap")
    writeDataFile(rows(1 to 20), t3, "f.parquet")
    writeCommit(t3, 0L, Seq(protocol,
      s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${schemaJson.replace("\"", "\\\"")}","partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}""",
      add("f.parquet")))
    val e3 = intercept[IllegalStateException](DeltaTableReader.snapshot(spark, t3))
    assert(e3.getMessage.contains("columnMapping"))
  }

  test("not-a-delta-table and empty-log refuse loudly") {
    val notTable = tmpDir("delta-none")
    val e = intercept[IllegalArgumentException](DeltaTableReader.snapshot(spark, notTable))
    assert(e.getMessage.contains("_delta_log"))
    val emptyLog = tmpDir("delta-empty")
    new java.io.File(emptyLog, "_delta_log").mkdirs()
    val e2 = intercept[IllegalArgumentException](DeltaTableReader.snapshot(spark, emptyLog))
    assert(e2.getMessage.contains("empty _delta_log"))
  }
}
