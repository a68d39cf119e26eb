package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixture tables are written BY THE TEST in the external writer's
  * layout (data parquet files + `_delta_log/<v>.json` action lines,
  * optional checkpoint parquet + `_last_checkpoint`, RoaringBitmap
  * deletion-vector sidecars), exactly the on-disk shape a delta-io
  * writer leaves behind — no Delta library exists in this sandbox, so
  * the layout itself is the contract under test (delta.io
  * PROTOCOL.md).
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
      dataChange: Boolean = true, dv: Option[DeltaDv.Descriptor] = None): String = {
    val pvs = pv.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    val dvJson = dv.map(d => s""","deletionVector":${DeltaDv.descriptorJson(d)}""").getOrElse("")
    s"""{"add":{"path":"$path","partitionValues":{$pvs},"size":1024,""" +
      s""""modificationTime":1700000000000,"dataChange":$dataChange$dvJson}}"""
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
    // VERSION AS OF: replay stops at the requested commit
    val v0 = DeltaTableReader.snapshotAsOf(spark, table, 0L)
    assert(v0.count() == 160L && v0.agg(max("id")).head().getLong(0) == 160L,
      "VERSION AS OF 0 must serve the pre-rewrite state")
    assert(DeltaTableReader.snapshotAsOf(spark, table, 2L).count() == 180L)
    val eTT = intercept[IllegalArgumentException](
      DeltaTableReader.snapshotAsOf(spark, table, 99L))
    assert(eTT.getMessage.contains("does not exist"))
    // TIMESTAMP AS OF: commit-file mtimes order the timeline (pinned
    // here — the fixture wrote all commits within one millisecond)
    val dir = new java.io.File(s"$table/_delta_log")
    (0L to 3L).foreach { v =>
      assert(new java.io.File(dir, f"$v%020d.json")
        .setLastModified(1700000000000L + v * 60000L))
    }
    val asOfTs = DeltaTableReader.snapshotAsOfTimestamp(
      spark, table, 1700000000000L + 90000L) // between v1 and v2
    assert(asOfTs.count() == 150L, "TIMESTAMP AS OF between v1 and v2 must serve v1")
    val eTs = intercept[IllegalArgumentException](
      DeltaTableReader.snapshotAsOfTimestamp(spark, table, 1000L))
    assert(eTs.getMessage.contains("no commit at or before"))
  }

  test("ICT WRITER: every commit to an inCommitTimestamp table carries a monotone stamp") {
    val s = spark
    import s.implicits._
    val table = tmpDir("delta-ict-writer") + "/t"
    DeltaTableWriter.create(rows(1 to 20), table): Unit
    // an external engine enables the feature on the existing table
    val w = new java.io.PrintWriter(
      new java.io.File(s"$table/_delta_log", f"${1L}%020d.json"), "UTF-8")
    try {
      w.println("""{"commitInfo":{"inCommitTimestamp":1000}}""")
      w.println("""{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["inCommitTimestamp"]}}""")
    } finally w.close()
    // appends no longer refuse: each commit carries a MONOTONE stamp
    DeltaTableWriter.append(rows(21 to 30), table): Unit
    DeltaTableWriter.upsert(rows(5 to 6).withColumn("v", lit(7L)), table, Seq("id")): Unit
    def ictOf(v: Long): Long = {
      val text = scala.io.Source.fromFile(
        new java.io.File(s"$table/_delta_log", f"$v%020d.json")).mkString
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      text.split('\n').filter(_.nonEmpty).map(m.readTree)
        .collectFirst { case n if n.has("commitInfo") =>
          n.get("commitInfo").get("inCommitTimestamp").asLong() }.get
    }
    assert(ictOf(2L) > 1000L, "the first writer commit must stamp past the enablement")
    assert(ictOf(3L) > ictOf(2L), "stamps must be strictly monotone")
    assert(DeltaTableReader.snapshot(spark, table).count() == 30L)
    // TIMESTAMP AS OF between the enablement and the append serves v1
    assert(DeltaTableReader.snapshotAsOfTimestamp(spark, table, ictOf(2L) - 1L)
      .count() == 20L)
  }

  test("IN-COMMIT timestamps beat file mtimes for TIMESTAMP AS OF (copy-stable per ICT)") {
    val table = tmpDir("delta-ict")
    writeDataFile(rows(1 to 20), table, "a.parquet")
    writeDataFile(rows(21 to 50), table, "b.parquet")
    // commitInfo.inCommitTimestamp says v0 @ t=1000, v1 @ t=5000;
    // the files' mtimes are TODAY — a mtime-based resolution would
    // say both commits are in the future and refuse
    writeCommit(table, 0L, Seq(
      """{"commitInfo":{"inCommitTimestamp":1000}}""",
      protocol, meta(Nil, schemaJson), add("a.parquet")))
    writeCommit(table, 1L, Seq(
      """{"commitInfo":{"inCommitTimestamp":5000}}""",
      add("b.parquet")))
    assert(DeltaTableReader.snapshotAsOfTimestamp(spark, table, 1500L).count() == 20L,
      "t=1500 resolves v0 off its in-commit timestamp")
    assert(DeltaTableReader.snapshotAsOfTimestamp(spark, table, 5000L).count() == 50L)
    val e = intercept[IllegalArgumentException](
      DeltaTableReader.snapshotAsOfTimestamp(spark, table, 500L))
    assert(e.getMessage.contains("no commit at or before"))
  }

  test("partitioned table reads as ONE scan (no per-partition union) with typed partition columns") {
    val s = spark
    import s.implicits._
    val table = tmpDir("delta-part-tbl")
    val pSchema =
      """{"type":"struct","fields":[""" +
        """{"name":"id","type":"long","nullable":true,"metadata":{}},""" +
        """{"name":"v","type":"long","nullable":true,"metadata":{}},""" +
        """{"name":"day","type":"integer","nullable":true,"metadata":{}}]}"""
    def dayRows(r: Range) = r.map(i => (i.toLong, i * 3L)).toDF("id", "v")
    // 64 partitions — enough that a union-per-partition plan would be
    // pathological; the contract is ONE FileSourceScanExec
    val addLines = (1 to 64).map { d =>
      writeDataFile(dayRows((d * 10) until (d * 10 + 10)), table, s"day=$d/f$d.parquet")
      add(s"day=$d/f$d.parquet", Map("day" -> d.toString))
    }
    writeCommit(table, 0L, Seq(protocol, meta(Seq("day"), pSchema)) ++ addLines)
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.schema("day").dataType == org.apache.spark.sql.types.IntegerType,
      "partition column must be typed from the table schema, not stringly")
    assert(snap.count() == 640L)
    assert(snap.where(col("day") === 2).count() == 10L)
    assert(snap.where(col("day") === 2).select(min("id")).head().getLong(0) == 20L,
      "partition values must attach to the right files' rows")
    assert(snap.where(col("day").isNull).count() == 0L,
      "every scanned file must match its partition-values map entry")
    // plan shape: exactly one parquet data scan, zero Union nodes
    val planStr = snap.queryExecution.executedPlan.treeString
    val nScans = "FileScan parquet".r.findAllIn(planStr).size
    assert(nScans == 1, s"expected ONE file scan, got $nScans:\n$planStr")
    assert(!planStr.contains("Union"), "partitioned read must not be a union plan")
    // column order follows the declared table schema
    assert(snap.columns.toSeq == Seq("id", "v", "day"))
    // activeFiles exposes partitionValues for pre-I/O pruning
    val acts = DeltaTableReader.activeFiles(spark, table)
    assert(acts.map(_.partitionValues("day")).map(_.toInt).sorted == (1 to 64))
    // pruning-first snapshot: only the pruned partition's file is in the scan
    val pruned = DeltaTableReader.snapshot(spark, table,
      partitionPruner = pv => pv.get("day").contains("7"))
    assert(pruned.count() == 10L)
    assert(pruned.inputFiles.length == 1,
      "partitionPruner must cut the file list before the scan")
  }

  test("deletion vectors are APPLIED: sidecar and inline forms subtract exactly their positions") {
    val table = tmpDir("delta-dv-read")
    writeDataFile(rows(1 to 100), table, "part-a.parquet")   // positions 0..99
    writeDataFile(rows(101 to 160), table, "part-b.parquet") // positions 0..59
    // sidecar DV kills part-a positions 0..9 (ids 1..10); inline DV
    // kills part-b positions 50..59 (ids 151..160)
    val conf = spark.sparkContext.hadoopConfiguration
    val Seq(sidecar) = DeltaDv.writeSidecar(conf, table, Seq((0L until 10L).toSeq))
    val inline = DeltaDv.inlineDescriptor((50L until 60L).toSeq)
    writeCommit(table, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      meta(Nil, schemaJson),
      add("part-a.parquet", dv = Some(sidecar)),
      add("part-b.parquet", dv = Some(inline))))
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.count() == 140L)
    assert(snap.agg(min("id"), max("id")).head().toSeq == Seq(11L, 150L))
    assert(snap.where(col("id") <= 10 || col("id") >= 151).count() == 0L)
    // still one data scan
    val planStr = snap.queryExecution.executedPlan.treeString
    assert("FileScan parquet".r.findAllIn(planStr).size == 1,
      s"DV subtraction must not fragment the data scan:\n$planStr")

    // a DV-bearing commit in an incremental range is a row DELETE and refuses
    val e = intercept[IllegalStateException](
      DeltaTableReader.incrementalSince(spark, table, -1L))
    assert(e.getMessage.contains("deletion vector"))
  }

  test("DV round-trip codec: z85, bitmap array, sidecar file") {
    val ps = Seq(0L, 1L, 63L, (1L << 32) | 5L, (1L << 32) | 7L, (7L << 32))
    assert(DeltaDv.deserializePositions(DeltaDv.serializePositions(ps)).toSeq == ps.sorted)
    val bytes = Array.tabulate[Byte](16)(i => (i * 17).toByte)
    assert(DeltaDv.z85Decode(DeltaDv.z85Encode(bytes)).toSeq == bytes.toSeq)
    val table = tmpDir("dv-codec")
    val conf = spark.sparkContext.hadoopConfiguration
    val Seq(d1, d2) = DeltaDv.writeSidecar(conf, table, Seq(Seq(1L, 2L), Seq(10L, 20L, 30L)))
    assert(d1.cardinality == 2 && d2.cardinality == 3)
    assert(DeltaDv.positionsOf(conf, table, d1).toSeq == Seq(1L, 2L))
    assert(DeltaDv.positionsOf(conf, table, d2).toSeq == Seq(10L, 20L, 30L))
    assert(DeltaDv.positionsOf(conf, table, DeltaDv.inlineDescriptor(Seq(3L, 4L))).toSeq
      == Seq(3L, 4L))
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

  test("checkpoint-only actions still enforce the refusal contract (protocol features, columnMapping, DVs)") {
    val s = spark
    import s.implicits._
    // after log cleanup, protocol/metaData/DV state may exist ONLY in
    // the checkpoint parquet — refusals and DV application must hold
    def buildCkptTable(name: String, ckptDf: DataFrame): String = {
      val table = tmpDir(name)
      writeDataFile(rows(1 to 50), table, "p0.parquet")
      new java.io.File(table, "_delta_log").mkdirs()
      val tmp = tmpDir(name + "-ck")
      ckptDf.coalesce(1).write.mode("overwrite").parquet(tmp)
      val src = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(s"$table/_delta_log", f"${0L}%020d.checkpoint.parquet").toPath): Unit
      val w = new java.io.PrintWriter(
        new java.io.File(s"$table/_delta_log", "_last_checkpoint"), "UTF-8")
      try w.println("""{"version":0,"size":2}""") finally w.close()
      table
    }
    def addStruct(dvJson: String) = struct(
      col("path"),
      map().cast("map<string,string>").as("partitionValues"),
      from_json(lit(dvJson), org.apache.spark.sql.types.StructType.fromDDL(
        "storageType string, pathOrInlineDv string, offset long, sizeInBytes int, cardinality long"))
        .as("deletionVector"))

    // 1. unknown reader feature in the checkpoint's protocol action
    val t1 = buildCkptTable("ck-feat",
      Seq("p0.parquet").toDF("path").select(
        addStruct("null").as("add"),
        struct(lit("fixture").as("id"), lit(schemaJson).as("schemaString"),
          array().cast("array<string>").as("partitionColumns")).as("metaData"),
        struct(lit(3).as("minReaderVersion"),
          array(lit("madeUpFeature")).as("readerFeatures")).as("protocol")))
    val e1 = intercept[IllegalStateException](DeltaTableReader.snapshot(spark, t1))
    assert(e1.getMessage.contains("reader features"))

    // 2. an UNKNOWN columnMapping mode in the checkpoint's
    // metaData.configuration (name and id modes read — their own specs)
    val t2 = buildCkptTable("ck-cmap",
      Seq("p0.parquet").toDF("path").select(
        addStruct("null").as("add"),
        struct(lit("fixture").as("id"), lit(schemaJson).as("schemaString"),
          array().cast("array<string>").as("partitionColumns"),
          map(lit("delta.columnMapping.mode"), lit("madeup")).as("configuration")).as("metaData")))
    val e2 = intercept[IllegalStateException](DeltaTableReader.snapshot(spark, t2))
    assert(e2.getMessage.contains("columnMapping"))

    // 3. a DV carried in the checkpoint's add action is APPLIED
    val inline = DeltaDv.inlineDescriptor((0L until 5L).toSeq) // ids 1..5
    val t3 = buildCkptTable("ck-dv",
      Seq("p0.parquet").toDF("path").select(
        addStruct(DeltaDv.descriptorJson(inline)).as("add"),
        struct(lit("fixture").as("id"), lit(schemaJson).as("schemaString"),
          array().cast("array<string>").as("partitionColumns")).as("metaData")))
    val snap = DeltaTableReader.snapshot(spark, t3)
    assert(snap.count() == 45L)
    assert(snap.select(min("id")).head().getLong(0) == 6L,
      "a checkpoint-carried deletion vector must subtract its positions")
  }

  test("unknown reader features and column mapping refuse; deletionVectors feature alone does not") {
    // supported feature set passes
    val t0 = tmpDir("delta-feat-ok")
    writeDataFile(rows(1 to 20), t0, "f.parquet")
    writeCommit(t0, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors","timestampNtz"],"writerFeatures":["deletionVectors"]}}""",
      meta(Nil, schemaJson), add("f.parquet")))
    assert(DeltaTableReader.snapshot(spark, t0).count() == 20L)
    // unknown feature refuses
    val t2 = tmpDir("delta-feat")
    writeDataFile(rows(1 to 20), t2, "f.parquet")
    writeCommit(t2, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["madeUpFeature"],"writerFeatures":["madeUpFeature"]}}""",
      meta(Nil, schemaJson), add("f.parquet")))
    val e2 = intercept[IllegalStateException](DeltaTableReader.snapshot(spark, t2))
    assert(e2.getMessage.contains("reader features"))
    // an UNKNOWN column-mapping mode refuses (name and id modes are
    // read — their own specs below)
    val t3 = tmpDir("delta-cmap")
    writeDataFile(rows(1 to 20), t3, "f.parquet")
    writeCommit(t3, 0L, Seq(protocol,
      s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${schemaJson.replace("\"", "\\\"")}","partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"madeup"},"createdTime":0}}""",
      add("f.parquet")))
    val e3 = intercept[IllegalStateException](DeltaTableReader.snapshot(spark, t3))
    assert(e3.getMessage.contains("columnMapping"))
  }

  /** Column-mapping `name` mode schemaString: logical names with
    * `delta.columnMapping.physicalName` metadata (the shape any table
    * that ever RENAMED or DROPPED a column carries).
    */
  private def colmapSchema(mapping: Seq[(String, String, String)]): String = {
    import org.apache.spark.sql.types._
    StructType(mapping.zipWithIndex.map { case ((logical, physical, tpe), i) =>
      StructField(logical, DataType.fromDDL(tpe), nullable = true,
        new MetadataBuilder()
          .putLong("delta.columnMapping.id", i + 1L)
          .putString("delta.columnMapping.physicalName", physical)
          .build())
    }).json
  }

  private def jsonQ(s: String): String =
    new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(s)

  test("columnMapping=name reads: physical parquet names map back to the logical schema") {
    val table = tmpDir("delta-cmap-name")
    // data files carry PHYSICAL names; the partition column is stripped
    // (its value rides the log under its physical name, per protocol)
    val data = rows(1 to 30)
    writeDataFile(
      data.where(col("grp") === "g1").select(col("id").as("col-aaa"), col("v").as("col-ccc")),
      table, "p1.parquet")
    writeDataFile(
      data.where(col("grp") === "g2").select(col("id").as("col-aaa"), col("v").as("col-ccc")),
      table, "p2.parquet")
    val schema = colmapSchema(Seq(
      ("id", "col-aaa", "BIGINT"), ("grp", "col-bbb", "STRING"), ("v", "col-ccc", "BIGINT")))
    writeCommit(table, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jsonQ(schema)},"partitionColumns":["grp"],""" +
        s""""configuration":{"delta.columnMapping.mode":"name",""" +
        s""""delta.columnMapping.maxColumnId":"3"},"createdTime":0}}""",
      add("p1.parquet", pv = Map("col-bbb" -> "g1")),
      add("p2.parquet", pv = Map("col-bbb" -> "g2"))))
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.columns.toSeq == Seq("id", "grp", "v"),
      "callers must see the LOGICAL schema, in schema order")
    assert(snap.count() == 20L)
    assert(snap.where(col("grp") === "g1").count() == 10L,
      "partition values keyed by physical name must resolve to the logical column")
    val r = snap.where(col("id") === 4L).head()
    assert(r.getString(1) == "g1" && r.getLong(2) == 8L)
    // time travel and column order survive the mapping too
    assert(DeltaTableReader.snapshotAsOf(spark, table, 0L).columns.toSeq == Seq("id", "grp", "v"))
    // NESTED physical names resolve through the TYPE system: the scan
    // requests the physical inner shape and a positional struct cast
    // renames it back to the declared logical fields
    val t2 = tmpDir("delta-cmap-nested")
    writeDataFile(
      rows(1 to 5).select(struct(col("id").as("col-x")).as("col-s")),
      t2, "f.parquet")
    val nested =
      """{"type":"struct","fields":[{"name":"s","type":{"type":"struct","fields":[""" +
        """{"name":"a","type":"long","nullable":true,"metadata":""" +
        """{"delta.columnMapping.physicalName":"col-x"}}]},"nullable":true,"metadata":""" +
        """{"delta.columnMapping.physicalName":"col-s"}}]}"""
    writeCommit(t2, 0L, Seq(protocol,
      s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jsonQ(nested)},"partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}""",
      add("f.parquet")))
    val snapN = DeltaTableReader.snapshot(spark, t2)
    assert(snapN.columns.toSeq == Seq("s"), "the LOGICAL top-level name must serve")
    assert(snapN.schema("s").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("a"), "the LOGICAL inner name must serve")
    assert(snapN.select(sum(col("s.a"))).head().getLong(0) == 15L,
      "the physical inner bytes must resolve into the logical field")
  }

  test("V2 checkpoints: uuid-named manifests (parquet AND json) with sidecar file actions; refusals hold") {
    val s = spark
    import s.implicits._
    def landFile(df: DataFrame, dst: String): Unit = {
      val tmp = tmpDir("v2ck-stage")
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val src = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      new java.io.File(dst).getParentFile.mkdirs()
      java.nio.file.Files.copy(src.toPath, new java.io.File(dst).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    }
    def lastCkpt(table: String): Unit = {
      val w = new java.io.PrintWriter(
        new java.io.File(s"$table/_delta_log", "_last_checkpoint"), "UTF-8")
      try w.println("""{"version":0,"size":4}""") finally w.close()
    }
    def sidecarActions(paths: Seq[String]): DataFrame = paths.toDF("p").select(
      struct(col("p").as("path"),
        map().cast("map<string,string>").as("partitionValues")).as("add"))
    val protoRow = Seq(1).toDF("x").select(
      struct(lit(3).as("minReaderVersion"), lit(7).as("minWriterVersion"),
        array(lit("v2Checkpoint")).as("readerFeatures"),
        array(lit("v2Checkpoint")).as("writerFeatures")).as("protocol"),
      struct(lit("fixture").as("id"), lit(schemaJson).as("schemaString"),
        array().cast("array<string>").as("partitionColumns")).as("metaData"),
      struct(lit(0L).as("version")).as("checkpointMetadata"))

    // ---- parquet manifest + sidecars
    val t1 = tmpDir("v2ck-parquet")
    writeDataFile(rows(1 to 30), t1, "pa.parquet")
    writeDataFile(rows(31 to 50), t1, "pb.parquet")
    landFile(sidecarActions(Seq("pa.parquet", "pb.parquet")),
      s"$t1/_delta_log/_sidecars/sc-1.parquet")
    val manifest = protoRow.unionByName(
      Seq("sc-1.parquet").toDF("p").select(
        struct(col("p").as("path"), lit(1024L).as("sizeInBytes")).as("sidecar")),
      allowMissingColumns = true)
    landFile(manifest,
      s"$t1/_delta_log/${0L.formatted("%020d")}.checkpoint.7a9e-uuid-1.parquet")
    lastCkpt(t1)
    val snap = DeltaTableReader.snapshot(spark, t1)
    assert(snap.count() == 50L, "v2 parquet manifest: sidecar adds must be the add-set")
    assert(snap.columns.toSeq == Seq("id", "grp", "v"))

    // ---- JSON manifest + sidecars
    val t2 = tmpDir("v2ck-json")
    writeDataFile(rows(1 to 40), t2, "pa.parquet")
    landFile(sidecarActions(Seq("pa.parquet")),
      s"$t2/_delta_log/_sidecars/sc-1.parquet")
    new java.io.File(s"$t2/_delta_log").mkdirs()
    val w = new java.io.PrintWriter(
      new java.io.File(s"$t2/_delta_log", f"${0L}%020d.checkpoint.b2c-uuid-2.json"), "UTF-8")
    try {
      w.println("""{"checkpointMetadata":{"version":0}}""")
      w.println("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""")
      w.println(meta(Nil, schemaJson))
      w.println("""{"sidecar":{"path":"sc-1.parquet","sizeInBytes":1024}}""")
    } finally w.close()
    lastCkpt(t2)
    assert(DeltaTableReader.snapshot(spark, t2).count() == 40L,
      "v2 JSON manifest: metadata from lines, adds from sidecars")
    // later JSON commits still replay on top of the v2 base
    writeDataFile(rows(41 to 45), t2, "pc.parquet")
    writeCommit(t2, 1L, Seq(add("pc.parquet")))
    assert(DeltaTableReader.snapshot(spark, t2).count() == 45L)

    // ---- refusal: JSON manifest with INLINE file actions
    val t3 = tmpDir("v2ck-inline")
    writeDataFile(rows(1 to 10), t3, "pa.parquet")
    new java.io.File(s"$t3/_delta_log").mkdirs()
    val w3 = new java.io.PrintWriter(
      new java.io.File(s"$t3/_delta_log", f"${0L}%020d.checkpoint.c3d-uuid-3.json"), "UTF-8")
    try {
      w3.println(meta(Nil, schemaJson))
      w3.println(add("pa.parquet"))
    } finally w3.close()
    lastCkpt(t3)
    val e3 = intercept[IllegalStateException](DeltaTableReader.snapshot(spark, t3))
    assert(e3.getMessage.contains("inline file actions"))

    // ---- refusal: checkpointMetadata version disagrees with _last_checkpoint
    val t4 = tmpDir("v2ck-vers")
    writeDataFile(rows(1 to 10), t4, "pa.parquet")
    landFile(sidecarActions(Seq("pa.parquet")),
      s"$t4/_delta_log/_sidecars/sc-1.parquet")
    landFile(protoRow.select(struct(lit(7L).as("version")).as("checkpointMetadata")),
      s"$t4/_delta_log/${0L.formatted("%020d")}.checkpoint.d4e-uuid-4.parquet")
    lastCkpt(t4)
    val e4 = intercept[IllegalStateException](DeltaTableReader.snapshot(spark, t4))
    assert(e4.getMessage.contains("inconsistent checkpoint"))
  }

  test("columnMapping=id reads: parquet FIELD IDS resolve columns — names are decoys; DVs compose") {
    import org.apache.spark.sql.types.MetadataBuilder
    val table = tmpDir("delta-cmap-id")
    def fid(i: Long) = new MetadataBuilder().putLong("parquet.field.id", i).build()
    // the data file's column NAMES match neither the logical schema
    // nor the physicalName metadata, and ride in reversed order — only
    // field-ID matching can resolve them (the mode's actual rule)
    writeDataFile(rows(1 to 20).select(
      col("v").as("zzz", fid(2)), col("id").as("aaa", fid(1))), table, "f.parquet")
    val schema = colmapSchema(Seq(("id", "col-aaa", "BIGINT"), ("v", "col-ccc", "BIGINT")))
    writeCommit(table, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jsonQ(schema)},"partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"id",""" +
        s""""delta.columnMapping.maxColumnId":"2"},"createdTime":0}}""",
      add("f.parquet")))
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.columns.toSeq == Seq("id", "v"),
      "callers must see the LOGICAL schema, in schema order")
    assert(snap.count() == 20L)
    val r = snap.where(col("id") === 4L).head()
    assert(r.getAs[Long]("v") == 8L, "field id 2 must resolve to v regardless of name/order")
    // a deletion vector composes with id-mode resolution
    // (_metadata.row_index works under an explicit read schema)
    val inline = DeltaDv.inlineDescriptor((0L until 5L).toSeq)
    writeCommit(table, 1L, Seq(
      remove("f.parquet"),
      s"""{"add":{"path":"f.parquet","partitionValues":{},"size":1,""" +
        s""""modificationTime":1,"dataChange":true,""" +
        s""""deletionVector":${DeltaDv.descriptorJson(inline)}}}"""))
    val masked = DeltaTableReader.snapshot(spark, table)
    assert(masked.count() == 15L && masked.select(min("id")).head().getLong(0) == 6L)
    // a schema missing delta.columnMapping.id refuses — id matching is
    // undefined without the ids
    val t2 = tmpDir("delta-cmap-id-missing")
    writeDataFile(rows(1 to 5), t2, "f.parquet")
    writeCommit(t2, 0L, Seq(protocol,
      s"""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${schemaJson.replace("\"", "\\\"")}","partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"id"},"createdTime":0}}""",
      add("f.parquet")))
    val e = intercept[IllegalStateException](DeltaTableReader.snapshot(spark, t2).count())
    assert(e.getMessage.contains("delta.columnMapping.id"))
  }

  test("changeFeedSince: inserts from adds, delete pre-images from DV diffs and removes; restores refuse") {
    val table = tmpDir("delta-cdc-spec")
    writeDataFile(rows(1 to 30), table, "a.parquet")
    writeCommit(table, 0L, Seq(protocol, meta(Nil, schemaJson), add("a.parquet")))
    // v1: DV attach masking rows id 1..5 (positions 0..4)
    val dv1 = DeltaDv.inlineDescriptor(0L until 5L)
    writeCommit(table, 1L, Seq(remove("a.parquet"), add("a.parquet", dv = Some(dv1))))
    // v2: append
    writeDataFile(rows(31 to 40), table, "b.parquet")
    writeCommit(table, 2L, Seq(add("b.parquet")))
    // v3: compaction — rewrite b into c with dataChange=false (invisible)
    writeDataFile(rows(31 to 40), table, "c.parquet")
    writeCommit(table, 3L, Seq(remove("b.parquet", dataChange = false),
      add("c.parquet", dataChange = false)))
    // v4: DV growth to ids 1..8
    val dv2 = DeltaDv.inlineDescriptor(0L until 8L)
    writeCommit(table, 4L, Seq(remove("a.parquet"), add("a.parquet", dv = Some(dv2))))
    // v5: whole-file delete of c (the compacted copy)
    writeCommit(table, 5L, Seq(remove("c.parquet")))

    val feed = DeltaTableReader.changeFeedSince(spark, table, 0L)
    import org.apache.spark.sql.functions._
    def ids(change: String, v: Long): Set[Long] = feed
      .where(col("_change_type") === change && col("_commit_version") === v)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids("delete", 1L) == (1L to 5L).toSet, "DV attach = delete pre-images")
    assert(ids("insert", 2L) == (31L to 40L).toSet, "append = insert images")
    assert(feed.where(col("_commit_version") === 3L).count() == 0L,
      "dataChange=false compaction must be invisible to the feed")
    assert(ids("delete", 4L) == (6L to 8L).toSet,
      "DV growth = pre-images at exactly the NEWLY-masked positions")
    assert(ids("delete", 5L) == (31L to 40L).toSet,
      "a data-changing remove = delete pre-images of the file's live rows")
    // the feed replays consistently from a mid checkpoint too
    assert(DeltaTableReader.changeFeedSince(spark, table, 3L)
      .where(col("_change_type") === "delete").count() == 13L)

    // a SHRINKING vector (restore) refuses
    val t2 = tmpDir("delta-cdc-restore")
    writeDataFile(rows(1 to 20), t2, "a.parquet")
    writeCommit(t2, 0L, Seq(protocol, meta(Nil, schemaJson),
      add("a.parquet", dv = Some(DeltaDv.inlineDescriptor(0L until 6L)))))
    writeCommit(t2, 1L, Seq(remove("a.parquet"),
      add("a.parquet", dv = Some(DeltaDv.inlineDescriptor(0L until 3L)))))
    val e = intercept[IllegalStateException](
      DeltaTableReader.changeFeedSince(spark, t2, 0L))
    assert(e.getMessage.contains("restore"))
    // equal-cardinality vector SWAP refuses at the positions level
    val t3 = tmpDir("delta-cdc-swap")
    writeDataFile(rows(1 to 20), t3, "a.parquet")
    writeCommit(t3, 0L, Seq(protocol, meta(Nil, schemaJson),
      add("a.parquet", dv = Some(DeltaDv.inlineDescriptor(Seq(0L, 1L, 2L))))))
    writeCommit(t3, 1L, Seq(remove("a.parquet"),
      add("a.parquet", dv = Some(DeltaDv.inlineDescriptor(Seq(0L, 1L, 9L))))))
    val e2 = intercept[IllegalStateException](
      DeltaTableReader.changeFeedSince(spark, t3, 0L))
    assert(e2.getMessage.contains("delete+restore") || e2.getMessage.contains("restore"))
  }

  test("changeFeedSince: explicit cdc actions ARE the commit's feed; reconstruction is skipped") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val table = tmpDir("delta-cdc-files")
    writeDataFile(rows(1 to 20), table, "a.parquet")
    writeCommit(table, 0L, Seq(protocol, meta(Nil, schemaJson), add("a.parquet")))
    // v1: a CDF-enabled UPDATE — rewrite a→a2 (ids 1..3 get v*10),
    // with the change rows recorded EXPLICITLY in a cdc file
    writeDataFile(
      rows(1 to 20).withColumn("v", when(col("id") <= 3L, col("v") * 10L).otherwise(col("v"))),
      table, "a2.parquet")
    val changes =
      rows(1 to 3).withColumn("_change_type", lit("update_preimage"))
        .unionByName(rows(1 to 3).withColumn("v", col("v") * 10L)
          .withColumn("_change_type", lit("update_postimage")))
    writeDataFile(changes, table, "_change_data/cdc-1.parquet")
    writeCommit(table, 1L, Seq(
      remove("a.parquet"), add("a2.parquet"),
      """{"cdc":{"path":"_change_data/cdc-1.parquet","partitionValues":{},""" +
        """"size":1024,"dataChange":false}}"""))
    // v2: an ordinary append AFTER the cdc commit — state replay must
    // have carried through (a2 active), so this reconstructs as insert
    writeDataFile(rows(21 to 25), table, "b.parquet")
    writeCommit(table, 2L, Seq(add("b.parquet")))

    val feed = DeltaTableReader.changeFeedSince(spark, table, 0L)
    val v1 = feed.where(col("_commit_version") === 1L)
    assert(v1.count() == 6L,
      "the cdc files are the whole feed for their commit — no reconstructed " +
        "insert(a2)/delete(a) rows may appear")
    assert(v1.where(col("_change_type") === "update_preimage")
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(v1.where(col("_change_type") === "update_postimage" && col("id") === 2L)
      .select("v").head().getLong(0) == 40L)
    assert(feed.where(col("_commit_version") === 2L && col("_change_type") === "insert")
      .count() == 5L)
    // the snapshot sees the post-update state (cdc file itself invisible)
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.count() == 25L)
    assert(snap.where(col("id") === 2L).select("v").head().getLong(0) == 40L)
  }

  test("non-contiguous logs refuse: cleaned commits cannot be silently skipped") {
    // snapshot path: missing middle JSON with no checkpoint
    val t1 = tmpDir("delta-gap")
    writeDataFile(rows(1 to 10), t1, "a.parquet")
    writeDataFile(rows(11 to 20), t1, "b.parquet")
    writeDataFile(rows(21 to 30), t1, "c.parquet")
    writeCommit(t1, 0L, Seq(protocol, meta(Nil, schemaJson), add("a.parquet")))
    writeCommit(t1, 1L, Seq(add("b.parquet")))
    writeCommit(t1, 2L, Seq(add("c.parquet")))
    assert(new java.io.File(s"$t1/_delta_log", f"${1L}%020d.json").delete())
    val e1 = intercept[IllegalStateException](DeltaTableReader.snapshot(spark, t1))
    assert(e1.getMessage.contains("not contiguous"))
    // incremental path: same gap
    val e2 = intercept[IllegalStateException](DeltaTableReader.incrementalSince(spark, t1, 0L))
    assert(e2.getMessage.contains("not contiguous"))
    // cleaned head without checkpoint
    val t2 = tmpDir("delta-headgap")
    writeDataFile(rows(1 to 10), t2, "a.parquet")
    writeCommit(t2, 1L, Seq(protocol, meta(Nil, schemaJson), add("a.parquet")))
    val e3 = intercept[IllegalStateException](DeltaTableReader.snapshot(spark, t2))
    assert(e3.getMessage.contains("no checkpoint"))
  }

  test("driver add-set bound enforces loudly; pruning-first reads pass under it") {
    val table = tmpDir("delta-bound")
    (1 to 4).foreach { d =>
      writeDataFile(rows((d * 10) until (d * 10 + 5)), table, s"day=$d/f.parquet")
    }
    val pSchema =
      """{"type":"struct","fields":[""" +
        """{"name":"id","type":"long","nullable":true,"metadata":{}},""" +
        """{"name":"grp","type":"string","nullable":true,"metadata":{}},""" +
        """{"name":"v","type":"long","nullable":true,"metadata":{}},""" +
        """{"name":"day","type":"integer","nullable":true,"metadata":{}}]}"""
    writeCommit(table, 0L, Seq(protocol, meta(Seq("day"), pSchema)) ++
      (1 to 4).map(d => add(s"day=$d/f.parquet", Map("day" -> d.toString))))
    val e = intercept[IllegalStateException](
      DeltaTableReader.snapshot(spark, table, maxDriverFiles = 2))
    assert(e.getMessage.contains("maxDriverFiles") || e.getMessage.contains("exceeds 2"))
    // the same bound passes when the pruner cuts the set first
    val pruned = DeltaTableReader.snapshot(spark, table,
      partitionPruner = pv => pv.get("day").contains("3"), maxDriverFiles = 2)
    assert(pruned.count() == 5L)
  }

  test("percent-encoded add paths resolve to the real file (PROTOCOL.md path encoding)") {
    val table = tmpDir("delta-enc")
    writeDataFile(rows(1 to 25), table, "part a.parquet") // space in the name
    writeCommit(table, 0L, Seq(protocol, meta(Nil, schemaJson), add("part%20a.parquet")))
    assert(DeltaTableReader.snapshot(spark, table).count() == 25L)
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
