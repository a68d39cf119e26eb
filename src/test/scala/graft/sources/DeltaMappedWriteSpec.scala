package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Data-modifying writes on COLUMN-MAPPED Delta tables (delta.io
  * PROTOCOL.md Column Mapping) — the UniForm/converted-table world:
  * DV deletes are path-level bookkeeping (re-add lines re-emit each
  * file's own physical-keyed partitionValues), upserts land new files
  * under physical names (+ field ids in id mode), compaction rewrites
  * through the same projection. CDF on mapped tables refuses (the
  * change-data files would need physical names this writer does not
  * land).
  */
class DeltaMappedWriteSpec extends SparkSpec {

  import org.apache.spark.sql.types._

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"g${i % 3}", i * 2L)).toDF("id", "grp", "v").coalesce(1)
  }

  /** An externally-shaped mapped table: physical parquet names,
    * mapping metadata in the schemaString. */
  private def mkMapped(table: String, mode: String): Unit = {
    new java.io.File(s"$table/_delta_log").mkdirs()
    val phys = Seq("id" -> "col-m1", "grp" -> "col-m2", "v" -> "col-m3")
    val stage = tmpDir("dmw-stage") + "/out"
    df(1 to 40).select(phys.map { case (l, p) => col(l).as(p) }: _*)
      .write.parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(table, "part-a.parquet").toPath)
    val schema = StructType(phys.zipWithIndex.map { case ((l, p), i) =>
      StructField(l, if (l == "grp") StringType else LongType, nullable = true,
        new MetadataBuilder()
          .putLong("delta.columnMapping.id", i + 1L)
          .putString("delta.columnMapping.physicalName", p).build())
    }).json
    val sq = new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(schema)
    val size = new java.io.File(table, "part-a.parquet").length()
    java.nio.file.Files.write(
      new java.io.File(s"$table/_delta_log", f"${0L}%020d.json").toPath,
      (Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"dmw","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":$sq,"partitionColumns":[],""" +
          s""""configuration":{"delta.columnMapping.mode":"$mode",""" +
          s""""delta.columnMapping.maxColumnId":"3"},"createdTime":0}}""",
        s"""{"add":{"path":"part-a.parquet","partitionValues":{},"size":$size,""" +
          s""""modificationTime":0,"dataChange":true}}""").mkString("\n") + "\n")
        .getBytes("UTF-8")): Unit
  }

  test("name mode: DV delete masks rows without rewrite; upsert merges; compact rewrites physically") {
    val table = tmpDir("dmw-name") + "/t"
    mkMapped(table, "name")
    val s = spark
    import s.implicits._
    // DV delete through the logical predicate
    DeltaTableWriter.delete(spark, table, col("id") <= 5): Unit
    val afterDel = DeltaTableReader.snapshot(spark, table)
    assert(afterDel.count() == 35L && afterDel.where(col("id") <= 5).isEmpty)
    assert(DeltaTableReader.snapshotState(spark, table).active
      .exists(_.dv.isDefined), "the delete must land as a DV, not a rewrite")
    // upsert: matched key replaced, new key inserted, files physical
    DeltaTableWriter.upsert(
      Seq((10L, "g1", 999L), (100L, "g0", 7L)).toDF("id", "grp", "v"),
      table, keys = Seq("id")): Unit
    val afterUp = DeltaTableReader.snapshot(spark, table)
    assert(afterUp.count() == 36L)
    assert(afterUp.where(col("id") === 10L).head().getAs[Long]("v") == 999L)
    assert(afterUp.where(col("id") === 100L).count() == 1L)
    val dataFiles = new java.io.File(table).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.getName != "part-a.parquet")
    assert(dataFiles.nonEmpty)
    dataFiles.foreach { f =>
      val cols = spark.read.parquet(f.toString).columns.toSet
      assert(cols == Set("col-m1", "col-m2", "col-m3"),
        s"mapped writes must land PHYSICAL names, got ${cols.mkString(",")}")
    }
    // compaction rewrites the live view through the same projection
    DeltaTableWriter.compact(spark, table, targetFiles = 1): Unit
    val afterCompact = DeltaTableReader.snapshot(spark, table)
    assert(afterCompact.count() == 36L)
    assert(afterCompact.where(col("id") === 10L).head().getAs[Long]("v") == 999L)
    assert(afterCompact.where(col("id") <= 5).isEmpty,
      "compaction must fold the DV masks in, not resurrect deleted rows")
    // a wide upsert refuses (mapped evolution lives in append)
    val e = intercept[IllegalArgumentException](
      DeltaTableWriter.upsert(Seq((1L, "g0", 1L, "x")).toDF("id", "grp", "v", "t"),
        table, keys = Seq("id")))
    assert(e.getMessage.contains("evolve through append"))
  }

  test("id mode: delete + upsert resolve by field id; upserted files carry stamped ids") {
    val table = tmpDir("dmw-id") + "/t"
    mkMapped(table, "id")
    val s = spark
    import s.implicits._
    // the fixture file has NO field ids — id-mode reads of it refuse?
    // no: mkMapped's fixture file carries physical names matching the
    // declared physicalName metadata, but id mode resolves by FIELD
    // ID. Stamp a fresh id-carrying base through graft's own append
    // first, then delete/upsert against the mixed table is NOT the
    // shape under test — rebuild id-pure instead.
    deleteRecursively(new java.io.File(table))
    new java.io.File(s"$table/_delta_log").mkdirs()
    // an id-pure table: created empty-shaped by one graft append over
    // a hand-written metaData commit
    val phys = Seq("id" -> "col-m1", "grp" -> "col-m2", "v" -> "col-m3")
    val schema = StructType(phys.zipWithIndex.map { case ((l, p), i) =>
      StructField(l, if (l == "grp") StringType else LongType, nullable = true,
        new MetadataBuilder()
          .putLong("delta.columnMapping.id", i + 1L)
          .putString("delta.columnMapping.physicalName", p).build())
    }).json
    val sq = new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(schema)
    java.nio.file.Files.write(
      new java.io.File(s"$table/_delta_log", f"${0L}%020d.json").toPath,
      (Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"dmw-id","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":$sq,"partitionColumns":[],""" +
          s""""configuration":{"delta.columnMapping.mode":"id",""" +
          s""""delta.columnMapping.maxColumnId":"3"},"createdTime":0}}""").mkString("\n") + "\n")
        .getBytes("UTF-8")): Unit
    DeltaTableWriter.append(df(1 to 40), table): Unit
    assert(DeltaTableReader.snapshot(spark, table).count() == 40L)
    DeltaTableWriter.delete(spark, table, col("id") % 10 === 0): Unit
    assert(DeltaTableReader.snapshot(spark, table).count() == 36L)
    DeltaTableWriter.upsert(Seq((7L, "g1", 7000L)).toDF("id", "grp", "v"),
      table, keys = Seq("id")): Unit
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.count() == 36L)
    assert(snap.where(col("id") === 7L).head().getAs[Long]("v") == 7000L)
  }

  test("CDF on a NAME-mapped table: change data lands physically, the feed serves logically") {
    val table = tmpDir("dmw-cdf") + "/t"
    mkMapped(table, "name")
    // flip CDF on via a metaData commit
    val st = DeltaTableReader.snapshotState(spark, table)
    val conf = st.configuration + ("delta.enableChangeDataFeed" -> "true")
    val confJson = conf.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString(",")
    val sq = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(st.schemaJson.get)
    java.nio.file.Files.write(
      new java.io.File(s"$table/_delta_log", f"${1L}%020d.json").toPath,
      (s"""{"metaData":{"id":"dmw","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":$sq,"partitionColumns":[],""" +
        s""""configuration":{$confJson},"createdTime":0}}""" + "\n").getBytes("UTF-8")): Unit
    DeltaTableWriter.delete(spark, table, col("id") <= 5): Unit
    // the landed change-data files carry PHYSICAL names + _change_type
    val cdcDir = new java.io.File(s"$table/_change_data")
    val cdcFiles = Option(cdcDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    assert(cdcFiles.nonEmpty, "the CDF obligation must land change-data files")
    cdcFiles.foreach { f =>
      val cols = spark.read.parquet(f.toString).columns.toSet
      assert(cols == Set("col-m1", "col-m2", "col-m3", "_change_type"),
        s"change data must carry PHYSICAL names, got ${cols.mkString(",")}")
    }
    // the feed serves the images under LOGICAL names
    val feed = DeltaTableReader.changeFeedSince(spark, table, 1L)
    assert(feed.columns.contains("id") && feed.columns.contains("_change_type"))
    assert(feed.where(col("_change_type") === "delete").count() == 5L)
    assert(feed.where(col("_change_type") === "delete")
      .agg(max(col("id"))).head().getLong(0) == 5L)
    // id-mode CDF: change data lands with FIELD IDS on the data
    // columns (`_change_type` id-less — a metadata column outside the
    // schema, name-resolved) and the feed serves logical names. The
    // table is built ID-PURE (graft append stamps the ids) — the
    // shape under test is id-mode resolution, not mixed files.
    val idTable = tmpDir("dmw-cdf-id") + "/t"
    new java.io.File(s"$idTable/_delta_log").mkdirs()
    val phys2 = Seq("id" -> "col-m1", "grp" -> "col-m2", "v" -> "col-m3")
    val schema2 = StructType(phys2.zipWithIndex.map { case ((l, p), i) =>
      StructField(l, if (l == "grp") StringType else LongType, nullable = true,
        new MetadataBuilder()
          .putLong("delta.columnMapping.id", i + 1L)
          .putString("delta.columnMapping.physicalName", p).build())
    }).json
    val sq2 = new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(schema2)
    java.nio.file.Files.write(
      new java.io.File(s"$idTable/_delta_log", f"${0L}%020d.json").toPath,
      (Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"dmw-cdf-id","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":$sq2,"partitionColumns":[],""" +
          s""""configuration":{"delta.columnMapping.mode":"id",""" +
          s""""delta.columnMapping.maxColumnId":"3",""" +
          s""""delta.enableChangeDataFeed":"true"},"createdTime":0}}""").mkString("\n") + "\n")
        .getBytes("UTF-8")): Unit
    DeltaTableWriter.append(df(1 to 40), idTable): Unit
    DeltaTableWriter.delete(spark, idTable, col("id") <= 5): Unit
    val cdcDir2 = new java.io.File(s"$idTable/_change_data")
    val cdcFiles2 = Option(cdcDir2.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    assert(cdcFiles2.nonEmpty, "the id-mode CDF obligation must land change-data files")
    cdcFiles2.foreach { f =>
      // physical names in the file, field ids on the data columns
      val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
        spark.sparkContext.hadoopConfiguration,
        new org.apache.hadoop.fs.Path(f.toString))
      val fields = footer.getFileMetaData.getSchema.getFields
      import scala.jdk.CollectionConverters._
      val byName = fields.asScala.map(t => t.getName -> Option(t.getId)).toMap
      assert(byName.keySet == Set("col-m1", "col-m2", "col-m3", "_change_type"),
        s"id-mode change data must carry physical names, got ${byName.keySet}")
      assert(byName("col-m1").exists(_.intValue() == 1) &&
        byName("col-m2").exists(_.intValue() == 2) &&
        byName("col-m3").exists(_.intValue() == 3),
        s"data columns must carry their field ids, got $byName")
      assert(byName("_change_type").isEmpty,
        "_change_type is a metadata column outside the schema — no field id")
    }
    val idFeed = DeltaTableReader.changeFeedSince(spark, idTable, 1L)
    assert(idFeed.columns.contains("id") && idFeed.columns.contains("_change_type"))
    assert(idFeed.where(col("_change_type") === "delete").count() == 5L)
    assert(idFeed.where(col("_change_type") === "delete")
      .agg(max(col("id"))).head().getLong(0) == 5L)
  }

  test("id mode: NESTED mapped fields resolve by inner PHYSICAL NAMES; id-mode nested WRITES stamp inner ids") {
    // a converted table's files carry parquet field ids at EVERY
    // struct level; the id-mode read resolves the TOP level by field
    // id (authoritative) but inner fields by their recorded
    // delta.columnMapping.physicalName — inner ids deliberately do
    // NOT ride the request because Spark's nested schema pruning
    // rebuilds pruned inner structs WITHOUT field metadata, which
    // would silently null any nested-field select
    // (SparkPruningCanarySpec pins this premise)
    val table = tmpDir("dmw-nested-id") + "/t"
    new java.io.File(s"$table/_delta_log").mkdirs()
    def meta(id: Long, phys: String) = new MetadataBuilder()
      .putLong("delta.columnMapping.id", id)
      .putString("delta.columnMapping.physicalName", phys).build()
    def pqMeta(id: Long) = new MetadataBuilder().putLong("parquet.field.id", id).build()
    // the FILE's physical shape: phys names + ids at both levels
    val fileSchema = StructType(Seq(
      StructField("p_top", StructType(Seq(
        StructField("p_name", StringType, nullable = true, pqMeta(2)),
        StructField("p_score", LongType, nullable = true, pqMeta(3)))),
        nullable = true, pqMeta(1)),
      StructField("p_k", LongType, nullable = true, pqMeta(4))))
    import scala.jdk.CollectionConverters._
    val rows = (1 to 10).map(i =>
      org.apache.spark.sql.Row(org.apache.spark.sql.Row(s"n$i", i * 10L), i.toLong))
    val key = "spark.sql.parquet.fieldId.write.enabled"
    spark.conf.set(key, "true")
    val stage = tmpDir("dmw-nested-stage") + "/out"
    try spark.createDataFrame(rows.asJava, fileSchema).coalesce(1).write.parquet(stage)
    finally spark.conf.unset(key)
    val part = new java.io.File(stage).listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, new java.io.File(table, "part-n.parquet").toPath)
    // the LOG's logical shape: logical names, same ids, inner mapping
    val declared = StructType(Seq(
      StructField("cust", StructType(Seq(
        StructField("name", StringType, nullable = true, meta(2, "p_name")),
        StructField("score", LongType, nullable = true, meta(3, "p_score")))),
        nullable = true, meta(1, "p_top")),
      StructField("k", LongType, nullable = true, meta(4, "p_k"))))
    val sq = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(declared.json)
    val size = new java.io.File(table, "part-n.parquet").length()
    java.nio.file.Files.write(
      new java.io.File(s"$table/_delta_log", f"${0L}%020d.json").toPath,
      (Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"dmw-nested","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":$sq,"partitionColumns":[],""" +
          s""""configuration":{"delta.columnMapping.mode":"id",""" +
          s""""delta.columnMapping.maxColumnId":"4"},"createdTime":0}}""",
        s"""{"add":{"path":"part-n.parquet","partitionValues":{},"size":$size,""" +
          s""""modificationTime":0,"dataChange":true}}""").mkString("\n") + "\n")
        .getBytes("UTF-8")): Unit
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.columns.toSet == Set("cust", "k"))
    assert(snap.schema("cust").dataType.isInstanceOf[StructType])
    assert(snap.count() == 10L)
    assert(snap.where(col("k") === 3L).select(col("cust.name")).head().getString(0) == "n3")
    assert(snap.agg(sum(col("cust.score"))).head().getLong(0) == 550L)
    // the WRITE side lands spec-true nested files: the upsert's data
    // file carries physical names AND parquet field ids at EVERY
    // struct level (the fully-annotated cast target +
    // fieldId.write.enabled), so external id-mode engines resolve it
    val s2 = spark
    import s2.implicits._
    val batch = Seq((("nX", 999L), 3L)).toDF("cust", "k")
      .select(col("cust").cast(snap.schema("cust").dataType).as("cust"), col("k"))
    DeltaTableWriter.upsert(batch, table, keys = Seq("k")): Unit
    val after = DeltaTableReader.snapshot(spark, table)
    assert(after.count() == 10L)
    assert(after.where(col("k") === 3L).select(col("cust.score")).head().getLong(0) == 999L)
    assert(after.where(col("k") === 3L).select(col("cust.name")).head().getString(0) == "nX")
    // footer proof on the landed file: inner fields carry their ids
    val landed = new java.io.File(table).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.getName != "part-n.parquet")
    assert(landed.nonEmpty, "the upsert must land a new data file")
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      new org.apache.hadoop.conf.Configuration(),
      new org.apache.hadoop.fs.Path(landed.head.getAbsolutePath))
    val msgType = footer.getFileMetaData.getSchema
    val top = msgType.getFields.asScala.map(t => t.getName -> Option(t.getId)).toMap
    assert(top("p_top").map(_.intValue()).contains(1), s"top-level id must stamp: $top")
    assert(top("p_k").map(_.intValue()).contains(4), s"top-level id must stamp: $top")
    val innerFields = msgType.getType(Seq("p_top"): _*).asGroupType().getFields.asScala
      .map(t => t.getName -> Option(t.getId)).toMap
    assert(innerFields("p_name").map(_.intValue()).contains(2),
      s"INNER field ids must stamp (physical names + ids at every level): $innerFields")
    assert(innerFields("p_score").map(_.intValue()).contains(3),
      s"INNER field ids must stamp: $innerFields")
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
