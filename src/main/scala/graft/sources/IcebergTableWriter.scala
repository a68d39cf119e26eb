package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

import IcebergTransforms.PartitionField

/** APPEND-ONLY writer for Apache Iceberg v2 tables readable by
  * external engines — the third leg of the writer-side interop
  * surface beside [[DeltaTableWriter]] and [[HudiTableWriter]],
  * implemented from the PUBLIC Iceberg table spec the reader is
  * locked against (iceberg.apache.org/spec):
  *
  *  - data parquet lands under `data/` with UUID names — identity
  *    PARTITION columns stay IN the data files (Iceberg does not
  *    strip them) while their values are recorded on each manifest
  *    entry's `partition` struct, which is what lets readers prune
  *    at the manifest level without touching data;
  *  - each commit writes ONE Avro manifest of `status=added` entries
  *    (real per-file `record_count` read from the parquet footers,
  *    per-entry `sequence_number` for v2 delete scoping), a manifest
  *    LIST that reuses every previous manifest plus the new one (the
  *    manifest-reuse shape real writers produce, what makes
  *    incremental readers filter on `added_snapshot_id`), and a new
  *    `vN.metadata.json` carrying the snapshot log with parent links,
  *    the table `schemas` (field ids — what equality deletes resolve
  *    against) and the identity `partition-specs`;
  *  - commit publication is an exclusive-create CAS on
  *    `vN.metadata.json` — the filesystem-catalog protocol (the racer
  *    that lost re-reads and retries at N+1); `version-hint.text`
  *    re-points after the fact (advisory, as in the spec).
  *
  * Scale shape: the data write is distributed; manifest/metadata
  * writes are driver metadata bounded by |files this commit| and
  * |snapshots|. Beyond appends: [[delete]] writes v2 position-delete
  * files (distributed, no driver bitmaps), [[upsert]] is the
  * Flink-CDC shape (equality-delete + data files in ONE snapshot,
  * O(batch) — never scans the table), [[setRef]] pins branches/tags,
  * [[rewriteDataFiles]] / [[expireSnapshots]] are the table services
  * (expiry refuses past a pinning ref), and
  * [[publishMetadataOnly]] lands UniForm-style metadata over foreign
  * data files. Manifests carry footer-true record counts AND
  * per-field bounds — the stats readers file-skip on.
  */
object IcebergTableWriter {

  val MaxCommitAttempts: Int = 20

  private val listSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long","default":0},
      |{"name":"added_snapshot_id","type":["null","long"],"default":null},
      |{"name":"content","type":"int","default":0},
      |{"name":"sequence_number","type":["null","long"],"default":null}]}"""
      .stripMargin)

  /** Manifest-entry schema; partitioned tables extend `data_file`
    * with a `partition` record of the table's identity fields, and
    * equality-delete manifests with the spec's `equality_ids` list.
    */
  private def entrySchemaFor(pfields: Seq[PartitionField],
      withEqualityIds: Boolean = false,
      withBounds: Boolean = false,
      withSortOrder: Boolean = false): Schema = {
    val partField =
      if (pfields.isEmpty) ""
      else {
        // int-resulting transforms (bucket, year/month/day/hour) type
        // their partition values as the spec's int; identity/truncate
        // keep the writer's string convention
        val fields = pfields.map { f =>
          val t = if (IcebergTransforms.intResult(f.transform)) "int" else "string"
          s"""{"name":"${f.resultName}","type":["null","$t"],"default":null}"""
        }.mkString(",")
        s""",{"name":"partition","type":["null",{"type":"record","name":"r102",""" +
          s""""fields":[$fields]}],"default":null}"""
      }
    val eqField =
      if (!withEqualityIds) ""
      else """,{"name":"equality_ids","type":["null",{"type":"array","items":"int"}],""" +
        """"default":null}"""
    val kvArray = """{"type":"array","items":{"type":"record","name":"%s",""" +
      """"fields":[{"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}"""
    val boundsField =
      if (!withBounds) ""
      else s""",{"name":"lower_bounds","type":["null",${kvArray.format("k126")}],""" +
        s""""default":null},{"name":"upper_bounds","type":["null",${kvArray.format("k127")}],""" +
        s""""default":null}"""
    // the spec's data_file.sort_order_id (optional int, field 140):
    // which declared sort order the file's rows were written under
    val sortField =
      if (!withSortOrder) ""
      else """,{"name":"sort_order_id","type":["null","int"],"default":null}"""
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int"},
         |{"name":"snapshot_id","type":["null","long"],"default":null},
         |{"name":"sequence_number","type":["null","long"],"default":null},
         |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
         |  {"name":"content","type":"int","default":0},
         |  {"name":"file_path","type":"string"},
         |  {"name":"file_format","type":"string","default":"PARQUET"},
         |  {"name":"record_count","type":"long","default":0}$partField$eqField$boundsField$sortField]}}]}"""
        .stripMargin)
  }

  private def writeAvro(conf: org.apache.hadoop.conf.Configuration, path: Path,
      schema: Schema, records: Seq[GenericRecord]): Unit = {
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, true)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out)
    try records.foreach(w.append) finally w.close()
  }

  /** One landed data file: relative path, footer record count,
    * identity-partition values (null value = null partition), and
    * per-field-id column bounds (Iceberg single-value-serialized
    * min/max from the parquet footers — the spec's
    * lower_bounds/upper_bounds, what engines file-skip on).
    */
  private final case class Landed(rel: String, count: Long,
      partition: Map[String, Option[String]],
      lowerBounds: Map[Int, Array[Byte]] = Map.empty,
      upperBounds: Map[Int, Array[Byte]] = Map.empty)

  /** Iceberg single-value serialization (spec Appendix D) for the
    * bound types this writer records: int → 4-byte LE, long/double →
    * 8-byte LE, string → UTF-8 bytes. Other types record no bounds
    * (readers keep their files conservatively).
    */
  private def serializeBound(v: Any): Option[Array[Byte]] = v match {
    case i: java.lang.Integer =>
      Some(java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array())
    case l: java.lang.Long =>
      Some(java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(l).array())
    case d: java.lang.Double =>
      Some(java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(d).array())
    case b: org.apache.parquet.io.api.Binary => Some(b.getBytes)
    case _ => None
  }

  /** Column min/max per FIELD ID from a landed file's footer row
    * groups. Field ids follow this writer's schema convention
    * (position + 1 over the table columns). Columns whose stats are
    * absent in ANY row group record no bounds (conservative).
    */
  private def footerBounds(footer: org.apache.parquet.hadoop.ParquetFileReader,
      fieldIdOf: Map[String, Int]): (Map[Int, Array[Byte]], Map[Int, Array[Byte]]) = {
    import scala.jdk.CollectionConverters._
    val lower = scala.collection.mutable.Map.empty[Int, Any]
    val upper = scala.collection.mutable.Map.empty[Int, Any]
    val dropped = scala.collection.mutable.Set.empty[Int]
    footer.getFooter.getBlocks.asScala.foreach { block =>
      block.getColumns.asScala.foreach { cc =>
        val path = cc.getPath.toDotString
        fieldIdOf.get(path).filterNot(dropped.contains).foreach { fid =>
          val st = cc.getStatistics
          // DECIMAL columns record no bounds: their footer stats come
          // back as raw unscaled ints or binaries whose serialization
          // does not match the spec's decimal single-value form — a
          // mis-serialized bound could make an external engine
          // mis-prune; bound-less is conservatively correct everywhere
          val isDecimal = cc.getPrimitiveType.getLogicalTypeAnnotation
            .isInstanceOf[org.apache.parquet.schema.LogicalTypeAnnotation.DecimalLogicalTypeAnnotation]
          if (isDecimal || st == null || st.isEmpty || !st.hasNonNullValue) {
            dropped += fid; lower.remove(fid); upper.remove(fid): Unit
          } else {
            val mn = st.genericGetMin; val mx = st.genericGetMax
            def lt(a: Any, b: Any): Boolean = (a, b) match {
              case (x: java.lang.Integer, y: java.lang.Integer) => x < y
              case (x: java.lang.Long, y: java.lang.Long) => x < y
              case (x: java.lang.Double, y: java.lang.Double) => x < y
              case (x: org.apache.parquet.io.api.Binary,
                  y: org.apache.parquet.io.api.Binary) => x.compareTo(y) < 0
              case _ => false
            }
            lower(fid) = lower.get(fid).filter(lt(_, mn)).getOrElse(mn)
            upper(fid) = upper.get(fid).filter(v => lt(mx, v)).getOrElse(mx)
          }
        }
      }
    }
    (lower.toMap.flatMap { case (k, v) => serializeBound(v).map(k -> _) },
      upper.toMap.flatMap { case (k, v) => serializeBound(v).map(k -> _) })
  }

  private def decodeHive(raw: String): Option[String] = {
    val v = java.net.URLDecoder.decode(raw.replace("+", "%2B"), "UTF-8")
    if (v == "__HIVE_DEFAULT_PARTITION__") None else Some(v)
  }

  /** Land `df` as data files. Partition columns stay IN the files
    * (Iceberg-style): the stage write partitions on DUPLICATED
    * `_p_<c>` columns, whose hive dirs carry the values into the
    * manifest while the originals ride the data.
    */
  private def writeDataFiles(df: DataFrame, tablePath: String,
      pfields: Seq[PartitionField]): Seq[Landed] = {
    val spark = df.sparkSession
    // field ids must match what the metadata commit will declare —
    // existing columns keep their current ids, new ones take fresh
    // ids — so bounds resolve at read time even after evolution
    val fieldIds: Map[String, Int] = plannedFieldIds(spark, tablePath, df.schema)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tablePath).getFileSystem(conf)
    val stage = new Path(tablePath, s".graft-stage-${java.util.UUID.randomUUID()}")
    // stamp PARQUET FIELD IDS into the landed files (what real
    // engines do): columns bind to ids, so a later RENAME is a pure
    // metadata commit and the reader's id resolution serves old files
    // under the new name
    val fieldIdConfKey = "spark.sql.parquet.fieldId.write.enabled"
    val priorFieldIdConf = spark.conf.getOption(fieldIdConfKey)
    val withIds = df.select(df.columns.toIndexedSeq.map { c =>
      val md = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("parquet.field.id", fieldIds(c).toLong).build()
      org.apache.spark.sql.functions.col(c).as(c, md)
    }: _*)
    // each partition value is DERIVED through its transform (identity
    // passes the column through); source columns stay IN the data
    // files, the duplicated _p_ columns only steer the hive staging
    val staged = pfields.foldLeft(withIds)((acc, f) =>
      acc.withColumn(s"_p_${f.resultName}",
        IcebergTransforms.column(f, df.schema(f.sourceCol).dataType)))
    val writer =
      if (pfields.isEmpty) staged.write
      // co-locate each partition value into ONE task before the hive
      // staging: without this every task writes a file for every
      // value it holds — task×|values| small files, superlinear file
      // counts on days()/bucket() layouts (one shuffle buys one file
      // per partition value per commit, the 100 TB-sane shape)
      else staged.repartition(pfields.map(f =>
          org.apache.spark.sql.functions.col(s"_p_${f.resultName}")): _*)
        .write.partitionBy(pfields.map(f => s"_p_${f.resultName}"): _*)
    // the field-id stamping config is a SESSION setting — scope it to
    // this write and restore the caller's value, so later parquet
    // writes in the same session aren't silently id-stamped
    spark.conf.set(fieldIdConfKey, "true")
    try writer.parquet(stage.toString)
    finally priorFieldIdConf match {
      case Some(v) => spark.conf.set(fieldIdConfKey, v)
      case None    => spark.conf.unset(fieldIdConfKey)
    }
    // collect staged parts first, then land + footer-read them in
    // PARALLEL — serially this is O(|files|) driver round-trips, and
    // a days()-partitioned append stages one file per day
    val staged0 = Seq.newBuilder[(Path, Map[String, Option[String]])]
    def walk(dir: Path, values: Map[String, Option[String]]): Unit =
      fs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) {
          val i = name.indexOf('=')
          val v =
            if (i > 0 && name.startsWith("_p_"))
              values + (name.substring(3, i) -> decodeHive(name.substring(i + 1)))
            else values
          walk(st.getPath, v)
        } else if (name.endsWith(".parquet")) staged0 += ((st.getPath, values))
      }
    walk(stage, Map.empty)
    import scala.collection.parallel.CollectionConverters._
    val files = staged0.result().par.map { case (src, values) =>
      val rel = s"data/${java.util.UUID.randomUUID()}.parquet"
      val dst = new Path(tablePath, rel)
      fs.mkdirs(dst.getParent)
      if (!fs.rename(src, dst)) throw new IllegalStateException(
        s"$tablePath: failed to land data file $rel")
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(dst, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val (n, lo, hi) = try {
        val b = footerBounds(r, fieldIds)
        (r.getRecordCount, b._1, b._2)
      } finally r.close()
      Landed(rel, n, values, lo, hi)
    }.seq
    fs.delete(stage, true)
    if (files.isEmpty) throw new IllegalArgumentException(
      s"$tablePath: the DataFrame wrote no data files (empty input?)")
    files
  }

  /** One v3 DELETION-VECTOR manifest row: the puffin file, the blob
    * location inside it, the single data file it masks, and the
    * snapshot/sequence stamps (explicit — graft never relies on
    * list-inheritance for its own entries).
    */
  private[sources] final case class DvManifestRow(puffinRel: String,
      referencedDataFile: String, offset: Long, size: Long, cardinality: Long,
      snapshotId: Long, sequence: Long)

  private val dvEntrySchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"content","type":"int","default":0},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string","default":"PUFFIN"},
      |  {"name":"record_count","type":"long","default":0},
      |  {"name":"referenced_data_file","type":["null","string"],"default":null},
      |  {"name":"content_offset","type":["null","long"],"default":null},
      |  {"name":"content_size_in_bytes","type":["null","long"],"default":null}]}}]}"""
      .stripMargin)

  /** Write a deletes manifest of v3 DV entries (content=1, PUFFIN
    * file format, blob refs per the spec); returns the manifest's
    * table-relative path. Used for new DV commits AND for rewriting a
    * prior DV manifest minus its superseded entries.
    */
  private def writeDvManifest(conf: org.apache.hadoop.conf.Configuration,
      tablePath: String, rows: Seq[DvManifestRow]): String = {
    require(rows.nonEmpty, s"$tablePath: a DV manifest needs at least one entry")
    val rel = s"metadata/m-${rows.head.snapshotId}-${java.util.UUID.randomUUID()}.avro"
    val dfSchema = dvEntrySchema.getField("data_file").schema()
    val records = rows.map { r0 =>
      val dfr = new GenericData.Record(dfSchema)
      dfr.put("content", 1); dfr.put("file_path", r0.puffinRel)
      dfr.put("file_format", "PUFFIN"); dfr.put("record_count", r0.cardinality)
      dfr.put("referenced_data_file", r0.referencedDataFile)
      dfr.put("content_offset", java.lang.Long.valueOf(r0.offset))
      dfr.put("content_size_in_bytes", java.lang.Long.valueOf(r0.size))
      val r = new GenericData.Record(dvEntrySchema)
      r.put("status", 1); r.put("snapshot_id", r0.snapshotId)
      r.put("sequence_number", r0.sequence); r.put("data_file", dfr)
      r
    }
    writeAvro(conf, new Path(tablePath, rel), dvEntrySchema, records)
    rel
  }

  private def manifestOf(conf: org.apache.hadoop.conf.Configuration, tablePath: String,
      snapshotId: Long, sequence: Long, files: Seq[Landed],
      pfields: Seq[PartitionField], content: Int = 0,
      equalityIds: Seq[Int] = Nil,
      sortOrderId: Option[Int] = None): String = {
    val rel = s"metadata/m-$snapshotId-${java.util.UUID.randomUUID()}.avro"
    val withBounds = files.exists(f => f.lowerBounds.nonEmpty || f.upperBounds.nonEmpty)
    val entrySchema = entrySchemaFor(pfields,
      withEqualityIds = equalityIds.nonEmpty, withBounds = withBounds,
      withSortOrder = sortOrderId.nonEmpty)
    val dfSchema = entrySchema.getField("data_file").schema()
    def kvRecords(fieldName: String, m: Map[Int, Array[Byte]]): java.util.List[GenericRecord] = {
      val arrSchema = dfSchema.getField(fieldName).schema().getTypes.get(1)
      val itemSchema = arrSchema.getElementType
      val out = new java.util.ArrayList[GenericRecord](m.size)
      m.toSeq.sortBy(_._1).foreach { case (k, v) =>
        val r = new GenericData.Record(itemSchema)
        r.put("key", k); r.put("value", java.nio.ByteBuffer.wrap(v))
        out.add(r)
      }
      out
    }
    val records = files.map { f =>
      val dfr = new GenericData.Record(dfSchema)
      dfr.put("content", content); dfr.put("file_path", f.rel)
      if (withBounds && (f.lowerBounds.nonEmpty || f.upperBounds.nonEmpty)) {
        dfr.put("lower_bounds", kvRecords("lower_bounds", f.lowerBounds))
        dfr.put("upper_bounds", kvRecords("upper_bounds", f.upperBounds))
      }
      dfr.put("file_format", "PARQUET"); dfr.put("record_count", f.count)
      sortOrderId.foreach(id => dfr.put("sort_order_id", Integer.valueOf(id)))
      if (equalityIds.nonEmpty) {
        import scala.jdk.CollectionConverters._
        dfr.put("equality_ids", equalityIds.map(Integer.valueOf).asJava)
      }
      if (pfields.nonEmpty) {
        val pType = dfSchema.getField("partition").schema().getTypes.get(1)
        val p = new GenericData.Record(pType)
        pfields.foreach { pf =>
          val raw = f.partition.getOrElse(pf.resultName, None)
          val v: AnyRef =
            if (IcebergTransforms.intResult(pf.transform))
              raw.map(x => Integer.valueOf(x.trim.toInt)).orNull
            else raw.orNull
          p.put(pf.resultName, v)
        }
        dfr.put("partition", p)
      }
      val r = new GenericData.Record(entrySchema)
      r.put("status", 1); r.put("snapshot_id", snapshotId)
      r.put("sequence_number", sequence); r.put("data_file", dfr)
      r
    }
    writeAvro(conf, new Path(tablePath, rel), entrySchema, records)
    rel
  }

  private def snapshotJson(id: Long, parent: Option[Long], seq: Long,
      listRel: String, timestampMs: Long, operation: String,
      extraSummary: Map[String, String] = Map.empty): String = {
    val p = parent.map(v => s""""parent-snapshot-id":$v,""").getOrElse("")
    def jq(x: String) = "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val extras = extraSummary.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jq(k)}:${jq(v)}" }
      .map("," + _).mkString
    s"""{"snapshot-id":$id,$p"sequence-number":$seq,""" +
      s""""timestamp-ms":$timestampMs,""" +
      s""""summary":{"operation":"$operation"$extras},"manifest-list":"$listRel"}"""
  }

  /** Iceberg type name for a Spark type (the subset graft tables
    * carry) — what the metadata `schemas` declare, field ids included.
    */
  private def icebergTypeOf(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "long"
      case IntegerType => "int"
      case DoubleType => "double"
      case FloatType => "float"
      case BooleanType => "boolean"
      case StringType => "string"
      case BinaryType => "binary"
      case DateType => "date"
      case TimestampType => "timestamptz"
      case TimestampNTZType => "timestamp"
      // faithful precision/scale (iceberg spec primitive form; the
      // java library's own toString shape) — collapsing to a fixed
      // decimal(38,18) would lie to every engine reading the metadata
      // and break the declared-schema scan against the files' real
      // physical type
      case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
      case other => throw new IllegalArgumentException(
        s"Spark type $other has no Iceberg metadata mapping in this writer; refusing")
    }
  }

  /** Iceberg type JSON for a Spark type — a quoted primitive name, or
    * the spec's nested object form (struct fields / list element /
    * map key+value each carry their own UNIQUE field id, minted from
    * `nextId`). Inner ids live only in the metadata; graft stamps
    * parquet field ids on TOP-LEVEL columns (what its readers
    * resolve), and nested columns read by name.
    */
  private def icebergTypeJson(dt: org.apache.spark.sql.types.DataType,
      nextId: () => Int): String = {
    import org.apache.spark.sql.types._
    dt match {
      case st: StructType =>
        val fs = st.fields.map { f =>
          val id = nextId()
          s"""{"id":$id,"name":"${f.name}","required":false,""" +
            s""""type":${icebergTypeJson(f.dataType, nextId)}}"""
        }.mkString(",")
        s"""{"type":"struct","fields":[$fs]}"""
      case at: ArrayType =>
        val eid = nextId()
        s"""{"type":"list","element-id":$eid,""" +
          s""""element":${icebergTypeJson(at.elementType, nextId)},""" +
          s""""element-required":false}"""
      case mt: MapType =>
        val kid = nextId()
        val kJson = icebergTypeJson(mt.keyType, nextId)
        val vid = nextId()
        s"""{"type":"map","key-id":$kid,"key":$kJson,""" +
          s""""value-id":$vid,"value":${icebergTypeJson(mt.valueType, nextId)},""" +
          s""""value-required":false}"""
      case other => "\"" + icebergTypeOf(other) + "\""
    }
  }

  private def schemasJson(schema: org.apache.spark.sql.types.StructType): String = {
    // top-level ids 1..n (what landed files stamp); nested inner ids
    // mint AFTER them so every field id in the schema is unique
    var innerId = schema.fields.length
    val nextId = () => { innerId += 1; innerId }
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      s"""{"id":${i + 1},"name":"${f.name}","required":false,""" +
        s""""type":${icebergTypeJson(f.dataType, nextId)}}"""
    }.mkString(",")
    s""""schemas":[{"schema-id":0,"type":"struct","fields":[$fields]}],""" +
      s""""current-schema-id":0"""
  }

  /** The existing metadata's schema machinery: every schema node
    * verbatim (JSON text), the current schema's (id, name) fields in
    * order with their raw field JSON, and the global max field/schema
    * ids — what additive evolution appends against.
    */
  private final case class SchemaState(schemaNodesJson: Seq[String], currentSchemaId: Int,
      fields: Seq[(Int, String, String)], maxFieldId: Int, maxSchemaId: Int) {
    def nameToId: Map[String, Int] = fields.map(f => f._2 -> f._1).toMap
  }

  private def schemaStateOf(spark: org.apache.spark.sql.SparkSession,
      tablePath: String): Option[SchemaState] = {
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hint = new Path(tablePath, "metadata/version-hint.text")
    if (!fs.exists(hint)) return None
    val in = fs.open(hint)
    val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
    val metaPath = new Path(tablePath, s"metadata/v$v.metadata.json")
    if (!fs.exists(metaPath)) return None
    val in2 = fs.open(metaPath)
    val text = try scala.io.Source.fromInputStream(in2, "UTF-8").mkString finally in2.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    val schemas = node.get("schemas")
    if (schemas == null || !schemas.isArray || schemas.isEmpty) return None
    val currentId = Option(node.get("current-schema-id")).map(_.asInt()).getOrElse(0)
    var cur: com.fasterxml.jackson.databind.JsonNode = null
    var maxSid = 0
    var maxFid = 0
    val nodes = Seq.newBuilder[String]
    schemas.forEach { sn =>
      nodes += sn.toString
      val sid = Option(sn.get("schema-id")).map(_.asInt()).getOrElse(0)
      if (sid > maxSid) maxSid = sid
      if (sid == currentId || cur == null) cur = sn
      // every field id counts toward the max — INNER ids too (struct
      // fields / list element-id / map key-id+value-id ride nested
      // type objects), or evolution would mint a colliding id
      def walkIds(x: com.fasterxml.jackson.databind.JsonNode): Unit = {
        if (x.isObject) x.fields().forEachRemaining { e =>
          val k = e.getKey
          if ((k == "id" || k == "element-id" || k == "key-id" || k == "value-id") &&
              e.getValue.isNumber) {
            val id = e.getValue.asInt(); if (id > maxFid) maxFid = id
          }
          walkIds(e.getValue)
        }
        else if (x.isArray) x.forEach(walkIds(_))
      }
      walkIds(sn)
    }
    val fields = Seq.newBuilder[(Int, String, String)]
    val cf = cur.get("fields")
    if (cf != null && cf.isArray) cf.forEach { f =>
      fields += ((f.get("id").asInt(), f.get("name").asText(), f.toString))
    }
    Some(SchemaState(nodes.result(), currentId, fields.result(), maxFid, maxSid))
  }

  /** The current metadata's raw `sort-orders` nodes + the default
    * order id; None when the table (or the metadata field — older
    * graft tables) does not exist. Nodes carry through commits
    * VERBATIM, like schema nodes and refs.
    */
  private def sortOrdersStateOf(spark: org.apache.spark.sql.SparkSession,
      tablePath: String): Option[(Seq[String], Int)] = {
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hint = new Path(tablePath, "metadata/version-hint.text")
    if (!fs.exists(hint)) return None
    val in = fs.open(hint)
    val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
    val metaPath = new Path(tablePath, s"metadata/v$v.metadata.json")
    if (!fs.exists(metaPath)) return None
    val in2 = fs.open(metaPath)
    val text = try scala.io.Source.fromInputStream(in2, "UTF-8").mkString finally in2.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    val orders = node.get("sort-orders")
    if (orders == null || !orders.isArray || orders.isEmpty) return None
    val nodes = Seq.newBuilder[String]
    orders.forEach(o => nodes += o.toString)
    Some((nodes.result(),
      Option(node.get("default-sort-order-id")).map(_.asInt()).getOrElse(0)))
  }

  /** The current metadata's raw `partition-statistics` entries —
    * carried through commits VERBATIM like refs and sort orders
    * (entries persist until their snapshots expire; dropping them
    * would orphan every census the moment the table moves on). */
  private def partitionStatsNodesOf(spark: org.apache.spark.sql.SparkSession,
      tablePath: String): Seq[String] = {
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hint = new Path(tablePath, "metadata/version-hint.text")
    if (!fs.exists(hint)) return Nil
    val in = fs.open(hint)
    val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
    val metaPath = new Path(tablePath, s"metadata/v$v.metadata.json")
    if (!fs.exists(metaPath)) return Nil
    val in2 = fs.open(metaPath)
    val text = try scala.io.Source.fromInputStream(in2, "UTF-8").mkString finally in2.close()
    val arr = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
      .get("partition-statistics")
    if (arr == null || !arr.isArray) return Nil
    val b = Seq.newBuilder[String]
    arr.forEach(e => b += e.toString)
    b.result()
  }

  /** Resolve a commit's sort-order metadata (iceberg.apache.org spec
    * "Sort Orders": table metadata declares `sort-orders` +
    * `default-sort-order-id`; data files record which declared order
    * they were written under). Existing nodes carry verbatim; a
    * commit whose files were written sorted by `sortedBy` (identity
    * asc, nulls-first) reuses the existing order with those exact
    * fields or appends a fresh node past the max order-id and makes
    * it the default. Returns (nodes, default-id, id-to-stamp).
    */
  private def resolveSortOrders(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, exists: Boolean,
      schema: org.apache.spark.sql.types.StructType,
      sortedBy: Seq[String]): (Seq[String], Int, Option[Int]) = {
    val prior = if (exists) sortOrdersStateOf(spark, tablePath) else None
    // order-id 0 is the spec's reserved "unsorted" order
    val baseNodes = prior.map(_._1).getOrElse(Seq("""{"order-id":0,"fields":[]}"""))
    val baseDefault = prior.map(_._2).getOrElse(0)
    if (sortedBy.isEmpty) return (baseNodes, baseDefault, None)
    val ids = plannedFieldIds(spark, tablePath, schema)
    val wantFields = sortedBy.map { c =>
      val sid = ids.getOrElse(c, throw new IllegalArgumentException(
        s"$tablePath: sort column $c is not in the commit schema"))
      s"""{"transform":"identity","source-id":$sid,"direction":"asc",""" +
        """"null-order":"nulls-first"}"""
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val wantJson = mapper.readTree(s"[${wantFields.mkString(",")}]")
    val existing = baseNodes.flatMap { raw =>
      val n = mapper.readTree(raw)
      if (n.get("fields") == wantJson)
        Option(n.get("order-id")).map(_.asInt())
      else None
    }.headOption
    existing match {
      case Some(id) => (baseNodes, id, Some(id))
      case None =>
        val maxId = baseNodes.map(raw =>
          Option(mapper.readTree(raw).get("order-id")).map(_.asInt()).getOrElse(0)).max
        val newId = maxId + 1
        val node =
          s"""{"order-id":$newId,"fields":[${wantFields.mkString(",")}]}"""
        (baseNodes :+ node, newId, Some(newId))
    }
  }

  /** Range-cluster `df` on `sortBy` with an EXPLICIT partition count
    * (an unsized range shuffle is fair game for AQE coalescing, which
    * would merge the slices into key-space-wide files that prune
    * nothing); in-partition sort keeps per-file bounds tight.
    */
  private def sortFrame(df: DataFrame, sortBy: Seq[String]): DataFrame =
    if (sortBy.isEmpty) df
    else {
      val cs = sortBy.map(org.apache.spark.sql.functions.col)
      val n = df.sparkSession.sessionState.conf.numShufflePartitions
      df.repartitionByRange(n, cs: _*).sortWithinPartitions(cs: _*)
    }

  /** Field ids the commit writing `schema` will declare: existing
    * columns keep their CURRENT ids verbatim, new columns take fresh
    * ids past the global max (the spec's evolution rule); a fresh
    * table numbers by position. Shared by the data write (bounds key
    * on these ids) and the metadata commit — the two must agree.
    */
  private def plannedFieldIds(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      schema: org.apache.spark.sql.types.StructType): Map[String, Int] =
    schemaStateOf(spark, tablePath) match {
      case None =>
        schema.fieldNames.zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
      case Some(st) =>
        var nid = st.maxFieldId
        val existing = st.nameToId
        schema.fieldNames.map { n =>
          existing.get(n) match {
            case Some(id) => n -> id
            case None => nid += 1; n -> nid
          }
        }.toMap
    }

  /** The `schemas` + `current-schema-id` metadata fragment for a
    * commit writing `schema`, plus the name→field-id map it declares.
    * Unchanged column sets carry the existing schemas VERBATIM; an
    * additive superset appends a NEW schema node (existing field
    * nodes verbatim, new nullable fields with fresh ids) and bumps
    * current-schema-id — iceberg.apache.org spec "Schema Evolution".
    * A batch MISSING declared columns throws (drops are rewrite-grade
    * migrations, not metadata commits).
    */
  /** The spec's legal TYPE PROMOTIONS (iceberg.apache.org spec,
    * Schema Evolution — "Valid type promotions"): int→long,
    * float→double, decimal(P,S)→decimal(P',S) with P'>P. These are
    * METADATA-ONLY: old files keep their narrow physical type and
    * readers widen at scan (Spark 4's vectorized parquet reader
    * performs exactly these widening conversions). Everything else is
    * a rewrite-grade migration and keeps refusing.
    */
  private[sources] def legalPromotion(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (f: DecimalType, t: DecimalType) => t.scale == f.scale && t.precision > f.precision
      case _ => false
    }
  }

  /** Promotion on the metadata's OWN primitive type strings (decimal
    * grammar shared with the reader — [[IcebergTableReader.DecimalRe]]). */
  private def legalJsonPromotion(decl: String, tgt: String): Boolean = {
    val Dec = IcebergTableReader.DecimalRe
    (decl, tgt) match {
      case ("int", "long") => true
      case ("float", "double") => true
      case (Dec(p1, s1), Dec(p2, s2)) => s1 == s2 && p2.toInt > p1.toInt
      case _ => false
    }
  }

  /** Existing field nodes with any LEGAL type promotions toward
    * `schema` applied (field ids and names verbatim, only the
    * primitive type string swaps); non-promotion differences stay
    * verbatim — the append-level Spark-type check is the guard
    * against illegal changes, and exotic round-trip mismatches
    * (uuid↔string, timestamptz) must not churn schema nodes.
    */
  private def promotedFieldNodes(st: SchemaState,
      schema: org.apache.spark.sql.types.StructType): (Seq[String], Boolean) = {
    var any = false
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val nodes = st.fields.map { case (id, name, raw) =>
      val tgt = schema.find(_.name == name).flatMap(f =>
        scala.util.Try(icebergTypeOf(f.dataType)).toOption)
      val node = mapper.readTree(raw)
      val declT = Option(node.get("type")).filter(_.isTextual).map(_.asText())
      (declT, tgt) match {
        case (Some(d), Some(t)) if d.replace(" ", "") != t.replace(" ", "") &&
            legalJsonPromotion(d.replace(" ", ""), t.replace(" ", "")) =>
          any = true
          val obj = node.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          obj.put("type", t): Unit
          obj.toString
        case _ => raw
      }
    }
    (nodes, any)
  }

  private def schemasBlockFor(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      exists: Boolean,
      schema: org.apache.spark.sql.types.StructType): (String, Map[String, Int]) = {
    def fresh = (schemasJson(schema),
      schema.fieldNames.zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap)
    if (!exists) return fresh
    schemaStateOf(spark, tablePath) match {
      case None => fresh
      case Some(st) =>
        val curNames = st.fields.map(_._2)
        if (schema.fieldNames.toSet == curNames.toSet) {
          val (promotedNodes, promotedAny) = promotedFieldNodes(st, schema)
          if (!promotedAny)
            (s""""schemas":[${st.schemaNodesJson.mkString(",")}],""" +
              s""""current-schema-id":${st.currentSchemaId}""", st.nameToId)
          else {
            // a legal promotion is SCHEMA EVOLUTION: a new schemas
            // node with every field id/name verbatim and only the
            // promoted primitive widened, current-schema-id bumps
            val newSid = st.maxSchemaId + 1
            val newNode = s"""{"schema-id":$newSid,"type":"struct",""" +
              s""""fields":[${promotedNodes.mkString(",")}]}"""
            (s""""schemas":[${(st.schemaNodesJson :+ newNode).mkString(",")}],""" +
              s""""current-schema-id":$newSid""", st.nameToId)
          }
        } else {
          val missing = curNames.toSet -- schema.fieldNames.toSet
          if (missing.nonEmpty) throw new IllegalStateException(
            s"$tablePath: commit schema lacks declared column(s) " +
              s"${missing.toSeq.sorted.mkString(",")} — additive evolution only")
          val ids = plannedFieldIds(spark, tablePath, schema)
          val extras = schema.fields.filterNot(f => curNames.contains(f.name))
          // RE-ADDING a name a PAST schema used (drop + re-add) makes
          // reads id-resolved — old files carry a same-named column
          // whose bytes belong to the dropped field; any live file
          // WITHOUT parquet field ids would then null out entirely
          val historyNames = {
            val m = new com.fasterxml.jackson.databind.ObjectMapper()
            st.schemaNodesJson.flatMap { sj =>
              val fs0 = m.readTree(sj).get("fields")
              if (fs0 == null || !fs0.isArray) Nil
              else {
                val b = Seq.newBuilder[String]
                fs0.forEach(f => b += f.get("name").asText())
                b.result()
              }
            }.toSet
          }
          val reused = extras.map(_.name).filter(n =>
            historyNames.contains(n) && !curNames.contains(n))
          if (reused.nonEmpty) requireLiveFieldIds(spark, tablePath,
            s"re-adding previously-dropped column(s) ${reused.mkString(",")}")
          // existing fields carry over with any legal promotions
          // applied (extras + promotion may ride one commit)
          val newFieldsJson = promotedFieldNodes(st, schema)._1 ++ extras.map { f =>
            s"""{"id":${ids(f.name)},"name":"${f.name}","required":false,""" +
              s""""type":"${icebergTypeOf(f.dataType)}"}"""
          }
          val newSid = st.maxSchemaId + 1
          val newNode = s"""{"schema-id":$newSid,"type":"struct",""" +
            s""""fields":[${newFieldsJson.mkString(",")}]}"""
          (s""""schemas":[${(st.schemaNodesJson :+ newNode).mkString(",")}],""" +
            s""""current-schema-id":$newSid""", ids)
        }
    }
  }

  /** RENAME a column — a METADATA-ONLY commit, no snapshot, no data
    * move (iceberg.apache.org spec Schema Evolution: names may change
    * freely because data files bind to FIELD IDS): a new `schemas`
    * node appends with every field id preserved verbatim and only the
    * one name swapped, current-schema-id bumps, everything else in
    * the metadata (snapshots, refs, specs, sequence numbers) carries
    * over UNTOUCHED via a parse-mutate-rewrite of the current
    * metadata JSON. Reads then serve the NEW name over old parquet
    * files through the reader's field-id resolution; partition specs
    * and equality deletes keep working (they bind to ids, not names).
    */
  def renameColumn(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      from: String, to: String): Unit = {
    require(from != to, "rename to the same name is a no-op — refusing to commit one")
    val st = schemaStateOf(spark, tablePath).getOrElse(throw new IllegalArgumentException(
      s"$tablePath is not an Iceberg table (no metadata)"))
    val names = st.fields.map(_._2)
    require(names.contains(from), s"$tablePath: no column named $from to rename")
    require(!names.contains(to),
      s"$tablePath: column $to already exists — rename would collide")
    // post-rename reads resolve by PARQUET FIELD ID; a live data file
    // without ids would silently serve NULLs under the new name —
    // check every live footer (parallel driver metadata) and refuse
    val renamedId = st.fields.find(_._2 == from).get._1
    val plan = IcebergTableReader.planFiles(spark, tablePath)
    val hconf = spark.sparkContext.hadoopConfiguration
    def resolveAbs(rel: String): String =
      if (rel.contains("://") || rel.startsWith("/")) rel else s"$tablePath/$rel"
    import scala.collection.parallel.CollectionConverters._
    val idless = plan.data.par.filter { rel =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new Path(resolveAbs(rel)), hconf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        !r.getFooter.getFileMetaData.getSchema.getFields.asScala
          .exists(f => f.getId != null && f.getId.intValue() == renamedId)
      } finally r.close()
    }.seq
    require(idless.isEmpty,
      s"$tablePath: ${idless.size} live data file(s) carry no parquet field id for " +
        s"column $from (e.g. ${idless.head}) — a rename would silently null it on " +
        "those files; rewrite them first (rewriteDataFiles)")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val newSid = st.maxSchemaId + 1
    val renamedFields = st.fields.map { case (id, name, raw) =>
      if (name != from) raw
      else {
        val f = mapper.readTree(raw).asInstanceOf[
          com.fasterxml.jackson.databind.node.ObjectNode]
        f.put("name", to)
        f.toString
      }
    }
    commitSchemaNode(spark, tablePath,
      s"""{"schema-id":$newSid,"type":"struct",""" +
        s""""fields":[${renamedFields.mkString(",")}]}""", newSid)
  }

  /** DROP a column — like [[renameColumn]] a METADATA-ONLY commit
    * (iceberg.apache.org spec Schema Evolution): a new `schemas` node
    * appends WITHOUT the field, every other field id preserved,
    * current-schema-id bumps; data files keep the bytes, readers
    * simply stop projecting them, and the field id is never reused
    * (later additive evolution allocates past the global max, which
    * the dropped id still counts toward). Refuses dropping a
    * partition-spec SOURCE column or a column live equality-delete
    * files key on — both bind to the id and would break scoping.
    */
  def dropColumn(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      column: String): Unit = {
    val st = schemaStateOf(spark, tablePath).getOrElse(throw new IllegalArgumentException(
      s"$tablePath is not an Iceberg table (no metadata)"))
    val names = st.fields.map(_._2)
    require(names.contains(column), s"$tablePath: no column named $column to drop")
    require(names.size > 1, s"$tablePath: cannot drop the only column")
    val droppedId = st.fields.find(_._2 == column).get._1
    declaredPartitionFields(spark, tablePath).foreach(pf =>
      require(pf.sourceCol != column,
        s"$tablePath: column $column is a partition-spec source — dropping it would " +
          "orphan the spec; refusing"))
    val plan = IcebergTableReader.planFiles(spark, tablePath)
    plan.equalityDeletes.foreach(eq =>
      require(!eq.equalityColumns.contains(column),
        s"$tablePath: live equality-delete file ${eq.path} keys on $column — dropping " +
          "it would break delete scoping; compact the deletes away first"))
    val keptFields = st.fields.collect { case (id, name, raw) if id != droppedId => raw }
    commitSchemaNode(spark, tablePath,
      s"""{"schema-id":${st.maxSchemaId + 1},"type":"struct",""" +
        s""""fields":[${keptFields.mkString(",")}]}""", st.maxSchemaId + 1)
  }

  /** Refuse unless EVERY live data file stamps parquet field ids on
    * ALL its fields — the precondition for any evolution that makes
    * reads id-resolved (rename, drop + re-add); a file without ids
    * would silently serve nulls. Parallel footer check, driver
    * metadata, |live files|-bounded.
    */
  private def requireLiveFieldIds(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, context: String): Unit = {
    val plan = IcebergTableReader.planFiles(spark, tablePath)
    val hconf = spark.sparkContext.hadoopConfiguration
    def resolveAbs(rel: String): String =
      if (rel.contains("://") || rel.startsWith("/")) rel else s"$tablePath/$rel"
    import scala.collection.parallel.CollectionConverters._
    val idless = plan.data.par.filter { rel =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new Path(resolveAbs(rel)), hconf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        r.getFooter.getFileMetaData.getSchema.getFields.asScala.exists(_.getId == null)
      } finally r.close()
    }.seq
    require(idless.isEmpty,
      s"$tablePath: $context needs field-id resolution, but ${idless.size} live data " +
        s"file(s) carry no parquet field ids (e.g. ${idless.headOption.getOrElse("")}) — " +
        "they would silently serve nulls; rewrite them first (rewriteDataFiles)")
  }

  /** Append a new current schema node to the metadata — the shared
    * CAS tail of the metadata-only evolution ops (rename, drop):
    * parse-mutate-rewrite so snapshots/refs/specs/sequence numbers
    * carry over untouched. */
  private def commitSchemaNode(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, newNode: String, newSid: Int): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    var attempt = 0
    while (attempt < MaxCommitAttempts) {
      val v = IcebergTableReader.currentMetadataVersion(spark, tablePath)
      val metaPath = new Path(tablePath, s"metadata/v$v.metadata.json")
      val in = fs.open(metaPath)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val root = mapper.readTree(text).asInstanceOf[
        com.fasterxml.jackson.databind.node.ObjectNode]
      val schemas = root.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("schemas")
      schemas.add(mapper.readTree(newNode))
      root.put("current-schema-id", newSid)
      val vNew = v + 1
      val dst = new Path(tablePath, s"metadata/v$vNew.metadata.json")
      val created = try {
        val out = fs.create(dst, false) // exclusive-create CAS
        try out.write((root.toString + "\n").getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
      if (created) {
        val hint = fs.create(new Path(tablePath, "metadata/version-hint.text"), true)
        try hint.write(s"$vNew\n".getBytes("UTF-8")) finally hint.close()
        return
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"$tablePath: lost the metadata CAS $MaxCommitAttempts times")
  }

  private def specJson(idOf: Map[String, Int],
      pfields: Seq[PartitionField]): String = {
    val fields = pfields.zipWithIndex.map { case (f, i) =>
      val sourceId = idOf.getOrElse(f.sourceCol, throw new IllegalStateException(
        s"partition source column ${f.sourceCol} is not in the commit schema"))
      s"""{"name":"${f.resultName}","transform":""" +
        s""""${IcebergTransforms.specString(f.transform)}","source-id":$sourceId,""" +
        s""""field-id":${1000 + i}}"""
    }.mkString(",")
    s""""partition-specs":[{"spec-id":0,"fields":[$fields]}],"default-spec-id":0"""
  }

  /** The partition-spec fields the CURRENT metadata declares —
    * transforms parsed from the spec's own strings (`identity`,
    * `bucket[N]`, `truncate[W]`, `year`/`month`/`day`/`hour`; an
    * unknown transform like `void` refuses loudly), source columns
    * resolved by source-id against the current schema.
    */
  private[sources] def declaredPartitionFields(spark: org.apache.spark.sql.SparkSession,
      tablePath: String): Seq[PartitionField] = {
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(tablePath, "metadata")
    if (!fs.exists(metaDir)) return Nil
    val hint = new Path(metaDir, "version-hint.text")
    if (!fs.exists(hint)) return Nil
    val in = fs.open(hint)
    val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
    val metaPath = new Path(metaDir, s"v$v.metadata.json")
    if (!fs.exists(metaPath)) return Nil
    val in2 = fs.open(metaPath)
    val text = try scala.io.Source.fromInputStream(in2, "UTF-8").mkString finally in2.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    val specs = node.get("partition-specs")
    if (specs == null || !specs.isArray || specs.isEmpty) Nil
    else {
      lazy val idToName = IcebergTableReader.schemaFieldNames(spark, tablePath)
      val b = Seq.newBuilder[PartitionField]
      val fields = specs.get(0).get("fields")
      if (fields != null && fields.isArray) fields.forEach { f =>
        val transform = IcebergTransforms.parseSpecString(
          Option(f.get("transform")).map(_.asText()).getOrElse("identity"))
        val name = f.get("name").asText()
        val source = Option(f.get("source-id")).map(_.asInt())
          .flatMap(idToName.get)
          .getOrElse(name) // legacy specs without source-id: identity naming
        b += PartitionField(name, source, transform)
      }
      b.result()
    }
  }

  /** The declared partition RESULT names (compat view). */
  private[sources] def declaredPartitionBy(spark: org.apache.spark.sql.SparkSession,
      tablePath: String): Seq[String] =
    declaredPartitionFields(spark, tablePath).map(_.resultName)

  /** One commit: new manifest + manifest list (previous manifests
    * reused) + vN metadata under the exclusive-create CAS. Returns
    * the new snapshot id.
    */
  private def commit(df: DataFrame, tablePath: String, pfields: Seq[PartitionField],
      extraSummary: Map[String, String] = Map.empty,
      sortBy: Seq[String] = Nil): Long = {
    val files = writeDataFiles(sortFrame(df, sortBy), tablePath, pfields)
    commitSnapshot(df.sparkSession, tablePath, df.schema, pfields, files,
      content = 0, operation = "append", extraSummary = extraSummary,
      sortedBy = sortBy)
  }

  /** Publish one snapshot of `files` (content 0 = data, 1 = position
    * deletes) under the exclusive-create CAS. Prior snapshots
    * re-serialize with their ORIGINAL ids/parents/lists/timestamps
    * AND operations — a rewritten operation would let incremental
    * readers silently cross a delete snapshot.
    */
  private def commitSnapshot(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      schema: org.apache.spark.sql.types.StructType, pfields: Seq[PartitionField],
      files: Seq[Landed], content: Int, operation: String,
      reuseManifests: Boolean = true,
      extraSummary: Map[String, String] = Map.empty,
      plannedAgainst: Option[Long] = None,
      sortedBy: Seq[String] = Nil): Long =
    commitSnapshotGroups(spark, tablePath, schema, pfields,
      Seq(ManifestGroup(files, content)), operation, reuseManifests, extraSummary,
      plannedAgainst = plannedAgainst, sortedBy = sortedBy)

  /** One new manifest's worth of files: `entryContent` is the spec's
    * data_file.content (0=data, 1=position deletes, 2=equality
    * deletes); equality-delete groups carry the key field ids.
    */
  private final case class ManifestGroup(files: Seq[Landed], entryContent: Int,
      equalityIds: Seq[Int] = Nil)

  /** [[commitSnapshot]] generalized to SEVERAL new manifests in ONE
    * snapshot — what an upsert needs (a data manifest plus an
    * equality-delete manifest, same sequence number, so the delete
    * scopes to strictly-older files and the new rows survive).
    */
  private[sources] def commitSnapshotGroups(spark: org.apache.spark.sql.SparkSession,
      tablePath: String,
      schema: org.apache.spark.sql.types.StructType, pfields: Seq[PartitionField],
      groups: Seq[ManifestGroup], operation: String,
      reuseManifests: Boolean = true,
      extraSummary: Map[String, String] = Map.empty,
      // v3 hooks: DV commits build per-attempt manifests (they embed
      // the attempt's snapshot/sequence ids), rewrite reused
      // manifests (supersede: one DV per data file), and floor the
      // metadata's format-version at 3
      minFormatVersion: Int = 2,
      extraManifests: (Long, Long) => Seq[(String, Int)] = (_, _) => Nil,
      transformBase: Seq[(String, Long, Int, Option[Long])] =>
        Seq[(String, Long, Int, Option[Long])] = identity,
      plannedAgainst: Option[Long] = None,
      // columns the content-0 groups' files were WRITTEN sorted by
      // (identity asc): resolves/mints the declared sort order, makes
      // it the default, and stamps data_file.sort_order_id
      sortedBy: Seq[String] = Nil): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tablePath).getFileSystem(conf)
    var attempt = 0
    // the snapshot this commit was PLANNED against (captured on the
    // first attempt): a lost CAS re-reads and rebases, but commits
    // whose content was computed from the planned state — deletes,
    // rewrites, overwrites — may only rebase over interleaved
    // APPENDS (Iceberg's own OCC validation: appends never conflict;
    // anything else may have removed or re-deleted the rows this
    // commit's manifests were computed from)
    var plannedParent: Option[Option[Long]] =
      plannedAgainst.map(id => Some(id): Option[Long])
    while (attempt < MaxCommitAttempts) {
      // re-read the current state each attempt (CAS loser rebases)
      val exists = fs.exists(new Path(tablePath, "metadata")) &&
        fs.listStatus(new Path(tablePath, "metadata"))
          .exists(_.getPath.getName.endsWith(".metadata.json"))
      val (prevSnapsJson, prevManifests, prevVersion, parentId, seq) =
        if (!exists)
          (Seq.empty[String], Seq.empty[(String, Long, Int, Option[Long])], 0L, None, 1L)
        else {
          val (snaps, currentId) = IcebergTableReader.snapshotLog(spark, tablePath)
          val current = snaps.find(_.id == currentId).get
          plannedParent match {
            case None => plannedParent = Some(Some(currentId))
            case Some(planned) if operation != "append" =>
              val base = planned.getOrElse(0L)
              val conflicting = snaps.filter(s => s.id > base)
                .filterNot(_.operation == "append")
              if (conflicting.nonEmpty) throw new java.util.ConcurrentModificationException(
                s"$tablePath: a concurrent ${conflicting.head.operation} snapshot " +
                  s"${conflicting.head.id} landed after this $operation was planned " +
                  s"against snapshot $base — its manifests may be stale; re-read the " +
                  "table and retry the operation")
            case _ => ()
          }
          val manifests = IcebergTableReader.manifestListEntries(spark, tablePath,
            current.manifestList)
          val version = IcebergTableReader.currentMetadataVersion(spark, tablePath)
          // snapshot records re-serialize with ids/parents/lists AND
          // original timestamps preserved — TIMESTAMP AS OF resolves
          // off them, so a re-stamp would silently rewrite history
          (snaps.map(s => snapshotJson(s.id, s.parentId, s.id, s.manifestList,
              s.timestampMs, s.operation, s.summary)),
            manifests, version, Some(currentId), currentId + 1L)
        }
      if (plannedParent.isEmpty) plannedParent = Some(parentId)
      val newId = parentId.getOrElse(0L) + 1L
      val (sortNodes, defaultSortId, stampSortId) =
        resolveSortOrders(spark, tablePath, exists, schema, sortedBy)
      val newManifests = groups.map { g =>
        val rel = manifestOf(conf, tablePath, newId, seq, g.files, pfields,
          g.entryContent, g.equalityIds,
          sortOrderId = if (g.entryContent == 0) stampSortId else None)
        // manifest-LIST content: 0 = data manifest, 1 = deletes
        // manifest (position AND equality entries both live under 1)
        (rel, newId, if (g.entryContent == 0) 0 else 1, Option(seq))
      } ++ extraManifests(newId, seq).map { case (rel, content) =>
        (rel, newId, content, Option(seq))
      }
      val listRel = s"metadata/snap-$newId-${java.util.UUID.randomUUID()}.avro"
      val baseManifests = transformBase(if (reuseManifests) prevManifests else Nil)
      // reused manifests keep their ORIGINAL list sequence_number
      // verbatim — entries in the spec's inheritance form (null
      // sequence on ADDED rows) resolve against it, so re-stamping
      // would silently re-scope an external writer's deletes
      val listRecords = (baseManifests ++ newManifests)
        .map { case (mp, addedBy, content, mseq) =>
          val r = new GenericData.Record(listSchema)
          r.put("manifest_path", mp); r.put("manifest_length", 0L)
          r.put("added_snapshot_id", addedBy); r.put("content", content)
          mseq.foreach(s0 => r.put("sequence_number", java.lang.Long.valueOf(s0)))
          r
        }
      writeAvro(conf, new Path(tablePath, listRel), listSchema, listRecords)
      // the STANDARD summary fields real engines stamp and external
      // tools read — added-* from this commit's own data groups
      // (driver-known footer counts, no extra I/O)
      val dataGroups = groups.filter(_.entryContent == 0)
      val stdSummary = Map(
        "added-data-files" -> dataGroups.map(_.files.size).sum.toString,
        "added-records" -> dataGroups.flatMap(_.files).map(_.count).sum.toString)
      val snapsJson = (prevSnapsJson :+
        snapshotJson(newId, parentId, seq, listRel, System.currentTimeMillis(), operation,
          stdSummary ++ extraSummary))
        .mkString(",")
      // refs carry forward VERBATIM (tags keep pointing at their
      // snapshots); the main branch advances to the new snapshot —
      // Iceberg's own ref semantics
      val prevRefs = if (exists) IcebergTableReader.refs(spark, tablePath)
        else Map.empty[String, (Long, String)]
      val refsJson = (prevRefs + ("main" -> ((newId, "branch"))))
        .toSeq.sortBy(_._1)
        .map { case (n, (id, t)) =>
          val nq = n.replace("\\", "\\\\").replace("\"", "\\\"")
          s""""$nq":{"snapshot-id":$id,"type":"$t"}"""
        }.mkString(",")
      val (schemasPart, fieldIdOf) = schemasBlockFor(spark, tablePath, exists, schema)
      // the format-version never regresses: once a table carries v3
      // artifacts (deletion vectors) every later commit keeps v3
      val formatVersion = math.max(minFormatVersion,
        if (exists) IcebergTableReader.currentFormatVersion(spark, tablePath) else 2)
      val pstatsNodes = partitionStatsNodesOf(spark, tablePath)
      val pstatsPart =
        if (pstatsNodes.isEmpty) ""
        else s""""partition-statistics":[${pstatsNodes.mkString(",")}],"""
      val metaJson =
        s"""{"format-version":$formatVersion,"table-uuid":"graft","location":"$tablePath",""" +
          s"""$schemasPart,${specJson(fieldIdOf, pfields)},""" +
          s""""sort-orders":[${sortNodes.mkString(",")}],""" +
          s""""default-sort-order-id":$defaultSortId,""" +
          pstatsPart +
          s""""last-sequence-number":$seq,"refs":{$refsJson},""" +
          s""""current-snapshot-id":$newId,"snapshots":[$snapsJson]}"""
      val vNew = prevVersion + 1
      val metaPath = new Path(tablePath, s"metadata/v$vNew.metadata.json")
      val created = try {
        val out = fs.create(metaPath, false) // exclusive-create CAS
        try out.write((metaJson + "\n").getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
      if (created) {
        val hint = fs.create(new Path(tablePath, "metadata/version-hint.text"), true)
        try hint.write(s"$vNew\n".getBytes("UTF-8")) finally hint.close()
        return newId
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"$tablePath: lost the metadata CAS $MaxCommitAttempts times")
  }

  /** Create a NEW Iceberg table at `tablePath` (identity-partitioned
    * by `partitionBy` when given); refuses an existing one. Returns
    * the first snapshot id.
    */
  def create(df: DataFrame, tablePath: String, partitionBy: Seq[String] = Nil,
      transaction: Option[(String, Long)] = None,
      sortBy: Seq[String] = Nil): Long = {
    val fs = new Path(tablePath).getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val metaDir = new Path(tablePath, "metadata")
    if (fs.exists(metaDir) &&
        fs.listStatus(metaDir).exists(_.getPath.getName.endsWith(".metadata.json")))
      throw new IllegalArgumentException(s"$tablePath is already an Iceberg table — use append")
    // each entry is a transform spec: a bare column = identity;
    // bucket(N, c) / truncate(W, c) / years|months|days|hours(c) are
    // the spec's partition transforms
    val pfields = partitionBy.map(IcebergTransforms.parse)
    pfields.foreach(f => require(df.columns.contains(f.sourceCol),
      s"partition source column ${f.sourceCol} is not in the DataFrame"))
    // a declared SORT ORDER (spec "Sort Orders", identity asc): files
    // land range-clustered so the recorded bounds actually cut scans
    sortBy.foreach(c => require(df.columns.contains(c),
      s"sort column $c is not in the DataFrame"))
    commit(df, tablePath, pfields, extraSummary = txnSummary(transaction),
      sortBy = sortBy)
  }

  /** Append `df` as a new snapshot on the parent chain; columns must
    * match the table's existing data columns (order-free), and the
    * partitioning comes from the TABLE's declared spec.
    */
  def append(df: DataFrame, tablePath: String,
      transaction: Option[(String, Long)] = None): Long = {
    val existing = IcebergTableReader.snapshot(df.sparkSession, tablePath)
    val missing = existing.columns.toSet -- df.columns.toSet
    require(missing.isEmpty,
      s"$tablePath: appended columns ${df.columns.sorted.mkString(",")} lack declared " +
        s"column(s) ${missing.toSeq.sorted.mkString(",")} — writes must carry the full " +
        "declared schema (additive evolution only adds columns)")
    // additive evolution: NEW columns append to the schema (a new
    // schemas node + bumped current-schema-id land in the same
    // commit); existing columns keep their types OR take one of the
    // spec's legal promotions (int→long, float→double, decimal
    // precision widening at the same scale) — metadata-only, old
    // files widen at scan; anything else refuses
    val extras = df.columns.filterNot(existing.columns.contains).toSeq
    existing.columns.foreach { c =>
      val from = existing.schema(c).dataType
      val to = df.schema(c).dataType
      require(to == from || legalPromotion(from, to),
        s"$tablePath: schema evolution cannot change column $c from " +
          s"${from.simpleString} to ${to.simpleString} — only NEW nullable columns " +
          "and the spec's legal promotions (int→long, float→double, decimal " +
          "precision widening) are metadata commits; other changes are rewrites")
    }
    val pfields = declaredPartitionFields(df.sparkSession, tablePath)
    // a table declaring a default SORT ORDER gets its appends written
    // under it (identity asc orders only — [[IcebergTableReader
    // .sortOrder]] answers empty otherwise, and an unsorted append to
    // a sorted table is spec-legal, just unstamped)
    val order = IcebergTableReader.sortOrder(df.sparkSession, tablePath)
    val sortBy =
      if (order.nonEmpty && order.forall { case (c, d, _) =>
          d == "asc" && df.columns.contains(c) })
        order.map(_._1)
      else Nil // partial sorting must not stamp the FULL order's id
    commit(df.select((existing.columns.toSeq ++ extras)
        .map(org.apache.spark.sql.functions.col): _*),
      tablePath, pfields, extraSummary = txnSummary(transaction),
      sortBy = sortBy)
  }

  /** Snapshot-summary keys carrying a streaming sink's (appId,
    * batchId) watermark — the Flink-connector pattern (checkpoint id
    * in the snapshot summary), giving exactly-once from the TABLE's
    * own metadata. Preserved verbatim across later commits (snapshot
    * records re-serialize with their summaries).
    */
  val SinkAppKey = "graft.sink.app-id"
  val SinkBatchKey = "graft.sink.batch-id"

  private def txnSummary(transaction: Option[(String, Long)]): Map[String, String] =
    transaction.map { case (appId, batchId) =>
      Map(SinkAppKey -> appId, SinkBatchKey -> batchId.toString)
    }.getOrElse(Map.empty)

  /** The highest batch id `appId` has committed into the table's
    * snapshot summaries, if any — the replay watermark the streaming
    * sink probes. Driver metadata, |snapshots|-bounded.
    */
  def lastBatchId(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      appId: String): Option[Long] = {
    val (snaps, _) = IcebergTableReader.snapshotLog(spark, tablePath)
    val ids = snaps.flatMap { s =>
      if (s.summary.get(SinkAppKey).contains(appId))
        s.summary.get(SinkBatchKey).flatMap(v => scala.util.Try(v.toLong).toOption)
      else None
    }
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** REWRITE DATA FILES (Iceberg's compaction service): the current
    * snapshot's rows — row-level deletes APPLIED — re-bucket into
    * `targetFiles` files under a `replace` snapshot whose manifest
    * list contains ONLY the fresh manifest (nothing reused: the old
    * data and delete files stop being referenced, and a later
    * [[expireSnapshots]] reclaims them). Incremental readers refuse
    * crossing the replace snapshot, the reader's spec-locked
    * contract. Returns the new snapshot id.
    */
  def rewriteDataFiles(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      targetFiles: Int): Long = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    val snap = IcebergTableReader.snapshot(spark, tablePath) // deletes applied
    val pfields = declaredPartitionFields(spark, tablePath)
    // a table declaring a default SORT ORDER gets its rewrite written
    // under it (Iceberg's own rewrite-data-files sorts by the table
    // order) — the service RESTORES the clustered layout that
    // unsorted upserts/appends diluted, and the rewritten files stamp
    // the order id
    val order = IcebergTableReader.sortOrder(spark, tablePath)
    val sortBy =
      if (order.nonEmpty && order.forall { case (c, d, _) =>
          d == "asc" && snap.columns.contains(c) })
        order.map(_._1)
      else Nil
    val reshaped =
      if (sortBy.isEmpty) snap.repartition(targetFiles)
      else {
        val cs = sortBy.map(org.apache.spark.sql.functions.col)
        snap.repartitionByRange(targetFiles, cs: _*).sortWithinPartitions(cs: _*)
      }
    val files = writeDataFiles(reshaped, tablePath, pfields)
    commitSnapshot(spark, tablePath, snap.schema, pfields, files,
      content = 0, operation = "replace", reuseManifests = false,
      sortedBy = sortBy)
  }

  /** EXPIRE SNAPSHOTS (Iceberg's own retention service): rewrite the
    * metadata to keep only the LAST `keepLast` snapshots and
    * physically delete everything referenced ONLY by the expired ones
    * — manifest lists, manifests, data and delete files (the
    * retained snapshots' inventory is computed first; nothing they
    * reach is touched). The rest of the current metadata (schemas,
    * partition specs, retained snapshots' ids/parents/timestamps/
    * operations) carries over VERBATIM via JSON-tree rewrite. Expired
    * ids refuse time travel afterwards ("not in the metadata log") —
    * the reader's documented contract. Returns the expired ids.
    */
  /** Create or move a named REF (tag or branch) to `snapshotId` —
    * Iceberg's branch/tag machinery: a metadata-only commit (vN+1
    * carries the same snapshots with the refs map updated, under the
    * usual CAS). Tags pin snapshots for time travel by NAME
    * ([[IcebergTableReader.snapshotAsOfRef]]) and gate expiry. Ids
    * not in the snapshot log refuse.
    */
  def setRef(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      name: String, snapshotId: Long, refType: String = "tag"): Unit = {
    require(refType == "tag" || refType == "branch",
      s"ref type must be 'tag' or 'branch', got $refType")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tablePath).getFileSystem(conf)
    val (snaps, _) = IcebergTableReader.snapshotLog(spark, tablePath)
    require(snaps.exists(_.id == snapshotId),
      s"$tablePath: snapshot $snapshotId is not in the metadata log — a ref cannot " +
        "point outside history")
    val version = IcebergTableReader.currentMetadataVersion(spark, tablePath)
    val metaPath = new Path(tablePath, s"metadata/v$version.metadata.json")
    val in = fs.open(metaPath)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(text)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val refsNode =
      if (root.has("refs") && root.get("refs").isObject)
        root.get("refs").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      else { val n = m.createObjectNode(); root.replace("refs", n); n }
    val entry = m.createObjectNode()
    entry.put("snapshot-id", snapshotId): Unit
    entry.put("type", refType): Unit
    refsNode.replace(name, entry): Unit
    val vNew = version + 1
    val newMeta = new Path(tablePath, s"metadata/v$vNew.metadata.json")
    val created = try {
      val out = fs.create(newMeta, false)
      try out.write((m.writeValueAsString(root) + "\n").getBytes("UTF-8"))
      finally out.close()
      true
    } catch { case _: java.io.IOException => false }
    if (!created) throw new IllegalStateException(
      s"$tablePath: metadata v$vNew already taken — re-run setRef after the racer's commit")
    val hint = fs.create(new Path(tablePath, "metadata/version-hint.text"), true)
    try hint.write(s"$vNew\n".getBytes("UTF-8")) finally hint.close()
  }

  /** PARTITION STATISTICS (iceberg.apache.org spec "Partition
    * Statistics"): one parquet file per stats snapshot with the
    * spec's per-partition census — data/delete record and file
    * counts, byte totals, last-updated provenance — registered in
    * table metadata's `partition-statistics` list. Planning-grade
    * numbers engines read INSTEAD of walking manifests: the census
    * here is computed once from the current snapshot's manifests
    * (driver work O(|entries|), the same bound planning already
    * pays) and served thereafter as a plain metadata read however
    * large the table grows. DV entries (content=1 with a referenced
    * file) count as position deletes, their record_count being the
    * vector cardinality per spec. Unpartitioned tables refuse — the
    * census has no grain. Returns the landed statistics path.
    */
  def writePartitionStats(spark: org.apache.spark.sql.SparkSession,
      tablePath: String): String = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tablePath).getFileSystem(conf)
    val pfields = declaredPartitionFields(spark, tablePath)
    require(pfields.nonEmpty,
      s"$tablePath: partition statistics need a partitioned table")
    val (snaps, currentId) = IcebergTableReader.snapshotLog(spark, tablePath)
    val current = snaps.find(_.id == currentId).getOrElse(
      throw new IllegalStateException(s"$tablePath: current snapshot missing"))
    val manifests = IcebergTableReader.manifestListEntries(spark, tablePath,
      current.manifestList)
    final case class Census(var drc: Long = 0L, var dfc: Int = 0, var bytes: Long = 0L,
      var pdrc: Long = 0L, var pdfc: Int = 0, var edrc: Long = 0L, var edfc: Int = 0,
      var lastSnap: Long = 0L)
    val byPartition = scala.collection.mutable.LinkedHashMap.empty[Seq[String], Census]
    manifests.foreach { case (mp, _, _, _) =>
      IcebergTableReader.manifestEntriesPublic(spark, tablePath, mp)
        .filter(_.status != 2).foreach { e =>
          val key = pfields.map(pf => e.partition.getOrElse(pf.resultName, null))
          val c = byPartition.getOrElseUpdate(key, Census())
          val abs = if (e.filePath.startsWith("/")) new Path(e.filePath)
            else new Path(tablePath, e.filePath)
          val size = fs.getFileStatus(abs).getLen
          val n = e.recordCount.getOrElse(throw new IllegalStateException(
            s"$tablePath: manifest entry ${e.filePath} records no record_count — " +
              "the census would be a guess; refusing"))
          e.content match {
            case 0 => c.drc += n; c.dfc += 1; c.bytes += size
            case 1 => c.pdrc += n; c.pdfc += 1
            case 2 => c.edrc += n; c.edfc += 1
            case other => throw new IllegalStateException(
              s"$tablePath: unknown manifest content $other for ${e.filePath}")
          }
          e.snapshotId.foreach(sid => if (sid > c.lastSnap) c.lastSnap = sid)
        }
    }
    val partType = StructType(pfields.map { pf =>
      StructField(pf.resultName,
        if (IcebergTransforms.intResult(pf.transform)) IntegerType else StringType,
        nullable = true)
    })
    val schema = StructType(Seq(
      StructField("partition", partType, nullable = false),
      StructField("spec_id", IntegerType, nullable = false),
      StructField("data_record_count", LongType, nullable = false),
      StructField("data_file_count", IntegerType, nullable = false),
      StructField("total_data_file_size_in_bytes", LongType, nullable = false),
      StructField("position_delete_record_count", LongType, nullable = false),
      StructField("position_delete_file_count", IntegerType, nullable = false),
      StructField("equality_delete_record_count", LongType, nullable = false),
      StructField("equality_delete_file_count", IntegerType, nullable = false),
      StructField("last_updated_at", LongType, nullable = false),
      StructField("last_updated_snapshot_id", LongType, nullable = false)))
    val now = System.currentTimeMillis()
    val rows = byPartition.toSeq.map { case (key, c) =>
      val pvals = pfields.zip(key).map { case (pf, raw) =>
        if (raw == null) null
        else if (IcebergTransforms.intResult(pf.transform)) Integer.valueOf(raw.trim.toInt)
        else raw
      }
      Row(Row(pvals: _*), 0, c.drc, c.dfc, c.bytes, c.pdrc, c.pdfc, c.edrc, c.edfc,
        now, if (c.lastSnap > 0) c.lastSnap else currentId)
    }
    import scala.jdk.CollectionConverters._
    val rel = s"metadata/partition-stats-$currentId-${java.util.UUID.randomUUID()}.parquet"
    val stage = new Path(tablePath, s".graft-pstats-${java.util.UUID.randomUUID()}")
    spark.createDataFrame(rows.asJava, schema).coalesce(1).write.parquet(stage.toString)
    val part = fs.listStatus(stage).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"$tablePath: stats stage wrote nothing"))
    val dst = new Path(tablePath, rel)
    fs.mkdirs(dst.getParent)
    fs.delete(dst, false)
    if (!fs.rename(part, dst)) throw new IllegalStateException(
      s"$tablePath: failed to land partition statistics at $rel")
    fs.delete(stage, true)
    val len = fs.getFileStatus(dst).getLen
    // register under the usual metadata CAS; an entry for the SAME
    // snapshot replaces (a re-run refreshes, never duplicates)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    var attempt = 0
    while (attempt < MaxCommitAttempts) {
      val v = IcebergTableReader.currentMetadataVersion(spark, tablePath)
      val metaPath = new Path(tablePath, s"metadata/v$v.metadata.json")
      val in = fs.open(metaPath)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val root = m.readTree(text)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val arr = root.withArray[com.fasterxml.jackson.databind.node.ArrayNode](
        "partition-statistics")
      var i = 0
      while (i < arr.size()) {
        if (Option(arr.get(i).get("snapshot-id")).exists(_.asLong() == currentId))
          { arr.remove(i): Unit } else i += 1
      }
      val entry = m.createObjectNode()
      entry.put("snapshot-id", currentId)
      entry.put("statistics-path", rel)
      entry.put("file-size-in-bytes", len)
      arr.add(entry)
      val dstMeta = new Path(tablePath, s"metadata/v${v + 1}.metadata.json")
      val created = try {
        val out = fs.create(dstMeta, false) // exclusive-create CAS
        try out.write((root.toString + "\n").getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
      if (created) {
        val hint = fs.create(new Path(tablePath, "metadata/version-hint.text"), true)
        try hint.write(s"${v + 1}\n".getBytes("UTF-8")) finally hint.close()
        return rel
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"$tablePath: lost the metadata CAS $MaxCommitAttempts times registering stats")
  }

  /** REMOVE ORPHAN FILES (Iceberg's own maintenance procedure): walk
    * the table directory, subtract everything ANY retained snapshot
    * or the metadata itself references — metadata JSONs and the
    * version hint, every snapshot's manifest list, every manifest,
    * every file path those manifests name (any status: a deleted
    * entry's file may still serve an older snapshot), DV puffins,
    * registered partition-statistics files — and physically delete
    * the unreferenced remainder older than `graceMs` (crashed stage
    * dirs, failed-CAS leftovers). The grace period is what keeps a
    * CONCURRENT writer's in-flight staging safe: never run with a
    * grace shorter than the longest write you could be racing.
    * Driver work is O(|files in table dir| + |manifest entries|);
    * returns the deleted paths (table-relative).
    */
  def removeOrphanFiles(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      graceMs: Long, nowMs: Long = System.currentTimeMillis()): Seq[String] = {
    require(graceMs >= 0, "graceMs must be >= 0")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(tablePath)
    val fs = root.getFileSystem(conf)
    val rootStr = fs.makeQualified(root).toString.stripSuffix("/")
    def qualify(p: String): String =
      if (p.startsWith("/") || p.contains("://"))
        fs.makeQualified(new Path(p)).toString
      else s"$rootStr/$p"
    val referenced = scala.collection.mutable.Set.empty[String]
    // the metadata tree itself: every version JSON + the hint (expiry
    // owns metadata retention, not orphan removal)
    val metaDir = new Path(root, "metadata")
    fs.listStatus(metaDir).foreach { st =>
      val n = st.getPath.getName
      if (n.endsWith(".metadata.json") || n == "version-hint.text")
        referenced += fs.makeQualified(st.getPath).toString
    }
    val (snaps, _) = IcebergTableReader.snapshotLog(spark, tablePath)
    snaps.foreach { s0 =>
      referenced += qualify(s0.manifestList)
      IcebergTableReader.manifestListEntries(spark, tablePath, s0.manifestList)
        .foreach { case (mp, _, _, _) =>
          referenced += qualify(mp)
          IcebergTableReader.manifestEntriesPublic(spark, tablePath, mp)
            .foreach(e => referenced += qualify(e.filePath))
        }
    }
    // registered statistics files
    val metaNode = new com.fasterxml.jackson.databind.ObjectMapper().readTree {
      val v = IcebergTableReader.currentMetadataVersion(spark, tablePath)
      val in = fs.open(new Path(root, s"metadata/v$v.metadata.json"))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    Option(metaNode.get("partition-statistics")).filter(_.isArray).foreach(_.forEach { e =>
      Option(e.get("statistics-path")).foreach(p => referenced += qualify(p.asText()))
    })
    val horizon = nowMs - graceMs
    val deleted = Seq.newBuilder[String]
    def walk(dir: Path): Unit = fs.listStatus(dir).foreach { st =>
      if (st.isDirectory) walk(st.getPath)
      else {
        val q = fs.makeQualified(st.getPath).toString
        // a checksum sidecar lives and dies with its base file
        val name = st.getPath.getName
        val effective =
          if (name.startsWith(".") && name.endsWith(".crc"))
            fs.makeQualified(new Path(st.getPath.getParent,
              name.stripPrefix(".").stripSuffix(".crc"))).toString
          else q
        if (!referenced.contains(effective) && st.getModificationTime < horizon) {
          if (fs.delete(st.getPath, false))
            deleted += q.stripPrefix(rootStr + "/")
        }
      }
    }
    walk(root)
    // sweep directories the deletions emptied (crashed stage dirs)
    def sweepEmpty(dir: Path): Boolean = {
      val children = fs.listStatus(dir)
      val keep = children.filterNot(st => st.isDirectory && sweepEmpty(st.getPath))
      if (dir != root && keep.isEmpty && fs.makeQualified(dir).toString != rootStr) {
        fs.delete(dir, false)
      } else false
    }
    sweepEmpty(root): Unit
    deleted.result()
  }

  def expireSnapshots(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "must retain at least the current snapshot")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tablePath).getFileSystem(conf)
    val (snaps, currentId) = IcebergTableReader.snapshotLog(spark, tablePath)
    if (snaps.size <= keepLast) return Nil
    val retained = snaps.takeRight(keepLast)
    require(retained.exists(_.id == currentId),
      s"$tablePath: the current snapshot must be inside the retention window")
    val expired = snaps.dropRight(keepLast)
    // a TAGGED (or branched) snapshot cannot expire — refs pin
    // history, Iceberg's own retention rule
    val pinned = IcebergTableReader.refs(spark, tablePath)
      .filter { case (n, (id, _)) => n != "main" && expired.exists(_.id == id) }
    require(pinned.isEmpty,
      s"$tablePath: refs ${pinned.keys.toSeq.sorted.mkString(", ")} pin snapshot(s) " +
        s"${pinned.values.map(_._1).toSeq.distinct.sorted.mkString(", ")} inside the " +
        "expiry window — drop the refs first or widen retention")
    def inventory(ss: Seq[IcebergTableReader.SnapshotInfo])
        : (Set[String], Set[String], Set[String]) = { // (lists, manifests, files)
      val lists = ss.map(_.manifestList).toSet
      val manifests = scala.collection.mutable.Set.empty[String]
      val files = scala.collection.mutable.Set.empty[String]
      ss.foreach { s0 =>
        IcebergTableReader.manifestListEntries(spark, tablePath, s0.manifestList)
          .foreach { case (mp, _, _, _) =>
            manifests += mp
            IcebergTableReader.manifestEntriesPublic(spark, tablePath, mp)
              .filter(_.status != 2)
              .foreach(e => files += e.filePath)
          }
      }
      (lists, manifests.toSet, files.toSet)
    }
    val (rl, rm, rd) = inventory(retained)
    val (el, em, ed) = inventory(expired)
    // metadata rewrite: same tree, snapshots filtered to the retained
    val version = IcebergTableReader.currentMetadataVersion(spark, tablePath)
    val metaPath = new Path(tablePath, s"metadata/v$version.metadata.json")
    val in = fs.open(metaPath)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(text)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val keepIds = retained.map(_.id).toSet
    val arr = root.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("snapshots")
    val kept = mapper.createArrayNode()
    arr.forEach(n => if (keepIds.contains(n.get("snapshot-id").asLong())) { kept.add(n); () })
    root.replace("snapshots", kept): Unit
    val vNew = version + 1
    val newMeta = new Path(tablePath, s"metadata/v$vNew.metadata.json")
    val created = try {
      val out = fs.create(newMeta, false) // same CAS as commits
      try out.write((mapper.writeValueAsString(root) + "\n").getBytes("UTF-8"))
      finally out.close()
      true
    } catch { case _: java.io.IOException => false }
    if (!created) throw new IllegalStateException(
      s"$tablePath: metadata v$vNew already taken — re-run expiry after the racer's commit")
    val hint = fs.create(new Path(tablePath, "metadata/version-hint.text"), true)
    try hint.write(s"$vNew\n".getBytes("UTF-8")) finally hint.close()
    // orphan removal: only what NO retained snapshot reaches
    def resolveRel(p: String): Path =
      if (p.contains("://") || p.startsWith("/")) new Path(p) else new Path(tablePath, p)
    ((el -- rl) ++ (em -- rm) ++ (ed -- rd)).toSeq.sorted.foreach { p =>
      val f = resolveRel(p)
      if (fs.exists(f)) { fs.delete(f, false): Unit }
    }
    expired.map(_.id)
  }

  /** Row-level DELETE on an external Iceberg table WITHOUT rewriting
    * data files: rows matching `predicate` (evaluated on exactly the
    * live rows — existing position deletes pre-applied) become a v2
    * POSITION-DELETE file of spec-shaped (file_path, pos) rows,
    * published as a delete-manifest (content=1) snapshot with
    * operation 'delete'. The position computation, the file-path
    * mapping back to the manifest-recorded relative paths, and the
    * delete-file write are all DISTRIBUTED — no driver
    * materialization of positions (unlike Delta's bitmap build, the
    * spec's delete file IS columnar). Tables carrying EQUALITY
    * deletes refuse — composing the two delete shapes in one
    * predicate evaluation is not implemented. Returns the new
    * snapshot id.
    */
  def delete(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      predicate: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions._
    // the v3 spec FORBIDS position-delete files: once the table's
    // format-version reached 3 (a deleteDv ran), route row deletes
    // through the DV writer instead of landing a shape external v3
    // readers must reject
    if (IcebergTableReader.currentFormatVersion(spark, tablePath) >= 3)
      return deleteDv(spark, tablePath, predicate)
    // the snapshot this delete is computed against — a racing
    // non-append between here and the commit CAS must refuse
    val plannedId = IcebergTableReader.snapshotLog(spark, tablePath)._2
    val plan = IcebergTableReader.planFiles(spark, tablePath)
    require(plan.equalityDeletes.isEmpty,
      s"$tablePath: table carries equality-delete files — position-deleting on top of " +
        "them would need composed delete semantics this writer does not implement; refusing")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tablePath).getFileSystem(conf)
    def resolveAbs(rel: String): String =
      if (rel.contains("://") || rel.startsWith("/")) rel else s"$tablePath/$rel"
    // live rows with their physical identity
    val keyed0 = spark.read.parquet(plan.data.map(resolveAbs): _*)
      .withColumn("_g_file", ScanPaths.normalizeScan(
        org.apache.spark.sql.functions.col("_metadata.file_path")))
      .withColumn("_g_pos", org.apache.spark.sql.functions.col("_metadata.row_index"))
    val keyed =
      if (plan.positionDeletes.isEmpty) keyed0
      else {
        val existing = spark.read.parquet(plan.positionDeletes.map(resolveAbs): _*)
          .select(ScanPaths.normalizeMetaColumn(col("file_path"), tablePath).as("_g_file"),
            col("pos").cast("long").as("_g_pos"))
        keyed0.join(existing, Seq("_g_file", "_g_pos"), "left_anti")
      }
    // map scan paths back to the manifest-recorded relative paths
    val relRows = plan.data.map(rel => org.apache.spark.sql.Row(
      ScanPaths.normalizeDriver(resolveAbs(rel)), rel))
    import scala.jdk.CollectionConverters._
    val relDf = spark.createDataFrame(relRows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_g_file",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("file_path",
          org.apache.spark.sql.types.StringType))))
    val deletes = keyed.where(predicate)
      .join(broadcast(relDf), Seq("_g_file"))
      .select(col("file_path"), col("_g_pos").cast("long").as("pos"))
      .sort("file_path", "pos")
    // land the delete file (one file — delete sets are small relative
    // to data; a huge delete should rewrite instead)
    val (rel, n) = landSmallParquet(spark, tablePath, deletes, "position-delete",
      emptyMsg = Some("predicate matched no live rows — nothing to delete"))
    val schema = IcebergTableReader.snapshot(spark, tablePath).schema
    commitSnapshot(spark, tablePath, schema, declaredPartitionFields(spark, tablePath),
      Seq(Landed(rel, n, Map.empty)), content = 1, operation = "delete",
      plannedAgainst = Some(plannedId))
  }

  /** Driver-side cap on the COMPRESSED deletion-vector bytes a
    * [[deleteDv]] commit assembles into its puffin file (the blobs
    * are roaring-compressed on executors; only those bytes ride the
    * driver). Past it, rewrite the files instead of vectorizing. */
  val MaxDvBytesDriver: Long = 256L << 20

  /** Row-level delete via v3 DELETION VECTORS (iceberg.apache.org
    * spec v3 "Deletion Vectors"): matched live rows become per-file
    * puffin blobs — the portable 64-bit roaring bitmap in Delta's
    * sidecar framing, which the spec adopted byte-for-byte — landed
    * as ONE puffin file and committed as a content=1 deletes manifest
    * whose entries carry `referenced_data_file`/`content_offset`/
    * `content_size_in_bytes`. Per the spec's supersede rule each new
    * DV folds in ALL prior deletes of its file (existing DVs and v2
    * position-delete rows included), and prior DV entries for the
    * re-vectored files are REWRITTEN OUT of their manifests (one DV
    * per data file). Because v3 FORBIDS position-delete files, the
    * commit also re-vectorizes every file still carrying v2
    * position-delete rows and drops their manifests — the committed
    * table is v3-legal throughout, and [[delete]] auto-vectorizes
    * once the format-version is 3 so no later commit regresses it.
    * The commit floors `format-version` at 3. The
    * position computation and bitmap build are distributed; the
    * driver holds |touched files| compressed blobs, loudly bounded.
    * Equality-delete tables refuse (composed semantics), matching
    * [[delete]]. Returns the new snapshot id.
    */
  def deleteDv(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      predicate: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Encoders
    val plannedId = IcebergTableReader.snapshotLog(spark, tablePath)._2
    val plan = IcebergTableReader.planFiles(spark, tablePath)
    require(plan.equalityDeletes.isEmpty,
      s"$tablePath: table carries equality-delete files — deletion-vectoring on top of " +
        "them would need composed delete semantics this writer does not implement; refusing")
    val conf = spark.sparkContext.hadoopConfiguration
    def resolveAbs(rel: String): String =
      if (rel.contains("://") || rel.startsWith("/")) rel else s"$tablePath/$rel"
    // live rows = data minus every existing delete shape
    val keyed0 = spark.read.parquet(plan.data.map(resolveAbs): _*)
      .withColumn("_g_file", ScanPaths.normalizeScan(col("_metadata.file_path")))
      .withColumn("_g_pos", col("_metadata.row_index").cast("long"))
    val posPrior: Option[org.apache.spark.sql.DataFrame] =
      if (plan.positionDeletes.isEmpty) None
      else Some(spark.read.parquet(plan.positionDeletes.map(resolveAbs): _*)
        .select(ScanPaths.normalizeMetaColumn(col("file_path"), tablePath).as("_g_file"),
          col("pos").cast("long").as("_g_pos")))
    val dvPrior: Option[org.apache.spark.sql.DataFrame] =
      if (plan.deletionVectors.isEmpty) None
      else Some(IcebergTableReader.dvPositionsOf(spark, tablePath, plan.deletionVectors))
    val priorDels: Option[org.apache.spark.sql.DataFrame] = (posPrior, dvPrior) match {
      case (Some(a), Some(b)) => Some(a.unionByName(b))
      case (a, b) => a.orElse(b)
    }
    val keyed = priorDels match {
      case Some(d) => keyed0.join(d, Seq("_g_file", "_g_pos"), "left_anti")
      case None => keyed0
    }
    val matched = keyed.where(predicate).select(col("_g_file"), col("_g_pos"))
    if (matched.limit(1).isEmpty) throw new IllegalArgumentException(
      s"$tablePath: predicate matched no live rows — nothing to delete")
    // SUPERSEDE, spec-complete: the new DV for a touched file carries
    // every prior delete of that file — AND, because the v3 spec
    // FORBIDS position-delete files outright, every file still
    // carrying v2 position-delete rows re-vectorizes in this same
    // commit (their manifests drop below; untouched files' existing
    // DV entries stay in place, they are already v3-legal)
    val touched = (posPrior match {
      case Some(p) => matched.select("_g_file").unionByName(p.select("_g_file"))
      case None => matched.select("_g_file")
    }).distinct()
    val folded = priorDels match {
      case Some(d) => matched.unionByName(d.join(touched, Seq("_g_file"), "left_semi"))
      case None => matched
    }
    // per-file portable bitmaps, built and compressed ON EXECUTORS
    val blobs = folded
      .groupByKey(_.getString(0))(Encoders.STRING)
      .mapGroups { (f, it) =>
        val positions = it.map(_.getLong(1)).toArray.distinct.sorted
        (f, DeltaDv.serializePositions(positions.toIndexedSeq), positions.length.toLong)
      }(Encoders.tuple(Encoders.STRING, Encoders.BINARY, Encoders.scalaLong))
      .collect()
    require(blobs.nonEmpty,
      s"$tablePath: matched rows vanished between probe and fold — racing writer?")
    val totalBytes = blobs.map(_._2.length.toLong).sum
    require(totalBytes <= MaxDvBytesDriver,
      s"$tablePath: deletion vectors compress to $totalBytes bytes (> $MaxDvBytesDriver) " +
        "— a delete this large should rewrite its files, not vectorize them; refusing")
    // normalized scan path → the manifest-recorded relative path (the
    // form referenced_data_file must take so readers re-resolve it)
    val relByNorm = plan.data
      .map(rel => ScanPaths.normalizeDriver(resolveAbs(rel)) -> rel).toMap
    val blobRels = blobs.map { case (norm, bytes, n) =>
      (relByNorm.getOrElse(norm, throw new IllegalStateException(
        s"$tablePath: matched file $norm is not in the plan — racing writer?")),
        bytes, n)
    }
    val supersededNorm: Set[String] = blobs.map(_._1).toSet
    val schema = IcebergTableReader.snapshot(spark, tablePath).schema
    commitSnapshotGroups(spark, tablePath, schema,
      declaredPartitionFields(spark, tablePath), groups = Nil, operation = "delete",
      plannedAgainst = Some(plannedId),
      minFormatVersion = 3,
      extraManifests = (newId, seq) => {
        val puffinRel = s"data/dv-$newId-${java.util.UUID.randomUUID()}.puffin"
        val refs = IcebergPuffin.writeFile(conf, new Path(tablePath, puffinRel),
          blobRels.toIndexedSeq.map { case (rel, bytes, n) =>
            IcebergPuffin.DvBlob(rel, bytes, n, newId, seq)
          })
        val rows = refs.map(r => DvManifestRow(puffinRel, r.referencedDataFile,
          r.offset, r.length, r.cardinality, newId, seq))
        Seq((writeDvManifest(conf, tablePath, rows), 1))
      },
      transformBase = base => base.flatMap { case m @ (mp, addedBy, content, mseq) =>
        if (content != 1) Some(m)
        else {
          val entries = IcebergTableReader.manifestEntriesPublic(spark, tablePath, mp)
          val (dvE, otherE) = entries.partition(_.contentOffset.isDefined)
          // v2 position-delete manifest: DROP — every one of its rows
          // was folded into this commit's DVs (the v3 spec forbids
          // position-delete files; keeping it would hand external v3
          // readers a shape they must reject)
          if (dvE.isEmpty) None
          else {
            require(otherE.isEmpty,
              s"$tablePath: manifest $mp mixes DV and non-DV delete entries; refusing")
            val kept = dvE.filterNot(e => e.referencedDataFile.exists(r =>
              supersededNorm.contains(ScanPaths.normalizeDriver(resolveAbs(r)))))
            if (kept.size == dvE.size) Some(m)
            else if (kept.isEmpty) None // every DV superseded: drop the manifest
            else {
              // rewrite minus the superseded entries; stamps resolve
              // to explicit values (list inheritance folded in)
              val rows = kept.map { e =>
                DvManifestRow(e.filePath, e.referencedDataFile.get, e.contentOffset.get,
                  e.contentSize.get, e.recordCount.getOrElse(0L),
                  e.snapshotId.getOrElse(addedBy),
                  e.sequence.orElse(mseq).getOrElse(throw new IllegalStateException(
                    s"$tablePath: DV entry ${e.filePath} has no resolvable sequence")))
              }
              Some((writeDvManifest(conf, tablePath, rows), addedBy, 1, mseq))
            }
          }
        }
      })
  }

  /** Publish Iceberg metadata OVER existing parquet files — NO data
    * rewrite (the UniForm shape: one copy of the data, two formats'
    * metadata). `files` are (absolute path, record count) pairs; each
    * publish lands ONE fresh manifest referencing exactly them under
    * a `replace` snapshot (nothing reused — a republish must not
    * resurrect files the primary format dropped), so snapshot readers
    * serve the mirrored state and incremental readers refuse across
    * it (a mirror sync is not an append). Driver cost is |files|
    * metadata. Returns the new snapshot id.
    */
  def publishMetadataOnly(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      files: Seq[(String, Long)],
      schema: org.apache.spark.sql.types.StructType): Long = {
    require(files.nonEmpty, s"$tablePath: nothing to publish — empty file set")
    files.foreach { case (p, _) => require(p.startsWith("/") || p.contains("://"),
      s"$tablePath: publishMetadataOnly takes ABSOLUTE data-file paths, got $p") }
    commitSnapshotGroups(spark, tablePath, schema, Nil,
      Seq(ManifestGroup(files.map { case (p, n) => Landed(p, n, Map.empty) },
        entryContent = 0)),
      operation = "replace", reuseManifests = false)
  }

  /** Rows per delete file: small delete sets land as one file (the
    * common CDC shape); a backfill-scale upsert's key set SHARDS past
    * this so no single task serializes it (the spec allows several
    * delete files per snapshot).
    */
  val MaxDeleteFileRows: Long = 4L * 1000 * 1000

  /** Land delete-file parquet and return (relative path, footer row
    * count) per landed shard. One coalesced file at or under
    * `maxRows` expected rows; sharded `repartition` write past it.
    * Refuses an empty frame.
    */
  private def landDeleteShards(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, df: DataFrame, what: String,
      emptyMsg: Option[String] = None,
      expectedRows: Option[Long] = None,
      maxRows: Long = MaxDeleteFileRows): Seq[(String, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tablePath).getFileSystem(conf)
    val stage = new Path(tablePath, s".graft-del-${java.util.UUID.randomUUID()}")
    val shards = expectedRows.map(r => ((r + maxRows - 1) / maxRows).toInt).getOrElse(1)
    val staged = if (shards <= 1) df.coalesce(1) else df.repartition(shards)
    staged.write.parquet(stage.toString)
    val parts = fs.listStatus(stage).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    if (parts.isEmpty) throw new IllegalStateException(
      s"$tablePath: $what stage wrote nothing")
    import scala.collection.parallel.CollectionConverters._
    val landed = parts.toIndexedSeq.par.map { part =>
      val rel = s"data/del-${java.util.UUID.randomUUID()}.parquet"
      fs.mkdirs(new Path(tablePath, rel).getParent)
      if (!fs.rename(part, new Path(tablePath, rel))) throw new IllegalStateException(
        s"$tablePath: failed to land $what file $rel")
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new Path(tablePath, rel), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val n = try r.getRecordCount finally r.close()
      (rel, n)
    }.seq
    fs.delete(stage, true)
    val nonEmpty = landed.filter(_._2 > 0L)
    landed.filter(_._2 == 0L)
      .foreach { case (rel, _) => fs.delete(new Path(tablePath, rel), false): Unit }
    if (nonEmpty.isEmpty) throw new IllegalArgumentException(
      s"$tablePath: " + emptyMsg.getOrElse(s"empty $what batch — nothing to write"))
    nonEmpty
  }

  /** [[landDeleteShards]] for the single-file callers. */
  private def landSmallParquet(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, df: DataFrame, what: String,
      emptyMsg: Option[String] = None): (String, Long) =
    landDeleteShards(spark, tablePath, df, what, emptyMsg).head

  /** UPSERT (merge) into an external Iceberg v2 table via EQUALITY
    * DELETES — the Flink-CDC write shape: the batch's key values land
    * as ONE content=2 delete file (spec `equality_ids` naming the key
    * field ids), the batch's rows land as new data files, and both
    * publish in ONE snapshot at the same sequence number — so, per
    * the spec's strictly-older scoping, the delete removes matching
    * rows from every PRIOR data file while the batch's own rows
    * survive. Readers see the merge atomically.
    *
    * Scale shape: the write path never scans the existing table —
    * cost is O(batch) regardless of table size (the read-side merge
    * is one broadcast anti join, |delete rows|-bounded). That is the
    * whole point of equality deletes over position deletes: no
    * locate-the-row scan at write time. The batch must be unique on
    * `keys` (an in-batch duplicate would be ambiguous); tables whose
    * existing equality deletes use a DIFFERENT key set refuse (the
    * reader applies one key shape per scan, spec-locked). Returns the
    * new snapshot id.
    */
  def upsert(df: DataFrame, tablePath: String, keys: Seq[String],
      maxDeleteFileRows: Long = MaxDeleteFileRows): Long = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    require(keys.nonEmpty, s"$tablePath: upsert needs at least one equality-key column")
    val idToName = IcebergTableReader.schemaFieldNames(spark, tablePath)
    val nameToId = idToName.map(_.swap)
    val tableCols0 = idToName.toSeq.sortBy(_._1).map(_._2)
    val missingCols = tableCols0.toSet -- df.columns.toSet
    require(missingCols.isEmpty,
      s"$tablePath: upsert columns ${df.columns.sorted.mkString(",")} lack declared " +
        s"column(s) ${missingCols.toSeq.sorted.mkString(",")} — writes must carry the " +
        "full declared schema (additive evolution only adds columns)")
    val tableCols = tableCols0 ++ df.columns.filterNot(tableCols0.contains)
    val eqIds = keys.map(k => nameToId.getOrElse(k, throw new IllegalArgumentException(
      s"$tablePath: upsert key $k is not a declared table column")))
    val plan = IcebergTableReader.planFiles(spark, tablePath)
    plan.equalityDeletes.headOption.foreach { d =>
      require(d.equalityColumns.toSet == keys.toSet,
        s"$tablePath: existing equality deletes key on ${d.equalityColumns.mkString(",")} " +
          s"but this upsert keys on ${keys.mkString(",")} — mixed key shapes in one " +
          "table are not readable; refusing")
    }
    val aligned = df.select(tableCols.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nRows = aligned.count()
      val nKeys = aligned.select(keys.map(col): _*).distinct().count()
      require(nRows == nKeys,
        s"$tablePath: upsert batch carries ${nRows - nKeys} duplicate key row(s) — the " +
          "replacement row per key would be ambiguous; pre-combine the batch first")
      val delShards = landDeleteShards(spark, tablePath,
        aligned.select(keys.map(col): _*), "equality-delete",
        expectedRows = Some(nRows), maxRows = maxDeleteFileRows)
      val pfields = declaredPartitionFields(spark, tablePath)
      val files = writeDataFiles(aligned, tablePath, pfields)
      val schema = org.apache.spark.sql.types.StructType(
        aligned.schema.fields)
      commitSnapshotGroups(spark, tablePath, schema, pfields,
        Seq(ManifestGroup(files, entryContent = 0),
          ManifestGroup(delShards.map { case (rel, n) => Landed(rel, n, Map.empty) },
            entryContent = 2, equalityIds = eqIds)),
        operation = "overwrite")
    } finally aligned.unpersist()
  }
}
