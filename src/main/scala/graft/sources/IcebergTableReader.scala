package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** READ-ONLY adapter for externally-written Apache Iceberg tables —
  * the third leg of the "point the engine at an existing lakehouse
  * table" interop surface (template.py:207-217's entry point, beside
  * [[DeltaTableReader]] and [[HudiTableReader]]), implemented from
  * the PUBLIC Iceberg table spec (iceberg.apache.org/spec):
  *
  *  - `metadata/version-hint.text` names the current
  *    `vN.metadata.json`; the metadata JSON carries the snapshot log
  *    (`snapshots`: id, parent, operation summary, manifest-list);
  *  - a snapshot's MANIFEST LIST is a small Avro file of manifest
  *    paths (+ `added_snapshot_id`, and in v2 a `content` field
  *    separating data from delete manifests);
  *  - each MANIFEST is an Avro file of entries: `status`
  *    (1=added, 0=existing, 2=deleted) and a `data_file` struct
  *    (`file_path`, and in v2 `content`: 0=data, 1=position deletes,
  *    2=equality deletes).
  *
  * The snapshot is the union of live (status != deleted) data files
  * across the current snapshot's manifests, read as ONE distributed
  * parquet scan — identity-partition columns ride the data files in
  * Iceberg, so nothing needs reconstruction. Manifest/metadata
  * parsing is DRIVER-SIDE METADATA, bounded by manifest counts (the
  * same shape Iceberg's own planner has; at 100 TB the manifest list
  * is what makes planning O(manifests), not O(files-on-disk)).
  *
  * v2 POSITION DELETES are APPLIED: delete manifests' parquet files
  * of (file_path, pos) rows subtract from the data scan with an anti
  * join on `_metadata.file_path`/`row_index` — the same positional
  * identity graft's own DeletionVectors machinery uses, bounded by
  * |deletes|, never table bytes. EQUALITY deletes (content=2) are
  * applied too — one delete-file scan + a sequence-scoped null-safe
  * anti join on the declared key columns. Incremental reads
  * follow the snapshot log parent chain: appends-only between the
  * checkpoint and the current snapshot surface exactly the files
  * their snapshots ADDED (status=1, tagged `_snapshot_id`); an
  * overwrite/delete/replace snapshot in the range refuses — the same
  * append-scoped contract the Delta/Hudi adapters and graft's own
  * IncrementalReader hold — while [[changeFeedSince]] serves the
  * CDC-grade feed across all three delete shapes.
  */
object IcebergTableReader {

  private val mapper = new ObjectMapper()

  final case class SnapshotInfo(
      id: Long,
      parentId: Option[Long],
      operation: String,
      manifestList: String,
      timestampMs: Long = 0L,
      summary: Map[String, String] = Map.empty) // extra keys beyond operation

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Resolve the current metadata JSON: version-hint.text when
    * present, else the highest-numbered `v*.metadata.json`.
    */
  private def currentMetadataPath(fs: FileSystem, tablePath: String): Path = {
    val metaDir = new Path(tablePath, "metadata")
    if (!fs.exists(metaDir)) throw new IllegalArgumentException(
      s"$tablePath is not an Iceberg table: no metadata directory")
    val hint = new Path(metaDir, "version-hint.text")
    if (fs.exists(hint)) new Path(metaDir, s"v${readText(fs, hint).trim}.metadata.json")
    else {
      val candidates = fs.listStatus(metaDir).toIndexedSeq
        .map(_.getPath.getName)
        .filter(n => n.endsWith(".metadata.json"))
      if (candidates.isEmpty) throw new IllegalArgumentException(
        s"$tablePath: no *.metadata.json under metadata/")
      // NUMERIC max, not lexicographic: unpadded `v9.metadata.json`
      // sorts above `v10.metadata.json` as a string, which would
      // silently serve a stale snapshot past version 9. Both public
      // filesystem-catalog names carry the version as a number —
      // `vN.metadata.json` and the zero-padded `NNNNN-<uuid>` form.
      def numericVersion(name: String): Option[Long] = {
        val base = name.stripSuffix(".metadata.json")
        if (base.startsWith("v") && base.length > 1 && base.drop(1).forall(_.isDigit))
          Some(base.drop(1).toLong)
        else {
          val digits = base.takeWhile(_.isDigit)
          if (digits.nonEmpty && base.lift(digits.length).contains('-')) Some(digits.toLong)
          else None
        }
      }
      val numbered = candidates.flatMap(n => numericVersion(n).map(v => (v, n)))
      val pick =
        if (numbered.size == candidates.size) numbered.maxBy(_._1)._2
        else candidates.max // unknown naming scheme: fall back, stated in spec
      new Path(metaDir, pick)
    }
  }

  /** The snapshot log from the current metadata JSON, oldest first,
    * plus the current snapshot id.
    */
  def snapshotLog(spark: SparkSession, tablePath: String): (Seq[SnapshotInfo], Long) = {
    val fs = fsOf(spark, new Path(tablePath))
    val meta = mapper.readTree(readText(fs, currentMetadataPath(fs, tablePath)))
    val currentId = Option(meta.get("current-snapshot-id")).map(_.asLong()).getOrElse(
      throw new IllegalArgumentException(s"$tablePath: metadata has no current-snapshot-id"))
    if (currentId < 0) throw new IllegalArgumentException(
      s"$tablePath: table has no current snapshot (empty table)")
    val snaps = Seq.newBuilder[SnapshotInfo]
    val arr = meta.get("snapshots")
    if (arr != null && arr.isArray) arr.forEach { s =>
      val extra = Map.newBuilder[String, String]
      Option(s.get("summary")).foreach(sm => sm.fields().forEachRemaining { e =>
        if (e.getKey != "operation") extra += (e.getKey -> e.getValue.asText())
      })
      snaps += SnapshotInfo(
        id = s.get("snapshot-id").asLong(),
        parentId = Option(s.get("parent-snapshot-id")).map(_.asLong()),
        operation = Option(s.get("summary")).flatMap(x => Option(x.get("operation")))
          .map(_.asText()).getOrElse("append"),
        manifestList = s.get("manifest-list").asText(),
        timestampMs = Option(s.get("timestamp-ms")).map(_.asLong()).getOrElse(0L),
        summary = extra.result())
    }
    (snaps.result(), currentId)
  }

  /** Field-id → name map from the metadata JSON's schema(s) — what
    * resolves equality-delete `equality_ids` to column names. Reads
    * the current schema (`schemas` + `current-schema-id`, or the
    * legacy single `schema`).
    */
  /** The CURRENT schema node: `schemas[current-schema-id]` (falling
    * back to the first entry, then the legacy v1 `schema` field) —
    * shared by name AND type resolution so bound decoding reads at
    * the same width the names resolve against after evolution.
    */
  private def currentSchemaNode(
      meta: com.fasterxml.jackson.databind.JsonNode): com.fasterxml.jackson.databind.JsonNode = {
    val schemas = meta.get("schemas")
    if (schemas != null && schemas.isArray) {
      val currentId = Option(meta.get("current-schema-id")).map(_.asInt())
      var pick: com.fasterxml.jackson.databind.JsonNode = null
      schemas.forEach { s =>
        if (pick == null ||
          currentId.exists(id => Option(s.get("schema-id")).exists(_.asInt() == id)))
          pick = s
      }
      pick
    } else meta.get("schema")
  }

  private[sources] def schemaFieldNames(spark: SparkSession, tablePath: String): Map[Int, String] = {
    val fs = fsOf(spark, new Path(tablePath))
    val meta = mapper.readTree(readText(fs, currentMetadataPath(fs, tablePath)))
    val schemaNode = currentSchemaNode(meta)
    if (schemaNode == null) Map.empty
    else {
      val b = Map.newBuilder[Int, String]
      val fields = schemaNode.get("fields")
      if (fields != null && fields.isArray)
        fields.forEach(f => b += (f.get("id").asInt() -> f.get("name").asText()))
      b.result()
    }
  }

  /** The table's DEFAULT sort order as (column, direction, null-order)
    * triples (spec "Sort Orders": `sort-orders` +
    * `default-sort-order-id`; source-ids resolve against the current
    * schema). Empty for unsorted tables (order 0), tables predating
    * the field, and non-identity transforms (this writer re-sorts
    * appends only on identity orders — sorting is advisory).
    */
  def sortOrder(spark: SparkSession, tablePath: String): Seq[(String, String, String)] = {
    val fs = fsOf(spark, new Path(tablePath))
    val meta = mapper.readTree(readText(fs, currentMetadataPath(fs, tablePath)))
    val orders = meta.get("sort-orders")
    if (orders == null || !orders.isArray) return Nil
    val defaultId = Option(meta.get("default-sort-order-id")).map(_.asInt()).getOrElse(0)
    var fields: com.fasterxml.jackson.databind.JsonNode = null
    orders.forEach { o =>
      if (Option(o.get("order-id")).exists(_.asInt() == defaultId)) fields = o.get("fields")
    }
    if (fields == null || !fields.isArray) return Nil
    val names = schemaFieldNames(spark, tablePath)
    val b = Seq.newBuilder[(String, String, String)]
    var resolvable = true
    fields.forEach { f =>
      val transform = Option(f.get("transform")).map(_.asText()).getOrElse("identity")
      val name = Option(f.get("source-id")).map(_.asInt()).flatMap(names.get)
      if (transform != "identity" || name.isEmpty) resolvable = false
      else b += ((name.get,
        Option(f.get("direction")).map(_.asText()).getOrElse("asc"),
        Option(f.get("null-order")).map(_.asText()).getOrElse("nulls-first")))
    }
    if (resolvable) b.result() else Nil
  }

  /** The CURRENT snapshot's registered PARTITION STATISTICS file as a
    * DataFrame in the spec's schema (partition struct + per-partition
    * data/delete census). A metadata-only read — |partitions| rows
    * from one parquet file, never a manifest walk; refuses when no
    * stats are registered for the current snapshot (stale stats for
    * an older snapshot must not silently serve) — run
    * `IcebergTableWriter.writePartitionStats` first.
    */
  def partitionStats(spark: SparkSession, tablePath: String): org.apache.spark.sql.DataFrame = {
    val fs = fsOf(spark, new Path(tablePath))
    val meta = mapper.readTree(readText(fs, currentMetadataPath(fs, tablePath)))
    val currentId = Option(meta.get("current-snapshot-id")).map(_.asLong())
      .getOrElse(throw new IllegalArgumentException(
        s"$tablePath: no current snapshot"))
    val arr = meta.get("partition-statistics")
    val path = Option(arr).filter(_.isArray).flatMap { a =>
      var found: Option[String] = None
      a.forEach { e =>
        if (Option(e.get("snapshot-id")).exists(_.asLong() == currentId))
          found = Option(e.get("statistics-path")).map(_.asText())
      }
      found
    }.getOrElse(throw new IllegalStateException(
      s"$tablePath: no partition statistics registered for snapshot $currentId — " +
        "run IcebergTableWriter.writePartitionStats (stale stats for an older " +
        "snapshot never serve silently)"))
    spark.read.parquet(resolve(tablePath, path))
  }

  private def readAvro(spark: SparkSession, path: String): Seq[GenericRecord] = {
    val p = new Path(path)
    val in = new FsInput(p, spark.sparkContext.hadoopConfiguration)
    val reader = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try {
      val b = Seq.newBuilder[GenericRecord]
      while (reader.hasNext) b += reader.next()
      b.result()
    } finally reader.close()
  }

  private def fieldLong(r: GenericRecord, name: String): Option[Long] =
    if (r.getSchema.getField(name) == null) None
    else Option(r.get(name)).map(_.asInstanceOf[Number].longValue())

  private def fieldInt(r: GenericRecord, name: String, default: Int): Int =
    if (r.getSchema.getField(name) == null) default
    else Option(r.get(name)).map(_.asInstanceOf[Number].intValue()).getOrElse(default)

  /** One manifest entry: status, addedSnapshotId, data sequence
    * number (v2; None on v1 entries), the file path/content, its
    * equality field ids (content=2 files) and identity-partition
    * values (stringified, as the writer records them).
    */
  final case class ManifestEntry(status: Int, snapshotId: Option[Long],
      sequence: Option[Long], filePath: String, content: Int,
      equalityIds: Seq[Int] = Nil, partition: Map[String, String] = Map.empty,
      lowerBounds: Map[Int, Array[Byte]] = Map.empty,
      upperBounds: Map[Int, Array[Byte]] = Map.empty,
      referencedDataFile: Option[String] = None,
      contentOffset: Option[Long] = None,
      contentSize: Option[Long] = None,
      recordCount: Option[Long] = None)

  /** Manifest entries of `manifestPath` (relative-or-absolute),
    * resolved against the table — the snapshot-expiry service's
    * inventory hook. */
  private[sources] def manifestEntriesPublic(spark: SparkSession, tablePath: String,
      manifestPath: String): Seq[ManifestEntry] =
    manifestEntries(spark, resolve(tablePath, manifestPath))

  private def manifestEntries(spark: SparkSession, manifestPath: String): Seq[ManifestEntry] =
    readAvro(spark, manifestPath).map { r =>
      val df = r.get("data_file").asInstanceOf[GenericRecord]
      val eqIds: Seq[Int] =
        if (df.getSchema.getField("equality_ids") == null) Nil
        else Option(df.get("equality_ids")) match {
          case Some(l: java.util.List[_]) =>
            import scala.jdk.CollectionConverters._
            l.asScala.toSeq.map(_.asInstanceOf[Number].intValue())
          case _ => Nil
        }
      val partition: Map[String, String] =
        if (df.getSchema.getField("partition") == null) Map.empty
        else Option(df.get("partition")) match {
          case Some(p: GenericRecord) =>
            import scala.jdk.CollectionConverters._
            p.getSchema.getFields.asScala.flatMap { f =>
              Option(p.get(f.pos())).map(v => f.name() -> v.toString)
            }.toMap
          case _ => Map.empty
        }
      def boundsOf(field: String): Map[Int, Array[Byte]] =
        if (df.getSchema.getField(field) == null) Map.empty
        else Option(df.get(field)) match {
          case Some(l: java.util.List[_]) =>
            import scala.jdk.CollectionConverters._
            l.asScala.toSeq.collect { case kv: GenericRecord =>
              val bytes = kv.get("value") match {
                case bb: java.nio.ByteBuffer =>
                  val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
                case arr: Array[Byte] => arr
                case other => other.toString.getBytes("UTF-8")
              }
              kv.get("key").asInstanceOf[Number].intValue() -> bytes
            }.toMap
          case _ => Map.empty
        }
      def dfStr(name: String): Option[String] =
        if (df.getSchema.getField(name) == null) None
        else Option(df.get(name)).map(_.toString)
      def dfLong(name: String): Option[Long] =
        if (df.getSchema.getField(name) == null) None
        else Option(df.get(name)).map(_.asInstanceOf[Number].longValue())
      ManifestEntry(
        status = fieldInt(r, "status", 1),
        snapshotId = fieldLong(r, "snapshot_id"),
        sequence = fieldLong(r, "sequence_number"),
        filePath = df.get("file_path").toString,
        content = fieldInt(df, "content", 0),
        equalityIds = eqIds,
        partition = partition,
        lowerBounds = boundsOf("lower_bounds"),
        upperBounds = boundsOf("upper_bounds"),
        // v3 DELETION VECTORS: a content=1 entry whose file is a
        // puffin blob, not a parquet position-delete file
        referencedDataFile = dfStr("referenced_data_file"),
        contentOffset = dfLong("content_offset"),
        contentSize = dfLong("content_size_in_bytes"),
        recordCount = dfLong("record_count"))
    }

  /** (manifestPath, addedSnapshotId, manifestContent, listSequence)
    * rows of a snapshot's manifest list. v1 lists carry no content
    * field (all data manifests) and no sequence_number; v2 lists'
    * sequence_number is the INHERITANCE source for entries whose own
    * sequence_number is null (spec "Sequence Number Inheritance").
    */
  private def manifestsOf(spark: SparkSession,
      manifestList: String): Seq[(String, Option[Long], Int, Option[Long])] =
    readAvro(spark, manifestList).map { r =>
      (r.get("manifest_path").toString,
        fieldLong(r, "added_snapshot_id"),
        fieldInt(r, "content", 0),
        fieldLong(r, "sequence_number"))
    }

  /** The current snapshot's manifest-list rows as (manifestPath,
    * addedSnapshotId, content, listSequence) — exposed for the
    * writer's manifest-reuse commits, which must carry each reused
    * manifest's ORIGINAL list sequence forward verbatim (entries in
    * inheritance form resolve against it).
    */
  private[sources] def manifestListEntries(spark: SparkSession, tablePath: String,
      manifestList: String): Seq[(String, Long, Int, Option[Long])] =
    manifestsOf(spark, resolve(tablePath, manifestList)).map {
      case (p, added, content, listSeq) => (p, added.getOrElse(0L), content, listSeq)
    }

  /** Numeric version of the current metadata file (hint value when
    * present, else the discovered numeric max) — the writer's next
    * version is this + 1.
    */
  private[sources] def currentMetadataVersion(spark: SparkSession, tablePath: String): Long = {
    val fs = fsOf(spark, new Path(tablePath))
    val name = currentMetadataPath(fs, tablePath).getName.stripSuffix(".metadata.json")
    if (name.startsWith("v") && name.drop(1).forall(_.isDigit)) name.drop(1).toLong
    else {
      val digits = name.takeWhile(_.isDigit)
      if (digits.nonEmpty) digits.toLong
      else throw new IllegalStateException(
        s"$tablePath: cannot parse a numeric version out of $name.metadata.json")
    }
  }

  /** The current metadata's declared `format-version` (2 when the
    * field is absent — v1 tables read fine under v2 rules here). */
  private[sources] def currentFormatVersion(spark: SparkSession, tablePath: String): Int = {
    val fs = fsOf(spark, new Path(tablePath))
    val meta = mapper.readTree(readText(fs, currentMetadataPath(fs, tablePath)))
    Option(meta.get("format-version")).map(_.asInt()).getOrElse(2)
  }

  /** Expand the plan's deletion vectors for the WRITER's live-row
    * computation — same executor-side decode as the read path. */
  private[sources] def dvPositionsOf(spark: SparkSession, tablePath: String,
      dvs: Seq[DvRef]): DataFrame = dvPositionsDf(spark, tablePath, dvs)

  private def currentSnapshot(spark: SparkSession, tablePath: String): SnapshotInfo = {
    val (snaps, currentId) = snapshotLog(spark, tablePath)
    snaps.find(_.id == currentId).getOrElse(throw new IllegalArgumentException(
      s"$tablePath: current-snapshot-id $currentId not in the snapshot list"))
  }

  /** One EQUALITY-delete file (content=2): its equality columns
    * (resolved from field ids) and the sequence number that scopes
    * which data files it applies to (strictly older, per spec).
    */
  final case class EqDelete(path: String, equalityColumns: Seq[String], sequence: Long)

  /** The current snapshot's live file plan: data files (with their
    * data sequence numbers and identity-partition values), v2
    * POSITION-DELETE files, and EQUALITY-delete files — all applied
    * by [[snapshot]].
    */
  /** One v3 DELETION VECTOR: the puffin blob location and the single
    * data file it masks (spec: exactly one DV per data file).
    */
  final case class DvRef(puffinPath: String, offset: Long, length: Long,
      referencedDataFile: String)

  final case class PlanFiles(
      data: Seq[String],
      positionDeletes: Seq[String],
      equalityDeletes: Seq[EqDelete] = Nil,
      dataSequences: Map[String, Long] = Map.empty,
      bounds: Map[String, (Map[Int, Array[Byte]], Map[Int, Array[Byte]])] = Map.empty,
      deletionVectors: Seq[DvRef] = Nil)

  def planFiles(spark: SparkSession, tablePath: String): PlanFiles =
    planFilesOf(spark, tablePath, currentSnapshot(spark, tablePath))

  /** [[planFiles]] with identity-partition pruning: entries whose
    * recorded partition values fail `pruner` never reach the scan —
    * metadata-only, before any data I/O (the manifest-level half of
    * Iceberg's own partition pruning).
    */
  def planFilesPruned(spark: SparkSession, tablePath: String,
      pruner: Map[String, String] => Boolean): PlanFiles =
    planFilesOf(spark, tablePath, currentSnapshot(spark, tablePath), pruner)

  private def planFilesOf(spark: SparkSession, tablePath: String,
      snap: SnapshotInfo, pruner: Map[String, String] => Boolean = _ => true): PlanFiles = {
    val manifests = manifestsOf(spark, resolve(tablePath, snap.manifestList))
    val data = Seq.newBuilder[(String, Option[Long])]
    val posDeletes = Seq.newBuilder[String]
    val dvRefs = Seq.newBuilder[DvRef]
    val eqDeletes = Seq.newBuilder[EqDelete]
    val boundsB = Map.newBuilder[String, (Map[Int, Array[Byte]], Map[Int, Array[Byte]])]
    lazy val idToName = schemaFieldNames(spark, tablePath)
    manifests.foreach { case (mpath, _, mcontent, mseq) =>
      manifestEntries(spark, resolve(tablePath, mpath)).foreach { e0 =>
        // SEQUENCE-NUMBER INHERITANCE (spec): an ADDED entry (status=1)
        // with null sequence_number inherits the manifest's own
        // sequence_number from the MANIFEST LIST — the form real
        // engines' writers produce. EXISTING entries (status=0) must
        // carry theirs explicitly (they predate the manifest).
        val e =
          if (e0.sequence.isEmpty && e0.status == 1 && mseq.isDefined)
            e0.copy(sequence = mseq)
          else e0
        if (e.status != 2) { // 2 = deleted entry
          (mcontent, e.content) match {
            case (0, 0) =>
              if (pruner(e.partition)) {
                data += ((e.filePath, e.sequence))
                if (e.lowerBounds.nonEmpty || e.upperBounds.nonEmpty)
                  boundsB += (e.filePath -> ((e.lowerBounds, e.upperBounds)))
              }
            case (1, 1) =>
              // v3 DELETION VECTOR (a puffin blob masking ONE data
              // file) vs v2 position-delete parquet: the spec keys on
              // the content_offset/referenced_data_file fields
              (e.contentOffset, e.contentSize, e.referencedDataFile) match {
                case (Some(off), Some(sz), Some(ref)) =>
                  dvRefs += DvRef(e.filePath, off, sz, ref)
                case (None, None, _) => posDeletes += e.filePath
                case _ => throw new IllegalStateException(
                  s"$tablePath: delete entry ${e.filePath} carries a PARTIAL deletion-" +
                    "vector reference (offset/size/referenced file must all be present); " +
                    "refusing")
              }
            case (1, 2) =>
              val names = e.equalityIds.map(id => idToName.getOrElse(id,
                throw new IllegalStateException(
                  s"$tablePath: equality-delete file ${e.filePath} names field id $id, " +
                    "which the table schema does not declare; refusing")))
              if (names.isEmpty) throw new IllegalStateException(
                s"$tablePath: equality-delete file ${e.filePath} declares no " +
                  "equality_ids — nothing to match on; refusing")
              val seq = e.sequence.getOrElse(throw new IllegalStateException(
                s"$tablePath: equality-delete file ${e.filePath} carries no sequence " +
                  "number — its scope (which data files it applies to) is undefined; refusing"))
              eqDeletes += EqDelete(e.filePath, names, seq)
            case (mc, ec) => throw new IllegalStateException(
              s"$tablePath: manifest $mpath (content=$mc) carries entry ${e.filePath} " +
                s"with content=$ec — inconsistent metadata; refusing")
          }
        }
      }
    }
    val dataFiles = data.result().distinct
    val eqs = eqDeletes.result().distinct
    // inheritance resolved above (ADDED entries take the manifest
    // list's sequence_number); an entry STILL without one here means
    // the list itself carries none (v1 list / spec-violating writer) —
    // with equality deletes in play a defaulted sequence would
    // mis-scope them (a post-delete data file treated as strictly
    // older silently LOSES matching rows), so refuse loudly
    if (eqs.nonEmpty) dataFiles.collectFirst { case (p, None) => p }.foreach { p =>
      throw new IllegalStateException(
        s"$tablePath: data file $p carries no sequence number (and its manifest-list " +
          "entry offers none to inherit) while equality deletes exist — their scope " +
          "over this file is undefined; refusing")
    }
    PlanFiles(dataFiles.map(_._1), posDeletes.result().distinct,
      eqs, dataFiles.collect { case (p, Some(s)) => p -> s }.toMap, boundsB.result(),
      dvRefs.result().distinct)
  }

  /** Field-id → Iceberg type name from the metadata schema — what
    * decodes manifest bound bytes. */
  private def schemaFieldTypes(spark: SparkSession, tablePath: String): Map[Int, String] = {
    val fs = fsOf(spark, new Path(tablePath))
    val meta = mapper.readTree(readText(fs, currentMetadataPath(fs, tablePath)))
    val schemaNode = currentSchemaNode(meta)
    if (schemaNode == null) Map.empty
    else {
      val b = Map.newBuilder[Int, String]
      val fields = schemaNode.get("fields")
      if (fields != null && fields.isArray) fields.forEach { f =>
        if (f.get("type") != null && f.get("type").isTextual)
          b += (f.get("id").asInt() -> f.get("type").asText())
      }
      b.result()
    }
  }

  /** Iceberg single-value DEserialization for the numeric bound
    * types the skipping compare handles; None = not comparable
    * (readers keep the file conservatively). */
  private def decodeBound(tpe: String, bytes: Array[Byte]): Option[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tpe match {
      case "int" if bytes.length >= 4 => Some(bb.getInt.toDouble)
      case "long" if bytes.length >= 8 => Some(bb.getLong.toDouble)
      case "double" if bytes.length >= 8 => Some(bb.getDouble)
      case _ => None
    }
  }

  /** [[planFiles]] with STATS-BASED FILE SKIPPING (Iceberg's own
    * planning move: manifests carry per-field lower/upper bounds, and
    * a file whose recorded range provably misses `[lo, hi]` on
    * `column` never reaches the scan). Bound-less files and
    * non-numeric bound types are conservatively KEPT — skipping
    * prunes I/O, never semantics. Metadata-only, before any data I/O.
    */
  def planFilesSkipping(spark: SparkSession, tablePath: String,
      column: String, lo: Double, hi: Double): PlanFiles = {
    val plan = planFiles(spark, tablePath)
    val nameToId = schemaFieldNames(spark, tablePath).map(_.swap)
    val fid = nameToId.getOrElse(column, throw new IllegalArgumentException(
      s"$tablePath: skipping column $column is not a declared table column"))
    val types = schemaFieldTypes(spark, tablePath)
    val tpe = types.getOrElse(fid, "")
    val kept = plan.data.filter { f =>
      plan.bounds.get(f) match {
        case None => true
        case Some((lower, upper)) =>
          val mn = lower.get(fid).flatMap(decodeBound(tpe, _))
          val mx = upper.get(fid).flatMap(decodeBound(tpe, _))
          // keep unless the recorded range PROVABLY misses [lo, hi]
          !(mn.exists(_ > hi) || mx.exists(_ < lo))
      }
    }
    plan.copy(data = kept)
  }

  /** Snapshot read over the skipping-pruned file set — deletes still
    * applied (position deletes name pruned-away files harmlessly;
    * the anti joins are |delete rows|-bounded either way).
    */
  def snapshotSkipping(spark: SparkSession, tablePath: String,
      column: String, lo: Double, hi: Double): DataFrame =
    readPlan(spark, tablePath, planFilesSkipping(spark, tablePath, column, lo, hi))

  /** Live data files of the current snapshot. Refuses when the
    * snapshot carries row-level deletes — callers of the bare file
    * list would silently over-return deleted rows (use [[snapshot]],
    * which applies position AND equality deletes).
    */
  def activeFiles(spark: SparkSession, tablePath: String): Seq[String] = {
    val plan = planFiles(spark, tablePath)
    if (plan.positionDeletes.nonEmpty || plan.equalityDeletes.nonEmpty ||
        plan.deletionVectors.nonEmpty)
      throw new IllegalStateException(
        s"$tablePath: the current snapshot carries row-level delete files — the bare " +
          "file list would over-return deleted rows; read through snapshot() instead")
    plan.data
  }

  private def resolve(tablePath: String, p: String): String =
    if (p.contains("://") || p.startsWith("/")) p else s"$tablePath/$p"

  /** Snapshot read: one distributed parquet scan of the current
    * snapshot's live data files, v2 POSITION DELETES subtracted.
    * Per the spec, a position-delete file is parquet rows of
    * (file_path, pos) naming exact row positions in exact data
    * files — the same (file, row_index) identity graft's own
    * [[DeletionVectors]] and the Delta DV read use, so the subtract
    * is the same anti join on the scan's `_metadata` columns:
    * bounded by |deletes-since-rewrite|, never table bytes, and the
    * delete files are themselves read as one distributed scan.
    */
  def snapshot(spark: SparkSession, tablePath: String): DataFrame =
    readPlan(spark, tablePath, planFiles(spark, tablePath))

  /** Snapshot read with identity-partition pruning — only data files
    * whose partition values pass `pruner` are scanned (proven by the
    * plan's input-file set, not just row counts).
    */
  def snapshotPruned(spark: SparkSession, tablePath: String,
      pruner: Map[String, String] => Boolean): DataFrame =
    readPlan(spark, tablePath, planFilesPruned(spark, tablePath, pruner))

  /** The partition-spec fields the current metadata declares —
    * transforms included ([[IcebergTransforms]]); what the
    * TRANSFORM-AWARE pruning below resolves against.
    */
  def partitionSpecFields(spark: SparkSession,
      tablePath: String): Seq[IcebergTransforms.PartitionField] =
    IcebergTableWriter.declaredPartitionFields(spark, tablePath)

  /** Pruner for `column BETWEEN lo AND hi` THROUGH the table's
    * declared partition transforms — the inverse half of transform
    * partitioning: a `days(ts)`-partitioned table cuts to the day
    * range, `bucket(N, id)` cuts on equality (lo == hi), fields on
    * other columns keep everything. Conservative by construction
    * (unprunable shapes keep the file).
    */
  def transformPruner(spark: SparkSession, tablePath: String, column: String,
      lo: Any, hi: Any): Map[String, String] => Boolean =
    IcebergTransforms.prunerFor(partitionSpecFields(spark, tablePath), column, lo, hi)

  /** Snapshot read pruned by a SOURCE-column range through the
    * declared transforms — rows still need the residual filter (the
    * cut is file-level, e.g. a whole day for a timestamp range);
    * metadata-only before any data I/O, Iceberg's own planning move.
    */
  def snapshotPrunedRange(spark: SparkSession, tablePath: String, column: String,
      lo: Any, hi: Any): DataFrame =
    snapshotPruned(spark, tablePath, transformPruner(spark, tablePath, column, lo, hi))

  /** TIMESTAMP AS OF: the latest snapshot whose `timestamp-ms` is at
    * or before `timestampMs` — pure snapshot-log metadata, Iceberg's
    * own resolution rule. A timestamp before the first snapshot
    * refuses.
    */
  /** Named refs from the metadata's `refs` map — Iceberg branches and
    * tags: name → (snapshot id, "branch" | "tag"). Empty when the
    * table declares none (pre-refs metadata).
    */
  /** Iceberg METADATA TABLES — the `SELECT * FROM tbl.snapshots` /
    * `.files` / `.manifests` / `.refs` / `.history` inspection
    * surface every engine exposes (iceberg.apache.org "Inspecting
    * tables"): each is a DataFrame built from metadata graft already
    * parses — |snapshots|, |manifests| or |entries| rows of driver
    * metadata, ZERO data I/O (the files table reads manifest avro,
    * never the parquet it lists).
    */
  def metadataTable(spark: SparkSession, tablePath: String, name: String): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    def mk(rows: Seq[Row], schema: StructType) =
      spark.createDataFrame(rows.asJava, schema)
    lazy val (snaps, currentId) = snapshotLog(spark, tablePath)
    name match {
      case "snapshots" =>
        mk(snaps.map(s => Row(new java.sql.Timestamp(s.timestampMs), s.id,
            s.parentId.map(java.lang.Long.valueOf).orNull, s.operation,
            resolve(tablePath, s.manifestList), s.summary)),
          StructType(Seq(
            StructField("committed_at", TimestampType),
            StructField("snapshot_id", LongType),
            StructField("parent_id", LongType),
            StructField("operation", StringType),
            StructField("manifest_list", StringType),
            StructField("summary", MapType(StringType, StringType)))))
      case "history" =>
        // is_current_ancestor = on the parent chain of the CURRENT
        // snapshot (rolled-back branches show false)
        val byId = snaps.map(s => s.id -> s).toMap
        val ancestors = Iterator.iterate(byId.get(currentId))(
            _.flatMap(s => s.parentId.flatMap(byId.get)))
          .takeWhile(_.isDefined).flatten.map(_.id).toSet
        mk(snaps.map(s => Row(new java.sql.Timestamp(s.timestampMs), s.id,
            s.parentId.map(java.lang.Long.valueOf).orNull, ancestors.contains(s.id))),
          StructType(Seq(
            StructField("made_current_at", TimestampType),
            StructField("snapshot_id", LongType),
            StructField("parent_id", LongType),
            StructField("is_current_ancestor", BooleanType))))
      case "refs" =>
        mk(refs(spark, tablePath).toSeq.sortBy(_._1).map { case (n, (id, t)) =>
            Row(n, t, id) },
          StructType(Seq(
            StructField("name", StringType),
            StructField("type", StringType),
            StructField("snapshot_id", LongType))))
      case "manifests" =>
        val current = snaps.find(_.id == currentId).getOrElse(
          throw new IllegalArgumentException(s"$tablePath: no current snapshot"))
        mk(manifestListEntries(spark, tablePath, current.manifestList)
            .map { case (p, added, content, seq) =>
              Row(resolve(tablePath, p), content, added,
                seq.map(java.lang.Long.valueOf).orNull) },
          StructType(Seq(
            StructField("path", StringType),
            StructField("content", IntegerType),
            StructField("added_snapshot_id", LongType),
            StructField("sequence_number", LongType))))
      case "files" =>
        val current = snaps.find(_.id == currentId).getOrElse(
          throw new IllegalArgumentException(s"$tablePath: no current snapshot"))
        val rows = manifestListEntries(spark, tablePath, current.manifestList)
          .flatMap { case (mp, _, content, _) =>
            manifestEntriesPublic(spark, tablePath, mp)
              .filter(_.status != 2) // deleted entries are not live
              .map(e => Row(content, resolve(tablePath, e.filePath),
                e.recordCount.map(java.lang.Long.valueOf).orNull,
                e.partition))
          }
        mk(rows,
          StructType(Seq(
            StructField("content", IntegerType),
            StructField("file_path", StringType),
            StructField("record_count", LongType),
            StructField("partition", MapType(StringType, StringType)))))
      case "partitions" =>
        val current = snaps.find(_.id == currentId).getOrElse(
          throw new IllegalArgumentException(s"$tablePath: no current snapshot"))
        val agg = scala.collection.mutable.LinkedHashMap
          .empty[Map[String, String], (Long, Long)]
        manifestListEntries(spark, tablePath, current.manifestList)
          .filter(_._3 == 0).foreach { case (mp, _, _, _) =>
            manifestEntriesPublic(spark, tablePath, mp)
              .filter(e => e.status != 2 && e.content == 0).foreach { e =>
                val (rc, fc) = agg.getOrElse(e.partition, (0L, 0L))
                agg(e.partition) = (rc + e.recordCount.getOrElse(0L), fc + 1L)
              }
          }
        mk(agg.toSeq.map { case (pv, (rc, fc)) => Row(pv, rc, fc) },
          StructType(Seq(
            StructField("partition", MapType(StringType, StringType)),
            StructField("record_count", LongType),
            StructField("file_count", LongType))))
      case other => throw new IllegalArgumentException(
        s"$tablePath: unknown metadata table '$other' — one of " +
          "snapshots/history/refs/manifests/files/partitions")
    }
  }

  def refs(spark: SparkSession, tablePath: String): Map[String, (Long, String)] = {
    val fs = fsOf(spark, new Path(tablePath))
    val meta = mapper.readTree(readText(fs, currentMetadataPath(fs, tablePath)))
    val node = meta.get("refs")
    if (node == null || !node.isObject) Map.empty
    else {
      val b = Map.newBuilder[String, (Long, String)]
      node.fields().forEachRemaining { e =>
        val sid = Option(e.getValue.get("snapshot-id")).map(_.asLong())
        val tpe = Option(e.getValue.get("type")).map(_.asText()).getOrElse("branch")
        sid.foreach(id => b += (e.getKey -> ((id, tpe))))
      }
      b.result()
    }
  }

  /** Read the snapshot a named ref (branch or tag) points at —
    * `VERSION AS OF 'name'`, Iceberg's ref-based time travel. Unknown
    * names refuse with the declared ref list.
    */
  def snapshotAsOfRef(spark: SparkSession, tablePath: String, name: String): DataFrame = {
    val all = refs(spark, tablePath)
    val (sid, _) = all.getOrElse(name, throw new IllegalArgumentException(
      s"$tablePath: no ref named '$name' (declared: " +
        s"${if (all.isEmpty) "none" else all.keys.toSeq.sorted.mkString(", ")})"))
    snapshotAsOf(spark, tablePath, sid)
  }

  def snapshotAsOfTimestamp(spark: SparkSession, tablePath: String,
      timestampMs: Long): DataFrame = {
    val (snaps, _) = snapshotLog(spark, tablePath)
    val eligible = snaps.filter(_.timestampMs <= timestampMs)
    if (eligible.isEmpty) throw new IllegalArgumentException(
      s"$tablePath: no snapshot at or before timestamp $timestampMs " +
        s"(earliest: ${snaps.map(_.timestampMs).minOption.getOrElse(-1L)})")
    snapshotAsOf(spark, tablePath, eligible.maxBy(_.timestampMs).id)
  }

  /** SNAPSHOT AS OF: read any snapshot still in the metadata's log by
    * id — Iceberg's own time travel; the manifest list IS the full
    * file inventory of that snapshot, so no replay is needed. An id
    * not in the log refuses (expired by snapshot cleanup).
    */
  def snapshotAsOf(spark: SparkSession, tablePath: String, snapshotId: Long): DataFrame = {
    val (snaps, _) = snapshotLog(spark, tablePath)
    val snap = snaps.find(_.id == snapshotId).getOrElse(throw new IllegalArgumentException(
      s"$tablePath: snapshot $snapshotId is not in the metadata log " +
        "(expired by snapshot cleanup?)"))
    readPlan(spark, tablePath, planFilesOf(spark, tablePath, snap))
  }

  /** Spark type for an Iceberg primitive type name — the subset the
    * declared-schema scan handles. None = fall back to footer
    * inference. Decimals parse their declared precision/scale (the
    * spec's `decimal(P, S)` form, space optional).
    */
  /** The spec's `decimal(P, S)` primitive form (space optional) —
    * shared with the writer's promotion check so the two sides can
    * never drift on what parses as a decimal. */
  private[sources] val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private def sparkTypeOf(t: String): Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    t match {
      case "long" => Some(LongType)
      case "int" => Some(IntegerType)
      case "double" => Some(DoubleType)
      case "float" => Some(FloatType)
      case "boolean" => Some(BooleanType)
      case "string" => Some(StringType)
      case "binary" => Some(BinaryType)
      case "date" => Some(DateType)
      case "timestamptz" => Some(TimestampType)
      case "timestamp" => Some(TimestampNTZType)
      case DecimalRe(p, s) => Some(DecimalType(p.toInt, s.toInt))
      case _ => None
    }
  }

  /** The CURRENT schema as a Spark StructType (fields in schema
    * order, all nullable), when every declared type maps — what lets
    * the scan NULL-FILL columns added by schema evolution in files
    * written before it (footer inference would make the scanned
    * schema depend on which file Spark samples).
    */
  /** True when the schema HISTORY diverges ids from names — either a
    * field id mapped to more than one name (a RENAME: pre-rename
    * files carry the old parquet name) or a name mapped to more than
    * one id (a DROP + RE-ADD: old files carry a SAME-NAMED column
    * whose bytes belong to the dropped field and must NOT leak into
    * the new one). Either way a name-keyed scan is wrong and field-id
    * resolution (the spec's actual rule) is the only safe read.
    */
  private def hasRenamedColumns(meta: com.fasterxml.jackson.databind.JsonNode): Boolean = {
    val schemas = meta.get("schemas")
    if (schemas == null || !schemas.isArray) return false
    val seenById = scala.collection.mutable.Map.empty[Int, String]
    val seenByName = scala.collection.mutable.Map.empty[String, Int]
    var diverged = false
    schemas.forEach { sn =>
      val fs0 = sn.get("fields")
      if (fs0 != null && fs0.isArray) fs0.forEach { f =>
        val id = f.get("id").asInt(); val n = f.get("name").asText()
        if (seenById.getOrElse(id, n) != n) diverged = true
        if (seenByName.getOrElse(n, id) != id) diverged = true
        seenById(id) = n
        seenByName(n) = id
      }
    }
    diverged
  }

  private def declaredSparkSchema(spark: SparkSession,
      tablePath: String): Option[org.apache.spark.sql.types.StructType] = {
    val fs = fsOf(spark, new Path(tablePath))
    val meta = mapper.readTree(readText(fs, currentMetadataPath(fs, tablePath)))
    val schemaNode = currentSchemaNode(meta)
    if (schemaNode == null) return None
    val fields = schemaNode.get("fields")
    if (fields == null || !fields.isArray) return None
    // renamed tables resolve columns by FIELD ID (the spec's rule —
    // engines stamp parquet field ids); the requested schema carries
    // parquet.field.id metadata and the session flag turns id
    // matching on, exactly the Delta columnMapping=id machinery
    val byId = hasRenamedColumns(meta)
    if (byId && spark.conf.getOption("spark.sql.parquet.fieldId.read.enabled")
        .forall(_ != "true"))
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    // recursive type mapping: primitives by name, nested struct/list/
    // map through the spec's object form. Nested columns resolve by
    // NAME — a rename-affected table (byId) keeps its inner fields
    // un-id-stamped in graft-landed files, so nested there falls back
    // rather than mis-resolving
    def typeOfNode(tNode: com.fasterxml.jackson.databind.JsonNode)
        : Option[org.apache.spark.sql.types.DataType] = {
      import org.apache.spark.sql.types._
      if (tNode == null) None
      else if (tNode.isTextual) sparkTypeOf(tNode.asText())
      else if (!tNode.isObject) None
      else Option(tNode.get("type")).map(_.asText()).flatMap {
        case "struct" =>
          val fns = tNode.get("fields")
          if (fns == null || !fns.isArray) None
          else {
            val inner = Seq.newBuilder[StructField]
            var innerOk = true
            fns.forEach { f =>
              typeOfNode(f.get("type")) match {
                case Some(dt) =>
                  inner += StructField(f.get("name").asText(), dt, nullable = true)
                case None => innerOk = false
              }
            }
            val got = inner.result()
            if (innerOk && got.nonEmpty) Some(StructType(got)) else None
          }
        case "list" =>
          typeOfNode(tNode.get("element")).map(ArrayType(_, containsNull = true))
        case "map" =>
          for {
            k <- typeOfNode(tNode.get("key"))
            v <- typeOfNode(tNode.get("value"))
          } yield MapType(k, v, valueContainsNull = true)
        case _ => None
      }
    }
    val b = Seq.newBuilder[org.apache.spark.sql.types.StructField]
    var ok = true
    fields.forEach { f =>
      val tNode = f.get("type")
      val nested = tNode != null && !tNode.isTextual
      if (byId && nested) ok = false // inner ids un-stamped: no id resolution
      else typeOfNode(tNode) match {
        case Some(dt) =>
          val md =
            if (!byId) org.apache.spark.sql.types.Metadata.empty
            else new org.apache.spark.sql.types.MetadataBuilder()
              .putLong("parquet.field.id", f.get("id").asLong()).build()
          b += org.apache.spark.sql.types.StructField(f.get("name").asText(), dt,
            nullable = true, md)
        case None => ok = false
      }
    }
    val st = b.result()
    if (ok && st.nonEmpty) Some(org.apache.spark.sql.types.StructType(st)) else None
  }

  /** Expand v3 deletion vectors into a (`_g_file`, `_g_pos`) frame —
    * decoded on executors from a broadcast Hadoop conf; the driver
    * holds only the |DVs| blob descriptors.
    */
  private def dvPositionsDf(spark: SparkSession, tablePath: String,
      dvs: Seq[DvRef]): DataFrame = {
    import org.apache.spark.sql.Encoders
    val bcConf = spark.sparkContext.broadcast(
      new DeltaDv.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val tasks = dvs.map(d => (
      ScanPaths.normalizeDriver(resolve(tablePath, d.referencedDataFile)),
      resolve(tablePath, d.puffinPath), d.offset, d.length))
    spark.createDataset(tasks)(Encoders.product[(String, String, Long, Long)])
      .repartition(math.max(1, math.min(tasks.size, spark.sparkContext.defaultParallelism)))
      .flatMap { case (file, puffin, off, len) =>
        IcebergPuffin.readDvPositions(bcConf.value.value, puffin, off, len)
          .iterator.map(p => (file, p))
      }(Encoders.product[(String, Long)])
      .toDF("_g_file", "_g_pos")
  }

  private def readPlan(spark: SparkSession, tablePath: String, plan: PlanFiles): DataFrame = {
    if (plan.data.isEmpty) throw new IllegalArgumentException(
      s"$tablePath: current snapshot has no live data files")
    val base = declaredSparkSchema(spark, tablePath) match {
      case Some(st) =>
        spark.read.schema(st).parquet(plan.data.map(resolve(tablePath, _)): _*)
      case None => spark.read.parquet(plan.data.map(resolve(tablePath, _)): _*)
    }
    if (plan.positionDeletes.isEmpty && plan.equalityDeletes.isEmpty &&
      plan.deletionVectors.isEmpty) return base
    // the scan's metadata columns attach ONCE, on the scan relation
    // itself (they do not resolve through later projections)
    val keyed0 = base
      .withColumn("_g_file", ScanPaths.normalizeScan(col("_metadata.file_path")))
      .withColumn("_g_pos", col("_metadata.row_index"))
    val afterParquetPos =
      if (plan.positionDeletes.isEmpty) keyed0
      else {
        val dels = spark.read.parquet(plan.positionDeletes.map(resolve(tablePath, _)): _*)
          .select(
            ScanPaths.normalizeMetaColumn(col("file_path"), tablePath).as("_g_file"),
            col("pos").cast("long").as("_g_pos"))
        keyed0.join(dels, Seq("_g_file", "_g_pos"), "left_anti")
      }
    // v3 DELETION VECTORS: each puffin blob masks one data file; the
    // blobs expand to (file, pos) ON EXECUTORS (|DVs| is metadata-
    // bounded; position sets never ride the driver) and subtract with
    // the same anti join. Applying DVs AND any surviving v2 position
    // deletes is always correct: the spec makes every new DV a
    // superset of the file's previous deletes, so the union is the DV.
    val afterPos =
      if (plan.deletionVectors.isEmpty) afterParquetPos
      else afterParquetPos.join(
        dvPositionsDf(spark, tablePath, plan.deletionVectors), Seq("_g_file", "_g_pos"),
        "left_anti")
    if (plan.equalityDeletes.isEmpty) afterPos.select(base.columns.map(col): _*)
    else {
      // EQUALITY deletes (content=2, the Flink-CDC shape): a delete
      // file's rows name key values; they remove matching rows from
      // data files STRICTLY OLDER (data sequence < delete sequence,
      // per spec). One delete-file scan + one anti join on the
      // equality columns (null-safe, as the spec requires) with the
      // sequence guard — bounded by |delete rows|, never table bytes.
      val eqSets = plan.equalityDeletes.map(_.equalityColumns).distinct
      if (eqSets.size > 1) throw new IllegalStateException(
        s"$tablePath: equality-delete files disagree on their equality columns " +
          s"(${eqSets.map(_.mkString("+")).mkString(" vs ")}) — applying mixed key " +
          "shapes in one scan is not implemented; refusing")
      val eqCols = eqSets.head
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      import scala.jdk.CollectionConverters._
      val delSeqDf = spark.createDataFrame(
        plan.equalityDeletes.map(d => org.apache.spark.sql.Row(
          ScanPaths.normalizeDriver(resolve(tablePath, d.path)), d.sequence)).asJava,
        StructType(Seq(StructField("_g_file", StringType), StructField("_g_dseq", LongType))))
      val dels = spark.read
        .parquet(plan.equalityDeletes.map(d => resolve(tablePath, d.path)): _*)
        .withColumn("_g_file", ScanPaths.normalizeScan(col("_metadata.file_path")))
        .join(broadcast(delSeqDf), Seq("_g_file"))
        .select(eqCols.map(c => col(c).as(s"_g_d_$c")) :+ col("_g_dseq"): _*)
      val dataSeqDf = spark.createDataFrame(
        plan.dataSequences.toSeq.map { case (p, s0) => org.apache.spark.sql.Row(
          ScanPaths.normalizeDriver(resolve(tablePath, p)), s0) }.asJava,
        StructType(Seq(StructField("_g_file", StringType), StructField("_g_seq", LongType))))
      val keyed = afterPos.join(broadcast(dataSeqDf), Seq("_g_file"), "left")
      val cond = eqCols.map(c => keyed(c) <=> dels(s"_g_d_$c")).reduce(_ && _) &&
        keyed("_g_seq") < dels("_g_dseq")
      keyed.join(broadcast(dels), cond, "left_anti")
        .select(base.columns.map(col): _*)
    }
  }

  /** Incremental read: rows ADDED by snapshots after `sinceSnapshotId`
    * on the current snapshot's parent chain, tagged `_snapshot_id`.
    * `replace` snapshots in the range (compaction / clustering
    * rewrites) are SKIPPED — Iceberg's own incremental-append scan
    * semantics: a replace adds no logical rows, and every production
    * table compacts, so a checkpointed consumer must survive one.
    * `overwrite` / `delete` snapshots still refuse loudly — they
    * change rows an append-scoped pull cannot represent. A checkpoint
    * id not on the chain refuses too (the table was rewritten under
    * the consumer). A range that turns out to be all-replace returns
    * the EMPTY frame in the table's shape: the consumer's checkpoint
    * still advances.
    */
  def incrementalSince(spark: SparkSession, tablePath: String, sinceSnapshotId: Long): DataFrame = {
    val range = chainSince(spark, tablePath, sinceSnapshotId)
    range.find(s => s.operation != "append" && s.operation != "replace").foreach { s =>
      throw new AppendScopedRangeException(
        s"$tablePath: snapshot ${s.id} is '${s.operation}', not an append — " +
          "an append-scoped incremental read cannot represent it; use " +
          "changeFeedSince (CDC-grade: overwrite/delete snapshots become " +
          "insert/delete images) or read the snapshot")
    }
    val appends = range.filter(_.operation == "append")
    val rangeIds = appends.map(_.id).toSet
    // added files per snapshot: each snapshot's manifest list, manifests
    // added BY that snapshot, entries with status=added
    val perSnapshot = appends.sortBy(_.id).map { s =>
      val added = manifestsOf(spark, resolve(tablePath, s.manifestList))
        .filter { case (_, addedBy, _, _) => addedBy.contains(s.id) }
        .flatMap { case (mpath, _, mcontent, _) =>
          if (mcontent != 0) throw new IllegalStateException(
            s"$tablePath: delete manifest in append snapshot ${s.id} — refusing")
          manifestEntries(spark, resolve(tablePath, mpath))
            .filter(e => e.status == 1 && e.snapshotId.forall(rangeIds.contains))
            .map(_.filePath)
        }.distinct
      (s.id, added)
    }.filter(_._2.nonEmpty)
    if (perSnapshot.isEmpty) {
      // nothing but rewrites (or empty appends) landed since the
      // checkpoint: an empty pull, NOT an error — shaped like the
      // table so downstream unions/schemas keep working
      if (range.exists(_.operation == "replace"))
        return snapshot(spark, tablePath).where(lit(false))
          .withColumn("_snapshot_id", lit(null).cast("long"))
      throw new IllegalArgumentException(
        s"$tablePath: snapshots after $sinceSnapshotId added no data files")
    }
    // scan with the CURRENT declared schema (same rule as snapshot):
    // files written before a schema evolution null-fill new columns,
    // and files written before a TYPE PROMOTION widen at scan — a
    // footer-inferred pull would serve the narrow physical type and
    // type-wobble across pulls as the consumer's checkpoint advances
    val reader = declaredSparkSchema(spark, tablePath) match {
      case Some(st) => spark.read.schema(st)
      case None => spark.read
    }
    perSnapshot.map { case (id, files) =>
      reader.parquet(files.map(resolve(tablePath, _)): _*)
        .withColumn("_snapshot_id", lit(id))
    }.reduce(_ unionByName _)
  }

  /** The parent chain (since, current], ascending. Refuses a `since`
    * that is not an ancestor of the current snapshot (the table
    * history was rewritten under the consumer) and an empty range.
    */
  private def chainSince(spark: SparkSession, tablePath: String,
      sinceSnapshotId: Long): Seq[SnapshotInfo] = {
    val (snaps, currentId) = snapshotLog(spark, tablePath)
    val byId = snaps.map(s => s.id -> s).toMap
    val chain = Seq.newBuilder[SnapshotInfo]
    var cursor: Option[Long] = Some(currentId)
    var found = false
    while (cursor.isDefined && !found) {
      if (cursor.get == sinceSnapshotId) found = true
      else {
        val s = byId.getOrElse(cursor.get, throw new IllegalArgumentException(
          s"$tablePath: snapshot ${cursor.get} missing from the log"))
        chain += s
        cursor = s.parentId
      }
    }
    if (!found) throw new IllegalArgumentException(
      s"$tablePath: snapshot $sinceSnapshotId is not an ancestor of the current " +
        s"snapshot $currentId — the table history was rewritten; re-bootstrap the consumer")
    val range = chain.result()
    if (range.isEmpty) throw new IllegalArgumentException(
      s"$tablePath: no snapshots after $sinceSnapshotId (current: $currentId)")
    range.sortBy(_.id)
  }

  /** CDC-grade incremental read — the change feed of snapshots after
    * `sinceSnapshotId`, the consumption half of the Flink-CDC shape
    * [[graft.sources.IcebergTableWriter.upsert]] writes:
    *
    *  - `append` snapshots → their added data files as `insert` rows;
    *  - `overwrite` snapshots (equality-delete upserts) → added data
    *    files as `insert` rows PLUS the content=2 delete file's key
    *    rows as `delete` KEY-IMAGES (non-key columns null — an
    *    equality delete names keys, not rows; consumers apply
    *    delete-by-key then insert, which reproduces the merge);
    *  - `delete` snapshots (position deletes) → full PRE-IMAGES, read
    *    from the targeted data files at exactly the deleted
    *    positions (data files are immutable, so the positions still
    *    hold the deleted rows);
    *  - `replace` snapshots (compaction/clustering rewrites) carry no
    *    logical change and emit NOTHING — the dataChange=false
    *    analog.
    *
    * Rows are tagged `_change_type` + `_snapshot_id`, ascending.
    * Folding the feed onto a checkpointed mirror (delete-by-key /
    * delete-by-row, then inserts, per snapshot) reproduces the
    * current snapshot exactly. Scale shape: per snapshot the feed
    * reads only that snapshot's added files; position-delete
    * pre-images scan only the TARGETED data files with a
    * |delete rows| join — never the table.
    */
  def changeFeedSince(spark: SparkSession, tablePath: String,
      sinceSnapshotId: Long): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val range = chainSince(spark, tablePath, sinceSnapshotId)
    lazy val idToName = schemaFieldNames(spark, tablePath)
    val pieces = Seq.newBuilder[DataFrame]
    range.foreach { s =>
      if (s.operation != "replace") {
        val added = manifestsOf(spark, resolve(tablePath, s.manifestList))
          .filter { case (_, addedBy, _, _) => addedBy.contains(s.id) }
          .flatMap { case (mpath, _, _, _) =>
            manifestEntries(spark, resolve(tablePath, mpath)).filter(_.status == 1)
          }
        val dataFiles = added.filter(_.content == 0).map(_.filePath).distinct
        val eqFiles = added.filter(_.content == 2)
        // v3 DELETION VECTORS: a new DV is a SUPERSET of the file's
        // previous deletes (spec supersede rule), so this snapshot's
        // delta is the POSITION DIFF vs the parent snapshot's deletes
        // — exactly the Delta CDF DV-diff shape. Pre-images scan only
        // the TARGETED files at the diffed positions.
        val dvAdded = added.filter(e => e.content == 1 && e.contentOffset.isDefined)
        if (dvAdded.nonEmpty) {
          val parent = s.parentId.getOrElse(throw new IllegalStateException(
            s"$tablePath: snapshot ${s.id} adds deletion vectors but has no parent — " +
              "their pre-images are undefined; refusing"))
          val (allSnaps, _) = snapshotLog(spark, tablePath)
          val parentSnap = allSnaps.find(_.id == parent).getOrElse(
            throw new IllegalStateException(
              s"$tablePath: parent snapshot $parent missing from the log"))
          val prevPlan = planFilesOf(spark, tablePath, parentSnap)
          val newDvs = dvAdded.map(e => DvRef(e.filePath, e.contentOffset.get,
            e.contentSize.get, e.referencedDataFile.getOrElse(
              throw new IllegalStateException(
                s"$tablePath: DV ${e.filePath} names no referenced data file; refusing"))))
          val newPos = dvPositionsDf(spark, tablePath, newDvs)
          val prevDv =
            if (prevPlan.deletionVectors.isEmpty) None
            else Some(dvPositionsDf(spark, tablePath, prevPlan.deletionVectors))
          val prevParquet =
            if (prevPlan.positionDeletes.isEmpty) None
            else Some(spark.read
              .parquet(prevPlan.positionDeletes.map(resolve(tablePath, _)): _*)
              .select(
                ScanPaths.normalizeMetaColumn(col("file_path"), tablePath).as("_g_file"),
                col("pos").cast("long").as("_g_pos")))
          val prevDels = (prevDv, prevParquet) match {
            case (Some(a), Some(b)) => Some(a.unionByName(b))
            case (a, b) => a.orElse(b)
          }
          val delta = prevDels match {
            case Some(d) => newPos.join(d, Seq("_g_file", "_g_pos"), "left_anti")
            case None => newPos
          }
          val targeted = newDvs.map(_.referencedDataFile).distinct
          val rows = spark.read.parquet(targeted.map(resolve(tablePath, _)): _*)
            .withColumn("_g_file", ScanPaths.normalizeScan(col("_metadata.file_path")))
            .withColumn("_g_pos", col("_metadata.row_index").cast("long"))
            .join(delta, Seq("_g_file", "_g_pos"), "left_semi")
            .drop("_g_file", "_g_pos")
          pieces += rows
            .withColumn("_change_type", lit("delete"))
            .withColumn("_snapshot_id", lit(s.id))
        }
        val posFiles = added.filter(e => e.content == 1 && e.contentOffset.isEmpty)
          .map(_.filePath).distinct
        if (dataFiles.nonEmpty)
          pieces += spark.read.parquet(dataFiles.map(resolve(tablePath, _)): _*)
            .withColumn("_change_type", lit("insert"))
            .withColumn("_snapshot_id", lit(s.id))
        if (eqFiles.nonEmpty) {
          eqFiles.map(_.equalityIds).distinct.foreach { ids =>
            ids.foreach(id => if (!idToName.contains(id)) throw new IllegalStateException(
              s"$tablePath: equality-delete in snapshot ${s.id} names field id $id, " +
                "which the table schema does not declare; refusing"))
          }
          pieces += spark.read
            .parquet(eqFiles.map(e => resolve(tablePath, e.filePath)).distinct: _*)
            .withColumn("_change_type", lit("delete"))
            .withColumn("_snapshot_id", lit(s.id))
        }
        if (posFiles.nonEmpty) {
          // pre-images: scan only the TARGETED data files (the
          // manifest-recorded paths the delete file names), keep
          // exactly the deleted positions
          val delRaw = spark.read.parquet(posFiles.map(resolve(tablePath, _)): _*)
          val targeted = delRaw.select("file_path").distinct()
            .collect().map(_.getString(0)).toSeq
          if (targeted.nonEmpty) {
            val dels = delRaw.select(
              ScanPaths.normalizeMetaColumn(col("file_path"), tablePath).as("_g_file"),
              col("pos").cast("long").as("_g_pos"))
            val rows = spark.read.parquet(targeted.map(resolve(tablePath, _)): _*)
              .withColumn("_g_file", ScanPaths.normalizeScan(col("_metadata.file_path")))
              .withColumn("_g_pos", col("_metadata.row_index"))
              .join(broadcast(dels), Seq("_g_file", "_g_pos"), "left_semi")
              .drop("_g_file", "_g_pos")
            pieces += rows
              .withColumn("_change_type", lit("delete"))
              .withColumn("_snapshot_id", lit(s.id))
          }
        }
      }
    }
    val parts = pieces.result()
    if (parts.isEmpty) throw new IllegalArgumentException(
      s"$tablePath: snapshots after $sinceSnapshotId carry no logical changes")
    val feed = parts.reduce(_.unionByName(_, allowMissingColumns = true))
    // stable column order: data columns (schema order), then the tags
    val dataCols = feed.columns.filterNot(c => c == "_change_type" || c == "_snapshot_id")
    feed.select((dataCols :+ "_change_type" :+ "_snapshot_id").map(col).toIndexedSeq: _*)
  }
}
