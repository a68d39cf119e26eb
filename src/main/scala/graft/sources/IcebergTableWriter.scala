package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** APPEND-ONLY writer for Apache Iceberg v2 tables readable by
  * external engines — the third leg of the writer-side interop
  * surface beside [[DeltaTableWriter]] and [[HudiTableWriter]],
  * implemented from the PUBLIC Iceberg table spec the reader is
  * locked against (iceberg.apache.org/spec):
  *
  *  - data parquet lands under `data/` with UUID names;
  *  - each commit writes ONE Avro manifest of `status=added` entries
  *    (real per-file `record_count` read from the parquet footers —
  *    planning metadata external engines trust), a manifest LIST
  *    that reuses every previous manifest plus the new one (the
  *    manifest-reuse shape real writers produce, what makes
  *    incremental readers filter on `added_snapshot_id`), and a new
  *    `vN.metadata.json` carrying the full snapshot log with
  *    parent-snapshot links;
  *  - commit publication is an exclusive-create CAS on
  *    `vN.metadata.json` — the filesystem-catalog protocol (the racer
  *    that lost re-reads and retries at N+1); `version-hint.text`
  *    re-points after the fact (advisory, as in the spec).
  *
  * Scale shape: the data write is distributed; manifest/metadata
  * writes are driver metadata bounded by |files this commit| and
  * |snapshots|. Append-only by design: updates/deletes are the
  * versioned-table machinery's job; appends are the subset every
  * Iceberg reader — snapshot, incremental, time travel — consumes
  * identically.
  */
object IcebergTableWriter {

  val MaxCommitAttempts: Int = 20

  private val listSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long","default":0},
      |{"name":"added_snapshot_id","type":["null","long"],"default":null},
      |{"name":"content","type":"int","default":0}]}""".stripMargin)

  private val entrySchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"content","type":"int","default":0},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string","default":"PARQUET"},
      |  {"name":"record_count","type":"long","default":0}]}}]}""".stripMargin)

  private def writeAvro(conf: org.apache.hadoop.conf.Configuration, path: Path,
      schema: Schema, records: Seq[GenericRecord]): Unit = {
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, true)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out)
    try records.foreach(w.append) finally w.close()
  }

  /** Land `df` as data files; returns (relPath, recordCount) — counts
    * read from the landed parquet footers, not estimated.
    */
  private def writeDataFiles(df: DataFrame, tablePath: String): Seq[(String, Long)] = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tablePath).getFileSystem(conf)
    val stage = new Path(tablePath, s".graft-stage-${java.util.UUID.randomUUID()}")
    df.write.parquet(stage.toString)
    val landed = Seq.newBuilder[(String, Long)]
    fs.listStatus(stage).filter(_.getPath.getName.endsWith(".parquet")).foreach { st =>
      val rel = s"data/${java.util.UUID.randomUUID()}.parquet"
      val dst = new Path(tablePath, rel)
      fs.mkdirs(dst.getParent)
      if (!fs.rename(st.getPath, dst)) throw new IllegalStateException(
        s"$tablePath: failed to land data file $rel")
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(dst, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val n = try r.getRecordCount finally r.close()
      landed += ((rel, n))
    }
    fs.delete(stage, true)
    val files = landed.result()
    if (files.isEmpty) throw new IllegalArgumentException(
      s"$tablePath: the DataFrame wrote no data files (empty input?)")
    files
  }

  private def manifestOf(conf: org.apache.hadoop.conf.Configuration, tablePath: String,
      snapshotId: Long, files: Seq[(String, Long)]): String = {
    val rel = s"metadata/m-$snapshotId-${java.util.UUID.randomUUID()}.avro"
    val records = files.map { case (path, n) =>
      val df = new GenericData.Record(entrySchema.getField("data_file").schema())
      df.put("content", 0); df.put("file_path", path)
      df.put("file_format", "PARQUET"); df.put("record_count", n)
      val r = new GenericData.Record(entrySchema)
      r.put("status", 1); r.put("snapshot_id", snapshotId); r.put("data_file", df)
      r
    }
    writeAvro(conf, new Path(tablePath, rel), entrySchema, records)
    rel
  }

  private def snapshotJson(id: Long, parent: Option[Long], listRel: String): String = {
    val p = parent.map(v => s""""parent-snapshot-id":$v,""").getOrElse("")
    s"""{"snapshot-id":$id,$p"timestamp-ms":${System.currentTimeMillis()},""" +
      s""""summary":{"operation":"append"},"manifest-list":"$listRel"}"""
  }

  /** One commit: new manifest + manifest list (previous manifests
    * reused) + vN metadata under the exclusive-create CAS. Returns
    * the new snapshot id.
    */
  private def commit(df: DataFrame, tablePath: String): Long = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tablePath).getFileSystem(conf)
    val files = writeDataFiles(df, tablePath)
    var attempt = 0
    while (attempt < MaxCommitAttempts) {
      // re-read the current state each attempt (CAS loser rebases)
      val exists = fs.exists(new Path(tablePath, "metadata")) &&
        fs.listStatus(new Path(tablePath, "metadata"))
          .exists(_.getPath.getName.endsWith(".metadata.json"))
      val (prevSnaps, prevManifests, prevVersion, parentId) =
        if (!exists) (Seq.empty[String], Seq.empty[(String, Long, Int)], 0L, None)
        else {
          val (snaps, currentId) = IcebergTableReader.snapshotLog(spark, tablePath)
          val current = snaps.find(_.id == currentId).get
          val manifests = IcebergTableReader.manifestListEntries(spark, tablePath,
            current.manifestList)
          val version = IcebergTableReader.currentMetadataVersion(spark, tablePath)
          // snapshot records re-serialize with ids/parents/lists
          // preserved; timestamps re-stamp (opaque to readers)
          (snaps.map(s => snapshotJson(s.id, s.parentId, s.manifestList)),
            manifests, version, Some(currentId))
        }
      val newId = parentId.getOrElse(0L) + 1L
      val manifestRel = manifestOf(conf, tablePath, newId, files)
      val listRel = s"metadata/snap-$newId-${java.util.UUID.randomUUID()}.avro"
      val listRecords = (prevManifests :+ ((manifestRel, newId, 0)))
        .map { case (mp, addedBy, content) =>
          val r = new GenericData.Record(listSchema)
          r.put("manifest_path", mp); r.put("manifest_length", 0L)
          r.put("added_snapshot_id", addedBy); r.put("content", content)
          r
        }
      writeAvro(conf, new Path(tablePath, listRel), listSchema, listRecords)
      val snapsJson = (prevSnaps :+ snapshotJson(newId, parentId, listRel)).mkString(",")
      val metaJson =
        s"""{"format-version":2,"table-uuid":"graft","location":"$tablePath",""" +
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

  /** Create a NEW Iceberg table at `tablePath`; refuses an existing
    * one. Returns the first snapshot id.
    */
  def create(df: DataFrame, tablePath: String): Long = {
    val fs = new Path(tablePath).getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val metaDir = new Path(tablePath, "metadata")
    if (fs.exists(metaDir) &&
        fs.listStatus(metaDir).exists(_.getPath.getName.endsWith(".metadata.json")))
      throw new IllegalArgumentException(s"$tablePath is already an Iceberg table — use append")
    commit(df, tablePath)
  }

  /** Append `df` as a new snapshot on the parent chain; columns must
    * match the table's existing data columns (order-free).
    */
  def append(df: DataFrame, tablePath: String): Long = {
    val existing = IcebergTableReader.snapshot(df.sparkSession, tablePath)
    require(df.columns.toSet == existing.columns.toSet,
      s"$tablePath: appended columns ${df.columns.sorted.mkString(",")} != table columns " +
        s"${existing.columns.sorted.mkString(",")} — appends must match the existing schema")
    commit(df.select(existing.columns.map(org.apache.spark.sql.functions.col): _*), tablePath)
  }
}
