package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** READ-ONLY adapter for externally-written Delta Lake tables — the
  * "point the engine at an EXISTING lakehouse table" entry point the
  * reference's loader provides for Hudi (template.py:207-217 reads an
  * existing table by path; generate_hudi_table.py writes one). graft's
  * own tables use the versioned-parquet layout; this reader closes the
  * interop gap for the one open format whose log is plain
  * parquet + JSON, implemented from the PUBLIC Delta transaction-log
  * protocol (delta.io PROTOCOL.md): commits are
  * `_delta_log/<version%020d>.json` files of line-delimited actions
  * (`add`/`remove`/`metaData`/`protocol`/`commitInfo`), optionally
  * compacted into `<version%020d>.checkpoint.parquet` referenced by
  * `_last_checkpoint`.
  *
  * Scale shape — the same one Delta itself has:
  *  - log replay is DRIVER-SIDE METADATA, bounded by commits since
  *    the last checkpoint (the checkpoint is read as parquet, one
  *    distributed scan of a files-count-sized table);
  *  - data reads are ordinary distributed parquet scans of EXACTLY
  *    the active files, so pushdown/pruning/codegen all apply; a
  *    100 TB table costs its matching files, never a directory
  *    listing of the data dir (the log IS the listing);
  *  - partitioned tables read per-partition file groups with the
  *    partition values attached as literal columns (typed from the
  *    table's metaData schema) — the union is bounded by |distinct
  *    partitions touched|, and partition-pruning callers filter the
  *    action list BEFORE any data I/O via [[activeFiles]].
  *
  * Snapshot semantics: replay checkpoint + JSON commits in version
  * order; `add` activates a path, `remove` deactivates it; the
  * snapshot is the active set. Incremental semantics (the Hudi
  * incremental-read analog the reference's checkpointed consumer
  * uses): files ADDED with `dataChange=true` in commits
  * `sinceVersion+1..latest` — a commit that also removes data files
  * with `dataChange=true` is a rewrite/delete, which an append-scoped
  * incremental read must refuse LOUDLY rather than silently
  * double-read or miss (same contract as IncrementalReader on graft's
  * own tables). Compaction commits (`dataChange=false`) are correctly
  * ignored.
  */
object DeltaTableReader {

  private val mapper = new ObjectMapper()

  /** One file action from the log. `partitionValues` are the raw
    * string-encoded values from the protocol.
    */
  final case class FileAction(
      path: String,
      partitionValues: Map[String, String],
      dataChange: Boolean)

  final case class Snapshot(
      version: Long,
      active: Seq[FileAction],
      partitionColumns: Seq[String],
      schemaJson: Option[String])

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(tablePath: String): Path = new Path(tablePath, "_delta_log")

  private def versionOf(name: String): Option[Long] = {
    val base = name.stripSuffix(".json")
    if (name.endsWith(".json") && base.forall(_.isDigit)) Some(base.toLong) else None
  }

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private def partValuesOf(node: JsonNode): Map[String, String] = {
    val pv = node.get("partitionValues")
    if (pv == null || !pv.isObject) Map.empty
    else {
      val b = Map.newBuilder[String, String]
      val it = pv.fields()
      while (it.hasNext) {
        val e = it.next()
        if (!e.getValue.isNull) b += (e.getKey -> e.getValue.asText())
      }
      b.result()
    }
  }

  private def fileActionOf(node: JsonNode): FileAction = FileAction(
    path = node.get("path").asText(),
    partitionValues = partValuesOf(node),
    dataChange = Option(node.get("dataChange")).forall(_.asBoolean(true)))

  /** Features a plain file-scan reader CANNOT honor silently:
    * deletion vectors mask rows inside files (scanning the file
    * over-returns deleted rows) and column mapping renames physical
    * parquet columns (scanning returns the wrong schema). Real tables
    * advertise them in the protocol's readerFeatures and per-add
    * `deletionVector` fields — refuse LOUDLY on any of them.
    */
  private def refuseUnsupported(node: JsonNode, tablePath: String): Unit = {
    if (node.has("add")) {
      val dv = node.get("add").get("deletionVector")
      if (dv != null && !dv.isNull) throw new IllegalStateException(
        s"$tablePath: add action carries a deletion vector — a plain scan would " +
          "silently return deleted rows; this reader refuses DV tables")
    }
    if (node.has("protocol")) {
      val rf = node.get("protocol").get("readerFeatures")
      if (rf != null && rf.isArray) {
        val feats = scala.collection.mutable.Set.empty[String]
        rf.forEach(f => feats += f.asText())
        val unsupported = feats.intersect(Set("deletionVectors", "columnMapping"))
        if (unsupported.nonEmpty) throw new IllegalStateException(
          s"$tablePath: protocol requires reader features ${unsupported.mkString(", ")} — " +
            "a plain parquet scan cannot honor them; this reader refuses")
      }
    }
    if (node.has("metaData")) {
      val conf = node.get("metaData").get("configuration")
      if (conf != null && conf.isObject) {
        val mode = Option(conf.get("delta.columnMapping.mode")).map(_.asText())
        if (mode.exists(m => m != "none")) throw new IllegalStateException(
          s"$tablePath: delta.columnMapping.mode=${mode.get} — physical parquet column " +
            "names differ from the table schema; a plain scan would return the wrong " +
            "columns; this reader refuses")
      }
    }
  }

  /** Committed log versions present as JSON files, ascending. */
  def versions(spark: SparkSession, tablePath: String): Seq[Long] = {
    val dir = logDir(tablePath)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) throw new IllegalArgumentException(
      s"$tablePath is not a Delta table: no _delta_log directory")
    fs.listStatus(dir).toIndexedSeq.flatMap(st => versionOf(st.getPath.getName)).sorted
  }

  /** Replay the log to the latest snapshot state: checkpoint (if any)
    * + JSON commits after it, in version order.
    */
  def snapshotState(spark: SparkSession, tablePath: String): Snapshot = {
    val dir = logDir(tablePath)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) throw new IllegalArgumentException(
      s"$tablePath is not a Delta table: no _delta_log directory")

    // checkpoint base, if advertised
    val lastCkpt = new Path(dir, "_last_checkpoint")
    val ckptVersion: Option[Long] =
      if (!fs.exists(lastCkpt)) None
      else Some(mapper.readTree(readText(fs, lastCkpt)).get("version").asLong())

    val active = scala.collection.mutable.LinkedHashMap.empty[String, FileAction]
    var partCols: Seq[String] = Nil
    var schemaJson: Option[String] = None

    ckptVersion.foreach { v =>
      // single-file checkpoints are `<v>.checkpoint.parquet`; large
      // tables write MULTI-PART `<v>.checkpoint.<i>.<n>.parquet` —
      // all parts together are the checkpoint, read as one scan
      val single = new Path(dir, f"$v%020d.checkpoint.parquet")
      val ckptFiles: Seq[String] =
        if (fs.exists(single)) Seq(single.toString)
        else fs.listStatus(dir).toIndexedSeq
          .map(_.getPath)
          .filter(p => p.getName.startsWith(f"$v%020d.checkpoint.") &&
            p.getName.endsWith(".parquet"))
          .map(_.toString)
      if (ckptFiles.isEmpty) throw new IllegalStateException(
        s"$tablePath: _last_checkpoint names version $v but no checkpoint parquet exists")
      val rows = spark.read.parquet(ckptFiles: _*)
      val cols = rows.columns.toSet
      if (cols.contains("metaData")) {
        rows.select("metaData").where(col("metaData").isNotNull).collect().foreach { r =>
          val md = r.getStruct(0)
          val idx = md.schema.fieldNames.indexOf("partitionColumns")
          if (idx >= 0 && !md.isNullAt(idx)) partCols = md.getSeq[String](idx)
          val sIdx = md.schema.fieldNames.indexOf("schemaString")
          if (sIdx >= 0 && !md.isNullAt(sIdx)) schemaJson = Some(md.getString(sIdx))
        }
      }
      if (cols.contains("add")) {
        rows.select("add.path", "add.partitionValues")
          .where(col("path").isNotNull).collect().foreach { r =>
            val pv = if (r.isNullAt(1)) Map.empty[String, String]
              else r.getMap[String, String](1).toMap
            active(r.getString(0)) = FileAction(r.getString(0), pv, dataChange = true)
          }
      }
      // a checkpoint's remove actions are expired tombstones — files
      // already absent from its add set; nothing to subtract
    }

    val tail = versions(spark, tablePath).filter(v => ckptVersion.forall(v > _))
    var latest = ckptVersion.getOrElse(-1L)
    tail.foreach { v =>
      latest = v
      readText(fs, new Path(dir, f"$v%020d.json")).split('\n').filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        refuseUnsupported(node, tablePath)
        if (node.has("add")) {
          val a = fileActionOf(node.get("add"))
          active(a.path) = a
        } else if (node.has("remove")) {
          active.remove(node.get("remove").get("path").asText()): Unit
        } else if (node.has("metaData")) {
          val md = node.get("metaData")
          val pc = md.get("partitionColumns")
          if (pc != null && pc.isArray) {
            val b = Seq.newBuilder[String]
            pc.forEach(n => b += n.asText())
            partCols = b.result()
          }
          if (md.has("schemaString")) schemaJson = Some(md.get("schemaString").asText())
        }
      }
    }
    if (latest < 0) throw new IllegalArgumentException(
      s"$tablePath: empty _delta_log (no checkpoint, no commits)")
    Snapshot(latest, active.values.toIndexedSeq, partCols, schemaJson)
  }

  /** Latest committed version number. */
  def latestVersion(spark: SparkSession, tablePath: String): Long =
    snapshotState(spark, tablePath).version

  /** The active file actions — exposed so partition-pruning callers
    * can filter on `partitionValues` BEFORE any data I/O.
    */
  def activeFiles(spark: SparkSession, tablePath: String): Seq[FileAction] =
    snapshotState(spark, tablePath).active

  /** Spark type of a partition column, from the table's metaData
    * schemaString (a Spark-JSON struct). Falls back to string.
    */
  private def partitionType(schemaJson: Option[String], name: String): org.apache.spark.sql.types.DataType =
    schemaJson.flatMap { js =>
      scala.util.Try(org.apache.spark.sql.types.DataType.fromJson(js)).toOption
    } match {
      case Some(st: org.apache.spark.sql.types.StructType) if st.fieldNames.contains(name) =>
        st(name).dataType
      case _ => org.apache.spark.sql.types.StringType
    }

  private def readFiles(
      spark: SparkSession,
      tablePath: String,
      files: Seq[FileAction],
      partitionColumns: Seq[String],
      schemaJson: Option[String]): DataFrame = {
    def abs(p: String): String =
      if (p.startsWith("/") || p.contains("://")) p else s"$tablePath/$p"
    if (files.isEmpty)
      throw new IllegalArgumentException(s"$tablePath: snapshot has no active data files")
    if (partitionColumns.isEmpty) {
      spark.read.parquet(files.map(f => abs(f.path)): _*)
    } else {
      // per-partition file groups with typed literal partition columns
      // (the protocol strips partition values out of the data files)
      val groups = files.groupBy(f => partitionColumns.map(c => f.partitionValues.get(c)))
      val parts = groups.toSeq.sortBy(_._1.toString).map { case (vals, fs0) =>
        val df = spark.read.parquet(fs0.map(f => abs(f.path)): _*)
        partitionColumns.zip(vals).foldLeft(df) { case (acc, (c, v)) =>
          val typed: Column = v match {
            case Some(s) => lit(s).cast(partitionType(schemaJson, c))
            case None => lit(null).cast(partitionType(schemaJson, c))
          }
          acc.withColumn(c, typed)
        }
      }
      parts.reduce(_ unionByName _)
    }
  }

  /** Snapshot read: the latest version's active files as a DataFrame. */
  def snapshot(spark: SparkSession, tablePath: String): DataFrame = {
    val s = snapshotState(spark, tablePath)
    readFiles(spark, tablePath, s.active, s.partitionColumns, s.schemaJson)
  }

  /** Incremental read: rows ADDED by commits `sinceVersion+1..latest`
    * (`dataChange=true` adds), tagged with `_commit_version`. A commit
    * in that range that REMOVES data files (`dataChange=true`) is a
    * rewrite/delete and refuses loudly — an append-scoped incremental
    * read cannot represent it (use [[snapshot]] or a CDC source).
    * Compaction commits (`dataChange=false`) are skipped entirely.
    */
  def incrementalSince(spark: SparkSession, tablePath: String, sinceVersion: Long): DataFrame = {
    val dir = logDir(tablePath)
    val fs = fsOf(spark, dir)
    val state = snapshotState(spark, tablePath) // partition cols + schema
    val vs = versions(spark, tablePath).filter(_ > sinceVersion)
    val adds = Seq.newBuilder[(Long, FileAction)]
    vs.foreach { v =>
      readText(fs, new Path(dir, f"$v%020d.json")).split('\n').filter(_.nonEmpty).foreach { line =>
        val node = mapper.readTree(line)
        refuseUnsupported(node, tablePath)
        if (node.has("remove") &&
            Option(node.get("remove").get("dataChange")).forall(_.asBoolean(true)))
          throw new IllegalStateException(
            s"$tablePath: commit $v removes data files — not an append; " +
              s"incremental read since $sinceVersion cannot represent rewrites/deletes " +
              "(read the snapshot instead, or consume a CDC feed)")
        if (node.has("add")) {
          val a = fileActionOf(node.get("add"))
          if (a.dataChange) adds += ((v, a))
        }
      }
    }
    val byVersion = adds.result().groupBy(_._1)
    if (byVersion.isEmpty)
      throw new IllegalArgumentException(
        s"$tablePath: no data-changing commits after version $sinceVersion " +
          s"(latest: ${state.version})")
    byVersion.toSeq.sortBy(_._1).map { case (v, fas) =>
      readFiles(spark, tablePath, fas.map(_._2), state.partitionColumns, state.schemaJson)
        .withColumn("_commit_version", lit(v))
    }.reduce(_ unionByName _)
  }
}
