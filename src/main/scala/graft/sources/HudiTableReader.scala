package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** READ-ONLY adapter for externally-written Apache Hudi COPY-ON-WRITE
  * tables — the reference's OWN entry point: template.py:207-217
  * reads an existing Hudi table by path (snapshot) and
  * template.py:226-281 pulls it incrementally from a checkpointed
  * commit time. Implemented from the PUBLIC Hudi layout (hudi.apache.org
  * timeline + file-layout docs):
  *
  *  - `.hoodie/<instantTime>.commit` — one COMPLETED commit per file,
  *    JSON whose `partitionToWriteStats` lists, per partition, the
  *    file groups (`fileId`) and base-file `path`s the commit wrote;
  *    `.requested`/`.inflight` siblings are in-flight and ignored;
  *  - COW base files are immutable parquet; an update REWRITES the
  *    whole file group under the new instant, carrying unchanged rows
  *    forward with their ORIGINAL `_hoodie_commit_time` and stamping
  *    changed/new rows with the new instant — which is exactly what
  *    makes incremental pull a per-row filter;
  *  - the SNAPSHOT is, per file group, the base file of the LATEST
  *    completed instant that wrote it (the latest file slice);
  *  - the INCREMENTAL read since instant T is: file groups touched by
  *    commits > T, their latest slice, rows filtered to
  *    `_hoodie_commit_time > T` (rows merely carried forward keep
  *    their old stamp and drop out) — the contract the reference's
  *    `HUDIIncrementalReader` consumes.
  *
  * Scale shape — identical to Hudi's own planner: timeline replay is
  * driver-side metadata bounded by completed commits; data reads are
  * distributed parquet scans of exactly the active file slices (at
  * most one base file per file group), and the incremental read scans
  * only groups touched after the checkpoint. Partition columns need
  * no reconstruction: Hudi COW data files carry the full row schema
  * (plus the `_hoodie_*` meta columns).
  *
  * MERGE-ON-READ tables serve the REAL-TIME view: per file group, the
  * latest base file (if any) merged with the log files appended after
  * it ([[HudiLog]] blocks — upserts latest-wins by record key, delete
  * blocks honored), which is what `spark.read.format("hudi")` on a MOR
  * table means (template.py:304's entry point). Scale shape: only
  * file groups WITH pending logs pay the merge (a record-key window
  * over base+log rows of those groups); compacted groups stream
  * through as plain scans — the same split Hudi's own realtime reader
  * makes. COW-only paths (point-in-time, incremental) keep refusing
  * MOR timelines; `readOptimized` stays the explicit stale opt-in.
  */
object HudiTableReader {

  private val mapper = new ObjectMapper()

  /** One file-group write from a commit's stats; `partition` is the
    * partitionToWriteStats key the write landed under ("" for
    * unpartitioned tables). */
  final case class SliceWrite(instant: String, fileId: String, path: String,
      partition: String = "")

  private[sources] def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def hoodieDir(tablePath: String): Path = new Path(tablePath, ".hoodie")

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Completed instants, ascending (Hudi instant times are
    * lexicographically ordered timestamps), tagged by kind:
    * ordinary `commit`s, clustering `replacecommit`s and — when
    * `allowMor` — MOR `deltacommit`s.
    */
  private[sources] def timelineInstants(spark: SparkSession, tablePath: String,
      allowMor: Boolean): Seq[(String, String)] = {
    val dir = hoodieDir(tablePath)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) throw new IllegalArgumentException(
      s"$tablePath is not a Hudi table: no .hoodie directory")
    val names = fs.listStatus(dir).toIndexedSeq.map(_.getPath.getName)
    // this reader discovers file slices by replaying ACTIVE commit
    // metadata; once the archival service has rotated instants into
    // .hoodie/archived, file groups written only by archived instants
    // are invisible to that replay and every read would silently MISS
    // them — refuse loudly (the honest contract; reading an archived
    // timeline needs listing-based slice discovery or the metadata
    // table)
    if (hasArchivedTimeline(spark, tablePath))
      throw new IllegalStateException(
        s"$tablePath carries an archived timeline (.hoodie/archived) — file groups " +
          "written by archived instants are invisible to active-commit replay and " +
          "would be silently missed; this reader refuses")
    if (!allowMor) {
      if (names.exists(_.endsWith(".deltacommit")))
        throw new IllegalStateException(
          s"$tablePath has deltacommit instants — a MERGE-ON-READ table; this COW-only " +
            "path cannot merge log files (a plain scan would silently miss updates); " +
            "use snapshot for the merged real-time view or readOptimized for the " +
            "explicit base-files-only view")
      // hoodie.properties declares the table type up front — a MOR table
      // with no deltacommits YET would otherwise slip through and start
      // silently missing updates on its first delta write
      if (declaresMor(spark, tablePath))
        throw new IllegalStateException(
          s"$tablePath declares hoodie.table.type=MERGE_ON_READ — this COW-only path " +
            "refuses (log files would be silently ignored); use snapshot for the merged " +
            "real-time view or readOptimized for the explicit base-files-only view")
    }
    val live = names.filter(n => !n.contains(".requested") && !n.contains(".inflight"))
    (live.filter(_.endsWith(".commit")).map(n => (n.stripSuffix(".commit"), "commit")) ++
      live.filter(_.endsWith(".replacecommit"))
        .map(n => (n.stripSuffix(".replacecommit"), "replacecommit")) ++
      (if (allowMor)
        live.filter(_.endsWith(".deltacommit"))
          .map(n => (n.stripSuffix(".deltacommit"), "deltacommit"))
      else Nil))
      .sortBy(_._1)
  }

  private def declaresMor(spark: SparkSession, tablePath: String): Boolean = {
    val props = new Path(hoodieDir(tablePath), "hoodie.properties")
    val fs = fsOf(spark, props)
    fs.exists(props) &&
      readText(fs, props).linesIterator.exists(l =>
        l.replace(" ", "").startsWith("hoodie.table.type=MERGE_ON_READ"))
  }

  /** True when the table carries an archived timeline — instants
    * rotated out of the active `.hoodie` listing into
    * `.hoodie/archived` by Hudi's timeline archival service.
    */
  private def hasArchivedTimeline(spark: SparkSession, tablePath: String): Boolean = {
    val arch = new Path(hoodieDir(tablePath), "archived")
    val fs = fsOf(spark, arch)
    fs.exists(arch) && fs.listStatus(arch).nonEmpty
  }

  /** Completed COW instants (`commit` / `replacecommit`), ascending.
    * Refuses MOR timelines — their snapshot needs log-merge.
    */
  def instants(spark: SparkSession, tablePath: String): Seq[(String, String)] =
    timelineInstants(spark, tablePath, allowMor = false)

  /** Completed ordinary-commit instants, ascending. */
  def commits(spark: SparkSession, tablePath: String): Seq[String] =
    instants(spark, tablePath).filter(_._2 == "commit").map(_._1)

  /** The latest completed instant of ANY kind (deltacommits included)
    * — the head token a checkpointed consumer records. */
  def latestInstant(spark: SparkSession, tablePath: String): String =
    timelineInstants(spark, tablePath, allowMor = true).lastOption.map(_._1)
      .getOrElse(throw new IllegalArgumentException(
        s"$tablePath: no completed instants in .hoodie"))

  /** Every file-group write of one completed instant (`.commit` or
    * `.replacecommit` meta file, per `kind`).
    */
  private[sources] def writesOf(fs: FileSystem, tablePath: String, instant: String,
      kind: String = "commit"): Seq[SliceWrite] = {
    val text = readText(fs, new Path(hoodieDir(tablePath), s"$instant.$kind"))
    val node = mapper.readTree(text)
    if (node == null || node.isMissingNode) throw new IllegalStateException(
      s"$tablePath: $instant.$kind carries no commit metadata (empty/corrupt file) — " +
        "its writes cannot be replayed; refusing rather than silently missing them")
    val stats = node.get("partitionToWriteStats")
    if (stats == null || !stats.isObject) Nil
    else {
      val b = Seq.newBuilder[SliceWrite]
      stats.fields().forEachRemaining { e =>
        e.getValue.forEach { (w: JsonNode) =>
          b += SliceWrite(instant, w.get("fileId").asText(), w.get("path").asText(),
            e.getKey)
        }
      }
      b.result()
    }
  }

  /** File-group ids a replacecommit REPLACED (clustering input groups
    * — they stop existing at that instant).
    */
  private[sources] def replacedIdsOf(fs: FileSystem, tablePath: String, instant: String): Set[String] = {
    val node = mapper.readTree(
      readText(fs, new Path(hoodieDir(tablePath), s"$instant.replacecommit")))
    val rep = node.get("partitionToReplaceFileIds")
    if (rep == null || !rep.isObject) Set.empty
    else {
      val b = Set.newBuilder[String]
      rep.fields().forEachRemaining(e => e.getValue.forEach(id => b += id.asText()))
      b.result()
    }
  }

  /** The latest file slice per LIVE file group at the latest instant —
    * the COW snapshot's file set. Replay in instant order: an ordinary
    * commit repoints its groups' slices; a clustering replacecommit
    * DROPS the replaced groups and adds the clustered ones (reading
    * both would double every clustered row).
    */
  def activeSlices(spark: SparkSession, tablePath: String): Seq[SliceWrite] =
    slicesUpTo(spark, tablePath, None)

  private def slicesUpTo(spark: SparkSession, tablePath: String,
      upTo: Option[String]): Seq[SliceWrite] = {
    val fs = fsOf(spark, hoodieDir(tablePath))
    val latest = scala.collection.mutable.LinkedHashMap.empty[String, SliceWrite]
    instants(spark, tablePath)
      .filter { case (i, _) => upTo.forall(i <= _) }
      .foreach { case (instant, kind) =>
        if (kind == "replacecommit") replacedIdsOf(fs, tablePath, instant).foreach(latest.remove)
        writesOf(fs, tablePath, instant, kind).foreach(w => latest(w.fileId) = w)
      }
    if (latest.isEmpty) throw new IllegalArgumentException(
      upTo match {
        case Some(i) => s"$tablePath: no completed commits at or before instant $i"
        case None => s"$tablePath: no completed commits in .hoodie"
      })
    latest.values.toIndexedSeq
  }

  private def readPaths(spark: SparkSession, tablePath: String, slices: Seq[SliceWrite]): DataFrame =
    spark.read.parquet(slices.map(s => s"$tablePath/${s.path}"): _*)

  /** True when the timeline or hoodie.properties mark the table
    * MERGE-ON-READ (metadata listing only, no data I/O).
    */
  def isMor(spark: SparkSession, tablePath: String): Boolean = {
    val dir = hoodieDir(tablePath)
    val fs = fsOf(spark, dir)
    fs.exists(dir) &&
      (declaresMor(spark, tablePath) ||
        fs.listStatus(dir).exists(_.getPath.getName.endsWith(".deltacommit")))
  }

  /** One file group at the head of the timeline: its latest base file
    * (absent for log-only groups) and the log files appended AFTER
    * that base, in replay order.
    */
  final case class GroupSlices(fileId: String, base: Option[SliceWrite],
      logs: Seq[(String, String)]) // (instant, relPath)

  /** Replay the FULL timeline (commits, deltacommits, replacecommits)
    * into per-file-group state: a parquet write repoints the group's
    * base and CLEARS its pending logs (an ordinary commit, a MOR
    * compaction, or a deltacommit's first base file); a log-file write
    * appends to the group's pending logs; a clustering replacecommit
    * drops its replaced groups.
    */
  private[sources] def morGroups(spark: SparkSession, tablePath: String,
      upTo: Option[String] = None): Seq[GroupSlices] = {
    val fs = fsOf(spark, hoodieDir(tablePath))
    val state = scala.collection.mutable.LinkedHashMap.empty[String, GroupSlices]
    timelineInstants(spark, tablePath, allowMor = true)
      .filter { case (i, _) => upTo.forall(i <= _) }
      .foreach { case (instant, kind) =>
      if (kind == "replacecommit") replacedIdsOf(fs, tablePath, instant).foreach(state.remove)
      writesOf(fs, tablePath, instant, kind).foreach { w =>
        if (w.path.endsWith(".parquet")) state(w.fileId) = GroupSlices(w.fileId, Some(w), Nil)
        else {
          val cur = state.getOrElse(w.fileId, GroupSlices(w.fileId, None, Nil))
          state(w.fileId) = cur.copy(logs = cur.logs :+ ((instant, w.path)))
        }
      }
    }
    if (state.isEmpty) throw new IllegalArgumentException(upTo match {
      case Some(i) => s"$tablePath: no completed instants at or before $i"
      case None => s"$tablePath: no completed instants in .hoodie"
    })
    state.values.toIndexedSeq
  }

  /** One log-parse task shipped to executors. `ord` is the log file's
    * position in its group's replay order (1-based; base rows are 0).
    */
  private[sources] final case class LogTask(fileId: String, absPath: String, ord: Long)

  /** Record-level ordering: log file order, then block order within
    * the file, then record order within the block — later always wins
    * (Hudi's default overwrite-with-latest payload under commit-time
    * ordering). Base rows sit at ord 0.
    */
  private def recordOrd(fileOrd: Long, blockIdx: Int, recIdx: Int): Long = {
    require(blockIdx < (1 << 20) && recIdx < (1 << 20),
      s"log block/record index out of the 2^20 ordering envelope ($blockIdx/$recIdx)")
    (fileOrd << 40) | (blockIdx.toLong << 20) | recIdx.toLong
  }

  /** Parse the pending log files of `dirty` groups into rows shaped
    * by `schema` (+ `_g_ord`, `_g_del`, and `_g_fid` when `withFid`) —
    * parsing runs ON EXECUTORS through a broadcast Hadoop conf; the
    * driver never holds records.
    */
  private def logRows(spark: SparkSession, tablePath: String,
      dirty: Seq[GroupSlices], schema: org.apache.spark.sql.types.StructType,
      withFid: Boolean): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, LongType, StringType}
    val keyIdx = schema.fieldIndex("_hoodie_record_key")
    val outSchema0 = schema.add("_g_ord", LongType).add("_g_del", BooleanType)
    val outSchema = if (withFid) outSchema0.add("_g_fid", StringType) else outSchema0
    val tasks = dirty.flatMap { g =>
      g.logs.zipWithIndex.map { case ((_, rel), i) =>
        LogTask(g.fileId, s"$tablePath/$rel", (i + 1).toLong)
      }
    }
    val bcConf = spark.sparkContext.broadcast(
      new DeltaDv.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val nFields = schema.size
    spark.createDataset(tasks)(Encoders.product[LogTask])
      .repartition(math.max(1, math.min(tasks.size, spark.sparkContext.defaultParallelism)))
      .flatMap { t =>
        def shape(core: Seq[Any], ord: Long, del: Boolean): org.apache.spark.sql.Row =
          org.apache.spark.sql.Row.fromSeq(
            if (withFid) core :+ ord :+ del :+ t.fileId else core :+ ord :+ del)
        HudiLog.read(bcConf.value.value, t.absPath).iterator.zipWithIndex.flatMap {
          case (HudiLog.DataBlock(_, schemaJson, records), bi) =>
            val writer = new org.apache.avro.Schema.Parser().parse(schemaJson)
            records.iterator.zipWithIndex.map { case (bytes, ri) =>
              shape(HudiLog.decodeRow(bytes, writer, schema).toSeq,
                recordOrd(t.ord, bi, ri), del = false)
            }
          case (HudiLog.DeleteBlock(_, keys), bi) =>
            keys.iterator.zipWithIndex.map { case (k, ri) =>
              val vals = Array.fill[Any](nFields)(null)
              vals(keyIdx) = k
              shape(vals.toIndexedSeq, recordOrd(t.ord, bi, ri), del = true)
            }
        }
      }(Encoders.row(outSchema))
      .toDF()
  }

  /** Merge `dirty` groups' base + log rows: latest record per
    * `_hoodie_record_key` wins, tombstones drop. `keepFileId` threads
    * a `_g_fid` column through for the compactor. The shuffle is
    * bounded by the DIRTY groups' bytes — compacted groups never
    * enter it.
    */
  private[sources] def mergeDirtyGroups(spark: SparkSession, tablePath: String,
      dirty: Seq[GroupSlices], schema: org.apache.spark.sql.types.StructType,
      keepFileId: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cols = schema.fieldNames.toIndexedSeq
    val basePaths = dirty.flatMap(_.base).map(b => s"$tablePath/${b.path}")
    val tagged =
      if (!keepFileId) {
        val logs = logRows(spark, tablePath, dirty, schema, withFid = false)
        if (basePaths.isEmpty) logs
        else spark.read.parquet(basePaths: _*)
          .withColumn("_g_ord", lit(0L)).withColumn("_g_del", lit(false))
          .select((cols :+ "_g_ord" :+ "_g_del").map(col): _*)
          .unionByName(logs)
      } else {
        // base rows resolve their group via the file→fileId broadcast
        // map on the scan's metadata; log rows carry it in the task
        val logsF = logRows(spark, tablePath, dirty, schema, withFid = true)
        if (basePaths.isEmpty) logsF
        else {
          val fidRows = dirty.flatMap(g => g.base.map(b =>
            org.apache.spark.sql.Row(
              ScanPaths.normalizeDriver(s"$tablePath/${b.path}"), g.fileId)))
          import scala.jdk.CollectionConverters._
          val fidDf = spark.createDataFrame(fidRows.asJava,
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("_g_file",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("_g_fid",
                org.apache.spark.sql.types.StringType))))
          spark.read.parquet(basePaths: _*)
            .withColumn("_g_file", ScanPaths.normalizeScan(col("_metadata.file_path")))
            .join(broadcast(fidDf), Seq("_g_file"), "left")
            .drop("_g_file")
            .withColumn("_g_ord", lit(0L)).withColumn("_g_del", lit(false))
            .select((cols :+ "_g_ord" :+ "_g_del" :+ "_g_fid").map(col): _*)
            .unionByName(logsF)
        }
      }
    val w = Window.partitionBy(col("_hoodie_record_key")).orderBy(col("_g_ord").desc)
    val keep = if (keepFileId) cols :+ "_g_fid" else cols
    tagged
      .withColumn("_g_rn", row_number().over(w))
      .where(col("_g_rn") === 1 && !col("_g_del"))
      .select(keep.map(col): _*)
  }

  /** The table schema for a MOR merge: from the base files when any
    * exist, else from the first log data block's SCHEMA header (the
    * writer schema, driver-side metadata read of one small block).
    */
  private[sources] def morSchema(spark: SparkSession, tablePath: String,
      groups: Seq[GroupSlices]): org.apache.spark.sql.types.StructType = {
    val basePaths = groups.flatMap(_.base).map(b => s"$tablePath/${b.path}")
    if (basePaths.nonEmpty) spark.read.parquet(basePaths: _*).schema
    else {
      val firstLog = groups.flatMap(g => g.logs.headOption.map(l => s"$tablePath/${l._2}"))
        .headOption.getOrElse(throw new IllegalArgumentException(
          s"$tablePath: MOR table has neither base files nor log files"))
      val schemaJson = HudiLog.read(spark.sparkContext.hadoopConfiguration, firstLog)
        .collectFirst { case HudiLog.DataBlock(_, js, _) => js }
        .getOrElse(throw new IllegalStateException(
          s"$tablePath: first log file carries no data block to derive a schema from"))
      val avro = new org.apache.avro.Schema.Parser().parse(schemaJson)
      avroToStruct(avro)
    }
  }

  private def avroToStruct(avro: org.apache.avro.Schema): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    def typeOf(s: org.apache.avro.Schema): DataType = s.getType match {
      case org.apache.avro.Schema.Type.UNION =>
        typeOf(s.getTypes.asScala.find(_.getType != org.apache.avro.Schema.Type.NULL).get)
      case org.apache.avro.Schema.Type.LONG =>
        if (s.getLogicalType != null && s.getLogicalType.getName == "timestamp-micros")
          TimestampType
        else LongType
      case org.apache.avro.Schema.Type.INT =>
        if (s.getLogicalType != null && s.getLogicalType.getName == "date") DateType
        else IntegerType
      case org.apache.avro.Schema.Type.DOUBLE => DoubleType
      case org.apache.avro.Schema.Type.FLOAT => FloatType
      case org.apache.avro.Schema.Type.BOOLEAN => BooleanType
      case org.apache.avro.Schema.Type.STRING => StringType
      case org.apache.avro.Schema.Type.BYTES => BinaryType
      case other => throw new IllegalStateException(s"Avro type $other has no Spark mapping here")
    }
    StructType(avro.getFields.asScala.map(f => StructField(f.name(), typeOf(f.schema()))).toSeq)
  }

  /** REAL-TIME view of a MERGE-ON-READ table: per file group, base +
    * pending logs merged (latest per record key wins, tombstones
    * drop); groups with no pending logs stream through unshuffled.
    */
  def realtime(spark: SparkSession, tablePath: String): DataFrame =
    realtimeOf(spark, tablePath, morGroups(spark, tablePath))

  /** POINT-IN-TIME real-time view of a MOR table: the timeline replay
    * cut at `asOfInstant` — each group serves its base as of the
    * instant merged with the log files appended up to it. Slices
    * later cleaned off disk fail loudly at scan time, the same
    * contract as the COW as-of.
    */
  def realtimeAsOf(spark: SparkSession, tablePath: String, asOfInstant: String): DataFrame =
    realtimeOf(spark, tablePath, morGroups(spark, tablePath, Some(asOfInstant)))

  private def realtimeOf(spark: SparkSession, tablePath: String,
      groups: Seq[GroupSlices]): DataFrame = {
    val clean = groups.filter(_.logs.isEmpty).flatMap(_.base)
    val dirty = groups.filter(_.logs.nonEmpty)
    if (dirty.isEmpty) {
      if (clean.isEmpty) throw new IllegalArgumentException(
        s"$tablePath: no base files and no log files on the timeline")
      return readPaths(spark, tablePath, clean)
    }
    val schema = morSchema(spark, tablePath, groups)
    if (!schema.fieldNames.contains("_hoodie_record_key"))
      throw new IllegalStateException(
        s"$tablePath: base files carry no _hoodie_record_key — the log merge has no " +
          "record identity to merge on; refusing (read readOptimized for base-only)")
    val merged = mergeDirtyGroups(spark, tablePath, dirty, schema, keepFileId = false)
    if (clean.isEmpty) merged
    else readPaths(spark, tablePath, clean).select(schema.fieldNames.toIndexedSeq.map(col): _*)
      .unionByName(merged)
  }

  /** Snapshot read — COW tables scan the latest file slices; MOR
    * tables serve the merged REAL-TIME view (meta columns included,
    * as Hudi's own snapshot query returns them).
    */
  def snapshot(spark: SparkSession, tablePath: String): DataFrame =
    if (isMor(spark, tablePath)) realtime(spark, tablePath)
    else readPaths(spark, tablePath, activeSlices(spark, tablePath))

  /** Partition-pruned COW snapshot: only file slices whose
    * partitionToWriteStats key passes `pruner` reach the scan —
    * metadata-only, before any data I/O (the timeline-level half of
    * Hudi's own partition pruning; keys are hive-style `col=value`
    * paths). Refuses MOR tables — prune through `realtime`'s group
    * split instead.
    */
  def snapshotPruned(spark: SparkSession, tablePath: String,
      pruner: String => Boolean): DataFrame = {
    if (isMor(spark, tablePath)) throw new IllegalArgumentException(
      s"$tablePath is MERGE-ON-READ — partition-pruned reads are the COW path")
    val slices = activeSlices(spark, tablePath).filter(s0 => pruner(s0.partition))
    if (slices.isEmpty) throw new IllegalArgumentException(
      s"$tablePath: the partition pruner rejected every active slice")
    readPaths(spark, tablePath, slices)
  }

  /** POINT-IN-TIME query (Hudi's `as.of.instant`): the table exactly
    * as of `asOfInstant` — timeline replay stops there, so each file
    * group serves the latest slice committed at or before the
    * instant. Slices later cleaned off disk fail loudly at scan time
    * rather than silently serving a different state.
    */
  def snapshotAsOf(spark: SparkSession, tablePath: String, asOfInstant: String): DataFrame =
    if (isMor(spark, tablePath)) realtimeAsOf(spark, tablePath, asOfInstant)
    else readPaths(spark, tablePath, slicesUpTo(spark, tablePath, Some(asOfInstant)))

  /** READ-OPTIMIZED view of an external MERGE-ON-READ table — Hudi's
    * own `_ro` contract, as an EXPLICIT opt-in: the latest BASE
    * (parquet) file per live file group, log files ignored, so the
    * result is the table AS OF ITS LAST COMPACTION per group. Updates
    * sitting only in log files are NOT visible — that staleness is
    * the view's documented semantics, which is why [[snapshot]] keeps
    * refusing MOR timelines (a caller who didn't ask for staleness
    * must not silently get it). Works on COW tables too, where it
    * equals the snapshot (every slice is a base file).
    *
    * Replay, in instant order over the FULL timeline (commits,
    * deltacommits, replacecommits): parquet writes repoint their file
    * group's base file — an ordinary commit, a MOR compaction, or a
    * deltacommit's first base file for a new group — while log-file
    * writes leave the base slice untouched; a clustering
    * replacecommit drops its replaced groups.
    */
  def readOptimized(spark: SparkSession, tablePath: String): DataFrame = {
    val fs = fsOf(spark, hoodieDir(tablePath))
    val latest = scala.collection.mutable.LinkedHashMap.empty[String, SliceWrite]
    timelineInstants(spark, tablePath, allowMor = true).foreach { case (instant, kind) =>
      if (kind == "replacecommit") replacedIdsOf(fs, tablePath, instant).foreach(latest.remove)
      writesOf(fs, tablePath, instant, kind)
        .filter(_.path.endsWith(".parquet"))
        .foreach(w => latest(w.fileId) = w)
    }
    if (latest.isEmpty) throw new IllegalArgumentException(
      s"$tablePath: no base files on the timeline (nothing compacted yet?)")
    readPaths(spark, tablePath, latest.values.toIndexedSeq)
  }

  /** Incremental pull on a MERGE-ON-READ table: the real-time merge
    * restricted to file groups TOUCHED after the checkpoint (a base
    * write or a log append with a newer instant), filtered to
    * `_hoodie_commit_time > sinceInstant` — carried-forward and
    * base-only rows keep their stamps and drop out, and rows
    * tombstoned after the checkpoint are simply absent (Hudi's own
    * non-CDC incremental semantics: deletes do not surface). Groups
    * untouched since the checkpoint are NEVER scanned — the pull is
    * bounded by the touched groups' bytes.
    */
  def morIncrementalSince(spark: SparkSession, tablePath: String,
      sinceInstant: String): DataFrame = {
    val groups = morGroups(spark, tablePath)
    val timeline = timelineInstants(spark, tablePath, allowMor = true)
    if (!timeline.exists(_._1 > sinceInstant))
      throw new IllegalArgumentException(
        s"$tablePath: no instants after $sinceInstant " +
          s"(latest: ${timeline.lastOption.map(_._1).getOrElse("none")})")
    val touched = groups.filter(g =>
      g.base.exists(_.instant > sinceInstant) || g.logs.exists(_._1 > sinceInstant))
    if (touched.isEmpty)
      throw new IllegalArgumentException(
        s"$tablePath: instants after $sinceInstant touched no file group")
    val schema = morSchema(spark, tablePath, groups)
    if (!schema.fieldNames.contains("_hoodie_record_key"))
      throw new IllegalStateException(
        s"$tablePath: base files carry no _hoodie_record_key — the log merge has no " +
          "record identity; refusing")
    val dirty = touched.filter(_.logs.nonEmpty)
    val clean = touched.filter(_.logs.isEmpty).flatMap(_.base)
    val legs = Seq(
      if (dirty.nonEmpty)
        Some(mergeDirtyGroups(spark, tablePath, dirty, schema, keepFileId = false))
      else None,
      if (clean.nonEmpty)
        Some(readPaths(spark, tablePath, clean)
          .select(schema.fieldNames.toIndexedSeq.map(col): _*))
      else None).flatten
    legs.reduce(_ unionByName _)
      .filter(col("_hoodie_commit_time") > lit(sinceInstant))
  }

  /** The operationType a commit meta file declares ("INSERT",
    * "UPSERT", "COMPACT", "CLUSTER", …; empty when absent). */
  private def operationTypeOf(fs: FileSystem, tablePath: String,
      instant: String, kind: String): String = {
    val node = mapper.readTree(
      readText(fs, new Path(hoodieDir(tablePath), s"$instant.$kind")))
    Option(node.get("operationType")).map(_.asText()).getOrElse("")
  }

  /** CDC-grade incremental on a MERGE-ON-READ table — the change feed
    * of instants after `sinceInstant`: base files WRITTEN by a
    * data-changing instant serve their freshly-stamped rows as
    * `upsert` POST-IMAGES (inserts included — Hudi's non-CDC timeline
    * carries no pre-images, stated); log DATA blocks of the instant
    * serve `upsert` post-images too; log DELETE blocks serve `delete`
    * KEY-IMAGES (`_hoodie_record_key` set, data columns null — a
    * tombstone names a key, not a row). COMPACT commits and CLUSTER
    * replacecommits are SILENT (no logical change — the
    * dataChange=false analog). Rows tag `_change_type` +
    * `_commit_instant`. Folding the feed onto `realtimeAsOf(since)` —
    * per instant: delete-by-key, then upsert-by-key — reproduces the
    * head real-time view exactly (spec-proven). COW tables refuse
    * toward [[incrementalSince]]: their timelines carry no delete
    * images at all. Scale shape: per instant the feed reads only that
    * instant's written files/blocks.
    */
  def changeFeedSince(spark: SparkSession, tablePath: String,
      sinceInstant: String): DataFrame = {
    require(isMor(spark, tablePath),
      s"$tablePath is COPY_ON_WRITE — its timeline carries no delete images for a CDC " +
        "feed; use incrementalSince for the upsert-exact post-image pull")
    val fs = fsOf(spark, hoodieDir(tablePath))
    val groups = morGroups(spark, tablePath)
    val schema = morSchema(spark, tablePath, groups)
    if (!schema.fieldNames.contains("_hoodie_record_key"))
      throw new IllegalStateException(
        s"$tablePath: no _hoodie_record_key — the feed has no record identity; refusing")
    val range = timelineInstants(spark, tablePath, allowMor = true)
      .filter { case (i, _) => i > sinceInstant }
    if (range.isEmpty) throw new IllegalArgumentException(
      s"$tablePath: no instants after $sinceInstant")
    val cols = schema.fieldNames.toIndexedSeq
    val keyIdx = schema.fieldIndex("_hoodie_record_key")
    val legs = Seq.newBuilder[DataFrame]
    val logTasks = Seq.newBuilder[(String, String)] // (instant, absPath)
    range.foreach { case (instant, kind) =>
      val op = operationTypeOf(fs, tablePath, instant, kind)
      if (op != "COMPACT" && op != "CLUSTER") {
        val writes = writesOf(fs, tablePath, instant, kind)
        val bases = writes.filter(_.path.endsWith(".parquet"))
        if (bases.nonEmpty)
          legs += readPaths(spark, tablePath, bases)
            .where(col("_hoodie_commit_time") === lit(instant))
            .select(cols.map(col): _*)
            .withColumn("_change_type", lit("upsert"))
            .withColumn("_commit_instant", lit(instant))
        writes.filterNot(_.path.endsWith(".parquet"))
          .foreach(w => logTasks += ((instant, s"$tablePath/${w.path}")))
      }
    }
    val tasks = logTasks.result()
    if (tasks.nonEmpty) {
      import org.apache.spark.sql.types.{StringType, StructType, StructField}
      val outSchema = StructType(schema.fields.toIndexedSeq
        :+ StructField("_change_type", StringType)
        :+ StructField("_commit_instant", StringType))
      val bcConf = spark.sparkContext.broadcast(
        new DeltaDv.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
      val nFields = schema.size
      val schemaJson = schema.json
      legs += spark.createDataset(tasks)(
          Encoders.tuple(Encoders.STRING, Encoders.STRING))
        .repartition(math.max(1, math.min(tasks.size,
          spark.sparkContext.defaultParallelism)))
        .flatMap { case (instant, absPath) =>
          val target = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
            .asInstanceOf[StructType]
          HudiLog.read(bcConf.value.value, absPath).iterator.flatMap {
            case HudiLog.DataBlock(i, writerSchemaJson, records) if i == instant =>
              val writer = new org.apache.avro.Schema.Parser().parse(writerSchemaJson)
              records.iterator.map { bytes =>
                org.apache.spark.sql.Row.fromSeq(
                  HudiLog.decodeRow(bytes, writer, target).toSeq :+ "upsert" :+ instant)
              }
            case HudiLog.DeleteBlock(i, keys) if i == instant =>
              keys.iterator.map { k =>
                val vals = Array.fill[Any](nFields)(null)
                vals(keyIdx) = k
                org.apache.spark.sql.Row.fromSeq(vals.toIndexedSeq :+ "delete" :+ instant)
              }
            case _ => Iterator.empty
          }
        }(Encoders.row(outSchema))
        .toDF()
    }
    val parts = legs.result()
    if (parts.isEmpty) throw new IllegalArgumentException(
      s"$tablePath: instants after $sinceInstant carry no logical changes")
    parts.reduce(_.unionByName(_))
  }

  /** Incremental pull: records inserted/updated by commits AFTER
    * `sinceInstant` — on COW, the latest slices of the file groups
    * those commits touched, rows filtered to
    * `_hoodie_commit_time > sinceInstant` (carried-forward rows keep
    * their original stamp and drop out); MOR tables dispatch to
    * [[morIncrementalSince]] (touched-group merge, same stamp
    * filter). Refuses loudly when nothing committed after the
    * checkpoint.
    */
  def incrementalSince(spark: SparkSession, tablePath: String, sinceInstant: String): DataFrame = {
    if (isMor(spark, tablePath)) return morIncrementalSince(spark, tablePath, sinceInstant)
    val fs = fsOf(spark, hoodieDir(tablePath))
    // archived timelines refuse upstream in the instants listing —
    // per-group pruning (and slice discovery itself) cannot be
    // trusted once instants rotate out of the active listing
    val timeline = instants(spark, tablePath)
    val newer = timeline.collect { case (i, "commit") if i > sinceInstant => i }
    if (!timeline.exists(_._1 > sinceInstant))
      throw new IllegalArgumentException(
        s"$tablePath: no commits after $sinceInstant " +
          s"(latest: ${timeline.lastOption.map(_._1).getOrElse("none")})")
    // a clustering replacecommit after the checkpoint REWIRES file
    // groups (touched ids may no longer exist — their rows moved into
    // clustered groups with their stamps preserved), so the per-group
    // pruning can't be trusted across it: scan all active slices and
    // let the stamp filter isolate the pulled rows — correct, just
    // less pruned, and Hudi's own incremental reader does the same.
    // A replacecommit-ONLY tail is the same scan and yields zero rows
    // (clustering preserves stamps), the correct answer — not an
    // error.
    val clusteredAfter = timeline
      .exists(i => i._2 == "replacecommit" && i._1 > sinceInstant)
    val active = activeSlices(spark, tablePath)
    val slices =
      if (clusteredAfter || newer.isEmpty) active
      else {
        val touched = newer.flatMap(i => writesOf(fs, tablePath, i).map(_.fileId)).toSet
        active.filter(s => touched.contains(s.fileId))
      }
    readPaths(spark, tablePath, slices)
      .filter(col("_hoodie_commit_time") > lit(sinceInstant))
  }
}
