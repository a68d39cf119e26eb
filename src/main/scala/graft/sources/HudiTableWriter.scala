package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** APPEND-ONLY writer for Apache Hudi COPY-ON-WRITE tables readable
  * by external engines — the graft counterpart of the reference's
  * table-producing job itself (generate_hudi_table.py:86-214 writes a
  * Hudi table; template.py:207-217 consumes it), implemented from the
  * PUBLIC Hudi layout the reader ([[HudiTableReader]]) is locked
  * against:
  *
  *  - data lands as immutable base parquet files named
  *    `<fileId>_<writeToken>_<instant>.parquet`, one NEW file group
  *    per file (insert commits — no group is ever rewritten);
  *  - rows carry the `_hoodie_commit_time` meta column stamped with
  *    the commit instant (what makes incremental pull a per-row
  *    filter) and, when record keys are declared,
  *    `_hoodie_record_key` in Hudi's `k1:v1,k2:v2` form;
  *  - the timeline gains one `.hoodie/<instant>.commit` JSON whose
  *    `partitionToWriteStats` lists the file groups written;
  *    `hoodie.properties` declares COPY_ON_WRITE.
  *
  * Scale shape: the data write is an ordinary distributed parquet
  * write; the commit is driver metadata bounded by |files this
  * commit|. Instant collision (two writers in the same millisecond)
  * is resolved by the exclusive-create of the `.commit` file — the
  * loser bumps to the next instant and retries, the same
  * instant-uniqueness Hudi's own timeline service enforces.
  *
  * Beyond inserts: [[upsert]] is the reference's own write operation
  * (COW file-group rewrite, carried rows keeping their stamps), and
  * the MOR half (createMor/updateLog/deleteLog/compact) lands
  * deltacommit log files the real-time reader merges.
  */
object HudiTableWriter {

  val MaxCommitAttempts: Int = 20

  /** Crossover between BROADCASTING the upsert batch's key set into
    * the carried-rows anti join and a plain SHUFFLE anti join — same
    * gate as [[DeltaTableWriter.MaxBroadcastUpsertKeys]]: CDC-sized
    * batches broadcast (zero base-row shuffle); a backfill-scale key
    * set past the gate degrades to a shuffle join rather than hitting
    * Spark's 8 GiB broadcast hard cap.
    */
  val MaxBroadcastUpsertKeys: Long = 4L * 1000 * 1000

  private def hoodieDir(tablePath: String): Path = new Path(tablePath, ".hoodie")

  /** True when hoodie.properties obliges data-changing writes to land
    * CDC images (hoodie.table.cdc.enabled — Hudi's RFC-51 table
    * property). */
  private[sources] def cdcEnabledOf(spark: SparkSession, tablePath: String): Boolean =
    tableProperties(spark, tablePath).get("hoodie.table.cdc.enabled").contains("true")

  /** Land one instant's CDC images — full rows (meta columns
    * included) tagged `_change_type` (update_preimage /
    * update_postimage / insert / delete) — as DISTRIBUTED parquet
    * under `.hoodie/cdc/<instant>/`. The feed serves them VERBATIM
    * with precedence over post-image reconstruction (the Delta CDF
    * analog; Hudi's own cdc supplemental logging carries the same
    * before/after images). Readers only consult cdc dirs of
    * COMPLETED instants, so landing before the commit meta file is
    * crash-safe.
    */
  private def writeCdcImages(rows: DataFrame, tablePath: String, instant: String): Unit =
    rows.write.parquet(new Path(hoodieDir(tablePath), s"cdc/$instant").toString)

  private def instantNow(offsetMs: Long): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(System.currentTimeMillis() + offsetMs))

  private def writeProperties(spark: SparkSession, tablePath: String, name: String,
      recordKeys: Seq[String], precombineField: Option[String],
      tableType: String = "COPY_ON_WRITE", partitionBy: Seq[String] = Nil,
      cdcEnabled: Boolean = false): Unit = {
    val p = new Path(hoodieDir(tablePath), "hoodie.properties")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      // record-key fields are TABLE properties (Hudi's own
      // hoodie.table.recordkey.fields), not per-write options: an
      // append that stamped different keys — or none — would land base
      // files whose schemas disagree on _hoodie_record_key, and the
      // snapshot union would surface or drop the column depending on
      // which footer Spark samples
      val keyLines =
        if (recordKeys.isEmpty) ""
        else s"hoodie.table.recordkey.fields=${recordKeys.mkString(",")}\n"
      val precombineLine =
        precombineField.map(f => s"hoodie.table.precombine.field=$f\n").getOrElse("")
      val partitionLine =
        if (partitionBy.isEmpty) ""
        else s"hoodie.table.partition.fields=${partitionBy.mkString(",")}\n"
      val cdcLine = if (cdcEnabled) "hoodie.table.cdc.enabled=true\n" else ""
      val out = fs.create(p, false)
      try out.write(
        (s"hoodie.table.name=$name\n" +
          s"hoodie.table.type=$tableType\n" +
          "hoodie.table.version=5\n" + keyLines + precombineLine + partitionLine + cdcLine)
          .getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** Table properties from hoodie.properties, as key→value. */
  private[sources] def tableProperties(spark: SparkSession, tablePath: String): Map[String, String] = {
    val p = new Path(hoodieDir(tablePath), "hoodie.properties")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      text.linesIterator
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains('='))
        .map { l => val i = l.indexOf('='); l.substring(0, i).trim -> l.substring(i + 1).trim }
        .toMap
    }
  }

  /** The record-key fields the TABLE declares (empty = keyless). */
  def declaredRecordKeys(spark: SparkSession, tablePath: String): Seq[String] =
    tableProperties(spark, tablePath).get("hoodie.table.recordkey.fields")
      .map(_.split(',').toIndexedSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil)

  /** Stamp the Hudi meta columns an external reader expects. */
  private def stamped(df: DataFrame, instant: String, recordKeys: Seq[String],
      partitionBy: Seq[String] = Nil): DataFrame = {
    val withTime = df.withColumn("_hoodie_commit_time", lit(instant))
    val withKey =
      if (recordKeys.isEmpty) withTime
      else withTime.withColumn("_hoodie_record_key",
        concat_ws(",", recordKeys.map(k => concat(lit(s"$k:"), col(k).cast("string"))): _*))
    if (partitionBy.isEmpty) withKey
    else withKey.withColumn("_hoodie_partition_path",
      concat_ws("/", partitionBy.map(c =>
        concat(lit(s"$c="), coalesce(col(c).cast("string"),
          lit("__HIVE_DEFAULT_PARTITION__")))): _*))
  }

  /** The partition fields the TABLE declares (empty = unpartitioned). */
  def declaredPartitionFields(spark: SparkSession, tablePath: String): Seq[String] =
    tableProperties(spark, tablePath).get("hoodie.table.partition.fields")
      .map(_.split(',').toIndexedSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil)

  /** Land `df` (already stamped) as NEW file groups under `instant`:
    * stage write (hive dirs from duplicated `_p_<c>` columns — Hudi
    * keeps partition columns IN the data files), then rename each
    * staged parquet to the base-file naming convention under a fresh
    * fileId. Returns (partition, fileId, relPath) per landed file.
    */
  private def landNewGroups(staged0: DataFrame, tablePath: String, instant: String,
      partitionBy: Seq[String]): Seq[(String, String, String)] = {
    val spark = staged0.sparkSession
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new Path(tablePath, s".graft-stage-${java.util.UUID.randomUUID()}")
    val staged = partitionBy.foldLeft(staged0)((acc, c) => acc.withColumn(s"_p_$c", col(c)))
    val writer =
      if (partitionBy.isEmpty) staged.write
      else staged.write.partitionBy(partitionBy.map(c => s"_p_$c"): _*)
    writer.parquet(stage.toString)
    val writes = Seq.newBuilder[(String, String, String)] // (partition, fileId, path)
    def walk(dir: Path, partSegs: Seq[String]): Unit =
      fs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) {
          val segs =
            if (name.startsWith("_p_") && name.contains('='))
              partSegs :+ name.substring(3)
            else partSegs
          walk(st.getPath, segs)
        } else if (name.endsWith(".parquet")) {
          val partition = partSegs.mkString("/")
          val fileId = java.util.UUID.randomUUID().toString
          val rel =
            if (partition.isEmpty) s"${fileId}_0-0-0_$instant.parquet"
            else s"$partition/${fileId}_0-0-0_$instant.parquet"
          val dst = new Path(tablePath, rel)
          fs.mkdirs(dst.getParent)
          if (!fs.rename(st.getPath, dst))
            throw new IllegalStateException(s"$tablePath: failed to land base file $rel")
          writes += ((partition, fileId, rel))
        }
      }
    walk(stage, Nil)
    fs.delete(stage, true)
    writes.result()
  }

  /** Write one insert commit: every staged parquet file becomes a NEW
    * file group named per the Hudi base-file convention, and the
    * `.commit` (or, on MOR tables, `.deltacommit`) meta file publishes
    * them — with the sink's `extraMetadata` when given. Returns the
    * commit instant.
    */
  /** Footer record count of one landed base file — the per-file
    * `numWrites` real Hudi write stats carry. */
  private def footerRowCount(spark: SparkSession, tablePath: String, rel: String): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new Path(tablePath, rel), spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  private def insertCommit(df: DataFrame, tablePath: String,
      recordKeys: Seq[String], kind: String = "commit",
      partitionBy: Seq[String] = Nil,
      extraMetadata: Map[String, String] = Map.empty): String = {
    val spark = df.sparkSession
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    var attempt = 0
    while (true) {
      val instant = instantNow(attempt.toLong)
      val toWrite = stamped(df, instant, recordKeys, partitionBy)
      val files = landNewGroups(toWrite, tablePath, instant, partitionBy)
      if (files.isEmpty) throw new IllegalArgumentException(
        s"$tablePath: the DataFrame wrote no data files (empty input?)")
      // real per-file row counts from the footers (what Hudi's own
      // write stats carry) — |files| parallel metadata reads
      val statsByPartition = {
        import scala.collection.parallel.CollectionConverters._
        files.par.map { case (part, fid, path) =>
          (part,
            s"""{"fileId":"$fid","path":"$path",""" +
              s""""numWrites":${footerRowCount(spark, tablePath, path)},""" +
              s""""numUpdateWrites":0,""" +
              s""""totalWriteBytes":${fs.getFileStatus(new Path(tablePath, path)).getLen},""" +
              s""""prevCommit":"null"}""")
        }.seq.groupBy(_._1).map { case (part, ws) =>
          s""""$part":[${ws.map(_._2).mkString(",")}]"""
        }.mkString(",")
      }
      val commitPath = new Path(hoodieDir(tablePath), s"$instant.$kind")
      fs.mkdirs(hoodieDir(tablePath))
      // exclusive create = the instant-uniqueness CAS; a same-instant
      // racer loses here, abandons its files as uncommitted debris
      // (invisible to readers — the timeline is the source of truth)
      // and retries at the next instant
      val created = try {
        val out = fs.create(commitPath, false)
        try out.write(
          (s"""{"partitionToWriteStats":{$statsByPartition},"operationType":"INSERT"""" +
            extraMetadataJson(extraMetadata) + "}\n")
            .getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
      if (created) return instant
      files.foreach { case (_, _, path) => fs.delete(new Path(tablePath, path), false) }
      attempt += 1
      if (attempt >= MaxCommitAttempts) throw new IllegalStateException(
        s"$tablePath: lost the instant race $MaxCommitAttempts times")
    }
    throw new IllegalStateException("unreachable")
  }

  /** Create a NEW Hudi COW table at `tablePath` from `df`; refuses an
    * existing table (append to those). Returns the commit instant.
    */
  def create(df: DataFrame, tablePath: String, tableName: String = "graft_table",
      recordKeys: Seq[String] = Nil, precombineField: Option[String] = None,
      partitionBy: Seq[String] = Nil,
      extraMetadata: Map[String, String] = Map.empty,
      cdcEnabled: Boolean = false): String = {
    val spark = df.sparkSession
    val dir = hoodieDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) throw new IllegalArgumentException(
      s"$tablePath is already a Hudi table — use append")
    recordKeys.foreach(k => require(df.columns.contains(k),
      s"record-key field $k is not in the DataFrame"))
    partitionBy.foreach(c => require(df.columns.contains(c),
      s"partition field $c is not in the DataFrame"))
    fs.mkdirs(dir)
    writeProperties(spark, tablePath, tableName, recordKeys, precombineField,
      partitionBy = partitionBy, cdcEnabled = cdcEnabled)
    insertCommit(df, tablePath, recordKeys, partitionBy = partitionBy,
      extraMetadata = extraMetadata)
  }

  /** Append `df` as a new insert commit; columns must match the
    * table's existing data columns (order-free). The record-key
    * stamping comes from the TABLE's declared
    * `hoodie.table.recordkey.fields` — never a per-call choice, so
    * every base file agrees on whether `_hoodie_record_key` exists.
    * A non-empty `recordKeys` argument is validation only: it must
    * equal the declaration (callers asserting what they expect).
    */
  def append(df: DataFrame, tablePath: String, recordKeys: Seq[String] = Nil,
      extraMetadata: Map[String, String] = Map.empty): String = {
    val spark = df.sparkSession
    val declared = declaredRecordKeys(spark, tablePath)
    require(recordKeys.isEmpty || recordKeys == declared,
      s"$tablePath: append asserts record keys ${recordKeys.mkString(",")} but the table " +
        s"declares hoodie.table.recordkey.fields=${declared.mkString(",")} — the table " +
        "property wins; drop the argument or fix the expectation")
    val existing = HudiTableReader.snapshot(spark, tablePath)
    val evolved = evolutionOf(df, tablePath, existing)
    // MOR inserts land under deltacommits (Hudi's MOR write path —
    // an ordinary commit on a MOR timeline means compaction); the
    // partitioning comes from the TABLE's declaration, like the keys
    val kind = if (HudiTableReader.isMor(spark, tablePath)) "deltacommit" else "commit"
    insertCommit(df, tablePath, declared, kind,
      partitionBy = declaredPartitionFields(spark, tablePath),
      extraMetadata = extraMetadata ++ evolved.map("schema" -> _))
  }

  /** ADDITIVE SCHEMA EVOLUTION gate for a write batch against the
    * table's current columns: an exact match returns None (no
    * evolution); a batch that ADDS columns (and drops/retypes none)
    * returns the evolved schema's commit-metadata Avro JSON — the
    * `schema` key Hudi's own commits carry and
    * [[HudiTableReader.declaredDataSchema]] resolves, making old
    * files null-fill the new columns deterministically. Dropped
    * columns and TYPE CHANGES refuse loudly (rewrite-grade
    * migrations, not metadata commits). MOR tables evolve too: log
    * blocks name their write-time schema and the realtime decode
    * null-fills fields a block's writer never knew, so the declared
    * authority serves old bases, old logs and new writes alike.
    */
  private def evolutionOf(df: DataFrame, tablePath: String,
      existing: DataFrame): Option[String] = {
    val dataFields = existing.schema.fields.filterNot(_.name.startsWith("_hoodie_"))
    val dataCols = dataFields.map(_.name).toSet
    val missing = dataCols -- df.columns
    require(missing.isEmpty,
      s"$tablePath: batch drops table column(s) ${missing.toSeq.sorted.mkString(",")} — " +
        "evolution is ADDITIVE only; write the full column set")
    val batchTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
    dataFields.foreach { f =>
      require(batchTypes(f.name) == f.dataType,
        s"$tablePath: column ${f.name} arrives as ${batchTypes(f.name)} but the table " +
          s"declares ${f.dataType} — type changes are rewrite-grade migrations; refusing")
    }
    if (df.columns.toSet == dataCols) return None
    // evolved order: existing data columns verbatim, new ones after,
    // in batch order — what every later declared-schema scan serves
    val newFields = df.schema.fields.filterNot(f => dataCols.contains(f.name))
    val evolvedSchema = org.apache.spark.sql.types.StructType(
      dataFields.toIndexedSeq ++ newFields)
    Some(HudiSchema.toAvroJson(evolvedSchema))
  }

  /** OPTIMISTIC-CONCURRENCY validation for a COW upsert about to
    * publish: instants that landed after `plannedHead` (the head the
    * upsert's slices were read at) are safe iff they touched NONE of
    * `ourFids` and none is a clustering replacecommit (which rewires
    * groups wholesale). An overlap means this commit's rewritten
    * slices were computed from a now-stale snapshot — publishing
    * would silently clobber the winner, so it refuses loudly instead
    * (Hudi itself requires a lock provider for full multi-writer; the
    * residual check-to-create window is that provider's job).
    */
  private[sources] def validateNoConcurrentOverlap(spark: SparkSession, tablePath: String,
      plannedHead: String, ourFids: Set[String]): Unit = {
    val fs = hoodieDir(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val interleaved = HudiTableReader
      .timelineInstants(spark, tablePath, allowMor = false)
      .filter(_._1 > plannedHead)
    interleaved.find { case (i, k) =>
      k == "replacecommit" ||
        HudiTableReader.writesOf(fs, tablePath, i, k)
          .exists(w => ourFids.contains(w.fileId))
    }.foreach { case (i, k) =>
      throw new java.util.ConcurrentModificationException(
        s"$tablePath: concurrent $k at instant $i touched file groups this upsert " +
          s"rewrote from the now-stale snapshot $plannedHead — re-read and retry")
    }
  }

  /** Commit-metadata keys carrying a streaming sink's (appId,
    * batchId) watermark — Hudi's own deltastreamer pattern (the
    * checkpoint rides the commit's `extraMetadata`, atomic with the
    * data it describes).
    */
  val SinkAppKey = "graft.sink.app-id"
  val SinkBatchKey = "graft.sink.batch-id"

  private def extraMetadataJson(extra: Map[String, String]): String =
    if (extra.isEmpty) ""
    else {
      def jq(x: String) = "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      ""","extraMetadata":{""" + extra.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${jq(k)}:${jq(v)}" }.mkString(",") + "}"
    }

  /** The highest batch id `appId` committed into the timeline's
    * extraMetadata — the streaming sink's replay watermark. Driver
    * metadata, |completed instants|-bounded.
    */
  def lastBatchId(spark: SparkSession, tablePath: String, appId: String): Option[Long] = {
    val fs = hoodieDir(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val ids = HudiTableReader.timelineInstants(spark, tablePath, allowMor = true)
      .flatMap { case (instant, kind) =>
        val p = new Path(hoodieDir(tablePath), s"$instant.$kind")
        val in = fs.open(p)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        val extra = mapper.readTree(text).get("extraMetadata")
        if (extra == null || !extra.isObject) None
        else if (!Option(extra.get(SinkAppKey)).exists(_.asText() == appId)) None
        else Option(extra.get(SinkBatchKey))
          .flatMap(v => scala.util.Try(v.asText().toLong).toOption)
      }
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** UPSERT into a Hudi COPY-ON-WRITE table — the operation the
    * reference's own generator runs (generate_hudi_table.py:97-115,
    * `hoodie.datasource.write.operation=upsert`): each batch row
    * whose record key exists REWRITES its file group (a new file
    * slice under the new instant, same fileId — unchanged rows
    * carried forward with their ORIGINAL `_hoodie_commit_time`,
    * replaced rows stamped with the new instant, exactly what keeps
    * incremental pulls exact); rows with unseen keys land as new
    * file groups. One `.commit` publishes both, with
    * `numUpdateWrites`/`prevCommit` per rewritten group.
    *
    * Key matching is PARTITION-SCOPED (record key + partition
    * values), Hudi's default non-global index: a known key arriving
    * under different partition values is an INSERT into that
    * partition, the old row stays — document-matched to
    * hoodie.index.type=SIMPLE semantics. When the table declares a
    * precombine field, in-batch duplicates per key resolve
    * latest-wins on it; otherwise the batch must be unique on the
    * keys (loudly required). MOR tables dispatch to [[morUpsert]] —
    * the format's OWN upsert shape: log blocks for matched keys, new
    * base groups for unseen keys, one deltacommit, nothing rewritten.
    *
    * Scale shape: one scan of the CURRENT base files (the COW
    * contract — an upsert rewrites matched groups), one shuffle of
    * (carried ∪ replacement) rows to their group's write task, new
    * groups via the ordinary staged write; driver state is
    * |touched groups| commit metadata, never row data. Returns the
    * commit instant. Single-writer: a lost instant race throws.
    */
  def upsert(df: DataFrame, tablePath: String,
      maxBroadcastKeys: Long = MaxBroadcastUpsertKeys): String = {
    val spark = df.sparkSession
    val keys = declaredRecordKeys(spark, tablePath)
    require(keys.nonEmpty,
      s"$tablePath: upsert routes by record key — the table declares none " +
        "(hoodie.table.recordkey.fields)")
    val partitionBy = declaredPartitionFields(spark, tablePath)
    val precombine = tableProperties(spark, tablePath).get("hoodie.table.precombine.field")
    val existing = HudiTableReader.snapshot(spark, tablePath)
    val dataCols = existing.columns.filterNot(_.startsWith("_hoodie_")).toSeq
    // additive evolution: a batch ADDING columns commits the evolved
    // schema; carried rows null-fill below. Drops/retypes/MOR refuse.
    val evolvedJson = evolutionOf(df, tablePath, existing)
    val newFields = df.schema.fields.filterNot(f => dataCols.contains(f.name)).toSeq
    // in-batch combine: latest-wins on the declared precombine field,
    // or loudly require key-uniqueness when the table declares none
    val deduped = precombine match {
      case Some(pc) =>
        require(df.columns.contains(pc),
          s"$tablePath: declared precombine field $pc is not in the batch")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*).orderBy(col(pc).desc)
        df.withColumn("_g_rn", row_number().over(w))
          .where(col("_g_rn") === 1).drop("_g_rn")
      case None =>
        // one aggregation job for both cardinalities (was count() +
        // distinct().count() — two full-scan jobs for one require)
        val card = df.agg(count(lit(1)).as("n"),
          count_distinct(struct(keys.map(col): _*)).as("k")).head()
        val nRows = card.getLong(0)
        val nKeys = card.getLong(1)
        require(nRows == nKeys,
          s"$tablePath: upsert batch carries ${nRows - nKeys} duplicate key row(s) and " +
            "the table declares no precombine field — the replacement row per key would " +
            "be ambiguous; pre-combine the batch first")
        df
    }
    // MERGE_ON_READ: the upsert is MOR's OWN write shape — one
    // deltacommit carrying log blocks for matched keys and new base
    // files for unseen keys (no base rewritten)
    if (HudiTableReader.isMor(spark, tablePath))
      return morUpsert(deduped, tablePath, keys, partitionBy, evolvedJson)
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val instant = instantNow(0L)
    // BLOOM-INDEX PRUNE: groups whose per-file filter proves every
    // batch key absent never join the key-matching scan (they can
    // only carry — untouched groups don't rewrite). Probe BOTH key
    // forms: graft's `field:value` stamp and the raw single-key form
    // real SimpleKeyGenerator tables carry — a bucket superset only
    // widens the scan, never misses an update.
    val graftKeyProbe = deduped.select(concat_ws(",",
      keys.map(k => concat(lit(s"$k:"), col(k).cast("string"))): _*).as("_g_probe"))
    val probes =
      if (keys.size == 1)
        graftKeyProbe.unionAll(deduped.select(col(keys.head).cast("string").as("_g_probe")))
      else graftKeyProbe
    // the timeline head this upsert is PLANNED against — captured
    // BEFORE the slice listing so every instant that lands after
    // planning (including between head-read and listing) falls on the
    // `> plannedHead` side of the publish-time overlap validation
    val plannedHead = HudiTableReader.latestInstant(spark, tablePath)
    val slices = bloomPruneSlices(spark, tablePath,
      HudiTableReader.activeSlices(spark, tablePath), probes)
    val sliceByFid = slices.map(s => s.fileId -> s).toMap
    // base rows with their file-group id, via the one metadata column
    // scan + a broadcast path→fid map (bounded by |file groups|)
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val fidRows = slices.map(s => org.apache.spark.sql.Row(
      ScanPaths.normalizeDriver(s"$tablePath/${s.path}"), s.fileId))
    val fidDf = spark.createDataFrame(fidRows.asJava, StructType(Seq(
      StructField("_g_file", StringType), StructField("_g_fid", StringType))))
    // a previously-evolved table scans with its DECLARED schema (old
    // base files null-fill), exactly as the reader does
    val baseRead = HudiTableReader.scanSchemaOf(spark, tablePath,
        Some(s"$tablePath/${slices.maxBy(_.instant).path}")) match {
      case Some(declared) => spark.read.schema(declared)
      case None => spark.read
    }
    val base = baseRead.parquet(slices.map(s => s"$tablePath/${s.path}"): _*)
      .withColumn("_g_file", ScanPaths.normalizeScan(col("_metadata.file_path")))
      .join(broadcast(fidDf), Seq("_g_file"))
      .drop("_g_file")
    val sliceCols = base.columns.filterNot(_ == "_g_fid").toSeq
    // evolved output: the base columns verbatim, new batch columns
    // after; base-sourced rows take deterministic nulls there
    val outCols = sliceCols ++ newFields.map(_.name)
    def nullFillNew(d: DataFrame): DataFrame =
      newFields.foldLeft(d)((acc, f) => acc.withColumn(f.name, lit(null).cast(f.dataType)))
    // partition-scoped key: record keys + partition values together
    val joinCols = (partitionBy ++ keys).distinct
    val keyFid = base.select(joinCols.map(col) :+ col("_g_fid"): _*)
    val batchStamped = stamped(deduped, instant, keys, partitionBy)
    val tagged = batchStamped.join(keyFid, joinCols, "left")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE grouped count (also warms the cache) answers both the
      // batch-key cardinality (broadcast-vs-shuffle decision for the
      // carried-rows join) and the per-touched-group update counts —
      // was two jobs: tagged.count() + updates.groupBy.count. Null
      // fid = insert rows; |groups|+1 rows of driver metadata.
      val fidCounts = tagged.groupBy(col("_g_fid")).count().collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getString(0))) -> r.getLong(1))
        .toMap
      val nBatchKeys = fidCounts.values.sum
      val updates = tagged.where(col("_g_fid").isNotNull)
      val inserts = tagged.where(col("_g_fid").isNull).drop("_g_fid")
      // hoodie.table.cdc.enabled obligation: land this instant's
      // pre/post images BEFORE any data file moves (the base scan
      // below still sees the pre-write state) — one distributed
      // parquet write under .hoodie/cdc/<instant>/
      if (cdcEnabledOf(spark, tablePath)) {
        val batchKeySet = deduped.select(joinCols.map(col): _*)
        val pre = nullFillNew(base
          .join(if (nBatchKeys <= maxBroadcastKeys) broadcast(batchKeySet) else batchKeySet,
            joinCols, "left_semi"))
          .select(outCols.map(col): _*)
          .withColumn("_change_type", lit("update_preimage"))
        val post = updates.select(outCols.map(col): _*)
          .withColumn("_change_type", lit("update_postimage"))
        val ins = inserts.select(outCols.map(col): _*)
          .withColumn("_change_type", lit("insert"))
        writeCdcImages(pre.unionByName(post).unionByName(ins), tablePath, instant)
      }
      // per-touched-group update counts — |groups| driver metadata,
      // already in hand from the grouped count above
      val updCounts = fidCounts.collect { case (Some(fid), n) => fid -> n }
      val updateStats = Seq.newBuilder[(String, String, String, Long, Long, Long)]
      if (updCounts.nonEmpty) {
        val updFidDf = spark.createDataFrame(
          updCounts.keys.toSeq.map(org.apache.spark.sql.Row(_)).asJava,
          StructType(Seq(StructField("_g_fid", StringType))))
        val batchKeys = deduped.select(joinCols.map(col): _*)
        // SIZE-GATED anti join: CDC-sized batches broadcast their key
        // set (no shuffle of the carried base rows); past the gate a
        // backfill-scale batch would blow the 8 GiB broadcast cap, so
        // it degrades to a shuffle anti join instead of failing
        val carried = base.join(broadcast(updFidDf), Seq("_g_fid"))
          .join(if (nBatchKeys <= maxBroadcastKeys) broadcast(batchKeys)
                else batchKeys,
            joinCols, "left_anti")
        val newSlices = nullFillNew(carried).select(outCols.map(col) :+ col("_g_fid"): _*)
          .unionByName(updates.select(outCols.map(col) :+ col("_g_fid"): _*))
        // one rewritten base file per touched group: each fid lives in
        // exactly one task after the repartition, partitionBy splits
        // the task's rows into one file per fid dir
        val stage = new Path(tablePath, s".graft-upsert-${java.util.UUID.randomUUID()}")
        newSlices.repartition(col("_g_fid")).write.partitionBy("_g_fid")
          .parquet(stage.toString)
        // land + footer-count in PARALLEL: one rename + one footer
        // read per touched group is metadata-level work, but serially
        // it is O(|touched groups|) driver round-trips — thousands of
        // groups would mean minutes of driver wall-time
        import scala.collection.parallel.CollectionConverters._
        val landed = fs.listStatus(stage).filter(_.isDirectory).toSeq.par.map { d =>
          val name = d.getPath.getName
          require(name.startsWith("_g_fid="), s"$tablePath: unexpected stage dir $name")
          val fid = name.substring("_g_fid=".length)
          val parts = fs.listStatus(d.getPath).map(_.getPath)
            .filter(_.getName.endsWith(".parquet"))
          require(parts.length == 1,
            s"$tablePath: group $fid staged ${parts.length} files — expected exactly one")
          val old = sliceByFid.getOrElse(fid, throw new IllegalStateException(
            s"$tablePath: staged group $fid is not an active slice — racing writer?"))
          val partition = old.partition
          val rel =
            if (partition.isEmpty) s"${fid}_0-0-0_$instant.parquet"
            else s"$partition/${fid}_0-0-0_$instant.parquet"
          val dst = new Path(tablePath, rel)
          fs.mkdirs(dst.getParent)
          if (!fs.rename(parts.head, dst))
            throw new IllegalStateException(s"$tablePath: failed to land new slice $rel")
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(dst,
            spark.sparkContext.hadoopConfiguration)
          val pr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          val n = try pr.getRecordCount finally pr.close()
          (partition, fid, rel, n, updCounts(fid), fs.getFileStatus(dst).getLen)
        }.seq
        updateStats ++= landed
        fs.delete(stage, true)
      }
      val insertFiles = landNewGroups(inserts.select(outCols.map(col): _*),
        tablePath, instant, partitionBy)
      val allStats = {
        import scala.collection.parallel.CollectionConverters._
        updateStats.result().map { case (part, fid, rel, n, nUpd, len) =>
          (part, s"""{"fileId":"$fid","path":"$rel","numWrites":$n,""" +
            s""""numUpdateWrites":$nUpd,""" +
            s""""totalWriteBytes":$len,""" +
            s""""prevCommit":"${sliceByFid(fid).instant}"}""")
        } ++ insertFiles.par.map { case (part, fid, rel) =>
          // footer + status reads in parallel, as everywhere else
          (part, s"""{"fileId":"$fid","path":"$rel",""" +
            s""""numWrites":${footerRowCount(spark, tablePath, rel)},""" +
            s""""numUpdateWrites":0,""" +
            s""""totalWriteBytes":${fs.getFileStatus(new Path(tablePath, rel)).getLen},""" +
            s""""prevCommit":"null"}""")
        }.seq
      }
      if (allStats.isEmpty) throw new IllegalArgumentException(
        s"$tablePath: empty upsert batch — nothing to write")
      val statsJson = allStats.groupBy(_._1).map { case (part, ws) =>
        s""""$part":[${ws.map(_._2).mkString(",")}]"""
      }.mkString(",")
      // OPTIMISTIC CONCURRENCY: commits that landed while this upsert
      // computed may have rewritten the very groups whose slices fed
      // the carried-rows merge. A DISJOINT interleave (appends, or
      // upserts of other groups) is safe — untouched groups never
      // move; an overlap or a clustering replacecommit would be
      // silently clobbered, so it refuses loudly. The staged slices
      // stay as uncommitted debris — invisible to readers, vacuumed
      // later (the timeline is the source of truth).
      validateNoConcurrentOverlap(spark, tablePath, plannedHead, updCounts.keySet)
      val commitPath = new Path(hoodieDir(tablePath), s"$instant.commit")
      val created = try {
        val out = fs.create(commitPath, false)
        try out.write(
          (s"""{"partitionToWriteStats":{$statsJson},"operationType":"UPSERT"""" +
            extraMetadataJson(evolvedJson.map("schema" -> _).toMap) + "}\n")
            .getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
      if (!created) throw new IllegalStateException(
        s"$tablePath: instant $instant already committed by another writer — upserts are " +
          "single-writer per instant; the landed files must be rolled back manually")
      instant
    } finally tagged.unpersist()
  }

  // ----------------------------------------------------------------
  // MERGE-ON-READ: deltacommit log appends + compaction — the write
  // half of the real-time view HudiTableReader.realtime serves.
  // Updates/deletes land as [[HudiLog]] blocks appended to each key's
  // file group (no base file rewritten — MOR's whole point); compact
  // folds pending logs into new base files under an ordinary commit.
  // Log writes are SINGLE-WRITER per table (log-file names embed the
  // next version number; Hudi itself needs a lock provider for
  // concurrent log writers) — a lost instant race throws, loudly.
  // ----------------------------------------------------------------

  /** Create a NEW Hudi MERGE-ON-READ table: base files land under a
    * `.deltacommit` (the MOR insert path), `hoodie.properties`
    * declares MERGE_ON_READ + the record keys the log merge needs.
    */
  def createMor(df: DataFrame, tablePath: String, tableName: String = "graft_table",
      recordKeys: Seq[String] = Nil, precombineField: Option[String] = None,
      partitionBy: Seq[String] = Nil, cdcEnabled: Boolean = false): String = {
    require(recordKeys.nonEmpty,
      "a MOR table needs record keys — the log merge has no identity without them")
    val spark = df.sparkSession
    val dir = hoodieDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) throw new IllegalArgumentException(
      s"$tablePath is already a Hudi table — use append/updateLog")
    recordKeys.foreach(k => require(df.columns.contains(k),
      s"record-key field $k is not in the DataFrame"))
    partitionBy.foreach(c => require(df.columns.contains(c),
      s"partition field $c is not in the DataFrame"))
    fs.mkdirs(dir)
    writeProperties(spark, tablePath, tableName, recordKeys, precombineField,
      tableType = "MERGE_ON_READ", partitionBy = partitionBy, cdcEnabled = cdcEnabled)
    insertCommit(df, tablePath, recordKeys, kind = "deltacommit",
      partitionBy = partitionBy)
  }

  /** MOR upsert: matched keys land as Avro log blocks appended to
    * their file groups, unseen keys as NEW base-file groups — BOTH
    * under ONE `.deltacommit` (Hudi's own MOR upsert shape; nothing
    * is rewritten). The real-time view serves the merge immediately;
    * compaction folds later. Scale shape: one base-key scan +
    * broadcast group map to split the batch, one log shuffle bounded
    * by |touched groups|, one staged write for inserts.
    */
  private def morUpsert(deduped: DataFrame, tablePath: String, keys: Seq[String],
      partitionBy: Seq[String], evolvedJson: Option[String] = None): String = {
    val spark = deduped.sparkSession
    val groups = HudiTableReader.morGroups(spark, tablePath)
    val instant = instantNow(0L)
    val stampedDf = stamped(deduped, instant, keys, partitionBy)
    val recSchema = stampedDf.schema
    val avroJson = HudiLog.avroSchemaOf(recSchema).toString
    val routed = routeByKey(spark, tablePath,
      stampedDf.withColumn("_g_key", col("_hoodie_record_key")), groups,
      allowMissing = true)
    try {
      val updates = routed.where(col("_g_fid").isNotNull)
        .select(recSchema.fieldNames.map(col).toIndexedSeq :+ col("_g_fid"): _*)
      val inserts = routed.where(col("_g_fid").isNull)
        .select(recSchema.fieldNames.map(col).toIndexedSeq: _*)
      // cdc obligation: pre-images come from the CURRENT real-time
      // view (one key-matched scan — the extra read Hudi's own cdc
      // supplemental logging pays too), landed BEFORE any log file
      // appends so the scan still sees the pre-write state
      if (cdcEnabledOf(spark, tablePath)) {
        val rt0 = HudiTableReader.snapshot(spark, tablePath)
        // an EVOLVING batch is wider than the pre-write view: the
        // pre-images null-fill the columns this very commit adds
        val rt = recSchema.fields.filterNot(f => rt0.columns.contains(f.name))
          .foldLeft(rt0)((acc, f) =>
            acc.withColumn(f.name, lit(null).cast(f.dataType)))
        val batchKeys = stampedDf.select(col("_hoodie_record_key")).distinct()
        val pre = rt
          .join(broadcast(batchKeys), Seq("_hoodie_record_key"), "left_semi")
          .select(recSchema.fieldNames.map(col).toIndexedSeq: _*)
          .withColumn("_change_type", lit("update_preimage"))
        val post = updates.drop("_g_fid")
          .withColumn("_change_type", lit("update_postimage"))
        val ins = inserts.withColumn("_change_type", lit("insert"))
        writeCdcImages(pre.unionByName(post).unionByName(ins), tablePath, instant)
      }
      val meta = logMetaOf(groups, instant)
      // ONE routing-side count materializes the persisted `routed`
      // and answers both emptiness probes (was updates.isEmpty +
      // inserts.isEmpty — two executeTake jobs over a cold cache)
      val routedCounts = routed.groupBy(col("_g_fid").isNull.as("_g_ins"))
        .count().collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      val logStats =
        if (routedCounts.getOrElse(false, 0L) == 0L) Nil
        else writeLogFiles(updates, tablePath, instant, recSchema.json, avroJson,
          meta, isDelete = false)
      val insertFiles =
        if (routedCounts.getOrElse(true, 0L) == 0L) Nil
        else landNewGroups(inserts, tablePath, instant, partitionBy)
      if (logStats.isEmpty && insertFiles.isEmpty) throw new IllegalArgumentException(
        s"$tablePath: empty upsert batch — nothing to write")
      publishDeltacommit(spark, tablePath, instant, logStats, insertFiles,
        extraMetadata = evolvedJson.map("schema" -> _).toMap)
      instant
    } finally routed.unpersist()
  }

  /** Route rows carrying `_g_key` to their file groups via the BASE
    * files' record keys (one scan + a broadcast file→group map), or
    * refuse loudly on keys no base file holds.
    */
  private def routeByKey(spark: SparkSession, tablePath: String, keyed: DataFrame,
      groups: Seq[HudiTableReader.GroupSlices],
      allowMissing: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val withBase = groups.filter(_.base.isDefined)
    require(withBase.nonEmpty, s"$tablePath: no base files to route log records against")
    val fidRows = withBase.map(g => org.apache.spark.sql.Row(
      ScanPaths.normalizeDriver(s"$tablePath/${g.base.get.path}"), g.fileId))
    import scala.jdk.CollectionConverters._
    val fidDf = spark.createDataFrame(fidRows.asJava, StructType(Seq(
      StructField("_g_file", StringType), StructField("_g_fid", StringType))))
    val baseKeys = spark.read
      .parquet(withBase.map(g => s"$tablePath/${g.base.get.path}"): _*)
      .withColumn("_g_file", ScanPaths.normalizeScan(col("_metadata.file_path")))
      .join(broadcast(fidDf), Seq("_g_file"))
      .select(col("_hoodie_record_key").as("_g_key"), col("_g_fid"))
    // persist: the routing join feeds BOTH the unknown-key check and
    // the log write — recomputing it would scan the base keys twice
    val routed = keyed.join(baseKeys, Seq("_g_key"), "left")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val missing = if (allowMissing) 0L else routed.where(col("_g_fid").isNull).count()
    if (missing > 0) {
      routed.unpersist()
      throw new IllegalArgumentException(
        s"$tablePath: $missing record(s) have keys no base file group holds — log appends " +
          "route by existing key; inserts take append/createMor (new file groups)")
    }
    routed
  }

  /** Per-group log metadata the write tasks need: the group's base
    * instant (log names embed it) and the next log version.
    */
  private def logMetaOf(groups: Seq[HudiTableReader.GroupSlices],
      fallbackInstant: String): Map[String, (String, Int, String)] =
    groups.map { g =>
      // a group's logs live NEXT TO its base — in the partition dir
      val partition = g.base
        .map(_.path.split('/').dropRight(1).mkString("/")).getOrElse("")
      g.fileId -> ((g.base.map(_.instant).getOrElse(fallbackInstant),
        g.logs.size + 1, partition))
    }.toMap

  /** Publish a `.deltacommit` naming the log files written. The
    * exclusive create is the instant-uniqueness CAS; a lost race
    * throws (the log files already carry version numbers — a silent
    * retry could double-apply them).
    */
  private def publishDeltacommit(spark: SparkSession, tablePath: String, instant: String,
      stats: Seq[(String, String, Long)], // (fileId, relPath, n) — log writes
      insertFiles: Seq[(String, String, String)] = Nil, // (partition, fileId, rel)
      extraMetadata: Map[String, String] = Map.empty): Unit = {
    val fs = hoodieDir(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // per-file stats in PARALLEL (footer + status reads are driver
    // round-trips — serially O(|files|) wall time, same fix the
    // staged-landing paths already carry)
    import scala.collection.parallel.CollectionConverters._
    val logEntries = stats.par.map { case (fid, rel, n) =>
      (rel.split('/').dropRight(1).mkString("/"),
        s"""{"fileId":"$fid","path":"$rel","numWrites":$n,"numUpdateWrites":$n,""" +
          s""""totalWriteBytes":${fs.getFileStatus(new Path(tablePath, rel)).getLen},""" +
          s""""prevCommit":"$instant"}""")
    }.seq
    val insertEntries = insertFiles.par.map { case (part, fid, rel) =>
      (part,
        s"""{"fileId":"$fid","path":"$rel",""" +
          s""""numWrites":${footerRowCount(spark, tablePath, rel)},""" +
          s""""numUpdateWrites":0,""" +
          s""""totalWriteBytes":${fs.getFileStatus(new Path(tablePath, rel)).getLen},""" +
          s""""prevCommit":"null"}""")
    }.seq
    val statsJson = (logEntries ++ insertEntries).groupBy(_._1).map { case (part, ws) =>
      s""""$part":[${ws.map(_._2).mkString(",")}]"""
    }.mkString(",")
    val p = new Path(hoodieDir(tablePath), s"$instant.deltacommit")
    val created = try {
      val out = fs.create(p, false)
      try out.write(
        (s"""{"partitionToWriteStats":{$statsJson},"operationType":"UPSERT"""" +
          extraMetadataJson(extraMetadata) + "}\n")
          .getBytes("UTF-8"))
      finally out.close()
      true
    } catch { case _: java.io.IOException => false }
    if (!created) throw new IllegalStateException(
      s"$tablePath: instant $instant already committed by another writer — log appends " +
        "are single-writer; the landed log files must be rolled back manually")
  }

  /** UPDATE existing records: `df` (full data rows, record-key fields
    * included) lands as Avro data blocks appended to each key's file
    * group. Returns the deltacommit instant. The data write is
    * distributed (rows shuffle to their group's write task); the
    * commit is |groups-touched| driver metadata.
    */
  def updateLog(df: DataFrame, tablePath: String): String = {
    val spark = df.sparkSession
    val keys = declaredRecordKeys(spark, tablePath)
    require(keys.nonEmpty, s"$tablePath: log routing needs declared record keys")
    require(HudiTableReader.isMor(spark, tablePath),
      s"$tablePath is COPY_ON_WRITE — log appends are MOR machinery; use append()")
    val groups = HudiTableReader.morGroups(spark, tablePath)
    val instant = instantNow(0L)
    val stampedDf = stamped(df, instant, keys, declaredPartitionFields(spark, tablePath))
    val recSchema = stampedDf.schema
    val avroJson = HudiLog.avroSchemaOf(recSchema).toString
    val routedBase = routeByKey(spark, tablePath,
      stampedDf.withColumn("_g_key", col("_hoodie_record_key")), groups)
    val routed = routedBase
      .select(recSchema.fieldNames.map(col).toIndexedSeq :+ col("_g_fid"): _*)
    val meta = logMetaOf(groups, instant)
    val written = try writeLogFiles(routed, tablePath, instant, recSchema.json, avroJson,
      meta, isDelete = false) finally routedBase.unpersist()
    publishDeltacommit(spark, tablePath, instant, written)
    instant
  }

  /** DELETE records: `df` carries the record-key FIELDS; tombstone
    * delete blocks land in each key's file group. Returns the
    * deltacommit instant.
    */
  def deleteLog(df: DataFrame, tablePath: String): String = {
    val spark = df.sparkSession
    val keys = declaredRecordKeys(spark, tablePath)
    require(keys.nonEmpty, s"$tablePath: log routing needs declared record keys")
    require(HudiTableReader.isMor(spark, tablePath),
      s"$tablePath is COPY_ON_WRITE — log deletes are MOR machinery")
    val groups = HudiTableReader.morGroups(spark, tablePath)
    val instant = instantNow(0L)
    val keyed = df.withColumn("_g_key",
      concat_ws(",", keys.map(k => concat(lit(s"$k:"), col(k).cast("string"))): _*))
      .select("_g_key")
    // cdc obligation: a delete's image is the row it removes — the
    // PRE-image from the current real-time view, landed before any
    // tombstone block appends
    if (cdcEnabledOf(spark, tablePath)) {
      val rt = HudiTableReader.snapshot(spark, tablePath)
      val del = rt.join(broadcast(keyed.withColumnRenamed("_g_key", "_hoodie_record_key")),
          Seq("_hoodie_record_key"), "left_semi")
        .withColumn("_change_type", lit("delete"))
      writeCdcImages(del, tablePath, instant)
    }
    val routedBase = routeByKey(spark, tablePath, keyed, groups)
    val routed = routedBase.select("_g_key", "_g_fid")
    val meta = logMetaOf(groups, instant)
    val written = try writeLogFiles(routed, tablePath, instant, schemaJson = "", avroJson = "",
      meta, isDelete = true) finally routedBase.unpersist()
    publishDeltacommit(spark, tablePath, instant, written)
    instant
  }

  /** Shuffle rows to their file group and write ONE log file per
    * group (a data block of the partition's records, or a delete
    * block of its keys). Returns (fileId, relPath, count) per file —
    * bounded by |groups touched|.
    */
  private def writeLogFiles(routed: DataFrame, tablePath: String, instant: String,
      schemaJson: String, avroJson: String, meta: Map[String, (String, Int, String)],
      isDelete: Boolean): Seq[(String, String, Long)] = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val spark = routed.sparkSession
    val bcConf = spark.sparkContext.broadcast(
      new DeltaDv.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val bcMeta = spark.sparkContext.broadcast(meta)
    val outSchema = StructType(Seq(StructField("fileId", StringType),
      StructField("path", StringType), StructField("n", LongType)))
    val table = tablePath
    routed.repartition(col("_g_fid"))
      .mapPartitions { it =>
        val schema =
          if (isDelete) null
          else org.apache.spark.sql.types.DataType.fromJson(schemaJson)
            .asInstanceOf[StructType]
        val avro = if (isDelete) null else new org.apache.avro.Schema.Parser().parse(avroJson)
        val nCore = if (isDelete) 1 else schema.size
        val byFid = scala.collection.mutable.LinkedHashMap
          .empty[String, scala.collection.mutable.ArrayBuffer[Any]]
        it.foreach { row =>
          val fid = row.getString(nCore)
          val payload: Any =
            if (isDelete) row.getString(0)
            else HudiLog.encodeRow(
              org.apache.spark.sql.Row.fromSeq((0 until nCore).map(row.get)), schema, avro)
          byFid.getOrElseUpdate(fid, scala.collection.mutable.ArrayBuffer.empty) += payload
        }
        byFid.iterator.map { case (fid, payloads) =>
          val (baseInstant, ver, partition) = bcMeta.value(fid)
          val name = HudiLog.logFileName(fid, baseInstant, ver)
          val rel = if (partition.isEmpty) name else s"$partition/$name"
          val block: HudiLog.Block =
            if (isDelete) HudiLog.DeleteBlock(instant, payloads.toSeq.map(_.asInstanceOf[String]))
            else HudiLog.DataBlock(instant, avroJson,
              payloads.toSeq.map(_.asInstanceOf[Array[Byte]]))
          HudiLog.write(bcConf.value.value, s"$table/$rel", Seq(block))
          org.apache.spark.sql.Row(fid, rel, payloads.size.toLong)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toIndexedSeq
  }

  /** CLUSTERING (Hudi's replacecommit service): rewrite the COW
    * table's active file slices into `targetGroups` new file groups,
    * published as a `.replacecommit` whose `partitionToReplaceFileIds`
    * drops every input group — the shape the reader's replay is
    * spec-locked against. Row stamps (`_hoodie_commit_time`) are
    * PRESERVED verbatim, which is what keeps incremental pulls exact
    * across the clustering (carried rows keep their old stamps and
    * drop out of any later pull). MOR tables with pending logs
    * refuse — compact first. Returns the replacecommit instant.
    */
  def cluster(spark: SparkSession, tablePath: String, targetGroups: Int): String = {
    require(targetGroups >= 1, "targetGroups must be >= 1")
    val partitionBy = declaredPartitionFields(spark, tablePath)
    val groups = HudiTableReader.morGroups(spark, tablePath)
    require(groups.forall(_.logs.isEmpty),
      s"$tablePath: file groups carry pending log files — compact before clustering")
    val slices = groups.flatMap(_.base)
    require(slices.nonEmpty, s"$tablePath: nothing to cluster")
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val instant = instantNow(0L)
    // stamps preserved: read the slices AS THEY ARE and re-bucket —
    // PER PARTITION on partitioned tables (Hudi's own clustering
    // plans per partition): a (partition, bucket) shuffle key gives
    // at most targetGroups files per partition dir, one shuffle total
    val raw = spark.read.parquet(slices.map(s0 => s"$tablePath/${s0.path}"): _*)
    val stage = new Path(tablePath, s".graft-cluster-${java.util.UUID.randomUUID()}")
    if (partitionBy.isEmpty) {
      raw.repartition(targetGroups).write.parquet(stage.toString)
    } else {
      val bucketCol =
        if (raw.columns.contains("_hoodie_record_key"))
          pmod(xxhash64(col("_hoodie_record_key")), lit(targetGroups))
        else pmod(xxhash64(raw.columns.map(col).toIndexedSeq: _*), lit(targetGroups))
      val bucketed = partitionBy.foldLeft(raw.withColumn("_g_bucket", bucketCol))(
        (acc, c) => acc.withColumn(s"_p_$c", col(c)))
      bucketed
        .repartition((partitionBy.map(c => col(s"_p_$c")) :+ col("_g_bucket")): _*)
        .drop("_g_bucket")
        .write.partitionBy(partitionBy.map(c => s"_p_$c"): _*)
        .parquet(stage.toString)
    }
    // land staged files under their partition dirs with fresh fileIds
    val writes = Seq.newBuilder[(String, String, String)] // (partition, fileId, rel)
    def walk(dir: Path, partSegs: Seq[String]): Unit =
      fs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) {
          val segs =
            if (name.startsWith("_p_") && name.contains('='))
              partSegs :+ name.substring(3)
            else partSegs
          walk(st.getPath, segs)
        } else if (name.endsWith(".parquet")) {
          val partition = partSegs.mkString("/")
          val fileId = java.util.UUID.randomUUID().toString
          val rel =
            if (partition.isEmpty) s"${fileId}_0-0-0_$instant.parquet"
            else s"$partition/${fileId}_0-0-0_$instant.parquet"
          val dst = new Path(tablePath, rel)
          fs.mkdirs(dst.getParent)
          if (!fs.rename(st.getPath, dst))
            throw new IllegalStateException(s"$tablePath: failed to land clustered file $rel")
          writes += ((partition, fileId, rel))
        }
      }
    walk(stage, Nil)
    fs.delete(stage, true)
    val files = writes.result()
    require(files.nonEmpty, s"$tablePath: clustering staged no files")
    val statsByPartition = files.groupBy(_._1).map { case (part, ws) =>
      val stats = ws.map { case (_, fid, rel) =>
        s"""{"fileId":"$fid","path":"$rel","numWrites":1,"numUpdateWrites":0,""" +
          s""""totalWriteBytes":${fs.getFileStatus(new Path(tablePath, rel)).getLen},""" +
          s""""prevCommit":"null"}"""
      }.mkString(",")
      s""""$part":[$stats]"""
    }.mkString(",")
    // replaced groups keyed by THEIR partition (the reader drops by
    // id; Hudi's own meta keys the replacement per partition)
    val replacedByPartition = groups.groupBy(_.base.map(_.partition).getOrElse(""))
      .map { case (part, gs) =>
        s""""$part":[${gs.map(g => s""""${g.fileId}"""").mkString(",")}]"""
      }.mkString(",")
    val p = new Path(hoodieDir(tablePath), s"$instant.replacecommit")
    val created = try {
      val out = fs.create(p, false)
      try out.write(
        (s"""{"partitionToWriteStats":{$statsByPartition},""" +
          s""""partitionToReplaceFileIds":{$replacedByPartition},""" +
          s""""operationType":"CLUSTER"}""" + "\n").getBytes("UTF-8"))
      finally out.close()
      true
    } catch { case _: java.io.IOException => false }
    if (!created) throw new IllegalStateException(
      s"$tablePath: clustering instant $instant already taken — single-writer contract")
    instant
  }

  /** CLEANER (Hudi's KEEP_LATEST_COMMITS policy): physically delete
    * file slices and log files SUPERSEDED before the retention
    * horizon — the instant `retainLatestInstants` commits from the
    * timeline head. A slice is retained while it is the one serving
    * some as-of time inside the window (i.e. until its SUCCESSOR
    * slice is itself older than the horizon); logs follow their base
    * slice. Groups clustered away by a replacecommit older than the
    * horizon clean entirely. Point-in-time reads past the horizon
    * fail loudly AT SCAN — the contract the reader documents. Driver
    * work is timeline metadata; deletion is |expired files|. Returns
    * the deleted relative paths.
    */
  def clean(spark: SparkSession, tablePath: String,
      retainLatestInstants: Int): Seq[String] = {
    require(retainLatestInstants >= 1, "must retain at least the latest instant")
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val timeline = HudiTableReader.timelineInstants(spark, tablePath, allowMor = true)
    if (timeline.size <= retainLatestInstants) return Nil
    val horizon = timeline(timeline.size - retainLatestInstants)._1
    // full write history per file group, in replay order
    final case class W(instant: String, path: String, isParquet: Boolean)
    val history = scala.collection.mutable.LinkedHashMap.empty[String, Vector[W]]
    val replacedAt = scala.collection.mutable.Map.empty[String, String]
    timeline.foreach { case (instant, kind) =>
      if (kind == "replacecommit")
        HudiTableReader.replacedIdsOf(fs, tablePath, instant)
          .foreach(id => replacedAt(id) = instant)
      HudiTableReader.writesOf(fs, tablePath, instant, kind).foreach { w =>
        history(w.fileId) = history.getOrElse(w.fileId, Vector.empty) :+
          W(instant, w.path, w.path.endsWith(".parquet"))
      }
    }
    val doomed = Seq.newBuilder[String]
    history.foreach { case (fid, writes) =>
      replacedAt.get(fid) match {
        case Some(ri) if ri <= horizon =>
          // the whole group stopped existing before the horizon
          writes.foreach(w => doomed += w.path)
        case _ =>
          // a write is superseded once a LATER parquet slice exists;
          // it cleans when that successor is itself at/before the
          // horizon (nothing inside the window is served by it)
          writes.zipWithIndex.foreach { case (w, i) =>
            val successor = writes.drop(i + 1).find(_.isParquet)
            if (successor.exists(_.instant <= horizon)) doomed += w.path
          }
      }
    }
    val deleted = doomed.result().distinct.sorted
    deleted.foreach { rel =>
      val f = new Path(tablePath, rel)
      if (fs.exists(f)) { fs.delete(f, false): Unit }
    }
    deleted
  }

  /** FILES INDEX (the graft form of Hudi's metadata-table `files`
    * partition): publish the CURRENT per-file-group state — base
    * slice + pending logs per group — as ONE parquet snapshot at
    * `.hoodie/metadata/files/<headInstant>.parquet`. Readers start
    * head-of-timeline planning FROM it and replay only the instants
    * after, so planning cost is O(commits since the index) and the
    * indexed instants' meta files are never opened — the listing
    * bottleneck Hudi's metadata table exists to remove at 100× file
    * counts. Safe by construction: the index names its instant, a
    * reader ignores any index whose instant is off the timeline, and
    * everything after it replays exactly. Returns the indexed
    * instant.
    */
  def writeFilesIndex(spark: SparkSession, tablePath: String): String = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val groups = HudiTableReader.morGroups(spark, tablePath)
    val head = HudiTableReader.latestInstant(spark, tablePath)
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = StructType(Seq(
      StructField("fileId", StringType),
      StructField("partition", StringType),
      StructField("baseInstant", StringType),
      StructField("basePath", StringType),
      StructField("logs", ArrayType(StructType(Seq(
        StructField("instant", StringType), StructField("path", StringType)))))))
    val rows = groups.map { g =>
      Row(g.fileId,
        g.base.map(_.partition).getOrElse(""),
        g.base.map(_.instant).orNull,
        g.base.map(_.path).orNull,
        g.logs.map { case (i, p) => Row(i, p) })
    }
    import scala.jdk.CollectionConverters._
    val dir = new Path(hoodieDir(tablePath), "metadata/files")
    fs.mkdirs(dir)
    // SCHEMA SIDECAR: the index also snapshots the commit-metadata
    // schema authority as of its instant, so post-index reads resolve
    // evolution without re-opening pre-index metas (the listing-free
    // planning contract covers schema resolution too). Landed BEFORE
    // the parquet — an index without its sidecar falls back to the
    // full walk, never to a wrong schema.
    val sidecarBody = HudiTableReader.declaredDataSchema(spark, tablePath)
      .map(HudiSchema.toAvroJson(_)).getOrElse("none")
    val sidecar = fs.create(new Path(dir, s"$head.schema"), true)
    try sidecar.write((sidecarBody + "\n").getBytes("UTF-8")) finally sidecar.close()
    val stage = new Path(tablePath, s".graft-fidx-${java.util.UUID.randomUUID()}")
    spark.createDataFrame(rows.asJava, schema).coalesce(1).write.parquet(stage.toString)
    val part = fs.listStatus(stage).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"$tablePath: files index staged nothing"))
    val dst = new Path(dir, s"$head.parquet")
    fs.delete(dst, false)
    if (!fs.rename(part, dst)) throw new IllegalStateException(
      s"$tablePath: failed to land files index $dst")
    fs.delete(stage, true)
    head
  }

  /** COLUMN-STATS INDEX (the metadata-table `col_stats` partition —
    * the third leg of the stats-based file-skipping triad beside
    * Delta add.stats and Iceberg manifest bounds): per ACTIVE base
    * file, min/max of `columns`, computed in ONE distributed scan
    * (groupBy on the scan's file path — stats never transit the
    * driver row-wise) and published as parquet at
    * `.hoodie/metadata/col_stats/<headInstant>.parquet`.
    * [[HudiTableReader.snapshotSkipping]] prunes files whose recorded
    * range provably misses the asked interval; files written AFTER
    * the index (or absent from it) are conservatively KEPT — skipping
    * cuts I/O, never semantics. COW only (a MOR group's log rows are
    * invisible to base-file stats — refused loudly). Returns the
    * indexed instant.
    */
  def writeColStatsIndex(spark: SparkSession, tablePath: String,
      columns: Seq[String]): String = {
    require(columns.nonEmpty, "writeColStatsIndex needs at least one column")
    val head = HudiTableReader.latestInstant(spark, tablePath)
    // MOR builds GROUP-GRAINED and LOG-AWARE: per-file stats would be
    // blind to log rows, so dirty groups' ranges come from the
    // realtime merge and the prune unit is the file GROUP (rows key
    // `_g_file` by the group id; the reader's MOR branch matches)
    val stats =
      if (HudiTableReader.isMor(spark, tablePath))
        morColStatsOf(spark, tablePath,
          HudiTableReader.morGroups(spark, tablePath), columns)
      else colStatsOf(spark, tablePath,
        HudiTableReader.activeSlices(spark, tablePath), columns)
    landColStats(spark, tablePath, stats, head)
    head
  }

  /** Per-GROUP min/max over MOR `groups`, log-aware: log-free groups
    * scan their base; dirty groups aggregate the realtime merge.
    * Rows key `_g_file` by the GROUP id. */
  private def morColStatsOf(spark: SparkSession, tablePath: String,
      groups: Seq[HudiTableReader.GroupSlices], columns: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col => c, max => mx, min => mn}
    val clean = groups.filter(_.logs.isEmpty)
    val dirty = groups.filter(_.logs.nonEmpty)
    val cleanStats = {
      val slices = clean.flatMap(_.base)
      val perFile = colStatsOf(spark, tablePath, slices, columns)
      val fidOf = clean.flatMap(g => g.base.map(b => b.path -> g.fileId)).toMap
      remapFileCol(spark, perFile, fidOf, "_g_file")
    }
    if (dirty.isEmpty) return cleanStats
    val schema = HudiTableReader.morSchema(spark, tablePath, groups)
    columns.foreach(cn => require(schema.fieldNames.contains(cn),
      s"$tablePath: col-stats column $cn is not a table column"))
    val aggs = columns.flatMap(cn =>
      Seq(mn(c(cn)).as(s"min_$cn"), mx(c(cn)).as(s"max_$cn")))
    val dirtyStats = HudiTableReader
      .mergeDirtyGroups(spark, tablePath, dirty, schema, keepFileId = true)
      .groupBy(c("_g_fid").as("_g_file"))
      .agg(aggs.head, aggs.tail: _*)
    if (clean.isEmpty) dirtyStats else cleanStats.unionByName(dirtyStats)
  }

  /** Replace `colName` string values through a driver-known
    * (|files|-bounded) mapping via a BROADCAST join — the uniform
    * post-aggregate path-remapping shape ([[recordEntriesOf]] set the
    * pattern for the hot path; these frames are |files|-row, but the
    * join keeps the plan UDF-free and codegen-clean everywhere).
    * Unmatched values pass through unchanged. */
  private def remapFileCol(spark: SparkSession, df: DataFrame,
      mapping: Map[String, String], colName: String): DataFrame = {
    import org.apache.spark.sql.functions.{col => c, broadcast, coalesce}
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    if (mapping.isEmpty) return df
    val rows = mapping.toSeq.map { case (k, v) => org.apache.spark.sql.Row(k, v) }
    val mapDf = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("_g_map_from", StringType), StructField("_g_map_to", StringType))))
    df.join(broadcast(mapDf), df(colName) === mapDf("_g_map_from"), "left")
      .withColumn(colName, coalesce(c("_g_map_to"), c(colName)))
      .drop("_g_map_from", "_g_map_to")
  }

  /** Per-file min/max of `columns` over `slices`, in ONE distributed
    * scan (groupBy on the scan's file path — stats never transit the
    * driver row-wise). Empty slices produce an empty, schema-correct
    * frame without any scan job. */
  private def colStatsOf(spark: SparkSession, tablePath: String,
      slices: Seq[HudiTableReader.SliceWrite], columns: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col => c, max => mx, min => mn}
    require(slices.nonEmpty || columns.nonEmpty, "colStatsOf needs columns")
    if (slices.isEmpty) {
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      // min/max types are unknown with no file to scan; stats land as
      // strings only when there is genuinely nothing to record —
      // callers union by NAME against a typed existing index, and an
      // EMPTY frame contributes no rows of any type
      val fields = StructField("_g_file", StringType) +: columns.flatMap(cn =>
        Seq(StructField(s"min_$cn", StringType), StructField(s"max_$cn", StringType)))
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(fields))
    }
    val absToRel = slices.map(s0 =>
      ScanPaths.normalizeDriver(s"$tablePath/${s0.path}") -> s0.path).toMap
    val scan = spark.read.parquet(slices.map(s0 => s"$tablePath/${s0.path}"): _*)
      .withColumn("_g_file", ScanPaths.normalizeScan(c("_metadata.file_path")))
    columns.foreach(cn => require(scan.columns.contains(cn),
      s"$tablePath: col-stats column $cn is not a table column"))
    val aggs = columns.flatMap(cn =>
      Seq(mn(c(cn)).as(s"min_$cn"), mx(c(cn)).as(s"max_$cn")))
    remapFileCol(spark,
      scan.groupBy(c("_g_file")).agg(aggs.head, aggs.tail: _*),
      absToRel, "_g_file")
  }

  private def landColStats(spark: SparkSession, tablePath: String,
      stats: DataFrame, head: String): Unit = {
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(hoodieDir(tablePath), "metadata/col_stats")
    fs.mkdirs(dir)
    val stage = new Path(tablePath, s".graft-cstats-${java.util.UUID.randomUUID()}")
    stats.coalesce(1).write.parquet(stage.toString)
    val part = fs.listStatus(stage).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"$tablePath: col-stats staged nothing"))
    val dst = new Path(dir, s"$head.parquet")
    fs.delete(dst, false)
    if (!fs.rename(part, dst)) throw new IllegalStateException(
      s"$tablePath: failed to land col-stats index $dst")
    fs.delete(stage, true)
  }

  /** INCREMENTAL col-stats maintenance (hudi.apache.org: the metadata
    * table maintains its indexes PER COMMIT, never by rescanning the
    * table). Data files are immutable, so existing per-file stats
    * carry forward verbatim: the refresh scans ONLY files absent from
    * the newest index (require-proven in-run against the scan's
    * inputFiles), drops entries for files no longer active, and lands
    * the union at the head instant — O(new files) data I/O +
    * O(|files|) metadata, flat in table size. The indexed column set
    * comes from the existing index's own schema. No usable index →
    * refuses (the column choice belongs to [[writeColStatsIndex]]).
    * Returns the indexed head instant.
    */
  def refreshColStatsIndex(spark: SparkSession, tablePath: String): String = {
    val mor = HudiTableReader.isMor(spark, tablePath)
    val dir = new Path(hoodieDir(tablePath), "metadata/col_stats")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onTimeline = HudiTableReader
      .timelineInstants(spark, tablePath, allowMor = true).map(_._1).toSet
    val usable =
      if (!fs.exists(dir)) Nil
      else fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet"))
        .filter(onTimeline.contains).toSeq
    require(usable.nonEmpty,
      s"$tablePath: no col-stats index on the timeline to refresh — writeColStatsIndex first")
    val pick = usable.max
    val head = HudiTableReader.latestInstant(spark, tablePath)
    if (head == pick) return pick
    val old = spark.read.parquet(new Path(dir, s"$pick.parquet").toString)
    val columns = old.columns.toIndexedSeq
      .filter(_.startsWith("min_")).map(_.stripPrefix("min_"))
    // the old index's entry list is metadata-bounded driver work —
    // the same budget the slice/group listing itself already spends
    val known = old.select("_g_file").collect().map(_.getString(0)).toSet
    import org.apache.spark.sql.functions.{col => c}
    val (freshStats, allowed, current, freshKeys) =
      if (mor) {
        // a group with ANY activity after the index instant recomputes
        // through the log-aware merge; untouched groups carry forward
        val groups = HudiTableReader.morGroups(spark, tablePath)
        val fresh = groups.filter { g =>
          val newest = (g.base.map(_.instant) ++ g.logs.map(_._1)).max
          !known.contains(g.fileId) || newest > pick
        }
        (morColStatsOf(spark, tablePath, fresh, columns),
          fresh.flatMap(_.base).map(b =>
            ScanPaths.normalizeDriver(s"$tablePath/${b.path}")).toSet,
          groups.map(_.fileId).toSet,
          fresh.map(_.fileId).toSet)
      } else {
        val slices = HudiTableReader.activeSlices(spark, tablePath)
        val fresh = slices.filterNot(s0 => known.contains(s0.path))
        (colStatsOf(spark, tablePath, fresh, columns),
          fresh.map(s0 =>
            ScanPaths.normalizeDriver(s"$tablePath/${s0.path}")).toSet,
          slices.map(_.path).toSet,
          fresh.map(_.path).toSet)
      }
    // the incremental contract: the refresh may read the NEW (or, on
    // MOR, the post-index-touched) files and nothing else — at 100 TB
    // a full rescan is the cost the index exists to remove
    val scanned = freshStats.inputFiles.map(ScanPaths.normalizeDriver).toSet
    require(scanned.subsetOf(allowed),
      s"$tablePath: col-stats refresh escaped the increment — " +
        s"scanned ${(scanned -- allowed).take(3).mkString(",")}")
    val carried = current -- freshKeys
    val keep = if (carried.isEmpty) old.limit(0)
      else old.where(c("_g_file").isInCollection(carried))
    val merged = if (freshKeys.isEmpty) keep else keep.unionByName(freshStats)
    landColStats(spark, tablePath, merged, head)
    head
  }

  /** BLOOM-FILTER INDEX (the metadata-table `bloom_filters`
    * partition — the fourth standard Hudi metadata partition beside
    * `files`/`col_stats`/`record_index`, the UPSERT-PROBE
    * accelerator): one k=1 Bloom filter per active base file over its
    * `_hoodie_record_key` values — `xxhash64(key) pmod m`, stored as
    * the sorted array of set bucket positions (bounded at m ints per
    * file, exact enough to re-derive cross-engine) — published at
    * `.hoodie/metadata/bloom_filters/<headInstant>.parquet` from ONE
    * distributed scan whose per-file collect_set partial combines
    * map-side. [[upsert]] consults it to skip file groups PROVABLY
    * holding none of the batch's keys (false positives cost extra
    * scan, never correctness; files absent from the index are
    * conservatively kept). COW only, like its sibling partitions.
    * Returns the indexed instant.
    */
  def writeBloomIndex(spark: SparkSession, tablePath: String,
      m: Int = 1 << 16): String = {
    require(m >= 2, s"m must be >= 2, got $m")
    require(!HudiTableReader.isMor(spark, tablePath),
      s"$tablePath: the bloom index is COW machinery — MOR log rows are invisible " +
        "to base-file keys; compact first")
    require(declaredRecordKeys(spark, tablePath).nonEmpty,
      s"$tablePath: the bloom index filters record keys — the table declares none")
    val slices = HudiTableReader.activeSlices(spark, tablePath)
    val head = HudiTableReader.latestInstant(spark, tablePath)
    landBloomIndex(spark, tablePath, bloomRowsOf(spark, tablePath, slices, m), head)
    head
  }

  /** INCREMENTAL bloom-index maintenance: per-file filters over
    * immutable files carry forward verbatim; the refresh scans ONLY
    * files absent from the newest index (require-proven), drops dead
    * entries, keeps the existing `m`. No index → refuses. Returns the
    * indexed head instant.
    */
  def refreshBloomIndex(spark: SparkSession, tablePath: String): String = {
    require(!HudiTableReader.isMor(spark, tablePath),
      s"$tablePath: the bloom index is COW machinery; compact first")
    val dir = new Path(hoodieDir(tablePath), "metadata/bloom_filters")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onTimeline = HudiTableReader.instants(spark, tablePath).map(_._1).toSet
    val usable =
      if (!fs.exists(dir)) Nil
      else fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet"))
        .filter(onTimeline.contains).toSeq
    require(usable.nonEmpty,
      s"$tablePath: no bloom index on the timeline to refresh — writeBloomIndex first")
    val pick = usable.max
    val head = HudiTableReader.latestInstant(spark, tablePath)
    if (head == pick) return pick
    val old = spark.read.parquet(new Path(dir, s"$pick.parquet").toString)
    val mIdx = old.select("m").limit(1).collect()
      .headOption.map(_.getLong(0).toInt).getOrElse(1 << 16)
    val slices = HudiTableReader.activeSlices(spark, tablePath)
    val known = old.select("_g_file").collect().map(_.getString(0)).toSet
    val currentPaths = slices.map(_.path).toSet
    val fresh = slices.filterNot(s0 => known.contains(s0.path))
    val freshRows = bloomRowsOf(spark, tablePath, fresh, mIdx)
    val allowed = fresh.map(s0 =>
      ScanPaths.normalizeDriver(s"$tablePath/${s0.path}")).toSet
    val scanned = freshRows.inputFiles.map(ScanPaths.normalizeDriver).toSet
    require(scanned.subsetOf(allowed),
      s"$tablePath: bloom-index refresh escaped the new-file set")
    import org.apache.spark.sql.functions.{col => c}
    val keep = old.where(c("_g_file").isInCollection(currentPaths))
    val merged = if (fresh.isEmpty) keep else keep.unionByName(freshRows)
    landBloomIndex(spark, tablePath, merged, head)
    head
  }

  private def bloomRowsOf(spark: SparkSession, tablePath: String,
      slices: Seq[HudiTableReader.SliceWrite], m: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col => c, _}
    if (slices.isEmpty) {
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("_g_file", StringType),
          StructField("bits", ArrayType(LongType, containsNull = false)),
          StructField("m", LongType))))
    }
    val absToRel = slices.map(s0 =>
      ScanPaths.normalizeDriver(s"$tablePath/${s0.path}") -> s0.path).toMap
    remapFileCol(spark,
      spark.read.parquet(slices.map(s0 => s"$tablePath/${s0.path}"): _*)
        .select(c("_hoodie_record_key").as("_g_key"),
          ScanPaths.normalizeScan(c("_metadata.file_path")).as("_g_file"))
        .groupBy(c("_g_file"))
        .agg(sort_array(collect_set(
          pmod(xxhash64(c("_g_key")), lit(m.toLong)))).as("bits"))
        .withColumn("m", lit(m.toLong)),
      absToRel, "_g_file")
  }

  private def landBloomIndex(spark: SparkSession, tablePath: String,
      rows: DataFrame, head: String): Unit = {
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(hoodieDir(tablePath), "metadata/bloom_filters")
    fs.mkdirs(dir)
    val stage = new Path(tablePath, s".graft-bloom-${java.util.UUID.randomUUID()}")
    rows.coalesce(1).write.parquet(stage.toString)
    val part = fs.listStatus(stage).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"$tablePath: bloom index staged nothing"))
    val dst = new Path(dir, s"$head.parquet")
    fs.delete(dst, false)
    if (!fs.rename(part, dst)) throw new IllegalStateException(
      s"$tablePath: failed to land bloom index $dst")
    fs.delete(stage, true)
  }

  /** The slices an UPSERT's key-matching scan must read, through the
    * newest usable bloom index: groups whose filter proves every
    * batch key absent drop out (their rows can only be carried, and
    * untouched groups never rewrite); files absent from the index —
    * or an index off the timeline — keep conservatively. `probes` is
    * one string column `_g_probe` of candidate `_hoodie_record_key`
    * forms (callers pass BOTH the `field:value` and raw single-key
    * forms — a superset of buckets can only widen the scan, never
    * miss an update). All-pruned returns one schema-keeping slice.
    */
  private[sources] def bloomPruneSlices(spark: SparkSession, tablePath: String,
      slices: Seq[HudiTableReader.SliceWrite],
      probes: DataFrame): Seq[HudiTableReader.SliceWrite] = {
    import org.apache.spark.sql.functions.{col => c, _}
    val dir = new Path(hoodieDir(tablePath), "metadata/bloom_filters")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return slices
    val onTimeline = HudiTableReader.instants(spark, tablePath).map(_._1).toSet
    val usable = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet"))
      .filter(onTimeline.contains).toSeq
    if (usable.isEmpty) return slices
    val idx = spark.read.parquet(new Path(dir, s"${usable.max}.parquet").toString)
    val mRow = idx.select("m").limit(1).collect().headOption
    if (mRow.isEmpty) return slices
    val mIdx = mRow.get.getLong(0)
    // the probe BUCKET set is bounded by m, not by batch size
    val probeBuckets = probes
      .select(pmod(xxhash64(c("_g_probe")), lit(mIdx)).as("b"))
      .distinct().collect().map(_.getLong(0))
    val verdicts = idx.select(c("_g_file"),
        arrays_overlap(c("bits"), typedLit(probeBuckets)).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val kept = slices.filter(s0 => verdicts.getOrElse(s0.path, true))
    if (kept.nonEmpty) kept else slices.take(1)
  }

  /** RECORD-LEVEL INDEX (the metadata-table `record_index` partition
    * — the third leg beside `files` and `col_stats`): one distributed
    * scan of the active slices publishes (record key → file group id)
    * at `.hoodie/metadata/record_index/<headInstant>/` as a
    * key-range-clustered parquet DIRECTORY (row-per-record — a single
    * file would serialize the whole key space through one task; the
    * range clustering is what makes a point lookup's `key IN (…)`
    * prune to one or two index files via footer min/max).
    * [[HudiTableReader.pointLookup]] starts from it and adds only the
    * file groups post-index instants touched. MOR tables build
    * LOG-AWARE: dirty groups resolve through the realtime merge (log
    * inserts index, tombstones drop) with the group id threaded — no
    * compact-first migration. Returns the indexed instant.
    */
  def writeRecordIndex(spark: SparkSession, tablePath: String,
      indexFiles: Int = 32): String = {
    val keys = declaredRecordKeys(spark, tablePath)
    require(keys.nonEmpty,
      s"$tablePath: the record index maps record keys — the table declares none " +
        "(hoodie.table.recordkey.fields)")
    val head = HudiTableReader.latestInstant(spark, tablePath)
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    import org.apache.spark.sql.functions.{col => c}
    // MOR builds LOG-AWARE: the realtime merge already resolves each
    // group's live keys (log inserts visible, tombstones dropped) and
    // threads the group id through — no compact-first migration
    val entries =
      if (HudiTableReader.isMor(spark, tablePath))
        morRecordEntriesOf(spark, tablePath, HudiTableReader.morGroups(spark, tablePath))
      else recordEntriesOf(spark, tablePath, HudiTableReader.activeSlices(spark, tablePath))
    val dir = new Path(hoodieDir(tablePath), "metadata/record_index")
    fs.mkdirs(dir)
    val stage = new Path(tablePath, s".graft-ridx-${java.util.UUID.randomUUID()}")
    // persist across the range-partitioner's SAMPLING pass + the
    // write: without it the entries subtree (on MOR, the realtime
    // merge of every dirty group) evaluates twice per build
    entries.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try entries.repartitionByRange(indexFiles, c("key")).sortWithinPartitions(c("key"))
      .write.parquet(stage.toString)
    finally entries.unpersist()
    val dst = new Path(dir, head)
    fs.delete(dst, true)
    if (!fs.rename(stage, dst)) throw new IllegalStateException(
      s"$tablePath: failed to land record index $dst")
    // a full rebuild SUPERSEDES every older generation: deltas whose
    // instant precedes the new base are dead weight, and deltas AT
    // the same instant would double-serve — clear the chain
    fs.listStatus(dir).map(_.getPath).filter { p =>
      val n = p.getName
      n.endsWith(".delta") && n.stripSuffix(".delta") <= head
    }.foreach(p => fs.delete(p, true): Unit)
    head
  }

  /** (record key → file group id) over MOR `groups`, LOG-AWARE:
    * log-free groups scan their base like COW; dirty groups resolve
    * through the realtime merge with the group id threaded — log
    * inserts index, tombstoned keys drop. The shuffle is bounded by
    * the DIRTY groups' bytes. */
  private def morRecordEntriesOf(spark: SparkSession, tablePath: String,
      groups: Seq[HudiTableReader.GroupSlices]): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    val clean = groups.filter(_.logs.isEmpty).flatMap(_.base)
    val dirty = groups.filter(_.logs.nonEmpty)
    val cleanE = recordEntriesOf(spark, tablePath, clean)
    if (dirty.isEmpty) return cleanE
    val schema = HudiTableReader.morSchema(spark, tablePath, groups)
    require(schema.fieldNames.contains("_hoodie_record_key"),
      s"$tablePath: base/log schema carries no _hoodie_record_key — the log merge " +
        "has no record identity to index on")
    val dirtyE = HudiTableReader
      .mergeDirtyGroups(spark, tablePath, dirty, schema, keepFileId = true)
      .select(c("_hoodie_record_key").as("key"), c("_g_fid").as("fileId"))
    if (clean.isEmpty) dirtyE else cleanE.unionByName(dirtyE)
  }

  /** (record key → file group id) over `slices`' base files, one
    * distributed scan. The file→fileId mapping attaches via a
    * BROADCAST join of a (path, fileId) frame against
    * `_metadata.file_path` — |file groups|-bounded like the old
    * driver-map UDF, but the scan stays inside whole-stage codegen
    * (a Scala UDF on the hot path would break it for every record
    * scanned). Empty slices produce an empty, schema-correct frame
    * without any scan job. */
  private[sources] def recordEntriesOf(spark: SparkSession, tablePath: String,
      slices: Seq[HudiTableReader.SliceWrite]): DataFrame = {
    import org.apache.spark.sql.functions.{col => c, broadcast}
    if (slices.isEmpty) {
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("key", StringType), StructField("fileId", StringType))))
    }
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val fidRows = slices.map(s0 => org.apache.spark.sql.Row(
      ScanPaths.normalizeDriver(s"$tablePath/${s0.path}"), s0.fileId))
    val fidDf = spark.createDataFrame(fidRows.asJava, StructType(Seq(
      StructField("_g_file", StringType), StructField("fileId", StringType))))
    spark.read.parquet(slices.map(s0 => s"$tablePath/${s0.path}"): _*)
      .select(c("_hoodie_record_key").as("key"),
        ScanPaths.normalizeScan(c("_metadata.file_path")).as("_g_file"))
      .join(broadcast(fidDf), Seq("_g_file"), "left")
      .select(c("key"), c("fileId"))
  }

  /** INCREMENTAL record-index maintenance (hudi.apache.org: the
    * metadata table maintains its indexes PER COMMIT — a full rebuild
    * is the O(table) scan the index exists to avoid). Folds every
    * commit after the newest indexed instant into the index as ONE
    * delta generation at `metadata/record_index/<head>.delta/`:
    * (key → fileId) re-enumerated for exactly the file groups those
    * commits touched — plus groups a clustering REPLACED — with a
    * `_covered` sidecar naming them. A reader treats a covered
    * group's older bindings as dead, so deleted keys never resurrect
    * and moved keys resolve to their new group (the mover's commit
    * wrote that group, so the same delta carries the new binding).
    * The refresh scans ONLY the touched groups' current slices,
    * require-proven in-run against the scan's inputFiles: O(commits
    * since the index), flat in table size. Crash-safe: the sidecar
    * lands inside the staged directory BEFORE the atomic rename, so
    * a visible delta is always complete. After `maxDeltas`
    * generations the refresh COMPACTS — one [[writeRecordIndex]]
    * rebuild resets the chain (the base+delta+compact lifecycle of
    * MOR itself, applied to the index). Returns the indexed instant.
    */
  def refreshRecordIndex(spark: SparkSession, tablePath: String,
      maxDeltas: Int = 16): String = {
    val mor = HudiTableReader.isMor(spark, tablePath)
    val dir = new Path(hoodieDir(tablePath), "metadata/record_index")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val timeline = HudiTableReader.timelineInstants(spark, tablePath, allowMor = true)
    val onTimeline = timeline.map(_._1).toSet
    val gens =
      if (!fs.exists(dir)) Array.empty[String]
      else fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
    val fulls = gens.filter(g => !g.endsWith(".delta") && onTimeline.contains(g))
    // nothing to fold into, or a chain long enough that lookups pay
    // |deltas| probes: (re)build the base
    if (fulls.isEmpty) return writeRecordIndex(spark, tablePath)
    val base = fulls.max
    val deltas = gens.filter(_.endsWith(".delta")).map(_.stripSuffix(".delta"))
      .filter(i => onTimeline.contains(i) && i > base).sorted.toIndexedSeq
    if (deltas.size >= maxDeltas) return writeRecordIndex(spark, tablePath)
    val idxHead = (base +: deltas).max
    val newer = timeline.filter(_._1 > idxHead)
    if (newer.isEmpty) return idxHead
    val head = newer.map(_._1).max
    val covered: Set[String] = newer.flatMap { case (i, k) =>
      HudiTableReader.writesOf(fs, tablePath, i, k).map(_.fileId) ++
        (if (k == "replacecommit") HudiTableReader.replacedIdsOf(fs, tablePath, i)
         else Set.empty[String])
    }.toSet
    // the fold re-enumerates ONLY the touched groups — on MOR through
    // the log-aware realtime merge of those groups (a deltacommit's
    // log append makes its whole group's binding set current again)
    val (entries, allowed, nCovered) =
      if (mor) {
        val groups = HudiTableReader.morGroups(spark, tablePath)
          .filter(g => covered.contains(g.fileId))
        (morRecordEntriesOf(spark, tablePath, groups),
          groups.flatMap(_.base).map(b =>
            ScanPaths.normalizeDriver(s"$tablePath/${b.path}")).toSet,
          groups.size)
      } else {
        val slices = HudiTableReader.activeSlices(spark, tablePath)
          .filter(s0 => covered.contains(s0.fileId))
        (recordEntriesOf(spark, tablePath, slices),
          slices.map(s0 =>
            ScanPaths.normalizeDriver(s"$tablePath/${s0.path}")).toSet,
          slices.size)
      }
    // the incremental contract: the refresh reads the TOUCHED groups
    // and nothing else (MOR log blocks decode inside tasks; the plan's
    // inputFiles are the touched groups' base files)
    val scanned = entries.inputFiles.map(ScanPaths.normalizeDriver).toSet
    require(scanned.subsetOf(allowed),
      s"$tablePath: record-index refresh escaped the touched-group set — " +
        s"scanned ${(scanned -- allowed).take(3).mkString(",")}")
    import org.apache.spark.sql.functions.{col => c}
    val stage = new Path(tablePath, s".graft-ridxd-${java.util.UUID.randomUUID()}")
    // deltas are commit-sized: a handful of range-clustered files keep
    // the lookup's IN-filter footer pruning without tiny-file litter.
    // persist spans the range sampling + the write (same double-
    // evaluation hazard as the full build).
    entries.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try entries.repartitionByRange(math.min(8, math.max(1, nCovered)), c("key"))
      .sortWithinPartitions(c("key"))
      .write.parquet(stage.toString)
    finally entries.unpersist()
    val sidecar = fs.create(new Path(stage, "_covered"), true)
    try sidecar.write((covered.toSeq.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally sidecar.close()
    val dst = new Path(dir, s"$head.delta")
    fs.delete(dst, true)
    if (!fs.rename(stage, dst)) throw new IllegalStateException(
      s"$tablePath: failed to land record-index delta $dst")
    head
  }

  /** TIMELINE ARCHIVAL (Hudi's own archival service move): rotate all
    * completed instants except the newest `keepLast` out of the
    * active `.hoodie` listing into `.hoodie/archived/` — what keeps
    * the active listing O(recent commits) on long-running tables
    * (the reference's own tables would cross the archival horizon in
    * weeks, template.py:304). The archive file is the PUBLIC Hudi
    * log-file container ([[HudiLog]] — same codec as MOR logs, how
    * Hudi's own service writes archives) holding one Avro data block
    * of (commitTime, actionType, metadata) entries;
    * [[HudiTableReader.archivedEntries]] replays them UNDER the
    * active timeline, so every read keeps seeing file groups written
    * only by archived instants. Crash-safe ordering: the archive
    * lands BEFORE active meta files are removed (a crash in between
    * leaves an instant in both places; the reader serves the active
    * copy and dedupes). Returns the number of instants archived.
    */
  def archiveTimeline(spark: SparkSession, tablePath: String, keepLast: Int): Int = {
    require(keepLast >= 1, "keepLast must be >= 1 — the timeline head stays active")
    val dir = hoodieDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(dir).filter(_.isFile).map(_.getPath.getName)
      .filterNot(n => n.contains(".requested") || n.contains(".inflight"))
    val completed = names.collect {
      case n if n.endsWith(".replacecommit") => (n.stripSuffix(".replacecommit"), "replacecommit")
      case n if n.endsWith(".deltacommit") => (n.stripSuffix(".deltacommit"), "deltacommit")
      case n if n.endsWith(".commit") => (n.stripSuffix(".commit"), "commit")
    }.sortBy(_._1).toIndexedSeq
    val toArchive = completed.dropRight(keepLast)
    if (toArchive.isEmpty) return 0
    val schemaJson =
      """{"type":"record","name":"archived_instant","fields":[""" +
        """{"name":"commitTime","type":"string"},""" +
        """{"name":"actionType","type":"string"},""" +
        """{"name":"metadata","type":"string"}]}"""
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val writer = new org.apache.avro.generic.GenericDatumWriter[
      org.apache.avro.generic.GenericRecord](schema)
    val records = toArchive.map { case (instant, kind) =>
      val p = new Path(dir, s"$instant.$kind")
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val r = new org.apache.avro.generic.GenericData.Record(schema)
      r.put("commitTime", instant); r.put("actionType", kind); r.put("metadata", text)
      val bos = new java.io.ByteArrayOutputStream()
      val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(bos, null)
      writer.write(r, enc); enc.flush()
      bos.toByteArray
    }
    val archDir = new Path(dir, "archived")
    fs.mkdirs(archDir)
    val seqNo = fs.listStatus(archDir)
      .count(_.getPath.getName.startsWith(".commits_.archive.")) + 1
    HudiLog.write(spark.sparkContext.hadoopConfiguration,
      new Path(archDir, s".commits_.archive.$seqNo").toString,
      Seq(HudiLog.DataBlock(toArchive.last._1, schemaJson, records)))
    // only after the archive is durable do the active copies go
    toArchive.foreach { case (instant, kind) =>
      fs.delete(new Path(dir, s"$instant.$kind"), false): Unit
      Seq(s"$instant.$kind.requested", s"$instant.$kind.inflight",
        s"$instant.requested", s"$instant.inflight").foreach { leftover =>
        val p = new Path(dir, leftover)
        if (fs.exists(p)) { fs.delete(p, false): Unit }
      }
    }
    toArchive.size
  }

  /** COMPACTION: fold every file group's pending logs into a new base
    * file under an ordinary `.commit` — after it, the read-optimized
    * view equals the real-time view again. One distributed merge job
    * (bounded by the DIRTY groups' bytes), one driver commit bounded
    * by |dirty groups|. Returns the compaction instant.
    */
  def compact(spark: SparkSession, tablePath: String): String = {
    val groups = HudiTableReader.morGroups(spark, tablePath)
    val dirty = groups.filter(_.logs.nonEmpty)
    if (dirty.isEmpty) throw new IllegalArgumentException(
      s"$tablePath: nothing to compact — no file group carries pending log files")
    val schema = HudiTableReader.morSchema(spark, tablePath, groups)
    val merged = HudiTableReader.mergeDirtyGroups(spark, tablePath, dirty, schema,
      keepFileId = true)
    val instant = instantNow(0L)
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new Path(tablePath, s".graft-compact-${java.util.UUID.randomUUID()}")
    // repartition by group THEN partitionBy: each group lands in one
    // task, so exactly one file per group directory
    merged.repartition(col("_g_fid")).write.partitionBy("_g_fid").parquet(stage.toString)
    val stats = dirty.map { g =>
      val partition = g.base
        .map(_.path.split('/').dropRight(1).mkString("/")).getOrElse("")
      val name = s"${g.fileId}_0-0-0_$instant.parquet"
      val rel = if (partition.isEmpty) name else s"$partition/$name"
      fs.mkdirs(new Path(tablePath, rel).getParent)
      val dirPath = new Path(stage, s"_g_fid=${g.fileId}")
      if (fs.exists(dirPath)) {
        val part = fs.listStatus(dirPath).map(_.getPath)
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(
            s"$tablePath: compaction stage for ${g.fileId} wrote no parquet"))
        if (!fs.rename(part, new Path(tablePath, rel))) throw new IllegalStateException(
          s"$tablePath: failed to land compacted base $rel")
      } else {
        // every record tombstoned: an explicit EMPTY base still
        // repoints the slice and clears the group's logs
        val emptyStage = new Path(tablePath, s".graft-compact-empty-${g.fileId}")
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
          .coalesce(1).write.parquet(emptyStage.toString)
        val part = fs.listStatus(emptyStage).map(_.getPath)
          .find(_.getName.endsWith(".parquet")).get
        if (!fs.rename(part, new Path(tablePath, rel))) throw new IllegalStateException(
          s"$tablePath: failed to land empty compacted base $rel")
        fs.delete(emptyStage, true): Unit
      }
      (g.fileId, rel)
    }
    fs.delete(stage, true)
    val statsJson = stats.groupBy { case (_, rel) =>
      rel.split('/').dropRight(1).mkString("/") }.map { case (part, ws) =>
      val inner = ws.map { case (fid, rel) =>
        s"""{"fileId":"$fid","path":"$rel","numWrites":1,"numUpdateWrites":0,""" +
          s""""totalWriteBytes":${fs.getFileStatus(new Path(tablePath, rel)).getLen},""" +
          s""""prevCommit":"null"}"""
      }.mkString(",")
      s""""$part":[$inner]"""
    }.mkString(",")
    val p = new Path(hoodieDir(tablePath), s"$instant.commit")
    val created = try {
      val out = fs.create(p, false)
      try out.write(
        (s"""{"partitionToWriteStats":{$statsJson},"operationType":"COMPACT"}""" + "\n")
          .getBytes("UTF-8"))
      finally out.close()
      true
    } catch { case _: java.io.IOException => false }
    if (!created) throw new IllegalStateException(
      s"$tablePath: compaction instant $instant already taken — single-writer contract")
    instant
  }
}
