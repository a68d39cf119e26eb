package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Snapshot ("FULL") table loading — the graft analog of the
  * reference's full Hudi load → temp view
  * (reference: template.py:304-305).
  *
  * Tables are parquet under `dir/<name>.parquet`. Loading is lazy and
  * declarative: Catalyst pushes filters/projections from downstream
  * operators into the scan, so registering every table in a pipeline
  * spec costs nothing until the transform actually reads it.
  */
object TableLoader {

  /** Read one table as a DataFrame. Nanosecond parquet timestamps
    * (which Spark reads as raw longs under
    * `spark.sql.legacy.parquet.nanosAsLong=true`) are normalized to
    * TIMESTAMP_NTZ at microsecond precision — the testdata `events.ts`
    * values are micro-aligned, so the narrowing is lossless.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = spark.read.schema(probedSchema(spark, path)).parquet(path)
    if (name == "events") normalizeNanos(df, "ts") else df
  }

  /** Footer schema probe, cached per (path, content fingerprint) —
    * the same design [[graft.streaming.EventStream]] uses for its
    * stream sources (r9 bench): without it EVERY `table()` call pays
    * a one-task schema-inference job before the real scan, a fixed
    * ~40-60 ms tax × ~400 loads per bench pass. One FS listing (no
    * footer I/O) fingerprints the content, so a rewritten or grown
    * path re-probes while repeat loads of the same bytes hit the
    * cache. The schema still always comes from the files' own
    * footers — this caches METADATA of an unchanged input, never
    * query results.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  private def probedSchema(spark: SparkSession,
      path: String): org.apache.spark.sql.types.StructType = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val statuses = if (st.isDirectory) fs.listStatus(p).toSeq else Seq(st)
    val fp = statuses
      .map(s => s"${s.getPath.getName}@${s.getModificationTime}:${s.getLen}")
      .sorted.mkString(";")
    schemaCache.computeIfAbsent(s"$path|$fp", _ => spark.read.parquet(path).schema)
  }

  /** Convert a raw nanos-since-epoch long column into TIMESTAMP_NTZ.
    * Integer `div` (not `/`) — epoch nanos exceed 2^53 and would lose
    * precision through a double.
    */
  def normalizeNanos(df: DataFrame, column: String): DataFrame =
    if (df.schema.fieldNames.contains(column) && df.schema(column).dataType == LongType)
      df.withColumn(column, timestamp_micros(expr(s"$column div 1000")).cast("timestamp_ntz"))
    else df

  /** Epoch nanos of a UTC wall-clock timestamp string — for pushing a
    * timestamp watermark down onto a RAW nanos-long column (a filter
    * on the normalized column is post-scan; a filter on the raw long
    * reaches the parquet reader as a pushed predicate).
    */
  def toEpochNanos(timestamp: String): Long = {
    val t = java.time.LocalDateTime.parse(timestamp.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
    t.getEpochSecond * 1000000000L + t.getNano
  }

  /** Read a table and register it as a temp view under its own name,
    * mirroring the reference's `createOrReplaceTempView(table_name)`.
    */
  def register(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = table(spark, dir, name)
    df.createOrReplaceTempView(name)
    df
  }

  /** The detected on-disk layout of a table directory. */
  sealed trait TableFormat
  case object GraftVersioned extends TableFormat
  case object DeltaFormat extends TableFormat
  case object HudiFormat extends TableFormat
  case object IcebergFormat extends TableFormat
  case object PlainParquet extends TableFormat

  /** Detect the layout of `path` from its on-disk markers — each
    * format's own self-identification: graft's `vNNNNNNNN` commit
    * dirs, Delta's `_delta_log`, Hudi's `.hoodie`, Iceberg's
    * `metadata` dir holding `.metadata.json` files; anything else is
    * a plain parquet directory. Pure FS metadata, no data I/O.
    */
  def detectFormat(spark: SparkSession, path: String): TableFormat = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(child: String) = fs.exists(new org.apache.hadoop.fs.Path(p, child))
    if (exists("_delta_log")) DeltaFormat
    else if (exists(".hoodie")) HudiFormat
    else if (exists("metadata") &&
        fs.listStatus(new org.apache.hadoop.fs.Path(p, "metadata"))
          .exists(_.getPath.getName.endsWith(".metadata.json"))) IcebergFormat
    else if (fs.exists(p) && fs.listStatus(p).exists(st =>
        st.isDirectory && st.getPath.getName.matches("v\\d{8}"))) GraftVersioned
    else PlainParquet
  }

  /** "Point the engine at an EXISTING table" — the reference's whole
    * entry point (template.py:207-217), format-agnostic: detect the
    * layout and snapshot-read it through the matching adapter. A user
    * of the reference switches by changing nothing but the path.
    */
  def open(spark: SparkSession, path: String): DataFrame = detectFormat(spark, path) match {
    case GraftVersioned => UpsertWriter.read(spark, path)
    case DeltaFormat    => DeltaTableReader.snapshot(spark, path)
    case HudiFormat     => HudiTableReader.snapshot(spark, path)
    case IcebergFormat  => IcebergTableReader.snapshot(spark, path)
    case PlainParquet   => spark.read.parquet(path)
  }

  /** Format-agnostic column RENAME — a metadata commit on the
    * formats whose files decouple from logical names (Iceberg field
    * ids; Delta column mapping). Formats where files BIND to names
    * (Hudi, graft versioned, plain parquet) refuse loudly: there a
    * rename is a table rewrite, and pretending otherwise would
    * null-fill the column.
    */
  def renameColumn(spark: SparkSession, path: String, from: String, to: String): Unit =
    detectFormat(spark, path) match {
      case DeltaFormat => DeltaTableWriter.renameColumn(spark, path, from, to): Unit
      case IcebergFormat => IcebergTableWriter.renameColumn(spark, path, from, to)
      case f => throw new IllegalArgumentException(
        s"$path ($f): data files bind to column NAMES in this layout — a rename is a " +
          "table rewrite, not a metadata commit; refusing")
    }

  /** Format-agnostic column DROP — same dispatch rule as
    * [[renameColumn]]: metadata-only where the format supports it,
    * loud refusal where the files bind to names. */
  def dropColumn(spark: SparkSession, path: String, column: String): Unit =
    detectFormat(spark, path) match {
      case DeltaFormat => DeltaTableWriter.dropColumn(spark, path, column): Unit
      case IcebergFormat => IcebergTableWriter.dropColumn(spark, path, column)
      case f => throw new IllegalArgumentException(
        s"$path ($f): data files bind to column NAMES in this layout — a drop is a " +
          "table rewrite, not a metadata commit; refusing")
    }

  /** Format-agnostic INCREMENTAL read since a format-native
    * checkpoint token (Delta/Iceberg: a version / snapshot id number;
    * Hudi: an instant time string; graft versioned tables: a version
    * number). The append-scoped refusal contracts of each adapter
    * apply unchanged.
    *
    * graft's own tables are key-aware: every upsert commit declares
    * its record keys in the commit metadata
    * ([[UpsertWriter.RecordKeysKey]]), so the dispatch derives the
    * full CDC feed between the checkpoint version and the head via
    * [[graft.operators.SnapshotDiff.changeFeed]] — pre/post images
    * with a `change_type` column, the richest contract of the four
    * (graft holds both snapshots; the foreign formats only expose
    * their append logs). A table written before keys were declared
    * (or by the raw commitVersion services) refuses with directions
    * instead of guessing keys.
    */
  def openIncremental(spark: SparkSession, path: String, since: String): DataFrame =
    detectFormat(spark, path) match {
      case GraftVersioned =>
        val keys = UpsertWriter.readMeta(spark, path).get(UpsertWriter.RecordKeysKey)
          .map(_.split(",").toSeq.filter(_.nonEmpty))
          .getOrElse(throw new IllegalArgumentException(
            s"$path declares no ${UpsertWriter.RecordKeysKey} in its commit metadata — " +
              "re-commit through UpsertWriter.upsert, or call " +
              "SnapshotDiff.changeFeed(readVersion(v), read(latest), keys) with explicit keys"))
        graft.operators.SnapshotDiff.changeFeed(
          UpsertWriter.readVersion(spark, path, since.toInt),
          UpsertWriter.read(spark, path),
          keys)
      case DeltaFormat    => DeltaTableReader.incrementalSince(spark, path, since.toLong)
      case HudiFormat     => HudiTableReader.incrementalSince(spark, path, since)
      case IcebergFormat  => IcebergTableReader.incrementalSince(spark, path, since.toLong)
      case PlainParquet   => throw new IllegalArgumentException(
        s"$path is a plain parquet directory — no commit log to read incrementally")
    }

  /** Format-agnostic CDC-grade incremental open: the CHANGE FEED
    * since a format-native token, for consumers that must survive
    * upserts/deletes in the range (the append-scoped
    * [[openIncremental]] refuses those, by contract). graft versioned
    * tables serve pre/post images keyed by their declared record
    * keys; Delta serves the protocol's CDF (explicit cdc actions
    * verbatim, DV diffs reconstructed); Iceberg serves inserts +
    * position-delete pre-images + equality-delete key-images; Hudi
    * MOR serves upsert post-images + DELETE KEY-IMAGES from the log's
    * tombstone blocks. Hudi COW refuses toward [[openIncremental]]:
    * its timeline carries no delete images at all, and serving a feed
    * that silently lacks deletes would be wrong in exactly the case a
    * CDC consumer exists for.
    */
  def openChangeFeed(spark: SparkSession, path: String, since: String): DataFrame =
    detectFormat(spark, path) match {
      case GraftVersioned => openIncremental(spark, path, since) // already CDC-grade
      case DeltaFormat    => DeltaTableReader.changeFeedSince(spark, path, since.toLong)
      case IcebergFormat  => IcebergTableReader.changeFeedSince(spark, path, since.toLong)
      case HudiFormat if HudiTableReader.isMor(spark, path) =>
        // MOR delete blocks ARE delete images (key tombstones) — the
        // feed serves upsert post-images + delete key-images, with
        // hoodie.table.cdc.enabled images (pre/post) taking precedence
        HudiTableReader.changeFeedSince(spark, path, since)
      case HudiFormat if HudiTableWriter.cdcEnabledOf(spark, path) =>
        // a cdc-enabled COW table's feed is its landed images
        HudiTableReader.changeFeedSince(spark, path, since)
      case HudiFormat     => throw new IllegalArgumentException(
        s"$path: a Hudi COW timeline carries no delete images for a CDC feed — use " +
          "openIncremental for the upsert-exact post-image pull, or enable " +
          "hoodie.table.cdc.enabled to land pre/post images")
      case PlainParquet   => throw new IllegalArgumentException(
        s"$path is a plain parquet directory — no commit log to read a change feed from")
    }

  /** Format-agnostic TIME TRAVEL: read the table as of a
    * format-native token — graft/Delta: a version number; Iceberg: a
    * snapshot id, or a `ts:<epoch-millis>` timestamp token resolved
    * from the snapshot log's `timestamp-ms` (Delta takes the same
    * token off commit-file mtimes); Hudi: an instant time string.
    * Each adapter's refusal contract (expired snapshots, cleaned
    * logs, pre-history instants) applies unchanged.
    */
  def openAsOf(spark: SparkSession, path: String, token: String): DataFrame = {
    val ts: Option[Long] =
      if (token.startsWith("ts:")) Some(token.stripPrefix("ts:").toLong) else None
    detectFormat(spark, path) match {
      case GraftVersioned => UpsertWriter.readVersion(spark, path, token.toInt)
      case DeltaFormat => ts match {
        case Some(t) => DeltaTableReader.snapshotAsOfTimestamp(spark, path, t)
        case None => DeltaTableReader.snapshotAsOf(spark, path, token.toLong)
      }
      case HudiFormat     => HudiTableReader.snapshotAsOf(spark, path, token)
      case IcebergFormat  => ts match {
        case Some(t) => IcebergTableReader.snapshotAsOfTimestamp(spark, path, t)
        case None if token.forall(_.isDigit) =>
          IcebergTableReader.snapshotAsOf(spark, path, token.toLong)
        // a non-numeric token is a NAMED REF (branch/tag)
        case None => IcebergTableReader.snapshotAsOfRef(spark, path, token)
      }
      case PlainParquet   => throw new IllegalArgumentException(
        s"$path is a plain parquet directory — no commit log to time-travel")
    }
  }

  /** Latest commit token of a table, per its format — the head a
    * checkpointed consumer records after processing: graft/Delta a
    * version number, Hudi an instant time, Iceberg a snapshot id.
    */
  def latestToken(spark: SparkSession, path: String): String = detectFormat(spark, path) match {
    case GraftVersioned => UpsertWriter.versions(spark, path).max.toString
    case DeltaFormat    => DeltaTableReader.latestVersion(spark, path).toString
    case HudiFormat     => HudiTableReader.latestInstant(spark, path)
    case IcebergFormat  => IcebergTableReader.snapshotLog(spark, path)._2.toString
    case PlainParquet   => throw new IllegalArgumentException(
      s"$path is a plain parquet directory — no commit log, no token")
  }

  /** The reference's CHECKPOINTED CONSUMER loop (template.py:226-281),
    * format-agnostic and AT-LEAST-ONCE: read the stored token, pull
    * everything since it (first run bootstraps with the FULL
    * snapshot), and return the increment plus the head token the
    * caller commits AFTER materializing — via [[commitToken]] — so a
    * crash between pull and commit re-delivers, never skips. Returns
    * None when the table has not advanced past the checkpoint. A
    * write racing between the head capture and the read can deliver
    * rows past the returned token; they re-deliver next pull —
    * the documented at-least-once duplicates, same as
    * [[IncrementalReader.pull]].
    *
    * A range containing ROW-CHANGING commits (a mid-range
    * overwrite/delete — every production table eventually commits
    * one) makes the append-scoped pull refuse with
    * [[AppendScopedRangeException]]; the consumer AUTO-FOLLOWS that
    * refusal to the CDC-grade [[openChangeFeed]] instead of dying.
    * The increment then carries a `_change_type` column — the
    * explicit marker downstream uses to apply deletes/updates rather
    * than blind-appending (which would be wrong across an overwrite
    * no matter what this method returned). Formats with no CDC feed
    * to fall back to (Hudi COW without cdc.enabled) keep the loud
    * refusal.
    */
  def pullIncremental(spark: SparkSession, path: String, tableName: String,
      store: CheckpointStore): Option[(DataFrame, String)] = {
    val head = latestToken(spark, path)
    store.read(tableName) match {
      case None => Some((open(spark, path), head))
      case Some(cp) if cp.lastProcessedCommit == head => None
      case Some(cp) =>
        val inc =
          try openIncremental(spark, path, cp.lastProcessedCommit)
          catch {
            case _: AppendScopedRangeException =>
              openChangeFeed(spark, path, cp.lastProcessedCommit)
          }
        Some((inc, head))
    }
  }

  /** Persist a processed token — AFTER materializing the increment. */
  def commitToken(path: String, tableName: String, store: CheckpointStore,
      token: String): Unit =
    store.write(Checkpoint(tableName, token, path))

  /** Format-agnostic UPSERT (merge) dispatch: land `df` into the
    * table at `path` keyed on `keys`, through whatever writer the
    * layout selects — graft versioned upsert, Delta DV-mask+append,
    * Hudi COW file-group rewrite, Iceberg equality-delete snapshot.
    * Hudi tables declare their OWN record keys; a `keys` argument
    * disagreeing with the declaration refuses (the table property
    * wins, same contract as the append). Returns the new head token
    * (the same token [[latestToken]]/[[pullIncremental]] speak).
    * Plain parquet refuses — a directory of files has no merge
    * contract.
    */
  def upsert(df: DataFrame, path: String, keys: Seq[String]): String = {
    val spark = df.sparkSession
    require(keys.nonEmpty, s"$path: upsert needs at least one key column")
    detectFormat(spark, path) match {
      case GraftVersioned =>
        UpsertWriter.upsert(df, path, keys, precombine = df.columns.head)
        latestToken(spark, path)
      case DeltaFormat => DeltaTableWriter.upsert(df, path, keys).toString
      case HudiFormat =>
        val declared = HudiTableWriter.declaredRecordKeys(spark, path)
        require(declared == keys,
          s"$path declares hoodie.table.recordkey.fields=${declared.mkString(",")} but " +
            s"the dispatch was asked to key on ${keys.mkString(",")} — the table " +
            "property wins; drop the disagreement")
        HudiTableWriter.upsert(df, path)
      case IcebergFormat => IcebergTableWriter.upsert(df, path, keys).toString
      case PlainParquet => throw new IllegalArgumentException(
        s"$path is a plain parquet directory — no merge contract to upsert against " +
          "(write through one of the table formats)")
    }
  }

  /** Publish ICEBERG METADATA over an existing DELTA table's data
    * files — the UniForm shape: ONE copy of the data readable by both
    * formats' engines (the `metadata/` dir lands INSIDE the Delta
    * table; `_delta_log` stays primary — [[detectFormat]] still says
    * Delta — while [[IcebergTableReader]] pointed at the same path
    * serves the mirrored snapshot). Each call syncs the CURRENT Delta
    * snapshot: one fresh manifest referencing exactly the active
    * files under a `replace` snapshot, so a file the Delta log
    * dropped can never resurrect through a stale manifest.
    *
    * Refusals, loudly: partitioned tables (Delta strips partition
    * columns OUT of the data files; Iceberg expects identity-source
    * columns IN them — a mirrored read would silently lose the
    * columns), deletion vectors (the mask lives in Delta sidecars an
    * Iceberg reader cannot see — serving unmasked rows would
    * over-return), and columnMapping (data files carry physical
    * names the mirrored schema would mis-resolve). Record counts come
    * from the Delta adds' own stats when present, parquet footers
    * otherwise — |files| driver metadata either way. Returns the new
    * Iceberg snapshot id.
    */
  def publishIcebergMirror(spark: SparkSession, path: String): Long = {
    require(detectFormat(spark, path) == DeltaFormat,
      s"$path: the Iceberg mirror publishes over a DELTA table — detected " +
        s"${detectFormat(spark, path)}")
    val state = DeltaTableReader.snapshotState(spark, path)
    require(state.partitionColumns.isEmpty,
      s"$path is partitioned — Delta strips partition columns from data files while " +
        "Iceberg expects them in the files; a mirrored read would silently lose the " +
        "partition columns; refusing")
    require(state.active.forall(_.dv.isEmpty),
      s"$path carries deletion vectors — an Iceberg reader cannot see the Delta mask " +
        "and would over-return deleted rows; compact the DVs away first; refusing")
    require(!state.configuration.get("delta.columnMapping.mode").exists(m => m != "none"),
      s"$path uses columnMapping — data files carry physical names the mirrored " +
        "schema would mis-resolve; refusing")
    val schema = state.schemaJson
      .flatMap(js => scala.util.Try(org.apache.spark.sql.types.DataType.fromJson(js)).toOption)
      .collect { case st: org.apache.spark.sql.types.StructType => st }
      .getOrElse(throw new IllegalStateException(
        s"$path: table metadata carries no parseable schemaString"))
    val conf = spark.sparkContext.hadoopConfiguration
    val files = state.active.map { f =>
      val abs = {
        val raw = f.path
        val dec =
          if (!raw.contains('%')) raw
          else java.net.URLDecoder.decode(raw.replace("+", "%2B"), "UTF-8")
        if (dec.startsWith("/") || dec.contains("://")) dec else s"$path/$dec"
      }
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(abs), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val n = try r.getRecordCount finally r.close()
      (abs, n)
    }
    IcebergTableWriter.publishMetadataOnly(spark, path, files, schema)
  }

  /** REPLICATE a table ACROSS FORMATS: snapshot-read `srcPath`
    * through whatever adapter its layout selects and land the rows at
    * `dstPath` in `dstFormat` through the matching writer — the
    * "switch engines by rewriting the table once" move the whole
    * interop surface exists for. Hudi meta columns are stripped on
    * the way out (the destination stamps its own); partitioning and
    * record keys are the destination writer's arguments, not
    * inferred. One distributed read + one distributed write; refuses
    * an existing destination (each writer's own create contract).
    */
  def replicate(spark: SparkSession, srcPath: String, dstPath: String,
      dstFormat: TableFormat, partitionBy: Seq[String] = Nil,
      recordKeys: Seq[String] = Nil): Unit = {
    val rows = open(spark, srcPath)
    val data = rows.columns.filterNot(_.startsWith("_hoodie_")) match {
      case cols if cols.length == rows.columns.length => rows
      case cols => rows.select(cols.map(col).toIndexedSeq: _*)
    }
    dstFormat match {
      case DeltaFormat => DeltaTableWriter.create(data, dstPath, partitionBy): Unit
      case HudiFormat => HudiTableWriter.create(data, dstPath,
        recordKeys = recordKeys, partitionBy = partitionBy): Unit
      case IcebergFormat => IcebergTableWriter.create(data, dstPath, partitionBy): Unit
      case GraftVersioned =>
        require(recordKeys.nonEmpty,
          "a graft versioned table needs record keys for its upsert commit")
        UpsertWriter.upsert(data, dstPath, recordKeys,
          precombine = data.columns.head): Unit
      case PlainParquet => data.write.parquet(dstPath)
    }
  }

  /** All driver testdata tables. */
  val AllTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every known table in `dir` as a temp view. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    AllTables.foreach(register(spark, dir, _))
}
