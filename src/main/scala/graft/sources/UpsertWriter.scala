package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Copy-on-write upsert semantics over parquet — the graft analog of
  * the reference's Hudi upsert writer
  * (reference: generate_hudi_table.py:86-214):
  *
  *  - record key: identity of a row (`hoodie.datasource.write.recordkey.field`)
  *  - precombine key: among rows sharing a record key, highest
  *    precombine value wins (`...write.precombine.field`)
  *  - optional hive-style partitioning (`...write.partitionpath.field`
  *    with `hive_style_partitioning=true`)
  *  - optional clustering: sort-within-partitions by a column for
  *    data-skipping-friendly file layout
  *    (`hoodie.clustering.plan.strategy.sort.columns`).
  *
  * Scale: `merge` is one hash-shuffle on the record key with map-side
  * partial aggregation (a max_by struct-aggregate, NOT a global sort
  * or window), so it behaves at 100 TB: partial combine collapses
  * duplicates before the shuffle, AQE handles key skew.
  */
object UpsertWriter {

  /** Latest-wins dedup: one row per record key, the row with the
    * maximal (precombine, tiebreakers...) tuple. Tiebreakers make the
    * result deterministic when precombine values collide.
    */
  def merge(df: DataFrame, recordKeys: Seq[String], precombine: String, tiebreakers: Seq[String] = Nil): DataFrame = {
    val orderCols = (precombine +: tiebreakers).map(col)
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    // max_by over a struct ordering: struct comparison is lexicographic
    // over (precombine, tiebreakers), giving latest-wins in a single
    // hash aggregate (partial + final) — one shuffle, no sort.
    val winner = df
      .groupBy(recordKeys.map(col): _*)
      .agg(max_by(payload, struct(orderCols: _*)).as("_graft_row"))
      .select(col("_graft_row.*"))
    winner
  }

  /** Window-based variant kept for semantics tests: identical result
    * to `merge`, but via row_number — useful as an oracle shape and
    * when the full input ordering matters.
    */
  def mergeViaWindow(df: DataFrame, recordKeys: Seq[String], precombine: String, tiebreakers: Seq[String] = Nil): DataFrame = {
    val w = Window
      .partitionBy(recordKeys.map(col): _*)
      .orderBy((precombine +: tiebreakers).map(c => col(c).desc): _*)
    df.withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1)
      .drop("_graft_rn")
  }

  // -----------------------------------------------------------------
  // Versioned copy-on-write table layout (the graft timeline):
  //
  //   targetPath/
  //     v00000001/ ... parquet files ... _graft_commit
  //     v00000002/ ... parquet files ... _graft_commit
  //
  // Versions are IMMUTABLE; a version exists for readers iff its
  // `_graft_commit` marker file exists, and the marker is written only
  // after the parquet write completes. A crash mid-write therefore
  // leaves an ignorable uncommitted directory — readers always resolve
  // a complete previous version, and there is no delete/rename window
  // with no live table (the flaw of swap-in-place COW). This mirrors
  // the reference's Hudi timeline + cleaner
  // (generate_hudi_table.py:158-176: CLEANER_POLICY KEEP_LATEST_COMMITS).
  // -----------------------------------------------------------------

  private val CommitMarker = "_graft_commit"
  private val MetaFile = "_graft_meta"
  private val VersionRe = """v(\d{8})""".r

  /** Meta key recording the ORIGINAL commit instant (epoch millis).
    * Normally the marker file's mtime IS the commit instant (the
    * marker is created last), but purge re-creates each retained
    * version's marker in the staged rewrite — without this key every
    * purged version's "commit time" would silently become the purge
    * time, and `TIMESTAMP AS OF` an instant the version demonstrably
    * existed at would refuse. Written by purge (preserving an
    * already-recorded value on idempotent reruns); readers prefer it
    * over the marker mtime.
    */
  private val CommitInstantKey = "graft.commit.instant.ms"

  /** Meta keys declaring the table's merge identity — written on
    * every upsert commit so key-aware consumers need no out-of-band
    * declaration.
    */
  val RecordKeysKey = "graft.record.keys"
  val PrecombineKey = "graft.precombine.field"

  import org.apache.hadoop.fs.{FileSystem, Path}

  private def commitInstantOf(fs: FileSystem, dir: Path): Long =
    readMetaDir(fs, dir).get(CommitInstantKey).map(_.toLong).getOrElse(
      fs.getFileStatus(new Path(dir, CommitMarker)).getModificationTime)

  // -----------------------------------------------------------------
  // Per-version commit metadata. A version may carry a small
  // key=value file (`_graft_meta`) written BEFORE the commit marker,
  // so metadata is atomic with the data it describes: if the commit
  // never lands, neither does the metadata. This is how incremental
  // maintenance gets replay-safety for free — the applied-batch
  // high-water mark rides the same atomic commit as the folded state
  // (the Hudi analog: commit metadata on the timeline, which is what
  // lets its incremental consumers never re-apply a commit —
  // reference template.py:226-281 advances its checkpoint only after
  // a successful write).
  // -----------------------------------------------------------------

  private def writeMeta(fs: FileSystem, versionDir: Path, meta: Map[String, String]): Unit =
    if (meta.nonEmpty) {
      val props = new java.util.Properties()
      meta.foreach { case (k, v) => props.setProperty(k, v) }
      val out = fs.create(new Path(versionDir, MetaFile), true)
      try props.store(out, null)
      finally out.close()
    }

  private def readMetaDir(fs: FileSystem, versionDir: Path): Map[String, String] = {
    val p = new Path(versionDir, MetaFile)
    if (!fs.exists(p)) Map.empty
    else {
      val props = new java.util.Properties()
      val in = fs.open(p)
      try props.load(in)
      finally in.close()
      import scala.jdk.CollectionConverters._
      props.asScala.toMap
    }
  }

  /** Commit metadata of the latest committed version (empty map if
    * the table doesn't exist or the version carries none).
    */
  def readMeta(spark: org.apache.spark.sql.SparkSession, targetPath: String): Map[String, String] = {
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedVersions(fs, target).lastOption
      .map { case (_, dir) => readMetaDir(fs, dir) }
      .getOrElse(Map.empty)
  }

  private[sources] def committedVersions(fs: FileSystem, target: Path): Seq[(Int, Path)] =
    if (!fs.exists(target)) Nil
    else
      fs.listStatus(target).toIndexedSeq
        .filter(_.isDirectory)
        .flatMap { st =>
          st.getPath.getName match {
            case VersionRe(num) if fs.exists(new Path(st.getPath, CommitMarker)) =>
              Some(num.toInt -> st.getPath)
            case _ => None
          }
        }
        .sortBy(_._1)

  /** Latest committed version directory, if the table exists. */
  def latestVersion(spark: org.apache.spark.sql.SparkSession, targetPath: String): Option[String] = {
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedVersions(fs, target).lastOption.map(_._2.toString)
  }

  /** All committed version numbers, ascending — the table's timeline
    * (Hudi `.hoodie` timeline analog; the cleaner trims it to the
    * retained window).
    */
  def versions(spark: org.apache.spark.sql.SparkSession, targetPath: String): Seq[Int] = {
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedVersions(fs, target).map(_._1)
  }

  /** Time travel: snapshot read of a specific committed version
    * (within the cleaner's retained window). Together with
    * SnapshotDiff this gives change capture between any two retained
    * versions: diff(readVersion(v1), readVersion(v2)).
    */
  def readVersion(spark: org.apache.spark.sql.SparkSession, targetPath: String, version: Int): DataFrame = {
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedVersions(fs, target).find(_._1 == version) match {
      case Some((_, dir)) => spark.read.parquet(dir.toString)
      case None => throw new IllegalArgumentException(
        s"version $version not in the retained timeline for $targetPath " +
          s"(have: ${committedVersions(fs, target).map(_._1).mkString(", ")})")
    }
  }

  /** Metadata-only compaction advisor (the decision half of Hudi's
    * small-file strategy): true iff the LIVE snapshot (or a plain
    * directory) is fragmented enough that [[compact]] pays for
    * itself — more than `minFiles` data files averaging under a
    * quarter of `targetFileBytes`. Pure file listing, no data read;
    * run it from the maintenance lane before scheduling a compaction
    * instead of rewriting on a timer.
    */
  def needsCompaction(
      spark: org.apache.spark.sql.SparkSession,
      targetPath: String,
      targetFileBytes: Long = 512L * 1024 * 1024,
      minFiles: Int = 8): Boolean = {
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = latestVersion(spark, targetPath).map(new Path(_)).getOrElse(target)
    def dataFiles(p: Path): Seq[Long] =
      fs.listStatus(p).toIndexedSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) dataFiles(st.getPath)
        else Seq(st.getLen)
      }
    val sizes = dataFiles(root)
    sizes.length > minFiles && sizes.sum / sizes.length < targetFileBytes / 4
  }

  /** Constraint-gated upsert (the Delta CHECK / NOT-NULL-on-write
    * shape, composed from the declarative expectation suite the read
    * side already uses — [[graft.operators.QualityChecks]]): the
    * batch's checks run BEFORE any version is staged, and ONE red
    * check refuses the whole commit loudly with every violation
    * count in the message — the table can never hold a row that
    * violates its declared constraints, and a refused batch leaves
    * the timeline byte-identical. Checks see the UPDATE BATCH (the
    * rows this commit introduces); table-wide invariants that need
    * the merged state (e.g. cross-batch uniqueness) belong in a WAP
    * audit ([[Wap.writeAuditPublish]]), which stages first and checks
    * the staged snapshot.
    */
  def upsertChecked(
      updates: DataFrame,
      targetPath: String,
      recordKeys: Seq[String],
      precombine: String,
      checks: DataFrame => Seq[DataFrame],
      partitionBy: Seq[String] = Nil,
      clusterBy: Seq[String] = Nil,
      keepVersions: Int = 2,
      targetFileBytes: Long = 512L * 1024 * 1024): Unit = {
    val results = graft.operators.QualityChecks.run(checks(updates)).collect()
    val failed = results.filter(!_.getAs[Boolean]("passed"))
    if (failed.nonEmpty)
      throw new IllegalStateException(
        "upsertChecked: commit refused, batch violates declared constraints: " +
          failed.map(r => s"${r.getAs[String]("check")}=${r.getAs[Long]("n_violations")}")
            .mkString(", "))
    upsert(updates, targetPath, recordKeys, precombine,
      partitionBy, clusterBy, keepVersions, targetFileBytes)
  }

  /** Timestamp-based time travel (the `TIMESTAMP AS OF` face of
    * [[readVersion]]): resolve the LATEST version whose commit landed
    * at or before `tsMillis` and read that snapshot. The commit
    * instant is the marker file's filesystem mtime — the marker is
    * created LAST in the commit protocol, so its mtime is exactly
    * when the version became visible; no write-path change and no
    * clock bookkeeping beyond what the filesystem already records
    * (the same source Delta/Iceberg use when table metadata lacks an
    * explicit timestamp). A timestamp before the first retained
    * commit refuses loudly — the cleaner may have dropped history,
    * and serving the oldest-retained snapshot instead would silently
    * answer for a version that is NOT what the caller asked about.
    */
  def readAsOf(spark: org.apache.spark.sql.SparkSession, targetPath: String,
      tsMillis: Long): DataFrame = {
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamped = committedVersions(fs, target).map { case (v, dir) =>
      (v, dir, commitInstantOf(fs, dir))
    }
    stamped.filter(_._3 <= tsMillis).sortBy(_._1).lastOption match {
      case Some((_, dir, _)) => spark.read.parquet(dir.toString)
      case None => throw new IllegalArgumentException(
        s"no retained commit of $targetPath at or before ts=$tsMillis " +
          s"(earliest retained: ${stamped.headOption.map(s => s"v${s._1}@${s._3}").getOrElse("none")})")
    }
  }

  /** Commit instants of the retained timeline: (version, markerMtimeMillis). */
  def commitInstants(spark: org.apache.spark.sql.SparkSession, targetPath: String): Seq[(Int, Long)] = {
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    committedVersions(fs, target).map { case (v, dir) =>
      (v, commitInstantOf(fs, dir))
    }
  }

  /** DESCRIBE HISTORY analog: one row per RETAINED committed version
    * — (version, n_rows, n_files, meta as sorted k=v string). Row
    * counts come from parquet footers
    * ([[graft.operators.ZoneMaps.countFromFooters]]) — metadata-only,
    * no data I/O however large the versions are; the retained window
    * is keepVersions-bounded, so the per-version loop is small by
    * construction.
    */
  def history(spark: org.apache.spark.sql.SparkSession, targetPath: String): DataFrame = {
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows = committedVersions(fs, target).map { case (v, dir) =>
      val meta = readMetaDir(fs, dir).toSeq.sorted
        .map { case (k, x) => s"$k=$x" }.mkString(",")
      // recurse: hive-partitioned versions keep their data files
      // under col=value/ subdirectories — a flat listing would
      // report n_files = 0 for them while n_rows walks recursively
      def countFiles(p: Path): Long = fs.listStatus(p).map { s =>
        val n = s.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) 0L
        else if (s.isDirectory) countFiles(s.getPath)
        else 1L
      }.sum
      val nFiles = countFiles(dir)
      (v.toLong, graft.operators.ZoneMaps.countFromFooters(spark, dir.toString),
        nFiles.toLong, meta)
    }
    import spark.implicits._
    rows.toDF("version", "n_rows", "n_files", "commit_meta")
  }

  /** Snapshot read of the latest committed version. Falls back to a
    * plain parquet read for non-versioned (external) directories.
    */
  def read(spark: org.apache.spark.sql.SparkSession, targetPath: String): DataFrame =
    latestVersion(spark, targetPath) match {
      case Some(dir) => spark.read.parquet(dir)
      case None      => spark.read.parquet(targetPath)
    }

  /** Upsert `updates` into the table at `targetPath`: union the latest
    * committed version (if any) with updates, merge latest-wins, write
    * a NEW immutable version, commit it with a marker file, then clean
    * versions beyond `keepVersions`. Optional hive-style partitioning
    * and clustering (sort-within-partitions on `clusterBy`).
    */
  def upsert(
      updates: DataFrame,
      targetPath: String,
      recordKeys: Seq[String],
      precombine: String,
      partitionBy: Seq[String] = Nil,
      clusterBy: Seq[String] = Nil,
      keepVersions: Int = 2,
      targetFileBytes: Long = 512L * 1024 * 1024,
      syncTable: Option[String] = None,
      meta: Map[String, String] = Map.empty): Unit = {
    require(keepVersions >= 1, "keepVersions must retain at least the live version")
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val spark = updates.sparkSession
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = committedVersions(fs, target)
    val nextNum = versions.lastOption.map(_._1 + 1).getOrElse(1)
    mergeAndCommit(updates, spark, fs, target, versions, nextNum,
      recordKeys, precombine, partitionBy, clusterBy, keepVersions, targetFileBytes, meta)
    // hive_sync analog: re-point the catalog name at the new commit
    syncTable.foreach(name => CatalogSync.sync(spark, name, targetPath))
  }

  private[sources] def mergeAndCommit(
      updates: DataFrame,
      spark: org.apache.spark.sql.SparkSession,
      fs: FileSystem,
      target: Path,
      versions: Seq[(Int, Path)],
      nextNum: Int,
      recordKeys: Seq[String],
      precombine: String,
      partitionBy: Seq[String],
      clusterBy: Seq[String],
      keepVersions: Int,
      targetFileBytes: Long,
      meta: Map[String, String] = Map.empty,
      preCommit: () => Unit = () => ()): Unit = {
    // Updates win over existing rows at equal precombine values.
    // allowMissingColumns = additive schema evolution (the Hudi
    // behavior: generate_hudi_table.py tables evolve by re-running
    // with new fields): a column new in the updates back-fills null
    // for existing rows, a column the updates dropped keeps its
    // existing values and the updates' rows get null. Record-key and
    // precombine columns must exist on both sides or the merge itself
    // fails analysis — nothing silently degrades.
    val merged = versions.lastOption match {
      case Some((_, latest)) =>
        val existing = spark.read.parquet(latest.toString).withColumn("_graft_src", lit(0))
        val tagged = updates.withColumn("_graft_src", lit(1))
          .unionByName(existing, allowMissingColumns = true)
        merge(tagged, recordKeys, precombine, tiebreakers = Seq("_graft_src")).drop("_graft_src")
      case None =>
        merge(updates, recordKeys, precombine)
    }

    // File sizing — the analog of hoodie.parquet.max.file.size +
    // small.file.limit bin-packing (generate_hudi_table.py:163-167):
    // size the version at ~targetFileBytes per file. Small tables
    // collapse to ONE file instead of one per shuffle partition (the
    // small-file problem); large tables cap per-file size. Partitioned
    // writes co-locate rows of a partition so each task writes whole
    // files for few partitions. The estimate = previous version's
    // on-disk bytes + the updates plan's size estimate (the merged
    // AGGREGATE's own stats are useless — Catalyst size-only stats
    // collapse after an aggregate).
    val existingBytes = versions.lastOption
      .map { case (_, dir) => fs.getContentSummary(dir).getLength }
      .getOrElse(0L)
    val estBytes = BigInt(existingBytes) +
      BigInt(updates.queryExecution.optimizedPlan.stats.sizeInBytes.toString)
    // Catalyst size-only stats are garbage for some plans (LogicalRDD
    // defaults to Long.MaxValue; joins multiply): treat anything above
    // 1 PiB as "unknown" and skip sizing rather than spraying the
    // nFiles cap worth of tiny files.
    val statsUsable = estBytes < BigInt(1L << 50)
    val shufflePartitions = spark.sessionState.conf.numShufflePartitions
    // Trust the estimate's SPLIT decision only for scan/local-backed
    // updates plans, whose size stats are real. Through joins,
    // aggregates, generates and windows Catalyst size-only stats
    // MULTIPLY — a join-over-aggregates updates plan (the CDC fold's
    // shape) claimed 1.66 TB for 60 rows — and an explicit
    // repartition(N) is exempt from AQE coalescing, so the bogus
    // N=3244 ran thousands of near-empty reduce tasks: ~17s of pure
    // task overhead per commit AT ANY DATA SIZE (13× on the whole
    // query). For stats-inflatable plans the split is capped by what
    // MEASURED bytes justify (double the existing table's file
    // count, floored at shuffle parallelism); the post-write resize
    // below catches what the estimate still gets wrong in the
    // too-small direction.
    val statsInflatable = {
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LAgg, Generate => LGen, Join => LJoin, Window => LWin}
      updates.queryExecution.optimizedPlan.exists {
        case _: LJoin | _: LAgg | _: LGen | _: LWin => true
        case _ => false
      }
    }
    val realFiles = ((existingBytes + targetFileBytes - 1) / targetFileBytes).max(0)
    val nFiles = ((estBytes + targetFileBytes - 1) / targetFileBytes)
      .max(1).min(100000).toInt
    // For stats-inflatable plans the estimate is garbage in BOTH
    // directions, and any EXPLICIT repartition/coalesce is exempt from
    // AQE coalescing — the r12 cap (max(shuffle parallelism, 2×files))
    // therefore sprayed every small CDC commit across ~32 near-empty
    // files and the post-write resize rewrote the version EVERY commit
    // (the r12→r11 1.1-1.4× drift on q_upsert_delete/q_history/
    // q_stream_late_dlq). Instead, write the merged plan UNSIZED and
    // let AQE coalesce the final shuffle to its advisory partition
    // size: small outputs land as one file with no resize pass, large
    // outputs keep full write parallelism, and the post-write
    // self-check below corrects the residual in either direction from
    // the first trustworthy measurement.
    val sized =
      if (!statsUsable || (statsInflatable && partitionBy.isEmpty)) merged
      else if (partitionBy.nonEmpty) {
        // hash on (partition cols, salt) so a huge hive-partition still
        // splits into ~target-size files instead of one file per task
        // holding the whole partition; small tables get salt ≡ 0 and
        // stay one file per hive partition (inflatable estimates are
        // clamped by the measured-bytes cap: a bogus TB-scale estimate
        // must not fan the salt out to thousands of empty files)
        val nPart =
          if (statsInflatable) nFiles.toLong.min(math.max(shufflePartitions.toLong, 2L * realFiles).max(1L)).toInt
          else nFiles
        val salt = pmod(xxhash64(col(precombine)), lit(nPart.toLong)).cast("int")
        merged.repartition(nPart, (partitionBy.map(col) :+ salt): _*)
      } else if (nFiles <= shufflePartitions) merged.coalesce(nFiles) // shrink without a shuffle
      else merged.repartition(nFiles)
    val clustered =
      if (clusterBy.nonEmpty) sized.sortWithinPartitions(clusterBy.map(col): _*)
      else sized

    val versionDir = new Path(target, f"v$nextNum%08d")
    if (fs.exists(versionDir)) {
      // Only UNCOMMITTED debris from a crash may be cleared. A marker
      // here means a competing writer already committed this version
      // number (e.g. its claim was broken as stale while it was merely
      // slow): deleting it would be a lost update — abort instead and
      // let the caller rebase on the new timeline.
      if (fs.exists(new Path(versionDir, CommitMarker)))
        throw new java.util.ConcurrentModificationException(
          s"version $versionDir already committed by a competing writer; rebase and retry")
      fs.delete(versionDir, true)
    }
    val writer = clustered.write.mode(SaveMode.Overwrite)
    val partitioned = if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer
    partitioned.parquet(versionDir.toString)
    // Post-write self-check against STATS LIES: Catalyst size-only
    // estimates multiply through joins, so an `updates` plan shaped
    // join-over-aggregates can claim gigabytes for kilobytes of rows
    // and the sizing above sprays the version across dozens-to-
    // thousands of tiny files. Committing that poisons every
    // subsequent reader AND the next merge's estimate — measured as a
    // 13× wall-clock blowup (q_inc_agg_cdc) that snowballed worse
    // each commit. The write itself is the first trustworthy
    // measurement, so use it: if the landed files average far under
    // target size, rewrite the (still-uncommitted) version right-
    // sized before the marker — cheap exactly when it fires, since
    // firing means the data is small. Skipped for hive-partitioned
    // layouts (per-partition dirs legitimately hold small files).
    if (partitionBy.isEmpty) {
      val partFiles = fs.listStatus(versionDir)
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      val writtenBytes = partFiles.map(_.getLen).sum
      val rightN = ((writtenBytes + targetFileBytes - 1) / targetFileBytes).max(1)
      val tooSmall =
        partFiles.length > 8 && writtenBytes / partFiles.length < targetFileBytes / 64
      // the mirror defect (big initial join-shaped load into a small
      // table): files land far OVER target size — split them up to the
      // count the measured bytes justify
      val tooBig = partFiles.nonEmpty &&
        writtenBytes / partFiles.length > 2 * targetFileBytes &&
        rightN > partFiles.length
      if (tooSmall || tooBig) {
        val n =
          if (tooSmall) rightN.min(partFiles.length.toLong).toInt
          else rightN.min(100000L).toInt
        val resized = new Path(target, f"v$nextNum%08d.resize")
        if (fs.exists(resized)) fs.delete(resized, true)
        val reread = spark.read.parquet(versionDir.toString)
        val repart =
          if (tooSmall) reread.coalesce(n) // shrink without a shuffle
          else reread.repartition(n) // splitting NEEDS the shuffle
        val reclustered = // coalesce/repartition mix parents: re-sort files
          if (clusterBy.nonEmpty) repart.sortWithinPartitions(clusterBy.map(col): _*)
          else repart
        reclustered.write.mode(SaveMode.Overwrite).parquet(resized.toString)
        fs.delete(versionDir, true)
        if (!fs.rename(resized, versionDir))
          throw new java.io.IOException(s"resize rename $resized -> $versionDir failed")
      }
    }
    // the table DECLARES its record keys / precombine column in the
    // commit metadata (the Hudi hoodie.properties analog), so
    // format-agnostic consumers — TableLoader.openIncremental — can
    // derive the CDC feed without the caller re-stating keys
    writeMeta(fs, versionDir, meta
      + (RecordKeysKey -> recordKeys.mkString(","))
      + (PrecombineKey -> precombine)) // metadata rides the commit: before the marker
    preCommit() // last-instant ownership re-check for concurrent writers
    fs.create(new Path(versionDir, CommitMarker), true).close() // commit point

    // Cleaner: drop committed versions beyond the retention window
    // (branch-pinned fork points stay).
    retire(fs, target, keepVersions): Unit
  }

  // -----------------------------------------------------------------
  // Optimistic concurrency control — the analog of the reference's
  // hoodie.write.concurrency.mode=optimistic_concurrency_control +
  // lock provider (generate_hudi_table.py:174-180). Writers race to
  // CLAIM the next version number; the claim is an exclusive file
  // (`vNNNNNNNN_claim`) in the table root, doubling as a same-process
  // lock via a JVM-wide claim registry (Hudi's InProcessLockProvider
  // composed with its FileSystem lock). The loser re-reads the
  // timeline — so its merge base includes the winner's commit — and
  // retries on the NEXT version: both updates land, the timeline is
  // linear, no lost update. A claim whose version never committed and
  // whose file is older than `claimStaleMs` is a crashed writer; it
  // is broken and re-taken (the lock-provider TTL). Claim files of
  // COMMITTED versions are kept as tombstones: a late writer that
  // read the timeline before the commit landed must fail its claim
  // and re-base, never overwrite.
  // -----------------------------------------------------------------

  private val jvmClaims = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def claimPath(target: Path, n: Int) = new Path(target, f"v$n%08d" + "_claim")

  private def writeClaim(fs: FileSystem, claim: Path, token: String, overwrite: Boolean): Boolean = {
    // create(overwrite=false) is the filesystem's exclusive-create
    // primitive: two racing writers can't both succeed
    val out = fs.create(claim, overwrite)
    try out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    true
  }

  private def readClaim(fs: FileSystem, claim: Path): Option[String] =
    if (!fs.exists(claim)) None
    else {
      val in = fs.open(claim)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    }

  private def tryClaim(fs: FileSystem, target: Path, n: Int, staleMs: Long, token: String): Boolean = {
    val key = s"${target.toUri}#v$n"
    if (!jvmClaims.add(key)) return false // same-process writer holds it
    val claim = claimPath(target, n)
    val ok =
      try {
        // a version already committed (possibly by a non-OCC writer,
        // which leaves no claim file) is never re-claimable
        if (fs.exists(new Path(target, f"v$n%08d/$CommitMarker"))) false
        else if (fs.exists(claim)) {
          val age = System.currentTimeMillis() - fs.getFileStatus(claim).getModificationTime
          if (age < staleMs) false
          else { // crashed writer: break the stale claim and take it
            fs.delete(claim, false)
            writeClaim(fs, claim, token, overwrite = false)
          }
        } else writeClaim(fs, claim, token, overwrite = false)
      } catch { case _: java.io.IOException => false }
    if (!ok) jvmClaims.remove(key)
    ok
  }

  /** Multi-writer upsert: same semantics as `upsert`, safe to run
    * concurrently against one table from several threads or JVMs
    * sharing the filesystem. Each attempt re-reads the committed
    * timeline, so a retry merges ON TOP of the competing commit.
    */
  def upsertConcurrent(
      updates: DataFrame,
      targetPath: String,
      recordKeys: Seq[String],
      precombine: String,
      partitionBy: Seq[String] = Nil,
      clusterBy: Seq[String] = Nil,
      keepVersions: Int = 2,
      targetFileBytes: Long = 512L * 1024 * 1024,
      maxAttempts: Int = 20,
      claimStaleMs: Long = 10L * 60 * 1000,
      syncTable: Option[String] = None): Unit = {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    val spark = updates.sparkSession
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(target)
    var attempt = 0
    while (attempt < maxAttempts) {
      val versions = committedVersions(fs, target)
      val nextNum = versions.lastOption.map(_._1 + 1).getOrElse(1)
      // writer-unique token: if OUR claim gets broken as stale while
      // we are merely slow (not crashed), the pre-marker ownership
      // check below sees the breaker's token and aborts — the breaker
      // wins, we rebase; the committed timeline never loses an update
      val token = java.util.UUID.randomUUID().toString
      if (tryClaim(fs, target, nextNum, claimStaleMs, token)) {
        val verifyOwnership = () => {
          if (!readClaim(fs, claimPath(target, nextNum)).contains(token))
            throw new java.util.ConcurrentModificationException(
              s"claim on v$nextNum was broken as stale by a competing writer; rebasing")
        }
        try {
          mergeAndCommit(updates, spark, fs, target, versions, nextNum,
            recordKeys, precombine, partitionBy, clusterBy, keepVersions, targetFileBytes,
            preCommit = verifyOwnership)
          syncTable.foreach(name => CatalogSync.sync(spark, name, targetPath))
          return
        } catch {
          case _: java.util.ConcurrentModificationException =>
            // the version number is no longer ours (competing commit or
            // broken claim): leave the claim/tombstone alone, rebase on
            // the new timeline, retry on the next number
            jvmClaims.remove(s"${target.toUri}#v$nextNum")
          case e: Throwable =>
            // failed write: release so another writer (or our caller's
            // retry) can take this number — nothing was committed.
            // Delete only if the claim is still OURS (a breaker's claim
            // must survive as its lock/tombstone).
            if (readClaim(fs, claimPath(target, nextNum)).contains(token))
              fs.delete(claimPath(target, nextNum), false)
            jvmClaims.remove(s"${target.toUri}#v$nextNum")
            throw e
        }
      }
      attempt += 1
      // competing writer holds the next slot: wait for its commit to
      // land, then rebase on it (linear backoff, bounded)
      Thread.sleep(math.min(50L * attempt, 1000L))
    }
    throw new IllegalStateException(
      s"upsertConcurrent: gave up after $maxAttempts attempts on $targetPath " +
        "(writer contention or a stale claim within claimStaleMs)")
  }

  /** Async cleaner table service: drop committed versions beyond the
    * retention window, OUT-OF-BAND from writers — the reference runs
    * its Hudi cleaner async for exactly this reason
    * (generate_hudi_table.py:126-133: `hoodie.clean.automatic` +
    * async): on a hot table, inline cleaning adds listing + delete
    * latency to every commit. Writers opt out of inline cleaning by
    * passing a large `keepVersions`, and a scheduled clean() enforces
    * the real retention. Safe under the marker protocol: only
    * COMMITTED versions strictly older than the retained window are
    * deleted, so snapshot readers of the latest version and claim
    * tombstones are untouched.
    */
  def clean(
      spark: org.apache.spark.sql.SparkSession,
      targetPath: String,
      keepVersions: Int): Seq[Int] = {
    require(keepVersions >= 1, "clean must retain at least the live version")
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    retire(fs, target, keepVersions)
  }

  /** Versions PINNED by live branches: every `_branches/<name>/
    * branch.json` names its fork-point version, and dropping that
    * version would strand the branch (its three-way merge base gone —
    * a loud failure, but an unrecoverable one). Savepoint-style: the
    * pin lives exactly as long as the branch; `deleteBranch` releases
    * it. Cost: one directory listing when `_branches/` exists, one
    * existence check when it doesn't — never proportional to table
    * size or history.
    */
  private[sources] def pinnedVersions(fs: FileSystem, target: Path): Set[Int] = {
    val bdir = new Path(target, "_branches")
    if (!fs.exists(bdir)) Set.empty
    else fs.listStatus(bdir).toSeq.filter(_.isDirectory).flatMap { d =>
      val mp = new Path(d.getPath, "branch.json")
      if (!fs.exists(mp)) None
      else {
        val in = fs.open(mp)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        """"base_version"\s*:\s*(\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toInt)
      }
    }.toSet
  }

  /** The one retention path every cleaner goes through: drop committed
    * versions beyond the window, EXCEPT branch-pinned fork points.
    * Returns the versions actually dropped.
    */
  private def retire(fs: FileSystem, target: Path, keepVersions: Int): Seq[Int] = {
    val pinned = pinnedVersions(fs, target)
    val doomed = committedVersions(fs, target).dropRight(keepVersions)
      .filterNot { case (v, _) => pinned(v) }
    doomed.foreach { case (_, dir) => fs.delete(dir, true) }
    doomed.map(_._1)
  }

  /** Table service: rewrite the LIVE version into ~targetFileBytes
    * files (optionally re-clustered) as a new committed version —
    * content-identical, layout-only. The Hudi compaction/clustering
    * service analog (generate_hudi_table.py:150-167 runs these inline
    * on write; a table the writers feed with small frequent batches
    * runs this out-of-band instead). Sizing uses the version's ACTUAL
    * on-disk bytes — no Catalyst estimate involved — so the file
    * count is exact; readers keep resolving complete committed
    * versions throughout (same marker protocol as upsert).
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      targetPath: String,
      targetFileBytes: Long = 512L * 1024 * 1024,
      clusterBy: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil,
      keepVersions: Int = 2,
      zOrderBy: Seq[String] = Nil): Unit = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(clusterBy.isEmpty || zOrderBy.isEmpty,
      "pick linear clusterBy or multi-column zOrderBy, not both")
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = committedVersions(fs, target)
    require(versions.nonEmpty, s"no committed versions to compact at $targetPath")
    val (liveNum, liveDir) = versions.last
    val df = spark.read.parquet(liveDir.toString)
    val bytes = fs.getContentSummary(liveDir).getLength
    val nFiles = ((bytes + targetFileBytes - 1) / targetFileBytes).max(1).min(100000).toInt
    val clustered =
      // z-order clustering service (the async analog of Hudi's
      // clustering plan with a z-curve strategy): range-repartition on
      // the Morton key so each rewritten file covers a narrow range of
      // EVERY z column, not just the leading one
      if (zOrderBy.nonEmpty) graft.operators.ZOrder.cluster(df, zOrderBy, nFiles)
      else {
        val sized =
          if (partitionBy.nonEmpty) df.repartition(nFiles, partitionBy.map(col): _*)
          else if (nFiles <= spark.sessionState.conf.numShufflePartitions) df.coalesce(nFiles)
          else df.repartition(nFiles)
        if (clusterBy.nonEmpty) sized.sortWithinPartitions(clusterBy.map(col): _*)
        else sized
      }
    commitVersion(fs, target, clustered, liveNum + 1, partitionBy, keepVersions)
  }

  /** Hudi DELETE-operation analog: drop the rows whose record keys
    * appear in `deleteKeys`, committed as a new version under the
    * same marker protocol. The delete-key set is small by
    * construction (an explicit tombstone batch), so it broadcasts —
    * the table side anti-joins map-side and never shuffles.
    */
  def delete(
      spark: org.apache.spark.sql.SparkSession,
      targetPath: String,
      deleteKeys: DataFrame,
      recordKeys: Seq[String],
      partitionBy: Seq[String] = Nil,
      keepVersions: Int = 2): Unit = {
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = committedVersions(fs, target)
    require(versions.nonEmpty, s"no committed versions to delete from at $targetPath")
    val (liveNum, liveDir) = versions.last
    val live = spark.read.parquet(liveDir.toString)
    val remaining = live.join(
      broadcast(deleteKeys.select(recordKeys.map(col): _*)), recordKeys, "left_anti")
    commitVersion(fs, target, remaining, liveNum + 1, partitionBy, keepVersions)
  }

  /** Apply upserts AND deletes as ONE committed version — the
    * change-batch application a CDC consumer wants (two separate
    * upsert()+delete() calls would rewrite the table twice per
    * micro-batch; at any scale the COW rewrite dominates, so halving
    * the commits halves the apply cost). Either side may be empty.
    */
  def applyChanges(
      spark: org.apache.spark.sql.SparkSession,
      targetPath: String,
      upserts: DataFrame,
      deleteKeys: DataFrame,
      recordKeys: Seq[String],
      precombine: String,
      partitionBy: Seq[String] = Nil,
      keepVersions: Int = 2,
      meta: Map[String, String] = Map.empty): Unit = {
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = committedVersions(fs, target)
    require(versions.nonEmpty, s"no committed versions to apply changes to at $targetPath")
    val (liveNum, liveDir) = versions.last
    val live = spark.read.parquet(liveDir.toString).withColumn("_graft_src", lit(0))
    val upserted = merge(
      upserts.withColumn("_graft_src", lit(1)).unionByName(live, allowMissingColumns = true),
      recordKeys, precombine, tiebreakers = Seq("_graft_src")).drop("_graft_src")
    val remaining = upserted.join(
      broadcast(deleteKeys.select(recordKeys.map(col): _*)), recordKeys, "left_anti")
    commitVersion(fs, target, remaining, liveNum + 1, partitionBy, keepVersions, meta)
  }

  /** Hudi INSERT_OVERWRITE-operation analog: atomically replace the
    * partitions PRESENT in `newData`, keep every other partition
    * untouched, committed as one new version. The replaced-partition
    * set is derived from the batch itself (distinct partition values —
    * tiny, broadcast), so the live side anti-joins map-side: at 100 TB
    * the untouched partitions are read and rewritten only within this
    * COW layout's version copy, never shuffled.
    */
  def insertOverwrite(
      spark: org.apache.spark.sql.SparkSession,
      targetPath: String,
      newData: DataFrame,
      overwriteCols: Seq[String],
      partitionBy: Seq[String] = Nil,
      keepVersions: Int = 2): Unit = {
    require(overwriteCols.nonEmpty, "insertOverwrite needs the partition column(s)")
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = committedVersions(fs, target)
    require(versions.nonEmpty, s"no committed versions to overwrite at $targetPath")
    val (liveNum, liveDir) = versions.last
    val live = spark.read.parquet(liveDir.toString)
    // Null-safe equality (<=>): with a plain equi-anti-join, live rows
    // whose partition value is NULL never match, so a null partition
    // would be retained AND re-inserted — duplicates instead of a
    // replace. <=> makes the null partition overwritable like any other.
    val parts = broadcast(newData.select(overwriteCols.map(col): _*).distinct())
    val sameParts = overwriteCols.map(c => live(c) <=> parts(c)).reduce(_ && _)
    val untouched = live.join(parts, sameParts, "left_anti")
    commitVersion(fs, target, untouched.unionByName(newData), liveNum + 1,
      partitionBy, keepVersions)
  }

  /** Partial-column update (the Hudi partial-update payload /
    * Delta `MERGE ... UPDATE SET col = ...` shape): `patchDf` carries
    * the record keys plus a SUBSET of value columns; matched rows take
    * the patch's values for exactly those columns (a null in the patch
    * SETS null — the patch is authoritative for its columns),
    * unmatched table rows are untouched, and patch keys absent from
    * the table are ignored (update-only, no insert). The patch batch
    * broadcasts; the table never shuffles.
    */
  def patch(
      spark: org.apache.spark.sql.SparkSession,
      targetPath: String,
      patchDf: DataFrame,
      recordKeys: Seq[String],
      partitionBy: Seq[String] = Nil,
      keepVersions: Int = 2): Unit = {
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = committedVersions(fs, target)
    require(versions.nonEmpty, s"no committed versions to patch at $targetPath")
    val (liveNum, liveDir) = versions.last
    val live = spark.read.parquet(liveDir.toString)
    val patchCols = patchDf.columns.filterNot(recordKeys.contains).toIndexedSeq
    require(patchCols.nonEmpty, "patch needs at least one non-key column")
    val missing = patchCols.filterNot(live.columns.contains)
    require(missing.isEmpty, s"patch columns not in table schema: ${missing.mkString(", ")}")
    val renamed = patchCols.foldLeft(patchDf) { (d, c) => d.withColumnRenamed(c, s"_p_$c") }
    // A patch batch with duplicate keys would fan out matched table
    // rows through the left join (Hudi's partial-update payload
    // precombines first). The rejection is FOLDED INTO the broadcast
    // side's build — a per-key aggregate whose marker column raises on
    // the first duplicate — instead of a separate full pass over the
    // patch source (measured: the standalone dupKeys job was ~45% of
    // patch()'s wall time at sf0.1, because a patch expression's
    // source scan reruns end-to-end per job). first() is safe here:
    // it becomes visible only when the count guard proves the key
    // unique (including its legitimately-null patch values).
    val guarded = renamed.groupBy(recordKeys.map(col): _*)
      .agg(count(lit(1)).as("_p_cnt"),
        patchCols.map(c => first(col(s"_p_$c"), ignoreNulls = false).as(s"_p_$c")): _*)
      .withColumn("_graft_patched",
        when(col("_p_cnt") > 1,
          raise_error(lit("patch batch has duplicate record keys; precombine it before patch()"))
            .cast("int"))
          .otherwise(lit(1)))
      .drop("_p_cnt")
    val joined = live.join(broadcast(guarded), recordKeys, "left")
    val out = live.columns.toIndexedSeq.map { c =>
      if (patchCols.contains(c))
        when(col("_graft_patched").isNotNull, col(s"_p_$c")).otherwise(col(c)).as(c)
      else col(c)
    }
    commitVersion(fs, target, joined.select(out: _*), liveNum + 1, partitionBy, keepVersions)
  }

  /** Savepoint restore: re-commit a retained older version's CONTENT
    * as a brand-new version (Hudi `savepoint` + `restore`; Delta
    * `RESTORE TABLE ... TO VERSION`). Rolling FORWARD to a new
    * version — instead of deleting newer ones — keeps the timeline
    * append-only: incremental consumers see the rollback as one more
    * commit to replay, never a commit that vanished under them.
    */
  def restore(
      spark: org.apache.spark.sql.SparkSession,
      targetPath: String,
      version: Int,
      partitionBy: Seq[String] = Nil,
      keepVersions: Int = 2): Unit = {
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snapshot = readVersion(spark, targetPath, version)
    val liveNum = committedVersions(fs, target).last._1
    commitVersion(fs, target, snapshot, liveNum + 1, partitionBy, keepVersions)
  }

  /** Right-to-be-forgotten purge: remove every row matching
    * `purgeKeys` (joined on `matchCols` — typically the SUBJECT
    * column, e.g. user_id, not the record key) from EVERY retained
    * version, live and historical, rewriting each snapshot in place.
    * A plain [[delete]] only advances the head — time travel and CDC
    * reads still surface the subject's rows until retention ages them
    * out, which GDPR/CCPA erasure does not permit; purge is the
    * compliance-grade variant (Hudi's delete+cleaner tightening /
    * Delta VACUUM-after-delete reach the same end state). The
    * timeline SHAPE is preserved: version numbers, count and metadata
    * survive; only matching rows vanish from each snapshot.
    *
    * Cost, stated honestly: O(retained versions × snapshot size) —
    * the price of erasure from history; retention bounds it.
    *
    * Crash safety — each version swaps RECOVERABLY: the staged
    * rewrite becomes a COMPLETE version dir (data, metadata, commit
    * marker) before anything is touched, then the live dir steps
    * aside as `vNNNNNNNN.old`, the staged dir takes its place, and
    * the backup is dropped. A crash at any point leaves either the
    * old committed dir, the `.old` backup, or the committed staged
    * dir intact — [[recoverPurgeDebris]] (run on purge entry and by
    * [[TableClone.vacuum]]) rolls the swap forward or back from the
    * markers; no committed version is ever lost and the live read
    * never silently regresses to a stale snapshot.
    *
    * Concurrency — purge IS a writer: it holds the next version
    * slot's OCC claim (the same exclusive file `upsertConcurrent`
    * uses) for its whole run, so a concurrent upsert cannot commit
    * into a timeline purge is mid-way through rewriting; the claim
    * is re-verified before every irreversible swap and a broken
    * claim (we exceeded `claimStaleMs`) aborts LOUDLY with the
    * history only partially purged — rerun to finish; reruns are
    * idempotent. Returns the rewritten version numbers.
    */
  def purge(
      spark: org.apache.spark.sql.SparkSession,
      targetPath: String,
      purgeKeys: DataFrame,
      matchCols: Seq[String],
      claimStaleMs: Long = 10L * 60 * 1000): Seq[Int] = {
    require(matchCols.nonEmpty, "purge needs at least one match column")
    val target = new Path(targetPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverPurgeDebris(fs, target)
    val keys = broadcast(purgeKeys.select(matchCols.map(col): _*).distinct())
    val versions = committedVersions(fs, target)
    val nextNum = versions.lastOption.map(_._1 + 1).getOrElse(1)
    val token = java.util.UUID.randomUUID().toString
    if (!tryClaim(fs, target, nextNum, claimStaleMs, token))
      throw new java.util.ConcurrentModificationException(
        s"purge: a concurrent writer holds the next version slot of $targetPath; " +
          "run purge from the maintenance lane or retry after the writer commits")
    try {
      versions.map { case (num, dir) =>
        if (!readClaim(fs, claimPath(target, nextNum)).contains(token))
          throw new java.util.ConcurrentModificationException(
            s"purge: writer claim on $targetPath broken as stale mid-purge (exceeded " +
              s"claimStaleMs=$claimStaleMs); versions before v$num are purged — rerun to finish")
        val remaining = spark.read.parquet(dir.toString)
          .join(keys, matchCols, "left_anti")
        val staged = new Path(target, f"v$num%08d.purging")
        if (fs.exists(staged)) fs.delete(staged, true)
        remaining.write.mode(SaveMode.Overwrite).parquet(staged.toString)
        // staged becomes a complete committed version BEFORE the swap;
        // the ORIGINAL commit instant rides the meta (the staged
        // marker's mtime is the purge time, not the commit time) — an
        // idempotent rerun keeps the value already recorded
        val prior = readMetaDir(fs, dir)
        val instant = prior.getOrElse(CommitInstantKey,
          fs.getFileStatus(new Path(dir, CommitMarker)).getModificationTime.toString)
        writeMeta(fs, staged, prior + (CommitInstantKey -> instant))
        fs.create(new Path(staged, CommitMarker), true).close()
        val old = new Path(target, f"v$num%08d.old")
        if (fs.exists(old)) fs.delete(old, true)
        if (!fs.rename(dir, old))
          throw new java.io.IOException(s"purge: rename $dir -> $old failed")
        if (!fs.rename(staged, dir))
          throw new java.io.IOException(s"purge: rename $staged -> $dir failed")
        fs.delete(old, true)
        num
      }
    } finally {
      if (readClaim(fs, claimPath(target, nextNum)).contains(token))
        fs.delete(claimPath(target, nextNum), false)
      jvmClaims.remove(s"${target.toUri}#v$nextNum")
    }
  }

  /** Acquire the next-version writer claim (the `upsertConcurrent`
    * exclusive file), run `body(nextVersion)` under it, release.
    * Claim ACQUISITION retries with backoff — the body runs at most
    * once, on a version number computed inside the claim so no
    * concurrent claimed writer can commit between the read of the
    * timeline and the body's commit. For writers that are not the
    * upsert merge itself (branch publish, purge) but must still
    * serialize with it.
    */
  private[sources] def withNextVersionClaim[T](
      fs: FileSystem,
      target: Path,
      maxAttempts: Int = 20,
      claimStaleMs: Long = 10L * 60 * 1000)(body: Int => T): T = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val versions = committedVersions(fs, target)
      val next = versions.lastOption.map(_._1 + 1).getOrElse(1)
      val token = java.util.UUID.randomUUID().toString
      if (tryClaim(fs, target, next, claimStaleMs, token)) {
        try return body(next)
        finally {
          if (readClaim(fs, claimPath(target, next)).contains(token))
            fs.delete(claimPath(target, next), false)
          jvmClaims.remove(s"${target.toUri}#v$next")
        }
      }
      attempt += 1
      Thread.sleep(math.min(50L * attempt, 1000L))
    }
    throw new java.util.ConcurrentModificationException(
      s"could not acquire the writer claim on $target after $maxAttempts attempts " +
        "(writer contention or a stale claim within claimStaleMs)")
  }

  /** Roll a purge swap interrupted by a crash forward or back. For
    * every `vNNNNNNNN.old` backup: if the live dir re-committed, the
    * swap finished — drop the backup; else if the staged rewrite
    * carries its commit marker, complete the swap (roll forward);
    * else restore the backup as the live dir (roll back). Idempotent;
    * a root with no debris is a no-op. Exposed to [[TableClone.vacuum]]
    * so TTL cleanup can never destroy the only surviving copy of a
    * committed version.
    */
  private[sources] def recoverPurgeDebris(fs: FileSystem, target: Path): Unit = {
    if (!fs.exists(target)) return
    fs.listStatus(target).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.matches("v\\d{8}\\.old")) {
        val base = name.stripSuffix(".old")
        val dir = new Path(target, base)
        val staged = new Path(target, base + ".purging")
        if (fs.exists(new Path(dir, CommitMarker))) {
          fs.delete(st.getPath, true) // swap completed; backup is debris
        } else if (fs.exists(new Path(staged, CommitMarker))) {
          if (fs.exists(dir)) fs.delete(dir, true) // torn, uncommitted
          if (!fs.rename(staged, dir))
            throw new java.io.IOException(s"purge recovery: rename $staged -> $dir failed")
          fs.delete(st.getPath, true)
        } else {
          if (fs.exists(dir)) fs.delete(dir, true)
          if (fs.exists(staged)) fs.delete(staged, true)
          if (!fs.rename(st.getPath, dir))
            throw new java.io.IOException(s"purge recovery: rename ${st.getPath} -> $dir failed")
        }
      }
    }
  }

  private[sources] def commitVersion(
      fs: FileSystem,
      target: Path,
      df: DataFrame,
      versionNum: Int,
      partitionBy: Seq[String],
      keepVersions: Int,
      meta: Map[String, String] = Map.empty): Unit = {
    val versionDir = new Path(target, f"v$versionNum%08d")
    if (fs.exists(versionDir)) {
      if (fs.exists(new Path(versionDir, CommitMarker)))
        throw new java.util.ConcurrentModificationException(
          s"version $versionDir already committed by a competing writer; rebase and retry")
      fs.delete(versionDir, true) // uncommitted debris from a crash
    }
    val writer = df.write.mode(SaveMode.Overwrite)
    val partitioned = if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer
    partitioned.parquet(versionDir.toString)
    writeMeta(fs, versionDir, meta) // metadata rides the commit: before the marker
    fs.create(new Path(versionDir, CommitMarker), true).close()
    retire(fs, target, keepVersions): Unit
  }
}
