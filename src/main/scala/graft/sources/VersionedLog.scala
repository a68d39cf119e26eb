package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned multi-channel APPEND log — the state layout for
  * incremental operators whose state is immutable facts (e.g. the
  * MinHash-LSH band/set state), not keyed rows:
  *
  * {{{
  *   root/
  *     v00000001/ bands/ ... sets/ ... _graft_meta  _graft_commit
  *     v00000002/ ...
  * }}}
  *
  * One append = one version holding EVERY channel of the batch, plus
  * a metadata file, all published by a single commit-marker write —
  * so a multi-output refresh is atomic: a crash between channel
  * writes leaves an uncommitted directory readers ignore, never
  * bands without their sets (the partial-failure hole of two bare
  * `mode("append")` parquet writes). Same marker protocol as
  * [[UpsertWriter]]'s versioned tables; single-writer per root, like
  * the versioned tables without `upsertConcurrent`.
  *
  * Replay bookkeeping rides the commit: `append` records the batch id
  * in the version's metadata and the running high-water mark, so an
  * at-least-once consumer can recognize a redelivered batch and
  * re-derive (or skip) its output instead of double-appending state.
  * `compact` collapses all committed versions into one (fewer files,
  * same rows) while carrying the high-water mark forward — bounding
  * the exact-replay window exactly like a table cleaner bounds
  * incremental reads.
  */
object VersionedLog {

  private val CommitMarker = "_graft_commit"
  private val MetaFile = "_graft_meta"
  private val VersionRe = """v(\d{8})""".r

  /** Metadata key: this version's own batch id. */
  val BatchKey = "graft.batchId"
  /** Metadata key: max batch id applied up to and including this version. */
  val HwmKey = "graft.appliedBatchHwm"

  final case class Version(num: Int, dir: String, meta: Map[String, String])

  private def fsOf(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def readMetaDir(fs: FileSystem, dir: Path): Map[String, String] = {
    val p = new Path(dir, MetaFile)
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

  /** Committed versions, ascending. */
  def committed(spark: SparkSession, root: String): Seq[Version] = {
    val (fs, target) = fsOf(spark, root)
    if (!fs.exists(target)) Nil
    else
      fs.listStatus(target).toIndexedSeq
        .filter(_.isDirectory)
        .flatMap { st =>
          st.getPath.getName match {
            case VersionRe(num) if fs.exists(new Path(st.getPath, CommitMarker)) =>
              Some(Version(num.toInt, st.getPath.toString, readMetaDir(fs, st.getPath)))
            case _ => None
          }
        }
        .sortBy(_.num)
  }

  /** High-water mark of applied batch ids, if any batch carried one. */
  def appliedHwm(spark: SparkSession, root: String): Option[Long] =
    committed(spark, root).lastOption.flatMap(_.meta.get(HwmKey)).map(_.toLong)

  /** The committed version a given batch id was applied as, if it is
    * still retained (compaction collapses old versions, after which
    * only the high-water mark remembers them).
    */
  def versionOfBatch(spark: SparkSession, root: String, batchId: Long): Option[Version] =
    committed(spark, root).find(_.meta.get(BatchKey).contains(batchId.toString))

  /** Append one batch: every channel's rows written under a new
    * version directory, metadata (batch id + advanced high-water
    * mark, plus `extraMeta`) before the marker, then the marker —
    * one atomic publish. Returns the committed version number.
    */
  def append(
      spark: SparkSession,
      root: String,
      channels: Map[String, DataFrame],
      batchId: Option[Long] = None,
      extraMeta: Map[String, String] = Map.empty,
      partitionBy: Map[String, Seq[String]] = Map.empty): Int = {
    require(channels.nonEmpty, "append needs at least one channel")
    val (fs, target) = fsOf(spark, root)
    fs.mkdirs(target)
    val prior = committed(spark, root)
    val nextNum = prior.lastOption.map(_.num + 1).getOrElse(1)
    val versionDir = new Path(target, f"v$nextNum%08d")
    if (fs.exists(versionDir)) {
      if (fs.exists(new Path(versionDir, CommitMarker)))
        throw new java.util.ConcurrentModificationException(
          s"version $versionDir already committed by a competing writer")
      fs.delete(versionDir, true) // uncommitted debris from a crash
    }
    channels.foreach { case (name, df) =>
      val w = df.write.mode(SaveMode.Overwrite)
      partitionBy.get(name).filter(_.nonEmpty).fold(w)(cols => w.partitionBy(cols: _*))
        .parquet(new Path(versionDir, name).toString)
    }
    val hwm = (prior.lastOption.flatMap(_.meta.get(HwmKey)).map(_.toLong).toSeq ++ batchId.toSeq)
      .maxOption
    val meta = extraMeta ++
      batchId.map(BatchKey -> _.toString) ++
      hwm.map(HwmKey -> _.toString)
    if (meta.nonEmpty) {
      val props = new java.util.Properties()
      meta.foreach { case (k, v) => props.setProperty(k, v) }
      val out = fs.create(new Path(versionDir, MetaFile), true)
      try props.store(out, null)
      finally out.close()
    }
    fs.create(new Path(versionDir, CommitMarker), true).close() // commit point
    nextNum
  }

  /** Union of one channel's rows across committed versions with
    * `num <= upTo` (all, by default). None when no retained version
    * carries the channel — the caller supplies the empty case's
    * schema.
    */
  def read(spark: SparkSession, root: String, channel: String, upTo: Option[Int] = None): Option[DataFrame] = {
    val (fs, _) = fsOf(spark, root)
    val dirs = committed(spark, root)
      .filter(v => upTo.forall(v.num <= _))
      .map(v => new Path(v.dir, channel))
      .filter(fs.exists(_))
      .map(_.toString)
    if (dirs.isEmpty) None
    // one read per version root, unioned: a channel written with
    // partitionBy makes each version dir its own partition root, and
    // multiple partition roots cannot share one scan (Spark derives
    // the base path from their common ancestor, where the vNNNNNNNN
    // dirs read as non-partition directories and conflict)
    else Some(dirs.map(spark.read.parquet(_)).reduce(_ unionByName _))
  }

  /** Compaction table service for the log: rewrite ALL committed
    * versions' channels as ONE new version with `targetFileBytes`-
    * sized files, then drop the originals. Content-identical rows,
    * far fewer files/versions — the answer to "one file-set per
    * batch forever". The high-water mark carries forward; per-batch
    * version mapping does not, so exact replay of a pre-compaction
    * batch degrades to a recognized no-op (bounded replay window,
    * the same trade a table cleaner makes with incremental readers).
    */
  def compact(
      spark: SparkSession,
      root: String,
      targetFileBytes: Long = 512L * 1024 * 1024,
      partitionBy: Map[String, Seq[String]] = Map.empty): Unit = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val (fs, target) = fsOf(spark, root)
    val versions = committed(spark, root)
    require(versions.nonEmpty, s"no committed versions to compact at $root")
    val channelNames = versions
      .flatMap(v => fs.listStatus(new Path(v.dir)).toIndexedSeq
        .filter(_.isDirectory).map(_.getPath.getName))
      .distinct
    val nextNum = versions.last.num + 1
    val versionDir = new Path(target, f"v$nextNum%08d")
    if (fs.exists(versionDir)) {
      if (fs.exists(new Path(versionDir, CommitMarker)))
        throw new java.util.ConcurrentModificationException(
          s"version $versionDir already committed by a competing writer")
      fs.delete(versionDir, true)
    }
    channelNames.foreach { name =>
      read(spark, root, name).foreach { df =>
        val bytes = versions.map(v => new Path(v.dir, name))
          .filter(fs.exists(_)).map(fs.getContentSummary(_).getLength).sum
        val nFiles = ((bytes + targetFileBytes - 1) / targetFileBytes).max(1).min(100000).toInt
        val parts = partitionBy.get(name).filter(_.nonEmpty)
        val sized = parts match {
          // partitioned channel: cluster rows by the partition key so
          // each partition directory gets few files, not one per task
          case Some(cols) => df.repartition(nFiles, cols.map(org.apache.spark.sql.functions.col): _*)
          case None =>
            if (nFiles <= spark.sessionState.conf.numShufflePartitions) df.coalesce(nFiles)
            else df.repartition(nFiles)
        }
        val w = sized.write.mode(SaveMode.Overwrite)
        parts.fold(w)(cols => w.partitionBy(cols: _*))
          .parquet(new Path(versionDir, name).toString)
      }
    }
    val hwm = versions.lastOption.flatMap(_.meta.get(HwmKey))
    hwm.foreach { h =>
      val props = new java.util.Properties()
      props.setProperty(HwmKey, h)
      val out = fs.create(new Path(versionDir, MetaFile), true)
      try props.store(out, null)
      finally out.close()
    }
    fs.create(new Path(versionDir, CommitMarker), true).close()
    versions.foreach(v => fs.delete(new Path(v.dir), true))
  }
}
