package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read table — the write-optimized half of the reference's
  * Hudi surface (generate_hudi_table.py:86-214 writes COPY_ON_WRITE;
  * MERGE_ON_READ is the same writer contract with the merge deferred
  * to readers/compaction).
  *
  * Layout under `targetPath`:
  *
  *   base-v00000001/ ... parquet ... _graft_commit
  *   log-00000001/   ... parquet ... _graft_commit
  *   log-00000002/   ...
  *
  * A delta commit (`appendLog`) just writes its batch — NO read, NO
  * merge, NO rewrite of existing data. That's the point at 100 TB:
  * ingest cost is proportional to the batch, not the table. Readers
  * pay instead: `read` unions base + logs newer than the base and
  * resolves latest-wins per record key (one hash aggregate — the same
  * single-shuffle merge as the COW writer). `compact` folds the logs
  * into a new base so read amplification stays bounded; schedule it
  * when logs/base size ratio crosses a threshold.
  *
  * Commit protocol matches UpsertWriter: a directory exists for
  * readers iff its `_graft_commit` marker does, so a crashed write is
  * invisible debris, and base/log sequence numbers give a total
  * commit order (a log with seq <= the base's seq is superseded —
  * compaction already folded it in).
  */
object MorTable {

  private val CommitMarker = "_graft_commit"
  private val BaseRe = """base-v(\d{8})""".r
  private val LogRe = """log-(\d{8})""".r

  private def fs(spark: SparkSession, target: Path): FileSystem =
    target.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def committed(fs: FileSystem, target: Path): Seq[(String, Int, Path)] =
    if (!fs.exists(target)) Nil
    else
      fs.listStatus(target).toIndexedSeq
        .filter(_.isDirectory)
        .flatMap { st =>
          st.getPath.getName match {
            case BaseRe(n) if fs.exists(new Path(st.getPath, CommitMarker)) =>
              Some(("base", n.toInt, st.getPath))
            case LogRe(n) if fs.exists(new Path(st.getPath, CommitMarker)) =>
              Some(("log", n.toInt, st.getPath))
            case _ => None
          }
        }
        .sortBy(_._2)

  private def nextSeq(entries: Seq[(String, Int, Path)]): Int =
    entries.map(_._2).maxOption.getOrElse(0) + 1

  private def write(fs: FileSystem, dir: Path, df: DataFrame): Unit = {
    if (fs.exists(dir)) fs.delete(dir, true) // uncommitted crash debris
    df.write.mode(SaveMode.Overwrite).parquet(dir.toString)
    fs.create(new Path(dir, CommitMarker), true).close()
  }

  /** Bootstrap (or replace) the base snapshot. */
  def writeBase(df: DataFrame, targetPath: String): Unit = {
    val target = new Path(targetPath)
    val f = fs(df.sparkSession, target)
    write(f, new Path(target, f"base-v${nextSeq(committed(f, target))}%08d"), df)
  }

  /** Delta commit: append one batch as a new log directory. O(batch). */
  def appendLog(updates: DataFrame, targetPath: String): Unit = {
    val target = new Path(targetPath)
    val f = fs(updates.sparkSession, target)
    val entries = committed(f, target)
    require(entries.exists(_._1 == "base"), s"no committed base at $targetPath")
    write(f, new Path(target, f"log-${nextSeq(entries)}%08d"), updates)
  }

  /** Active (base, newer logs) pair: the latest base and every log
    * committed after it, in commit order.
    */
  private def active(f: FileSystem, target: Path): (Path, Seq[Path]) = {
    val entries = committed(f, target)
    val (baseSeq, basePath) = entries.collect { case ("base", n, p) => (n, p) }.lastOption
      .getOrElse(throw new IllegalArgumentException(s"no committed base at $target"))
    (basePath, entries.collect { case ("log", n, p) if n > baseSeq => p })
  }

  /** Snapshot read with read-time merge: base ∪ newer logs, latest
    * (precombine, commit-seq) wins per record key. Log batches carry
    * their commit sequence as the tiebreaker, so a later delta beats
    * an earlier one at equal precombine values — the Hudi
    * log-ordering rule. Schema evolution matches the COW writer:
    * unionByName(allowMissingColumns) null-fills columns either side
    * lacks.
    */
  def read(
      spark: SparkSession,
      targetPath: String,
      recordKeys: Seq[String],
      precombine: String): DataFrame = {
    val target = new Path(targetPath)
    val (basePath, logs) = active(fs(spark, target), target)
    val base = spark.read.parquet(basePath.toString).withColumn("_graft_seq", lit(0L))
    val all = logs.zipWithIndex.foldLeft(base) { case (acc, (dir, i)) =>
      acc.unionByName(
        spark.read.parquet(dir.toString).withColumn("_graft_seq", lit(i + 1L)),
        allowMissingColumns = true)
    }
    UpsertWriter.merge(all, recordKeys, precombine, tiebreakers = Seq("_graft_seq"))
      .drop("_graft_seq")
  }

  /** Read-optimized view (Hudi's `_ro` table): the latest BASE only —
    * zero merge cost, no log scan, at the price of staleness bounded
    * by the uncompacted logs. The analytics-side contract of a MOR
    * table: dashboards read this, the ingest path keeps appending
    * logs, and compaction advances what "optimized" sees.
    */
  def readOptimized(spark: SparkSession, targetPath: String): DataFrame = {
    val target = new Path(targetPath)
    val (basePath, _) = active(fs(spark, target), target)
    spark.read.parquet(basePath.toString)
  }

  /** Read-amplification gauge: (number of live logs, log bytes / base
    * bytes). Callers compact when it crosses their threshold.
    */
  def logStats(spark: SparkSession, targetPath: String): (Int, Double) = {
    val target = new Path(targetPath)
    val f = fs(spark, target)
    val (basePath, logs) = active(f, target)
    val baseBytes = f.getContentSummary(basePath).getLength.max(1L)
    val logBytes = logs.map(p => f.getContentSummary(p).getLength).sum
    (logs.size, logBytes.toDouble / baseBytes)
  }

  /** Compaction: fold the live logs into a new base (content ≡ what
    * `read` serves, so compaction is invisible to readers), then drop
    * the folded logs and the old base. The new base's sequence number
    * is above every folded log's, which is what marks them superseded.
    */
  def compact(
      spark: SparkSession,
      targetPath: String,
      recordKeys: Seq[String],
      precombine: String): Unit = {
    val target = new Path(targetPath)
    val f = fs(spark, target)
    val entries = committed(f, target)
    val merged = read(spark, targetPath, recordKeys, precombine)
    write(f, new Path(target, f"base-v${nextSeq(entries)}%08d"), merged)
    // everything with seq <= old entries' max is now superseded
    entries.foreach { case (_, _, p) => f.delete(p, true) }
  }
}
