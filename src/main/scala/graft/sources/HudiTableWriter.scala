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
  * Append-only by design, like [[DeltaTableWriter]]: UPDATES against
  * a COW layout rewrite whole file groups, which is the versioned
  * table machinery's job ([[UpsertWriter]]); inserts are the
  * interop-safe subset every Hudi reader — snapshot AND incremental —
  * consumes identically.
  */
object HudiTableWriter {

  val MaxCommitAttempts: Int = 20

  private def hoodieDir(tablePath: String): Path = new Path(tablePath, ".hoodie")

  private def instantNow(offsetMs: Long): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(System.currentTimeMillis() + offsetMs))

  private def writeProperties(spark: SparkSession, tablePath: String, name: String,
      recordKeys: Seq[String], precombineField: Option[String]): Unit = {
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
      val out = fs.create(p, false)
      try out.write(
        (s"hoodie.table.name=$name\n" +
          "hoodie.table.type=COPY_ON_WRITE\n" +
          "hoodie.table.version=5\n" + keyLines + precombineLine).getBytes("UTF-8"))
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
  private def stamped(df: DataFrame, instant: String, recordKeys: Seq[String]): DataFrame = {
    val withTime = df.withColumn("_hoodie_commit_time", lit(instant))
    if (recordKeys.isEmpty) withTime
    else withTime.withColumn("_hoodie_record_key",
      concat_ws(",", recordKeys.map(k => concat(lit(s"$k:"), col(k).cast("string"))): _*))
  }

  /** Write one insert commit: every staged parquet file becomes a NEW
    * file group named per the Hudi base-file convention, and the
    * `.commit` meta file publishes them. Returns the commit instant.
    */
  private def insertCommit(df: DataFrame, tablePath: String,
      recordKeys: Seq[String]): String = {
    val spark = df.sparkSession
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    var attempt = 0
    while (true) {
      val instant = instantNow(attempt.toLong)
      val stage = new Path(tablePath, s".graft-stage-${java.util.UUID.randomUUID()}")
      stamped(df, instant, recordKeys).write.parquet(stage.toString)
      val writes = Seq.newBuilder[(String, String)] // (fileId, path)
      fs.listStatus(stage).filter(_.getPath.getName.endsWith(".parquet")).foreach { st =>
        val fileId = java.util.UUID.randomUUID().toString
        val rel = s"${fileId}_0-0-0_$instant.parquet"
        if (!fs.rename(st.getPath, new Path(tablePath, rel)))
          throw new IllegalStateException(s"$tablePath: failed to land base file $rel")
        writes += ((fileId, rel))
      }
      fs.delete(stage, true)
      val files = writes.result()
      if (files.isEmpty) throw new IllegalArgumentException(
        s"$tablePath: the DataFrame wrote no data files (empty input?)")
      val stats = files.map { case (fid, path) =>
        s"""{"fileId":"$fid","path":"$path","numWrites":1,"numUpdateWrites":0,""" +
          s""""totalWriteBytes":${fs.getFileStatus(new Path(tablePath, path)).getLen},""" +
          s""""prevCommit":"null"}"""
      }.mkString(",")
      val commitPath = new Path(hoodieDir(tablePath), s"$instant.commit")
      fs.mkdirs(hoodieDir(tablePath))
      // exclusive create = the instant-uniqueness CAS; a same-instant
      // racer loses here, abandons its files as uncommitted debris
      // (invisible to readers — the timeline is the source of truth)
      // and retries at the next instant
      val created = try {
        val out = fs.create(commitPath, false)
        try out.write(
          (s"""{"partitionToWriteStats":{"":[$stats]},"operationType":"INSERT"}""" + "\n")
            .getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
      if (created) return instant
      files.foreach { case (_, path) => fs.delete(new Path(tablePath, path), false) }
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
      recordKeys: Seq[String] = Nil, precombineField: Option[String] = None): String = {
    val spark = df.sparkSession
    val dir = hoodieDir(tablePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) throw new IllegalArgumentException(
      s"$tablePath is already a Hudi table — use append")
    recordKeys.foreach(k => require(df.columns.contains(k),
      s"record-key field $k is not in the DataFrame"))
    fs.mkdirs(dir)
    writeProperties(spark, tablePath, tableName, recordKeys, precombineField)
    insertCommit(df, tablePath, recordKeys)
  }

  /** Append `df` as a new insert commit; columns must match the
    * table's existing data columns (order-free). The record-key
    * stamping comes from the TABLE's declared
    * `hoodie.table.recordkey.fields` — never a per-call choice, so
    * every base file agrees on whether `_hoodie_record_key` exists.
    * A non-empty `recordKeys` argument is validation only: it must
    * equal the declaration (callers asserting what they expect).
    */
  def append(df: DataFrame, tablePath: String, recordKeys: Seq[String] = Nil): String = {
    val spark = df.sparkSession
    val declared = declaredRecordKeys(spark, tablePath)
    require(recordKeys.isEmpty || recordKeys == declared,
      s"$tablePath: append asserts record keys ${recordKeys.mkString(",")} but the table " +
        s"declares hoodie.table.recordkey.fields=${declared.mkString(",")} — the table " +
        "property wins; drop the argument or fix the expectation")
    val existing = HudiTableReader.snapshot(spark, tablePath)
    val dataCols = existing.columns.filterNot(_.startsWith("_hoodie_")).toSet
    require(df.columns.toSet == dataCols,
      s"$tablePath: appended columns ${df.columns.sorted.mkString(",")} != table columns " +
        s"${dataCols.toSeq.sorted.mkString(",")} — appends must match the existing schema")
    insertCommit(df, tablePath, declared)
  }
}
