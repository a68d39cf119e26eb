package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary index over a NON-key column of the versioned table —
  * "find the records where city = X" without scanning the table,
  * the analog of Hudi's secondary-index / Delta's generated-column
  * skipping for point predicates on non-key columns (the record
  * index, `RecordIndex`, already covers the record KEY; this covers
  * everything else worth probing).
  *
  * Layout: the index is ITSELF a versioned UpsertWriter table keyed
  * by the record key, holding (record keys, indexed value, bucket)
  * and hive-partitioned by `bucket = pmod(xxhash64(value), nBuckets)`
  * — a probe hashes its values with the same Spark kernel (no
  * driver-side reimplementation to drift) and reads only the probed
  * buckets via partition pruning, exactly the RecordIndex discipline.
  *
  * Maintenance is INCREMENTAL: the index commit records which table
  * version it covers; a refresh diffs that version against the live
  * one (`SnapshotDiff.diff` — one full-outer join of two snapshots,
  * the same shuffle an upsert pays) and folds only the CHANGED
  * records in (upserts for insert/update — the upsert's latest-wins
  * by record key retires the old value-row automatically — and
  * tombstones for deletes). History is never rescanned; an
  * up-to-date refresh is a metadata no-op.
  */
object SecondaryIndex {

  private val VersionKey = "graft.indexedVersion"

  private def bucket(valueCol: String, nBuckets: Int) =
    pmod(xxhash64(col(valueCol)), lit(nBuckets.toLong)).cast("int")

  /** Table version currently covered by the index, if any. */
  def indexedVersion(spark: SparkSession, indexPath: String): Option[Int] =
    UpsertWriter.readMeta(spark, indexPath).get(VersionKey).map(_.toInt)

  /** Build or incrementally refresh the index at `indexPath` for
    * `idxCol` of the versioned table at `tablePath`. Returns the
    * table version the index now covers.
    */
  def refresh(
      spark: SparkSession,
      tablePath: String,
      indexPath: String,
      recordKeys: Seq[String],
      idxCol: String,
      nBuckets: Int = 64): Int = {
    require(nBuckets > 0, "nBuckets must be positive")
    val table = new Path(tablePath)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = UpsertWriter.committedVersions(fs, table)
    require(live.nonEmpty, s"cannot index $tablePath: no committed versions")
    val liveNum = live.last._1
    val already = indexedVersion(spark, indexPath)
    if (already.contains(liveNum)) return liveNum
    val meta = Map(VersionKey -> liveNum.toString)
    val entryCols = recordKeys.map(col) ++ Seq(col(idxCol),
      bucket(idxCol, nBuckets).as("bucket"), lit(0L).as("_ver"))

    already.flatMap(v => live.find(_._1 == v)) match {
      case Some((_, oldDir)) =>
        val oldDf = spark.read.parquet(oldDir.toString)
          .select((recordKeys.map(col) :+ col(idxCol)): _*)
        val newDf = UpsertWriter.readVersion(spark, tablePath, liveNum)
          .select((recordKeys.map(col) :+ col(idxCol)): _*)
        val changes = graft.operators.SnapshotDiff.diff(oldDf, newDf, recordKeys).cache()
        val upserts = changes.filter(col("change_type").isin("insert", "update"))
          .select(entryCols: _*)
        val deletes = changes.filter(col("change_type") === "delete")
          .select(recordKeys.map(col): _*)
        // ONE commit applies both sides and carries the covered-
        // version mark atomically — a crash between two commits could
        // otherwise leave the mark claiming changes it half-applied
        UpsertWriter.applyChanges(spark, indexPath, upserts, deletes,
          recordKeys, "_ver", partitionBy = Seq("bucket"), meta = meta)
        changes.unpersist()
      case None =>
        // first build — or the previously-indexed version left the
        // retained window (diff base gone). A stale index must be
        // WIPED, not merged into: entries for records deleted since
        // the lost base would survive an upsert-merge forever.
        if (already.isDefined) {
          val idxDir = new Path(indexPath)
          idxDir.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(idxDir, true)
        }
        val liveDf = UpsertWriter.readVersion(spark, tablePath, liveNum)
        UpsertWriter.upsert(liveDf.select(entryCols: _*), indexPath, recordKeys, "_ver",
          partitionBy = Seq("bucket"), meta = meta)
    }
    liveNum
  }

  /** Probe: records whose `idxCol` equals any of `values`, read
    * through the index — the index scan plans ONLY the probed
    * buckets (partition pruning on the hive `bucket` dirs), and the
    * matched record keys (a point-lookup-sized set) broadcast-join
    * back to the live table for the full rows. A 100 TB table
    * answers from 1/nBuckets of the INDEX plus the matched rows.
    */
  def lookup(
      spark: SparkSession,
      tablePath: String,
      indexPath: String,
      recordKeys: Seq[String],
      idxCol: String,
      values: Seq[Any],
      nBuckets: Int = 64): DataFrame = {
    require(values.nonEmpty, "lookup needs at least one probe value")
    val lv = UpsertWriter.read(spark, indexPath).schema(idxCol).dataType
    val probe = spark.createDataFrame(
      spark.sparkContext.parallelize(values.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(idxCol, lv))))
    val buckets = probe.select(bucket(idxCol, nBuckets).as("b")).distinct()
      .collect().map(_.getInt(0)).toIndexedSeq
    val keys = UpsertWriter.read(spark, indexPath)
      .filter(col("bucket").isin(buckets: _*) && col(idxCol).isin(values: _*))
      .select(recordKeys.map(col): _*)
    UpsertWriter.read(spark, tablePath).join(broadcast(keys), recordKeys)
  }

  /** Probe with a DataFrame of values — the same partition-pruned
    * plan for probe sets too large to enumerate in a driver `Seq`
    * (a dimension slice, another query's output). The probe's
    * DISTINCT BUCKETS are derived distributed with the same hash
    * kernel and collected as pruning literals — that collect is
    * bounded by `nBuckets` (≤64 ints by default) no matter how many
    * probe values there are; the VALUES themselves never touch the
    * driver: they semi-join against the pruned index scan. The final
    * key join back to the table is left unhinted — AQE broadcasts
    * lookup-sized key sets and shuffles genuinely large ones.
    *
    * `probe` must carry a column named `idxCol`.
    */
  def lookup(
      spark: SparkSession,
      tablePath: String,
      indexPath: String,
      recordKeys: Seq[String],
      idxCol: String,
      probe: DataFrame,
      nBuckets: Int): DataFrame = {
    require(probe.columns.contains(idxCol),
      s"probe DataFrame must carry a '$idxCol' column (has: ${probe.columns.mkString(", ")})")
    val probeVals = probe.select(col(idxCol)).distinct()
    val buckets = probeVals.select(bucket(idxCol, nBuckets).as("b")).distinct()
      .collect().map(_.getInt(0)).toIndexedSeq
    if (buckets.isEmpty) {
      // empty probe: empty result with the table's schema, no scan
      val t = UpsertWriter.read(spark, tablePath)
      return t.filter(lit(false))
    }
    val keys = UpsertWriter.read(spark, indexPath)
      .filter(col("bucket").isin(buckets: _*))
      .join(probeVals, Seq(idxCol), "left_semi")
      .select(recordKeys.map(col): _*)
    UpsertWriter.read(spark, tablePath).join(keys, recordKeys)
  }
}
