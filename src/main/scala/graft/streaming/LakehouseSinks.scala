package graft.streaming

import graft.sources.{HudiTableWriter, IcebergTableWriter}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming sinks INTO external Iceberg and Hudi tables —
  * the remaining two legs beside [[DeltaSink]], each with EXACTLY-ONCE
  * batch delivery built from the format's OWN metadata (never a
  * side-channel, so idempotence is atomic with the data it describes):
  *
  *  - Iceberg: each micro-batch append stamps the snapshot SUMMARY
  *    with (app-id, batch-id) — the Flink-connector pattern (the
  *    checkpoint id rides the snapshot summary); a replayed batch is
  *    skipped off [[IcebergTableWriter.lastBatchId]], and summaries
  *    re-serialize VERBATIM across later commits so the watermark
  *    survives the table's whole lifecycle;
  *  - Hudi: each batch's `.commit` carries the watermark in
  *    `extraMetadata` — Hudi's own deltastreamer checkpoint pattern;
  *    [[HudiTableWriter.lastBatchId]] probes the timeline.
  *
  * Scale shape per batch: one distributed parquet write + one
  * driver-side metadata commit + one watermark probe (|snapshots| /
  * |instants| driver metadata). State is zero: the table is the state.
  */
object LakehouseSinks {

  /** Idempotently append one micro-batch into an Iceberg table:
    * true = landed, false = the snapshot-summary watermark proves it
    * already did (replay → no-op). Creates the table on the first
    * batch — the create's own snapshot summary carries the watermark,
    * so even a crash right after the create replays as a no-op.
    */
  def appendBatchIceberg(batch: DataFrame, tablePath: String, appId: String,
      batchId: Long): Boolean = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new org.apache.hadoop.fs.Path(tablePath, "metadata")
    val exists = fs.exists(metaDir) &&
      fs.listStatus(metaDir).exists(_.getPath.getName.endsWith(".metadata.json"))
    if (!exists) {
      IcebergTableWriter.create(batch, tablePath,
        transaction = Some((appId, batchId))): Unit
      true
    } else {
      val last = IcebergTableWriter.lastBatchId(spark, tablePath, appId)
      if (last.exists(_ >= batchId)) false
      else {
        IcebergTableWriter.append(batch, tablePath,
          transaction = Some((appId, batchId))): Unit
        true
      }
    }
  }

  /** Idempotently append one micro-batch into a Hudi COW table. */
  def appendBatchHudi(batch: DataFrame, tablePath: String, appId: String,
      batchId: Long, tableName: String = "graft_sink"): Boolean = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(tablePath, ".hoodie")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(tablePath, ".hoodie"))
    val extra = Map(
      HudiTableWriter.SinkAppKey -> appId,
      HudiTableWriter.SinkBatchKey -> batchId.toString)
    if (!exists) {
      HudiTableWriter.create(batch, tablePath, tableName = tableName,
        extraMetadata = extra): Unit
      true
    } else {
      val last = HudiTableWriter.lastBatchId(spark, tablePath, appId)
      if (last.exists(_ >= batchId)) false
      else {
        HudiTableWriter.append(batch, tablePath, extraMetadata = extra): Unit
        true
      }
    }
  }

  /** Drive a file-source event stream into an Iceberg table, one
    * idempotent append per micro-batch (AvailableNow).
    */
  def streamEventsToIceberg(spark: SparkSession, path: String, tablePath: String,
      appId: String, queryName: String = "graft_iceberg_sink"): Unit =
    drive(spark, path, queryName) { (batch, id) =>
      appendBatchIceberg(batch, tablePath, appId, id): Unit
    }

  /** Drive a file-source event stream into a Hudi COW table, one
    * idempotent append per micro-batch (AvailableNow).
    */
  def streamEventsToHudi(spark: SparkSession, path: String, tablePath: String,
      appId: String, queryName: String = "graft_hudi_sink"): Unit =
    drive(spark, path, queryName) { (batch, id) =>
      appendBatchHudi(batch, tablePath, appId, id): Unit
    }

  private def drive(spark: SparkSession, path: String, queryName: String)(
      land: (DataFrame, Long) => Unit): Unit = {
    val events = EventStream.eventSource(spark, path, maxFilesPerTrigger = Some(1))
    val q = events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        land(batch.toDF(), id)
      }
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
