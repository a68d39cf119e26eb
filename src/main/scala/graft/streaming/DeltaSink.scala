package graft.streaming

import graft.sources.{DeltaTableReader, DeltaTableWriter}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming sink INTO an external-format Delta table —
  * the streaming face of [[graft.sources.DeltaTableWriter]], with
  * EXACTLY-ONCE batch delivery built from the protocol's own
  * mechanism: every micro-batch append commits a
  * `txn {appId, version=batchId}` action alongside its adds, and a
  * restarted/replayed batch is skipped when its id is at or below
  * [[DeltaTableReader.lastTransactionVersion]] — idempotence lives in
  * the TABLE's log (atomic with the data it describes), not in a
  * side-channel, so any number of at-least-once redeliveries land
  * each batch once. This is precisely how Delta's own streaming sink
  * achieves exactly-once (public PROTOCOL.md "Transaction
  * Identifiers"), re-expressed over graft's writer.
  *
  * Scale shape: per batch, one distributed parquet write + one
  * driver-side commit of |files-this-batch| actions + one
  * transaction-watermark probe (checkpoint txn column + JSON tail —
  * log-bounded metadata). State is zero: the log is the state.
  */
object DeltaSink {

  /** Idempotently append one micro-batch: returns true when the
    * batch landed, false when the table's transaction watermark for
    * `appId` proves it already did (replay → no-op). Creates the
    * table on the first batch.
    */
  def appendBatch(batch: DataFrame, tablePath: String, appId: String,
      batchId: Long): Boolean = {
    val spark = batch.sparkSession
    val last = DeltaTableReader.lastTransactionVersion(spark, tablePath, appId)
    if (last.exists(_ >= batchId)) false
    else {
      val txn = Some((appId, batchId))
      if (last.isEmpty &&
          !new org.apache.hadoop.fs.Path(tablePath, "_delta_log")
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(new org.apache.hadoop.fs.Path(tablePath, "_delta_log")))
        DeltaTableWriter.create(batch, tablePath, transaction = txn)
      else
        DeltaTableWriter.append(batch, tablePath, transaction = txn)
      true
    }
  }

  /** Drive a file-source event stream into a Delta table, one
    * idempotent append per micro-batch (AvailableNow — drains the
    * source and stops, the test/bench harness shape).
    */
  def streamEventsToDelta(
      spark: SparkSession,
      path: String,
      tablePath: String,
      appId: String,
      queryName: String = "graft_delta_sink"): Unit = {
    val events = EventStream.eventSource(spark, path, maxFilesPerTrigger = Some(1))
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val q = events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        appendBatch(batch.toDF(), tablePath, appId, id): Unit
      }
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
