package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Streaming incremental consumption of a versioned table's delta
  * log — the Hudi "streaming incremental query" analog (the
  * reference's incremental consumer, template.py:197-217, pulls
  * batches in a poll loop; this is the same contract surfaced as a
  * Structured Streaming source).
  *
  * `sources.MorTable.appendLog` writes each delta commit as a new
  * immutable directory of parquet files; Spark's file stream source
  * discovers new files per micro-batch, so every delta commit
  * becomes stream input with NO custom Source implementation and no
  * polling code — checkpointing, exactly-once file tracking, and
  * backpressure (`maxFilesPerTrigger`) all come from the built-in
  * source. At 100 TB the stream reads only each commit's files,
  * never the table.
  *
  * Delivery note: a log directory's files are listed by the source
  * as soon as they exist; the `_graft_commit` marker lands right
  * after the parquet write completes. Parquet files surface
  * whole-file (written via temp + rename), so a reader never sees a
  * partial file; a crashed writer can at worst leak an uncommitted
  * directory whose files are complete — the same at-least-once
  * contract the reference's poll loop has.
  */
object TableStream {

  /** Streaming view of `tablePath`'s delta log. Schema comes from a
    * one-time batch peek at the existing log files (production
    * callers with a declared table schema pass work straight to
    * `readStream.schema(...)`).
    */
  def logStream(spark: SparkSession, tablePath: String): DataFrame = {
    val glob = s"$tablePath/log-*"
    val schema = spark.read
      .option("pathGlobFilter", "*.parquet").parquet(glob).schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "*.parquet") // never the commit markers
      .option("maxFilesPerTrigger", "1")     // one commit ≈ one micro-batch
      .parquet(glob)
  }

  /** Apply a change-data feed (SnapshotDiff.changeFeed rows:
    * key cols, `change_type`, value cols) to a versioned mirror table,
    * one micro-batch per feed file: `insert`/`update_postimage` rows
    * upsert by key, `delete` rows tombstone, `update_preimage` rows
    * are retraction bookkeeping for downstream consumers and are NOT
    * applied. Each key appears in one change per feed, so batch
    * boundaries can split the feed arbitrarily without reordering
    * hazards. This is the consumer half of CDC: feed in, mirror
    * converges to the source's new version.
    */
  def runCdcApplyToBatch(
      spark: SparkSession,
      feedPath: String,
      mirrorPath: String,
      recordKeys: Seq[String],
      precombine: String,
      queryName: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val schema = spark.read.parquet(feedPath).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(feedPath)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.toDF()
        val ups = b.filter(col("change_type").isin("insert", "update_postimage"))
          .drop("change_type")
        val dels = b.filter(col("change_type") === "delete")
          .select(recordKeys.map(col): _*)
        // one committed version per micro-batch, not one per side
        graft.sources.UpsertWriter.applyChanges(
          spark, mirrorPath, ups, dels, recordKeys, precombine)
      }
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.sources.UpsertWriter.read(spark, mirrorPath)
  }

  /** Streaming RETRACTION-capable materialized-view maintenance
    * (SURVEY 22v — 22l's CDC apply composed with 101c's
    * refreshFromChanges): a change feed WITH updates and deletes
    * streams into a versioned mirror, and the registered rollup folds
    * every micro-batch's retractions exactly — sums/counts subtract,
    * extreme-touching groups get the file-skipping targeted recompute
    * against the just-committed snapshot, dead groups drop. After each
    * commit the view is re-keyed to the mirror's new live version dir
    * (and the old version's key removed, so time-travel reads of past
    * snapshots are never answered with the newer rollup). Covered
    * aggregates over the live snapshot answer from |groups| rows
    * throughout the stream's life.
    *
    * Exactly-once: the MIRROR is the replay-safe truth (checkpoint +
    * versioned commits); the view is derived state — an in-session
    * applied-batch guard skips same-session retries, and a rerun over
    * a drained checkpoint returns the already-registered view
    * untouched (the no-op the spec pins). A restarted session
    * re-defines the view from the live snapshot — the same answer by
    * construction.
    *
    * FEED CONTRACT: an update's pre+post images must arrive in the
    * SAME micro-batch (partition the feed files by key). A preimage
    * alone retracts a row the mirror still holds, so the view and the
    * mirror would disagree between the two commits and an extreme-
    * touching recompute would read the not-yet-updated row.
    */
  def runCdcApplyWithMv(
      spark: SparkSession,
      feedPath: String,
      mirrorPath: String,
      recordKeys: Seq[String],
      precombine: String,
      groupCols: Seq[String],
      aggCols: Seq[String],
      mvPath: String,
      queryName: String): graft.plans.MaterializedViews.MvDef = {
    import org.apache.spark.sql.functions.col
    val applied = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val dRef = new java.util.concurrent.atomic.AtomicReference[graft.plans.MaterializedViews.MvDef]()
    val schema = spark.read.parquet(feedPath).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(feedPath)
    val q = stream.writeStream
      .option("checkpointLocation", s"${mirrorPath}_mv_ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (applied.add(batchId)) {
          // the batch frame is consumed 3+ times (upsert leg, delete
          // leg, the MV fold's retract+recompute legs) — pinned once
          // so each consumer reads memory, not the feed parquet again
          val b = batch.toDF()
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val ups = b.filter(col("change_type").isin("insert", "update_postimage"))
              .drop("change_type")
            val dels = b.filter(col("change_type") === "delete")
              .select(recordKeys.map(col): _*)
            // the mirror commit FIRST: refreshFromChanges' contract is
            // that the base already reflects the feed
            graft.sources.UpsertWriter.applyChanges(
              spark, mirrorPath, ups, dels, recordKeys, precombine)
            val live = graft.sources.UpsertWriter.latestVersion(spark, mirrorPath).get
            dRef.get() match {
              case null =>
                dRef.set(graft.plans.MaterializedViews.define(
                  spark, live, groupCols, aggCols, mvPath))
              case d =>
                val folded = graft.plans.MaterializedViews.refreshFromChanges(
                  spark, d.copy(physicalPath = live), b)
                graft.plans.MaterializedViews.deregister(d.basePath) // old snapshot's key
                dRef.set(graft.plans.MaterializedViews.registerFor(folded, live))
            }
          } finally b.unpersist(): Unit
        }
        ()
      }
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    dRef.get() match {
      case null =>
        // drained checkpoint (a rerun): the view registered for the
        // live snapshot IS the answer — return it untouched
        val live = graft.sources.UpsertWriter.latestVersion(spark, mirrorPath)
          .getOrElse(throw new IllegalStateException(
            s"runCdcApplyWithMv: no micro-batch ran and no mirror exists at $mirrorPath"))
        graft.plans.MaterializedViews.registered(live).getOrElse(
          throw new IllegalStateException(
            s"runCdcApplyWithMv: no micro-batch ran and no view is registered for $live — " +
              "empty feed with no prior run?"))
      case d => d
    }
  }

  /** Run an aggregation over the whole existing log (AvailableNow),
    * landing the result in a memory sink — the catch-up read an
    * incremental consumer does on (re)start.
    */
  def runLogAggToBatch(
      spark: SparkSession,
      tablePath: String,
      agg: DataFrame => DataFrame,
      queryName: String): DataFrame = {
    val q = agg(logStream(spark, tablePath)).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
