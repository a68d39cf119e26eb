package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deletion vectors — delete WITHOUT rewriting data files (the Delta
  * deletion-vector / Iceberg v2 position-delete shape): a delete
  * records only the POSITIONS of its victims as (file, row_index)
  * pairs; readers subtract them with an anti join on the scan's
  * `_metadata` columns. On a 100 TB table this turns "delete 0.1% of
  * rows" from a 100 TB rewrite (the copy-on-write price
  * [[UpsertWriter.delete]] pays) into writing kilobytes of positions
  * — the rewrite is deferred to compaction, which amortizes many
  * deletes into one pass.
  *
  * Positional identity is the point: two bit-identical rows are
  * different (file, row_index) pairs, so a DV can delete ONE specific
  * occurrence of duplicated content — predicate-based deletes cannot
  * express that. `_metadata.row_index` is stable for an immutable
  * parquet file, and files here are immutable by construction
  * (appends add files); the one operation that invalidates positions
  * is rewriting the files themselves, so [[applyDeletes]] clears the
  * vector it folds in.
  *
  * Scale shape: the read-side anti join broadcasts the vector when
  * its on-disk size says it fits (pure FS metadata, no count job) —
  * the common case, since vectors hold deletes-since-compaction, not
  * history. An over-threshold vector falls back to a shuffled anti
  * join keyed on (file, pos): still bounded by |deletes|, never by
  * table bytes, and AQE re-plans it per batch.
  *
  * Reference grounding: the reference's Hudi table deletes via
  * upsert-with-tombstones (generate_hudi_table.py:86-114 write path);
  * DVs are the modern lakehouse alternative this library adds.
  */
object DeletionVectors {

  private val dvSchema = StructType(Seq(
    StructField("_dv_file", StringType, nullable = false),
    StructField("_dv_pos", LongType, nullable = false)))

  /** Broadcast the vector below this many bytes on disk (64 MB —
    * comfortably a broadcast, metadata-decided).
    */
  val BroadcastMaxBytes: Long = 64L << 20

  private def dvBytes(spark: SparkSession, dvDir: String): Option[Long] = {
    val p = new Path(dvDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(fs.getContentSummary(p).getLength)
  }

  /** Record every row matching `predicate` as deleted — one scan that
    * writes positions only, no data file touched. Appends to the
    * vector; marking an already-marked row is a harmless duplicate.
    */
  def markDeleted(spark: SparkSession, tableDir: String, predicate: Column,
      dvDir: String): Unit = {
    spark.read.parquet(tableDir)
      .where(predicate)
      .select(
        col("_metadata.file_path").as("_dv_file"),
        col("_metadata.row_index").as("_dv_pos"))
      .write.mode(SaveMode.Append).parquet(dvDir)
  }

  /** Record explicit (file, row_index) positions as deleted — the
    * surgical path predicate deletes cannot express (one occurrence
    * of duplicated content, a reconciliation feed's row ids).
    * `positions` must carry `_dv_file` (string) and `_dv_pos` (long).
    */
  def markRows(spark: SparkSession, positions: DataFrame, dvDir: String): Unit = {
    positions
      .select(col("_dv_file").cast("string"), col("_dv_pos").cast("long"))
      .write.mode(SaveMode.Append).parquet(dvDir)
  }

  private def subtract(spark: SparkSession, base: DataFrame, dvDir: String): DataFrame =
    dvBytes(spark, dvDir) match {
      case None => base
      case Some(bytes) =>
        val dv0 = spark.read.schema(dvSchema).parquet(dvDir)
        val dv = if (bytes <= BroadcastMaxBytes) broadcast(dv0) else dv0
        base
          .withColumn("_dv_file", col("_metadata.file_path"))
          .withColumn("_dv_pos", col("_metadata.row_index"))
          .join(dv, Seq("_dv_file", "_dv_pos"), "left_anti")
          .select(base.columns.map(col): _*)
    }

  /** The visible table: base scan minus the vector, column order
    * exactly the base's. No vector (or an empty one) reads as the
    * plain table.
    */
  def read(spark: SparkSession, tableDir: String, dvDir: String): DataFrame =
    subtract(spark, spark.read.parquet(tableDir), dvDir)

  /** Zone-map-pruned visible read — the skipping index and the
    * deletion vector COMPOSE: candidate files come from the zone map
    * (file-level planning prune, exactly [[graft.operators.ZoneMaps
    * .prunedRead]]'s contract), the vector subtracts positions from
    * just those files (positions are per-file, so pruning files never
    * breaks delete visibility), and the exact range predicate
    * re-applies last. Row-identical to `read(...).filter(range)`;
    * cheaper by every file the layout lets the zone map rule out —
    * on a 100 TB range-clustered table the dominant cost term.
    */
  def readPruned(
      spark: SparkSession,
      tableDir: String,
      dvDir: String,
      zoneMap: DataFrame,
      statsCol: String,
      lo: Any,
      hi: Any): DataFrame = {
    val files = graft.operators.ZoneMaps.candidateFiles(zoneMap, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(tableDir).limit(0)
      else spark.read.parquet(files: _*)
    subtract(spark, base, dvDir)
      .filter(col(statsCol) >= lit(lo) && col(statsCol) <= lit(hi))
  }

  /** Compaction: fold the vector into a physical rewrite at `destDir`
    * and CLEAR it (rewritten files have new row indexes — stale
    * positions must not survive). The caller swaps dest into place
    * with its table machinery (the versioned-table commit path);
    * a crash before the clear leaves the vector intact and the swap
    * unpublished — re-running is safe.
    */
  def applyDeletes(spark: SparkSession, tableDir: String, dvDir: String,
      destDir: String): Unit = {
    read(spark, tableDir, dvDir)
      .write.mode(SaveMode.Overwrite).parquet(destDir)
    val p = new Path(dvDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}
