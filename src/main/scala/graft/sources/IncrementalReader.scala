package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental ("INC") table reads with a checkpointed high-water
  * mark — the graft analog of the reference's
  * `HUDIIncrementalReader` (reference: template.py:167-281).
  *
  * Where the reference keys off `_hoodie_commit_time`, graft keys off
  * a monotone commit column in the data itself (event time or an
  * ingest timestamp). Semantics mirror the reference exactly:
  *
  *  - no checkpoint → read from just before the first commit (i.e.
  *    everything), then persist the max commit seen;
  *  - checkpoint present → read rows with commit > checkpoint; if any
  *    rows arrived, advance the checkpoint; an empty increment leaves
  *    the checkpoint untouched.
  *
  * Scale: the `commit > watermark` predicate is a plain Catalyst
  * filter, so it reaches the parquet scan as a pushed predicate (and
  * prunes whole partitions when the table is partitioned by a
  * commit-derived column). The only driver-side state is one MIN/MAX
  * aggregate per run — no `collect()` of data rows.
  */
class IncrementalReader(spark: SparkSession, store: CheckpointStore) {

  /** Rows of `path` with `commitColumn` strictly greater than `begin`. */
  def readSince(path: String, commitColumn: String, begin: String): DataFrame =
    readSince(spark.read.parquet(path), commitColumn, begin)

  /** Same, over an already-loaded (possibly normalized) DataFrame. */
  def readSince(df: DataFrame, commitColumn: String, begin: String): DataFrame =
    df.filter(col(commitColumn) > toCommit(df, commitColumn, begin))

  /** Pushdown-preserving variant for tables whose commit column is a
    * raw nanos-since-epoch long (the testdata `events.ts` shape): the
    * timestamp watermark is converted to epoch nanos and applied to
    * the RAW column — so it reaches the parquet scan as a pushed
    * predicate (`PushedFilters: GreaterThan(ts, …)`) and prunes row
    * groups — THEN the column is normalized to TIMESTAMP_NTZ. The
    * values are micro-aligned, so raw-nanos > watermark-nanos is
    * exactly the normalized-timestamp comparison. Falls back to the
    * generic post-normalization filter for non-long columns.
    */
  def readSinceNanos(raw: DataFrame, commitColumn: String, begin: String): DataFrame =
    if (raw.schema(commitColumn).dataType == org.apache.spark.sql.types.LongType)
      TableLoader.normalizeNanos(
        raw.filter(col(commitColumn) > lit(TableLoader.toEpochNanos(begin))), commitColumn)
    else readSince(raw, commitColumn, begin)

  /** One incremental pull WITHOUT advancing the checkpoint: returns
    * the increment plus the watermark it ends at (None when empty).
    *
    * The increment is bounded on BOTH sides — `begin < commit <= end`
    * — with `end` pinned to the MAX observed at pull time, so files
    * landing in the directory between the pull and a later action
    * cannot leak rows above the watermark the caller will commit.
    * Both bounds are plain Catalyst predicates pushed to the scan.
    */
  def pull(tableName: String, path: String, commitColumn: String): (DataFrame, Option[String]) = {
    val df = spark.read.parquet(path)
    val sinceCheckpoint = store.read(tableName) match {
      case Some(cp) => df.filter(col(commitColumn) > toCommit(df, commitColumn, cp.lastProcessedCommit))
      case None     => df // first run: from the beginning, like the reference's begin_commit-1
    }
    // Driver-side O(1): a single MAX over the increment decides the
    // next watermark; empty increment → no watermark to advance.
    val maxCommit = sinceCheckpoint.agg(max(col(commitColumn)).cast("string")).collect()(0)
    if (maxCommit.isNullAt(0)) (sinceCheckpoint, None)
    else {
      val end = maxCommit.getString(0)
      (sinceCheckpoint.filter(col(commitColumn) <= toCommit(df, commitColumn, end)), Some(end))
    }
  }

  /** Persist a processed watermark — the caller invokes this AFTER
    * materializing the increment, giving at-least-once delivery.
    */
  def commit(tableName: String, path: String, watermark: String): Unit =
    store.write(Checkpoint(tableName, watermark, path))

  /** Reference-fidelity one-shot read: pull and immediately advance
    * the checkpoint, exactly like `HUDIIncrementalReader.read`
    * (reference: template.py:197-217). NOTE this is at-most-once —
    * the checkpoint advances before the caller materializes the
    * increment, so a downstream failure skips it. Callers that need
    * at-least-once use `pull` + `commit`.
    */
  def read(tableName: String, path: String, commitColumn: String): DataFrame = {
    val (increment, watermark) = pull(tableName, path, commitColumn)
    watermark.foreach(commit(tableName, path, _))
    increment
  }

  // Compare in the column's own type so the pushed filter stays
  // type-correct (timestamp vs numeric vs string commits).
  private def toCommit(df: DataFrame, commitColumn: String, value: String): Column =
    lit(value).cast(df.schema(commitColumn).dataType)
}
