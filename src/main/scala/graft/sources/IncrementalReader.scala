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

  /** One incremental pull: read new rows since the stored checkpoint
    * (or from the beginning on first run) and advance the checkpoint.
    */
  def read(tableName: String, path: String, commitColumn: String): DataFrame = {
    val df = spark.read.parquet(path)
    val increment = store.read(tableName) match {
      case Some(cp) => df.filter(col(commitColumn) > toCommit(df, commitColumn, cp.lastProcessedCommit))
      case None     => df // first run: from the beginning, like the reference's begin_commit-1
    }
    // Driver-side O(1): a single MAX over the increment decides the
    // next checkpoint; empty increment → checkpoint unchanged.
    val maxCommit = increment.agg(max(col(commitColumn)).cast("string")).collect()(0)
    if (!maxCommit.isNullAt(0)) {
      store.write(Checkpoint(tableName, maxCommit.getString(0), path))
    }
    increment
  }

  // Compare in the column's own type so the pushed filter stays
  // type-correct (timestamp vs numeric vs string commits).
  private def toCommit(df: DataFrame, commitColumn: String, value: String): Column =
    lit(value).cast(df.schema(commitColumn).dataType)
}
