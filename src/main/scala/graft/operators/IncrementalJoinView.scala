package graft.operators

import graft.sources.UpsertWriter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an AGGREGATE-OVER-JOIN view — the
  * materialized-view step up from [[IncrementalAgg]]: keep
  * `agg(fact ⋈ dim)` current while BOTH sides change, without ever
  * rescanning fact history.
  *
  * The textbook delta rule Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB still
  * touches all of A when ΔB arrives — useless at 100 TB. The scale
  * answer (the arrangement/IVM design Materialize and Flink SQL use,
  * specialized to distributive aggregates) is to push the aggregate
  * THROUGH the join and materialize compact state on each side of the
  * join key instead of the view itself:
  *
  *  - fact side: per-join-key partials (count + exact decimal sum),
  *    folded incrementally — one shuffle of each increment, history
  *    never reread ([[IncrementalAgg]] is reused verbatim);
  *  - dim side: latest-wins keyed state via the versioned upsert
  *    writer — a dim patch rewrites only touched keys;
  *  - read: join the two states on the join key and re-group to the
  *    view's dimensions. Both inputs are O(|distinct keys|), not
  *    O(|history|): a dim change reweights every key it owns by
  *    construction, with no correction pass against old fact rows.
  *
  * Correctness: count/decimal-sum are associative and exact, so
  * state-join-regroup equals the full recompute bit-for-bit — which
  * is exactly what q_inc_join's oracle checks.
  */
object IncrementalJoinView {

  /** Fold one fact increment into per-join-key partial state. A
    * `batchId` makes the fold replay-safe (see
    * [[IncrementalAgg.refreshTable]]); returns true iff applied.
    */
  def refreshFact(
      spark: SparkSession,
      factStatePath: String,
      increment: DataFrame,
      joinKey: String,
      valueCol: String,
      batchId: Option[Long] = None): Boolean =
    IncrementalAgg.refreshTable(spark, factStatePath, increment, Seq(joinKey), valueCol, batchId)

  /** Apply one dim batch (insert or update, latest-wins on
    * `precombine`) to the dim-side state.
    */
  def refreshDim(
      spark: SparkSession,
      dimStatePath: String,
      dimBatch: DataFrame,
      key: String,
      precombine: String): Unit =
    UpsertWriter.upsert(dimBatch, dimStatePath, recordKeys = Seq(key), precombine = precombine)

  /** Current view snapshot: fact partials ⋈ dim state on the join
    * key, re-grouped by `groupCol` from the dim side. Emits
    * (groupCol, n_&lt;view&gt;, sum_dec) with the caller naming the
    * final columns.
    */
  def read(
      spark: SparkSession,
      factStatePath: String,
      dimStatePath: String,
      joinKey: String,
      dimKey: String,
      groupCol: String): DataFrame = {
    val partials = IncrementalAgg.read(spark, factStatePath, Seq(joinKey))
    val dim = UpsertWriter.read(spark, dimStatePath)
      .select(col(dimKey), col(groupCol))
    partials.join(dim, col(joinKey) === col(dimKey))
      .groupBy(col(groupCol))
      .agg(sum(col("n")).as("n"),
        sum(col("sum_dec")).cast("decimal(38,6)").as("sum_dec"))
  }
}
