package graft.operators

import graft.sources.UpsertWriter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key rollup table
  * current under append-only increments WITHOUT rescanning history —
  * the materialized-view answer to "recompute the report from 100 TB
  * because one hour of events arrived".
  *
  * The maintained aggregates are count + decimal sum: both are
  * ASSOCIATIVE AND EXACT (decimal addition has no rounding order-
  * dependence), so `merge(state, partial(increment))` equals the full
  * recompute bit-for-bit — which is exactly what q_inc_agg's oracle
  * checks. Non-decomposable aggregates (exact distinct, medians)
  * deliberately don't fit this interface; at scale those maintain a
  * sketch (HLL — see q_approx_distinct) or recompute.
  *
  * Work per refresh: one shuffle of the INCREMENT (partial agg with
  * map-side combine), a key-join against state for touched keys, and
  * an upsert that rewrites only touched keys' rows into the versioned
  * state table. History is never read again; the reference's
  * incremental commit/checkpoint machinery (template.py:167-281)
  * bounds what "the increment" is.
  */
object IncrementalAgg {

  /** Commit-metadata key holding the applied-batch high-water mark. */
  private val BatchKey = "graft.appliedBatchId"

  /** Highest batch id folded into the state so far, if any. */
  def appliedBatchId(spark: SparkSession, statePath: String): Option[Long] =
    UpsertWriter.readMeta(spark, statePath).get(BatchKey).map(_.toLong)

  /** Replay guard shared by the refresh variants. The fold below is
    * ADDITIVE, so it is not naturally idempotent — and SURVEY §5's
    * pull/commit contract is at-least-once: a crash between the state
    * upsert and the consumer's watermark commit REDELIVERS the same
    * increment. The applied-batch high-water mark is therefore written
    * into the same atomic state commit as the fold itself
    * (UpsertWriter metadata rides before the commit marker — the Hudi
    * commit-metadata pattern the reference relies on,
    * template.py:226-281: checkpoint advances only after a successful
    * write, a commit is never re-applied). A refresh whose `batchId`
    * is at or below the mark is a no-op; batch ids must be monotonic
    * per state path (foreachBatch batch ids and table commit versions
    * both are).
    */
  private def alreadyApplied(spark: SparkSession, statePath: String, batchId: Option[Long]): Boolean =
    batchId.exists(id => appliedBatchId(spark, statePath).exists(id <= _))

  /** Metadata for the next commit: prior keys carried forward, the
    * high-water mark advanced when a batch id is supplied.
    */
  private def nextMeta(spark: SparkSession, statePath: String, batchId: Option[Long]): Map[String, String] = {
    val prior = UpsertWriter.readMeta(spark, statePath)
    batchId match {
      case Some(id) =>
        val hwm = prior.get(BatchKey).map(_.toLong).map(math.max(_, id)).getOrElse(id)
        prior + (BatchKey -> hwm.toString)
      case None => prior
    }
  }

  /** Per-key partial aggregate of one increment. */
  def partial(increment: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    increment.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(28,6)")).cast("decimal(38,6)").as("sum_dec"))

  /** Fold one increment into the versioned state table at
    * `statePath`: touched keys combine (state + partial), untouched
    * keys ride through the upsert untouched. With a `batchId`, a
    * replayed increment (id ≤ the stored high-water mark) is skipped
    * — state is byte-identical after a retry. Returns true iff the
    * increment was applied.
    */
  def refreshTable(
      spark: SparkSession,
      statePath: String,
      increment: DataFrame,
      keys: Seq[String],
      valueCol: String,
      batchId: Option[Long] = None): Boolean = {
    if (alreadyApplied(spark, statePath, batchId)) return false
    val p = partial(increment, keys, valueCol)
    val existing =
      if (UpsertWriter.versions(spark, statePath).nonEmpty)
        Some(UpsertWriter.read(spark, statePath)
          .select((keys.map(col) :+ col("n").as("_en") :+ col("sum_dec").as("_esum")): _*))
      else None
    val merged = existing match {
      case Some(e) =>
        // left join FROM the partial: only touched keys appear; the
        // combine is exact (long + long, decimal + decimal). Keys join
        // NULL-SAFELY (<=>) so a null grouping key combines with its
        // prior state exactly as UpsertWriter.merge groups it, instead
        // of silently dropping the prior count/sum.
        val pa = p.alias("_p"); val ea = e.alias("_e")
        val cond = keys.map(k => col(s"_p.$k") <=> col(s"_e.$k")).reduce(_ && _)
        pa.join(ea, cond, "left")
          .select((keys.map(k => col(s"_p.$k").as(k)) :+
            (col("_p.n") + coalesce(col("_en"), lit(0L))).as("n") :+
            (col("_p.sum_dec") + coalesce(col("_esum"), lit(BigDecimal(0)).cast("decimal(38,6)")))
              .cast("decimal(38,6)").as("sum_dec")): _*)
      case None => p
    }
    // absolute replacement per key: updates win ties at equal
    // precombine, so a constant precombine column is exactly "replace"
    UpsertWriter.upsert(merged.withColumn("_ver", lit(0L)),
      statePath, recordKeys = keys, precombine = "_ver",
      meta = nextMeta(spark, statePath, batchId))
    true
  }

  /** Current rollup snapshot (keys, n, sum_dec). */
  def read(spark: SparkSession, statePath: String, keys: Seq[String]): DataFrame =
    UpsertWriter.read(spark, statePath)
      .select((keys.map(col) :+ col("n") :+ col("sum_dec")): _*)

  /** Retraction-aware refresh: fold a CHANGE FEED (insert / delete /
    * update_preimage / update_postimage rows, [[SnapshotDiff.changeFeed]]
    * layout) into the rollup — the missing half of append-only
    * maintenance: the view stays exact under UPDATES AND DELETES
    * without rescanning history. Each pre-image/delete contributes
    * (−1, −value) and each post-image/insert (+1, +value); count and
    * decimal sum are ABELIAN-GROUP aggregates (every element has an
    * exact inverse), so state + Σsigned(changes) equals the full
    * recompute over the new snapshot bit-for-bit — which is what
    * q_inc_agg_cdc's oracle checks. Non-invertible aggregates (min,
    * max, top-k) deliberately don't fit this interface: a delete can
    * invalidate them unboundedly, and at scale those recompute over
    * touched keys instead.
    *
    * Keys whose count nets to zero stay in state as (n=0) rows —
    * tombstone-free, so a later increment for the key folds additively
    * — and [[readLive]] filters them out. Work per refresh: one
    * shuffle of the CHANGES (map-side combined), a touched-key join,
    * an upsert of touched keys. Same at-least-once replay guard as
    * [[refreshTable]].
    */
  def refreshFromChanges(
      spark: SparkSession,
      statePath: String,
      changes: DataFrame,
      keys: Seq[String],
      valueCol: String,
      changeTypeCol: String = "change_type",
      batchId: Option[Long] = None): Boolean = {
    if (alreadyApplied(spark, statePath, batchId)) return false
    // sign the images; an unknown change type fails loudly rather than
    // silently skewing the rollup
    val sign = when(col(changeTypeCol).isin("insert", "update_postimage"), lit(1L))
      .when(col(changeTypeCol).isin("delete", "update_preimage"), lit(-1L))
      .otherwise(raise_error(concat(
        lit("refreshFromChanges: unknown change type "), col(changeTypeCol))).cast("long"))
    val p = changes
      .withColumn("_s", sign)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_s")).as("n"),
        sum(col("_s").cast("decimal(28,6)") * col(valueCol).cast("decimal(28,6)"))
          .cast("decimal(38,6)").as("sum_dec"))
    val existing =
      if (UpsertWriter.versions(spark, statePath).nonEmpty)
        Some(UpsertWriter.read(spark, statePath)
          .select((keys.map(col) :+ col("n").as("_en") :+ col("sum_dec").as("_esum")): _*))
      else None
    val merged = existing match {
      case Some(e) =>
        val pa = p.alias("_p"); val ea = e.alias("_e")
        val cond = keys.map(k => col(s"_p.$k") <=> col(s"_e.$k")).reduce(_ && _)
        pa.join(ea, cond, "left")
          .select((keys.map(k => col(s"_p.$k").as(k)) :+
            (col("_p.n") + coalesce(col("_en"), lit(0L))).as("n") :+
            (col("_p.sum_dec") + coalesce(col("_esum"), lit(BigDecimal(0)).cast("decimal(38,6)")))
              .cast("decimal(38,6)").as("sum_dec")): _*)
      case None => p
    }
    UpsertWriter.upsert(merged.withColumn("_ver", lit(0L)),
      statePath, recordKeys = keys, precombine = "_ver",
      meta = nextMeta(spark, statePath, batchId))
    true
  }

  /** Rollup snapshot with zero-count tombstone rows filtered out —
    * the read for retraction-maintained views ([[refreshFromChanges]]).
    */
  def readLive(spark: SparkSession, statePath: String, keys: Seq[String]): DataFrame =
    read(spark, statePath, keys).filter(col("n") > 0L)

  /** Incremental TOP-K maintenance: the per-key leaderboard stays
    * current under appends with O(k) state per key — the bounded-heap
    * aggregate is ASSOCIATIVE (merging two heaps ≡ inserting both
    * streams; deterministic under ties, PropertySpec), so folding
    * each increment's per-key top-k into the stored top-k equals the
    * full-history recompute exactly. Refresh cost: one partial-agg
    * shuffle of the increment + an upsert of touched keys' O(k)
    * arrays; history never rereads — the leaderboard analog of the
    * count/sum rollup above.
    */
  def refreshTopK(
      spark: SparkSession,
      statePath: String,
      increment: DataFrame,
      keys: Seq[String],
      scoreCol: String,
      idCol: String,
      k: Int,
      batchId: Option[Long] = None): Boolean = {
    require(k > 0, "k must be positive")
    if (alreadyApplied(spark, statePath, batchId)) return false
    val batchTop = increment.groupBy(keys.map(col): _*)
      .agg(graft.functions.TopKFunctions.top_k(col(scoreCol), col(idCol), k).as("hits"))
    val merged =
      if (UpsertWriter.versions(spark, statePath).nonEmpty) {
        val state = UpsertWriter.read(spark, statePath)
          .select((keys.map(col) :+ col("hits")): _*)
        // heap-merge by re-aggregating the exploded union: associative,
        // so (state ⊕ batch) == top-k of everything ever seen
        state.unionByName(batchTop)
          .select((keys.map(col) :+ explode(col("hits")).as("h")): _*)
          .groupBy(keys.map(col): _*)
          .agg(graft.functions.TopKFunctions.top_k(col("h.score"), col("h.id"), k).as("hits"))
      } else batchTop
    UpsertWriter.upsert(merged.withColumn("_ver", lit(0L)),
      statePath, recordKeys = keys, precombine = "_ver",
      meta = nextMeta(spark, statePath, batchId))
    true
  }

  /** Current leaderboard snapshot: (keys, rank, id, score). */
  def readTopK(spark: SparkSession, statePath: String, keys: Seq[String]): DataFrame =
    UpsertWriter.read(spark, statePath)
      .select((keys.map(col) :+ posexplode(col("hits")).as(Seq("pos", "hit"))): _*)
      .select((keys.map(col) :+ col("hit.id").as("id") :+
        col("hit.score").as("score") :+ (col("pos") + 1).cast("int").as("rk")): _*)

  /** Incremental DISTINCT-COUNT sketch maintenance: a per-key
    * KMV/theta sketch (bottom-k xxhash64 values — O(k) state) stays
    * current under appends, the sketch answer to the one aggregate
    * the count/sum rollup above deliberately excludes. The sketch is
    * a pure function of the input SET and merging is re-insertion
    * (associative, commutative, idempotent per value), so folding
    * each increment's per-key sketch into the stored one equals the
    * full-history sketch EXACTLY — q_kmv_inc's oracle re-derives the
    * whole-corpus estimate from first principles and hash-matches.
    * Same replay guard as the rollup: the applied-batch high-water
    * mark rides the atomic state commit.
    */
  def refreshKmv(
      spark: SparkSession,
      statePath: String,
      increment: DataFrame,
      keys: Seq[String],
      valueCol: String,
      k: Int = 64,
      batchId: Option[Long] = None): Boolean = {
    if (alreadyApplied(spark, statePath, batchId)) return false
    import graft.functions.KmvFunctions.kmv_sketch
    val batchSketch = increment.groupBy(keys.map(col): _*)
      .agg(kmv_sketch(xxhash64(col(valueCol)), k).as("hs"))
    val merged =
      if (UpsertWriter.versions(spark, statePath).nonEmpty) {
        val state = UpsertWriter.read(spark, statePath)
          .select((keys.map(col) :+ col("hs")): _*)
        // the union re-aggregates ALREADY-HASHED values: explode the
        // two sketches and rebuild — never rehash
        state.unionByName(batchSketch)
          .select((keys.map(col) :+ explode(col("hs")).as("h")): _*)
          .groupBy(keys.map(col): _*)
          .agg(kmv_sketch(col("h"), k).as("hs"))
      } else batchSketch
    UpsertWriter.upsert(merged.withColumn("_ver", lit(0L)),
      statePath, recordKeys = keys, precombine = "_ver",
      meta = nextMeta(spark, statePath, batchId))
    true
  }

  /** Current distinct-count estimates: (keys, approx_distinct). */
  def readKmvEstimate(spark: SparkSession, statePath: String, keys: Seq[String], k: Int = 64): DataFrame =
    UpsertWriter.read(spark, statePath)
      .select((keys.map(col) :+
        graft.functions.KmvFunctions.kmv_estimate_from(col("hs"), k).as("approx_distinct")): _*)

  /** Incremental frequent-items (Misra-Gries) maintenance: each
    * increment's MG summary folds into a persisted constant-size
    * summary under the mergeable-summaries rule (sum counters; if
    * over capacity, subtract the (capacity+1)-th largest and drop
    * non-positives — Agarwal et al., TODS'13), so the state's
    * undercount stays ≤ n_total/(capacity+1) over the stream's whole
    * life. The state is ONE row holding ≤ `capacity`
    * (value, est) entries — O(1) however much history has folded in —
    * and the trim runs over ≤ 2·capacity rows by construction, so
    * the one ordered window is bounded, never data-sized.
    *
    * Same replay contract as the other refreshes: the applied-batch
    * high-water mark rides the atomic state commit; a redelivered
    * batch id is a recognized no-op (the fold is additive, NOT
    * idempotent — the guard is the exactly-once half).
    */
  def refreshFreq(
      spark: SparkSession,
      statePath: String,
      increment: DataFrame,
      valueCol: String,
      capacity: Int = 4096,
      batchId: Option[Long] = None): Boolean = {
    if (alreadyApplied(spark, statePath, batchId)) return false
    import graft.functions.FreqSketchFunctions.freq_sketch
    val batchPairs = increment.filter(col(valueCol).isNotNull)
      .agg(freq_sketch(col(valueCol).cast("string"), capacity).as("mg"))
      .select(explode(col("mg")).as("h"))
      .select(col("h.value").as("value"), col("h.est").as("est"))
    val merged =
      if (UpsertWriter.versions(spark, statePath).nonEmpty) {
        val statePairs = UpsertWriter.read(spark, statePath)
          .select(explode(col("mg")).as("h"))
          .select(col("h.value").as("value"), col("h.est").as("est"))
        val summed = statePairs.unionByName(batchPairs)
          .groupBy(col("value")).agg(sum(col("est")).as("est"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("est").desc, col("value"))
        val ranked = summed.withColumn("_rn", row_number().over(w))
        val cut = ranked.agg(
          max(when(col("_rn") === capacity + 1, col("est"))).as("_cut"))
        ranked.crossJoin(broadcast(cut))
          .withColumn("est", col("est") - coalesce(col("_cut"), lit(0L)))
          .filter(col("est") > 0)
          .select(col("value"), col("est"))
      } else batchPairs
    val packed = merged
      .agg(array_sort(collect_list(struct(col("value"), col("est")))).as("mg"))
      .withColumn("_k", lit(0L)).withColumn("_ver", lit(0L))
    UpsertWriter.upsert(packed, statePath, recordKeys = Seq("_k"), precombine = "_ver",
      meta = nextMeta(spark, statePath, batchId))
    true
  }

  /** Current frequent-item CANDIDATES (value, est): a superset of
    * every value whose true frequency exceeds n_total/(capacity+1);
    * estimates undercount by at most that bound. Verify with
    * [[HeavyHitters.verified]] for exact answers.
    */
  def readFreqCandidates(spark: SparkSession, statePath: String): DataFrame =
    UpsertWriter.read(spark, statePath)
      .select(explode(col("mg")).as("h"))
      .select(col("h.value").as("value"), col("h.est").as("est"))
}
