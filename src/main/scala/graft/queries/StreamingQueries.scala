package graft

import graft.pipeline._
import graft.sources.{IncrementalReader, TableLoader, UpsertWriter}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming slice of the query catalog (micro-batch folds, watermarks, stateful processors) — one trait of the linear
  * [[Queries]] stack; see Queries.scala for the registry and the
  * catalog-wide numeric policy.
  */
trait StreamingQueries extends AnalyticsQueries {

  // ---------------------------------------------------------------
  // Streaming surface
  // ---------------------------------------------------------------

  /** #22 Streaming windowed aggregation (hourly, watermarked,
    * AvailableNow); batch-equivalent oracle via date_trunc.
    */
  val qStreamWindow: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.streaming.EventStream.runToBatch(
        s, s"$dir/events.parquet",
        queryName = "graft_stream_" + java.util.UUID.randomUUID().toString.replace("-", "")),
    oracle = Some(
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin))

  /** #22i Hopping-window streaming aggregation (1h windows every
    * 30min): each event fans out to two windows locally before the
    * aggregation exchange. Oracle explodes the two candidate window
    * starts per event in SQL.
    */
  val qStreamHopping: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.streaming.EventStream.runHoppingToBatch(
        s, s"$dir/events.parquet",
        queryName = "graft_stream_hop_" + java.util.UUID.randomUUID().toString.replace("-", "")),
    oracle = Some(
      """WITH fan AS (
        |  SELECT unnest([
        |           time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE,
        |           time_bucket(INTERVAL 30 MINUTE, ts)]) AS window_start,
        |         event_type, value
        |  FROM events
        |)
        |SELECT window_start, event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM fan GROUP BY 1, 2""".stripMargin))

  /** #22d Streaming dedup with watermark-bounded key state: the input
    * directory is staged DOUBLED (every file twice); the deduped
    * stream must equal a single copy.
    */
  val qStreamDedup: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.streaming.EventStream.runDedupToBatch(
        s, s"$dir/events.parquet",
        queryName = "graft_stream_dedup_" + java.util.UUID.randomUUID().toString.replace("-", "")),
    oracle = Some("SELECT * FROM events"))

  /** #22m Streaming late-data dead-letter: rows STRICTLY below the
    * watermark route to a DLQ instead of silent drop (a row exactly
    * at the threshold is on-time, matching Structured Streaming's
    * stateful-operator drop rule). Input staged as 6 ordered
    * micro-batches (batch k = event_id % 6), so the watermark
    * sequence — max event time through batch k−1 minus 1 hour — and
    * therefore the exact DLQ row set is plain SQL: a running max
    * over batch order.
    */
  val qStreamLateDlq: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.streaming.EventStream.lateDataDlq(
        s, s"$dir/events.parquet", nBatches = 6, delaySeconds = 3600L,
        queryName = "graft_stream_dlq_" + java.util.UUID.randomUUID().toString.replace("-", ""))
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"), col("props")),
    oracle = Some(
      """WITH b AS (
        |  SELECT *, event_id % 6 AS k FROM events
        |), mx AS (
        |  SELECT k, max(ts) AS m FROM b GROUP BY k
        |), wm AS (
        |  SELECT k,
        |    max(m) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      - INTERVAL 1 HOUR AS w
        |  FROM mx
        |)
        |SELECT event_id, ts, user_id, event_type, value, props
        |FROM b JOIN wm USING (k)
        |WHERE ts < w""".stripMargin))

  /** #22e Streaming upsert ingestion: the doubled events stream is
    * micro-batch-upserted (one file per trigger) into a versioned
    * table; the final snapshot read must equal the deduplicated
    * events — the full ingest→timeline→snapshot path under one oracle.
    */
  val qStreamUpsert: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("stream-upsert")
      val src = graft.streaming.EventStream.doubledDir(
        s, graft.streaming.EventStream.streamableDir(s, s"$dir/events.parquet"))
      graft.streaming.EventStream.streamUpsert(
        s, src, target, Seq("event_id"), "ts",
        queryName = "graft_stream_upsert_" + java.util.UUID.randomUUID().toString.replace("-", ""))
      UpsertWriter.read(s, target)
    },
    oracle = Some("SELECT * FROM events"))

  /** #22g Stream-stream interval join: the attribution query as two
    * live watermarked streams (see EventStream.attributionJoin);
    * oracle identical to q_range_join's — three very different
    * algorithms (binned equi-join, optimizer-rewritten inequality
    * join, stream-stream state join) must agree with DuckDB.
    */
  val qStreamAttribution: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.streaming.EventStream.runAttributionToBatch(
        s, s"$dir/events.parquet",
        queryName = "graft_stream_attr_" + java.util.UUID.randomUUID().toString.replace("-", "")),
    oracle = qRangeJoin.oracle)

  /** #22p Stream-stream LEFT OUTER interval join: every purchase
    * emits — with its click when one landed in [p_ts, p_ts+30min],
    * null-padded once the watermark proves no future click can match.
    * The emission rule is itself SQL, and it surfaces a watermark
    * subtlety the inner join never can: with TWO watermarked columns
    * the engine's global watermark is the MIN of the per-side
    * watermarks (least of the two ms-truncated maxima, minus the
    * delay) — an oracle built on the overall max emits one purchase
    * too many (verified empirically; the boundary comparison is
    * untestable at micros-grain data, `<` used to match the
    * engine's conservative eviction).
    */
  val qStreamLeftAttr: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.streaming.EventStream.runLeftAttributionToBatch(
        s, s"$dir/events.parquet",
        queryName = "graft_stream_lattr_" + java.util.UUID.randomUUID().toString.replace("-", "")),
    oracle = Some(
      """WITH c AS (
        |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
        |), m AS (
        |  SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
        |  FROM p JOIN c ON c.user_id = p.user_id
        |    AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 30 MINUTE
        |), wm AS (
        |  SELECT least((SELECT date_trunc('milliseconds', max(ts)) FROM c),
        |               (SELECT date_trunc('milliseconds', max(ts)) FROM p))
        |         - INTERVAL 1 HOUR AS w
        |), unmatched AS (
        |  SELECT p.user_id, p.event_id AS purchase_id, CAST(NULL AS BIGINT) AS click_id
        |  FROM p, wm
        |  WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id
        |    AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 30 MINUTE)
        |    AND p.ts + INTERVAL 30 MINUTE < w
        |)
        |SELECT * FROM m UNION ALL SELECT * FROM unmatched""".stripMargin))

  /** #22c Streaming sessionization, oracled: append mode emits
    * exactly the sessions whose end the FINAL watermark passed
    * (max event time, millisecond-truncated as the engine tracks it,
    * minus the 1-hour delay) — and that emission rule is itself SQL:
    * the batch lag/cumsum sessions filtered to
    * `session_end <= watermark`. Watermark SEMANTICS under oracle,
    * not just containment specs.
    */
  val qStreamSessions: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.streaming.EventStream.runSessionsToBatch(
        s, s"$dir/events.parquet",
        queryName = "graft_stream_sess_" + java.util.UUID.randomUUID().toString.replace("-", "")),
    oracle = Some(
      """WITH g AS (
        |  SELECT user_id, ts, event_id, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), s AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
        |                 THEN 1 ELSE 0 END AS new_sess
        |  FROM g
        |), n AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS sess_seq
        |  FROM s
        |), sess AS (
        |  SELECT user_id, min(ts) AS session_start,
        |         max(ts) + INTERVAL 30 MINUTE AS session_end,
        |         count(*) AS n_events,
        |         CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |  FROM n GROUP BY user_id, sess_seq
        |), wm AS (
        |  SELECT date_trunc('milliseconds', max(ts)) - INTERVAL 1 HOUR AS w FROM events
        |)
        |SELECT user_id, session_start, session_end, n_events, sum_value
        |FROM sess, wm WHERE session_end <= w""".stripMargin))

  /** #22s Timer-based streaming sessionization: the same gap
    * sessions on transformWithState EVENT-TIME TIMERS (ValueState
    * open session + ListState closed-pending + one timer per close;
    * `handleExpiredTimer` emits what the watermark confirmed) —
    * gated by the SAME oracle as #22c, proving the timer route and
    * the built-in session_window compute identical append-mode
    * emission over identical input.
    */
  val qStreamSessionsTimer: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.streaming.EventStream.runSessionsTimerToBatch(
        s, s"$dir/events.parquet",
        queryName = "graft_stream_sesst_" + java.util.UUID.randomUUID().toString.replace("-", "")),
    oracle = qStreamSessions.oracle)

  /** #22h Stream-static enrichment join: streaming events decorated
    * with customer + nation attributes per micro-batch (broadcast
    * static side, stateless append). Oracle is the plain batch join —
    * enrichment must be exactly batch-equivalent.
    */
  val qStreamEnrich: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.streaming.EventStream.runEnrichToBatch(
        s, s"$dir/events.parquet",
        customer = t(s, dir, "customer"), nation = t(s, dir, "nation"),
        queryName = "graft_stream_enrich_" + java.util.UUID.randomUUID().toString.replace("-", "")),
    oracle = Some(
      """SELECT e.event_id, e.user_id, e.event_type,
        |       c.c_name AS customer_name, n.n_name AS nation_name
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin))

  /** #5b Correlated scalar subquery through the SQL transform surface:
    * orders more than twice their customer's (decimal-exact) average.
    * Catalyst de-correlates this into an aggregate + join — the plan
    * spec asserts no cartesian shape survives.
    */
  val corrSubquerySql: String =
    """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
      |FROM orders o
      |WHERE o.o_totalprice > 2 * (
      |  SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(28,6))) AS DOUBLE) / count(*)
      |  FROM orders i WHERE i.o_custkey = o.o_custkey)""".stripMargin

  val qCorrSubquery: QueryDef = QueryDef(
    run = (s, dir) => new ReportPipeline(s, scratch("ckpt-corr")).transform(PipelineSpec(
      sources = Seq(SourceSpec("orders", s"$dir/orders.parquet")),
      transform = TransformSpec(corrSubquerySql))),
    oracle = Some(corrSubquerySql))

  /** #18b2 GROUPING SETS beyond rollup/cube: two INDEPENDENT subtotal
    * dimensions ((returnflag), (linestatus)) — not a rollup prefix
    * chain, one shuffle via Expand. Runs through the SQL transform
    * surface; grouping_id bit order matches DuckDB's GROUPING().
    */
  val qGroupingSets: QueryDef = QueryDef(
    run = (s, dir) => new ReportPipeline(s, scratch("ckpt-gsets")).transform(PipelineSpec(
      sources = Seq(SourceSpec("lineitem", s"$dir/lineitem.parquet")),
      transform = TransformSpec(
        """SELECT l_returnflag, l_linestatus,
          |  grouping_id(l_returnflag, l_linestatus) AS gid,
          |  count(*) AS n,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin))),
    oracle = Some(
      """SELECT l_returnflag, l_linestatus,
        |  GROUPING(l_returnflag, l_linestatus) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin))

  /** #22f Custom arbitrary state (flatMapGroupsWithState): every-10th-
    * event milestones per user; oracle is the row_number formulation.
    */
  val qStreamMilestones: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.streaming.EventStream.runMilestonesToBatch(
        s, s"$dir/events.parquet", every = 10,
        queryName = "graft_stream_ms_" + java.util.UUID.randomUUID().toString.replace("-", "")),
    oracle = Some(
      """SELECT user_id, CAST(rn // 10 AS BIGINT) AS milestone,
        |       CAST(rn AS BIGINT) AS n_events, ts
        |FROM (SELECT user_id, ts, event_id,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |      FROM events)
        |WHERE rn % 10 = 0""".stripMargin))

  /** #22n The same milestone operator on Spark 4's
    * `transformWithState` (StatefulProcessor + typed ValueState,
    * RocksDB state store) — gated by the SAME oracle as
    * q_stream_milestones, proving both state APIs agree.
    */
  val qStreamMilestonesV2: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.streaming.EventStream.runMilestonesV2ToBatch(
        s, s"$dir/events.parquet", every = 10,
        queryName = "graft_stream_msv2_" + java.util.UUID.randomUUID().toString.replace("-", "")),
    oracle = Some(
      """SELECT user_id, CAST(rn // 10 AS BIGINT) AS milestone,
        |       CAST(rn AS BIGINT) AS n_events, ts
        |FROM (SELECT user_id, ts, event_id,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |      FROM events)
        |WHERE rn % 10 = 0""".stripMargin))

  /** #22t Streaming ingestion with per-commit Bloom-index maintenance
    * ([[graft.streaming.EventStream.streamAppendBloomIndexed]]): the
    * event stream lands batch-by-batch into an append table while the
    * persisted file-level Bloom index is refreshed after EVERY commit
    * — each refresh scans only that commit's files (10s3's O(changes)
    * contract, driven from the streaming sink). The run asserts every
    * post-first refresh folded exactly the new files, then answers a
    * point lookup THROUGH the maintained index; the oracle is the
    * plain IN filter over the whole corpus.
    */
  val streamBloomProbeKeys = Seq(11L, 4242L, 9313L)
  val qStreamBloom: QueryDef = QueryDef(
    run = (s, dir) => {
      val root = scratch("stream-bloom")
      val table = root + "/t"
      val idx = root + "/idx"
      val src = graft.streaming.EventStream.streamableDir(s, s"$dir/events.parquet")
      val stats = graft.streaming.EventStream.streamAppendBloomIndexed(
        s, src, table, idx, "event_id",
        queryName = "graft_stream_bloom_" + java.util.UUID.randomUUID().toString.replace("-", ""))
      require(stats.nonEmpty, "q_stream_bloom: no micro-batch ran")
      require(stats.forall(_.removed == 0L),
        s"q_stream_bloom: append-only ingest must never drop indexed files, got $stats")
      require(stats.map(_.added).sum == stats.last.indexedFiles,
        s"q_stream_bloom: per-commit folds must add up to the final index, got $stats")
      val cols = t(s, dir, "events").columns
      graft.operators.BloomFileIndex.prunedRead(
        s, table, graft.operators.BloomFileIndex.load(s, idx),
        "event_id", streamBloomProbeKeys)
        .select(cols.map(col): _*)
    },
    oracle = Some(
      s"SELECT * FROM events WHERE event_id IN (${streamBloomProbeKeys.mkString(", ")})"))

  /** #22u Streaming materialized view
    * ([[graft.streaming.EventStream.streamMaintainMv]]): the doubled
    * event stream ingests batch-by-batch while the registered rollup
    * folds each micro-batch in O(batch + groups) — first batch
    * defines, later ones refreshIncremental — and the report then
    * runs against the BASE table, answered transparently from the
    * |groups|-row view by the Catalyst rewrite (plan-locked in-run).
    * The oracle doubles the per-group counts over the raw corpus
    * (the source is the doubled dir, so every event arrives exactly
    * twice); min/max are duplication-invariant.
    */
  val qStreamMv: QueryDef = QueryDef(
    run = (s, dir) => {
      val root = scratch("stream-mv")
      val table = root + "/t"
      val mvPath = root + "/mv"
      val outPath = root + "/out"
      val src = graft.streaming.EventStream.doubledDir(
        s, graft.streaming.EventStream.streamableDir(s, s"$dir/events.parquet"))
      graft.streaming.EventStream.streamMaintainMv(
        s, src, table, mvPath, Seq("user_id", "event_type"), Seq("value"),
        queryName = "graft_stream_mv_" + java.util.UUID.randomUUID().toString.replace("-", ""))
      try {
        val report = s.read.parquet(table)
          .groupBy("user_id", "event_type")
          .agg(
            count(lit(1)).as("n"),
            count(col("value")).as("nv"),
            min(col("value")).as("min_v"),
            max(col("value")).as("max_v"))
        val leaves = report.queryExecution.executedPlan.collectLeaves()
          .map(_.treeString).mkString("\n")
        require(leaves.contains(mvPath) && !leaves.contains(table),
          s"q_stream_mv: the rewrite did not fire — plan leaves:\n$leaves")
        report.write.mode("overwrite").parquet(outPath)
      } finally graft.plans.MaterializedViews.deregister(table)
      s.read.parquet(outPath)
    },
    oracle = Some(
      """SELECT user_id, event_type,
        |  CAST(2 * count(*) AS BIGINT) AS n,
        |  CAST(2 * count(value) AS BIGINT) AS nv,
        |  min(value) AS min_v,
        |  max(value) AS max_v
        |FROM events GROUP BY user_id, event_type""".stripMargin))

  /** #22v Streaming RETRACTION materialized view
    * ([[graft.streaming.TableStream.runCdcApplyWithMv]] — 22l's CDC
    * apply composed with 101c's retraction fold): a change feed with
    * DELETES (every 'view' event), UPDATES (purchase values doubled —
    * pre/post images, hitting stored extremes) and INSERTS (click
    * clones) streams file-by-file into a versioned mirror while the
    * registered rollup folds each micro-batch exactly: sums/counts
    * retract, extreme-touching groups recompute through the
    * file-skipping targeted scan, the 'view' groups DIE (cnt_rows 0).
    * The report then runs against the mirror's live snapshot and is
    * answered from the |groups|-row view (plan-locked in-run); the
    * oracle recomputes the post-transition state from first
    * principles. min/max/counts are duplication- and order-invariant,
    * so the hash match is exact however micro-batch boundaries slice
    * the feed.
    */
  val qStreamMvCdc: QueryDef = QueryDef(
    run = (s, dir) => {
      val root = scratch("stream-mv-cdc")
      val feedDir = root + "/feed"
      val mirror = root + "/mirror"
      val mvPath = root + "/mv"
      val outPath = root + "/out"
      // a quarter of the corpus: the retraction semantics are the
      // point here (q_stream_cdc already exercises full-volume apply)
      val v1 = t(s, dir, "events").filter(pmod(col("user_id"), lit(4)) === 0)
      val v2 = v1.filter(col("event_type") =!= "view")
        .withColumn("value",
          when(col("event_type") === "purchase", col("value") * 2).otherwise(col("value")))
        .unionByName(v1.filter(col("event_type") === "click")
          .withColumn("event_id", col("event_id") + 30000000L))
      // partitioned BY KEY so an update's pre+post images share a
      // micro-batch (the runCdcApplyWithMv contract)
      graft.operators.SnapshotDiff.changeFeed(v1, v2, Seq("event_id"))
        .repartition(4, col("event_id")).write.mode("overwrite").parquet(feedDir)
      UpsertWriter.upsert(v1, mirror, Seq("event_id"), "ts")
      val d = graft.streaming.TableStream.runCdcApplyWithMv(
        s, feedDir, mirror, Seq("event_id"), "ts",
        groupCols = Seq("user_id", "event_type"), aggCols = Seq("value"),
        mvPath = mvPath,
        queryName = "graft_stream_mv_cdc_" +
          java.util.UUID.randomUUID().toString.replace("-", ""))
      try {
        val report = UpsertWriter.read(s, mirror)
          .groupBy("user_id", "event_type")
          .agg(
            count(lit(1)).as("n"),
            count(col("value")).as("nv"),
            min(col("value")).as("min_v"),
            max(col("value")).as("max_v"))
        val leaves = report.queryExecution.executedPlan.collectLeaves()
          .map(_.treeString).mkString("\n")
        require(leaves.contains(mvPath) && !leaves.contains(mirror),
          s"q_stream_mv_cdc: the rewrite did not fire — plan leaves:\n$leaves")
        report.write.mode("overwrite").parquet(outPath)
      } finally graft.plans.MaterializedViews.deregister(d.basePath)
      s.read.parquet(outPath)
    },
    oracle = Some(
      """WITH post AS (
        |  SELECT user_id, event_type,
        |    CASE WHEN event_type = 'purchase' THEN value * 2 ELSE value END AS value
        |  FROM events WHERE event_type <> 'view' AND user_id % 4 = 0
        |  UNION ALL
        |  SELECT user_id, event_type, value FROM events
        |  WHERE event_type = 'click' AND user_id % 4 = 0
        |)
        |SELECT user_id, event_type,
        |  count(*) AS n,
        |  count(value) AS nv,
        |  min(value) AS min_v,
        |  max(value) AS max_v
        |FROM post GROUP BY user_id, event_type""".stripMargin))

  // ---------------------------------------------------------------
  // LLM-data-pipeline surface
}
