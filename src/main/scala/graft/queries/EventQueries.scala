package graft

import graft.pipeline._
import graft.sources.{IncrementalReader, TableLoader, UpsertWriter}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-analytics slice of the query catalog (funnel, cohort, attribution, forecasting) — one trait of the linear
  * [[Queries]] stack; see Queries.scala for the registry and the
  * catalog-wide numeric policy.
  */
trait EventQueries extends LlmRetrievalQueries {

  // ---------------------------------------------------------------
  // Event analytics (funnel / cohort / streaks / coverage / resample)
  // ---------------------------------------------------------------

  /** #51 Ordered conversion funnel view→click→purchase: stage k
    * counts users whose earliest stage-k event at-or-after their
    * stage-(k-1) time exists. One user-keyed agg per stage over the
    * type-filtered input (the filter prunes at the scan).
    */
  val qFunnel: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.EventAnalytics.funnelCounts(
      t(s, dir, "events"), Seq("view", "click", "purchase")),
    oracle = Some(
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY e.user_id
        |)
        |SELECT count(s1.t1) AS n_step1, count(s2.t2) AS n_step2,
        |       count(s3.t3) AS n_step3
        |FROM s1
        |LEFT JOIN s2 ON s1.user_id = s2.user_id
        |LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin))

  /** #52 Cohort retention: cohort = month of first order; cell
    * (cohort_month, month_offset) counts distinct customers active.
    * Month offset is explicit 12*Δyear+Δmonth integer arithmetic so
    * Spark and DuckDB agree by construction.
    */
  val qCohort: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.EventAnalytics.cohortRetention(
      t(s, dir, "orders"), "o_custkey", "o_orderdate"),
    oracle = Some(
      """WITH f AS (
        |  SELECT o_custkey, min(o_orderdate) AS first_ts FROM orders GROUP BY o_custkey
        |)
        |SELECT CAST(date_trunc('month', f.first_ts) AS DATE) AS cohort_month,
        |       CAST((year(o.o_orderdate) - year(f.first_ts)) * 12 +
        |            (month(o.o_orderdate) - month(f.first_ts)) AS INT) AS month_offset,
        |       count(DISTINCT o.o_custkey) AS n_active
        |FROM orders o JOIN f ON o.o_custkey = f.o_custkey
        |GROUP BY 1, 2""".stripMargin))

  /** #53 Gaps-and-islands order streaks: consecutive orders of one
    * customer at most 90 days apart form a streak; per-customer
    * streak count and longest streak. Entity-partitioned windows
    * only — no global sort.
    */
  val qStreaks: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.EventAnalytics.streaks(
      t(s, dir, "orders"), "o_custkey", "o_orderdate", maxGapDays = 90),
    oracle = Some(
      """WITH flagged AS (
        |  SELECT o_custkey, o_orderdate,
        |    CASE WHEN lag(CAST(o_orderdate AS DATE)) OVER w IS NULL
        |           OR date_diff('day', lag(CAST(o_orderdate AS DATE)) OVER w,
        |                        CAST(o_orderdate AS DATE)) > 90
        |         THEN 1 ELSE 0 END AS new_streak
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
        |), ids AS (
        |  SELECT o_custkey,
        |    sum(new_streak) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS streak_id
        |  FROM flagged
        |), per_streak AS (
        |  SELECT o_custkey, streak_id, count(*) AS streak_len
        |  FROM ids GROUP BY o_custkey, streak_id
        |)
        |SELECT o_custkey, count(*) AS n_streaks,
        |       max(streak_len) AS longest_streak
        |FROM per_streak GROUP BY o_custkey""".stripMargin))

  /** #54 Merged-interval coverage: each event spans
    * [ts, ts + floor(value) seconds]; overlapping spans per user
    * merge; output per-user covered seconds + merged-interval count.
    * All arithmetic in epoch-micros BIGINT — bit-exact cross-engine.
    */
  val qIntervalMerge: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.EventAnalytics.intervalCoverage(
      t(s, dir, "events"), "user_id", "ts", col("value")),
    oracle = Some(
      """WITH iv AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS start_us,
        |         epoch_us(CAST(ts AS TIMESTAMP)) + CAST(floor(value) AS BIGINT) * 1000000 AS end_us
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, start_us, end_us,
        |    CASE WHEN max(end_us) OVER (PARTITION BY user_id ORDER BY start_us, end_us
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |           OR start_us > max(end_us) OVER (PARTITION BY user_id
        |              ORDER BY start_us, end_us
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |         THEN 1 ELSE 0 END AS new_island
        |  FROM iv
        |), ids AS (
        |  SELECT user_id, start_us, end_us,
        |    sum(new_island) OVER (PARTITION BY user_id ORDER BY start_us, end_us) AS island_id
        |  FROM flagged
        |), islands AS (
        |  SELECT user_id, island_id, min(start_us) AS s, max(end_us) AS e
        |  FROM ids GROUP BY user_id, island_id
        |)
        |SELECT user_id,
        |       CAST(sum(e - s) // 1000000 AS BIGINT) AS covered_seconds,
        |       count(*) AS n_intervals
        |FROM islands GROUP BY user_id""".stripMargin))

  /** #55 Daily resample / gap-fill: per user one row per calendar day
    * from first to last event day; empty days carry n_events = 0 and
    * forward-filled last_active_day. Spine generated per entity
    * (sequence+explode), joined on (entity, day) — entity-distributed.
    */
  val qResample: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.EventAnalytics.resampleDaily(
      t(s, dir, "events"), "user_id", "ts"),
    oracle = Some(
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), bounds AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        |  FROM events GROUP BY user_id
        |), spine AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
        |         INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds
        |)
        |SELECT s.user_id, s.day,
        |       COALESCE(d.n, 0) AS n_events,
        |       last_value(CASE WHEN d.n IS NOT NULL THEN s.day END IGNORE NULLS)
        |         OVER (PARTITION BY s.user_id ORDER BY s.day
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_active_day
        |FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day""".stripMargin))

  /** #56 Bloom-pruned fact⋈dim join: a Bloom filter over the urgent
    * orders' keys drops lineitem rows before the join shuffle; the
    * exact join after it makes the result identical to the plain
    * join (false negatives impossible). Oracle IS the plain join.
    */
  val qBloomJoin: QueryDef = QueryDef(
    run = (s, dir) => {
      val li = t(s, dir, "lineitem")
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      graft.operators.BloomPrune.prunedJoin(
        li, Seq("l_orderkey"), urgent, Seq("o_orderkey"), expectedKeys = 1L << 16)
        .groupBy(col("l_returnflag"))
        .agg(
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(28,6)")).cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    },
    oracle = Some(
      """SELECT l_returnflag,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag""".stripMargin))

  /** #57 Trigram-index substring search: postings intersection over
    * the needle's character trigrams picks candidates; exact
    * `contains` verifies. Result ≡ the full-scan LIKE — which is
    * exactly what the oracle runs.
    */
  val qTrigramSearch: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.TrigramIndex.search(
      t(s, dir, "documents"), "merge batch").select(col("doc_id")),
    oracle = Some("SELECT doc_id FROM documents WHERE contains(text, 'merge batch')"))

  /** #58 Gopher quality rules: integer-arithmetic word-count /
    * mean-word-length / alpha-fraction / stopword gates per doc.
    */
  val qGopherRules: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.TextAnalysis.gopherRules(t(s, dir, "documents"))
      .select(col("doc_id"), col("n_words"), col("word_chars"),
        col("rule_word_count"), col("rule_mean_word_len"),
        col("rule_alpha_words"), col("rule_stopwords"), col("gopher_pass")),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), m AS (
        |  SELECT doc_id, len(w) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS alpha_words,
        |    len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS stop_hits
        |  FROM t
        |)
        |SELECT doc_id, n_words, word_chars,
        |  n_words >= 50 AND n_words <= 100000 AS rule_word_count,
        |  word_chars >= 3 * n_words AND word_chars <= 10 * n_words AS rule_mean_word_len,
        |  alpha_words * 10 >= n_words * 8 AS rule_alpha_words,
        |  stop_hits >= 2 AS rule_stopwords,
        |  (n_words >= 50 AND n_words <= 100000)
        |    AND (word_chars >= 3 * n_words AND word_chars <= 10 * n_words)
        |    AND (alpha_words * 10 >= n_words * 8)
        |    AND (stop_hits >= 2) AS gopher_pass
        |FROM m""".stripMargin))

  /** #18i ROWS-framed trailing window: per-customer trailing-7-order
    * spend. A ROWS frame is order-SENSITIVE, so the window orders by
    * (o_orderdate, o_orderkey) — a total order both engines agree
    * on. Integer cents keep the running sum exact.
    */
  val qWindowRows: QueryDef = QueryDef(
    run = (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-6, 0)
      t(s, dir, "orders")
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .select(col("o_custkey"), col("o_orderkey"), col("cents"),
          sum(col("cents")).over(w).as("trail7_cents"),
          count(lit(1)).over(w).as("n_in_frame"))
    },
    oracle = Some(
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS trail7_cents,
        |  CAST(count(*) OVER w AS BIGINT) AS n_in_frame
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin))

  /** #18j Period-over-period change: monthly revenue (exact integer
    * cents) with previous-month value and delta via a global-ordered
    * lag — safe, because the window runs over the 12-row monthly
    * aggregate, never the raw fact table.
    */
  val qMomChange: QueryDef = QueryDef(
    run = (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("month"))
      t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_cents"))
        .select(col("month"), col("rev_cents"),
          lag(col("rev_cents"), 1).over(w).as("prev_cents"),
          (col("rev_cents") - lag(col("rev_cents"), 1).over(w)).as("delta_cents"))
    },
    oracle = Some(
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM orders GROUP BY 1
        |)
        |SELECT month, rev_cents,
        |  lag(rev_cents) OVER (ORDER BY month) AS prev_cents,
        |  rev_cents - lag(rev_cents) OVER (ORDER BY month) AS delta_cents
        |FROM m""".stripMargin))

  /** #59 Markov next-event transitions: successor pairs per user
    * (total-ordered by ts, event_id), counted per (from, to), with
    * the transition probability as exact integer basis points.
    */
  val qTransitions: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.EventAnalytics.transitions(
      t(s, dir, "events"), "user_id", "ts", "event_type", "event_id"),
    oracle = Some(
      """WITH nxt AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events
        |), pairs AS (
        |  SELECT from_type, to_type, count(*) AS n_transitions
        |  FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n_transitions,
        |  CAST(n_transitions * 10000 // sum(n_transitions) OVER (PARTITION BY from_type)
        |       AS BIGINT) AS share_bp
        |FROM pairs""".stripMargin))

  /** #60 Session path mining: 30-minute gap sessions rendered as
    * `>`-joined event-type paths, counted per path (min 3 sessions).
    */
  val qSessionPaths: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.EventAnalytics.sessionPaths(
      t(s, dir, "events"), "user_id", "ts", "event_type", "event_id",
      gapMinutes = 30, minCount = 3L),
    oracle = Some(
      """WITH g AS (
        |  SELECT user_id, ts, event_id, event_type,
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
        |), p AS (
        |  SELECT user_id, sess_seq,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM n GROUP BY user_id, sess_seq
        |)
        |SELECT path, count(*) AS n_sessions
        |FROM p GROUP BY path HAVING count(*) >= 3""".stripMargin))

  /** #14j Exact z-score outliers: |x-mean| > 3σ cross-multiplied into
    * pure integer arithmetic ((n·x-s)² > 9·(n·ss-s²)) — no division,
    * no floats, bit-identical flags on any engine. The oracle's
    * HUGEINT intermediates mirror the decimal(38,0) Spark side.
    */
  val qZscoreOutliers: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Profiler.zscoreOutliers(
        t(s, dir, "events").withColumn("cents", round(col("value") * 100).cast("long")),
        "event_type", "cents", k = 3)
      .select(col("event_id"), col("event_type"), col("cents")),
    oracle = Some(
      """WITH c AS (
        |  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), st AS (
        |  SELECT event_type,
        |    CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS s,
        |    CAST(sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS HUGEINT) AS ss
        |  FROM c GROUP BY event_type
        |)
        |SELECT c.event_id, c.event_type, c.cents
        |FROM c JOIN st USING (event_type)
        |WHERE (n * c.cents - s) * (n * c.cents - s) > 9 * (n * ss - s * s)""".stripMargin))

  /** #10h Merge-on-read table: base snapshot + two delta-log commits
    * (appendLog writes ONLY the batch — no table rewrite), read-time
    * merge resolves latest-wins across base and logs. The purchases
    * are updated twice (log1 then log2) — the second delta must win.
    */
  val qMorRead: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("mor-read")
      val base = t(s, dir, "events")
      graft.sources.MorTable.writeBase(base, target)
      graft.sources.MorTable.appendLog(
        base.filter(col("event_type") === "purchase")
          .withColumn("value", col("value") * 2)
          .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR")), target)
      graft.sources.MorTable.appendLog(
        base.filter(col("event_type") === "purchase")
          .withColumn("value", col("value") * 3)
          .withColumn("ts", col("ts") + expr("INTERVAL 2 HOUR"))
          .unionByName(
            base.filter(col("event_type") === "click")
              .withColumn("event_id", col("event_id") + 20000000L)), target)
      graft.sources.MorTable.read(s, target, Seq("event_id"), "ts")
    },
    oracle = Some(
      """WITH log1 AS (
        |  SELECT event_id, ts + INTERVAL 1 HOUR AS ts, user_id, event_type,
        |         value * 2 AS value, props
        |  FROM events WHERE event_type = 'purchase'
        |), log2 AS (
        |  SELECT event_id, ts + INTERVAL 2 HOUR AS ts, user_id, event_type,
        |         value * 3 AS value, props
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT event_id + 20000000, ts, user_id, event_type, value, props
        |  FROM events WHERE event_type = 'click'
        |), unioned AS (
        |  SELECT * FROM events UNION ALL SELECT * FROM log1 UNION ALL SELECT * FROM log2
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts DESC) AS rn
        |  FROM unioned
        |)
        |SELECT event_id, ts, user_id, event_type, value, props
        |FROM ranked WHERE rn = 1""".stripMargin))

  /** #10q Read-optimized MOR view (Hudi `_ro`): after compacting the
    * first two logs into the base, a third uncompacted log lands —
    * the RO view serves the COMPACTED state only (zero merge cost,
    * bounded staleness) while the real-time view would include log 3.
    * The oracle recomputes the compacted state: base ∪ log1 ∪ log2,
    * latest-wins, log 3 absent.
    */
  val qMorRo: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("mor-ro")
      val base = t(s, dir, "events")
      graft.sources.MorTable.writeBase(base, target)
      graft.sources.MorTable.appendLog(
        base.filter(col("event_type") === "purchase")
          .withColumn("value", col("value") * 2)
          .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR")), target)
      graft.sources.MorTable.appendLog(
        base.filter(col("event_type") === "view")
          .withColumn("value", col("value") + 5)
          .withColumn("ts", col("ts") + expr("INTERVAL 2 HOUR")), target)
      graft.sources.MorTable.compact(s, target, Seq("event_id"), "ts")
      graft.sources.MorTable.appendLog(
        base.filter(col("event_type") === "click")
          .withColumn("value", col("value") * 9)
          .withColumn("ts", col("ts") + expr("INTERVAL 3 HOUR")), target)
      graft.sources.MorTable.readOptimized(s, target)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"), col("props"))
    },
    oracle = Some(
      """WITH log1 AS (
        |  SELECT event_id, ts + INTERVAL 1 HOUR AS ts, user_id, event_type,
        |         value * 2 AS value, props
        |  FROM events WHERE event_type = 'purchase'
        |), log2 AS (
        |  SELECT event_id, ts + INTERVAL 2 HOUR AS ts, user_id, event_type,
        |         value + 5 AS value, props
        |  FROM events WHERE event_type = 'view'
        |), unioned AS (
        |  SELECT * FROM events UNION ALL SELECT * FROM log1 UNION ALL SELECT * FROM log2
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts DESC) AS rn
        |  FROM unioned
        |)
        |SELECT event_id, ts, user_id, event_type, value, props
        |FROM ranked WHERE rn = 1""".stripMargin))

  /** #10i Change data feed with both images: updates emit
    * update_preimage + update_postimage rows (Delta CDF semantics),
    * inserts/deletes one row each — a consumer can retract-then-apply
    * without touching either snapshot. new = events with purchases
    * updated, errors deleted, clicks re-keyed as inserts.
    */
  val qCdcFeed: QueryDef = QueryDef(
    run = (s, dir) => {
      val base = t(s, dir, "events")
      val next = base
        .filter(col("event_type") =!= "error" && col("event_type") =!= "purchase")
        .unionByName(base.filter(col("event_type") === "purchase")
          .withColumn("value", col("value") * 2)
          .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR")))
        .unionByName(base.filter(col("event_type") === "click")
          .withColumn("event_id", col("event_id") + 20000000L))
      graft.operators.SnapshotDiff.changeFeed(base, next, keys = Seq("event_id"))
    },
    oracle = Some(
      """SELECT event_id + 20000000 AS event_id, 'insert' AS change_type,
        |       ts, user_id, event_type, value, props
        |FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, 'delete', ts, user_id, event_type, value, props
        |FROM events WHERE event_type = 'error'
        |UNION ALL
        |SELECT event_id, 'update_preimage', ts, user_id, event_type, value, props
        |FROM events WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT event_id, 'update_postimage', ts + INTERVAL 1 HOUR, user_id,
        |       event_type, value * 2, props
        |FROM events WHERE event_type = 'purchase'""".stripMargin))

  /** #10j Record-index point lookup: the table is hash-bucketed by
    * record key into partition directories; a lookup reads ONLY the
    * probed keys' buckets (Catalyst partition pruning — see the
    * PlanSpec lock), row-identical to `WHERE key IN (...)`.
    */
  val lookupKeys = Seq(1L, 42L, 424L, 4242L)
  val qPointLookup: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("record-index")
      graft.sources.RecordIndex.write(t(s, dir, "orders"), target, "o_orderkey", nBuckets = 64)
      graft.sources.RecordIndex.lookup(s, target, "o_orderkey", "bigint", lookupKeys, nBuckets = 64)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
    },
    oracle = Some(
      s"""SELECT * FROM orders
         |WHERE o_orderkey IN (${lookupKeys.mkString(", ")})""".stripMargin))

  /** #10k Zone-map data skipping: a range-layout write (disjoint
    * per-file ranges), a one-scan min/max stats table, and a range
    * read that plans over only the overlapping files — row-identical
    * to the full-scan filter, which is exactly what the oracle runs.
    */
  val qZonemapScan: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("zonemap-scan")
      t(s, dir, "orders")
        .repartitionByRange(16, col("o_totalprice"))
        .write.mode("overwrite").parquet(target)
      val zm = graft.operators.ZoneMaps.build(s, target, "o_totalprice")
      graft.operators.ZoneMaps.prunedRead(s, target, zm, "o_totalprice", 10000.0, 20000.0)
    },
    oracle = Some(
      "SELECT * FROM orders WHERE o_totalprice BETWEEN 10000.0 AND 20000.0"))

  /** #10k2 Zone-map pruning, fully distributed: the stats table never
    * touches the driver — candidate files broadcast into a left-semi
    * join against input_file_name() ([[graft.operators.ZoneMaps.prunedReadSemiJoin]]).
    * The unbounded-file-count companion to #10k (which plans file
    * opens away but collects the candidate list); same oracle, same
    * rows.
    */
  val qZonemapSemi: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("zonemap-semi")
      t(s, dir, "orders")
        .repartitionByRange(16, col("o_totalprice"))
        .write.mode("overwrite").parquet(target)
      val zm = graft.operators.ZoneMaps.build(s, target, "o_totalprice")
      graft.operators.ZoneMaps.prunedReadSemiJoin(s, target, zm, "o_totalprice", 10000.0, 20000.0)
    },
    oracle = Some(
      "SELECT * FROM orders WHERE o_totalprice BETWEEN 10000.0 AND 20000.0"))

  /** #10s File-level Bloom index ([[graft.operators.BloomFileIndex]]):
    * point-predicate data skipping on a column the layout does NOT
    * cluster — orders are hash-distributed by order key, so every
    * file spans the full customer domain and zone maps prune nothing;
    * the per-file k=1 Bloom (xxhash64 buckets) still rules files out.
    * False positives only ⇒ the pruned read is row-identical to the
    * full scan, which is exactly what the oracle runs; the spec locks
    * that candidates < total files on this layout.
    */
  val bloomProbeKeys = Seq(7L, 371L, 1297L)
  val qBloomIndex: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("bloom-index")
      t(s, dir, "orders")
        .repartition(16, col("o_orderkey"))
        .write.mode("overwrite").parquet(target)
      val idx = graft.operators.BloomFileIndex.build(s, target, "o_custkey")
      graft.operators.BloomFileIndex.prunedRead(s, target, idx, "o_custkey", bloomProbeKeys)
    },
    oracle = Some(
      s"SELECT * FROM orders WHERE o_custkey IN (${bloomProbeKeys.mkString(", ")})"))

  /** #10s2 Bloom-index pruning, fully distributed
    * ([[graft.operators.BloomFileIndex.prunedReadSemiJoin]]): the
    * probe set stays a DataFrame — buckets join the exploded index,
    * candidate files broadcast into a left-semi against
    * input_file_name(), probes equi-semi-join for exactness. The
    * unbounded-probe-count companion to #10s; same oracle, same rows.
    */
  val qBloomIndexSemi: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("bloom-index-semi")
      t(s, dir, "orders")
        .repartition(16, col("o_orderkey"))
        .write.mode("overwrite").parquet(target)
      val idx = graft.operators.BloomFileIndex.build(s, target, "o_custkey")
      val probes = t(s, dir, "customer")
        .filter(col("c_custkey").isin(bloomProbeKeys: _*))
        .select(col("c_custkey"))
      graft.operators.BloomFileIndex.prunedReadSemiJoin(
        s, target, idx, "o_custkey", probes, "c_custkey")
    },
    oracle = Some(
      s"""SELECT o.* FROM orders o
         |WHERE o.o_custkey IN (SELECT c_custkey FROM customer
         |                      WHERE c_custkey IN (${bloomProbeKeys.mkString(", ")}))""".stripMargin))

  /** #10s3 Incrementally-maintained Bloom index
    * ([[graft.operators.BloomFileIndex.refresh]]): the table lands in
    * two appends; the index is refreshed after each — the second
    * refresh scans ONLY the appended files (O(commit), not O(table):
    * the file-list diff is pure FS metadata) — and the probe reads
    * through the maintained index. Row-identical to the full scan,
    * which is exactly what the oracle runs; the spec additionally
    * locks refresh == rebuild bucket-for-bucket and the
    * only-new-files scan count.
    */
  val qBloomRefresh: QueryDef = QueryDef(
    run = (s, dir) => {
      val base = scratch("bloom-refresh")
      val target = base + "/t"
      val idxPath = base + "/idx"
      val ev = t(s, dir, "orders")
      // two disjoint appends = two commits of an append-mostly table
      ev.filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .repartition(8, col("o_orderkey"))
        .write.mode("overwrite").parquet(target)
      graft.operators.BloomFileIndex.refresh(s, target, idxPath, "o_custkey")
      ev.filter(pmod(col("o_orderkey"), lit(2)) === 1)
        .repartition(8, col("o_orderkey"))
        .write.mode("append").parquet(target)
      graft.operators.BloomFileIndex.refresh(s, target, idxPath, "o_custkey")
      graft.operators.BloomFileIndex.prunedRead(
        s, target, graft.operators.BloomFileIndex.load(s, idxPath),
        "o_custkey", bloomProbeKeys)
    },
    oracle = Some(
      s"SELECT * FROM orders WHERE o_custkey IN (${bloomProbeKeys.mkString(", ")})"))

  /** #10v Incrementally-maintained persisted zone-map index
    * ([[graft.operators.ZoneMaps.refresh]], the same
    * GenerationalFileIndex protocol as the bloom index): the table
    * lands in two range-clustered appends; the zone map is refreshed
    * after each — the second refresh scans ONLY the appended files —
    * and a range scan reads through the maintained index
    * (candidate-file pruning + exact re-filter). Row-identical to the
    * full scan, which is exactly what the oracle runs.
    */
  val qZonemapRefresh: QueryDef = QueryDef(
    run = (s, dir) => {
      val base = scratch("zonemap-refresh")
      val target = base + "/t"
      val idxPath = base + "/idx"
      val ord = t(s, dir, "orders")
      ord.filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions(col("o_orderkey"))
        .write.mode("overwrite").parquet(target)
      graft.operators.ZoneMaps.refresh(s, target, idxPath, "o_orderkey")
      ord.filter(pmod(col("o_orderkey"), lit(2)) === 1)
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions(col("o_orderkey"))
        .write.mode("append").parquet(target)
      graft.operators.ZoneMaps.refresh(s, target, idxPath, "o_orderkey")
      graft.operators.ZoneMaps.prunedRead(
        s, target, graft.operators.ZoneMaps.load(s, idxPath),
        "o_orderkey", 1000L, 3000L)
    },
    oracle = Some(
      "SELECT * FROM orders WHERE o_orderkey BETWEEN 1000 AND 3000"))

  /** #61 BPE pair statistics — the ranking one tokenizer-training
    * iteration runs: weighted adjacent character pairs over the
    * distinct-word frequency table (never the corpus), top 20 with a
    * total-order tiebreak. `left`/`right` are SQL keywords → emitted
    * as lhs/rhs.
    */
  val qBpePairs: QueryDef = QueryDef(
    run = (s, dir) => {
      import graft.operators.Bpe
      Bpe.pairCounts(Bpe.toSymbols(Bpe.wordCounts(t(s, dir, "documents"))))
        .select(col("left").as("lhs"), col("right").as("rhs"), col("pair_n"))
        .orderBy(col("pair_n").desc, col("lhs"), col("rhs"))
        .limit(20)
    },
    oracle = Some(
      """WITH words AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |), wc AS (
        |  SELECT w, count(*) AS c FROM words WHERE strlen(w) >= 1 GROUP BY w
        |), pairs AS (
        |  SELECT substring(w, CAST(i AS INT), 1) AS lhs,
        |         substring(w, CAST(i AS INT) + 1, 1) AS rhs, c
        |  FROM wc, unnest(range(1, strlen(w))) AS t(i)
        |  WHERE strlen(w) >= 2
        |)
        |SELECT lhs, rhs, CAST(sum(c) AS BIGINT) AS pair_n
        |FROM pairs GROUP BY lhs, rhs
        |ORDER BY pair_n DESC, lhs, rhs LIMIT 20""".stripMargin))

  /** #61b Learned BPE merge table (8 iterations over the word-
    * frequency table; greedy leftmost apply), ORACLED EXACTLY: the
    * eight training passes unroll as generated CTE blocks — each pass
    * re-derives weighted adjacent-pair counts, picks the top pair by
    * (count desc, pair lex), and applies the merge with pure window
    * logic: match positions island into maximal consecutive runs
    * (runs longer than 1 only occur when left==right) and
    * greedy-leftmost keeps the even offsets of each run — exactly
    * the fold `Bpe.applyMerge` computes. `MATERIALIZED` hints stop
    * DuckDB inlining each thrice-referenced pass (the default
    * re-expansion is exponential in passes). Also certifies the
    * batched trainer stays byte-identical to sequential selection.
    */
  val qBpeMerges: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Bpe.trainDf(s, t(s, dir, "documents"), iters = 8)
      .select(col("rank").cast("long").as("rank"),
        col("left").as("lhs"), col("right").as("rhs"), col("pair_n")),
    oracle = Some(bpeOracleSql(8,
      (1 to 8).map { k =>
        s"SELECT CAST($k AS BIGINT) AS rank, l AS lhs, r AS rhs, CAST(pn AS BIGINT) AS pair_n FROM m$k"
      }.mkString("\nUNION ALL\n"))))

  /** Generated DuckDB re-derivation of `iters` BPE training passes
    * (see qBpeMerges' doc): defines wc/s0 and per-pass CTEs
    * m1..m`iters` (the chosen merge) and s1..s`iters` (the symbol
    * table after that merge), then appends `finalSelect`.
    */
  protected def bpeOracleSql(iters: Int, finalSelect: String): String = {
    val head =
      """WITH wc AS (
        |  SELECT word, count(*) AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE strlen(word) >= 1 GROUP BY word
        |), s0 AS MATERIALIZED (
        |  SELECT word, n, list_transform(range(1, strlen(word)+1), i -> word[i]) AS syms FROM wc
        |)""".stripMargin
    val passes = (1 to iters).map { k =>
      s""", e$k AS (
         |  SELECT word, n, unnest(syms) AS sym, unnest(range(len(syms))) AS p FROM s${k - 1}
         |), a$k AS (
         |  SELECT word, n, p, sym, lead(sym) OVER (PARTITION BY word ORDER BY p) AS nxt FROM e$k
         |), pc$k AS (
         |  SELECT sym AS l, nxt AS r, sum(n) AS pn FROM a$k WHERE nxt IS NOT NULL GROUP BY 1, 2
         |), m$k AS MATERIALIZED (
         |  SELECT l, r, pn FROM pc$k ORDER BY pn DESC, l, r LIMIT 1
         |), mk$k AS (
         |  SELECT word, n, p, sym,
         |    (sym = (SELECT l FROM m$k) AND nxt = (SELECT r FROM m$k)) AS is_match
         |  FROM a$k
         |), ch$k AS (
         |  SELECT word, p, ((p - first) % 2 = 0) AS chosen FROM (
         |    SELECT word, p, min(p) OVER (PARTITION BY word, isl) AS first FROM (
         |      SELECT word, p, p - row_number() OVER (PARTITION BY word ORDER BY p) AS isl
         |      FROM mk$k WHERE is_match))
         |), rb$k AS (
         |  SELECT word, n, p,
         |    CASE WHEN chosen_b THEN sym || (SELECT r FROM m$k)
         |         WHEN coalesce(lag(chosen_b) OVER (PARTITION BY word ORDER BY p), false) THEN NULL
         |         ELSE sym END AS out
         |  FROM (
         |    SELECT a.word, a.n, a.p, a.sym, coalesce(c.chosen, false) AS chosen_b
         |    FROM mk$k a LEFT JOIN ch$k c USING (word, p))
         |), s$k AS MATERIALIZED (
         |  SELECT word, any_value(n) AS n,
         |         list(out ORDER BY p) FILTER (WHERE out IS NOT NULL) AS syms
         |  FROM rb$k GROUP BY word
         |)""".stripMargin
    }.mkString
    head + passes + "\n" + finalSelect
  }

  /** #62 Fixed-weight linear quality classifier: integer features ×
    * integer weights vs an integer threshold — the model-based
    * quality gate, engine-exact (see TextAnalysis.qualityLinear).
    */
  val qQualityScore: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.TextAnalysis.qualityLinear(t(s, dir, "documents"))
      .select(col("doc_id"), col("n_words"), col("stop_hits"), col("mwl10"),
        col("q_score"), col("q_pass")),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), m AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS BIGINT) AS stop_hits
        |  FROM t
        |), f AS (
        |  SELECT doc_id, n_words, stop_hits,
        |    CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END AS mwl10
        |  FROM m
        |)
        |SELECT doc_id, n_words, stop_hits, mwl10,
        |  2 * least(n_words, 100) + 25 * stop_hits - abs(mwl10 - 50) AS q_score,
        |  (2 * least(n_words, 100) + 25 * stop_hits - abs(mwl10 - 50)) >= 220 AS q_pass
        |FROM f""".stripMargin))

  /** #62b Trainable Naive Bayes classifier: class-conditional token
    * counts learned from the labeled 90% of the corpus, the held-out
    * 10% classified by argmin total integer surprisal —
    * ⌊log₁₀((n_c+V)/(n_wc+1))⌋ as the decimal magnitude of an exact
    * integer division, so training AND inference hash-match a
    * first-principles DuckDB re-derivation (see
    * [[graft.operators.NaiveBayes]]).
    */
  val qNbClassify: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.NaiveBayes.classify(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0))
    },
    oracle = Some(
      """WITH tr AS (
        |  SELECT lang, text FROM documents WHERE doc_id % 10 <> 0
        |), ttok AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM tr
        |), cnt AS MATERIALIZED (
        |  SELECT lang, tok, count(*) AS n_wc FROM ttok GROUP BY lang, tok
        |), ctot AS (
        |  SELECT lang, count(*) AS n_c FROM ttok GROUP BY lang
        |), v AS (
        |  SELECT count(DISTINCT tok) AS vsz FROM ttok
        |), pri AS (
        |  SELECT lang, count(*) AS n_d FROM tr GROUP BY lang
        |), nn AS (
        |  SELECT count(*) AS n_docs FROM tr
        |), cls AS (
        |  SELECT p.lang, c.n_c + v.vsz AS num,
        |         CAST(length(CAST(nn.n_docs // p.n_d AS VARCHAR)) - 1 AS BIGINT) AS prior_b
        |  FROM pri p, nn, v, ctot c WHERE c.lang = p.lang
        |), te AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |  WHERE doc_id % 10 = 0
        |), sc AS (
        |  SELECT te.doc_id, c.lang, c.prior_b,
        |    CAST(length(CAST(c.num // (coalesce(k.n_wc, 0) + 1) AS VARCHAR)) - 1 AS BIGINT) AS b
        |  FROM te CROSS JOIN cls c
        |  LEFT JOIN cnt k ON k.lang = c.lang AND k.tok = te.tok
        |), tot AS (
        |  SELECT doc_id, lang, CAST(min(prior_b) + sum(b) AS BIGINT) AS nb_score
        |  FROM sc GROUP BY doc_id, lang
        |)
        |SELECT doc_id, lang AS pred_label, nb_score FROM (
        |  SELECT doc_id, lang, nb_score,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY nb_score, lang) AS rk
        |  FROM tot) WHERE rk = 1""".stripMargin))

  /** #63 Product-quantization approximate top-k (ADC) — FULLY
    * ORACLED ([[OracleSql.pqTopkSql]]: codebooks re-trained in SQL
    * from the same hash-ordered sample, codes re-derived with
    * pqEncode's float-cast strict-< argmin, ADC re-summed in
    * subspace order); the spec still bounds recall against exact
    * inner-product search.
    */
  val qSimPqTopk: QueryDef = QueryDef(
    run = (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
    },
    oracle = Some(OracleSql.pqTopkSql(k = 5)))

  /** #63c IVFPQ approximate top-k — IVF cell routing composed with PQ
    * ADC scoring (the FAISS IVFPQ design): candidates come only from
    * each query's nprobe nearest cells, scored from 1-byte codes.
    * FULLY ORACLED ([[OracleSql.ivfPqTopkSql]]: both quantizers
    * re-trained in SQL from the same sample, codes re-derived with
    * pqEncode's float-cast argmin, ADC re-summed in subspace order);
    * the spec still bounds recall and proves the candidate set
    * shrinks to ~nprobe/nlist of the corpus.
    */
  val qSimIvfPqTopk: QueryDef = QueryDef(
    run = (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.ivfPqTopK(
        emb, emb.filter(col("vec_id") < 10), k = 5, nlist = 16, nprobe = 4)
    },
    oracle = Some(OracleSql.ivfPqTopkSql(k = 5, nprobe = 4)))

  /** #63d IVFPQ + exact re-rank — the full FAISS production shape:
    * routed compressed candidates, full vectors only for the 4·k
    * survivors. Fully oracled: stage-1 candidates re-derived as in
    * sim_ivfpq_topk, then the exact-cosine re-rank replayed over them.
    */
  val qSimIvfPqRerank: QueryDef = QueryDef(
    run = (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.ivfPqRerankTopK(
        emb, emb.filter(col("vec_id") < 10), k = 5, nlist = 16, nprobe = 4)
    },
    oracle = Some(OracleSql.ivfPqTopkSql(k = 5, rerank = true, nprobe = 4)))

  /** #16b Order-priority check (TPC-H Q4 shape, adapted to this
    * schema's dates): orders with at least one line item shipped
    * more than 60 days after the order date, counted per priority —
    * an EXISTS (left-semi join) with an inequality payload condition.
    */
  val q4Priority: QueryDef = QueryDef(
    run = (s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(li,
          o("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },
    oracle = Some(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin))

  /** #16c Returned-item revenue report (TPC-H Q10 shape): per-customer
    * revenue over returned lines, top 20 (total-ordered tiebreak on
    * custkey). Fact-side filter prunes before the join; the customer
    * and nation dims broadcast.
    */
  val q10Returns: QueryDef = QueryDef(
    run = (s, dir) => {
      val rev = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("decimal(28,6)")
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_lines"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    oracle = Some(
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin))

  /** #16d Large-volume orders (TPC-H Q18 shape): orders whose total
    * line quantity exceeds 150, joined back to customer — a HAVING
    * aggregate feeding a second join, with the quantity rollup as
    * exact integral-double sums.
    */
  val q18LargeOrders: QueryDef = QueryDef(
    run = (s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 150)
      t(s, dir, "orders").join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
    },
    oracle = Some(
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
        |)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin))

  /** #10m Point-in-time temporal join: probes at ts+45min enriched
    * with the SCD2 dimension state valid at that instant — the
    * feature-store no-leakage join, executed as an as-of join (no
    * range join, no interval explosion). The oracle is the literal
    * `valid_from <= pts < valid_to` LEFT JOIN.
    */
  val qTemporalJoin: QueryDef = QueryDef(
    run = (s, dir) => {
      val ev = t(s, dir, "events")
      val dim = graft.operators.Scd2.fromChangeLog(
        ev, "user_id", "ts", attrCols = Seq("event_type"), tiebreakCols = Seq("event_id"))
      val probes = ev.select(col("event_id"), col("user_id"),
        (col("ts") + expr("INTERVAL 45 MINUTE")).as("pts"))
      graft.operators.Scd2.temporalJoin(probes, dim, Seq("user_id"), "pts", Seq("event_type"))
        .select(col("event_id"), col("user_id"), col("pts"),
          col("asof_event_type").as("type_at"))
    },
    oracle = Some(
      """WITH c AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events
        |), ch AS (
        |  SELECT user_id, ts, event_id, event_type FROM c
        |  WHERE prev IS NULL OR event_type IS DISTINCT FROM prev
        |), dim AS (
        |  SELECT user_id, event_type, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM ch
        |), p AS (
        |  SELECT event_id, user_id, ts + INTERVAL 45 MINUTE AS pts FROM events
        |)
        |SELECT p.event_id, p.user_id, p.pts, d.event_type AS type_at
        |FROM p LEFT JOIN dim d
        |  ON p.user_id = d.user_id
        | AND d.valid_from <= p.pts
        | AND (d.valid_to IS NULL OR p.pts < d.valid_to)""".stripMargin))

  /** #17c Nation-pair trade volume (TPC-H Q7 shape): the same nation
    * dimension joined in TWO roles (customer side, supplier side),
    * asymmetric pairs only — revenue per (cust_nation, supp_nation).
    */
  val q7Volume: QueryDef = QueryDef(
    run = (s, dir) => {
      val rev = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("decimal(28,6)")
      val custNation = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation")))
      val suppNation = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation")))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(custNation, col("c_nationkey") === col("cnk"))
        .join(suppNation, col("s_nationkey") === col("snk"))
        .filter(col("cust_nation") =!= col("supp_nation"))
        .groupBy(col("cust_nation"), col("supp_nation"))
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_lines"))
    },
    oracle = Some(
      """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE cn.n_name != sn.n_name
        |GROUP BY cn.n_name, sn.n_name""".stripMargin))

  /** #22k Streaming incremental read of the MOR delta log: two delta
    * commits stream through the file source (one micro-batch each)
    * into a running aggregate — the Hudi streaming-incremental-query
    * shape. The base snapshot is NOT re-read; only commit deltas flow.
    */
  val qStreamMor: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("stream-mor")
      val base = t(s, dir, "events")
      graft.sources.MorTable.writeBase(base, target)
      graft.sources.MorTable.appendLog(
        base.filter(col("event_type") === "purchase")
          .withColumn("value", col("value") * 2)
          .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR")), target)
      graft.sources.MorTable.appendLog(
        base.filter(col("event_type") === "click")
          .withColumn("event_id", col("event_id") + 20000000L), target)
      graft.streaming.TableStream.runLogAggToBatch(
        s, target,
        df => df.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value")),
        queryName = "graft_stream_mor_" +
          java.util.UUID.randomUUID().toString.replace("-", ""))
    },
    oracle = Some(
      """WITH deltas AS (
        |  SELECT event_type, value * 2 AS value
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT event_type, value FROM events WHERE event_type = 'click'
        |)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM deltas GROUP BY event_type""".stripMargin))

  /** #14k Value-based quantile binning: quartile fences per group,
    * rows bucketed 1-4 against them (boundary goes up) — feature
    * discretization as one agg + broadcast join.
    */
  val qQuantileBins: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Profiler.quantileBins(
        t(s, dir, "events").withColumn("cents", round(col("value") * 100).cast("long")),
        "event_type", "cents")
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"), min(col("cents")).as("lo"), max(col("cents")).as("hi")),
    oracle = Some(
      """WITH c AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
        |), q AS (
        |  SELECT event_type,
        |    quantile_cont(cents, 0.25) AS p25,
        |    quantile_cont(cents, 0.50) AS p50,
        |    quantile_cont(cents, 0.75) AS p75
        |  FROM c GROUP BY event_type
        |), b AS (
        |  SELECT c.event_type, cents,
        |    CASE WHEN cents < p25 THEN 1 WHEN cents < p50 THEN 2
        |         WHEN cents < p75 THEN 3 ELSE 4 END AS bin
        |  FROM c JOIN q USING (event_type)
        |)
        |SELECT event_type, bin, count(*) AS n, min(cents) AS lo, max(cents) AS hi
        |FROM b GROUP BY event_type, bin""".stripMargin))

  /** #14l Group-mean null imputation: values nulled on a fixed key
    * schedule (event_id % 7 = 0 — the corpus has no natural nulls),
    * then imputed with the exact per-type mean of the survivors.
    */
  val qImpute: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Profiler.imputeMean(
        t(s, dir, "events").withColumn("value",
          when(pmod(col("event_id"), lit(7)) === 0, lit(null)).otherwise(col("value"))),
        "event_type", "value", "value_filled")
      .select(col("event_id"), col("event_type"), col("value"), col("value_filled")),
    oracle = Some(
      """WITH v AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
        |  FROM events
        |), m AS (
        |  SELECT event_type,
        |    CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(value) AS mean_v
        |  FROM v WHERE value IS NOT NULL GROUP BY event_type
        |)
        |SELECT event_id, v.event_type, value,
        |       coalesce(value, mean_v) AS value_filled
        |FROM v LEFT JOIN m USING (event_type)""".stripMargin))

  /** #28d Tensor-column profile: per-dimension n/min/max/fixed-point
    * mean over the whole embedding corpus — Profiler for an
    * Array[Float] column (the per-label variant is emb_centroids).
    */
  val qEmbProfile: QueryDef = QueryDef(
    run = (s, dir) =>
      t(s, dir, "embeddings")
        .select(posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("pos").cast("long").as("pos"))
        .agg(count(lit(1)).as("n"),
          min(col("v")).cast("double").as("min_v"),
          max(col("v")).cast("double").as("max_v"),
          (sum(floor(col("v").cast("double") * 1e9).cast("long")).cast("double")
            / count(lit(1)) / 1e9).as("mean_v")),
    oracle = Some(
      """WITH e AS (
        |  SELECT unnest(range(len(embedding))) AS pos, unnest(embedding) AS v
        |  FROM embeddings
        |)
        |SELECT CAST(pos AS BIGINT) AS pos, count(*) AS n,
        |  CAST(min(v) AS DOUBLE) AS min_v,
        |  CAST(max(v) AS DOUBLE) AS max_v,
        |  CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000000.0) AS BIGINT)) AS DOUBLE)
        |    / count(*) / 1000000000.0 AS mean_v
        |FROM e GROUP BY pos""".stripMargin))

  /** #28e Sparse random projection to 8 dims: the hash-derived
    * Achlioptas matrix makes the projected coordinates exact integer
    * sums both engines regenerate bit-identically (bounded to
    * vec_id < 500 for the dump; the operator is corpus-generic).
    */
  val qEmbProject: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Similarity.randomProject(
      t(s, dir, "embeddings").filter(col("vec_id") < 500), kOut = 8),
    oracle = Some(
      """WITH e AS (
        |  SELECT vec_id,
        |         unnest(range(len(embedding))) AS pos,
        |         unnest(embedding) AS v
        |  FROM embeddings WHERE vec_id < 500
        |), x AS (
        |  SELECT vec_id, pos, CAST(floor(CAST(v AS DOUBLE) * 1000000000.0) AS BIGINT) AS q,
        |         unnest(range(8)) AS j
        |  FROM e
        |), r AS (
        |  SELECT vec_id, j, q,
        |    ((pos % 2147483648) * 2654435761 + j * 40503) % 2147483648 % 6 AS sel
        |  FROM x
        |)
        |SELECT vec_id, j,
        |  CAST(sum(CASE WHEN sel = 0 THEN q WHEN sel = 1 THEN -q ELSE 0 END) AS BIGINT) AS y_fp
        |FROM r GROUP BY vec_id, j""".stripMargin))

}
