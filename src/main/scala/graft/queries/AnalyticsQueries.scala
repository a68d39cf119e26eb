package graft

import graft.pipeline._
import graft.sources.{IncrementalReader, TableLoader, UpsertWriter}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Analytics slice of the query catalog (aggregates, windows, joins, sampling, stats) — one trait of the linear
  * [[Queries]] stack; see Queries.scala for the registry and the
  * catalog-wide numeric policy.
  */
trait AnalyticsQueries extends ReferenceQueries {

  // ---------------------------------------------------------------
  // Analytics surface
  // ---------------------------------------------------------------

  /** #15 Pricing-summary aggregate (TPC-H Q1 shape). */
  val q1Agg: QueryDef = QueryDef(
    run = (s, dir) => {
      val li = t(s, dir, "lineitem")
      val discPrice = col("l_extendedprice").cast("decimal(18,2)") * (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
      val charge = discPrice * (lit(1).cast("decimal(18,2)") + col("l_tax").cast("decimal(18,2)"))
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast(li.schema("l_shipdate").dataType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(discPrice.cast("decimal(28,6)")).cast("double").as("sum_disc_price"),
          sum(charge.cast("decimal(28,6)")).cast("double").as("sum_charge"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    oracle = Some(
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
        |  sum(l_quantity) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin))

  /** #16 Multi-way join + agg + deterministic top-N (TPC-H Q3 shape).
    * Orders table carries no shippriority; o_orderpriority stands in.
    */
  val q3TopOrders: QueryDef = QueryDef(
    run = (s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val cutoff = lit("1996-03-15").cast(ord.schema("o_orderdate").dataType)
      broadcast(cust)
        .join(ord, col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < cutoff)
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > lit("1996-03-15").cast(li.schema("l_shipdate").dataType))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,6)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },
    oracle = Some(
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin))

  /** #17 Star join over the full dimension chain (TPC-H Q5 shape):
    * region → nation → customer/supplier → orders → lineitem, with
    * the supplier constrained to the customer's nation. Dimensions
    * broadcast; the fact table never shuffles pre-aggregation.
    */
  val q5StarJoin: QueryDef = QueryDef(
    run = (s, dir) => {
      val region = t(s, dir, "region")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val supp = t(s, dir, "supplier")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,6)")).cast("double").as("revenue"),
          count(lit(1)).as("n_lineitems"))
    },
    oracle = Some(
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lineitems
        |FROM region, nation, customer, supplier, orders, lineitem
        |WHERE r_regionkey = n_regionkey AND n_nationkey = s_nationkey
        |  AND s_nationkey = c_nationkey AND c_custkey = o_custkey
        |  AND o_orderkey = l_orderkey AND l_suppkey = s_suppkey
        |GROUP BY r_name, n_name""".stripMargin))

  /** #17b Fact⋈part-dimension share-of-revenue (TPC-H Q14 shape):
    * ECONOMY-type share of discounted revenue per p_brand. Part is
    * broadcast; conditional aggregation in one pass over lineitem.
    */
  val q14PromoShare: QueryDef = QueryDef(
    run = (s, dir) => {
      val li = t(s, dir, "lineitem")
      val part = t(s, dir, "part")
      val discPrice = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,6)")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          sum(when(col("p_type") === "ECONOMY", discPrice).otherwise(lit(0).cast("decimal(28,6)"))).cast("double").as("economy_revenue"),
          sum(discPrice).cast("double").as("total_revenue"),
          count(lit(1)).as("n_items"))
    },
    oracle = Some(
      """SELECT p_brand,
        |  CAST(sum(CASE WHEN p_type = 'ECONOMY'
        |    THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))
        |    ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) AS economy_revenue,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin))

  /** #18 Window functions: per-customer running spend + order rank. */
  val qWindowRunning: QueryDef = QueryDef(
    run = (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ord = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      ord.select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        row_number().over(w).as("order_seq"),
        sum(col("o_totalprice").cast("decimal(28,6)")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double").as("running_spend"))
    },
    oracle = Some(
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  row_number() OVER w AS order_seq,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin))

  /** #19 Top-k per group: each customer's 3 priciest orders. */
  val qTopkPerGroup: QueryDef = QueryDef(
    run = (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ord = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      ord.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
    },
    oracle = Some(
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders
        |) WHERE rk <= 3""".stripMargin))

  /** #19b Top-k per group via the bounded-heap aggregate — identical
    * result (and oracle) to the window variant, but the scale-correct
    * plan: O(k) state per group with map-side combine instead of a
    * full partition sort. Same SQL oracle as q_topk_per_group.
    */
  val qTopkHeap: QueryDef = QueryDef(
    run = (s, dir) => {
      val ord = t(s, dir, "orders")
      ord.groupBy(col("o_custkey"))
        .agg(graft.functions.TopKFunctions.top_k(col("o_totalprice"), col("o_orderkey"), 3).as("hits"))
        .select(col("o_custkey"), posexplode(col("hits")).as(Seq("pos", "hit")))
        .select(col("o_custkey"), col("hit.id").as("o_orderkey"),
          col("hit.score").as("o_totalprice"), (col("pos") + 1).cast("int").as("rk"))
    },
    oracle = Some(
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders
        |) WHERE rk <= 3""".stripMargin))

  /** #19c Incremental top-k maintenance: the per-customer order
    * leaderboard folds two increments into O(k)-per-key state (heap
    * merge is associative), and the final read must equal the full
    * recompute — same oracle as the one-shot heap query.
    */
  val qIncTopk: QueryDef = QueryDef(
    run = (s, dir) => {
      val statePath = scratch("inc-topk-state")
      val ord = t(s, dir, "orders")
      val cut = lit("1995-01-01").cast("timestamp_ntz")
      graft.operators.IncrementalAgg.refreshTopK(
        s, statePath, ord.filter(col("o_orderdate") <= cut),
        Seq("o_custkey"), "o_totalprice", "o_orderkey", k = 3, batchId = Some(1L))
      graft.operators.IncrementalAgg.refreshTopK(
        s, statePath, ord.filter(col("o_orderdate") > cut),
        Seq("o_custkey"), "o_totalprice", "o_orderkey", k = 3, batchId = Some(2L))
      // replayed increment is a no-op under the high-water mark (a
      // re-inserted id occupying two heap slots would fail the oracle)
      graft.operators.IncrementalAgg.refreshTopK(
        s, statePath, ord.filter(col("o_orderdate") > cut),
        Seq("o_custkey"), "o_totalprice", "o_orderkey", k = 3, batchId = Some(2L))
      graft.operators.IncrementalAgg.readTopK(s, statePath, Seq("o_custkey"))
        .select(col("o_custkey"), col("id").as("o_orderkey"),
          col("score").as("o_totalprice"), col("rk"))
    },
    oracle = qTopkHeap.oracle)

  /** #20 Anti join: customers with no big-ticket order (NOT EXISTS).
    * The threshold keeps the result non-empty at every SF so the
    * check actually exercises rows.
    */
  val qAntiJoin: QueryDef = QueryDef(
    run = (s, dir) => {
      val cust = t(s, dir, "customer")
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left_anti")
    },
    oracle = Some(
      """SELECT c.* FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin))

  /** #18b Hierarchical rollup aggregation: order value by
    * (priority, status) with subtotals per priority and a grand total,
    * plus grouping_id to tell the levels apart. One shuffle — Spark
    * expands the grouping sets map-side.
    */
  val qRollup: QueryDef = QueryDef(
    run = (s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"),
          grouping_id().as("gid")),
    oracle = Some(
      """SELECT o_orderpriority, o_orderstatus,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price,
        |  GROUPING(o_orderpriority, o_orderstatus) AS gid
        |FROM orders
        |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin))

  /** #18f Cube aggregation: order value by every subset of
    * (priority, status) — all four grouping sets in ONE shuffle
    * (Spark expands grouping sets map-side, same as rollup), with
    * grouping_id separating the levels.
    */
  val qCube: QueryDef = QueryDef(
    run = (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"),
          grouping_id().as("gid")),
    oracle = Some(
      """SELECT o_orderpriority, o_orderstatus,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price,
        |  GROUPING(o_orderpriority, o_orderstatus) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin))

  /** #18c Pivot: order value by status × priority, priorities as
    * columns. Values enumerated explicitly — a pivot without them
    * costs a driver-side distinct pass, which is not a 100 TB shape.
    */
  protected val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  val qPivot: QueryDef = QueryDef(
    run = (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", priorities)
        .agg(dsum(col("o_totalprice"))),
    oracle = Some(
      s"""SELECT o_orderstatus,
         |${priorities.map(p =>
              s"""  CAST(sum(CASE WHEN o_orderpriority = '$p' THEN CAST(o_totalprice AS DECIMAL(28,6)) END) AS DOUBLE) AS "$p"""")
            .mkString(",\n")}
         |FROM orders GROUP BY o_orderstatus""".stripMargin))

  /** #18n UNPIVOT / melt — the wide-to-long reshape (pivot's
    * inverse): the per-nation order report (three metric columns,
    * every cent exact through DECIMAL) melted to (n_name, metric,
    * value) rows with Spark 4's native `Dataset.unpivot` (plans as
    * one Expand over the 25-row aggregate — no shuffle, no join; at
    * any scale the melt itself is O(rows·metrics) projection work on
    * TOP of the aggregation that produced the wide table). The
    * oracle re-derives the reshape as a three-way UNION ALL.
    */
  val qUnpivot: QueryDef = QueryDef(
    run = (s, dir) => {
      val cents = expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
      val wide = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents).cast("long").as("total_cents"),
          max(cents).as("max_cents"))
      wide.unpivot(
        Array(col("n_name")),
        Array(col("n_orders"), col("total_cents"), col("max_cents")),
        "metric", "value")
    },
    oracle = Some(
      """WITH w AS (
        |  SELECT n_name, count(*) AS n_orders,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |      AS total_cents,
        |    max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS max_cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1
        |)
        |SELECT n_name, 'n_orders' AS metric, CAST(n_orders AS BIGINT) AS value FROM w
        |UNION ALL SELECT n_name, 'total_cents', total_cents FROM w
        |UNION ALL SELECT n_name, 'max_cents', max_cents FROM w""".stripMargin))

  /** #18d Exact interpolated percentiles per group. Integral doubles
    * (l_quantity) keep the lo + frac·(hi-lo) interpolation
    * bit-identical across engines.
    */
  val qPercentiles: QueryDef = QueryDef(
    run = (s, dir) => {
      val ps = Seq(0.25, 0.5, 0.75, 0.9)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_quantity"),
          array(ps.map(lit): _*)).as("_p"))
        .select(col("l_returnflag") +:
          ps.zipWithIndex.map { case (p, i) =>
            element_at(col("_p"), i + 1).as(s"p${(p * 100).toInt}") }: _*)
    },
    oracle = Some(
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.50) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  quantile_cont(l_quantity, 0.90) AS p90
        |FROM lineitem GROUP BY l_returnflag""".stripMargin))

  /** #20b As-of join: each purchase picks up the user's most recent
    * click at-or-before it (union+window shape — see AsOfJoin).
    * Oracle is DuckDB's native ASOF LEFT JOIN: two different
    * algorithms must agree. Deterministic because (user_id, ts) is
    * unique within clicks.
    */
  val qAsofJoin: QueryDef = QueryDef(
    run = (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
      graft.operators.AsOfJoin.asof(
        purchases, clicks, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts", rightPayload = Seq("ts", "event_id"))
        .withColumnRenamed("asof_ts", "click_ts")
        .withColumnRenamed("asof_event_id", "click_event_id")
    },
    oracle = Some(
      """SELECT p.event_id, p.user_id, p.ts, p.value,
        |       c.ts AS click_ts, c.event_id AS click_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin))

  /** #36 Skew-salted join, oracled: enrich every event with its
    * user's total event count through SkewJoin.salted (big side
    * scattered over 8 sub-keys, small side replicated) — the result
    * must be byte-identical to the plain join the oracle runs.
    */
  val qSkewJoin: QueryDef = QueryDef(
    run = (s, dir) => {
      val ev = t(s, dir, "events")
      val userCounts = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_user_events"))
      graft.operators.SkewJoin.salted(
        ev.select("event_id", "user_id", "event_type"), userCounts,
        keys = Seq("user_id"), salt = 8)
    },
    oracle = Some(
      """SELECT e.event_id, e.user_id, e.event_type, u.n_user_events
        |FROM events e
        |JOIN (SELECT user_id, count(*) AS n_user_events FROM events GROUP BY user_id) u
        |  ON e.user_id = u.user_id""".stripMargin))

  /** #20g As-of join with tolerance (pandas merge_asof semantics):
    * same purchases→clicks join as q_asof_join, but matches older
    * than 30 minutes are nulled out. Oracle: DuckDB ASOF LEFT JOIN
    * with a CASE on the tolerance.
    */
  val qAsofTolerance: QueryDef = QueryDef(
    run = (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
      graft.operators.AsOfJoin.asofWithin(
        purchases, clicks, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts", rightPayload = Seq("ts", "event_id"),
        tolerance = expr("INTERVAL 30 MINUTE"))
        .withColumnRenamed("asof_ts", "click_ts")
        .withColumnRenamed("asof_event_id", "click_event_id")
    },
    oracle = Some(
      """SELECT p.event_id, p.user_id, p.ts, p.value,
        |       CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE THEN c.ts END AS click_ts,
        |       CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE THEN c.event_id END AS click_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin))

  /** #20i Nearest-direction as-of join (pandas merge_asof
    * direction='nearest'): each purchase matched to its CLOSEST click
    * in either direction, equidistant → backward, same-ts clicks →
    * deterministic payload tiebreak
    * ([[graft.operators.AsOfJoin.asofNearest]] — both direction
    * candidates from ONE window over the tagged union, two frames,
    * one shuffle). DuckDB has no nearest ASOF, so the oracle ranks
    * the full per-user candidate space by (|Δus|, direction,
    * side-matched id order) and keeps rank 1 — an O(L·R per key)
    * re-derivation of what the union+window computes in one pass.
    */
  val qAsofNearest: QueryDef = QueryDef(
    run = (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
      graft.operators.AsOfJoin.asofNearest(
        purchases, clicks, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "ts", rightPayload = Seq("ts", "event_id"))
        .withColumnRenamed("asof_ts", "click_ts")
        .withColumnRenamed("asof_event_id", "click_event_id")
    },
    oracle = Some(
      """WITH p AS (
        |  SELECT event_id, user_id, ts, value, epoch_us(ts) AS pus
        |  FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT event_id AS ce, user_id, ts AS cts, epoch_us(ts) AS cus
        |  FROM events WHERE event_type = 'click'
        |), cand AS (
        |  SELECT p.event_id AS pe, c.ce, c.cts,
        |    abs(c.cus - p.pus) AS dist,
        |    CASE WHEN c.cus <= p.pus THEN 0 ELSE 1 END AS pref
        |  FROM p JOIN c ON p.user_id = c.user_id
        |), best AS (
        |  SELECT pe, ce, cts FROM (
        |    SELECT pe, ce, cts, row_number() OVER (PARTITION BY pe
        |      ORDER BY dist, pref, CASE WHEN pref = 0 THEN -ce ELSE ce END) AS rk
        |    FROM cand) WHERE rk = 1
        |)
        |SELECT p.event_id, p.user_id, p.ts, p.value,
        |       b.cts AS click_ts, b.ce AS click_event_id
        |FROM p LEFT JOIN best b ON b.pe = p.event_id""".stripMargin))

  /** #51b Position-based multi-touch attribution
    * ([[graft.operators.EventAnalytics.attributePositionBased]]):
    * every purchase's cents credited U-shaped (40/20/40, 100% /
    * 50-50 degenerate forms) across the user's click/view/signup
    * touches in a 7-day lookback, remainders to the last touch so
    * per-conversion credits sum EXACTLY — then rolled up per
    * channel. The oracle replays the join, the position windows and
    * every floor split.
    */
  val qAttribution: QueryDef = QueryDef(
    run = (s, dir) => {
      val ev = t(s, dir, "events")
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("conv_id"), col("user_id"),
          col("ts").as("conv_ts"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val touches = ev.filter(col("event_type").isin("click", "view", "signup"))
        .select(col("event_id").as("touch_id"), col("user_id"),
          col("ts").as("touch_ts"), col("event_type").as("channel"))
      graft.operators.EventAnalytics.attributePositionBased(
        conv, touches, userCol = "user_id",
        convIdCol = "conv_id", convTsCol = "conv_ts", centsCol = "cents",
        touchIdCol = "touch_id", touchTsCol = "touch_ts", channelCol = "channel",
        lookback = expr("INTERVAL 7 DAYS"))
    },
    oracle = Some(
      """WITH conv AS (
        |  SELECT event_id AS conv_id, user_id, ts AS cts,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'
        |), tch AS (
        |  SELECT event_id AS tid, user_id, ts AS tts, event_type AS channel
        |  FROM events WHERE event_type IN ('click', 'view', 'signup')
        |), j AS (
        |  SELECT conv_id, cents, tid, channel,
        |    row_number() OVER (PARTITION BY conv_id ORDER BY tts, tid) AS pos,
        |    count(*) OVER (PARTITION BY conv_id) AS n
        |  FROM tch JOIN conv USING (user_id)
        |  WHERE tts <= cts AND tts >= cts - INTERVAL 7 DAY
        |), cr AS (
        |  SELECT channel,
        |    CASE WHEN n = 1 THEN cents
        |         WHEN pos = 1 THEN
        |           (CASE WHEN n = 2 THEN cents * 5000 // 10000
        |                 ELSE cents * 4000 // 10000 END)
        |         WHEN pos = n THEN cents
        |           - (CASE WHEN n = 2 THEN cents * 5000 // 10000
        |                   ELSE cents * 4000 // 10000 END)
        |           - (CASE WHEN n >= 3 THEN (cents * 2000 // 10000) // (n - 2)
        |                   ELSE 0 END) * (n - 2)
        |         ELSE (cents * 2000 // 10000) // (n - 2) END AS credit
        |  FROM j
        |)
        |SELECT channel, count(*) AS n_touches, CAST(sum(credit) AS BIGINT) AS credit_cents
        |FROM cr GROUP BY 1""".stripMargin))

  /** #41d Group-aware k-fold assignment
    * ([[graft.operators.Sampling.kFoldByGroup]]): every user's events
    * land in exactly one of 5 folds via the engine-reproducible
    * multiplicative hash — per-fold user/event counts. The oracle
    * runs the identical integer formula, so a single hash-constant
    * or modulus slip breaks every row.
    */
  val qKfold: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Sampling.kFoldByGroup(t(s, dir, "events"), "user_id", k = 5)
        .groupBy(col("fold"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events")),
    oracle = Some(
      // every % is wrapped ((x % m) + m) % m to mirror Spark's pmod:
      // DuckDB's % is sign-preserving, so a negative group id would
      // otherwise diverge (and could emit negative folds)
      """SELECT ((((((user_id % 2147483648) + 2147483648) % 2147483648)
        |          * 2654435761) % 2147483648 + 2147483648) % 2147483648) % 5 AS fold,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin))

  /** #38b Join-preserving pseudonymization
    * ([[graft.operators.Privacy.pseudonymize]]): events with user_id
    * replaced by a salted FNV token (map-side projection — masking a
    * 100 TB table is one scan), then per-token event counts — the
    * shape an analyst runs on the MASKED table, proving joins and
    * group-bys survive the masking. The oracle re-derives every token
    * from the 'salt:value' string via the established HUGEINT FNV
    * fold and the signed-BIGINT conversion.
    */
  val qPseudonymize: QueryDef = QueryDef(
    run = (s, dir) => {
      val masked = graft.operators.Privacy.pseudonymize(
        t(s, dir, "events"), Seq("user_id"), salt = "epoch7")
      masked.groupBy(col("user_id").as("user_token"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"))
    },
    oracle = Some(
      """WITH g AS (
        |  SELECT user_id, count(*) AS n_events,
        |         count(DISTINCT event_type) AS n_types
        |  FROM events GROUP BY 1
        |), h AS (
        |  SELECT n_events, n_types,
        |    list_reduce(
        |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |        list_transform(range(1, length(s)+1), i -> CAST(unicode(s[i]) AS HUGEINT))),
        |      (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                   * 1099511628211) % 18446744073709551616
        |    ) AS hu
        |  FROM (SELECT 'epoch7:' || CAST(user_id AS VARCHAR) AS s, n_events, n_types FROM g)
        |)
        |SELECT CAST(CASE WHEN hu >= CAST(9223372036854775808 AS HUGEINT)
        |                 THEN hu - CAST(18446744073709551616 AS HUGEINT)
        |                 ELSE hu END AS BIGINT) AS user_token,
        |  n_events, CAST(n_types AS BIGINT) AS n_types
        |FROM h""".stripMargin))

  /** #38c k-anonymity audit ([[graft.operators.Privacy.kAnonymityAudit]]):
    * one row per distinct quasi-identifier combination
    * (nation × segment × balance band) with its group size and
    * whether it meets k=5 — the re-identification check a masked
    * release runs BEFORE publishing (pseudonymized keys don't help
    * when the QI combo singles a person out). One map-side-combined
    * shuffle of distinct combos. The oracle recomputes the audit
    * directly.
    */
  val qKanon: QueryDef = QueryDef(
    run = (s, dir) => {
      val cust = t(s, dir, "customer")
        .withColumn("bal_band", floor(col("c_acctbal") / lit(5000.0)).cast("long"))
      graft.operators.Privacy.kAnonymityAudit(
        cust, Seq("c_nationkey", "c_mktsegment", "bal_band"), k = 5L)
    },
    oracle = Some(
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(floor(c_acctbal / 5000.0) AS BIGINT) AS bal_band,
        |  count(*) AS n, count(*) >= 5 AS anonymous
        |FROM customer
        |GROUP BY 1, 2, 3""".stripMargin))

  /** #18k Distribution windows: percent_rank and cume_dist of each
    * order's price within its priority class. Rank counts are small
    * integers, so the defining divisions ((rank−1)/(n−1), rows≤x/n)
    * produce identical IEEE doubles on both engines; ties share a
    * value by definition — no tiebreak needed for determinism.
    */
  val qWindowDist: QueryDef = QueryDef(
    run = (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"))
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
    },
    oracle = Some(
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS pct_rank,
        |  cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS cume
        |FROM orders""".stripMargin))

  /** #18g Analytic window functions beyond running sums: per-customer
    * inter-order gap (lag), next order (lead), and spend quartile
    * (ntile) — ties broken by orderkey so every engine agrees.
    */
  val qWindowLag: QueryDef = QueryDef(
    run = (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ord = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wSpend = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
      ord.select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        (unix_timestamp(col("o_orderdate").cast("timestamp")) -
          unix_timestamp(lag(col("o_orderdate"), 1).over(w).cast("timestamp"))).as("gap_seconds"),
        lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
        ntile(4).over(wSpend).as("spend_quartile"))
    },
    oracle = Some(
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  date_diff('second', lag(o_orderdate) OVER w, o_orderdate) AS gap_seconds,
        |  lead(o_orderkey) OVER w AS next_orderkey,
        |  ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS spend_quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin))

  /** #18h RANGE-framed window: per-user trailing 30-minute spend —
    * the frame is bounded by the ORDER VALUE (epoch micros), not row
    * counts, so ties share a frame and the result is order-
    * independent. Decimal running sum keeps it exact on both engines.
    */
  val qWindowRange: QueryDef = QueryDef(
    run = (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("_us"))
        .rangeBetween(-1800000000L, 0L) // trailing 30 minutes of micros
      t(s, dir, "events")
        .withColumn("_us", unix_micros(col("ts").cast("timestamp")))
        .select(col("event_id"), col("user_id"),
          sum(col("value").cast("decimal(28,6)")).over(w)
            .cast("double").as("trailing_30m"))
    },
    oracle = Some(
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS trailing_30m
        |FROM events""".stripMargin))

  /** #10b Snapshot diff (CDC): old = events, new = upsert-merged
    * events with doubled purchases (updates) and re-keyed clicks
    * (inserts). The diff must emit exactly those as
    * update/insert rows with new-side values.
    */
  val qSnapshotDiff: QueryDef = QueryDef(
    run = (s, dir) => {
      val base = t(s, dir, "events")
      val updates = base.filter(col("event_type") === "purchase")
        .withColumn("value", col("value") * 2)
        .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR"))
      val inserts = base.filter(col("event_type") === "click")
        .withColumn("event_id", col("event_id") + 10000000L)
      val next = UpsertWriter.merge(
        base.unionByName(updates).unionByName(inserts), Seq("event_id"), "ts")
      graft.operators.SnapshotDiff.diff(base, next, keys = Seq("event_id"))
    },
    oracle = Some(
      """SELECT event_id, 'update' AS change_type, ts + INTERVAL 1 HOUR AS ts,
        |       user_id, event_type, value * 2 AS value, props
        |FROM events WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT event_id + 10000000, 'insert', ts, user_id, event_type, value, props
        |FROM events WHERE event_type = 'click'""".stripMargin))

  /** #10e SCD2 history build: each user's event_type stream becomes
    * [valid_from, valid_to) attribute intervals — consecutive
    * unchanged types collapse, the open interval carries is_current.
    * One shuffle (both windows share the per-user sort); the oracle
    * is the classic lag/lead SQL formulation.
    */
  val qScd2: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Scd2.fromChangeLog(
        t(s, dir, "events"), "user_id", "ts",
        attrCols = Seq("event_type"), tiebreakCols = Seq("event_id")),
    oracle = Some(
      """WITH c AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events
        |), ch AS (
        |  SELECT user_id, ts, event_id, event_type FROM c
        |  WHERE prev IS NULL OR event_type IS DISTINCT FROM prev
        |)
        |SELECT user_id, event_type, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM ch""".stripMargin))

  /** #20c Set operations: BUILDING-segment customers split by whether
    * they ever placed an URGENT order — INTERSECT and EXCEPT branches
    * tagged and unioned.
    */
  val qSetOps: QueryDef = QueryDef(
    run = (s, dir) => {
      val building = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      building.intersect(urgent).withColumn("tag", lit("building_urgent"))
        .unionByName(building.except(urgent).withColumn("tag", lit("building_no_urgent")))
    },
    oracle = Some(
      """WITH building AS (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |), urgent AS (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |)
        |SELECT custkey, 'building_urgent' AS tag FROM (SELECT * FROM building INTERSECT SELECT * FROM urgent)
        |UNION ALL
        |SELECT custkey, 'building_no_urgent' AS tag FROM (SELECT * FROM building EXCEPT SELECT * FROM urgent)""".stripMargin))

  /** #20d Range join: every click inside a purchase's 30-minute
    * attribution window, per user — binned equi-join (see RangeJoin),
    * checked against DuckDB's plain inequality join. Timestamps
    * compared at microsecond precision (both engines' parquet reads
    * truncate the nanos column identically).
    */
  val qRangeJoin: QueryDef = QueryDef(
    run = (s, dir) => {
      val ev = t(s, dir, "events")
      val us = unix_micros(col("ts").cast("timestamp"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), us.as("click_us"))
      val windowUs = 30L * 60 * 1000 * 1000
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          us.as("win_start"), (us + windowUs).as("win_end"))
      graft.operators.RangeJoin.pointInInterval(
        clicks, purchases, keys = Seq("user_id"),
        pointCol = "click_us", startCol = "win_start", endCol = "win_end",
        binWidth = windowUs)
        .select(col("user_id"), col("purchase_id"), col("click_id"))
    },
    oracle = Some(
      """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        | AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 30 MINUTE""".stripMargin))

  /** #20e Automatic range-join optimization: the SAME attribution
    * query as q_range_join, but written as a PLAIN inequality join —
    * graft.plans.BinnedRangeJoinRule (installed via
    * SparkSessionExtensions) rewrites it into the binned equi-join at
    * optimization time. Runs on a cloned session so the opt-in
    * binWidth conf never leaks into sibling queries; the oracle is
    * identical to q_range_join's, so the rule's output is checked
    * bit-for-bit against DuckDB's plain inequality join.
    */
  val qRangeJoinAuto: QueryDef = QueryDef(
    run = (s0, dir) => {
      val windowUs = 30L * 60 * 1000 * 1000
      val s = s0.newSession()
      s.conf.set(graft.plans.BinnedRangeJoinRule.binWidthKey, windowUs.toString)
      val ev = t(s, dir, "events")
      val us = unix_micros(col("ts").cast("timestamp"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), us.as("click_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
          us.as("win_start"), (us + windowUs).as("win_end"))
      clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("click_us") >= col("win_start") && col("click_us") <= col("win_end"))
        .select(col("user_id"), col("purchase_id"), col("click_id"))
    },
    oracle = qRangeJoin.oracle)

  /** #41 Column profiling: one-pass stats over orders (row count,
    * nulls, exact distinct, min/max). Columns chosen so stringified
    * min/max render identically in both engines (no raw doubles).
    */
  protected val profileCols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate")
  val qProfile: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Profiler.profile(t(s, dir, "orders"), profileCols),
    oracle = Some(profileCols.map(c =>
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |  count(*) - count($c) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value
         |FROM orders""".stripMargin).mkString("\nUNION ALL\n")))

  /** #14f Tukey IQR outlier fences per event_type. Values go through
    * round(value·100) — integral cents — so quartile interpolation is
    * quarter-exact and the k·IQR fence dyadic-exact on both engines
    * (2-decimal money·100 never lands on .5, so the rounding-mode
    * divergence between engines can't bite).
    */
  val qOutlierFence: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Profiler.iqrOutliers(
        t(s, dir, "events").withColumn("cents", round(col("value") * 100)),
        "event_type", "cents"),
    oracle = Some(
      """WITH c AS (
        |  SELECT event_type, round(value * 100) AS cents FROM events
        |), q AS (
        |  SELECT event_type,
        |    quantile_cont(cents, 0.25) AS p25,
        |    quantile_cont(cents, 0.75) AS p75
        |  FROM c GROUP BY event_type
        |), f AS (
        |  SELECT *, p25 - 1.5 * (p75 - p25) AS fence_lo,
        |            p75 + 1.5 * (p75 - p25) AS fence_hi
        |  FROM q
        |)
        |SELECT c.event_type, f.p25, f.p75, f.fence_lo, f.fence_hi,
        |  CAST(sum(CASE WHEN c.cents < f.fence_lo OR c.cents > f.fence_hi
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  count(*) AS n_total
        |FROM c JOIN f USING (event_type)
        |GROUP BY c.event_type, f.p25, f.p75, f.fence_lo, f.fence_hi""".stripMargin))

  /** #14g Equi-width histogram per event_type over integral cents:
    * bin edges derived in pure integer arithmetic (width =
    * ceil(span/bins) as (span+bins-1) div bins), so both engines
    * compute identical sparse histograms.
    */
  val qHistogram: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Profiler.histogram(
        t(s, dir, "events").withColumn("cents", round(col("value") * 100)),
        "event_type", "cents", bins = 20),
    oracle = Some(
      """WITH c AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
        |), st AS (
        |  SELECT event_type, min(cents) AS vmin, max(cents) AS vmax
        |  FROM c GROUP BY event_type
        |), w AS (
        |  SELECT *, greatest(1, (vmax - vmin + 20) // 20) AS width FROM st
        |)
        |SELECT c.event_type,
        |  (c.cents - w.vmin) // w.width AS bin,
        |  w.vmin + ((c.cents - w.vmin) // w.width) * w.width AS bin_lo,
        |  w.vmin + ((c.cents - w.vmin) // w.width + 1) * w.width - 1 AS bin_hi,
        |  count(*) AS n
        |FROM c JOIN w USING (event_type)
        |GROUP BY 1, 2, 3, 4""".stripMargin))

  /** #42 Declarative data-quality gate: expectations over
    * orders/lineitem/customer; the discount range check is chosen to
    * FAIL so the violation path is exercised end-to-end.
    */
  val qQualityChecks: QueryDef = QueryDef(
    run = (s, dir) => {
      import graft.operators.QualityChecks._
      val ord = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
      run(Seq(
        notNull(ord, "o_custkey", "orders_custkey_not_null"),
        unique(ord, Seq("o_orderkey"), "orders_orderkey_unique"),
        acceptedValues(ord, "o_orderstatus", Seq("O", "F", "P"), "orders_status_domain"),
        inRange(li, "l_discount", 0.0, 0.05, "lineitem_discount_range"),
        referential(ord, "o_custkey", t(s, dir, "customer"), "c_custkey", "orders_customer_fk")))
    },
    oracle = Some(
      """WITH r AS (
        |  SELECT 'orders_custkey_not_null' AS "check", count(*) FILTER (o_custkey IS NULL) AS n_violations FROM orders
        |  UNION ALL
        |  SELECT 'orders_orderkey_unique', coalesce(sum(c) FILTER (c > 1), 0)
        |    FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY 1)
        |  UNION ALL
        |  SELECT 'orders_status_domain', count(*) FILTER (o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F','P')) FROM orders
        |  UNION ALL
        |  SELECT 'lineitem_discount_range', count(*) FILTER (l_discount < 0.0 OR l_discount > 0.05) FROM lineitem
        |  UNION ALL
        |  SELECT 'orders_customer_fk', (SELECT count(*) FROM orders o
        |    WHERE o.o_custkey IS NOT NULL
        |      AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |)
        |SELECT "check", CAST(n_violations AS BIGINT) AS n_violations,
        |       n_violations = 0 AS passed FROM r""".stripMargin))

  /** #43 Group-stable train/val/test split (user_id modulo 80/10/10);
    * per-split-and-type counts. The seeded-hash production variant is
    * spec-tested (no cross-engine hash to oracle against).
    */
  val qSplit: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Sampling.modSplit(t(s, dir, "events"), "user_id", 10,
        Seq("train" -> 8, "val" -> 1, "test" -> 1))
        .groupBy(col("split"), col("event_type"))
        .agg(count(lit(1)).as("n"), count_distinct(col("user_id")).as("n_users")),
    oracle = Some(
      """SELECT CASE WHEN user_id % 10 < 8 THEN 'train'
        |            WHEN user_id % 10 < 9 THEN 'val'
        |            ELSE 'test' END AS split,
        |       event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin))

  /** #22b Gap-based sessionization (native session_window): per-user
    * sessions with a 30-minute inactivity gap. Oracle is the classic
    * lag()/cumsum formulation — two different algorithms must agree.
    */
  val qSessionize: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Sessionize.sessions(t(s, dir, "events"), "user_id", "ts", "value"),
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
        |)
        |SELECT user_id,
        |  min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM n GROUP BY user_id, sess_seq""".stripMargin))

  /** #101 Materialized-view rewrite
    * ([[graft.plans.MaterializedViews]] + [[graft.plans.MvRewriteRule]]):
    * a (l_returnflag, l_linestatus) rollup of a lineitem slice is
    * defined ONCE; the report query — filter on one grouping key,
    * group by the other, six decomposable aggregates — is then
    * written against the BASE table and transparently rewritten by
    * the Catalyst rule to re-aggregate the |groups|-row view. The run
    * REQUIRES the optimized plan to scan the MV and not the base (a
    * silently-lapsed rewrite fails loudly rather than passing on the
    * base's identical answer); the oracle recomputes from first
    * principles on the raw table. Exactness: l_quantity is an
    * integral double (sums exactly in any order), so sum/avg through
    * the MV are bit-identical to the direct plan on both engines.
    */
  val qMvRewrite: QueryDef = QueryDef(
    run = (s, dir) => {
      val root = scratch("mv-rewrite")
      val basePath = root + "/base"
      val mvPath = root + "/mv"
      val outPath = root + "/out"
      t(s, dir, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(4)) === 0)
        .repartition(8)
        .write.mode("overwrite").parquet(basePath)
      graft.plans.MaterializedViews.define(
        s, basePath, Seq("l_returnflag", "l_linestatus"),
        Seq("l_quantity", "l_extendedprice"), mvPath)
      try {
        val report = s.read.parquet(basePath)
          .where(col("l_linestatus") === "F")
          .groupBy("l_returnflag")
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n_rows"),
            count(col("l_quantity")).as("n_qty"),
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"),
            avg(col("l_quantity")).as("avg_qty"))
        val leaves = report.queryExecution.executedPlan.collectLeaves()
          .map(_.treeString).mkString("\n")
        require(leaves.contains(mvPath) && !leaves.contains(basePath),
          s"q_mv_rewrite: the rewrite did not fire — plan leaves:\n$leaves")
        report.write.mode("overwrite").parquet(outPath)
      } finally graft.plans.MaterializedViews.deregister(basePath)
      s.read.parquet(outPath)
    },
    oracle = Some(
      """SELECT l_returnflag,
        |  sum(l_quantity) AS sum_qty,
        |  count(*) AS n_rows,
        |  count(l_quantity) AS n_qty,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price,
        |  avg(l_quantity) AS avg_qty
        |FROM lineitem
        |WHERE l_orderkey % 4 = 0 AND l_linestatus = 'F'
        |GROUP BY l_returnflag""".stripMargin))

  /** #101b Incremental MV maintenance
    * ([[graft.plans.MaterializedViews.refreshIncremental]]): the view
    * is defined over a base slice, a second slice APPENDS to the base
    * and folds into the view in O(batch + groups) — the base is never
    * rescanned; the new generation lands completely before the
    * registry repoints. The report query then runs against the base
    * through the rewrite (plan-locked in-run: MV scanned, base not)
    * and must equal the oracle's recompute over BOTH slices — a
    * fold that lost or double-counted a group hash-mismatches.
    */
  val qMvRefreshInc: QueryDef = QueryDef(
    run = (s, dir) => {
      val root = scratch("mv-refresh-inc")
      val basePath = root + "/base"
      val mvPath = root + "/mv"
      val outPath = root + "/out"
      val li = t(s, dir, "lineitem")
      val sliceA = li.filter(pmod(col("l_orderkey"), lit(4)) === 1)
      val sliceB = li.filter(pmod(col("l_orderkey"), lit(4)) === 2)
      sliceA.repartition(4).write.mode("overwrite").parquet(basePath)
      val d = graft.plans.MaterializedViews.define(
        s, basePath, Seq("l_returnflag", "l_linestatus"),
        Seq("l_quantity", "l_extendedprice"), mvPath)
      try {
        sliceB.repartition(4).write.mode("append").parquet(basePath)
        graft.plans.MaterializedViews.refreshIncremental(s, d, sliceB)
        val report = s.read.parquet(basePath)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n_rows"),
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"))
        val leaves = report.queryExecution.executedPlan.collectLeaves()
          .map(_.treeString).mkString("\n")
        require(leaves.contains(mvPath) && !leaves.contains(basePath),
          s"q_mv_refresh_inc: the rewrite did not fire — plan leaves:\n$leaves")
        report.write.mode("overwrite").parquet(outPath)
      } finally graft.plans.MaterializedViews.deregister(basePath)
      s.read.parquet(outPath)
    },
    oracle = Some(
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  count(*) AS n_rows,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem
        |WHERE l_orderkey % 4 IN (1, 2)
        |GROUP BY l_returnflag, l_linestatus""".stripMargin))

  /** #101c Retraction-capable MV maintenance
    * ([[graft.plans.MaterializedViews.refreshFromChanges]]): the base
    * takes a full CDC transition — deletes (which hit several groups'
    * stored price extremes), updates (quantity doubled, pre+post
    * images), and inserts — and the view folds the change feed:
    * sums/counts retract EXACTLY, and only the groups whose stored
    * MIN/MAX a retraction touched get a targeted semi-join recompute
    * (the production partial-recompute algorithm; never a full
    * rebuild). The report then runs through the rewrite (plan-locked
    * in-run) and must hash-match the oracle's recompute over the
    * post-transition state.
    */
  val qMvRefreshCdc: QueryDef = QueryDef(
    run = (s, dir) => {
      val root = scratch("mv-refresh-cdc")
      val basePath = root + "/base"
      val mvPath = root + "/mv"
      val outPath = root + "/out"
      val li = t(s, dir, "lineitem")
      val sliceA = li.filter(pmod(col("l_orderkey"), lit(4)) === 1)
      val sliceB = li.filter(pmod(col("l_orderkey"), lit(4)) === 2)
      sliceA.repartition(4).write.mode("overwrite").parquet(basePath)
      val d = graft.plans.MaterializedViews.define(
        s, basePath, Seq("l_returnflag", "l_linestatus"),
        Seq("l_quantity", "l_extendedprice"), mvPath)
      try {
        val next = sliceA.filter(col("l_linenumber") < 6)
          .withColumn("l_quantity",
            when(pmod(col("l_orderkey"), lit(10)) === 3, col("l_quantity") * 2)
              .otherwise(col("l_quantity")))
          .unionByName(sliceB)
        val feed = graft.operators.SnapshotDiff.changeFeed(
          sliceA, next, keys = Seq("l_orderkey", "l_linenumber"))
        next.repartition(4).write.mode("overwrite").parquet(basePath)
        graft.plans.MaterializedViews.refreshFromChanges(s, d, feed)
        val report = s.read.parquet(basePath)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n_rows"),
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"))
        val leaves = report.queryExecution.executedPlan.collectLeaves()
          .map(_.treeString).mkString("\n")
        require(leaves.contains(mvPath) && !leaves.contains(basePath),
          s"q_mv_refresh_cdc: the rewrite did not fire — plan leaves:\n$leaves")
        report.write.mode("overwrite").parquet(outPath)
      } finally graft.plans.MaterializedViews.deregister(basePath)
      s.read.parquet(outPath)
    },
    oracle = Some(
      """WITH nextt AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CASE WHEN l_orderkey % 10 = 3 THEN l_quantity * 2 ELSE l_quantity END AS q,
        |    l_extendedprice AS p
        |  FROM lineitem
        |  WHERE l_orderkey % 4 = 1 AND l_linenumber < 6
        |  UNION ALL
        |  SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice
        |  FROM lineitem WHERE l_orderkey % 4 = 2
        |)
        |SELECT l_returnflag, l_linestatus,
        |  sum(q) AS sum_qty,
        |  count(*) AS n_rows,
        |  min(p) AS min_price,
        |  max(p) AS max_price
        |FROM nextt
        |GROUP BY l_returnflag, l_linestatus""".stripMargin))

  /** #101d Aggregate-over-JOIN materialized view
    * ([[graft.plans.MaterializedViews.defineJoin]] +
    * [[graft.plans.MvRewriteRule]]): the reference's FLAGSHIP report
    * shape — orders ⋈ customers with a priority filter, re-aggregated
    * on every scheduled run (template.py:485-490) — served from a
    * maintained join view. The view is defined over an orders slice ⋈
    * customer, a second fact slice APPENDS and folds through the
    * dimension join in O(|batch| ⋈ dim + |groups|), and the report —
    * written against the BASE tables as a plain join+aggregate — is
    * rewritten by the Catalyst rule so that BOTH base scans AND the
    * join vanish from the plan (plan-locked in-run; a lapsed rewrite
    * fails loudly). Money sums ride an exact DECIMAL(18,2) column so
    * the two-stage re-aggregation is bit-identical to DuckDB's direct
    * recompute over both slices.
    */
  val qMvJoinRewrite: QueryDef = QueryDef(
    run = (s, dir) => {
      val root = scratch("mv-join-rewrite")
      val ordersPath = root + "/orders"
      val custPath = root + "/customer"
      val mvPath = root + "/mv"
      val outPath = root + "/out"
      val o = t(s, dir, "orders")
        .withColumn("o_total_dec", col("o_totalprice").cast("decimal(18,2)"))
      val sliceA = o.filter(pmod(col("o_orderkey"), lit(4)) === 0)
      val sliceB = o.filter(pmod(col("o_orderkey"), lit(4)) === 1)
      sliceA.repartition(4).write.mode("overwrite").parquet(ordersPath)
      t(s, dir, "customer").write.mode("overwrite").parquet(custPath)
      val d0 = graft.plans.MaterializedViews.defineJoin(
        s, ordersPath, custPath, joinKeys = Seq(("o_custkey", "c_custkey")),
        groupCols = Seq("c_mktsegment", "o_orderpriority"),
        aggCols = Seq("o_total_dec"), mvPath = mvPath)
      try {
        sliceB.repartition(4).write.mode("append").parquet(ordersPath)
        graft.plans.MaterializedViews.refreshJoinIncremental(s, d0, sliceB)
        val f = s.read.parquet(ordersPath)
        val c = s.read.parquet(custPath)
        val report = f.join(c, f("o_custkey") === c("c_custkey"))
          .where(col("o_orderpriority") === "1-URGENT")
          .groupBy("c_mktsegment")
          .agg(
            sum(col("o_total_dec")).as("sum_total_dec"),
            count(lit(1)).as("n_orders"),
            min(col("o_total_dec")).as("min_dec"),
            max(col("o_total_dec")).as("max_dec"))
          .select(col("c_mktsegment"),
            col("sum_total_dec").cast("double").as("sum_total"),
            col("n_orders"),
            col("min_dec").cast("double").as("min_total"),
            col("max_dec").cast("double").as("max_total"))
        val leaves = report.queryExecution.executedPlan.collectLeaves()
          .map(_.treeString).mkString("\n")
        require(leaves.contains(mvPath) && !leaves.contains(ordersPath) &&
          !leaves.contains(custPath),
          s"q_mv_join_rewrite: the join-view rewrite did not fire — plan leaves:\n$leaves")
        report.write.mode("overwrite").parquet(outPath)
      } finally graft.plans.MaterializedViews.deregisterJoin(ordersPath, custPath)
      s.read.parquet(outPath)
    },
    oracle = Some(
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
        |  count(*) AS n_orders,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_total,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey % 4 IN (0, 1) AND o_orderpriority = '1-URGENT'
        |GROUP BY c_mktsegment""".stripMargin))

}
