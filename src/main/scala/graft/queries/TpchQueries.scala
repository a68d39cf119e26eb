package graft

import graft.pipeline._
import graft.sources.{IncrementalReader, TableLoader, UpsertWriter}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-completion slice of the query catalog (the remaining classic plan shapes) — one trait of the linear
  * [[Queries]] stack; see Queries.scala for the registry and the
  * catalog-wide numeric policy.
  */
trait TpchQueries extends EventQueries {

  // ---------------------------------------------------------------
  // TPC-H completion — the remaining query shapes, adapted to the
  // driver schema (no partsupp / l_shipmode / l_commitdate / c_phone:
  // each query keeps the original's PLAN shape — the joins, the
  // correlation, the subquery structure — and swaps in available
  // columns). With these, 20 of the 22 TPC-H shapes run through the
  // SQL transform surface (Q11/Q20 need partsupp.availqty, which the
  // schema has no analogue for).
  // ---------------------------------------------------------------

  /** #64 Forecasting-revenue change (TPC-H Q6): single-scan predicate
    * revenue — every filter is a pushed parquet predicate, no join,
    * one partial-aggregated scalar. The 100 TB plan is "read only the
    * row groups whose zone maps overlap 1996".
    */
  val q6Forecast: QueryDef = QueryDef(
    run = (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(18,2)")).cast("decimal(28,6)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines")),
    oracle = Some(
      """SELECT
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin))

  /** #65 Minimum-cost supplier (TPC-H Q2 shape): for each qualifying
    * part, the ASIA-region offers at the per-part minimum price — the
    * correlated-min filter runs as ONE window over the filtered join
    * (no self-join against the aggregate), dims broadcast.
    */
  val q2MinCost: QueryDef = QueryDef(
    run = (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val parts = broadcast(t(s, dir, "part")
        .filter(col("p_type") === "STANDARD" && col("p_size") <= 10)
        .select(col("p_partkey"), col("p_name")))
      val supp = broadcast(t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select(col("s_suppkey"), col("s_name"), col("n_name")))
      t(s, dir, "lineitem")
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
          col("l_extendedprice"))
        .withColumn("mn", min(col("l_extendedprice")).over(Window.partitionBy(col("p_partkey"))))
        .filter(col("l_extendedprice") === col("mn"))
        .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
          col("l_extendedprice").as("offer_price"))
        .distinct()
    },
    oracle = Some(
      """WITH offers AS (
        |  SELECT p_partkey, p_name, s_name, n_name, l_extendedprice,
        |    min(l_extendedprice) OVER (PARTITION BY p_partkey) AS mn
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE p_type = 'STANDARD' AND p_size <= 10 AND r_name = 'ASIA'
        |)
        |SELECT DISTINCT p_partkey, p_name, s_name, n_name,
        |  l_extendedprice AS offer_price
        |FROM offers WHERE l_extendedprice = mn""".stripMargin))

  /** #66 National market share (TPC-H Q8 shape): NATION_5's share of
    * ASIA-customer PROMO-part revenue per year — nation joined in two
    * roles, conditional/total revenue as exact decimal sums, the
    * share a deterministic double division of the two.
    */
  val q8Share: QueryDef = QueryDef(
    run = (s, dir) => {
      val rev = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("decimal(28,6)")
      val custNation = broadcast(t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select(col("n_nationkey").as("cnk")))
      val suppNation = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation")))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_type") === "PROMO")
          .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(custNation, col("c_nationkey") === col("cnk"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(suppNation, col("s_nationkey") === col("snk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_5", rev)
            .otherwise(lit(0).cast("decimal(28,6)"))).cast("double").as("nation_rev"),
          sum(rev).cast("double").as("total_rev"))
        .withColumn("mkt_share", col("nation_rev") / col("total_rev"))
    },
    oracle = Some(
      """WITH j AS (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)) AS rev,
        |    sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        |)
        |SELECT o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) AS nation_rev,
        |  CAST(sum(rev) AS DOUBLE) AS total_rev,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
        |    / CAST(sum(rev) AS DOUBLE) AS mkt_share
        |FROM j GROUP BY o_year""".stripMargin))

  /** #67 Profit by nation and year (TPC-H Q9 shape): profit =
    * line revenue − part cost (p_retailprice × quantity standing in
    * for ps_supplycost), grouped by supplier nation × order year —
    * all money math in exact decimal, cast to double once at the end.
    */
  val q9Profit: QueryDef = QueryDef(
    run = (s, dir) => {
      val amount = ((col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("decimal(28,6)") -
        (col("p_retailprice").cast("decimal(18,2)") *
          col("l_quantity").cast("decimal(18,2)")).cast("decimal(28,6)"))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(amount).cast("double").as("sum_profit"), count(lit(1)).as("n_lines"))
    },
    oracle = Some(
      """SELECT n_name AS nation,
        |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))
        |    - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,6))
        |  ) AS DOUBLE) AS sum_profit,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)""".stripMargin))

  /** #79 Important part values (TPC-H Q11 shape; lineitem revenue
    * standing in for partsupp supplycost·availqty): per-part revenue
    * from NATION_7 suppliers, kept when above 1/1000 of that
    * filtered total. The share gate is the cross-multiplied exact
    * compare (value·1000 > total in decimal — no float fraction), and
    * the one-row global total broadcasts.
    */
  val q11Important: QueryDef = QueryDef(
    run = (s, dir) => {
      val flt = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("l_partkey"), col("l_extendedprice").cast("decimal(28,6)").as("v"))
      val per = flt.groupBy(col("l_partkey")).agg(sum(col("v")).as("value"))
      val tot = flt.agg(sum(col("v")).as("t"))
      per.join(broadcast(tot))
        .filter(col("value") * 1000 > col("t"))
        .select(col("l_partkey"), col("value").cast("double").as("value"))
    },
    oracle = Some(
      """WITH flt AS (
        |  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(28,6)) AS v
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_7'
        |), per AS (
        |  SELECT l_partkey, sum(v) AS value FROM flt GROUP BY l_partkey
        |), tot AS (SELECT sum(v) AS t FROM flt)
        |SELECT l_partkey, CAST(value AS DOUBLE) AS value
        |FROM per, tot WHERE value * 1000 > t""".stripMargin))

  /** #80 Dominant-supplier candidates (TPC-H Q20 shape; "shipped more
    * than half a part's 1996 volume" standing in for the partsupp
    * availqty > half-demand rule): per-(part, supplier) quantity vs
    * per-part total in 1996, EXISTS-style semi join down to NATION_3
    * suppliers. The half gate is again cross-multiplied (2·sq > tq).
    */
  val q20Dominant: QueryDef = QueryDef(
    run = (s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("decimal(28,6)").as("q"))
      val perSup = li.groupBy(col("l_partkey"), col("l_suppkey")).agg(sum(col("q")).as("sq"))
      val perPart = li.groupBy(col("l_partkey")).agg(sum(col("q")).as("tq"))
      val dominant = perSup.join(perPart, "l_partkey")
        .filter(col("sq") * 2 > col("tq"))
        .select(col("l_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .join(dominant, col("s_suppkey") === dominant("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
    },
    oracle = Some(
      """WITH li AS (
        |  SELECT l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(28,6)) AS q
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |), per_sup AS (
        |  SELECT l_partkey, l_suppkey, sum(q) AS sq FROM li GROUP BY 1, 2
        |), per_part AS (
        |  SELECT l_partkey, sum(q) AS tq FROM li GROUP BY 1
        |)
        |SELECT s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3'
        |  AND EXISTS (
        |    SELECT 1 FROM per_sup ps JOIN per_part pp USING (l_partkey)
        |    WHERE ps.l_suppkey = s_suppkey AND ps.sq * 2 > pp.tq)""".stripMargin))

  /** #68 Late-shipment priority counts (TPC-H Q12 shape, l_linestatus
    * standing in for l_shipmode, orderdate+30 for the commit/receipt
    * lateness): one fact join, conditional counts per class.
    */
  val q12Late: QueryDef = QueryDef(
    run = (s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(o, li("l_orderkey") === o("o_orderkey") &&
          li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("low_line_count"))
    },
    oracle = Some(
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY l_linestatus""".stripMargin))

  /** #69 Customer order-count distribution (TPC-H Q13): LEFT join
    * with the filter in the JOIN CONDITION (not WHERE — zero-order
    * customers must survive), then a two-level aggregation.
    */
  val q13Custdist: QueryDef = QueryDef(
    run = (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey"))
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },
    oracle = Some(
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |) GROUP BY c_count""".stripMargin))

  /** #70 Top supplier (TPC-H Q15): quarterly revenue per supplier,
    * keep those AT the maximum — the max comparison stays in exact
    * decimal (a double round-trip could merge near-ties), and the
    * 1-row max broadcast-joins back rather than re-aggregating.
    */
  val q15TopSupplier: QueryDef = QueryDef(
    run = (s, dir) => {
      val rev = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("decimal(28,6)")
      val r = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(rev).as("total_rev"))
      val mx = r.agg(max(col("total_rev")).as("mx"))
      r.join(broadcast(mx), col("total_rev") === col("mx"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev").cast("double").as("total_rev"))
    },
    oracle = Some(
      """WITH r AS (
        |  SELECT l_suppkey,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey
        |)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM r)""".stripMargin))

  /** #71 Supplier variety per part class (TPC-H Q16 shape, lineitem
    * standing in for partsupp): distinct-supplier counts per
    * (brand, type, size), suppliers with negative balance excluded
    * via broadcast ANTI join (the NOT IN, null-free by schema).
    */
  val q16Variety: QueryDef = QueryDef(
    run = (s, dir) => {
      val bad = broadcast(t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey")))
      t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
        .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#3" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 5, 9, 14, 19, 23))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },
    oracle = Some(
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 9, 14, 19, 23)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin))

  /** #72 Small-quantity-order revenue (TPC-H Q17): lines below 20% of
    * their part's average quantity — the correlated per-part average
    * is ONE window over the brand-filtered join (brand is a part
    * attribute, so filtering first loses no rows of the correlation
    * domain), never a re-scan subquery.
    */
  val q17SmallQty: QueryDef = QueryDef(
    run = (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_brand") === "Brand#5")
          .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
        .withColumn("avg_qty", avg(col("l_quantity")).over(Window.partitionBy(col("p_partkey"))))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(
          (sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0)
            .as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    },
    oracle = Some(
      """WITH j AS (
        |  SELECT l_quantity, l_extendedprice,
        |    avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#5'
        |)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  count(*) AS n_lines
        |FROM j WHERE l_quantity < 0.2 * avg_qty""".stripMargin))

  /** #73 Discounted revenue, disjunctive bands (TPC-H Q19): three
    * OR'd (brand × size × quantity) predicate bands over one join —
    * the disjunction must NOT break predicate pushdown of the shared
    * quantity bounds.
    */
  val q19Bands: QueryDef = QueryDef(
    run = (s, dir) => {
      val rev = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("decimal(28,6)")
      val band1 = col("p_brand") === "Brand#2" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)
      val band2 = col("p_brand") === "Brand#11" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)
      val band3 = col("p_brand") === "Brand#17" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30)
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .filter(band1 || band2 || band3)
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_lines"))
    },
    oracle = Some(
      """SELECT
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin))

  /** #74 Suppliers who kept orders waiting (TPC-H Q21 shape,
    * shipdate > orderdate+45 standing in for receipt-after-commit):
    * the classic EXISTS (another supplier on the order) + NOT EXISTS
    * (another LATE supplier) pair — a semi join then an anti join on
    * the same late-line set, dims broadcast, top 20 with total order.
    */
  val q21Waiting: QueryDef = QueryDef(
    run = (s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val late = t(s, dir, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 45 DAYS"))
        .select(col("l_orderkey"), col("l_suppkey"))
      val others = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val lateOthers = late.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
      late
        .join(others, col("k2") === col("l_orderkey") && col("s2") =!= col("l_suppkey"),
          "left_semi")
        .join(lateOthers, col("k3") === col("l_orderkey") && col("s3") =!= col("l_suppkey"),
          "left_anti")
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },
    oracle = Some(
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 45 DAY
        |)
        |SELECT s_name, count(*) AS numwait
        |FROM late l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin))

  /** #75 Idle high-balance customers (TPC-H Q22 shape, mktsegment
    * standing in for the phone country code, "no orders since 2000"
    * for the original's 7-year dormancy): global positive-balance
    * average as a broadcast 1-row scalar (sum/count in exact decimal,
    * ONE deterministic double division), then a broadcast anti join
    * against the recent-orders key set.
    */
  val q22Idle: QueryDef = QueryDef(
    run = (s, dir) => {
      val c = t(s, dir, "customer")
      val cutoff = c.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("cutoff"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      c.join(broadcast(cutoff))
        .filter(col("c_acctbal") > col("cutoff"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("totacctbal"))
    },
    oracle = Some(
      """SELECT c_mktsegment, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment""".stripMargin))

  /** #10n INSERT_OVERWRITE operation (Hudi insert_overwrite /
    * Spark `INSERT OVERWRITE ... PARTITION`): the 'click' partition
    * replaced wholesale with a recomputed batch (values re-scored,
    * keys re-minted), every other partition byte-identical — one new
    * committed version, time travel keeps the pre-overwrite snapshot.
    */
  val qInsertOverwrite: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("insert-overwrite")
      val base = t(s, dir, "events")
      UpsertWriter.upsert(base, target, Seq("event_id"), "ts")
      val replacement = base.filter(col("event_type") === "click")
        .withColumn("value", col("value") * 10)
        .withColumn("event_id", col("event_id") + 40000000L)
      UpsertWriter.insertOverwrite(s, target, replacement, Seq("event_type"))
      UpsertWriter.read(s, target)
    },
    oracle = Some(
      """SELECT * FROM events WHERE event_type <> 'click'
        |UNION ALL
        |SELECT event_id + 40000000, ts, user_id, event_type, value * 10, props
        |FROM events WHERE event_type = 'click'""".stripMargin))

  /** #10o Partial-column update (Hudi partial-update payload / MERGE
    * UPDATE SET): the patch carries only (event_id, value) — matched
    * rows take the tripled value, every OTHER column and every
    * unmatched row must come through untouched.
    */
  val qPartialUpdate: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("partial-update")
      val base = t(s, dir, "events")
      UpsertWriter.upsert(base, target, Seq("event_id"), "ts")
      val patchBatch = base.filter(col("event_type") === "purchase")
        .select(col("event_id"), (col("value") * 3).as("value"))
      UpsertWriter.patch(s, target, patchBatch, Seq("event_id"))
      UpsertWriter.read(s, target)
    },
    oracle = Some(
      """SELECT e.event_id, e.ts, e.user_id, e.event_type,
        |  CASE WHEN p.event_id IS NOT NULL THEN p.value ELSE e.value END AS value,
        |  e.props
        |FROM events e
        |LEFT JOIN (
        |  SELECT event_id, value * 3 AS value
        |  FROM events WHERE event_type = 'purchase') p
        |ON e.event_id = p.event_id""".stripMargin))

  /** #22l Streaming CDC apply: the change feed between two table
    * versions (updates with pre/post images, deletes, inserts) streams
    * file-by-file into a mirror that starts at the OLD version — the
    * mirror must converge to the new version exactly, regardless of
    * how micro-batch boundaries slice the feed. The consumer half of
    * #10i's change-data-feed producer.
    */
  val qStreamCdc: QueryDef = QueryDef(
    run = (s, dir) => {
      val feedDir = scratch("stream-cdc-feed")
      val mirror = scratch("stream-cdc-mirror")
      val v1 = t(s, dir, "events")
      val v2 = v1.filter(col("event_type") =!= "view")
        .unionByName(v1.filter(col("event_type") === "click")
          .withColumn("event_id", col("event_id") + 30000000L))
      val v2Updated = v2.withColumn("value",
        when(col("event_type") === "purchase", col("value") * 2).otherwise(col("value")))
      graft.operators.SnapshotDiff.changeFeed(v1, v2Updated, Seq("event_id"))
        .repartition(4).write.mode("overwrite").parquet(feedDir)
      UpsertWriter.upsert(v1, mirror, Seq("event_id"), "ts")
      graft.streaming.TableStream.runCdcApplyToBatch(
        s, feedDir, mirror, Seq("event_id"), "ts",
        queryName = "graft_stream_cdc_" +
          java.util.UUID.randomUUID().toString.replace("-", ""))
    },
    oracle = Some(
      """SELECT event_id, ts, user_id, event_type,
        |  CASE WHEN event_type = 'purchase' THEN value * 2 ELSE value END AS value,
        |  props
        |FROM events WHERE event_type <> 'view'
        |UNION ALL
        |SELECT event_id + 30000000, ts, user_id, event_type, value, props
        |FROM events WHERE event_type = 'click'""".stripMargin))

  /** #14m Distribution drift gate: per-event-type proportion shift
    * between the first and second half of January, in exact
    * cross-multiplied basis points (Profiler.proportionDrift) — the
    * screening check a scheduled report pipeline runs before trusting
    * a new period's data.
    */
  val driftCut = "2024-01-16 00:00:00"
  val qDrift: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Profiler.proportionDrift(
      t(s, dir, "events"), "event_type",
      col("ts") < lit(driftCut).cast("timestamp")),
    oracle = Some(
      s"""WITH b AS (
        |  SELECT event_type,
        |    sum(CASE WHEN ts < TIMESTAMP '$driftCut' THEN 1 ELSE 0 END) AS n_old,
        |    sum(CASE WHEN ts < TIMESTAMP '$driftCut' THEN 0 ELSE 1 END) AS n_new
        |  FROM events GROUP BY event_type
        |), t AS (
        |  SELECT sum(n_old) AS t_old, sum(n_new) AS t_new FROM b
        |)
        |SELECT event_type, CAST(n_old AS BIGINT) AS n_old,
        |  CAST(n_new AS BIGINT) AS n_new,
        |  CASE WHEN t_old = 0 OR t_new = 0 THEN CAST(10000 AS BIGINT)
        |       ELSE CAST(abs(CAST(n_old AS HUGEINT) * t_new - CAST(n_new AS HUGEINT) * t_old) * 10000
        |                 // (CAST(t_old AS HUGEINT) * t_new) AS BIGINT)
        |  END AS drift_bp
        |FROM b, t""".stripMargin))

  /** #76 k-NN classification via exact cosine top-10 + majority vote
    * (deterministic tiebreak: votes desc, then smallest label) — the
    * label-propagation / weak-labeling step of a curation pipeline,
    * composed from the ANN kernel and one window over the tiny vote
    * table.
    */
  val qSimKnnClassify: QueryDef = QueryDef(
    run = (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.knnClassify(emb, emb.filter(col("vec_id") < 50), k = 10)
    },
    oracle = Some(
      s"""WITH e AS (
         |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cid, c.label AS label,
         |         c.v AS va, q.v AS vb
         |  FROM e c, e q WHERE q.vec_id < 50 AND c.vec_id != q.vec_id
         |), r AS (
         |  SELECT query_id, cid, label,
         |         row_number() OVER (PARTITION BY query_id ORDER BY $cosSql DESC, cid) AS rk
         |  FROM scored
         |), v AS (
         |  SELECT query_id, label, count(*) AS votes FROM r WHERE rk <= 10
         |  GROUP BY query_id, label
         |), w AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS wrk
         |  FROM v
         |)
         |SELECT query_id, label AS pred_label, votes FROM w WHERE wrk = 1""".stripMargin))

  /** #63b PQ + exact re-rank: compressed-domain candidates (4·k per
    * query), full vectors fetched only for those, exact cosine
    * ordering on top — rows-only (PQ codebooks are k-means trained;
    * the recall-vs-brute spec is the quality contract).
    */
  val qSimPqRerank: QueryDef = QueryDef(
    run = (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.pqRerankTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
    },
    oracle = Some(OracleSql.pqTopkSql(k = 5, rerank = true)))

  /** #77 Unigram inverse-frequency surprisal (LM-perplexity proxy in
    * exact integer arithmetic): per-token decimal magnitude of
    * total/tf, per-doc fixed-point mean — see TextAnalysis.surprisal.
    */
  val qTextSurprisal: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.TextAnalysis.surprisal(t(s, dir, "documents")),
    oracle = Some(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tf AS (
        |  SELECT term, count(*) AS tf FROM tok GROUP BY term
        |), t AS (
        |  SELECT sum(tf) AS total FROM tf
        |), b AS (
        |  SELECT doc_id, CAST(length(CAST(total // tf AS VARCHAR)) - 1 AS BIGINT) AS bucket
        |  FROM tok JOIN tf USING (term), t
        |)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(bucket) AS BIGINT) AS sum_bucket,
        |  CAST(sum(bucket) * 10000 // count(*) AS BIGINT) AS surprisal_x10000
        |FROM b GROUP BY doc_id""".stripMargin))

  /** #83 CCNet-style LM perplexity filter: a Laplace-smoothed bigram
    * LM trained on the deterministic "clean reference" subset
    * (doc_id % 5 = 0) scores every document; terciles split the
    * corpus into head/middle/tail. Surprisal is the integer
    * digit-bucket reduction (see TextAnalysis.perplexityBuckets), the
    * tercile cutoffs are cross-multiplied cumulative-histogram mins —
    * the WHOLE filter incl. bucket labels is exact cross-engine.
    */
  val qTextPerplexity: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.TextAnalysis.perplexityBuckets(
        docs, docs.filter(col("doc_id") % 5 === 0))
    },
    oracle = Some(perplexityOracleSql))

  /** #83b Incremental LM maintenance for the perplexity filter: the
    * reference corpus arrives in two batches whose unigram/bigram
    * counts fold into replay-safe IncrementalAgg state (one batch
    * redelivered inline — recognized, skipped), and scoring runs
    * against the state-read LM. Same oracle as `text_perplexity`:
    * the incrementally-maintained LM must be count-identical to the
    * rebuilt one, or the scores (and the hash) diverge.
    */
  val qTextPerplexityInc: QueryDef = QueryDef(
    run = (s, dir) => {
      import graft.operators.{IncrementalAgg, TextAnalysis}
      val uniState = scratch("ppl-lm-uni")
      val biState = scratch("ppl-lm-bi")
      val docs = t(s, dir, "documents")
      val ref = docs.filter(col("doc_id") % 5 === 0)
      def one(d: org.apache.spark.sql.DataFrame) = d.withColumn("one", lit(1))
      Seq(ref.filter(col("doc_id") % 2 === 0) -> 1L,
          ref.filter(col("doc_id") % 2 === 1) -> 2L,
          // crash-redelivery of batch 2: a double-counted LM fails the hash
          ref.filter(col("doc_id") % 2 === 1) -> 2L)
        .foreach { case (b, id) =>
          IncrementalAgg.refreshTable(s, uniState,
            one(TextAnalysis.tokenRows(b)), Seq("t"), "one", batchId = Some(id))
          IncrementalAgg.refreshTable(s, biState,
            one(TextAnalysis.bigramOccurrences(b)), Seq("a", "b"), "one", batchId = Some(id))
        }
      val uni = IncrementalAgg.read(s, uniState, Seq("t"))
        .select(col("t"), col("n").as("c1"))
      val bi = IncrementalAgg.read(s, biState, Seq("a", "b"))
        .select(col("a"), col("b"), col("n").as("c12"))
      TextAnalysis.perplexityBucketsWithLm(docs, uni, bi)
    },
    oracle = Some(perplexityOracleSql))

  /** #35c Gold-curation pipeline, exactly oracled END TO END: Gopher
    * structural gates ∧ LM-perplexity tail drop (tercile cutoffs
    * computed over the whole corpus) → exact dedup among survivors
    * (min doc_id per text) → per-domain quota (10 best by n_chars).
    * Every stage is one of the already-oracled operators; this row
    * proves the COMPOSITION is still bit-exact — filters, histogram
    * cutoffs, dedup tiebreaks and domain ranks all have to agree at
    * once for the hash to match.
    */
  val qCurateGold: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      val gopher = graft.operators.TextAnalysis.gopherRules(docs)
        .filter(col("gopher_pass")).select(col("doc_id"), col("n_words"))
      val ppl = graft.operators.TextAnalysis.perplexityBuckets(
          docs, docs.filter(col("doc_id") % 5 === 0))
        .filter(col("ppl_bucket") =!= "tail")
        .select(col("doc_id"), col("surprisal_x10000"), col("ppl_bucket"))
      val survivors = gopher.join(ppl, "doc_id")
        .join(docs.select(col("doc_id"), col("text"), col("n_chars"), docUrl.as("url")), "doc_id")
      val deduped = graft.operators.Dedup.exact(survivors, "text", "doc_id")
      graft.operators.WebCuration.domainCap(
          graft.operators.WebCuration.parseUrls(deduped), k = 10, orderCol = "n_chars")
        .select(col("doc_id"), col("domain"), col("n_words"), col("n_chars"),
          col("surprisal_x10000"), col("ppl_bucket"), col("domain_rank"))
    },
    oracle = Some {
      val ppl = perplexityOracleSql
      // reuse the perplexity derivation as a prefix: swap its final
      // SELECT for a labeled CTE and compose the rest of the pipeline
      val prefix = ppl.substring(0, ppl.lastIndexOf("SELECT doc_id, n_bigrams"))
      prefix +
        """, lab AS (
          |  SELECT doc_id, surprisal_x10000,
          |    CASE WHEN surprisal_x10000 <= cut1 THEN 'head'
          |         WHEN surprisal_x10000 <= cut2 THEN 'middle'
          |         ELSE 'tail' END AS ppl_bucket
          |  FROM scored CROSS JOIN cuts
          |), gm AS (
          |  SELECT doc_id, len(w) AS n_words,
          |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
          |    len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS alpha_words,
          |    len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
          |        'that', 'it', 'was', 'for'))) AS stop_hits
          |  FROM tok
          |), gp AS (
          |  SELECT doc_id, n_words FROM gm
          |  WHERE n_words >= 50 AND n_words <= 100000
          |    AND word_chars >= 3 * n_words AND word_chars <= 10 * n_words
          |    AND alpha_words * 10 >= n_words * 8
          |    AND stop_hits >= 2
          |), surv AS (
          |  SELECT d.doc_id, d.text, d.n_chars, gp.n_words,
          |         lab.surprisal_x10000, lab.ppl_bucket,
          |         regexp_extract('www.' || d.source || '-mirror.org', '([^.]+\.[^.]+)$', 1) AS domain
          |  FROM documents d JOIN gp USING (doc_id) JOIN lab USING (doc_id)
          |  WHERE lab.ppl_bucket <> 'tail'
          |), ded AS (
          |  SELECT * FROM (
          |    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM surv
          |  ) WHERE rn = 1
          |)
          |SELECT doc_id, domain, n_words, n_chars, surprisal_x10000, ppl_bucket, domain_rank
          |FROM (
          |  SELECT *, row_number() OVER (PARTITION BY domain
          |    ORDER BY n_chars DESC, doc_id) AS domain_rank
          |  FROM ded
          |) WHERE domain_rank <= 10""".stripMargin
    })

  protected def perplexityOracleSql: String =
    """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), uni AS (
        |  SELECT t, count(*) AS c1 FROM (
        |    SELECT unnest(w) AS t FROM tok WHERE doc_id % 5 = 0
        |  ) GROUP BY t
        |), v AS (
        |  SELECT count(*) AS nv FROM uni
        |), bi AS (
        |  SELECT a, b, count(*) AS c12 FROM (
        |    SELECT unnest(w[1:len(w)-1]) AS a, unnest(w[2:len(w)]) AS b
        |    FROM tok WHERE doc_id % 5 = 0
        |  ) GROUP BY a, b
        |), tgt AS (
        |  SELECT doc_id, unnest(w[1:len(w)-1]) AS a, unnest(w[2:len(w)]) AS b FROM tok
        |), pd AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    sum(length(CAST((coalesce(c1, 0) + nv) // (coalesce(c12, 0) + 1) AS VARCHAR)) - 1) AS sum_bucket
        |  FROM tgt LEFT JOIN bi USING (a, b) LEFT JOIN uni ON tgt.a = uni.t CROSS JOIN v
        |  GROUP BY doc_id
        |), scored AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |    CAST(coalesce(sum_bucket * 10000 // n_bigrams, 0) AS BIGINT) AS surprisal_x10000
        |  FROM documents d LEFT JOIN pd USING (doc_id)
        |), cum AS (
        |  SELECT s, sum(c) OVER (ORDER BY s) AS cum FROM (
        |    SELECT surprisal_x10000 AS s, count(*) AS c FROM scored GROUP BY 1
        |  )
        |), cuts AS (
        |  SELECT min(CASE WHEN cum * 3 >= n THEN s END) AS cut1,
        |         min(CASE WHEN cum * 3 >= 2 * n THEN s END) AS cut2
        |  FROM cum CROSS JOIN (SELECT max(cum) AS n FROM cum)
        |)
        |SELECT doc_id, n_bigrams, surprisal_x10000,
        |  CASE WHEN surprisal_x10000 <= cut1 THEN 'head'
        |       WHEN surprisal_x10000 <= cut2 THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket
        |FROM scored CROSS JOIN cuts""".stripMargin

  /** #29d Incremental IVF index maintenance: the base index is built
    * on the first two thirds of the corpus (quantizer frozen there),
    * the last third arrives as two replay-safe appends — one of them
    * redelivered inline, recognized by the commit-riding batch id and
    * skipped. FULLY ORACLED: the quantizer re-trains in SQL on the
    * base-only sample and the whole corpus re-routes through it —
    * exactly what an incrementally-grown index must contain, so the
    * gate now proves the incremental-equals-rebuild identity the
    * spec asserts.
    */
  val qSimIvfIncTopk: QueryDef = QueryDef(
    run = (s, dir) => {
      val idx = scratch("ivf-inc-index")
      val emb = t(s, dir, "embeddings")
      val base = emb.filter(col("vec_id") % 3 =!= 2)
      val b1 = emb.filter(col("vec_id") % 3 === 2 && col("vec_id") % 2 === 0)
      val b2 = emb.filter(col("vec_id") % 3 === 2 && col("vec_id") % 2 === 1)
      graft.operators.Similarity.buildIvfIndex(base, idx, nlist = 16, trainOn = Some(base))
      graft.operators.Similarity.ivfIndexAppend(s, idx, b1, batchId = Some(1L))
      graft.operators.Similarity.ivfIndexAppend(s, idx, b2, batchId = Some(2L))
      // crash-redelivery: replayed batch id is a recognized no-op
      graft.operators.Similarity.ivfIndexAppend(s, idx, b2, batchId = Some(2L))
      graft.operators.Similarity.ivfIndexTopK(s, idx, emb.filter(col("vec_id") < 10),
        k = 5, nprobe = 2)
    },
    oracle = Some(OracleSql.ivfTopkSql(trainWhere = Some("vec_id % 3 <> 2"))))

  /** #78 Deterministic mixture resampling: per-source epoch weights
    * (src0×2.5, src1×0.25, src2×1.75, src3 dropped, rest ×1.0)
    * realized as floor(w) copies + a multiplicative-hash extra — the
    * training-data mixing step, byte-identical on every engine (the
    * SAMPLE/epoch SET is oracled, not just its size).
    */
  val qMixture: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Sampling.mixtureResample(
        t(s, dir, "documents"), "source", "doc_id",
        Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 1.75, "src3" -> 0.0))
      .select(col("doc_id"), col("source"), col("epoch")),
    oracle = Some(
      """WITH w AS (
        |  SELECT doc_id, source,
        |    CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0 WHEN 'src2' THEN 1
        |                WHEN 'src3' THEN 0 ELSE 1 END
        |    + CASE WHEN ((doc_id % 2147483648) * 2654435761) % 2147483648 <
        |        CASE source WHEN 'src0' THEN 1073741824 WHEN 'src1' THEN 536870912
        |                    WHEN 'src2' THEN 1610612736 WHEN 'src3' THEN 0 ELSE 0 END
        |      THEN 1 ELSE 0 END AS copies
        |  FROM documents
        |), x AS (
        |  SELECT doc_id, source, unnest(range(copies)) AS epoch FROM w WHERE copies > 0
        |)
        |SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch FROM x""".stripMargin))

  /** #61c BPE encode: the trained merge list replayed over the word
    * table — each word's production symbol sequence. Rows-only (the
    * train+apply loop is iterative, not SQL); BpeSpec pins the
    * semantics against a reference scalar implementation.
    */
  val qBpeEncode: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, iters = 20)
      graft.operators.Bpe.segment(graft.operators.Bpe.wordCounts(docs), merges)
        .select(col("word"), col("n"), array_join(col("syms"), " ").as("pieces"))
    },
    // the encode output IS the symbol table after the 20th training
    // pass — the same generated re-derivation as text_bpe_merges,
    // read from s20 instead of the merge picks
    oracle = Some(bpeOracleSql(20,
      "SELECT word, CAST(n AS BIGINT) AS n, array_to_string(syms, ' ') AS pieces FROM s20")))

  /** #86 Entity resolution / record linkage on a dirty customer
    * table: deterministic typo'd re-ingestions of every 4th and 10th
    * customer (the '#'→'@' and Customer→Custoner edits, plus a
    * 7-cent balance drift) are linked back to their originals by
    * multi-key blocking (last-5-digits-of-name ∪ nation:balance-band)
    * → Fellegi-Sunter additive integer score (Levenshtein-banded name
    * + nation agreement + balance proximity, threshold 50 — high
    * enough that a name edit alone plus shared nation cannot link two
    * genuinely different customers) →
    * connected components → golden records (min-id member's fields
    * win, balance takes the cluster max). The WHOLE pipeline — dirty
    * generation, blocking, scoring, clustering, survivorship — is
    * re-derived in DuckDB (recursive-CTE components, arg_min
    * survivorship), so the oracle pins candidate generation and the
    * match decision, not just the final shape.
    *
    * Balance band uses (cents + 10⁶) DIV 10⁴: the shift keeps the
    * dividend non-negative, where Spark's truncating DIV and
    * DuckDB's flooring // agree (acctbal can be negative).
    */
  val qLinkage: QueryDef = QueryDef(
    run = (s, dir) => {
      val base = t(s, dir, "customer").select(
        col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_nationkey").cast("long").as("nation"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").as("bal_cents"))
      val typoA = base.filter(col("id") % 4 === 0).select(
        (col("id") + 10000000L).as("id"),
        regexp_replace(col("name"), "#", "@").as("name"),
        col("nation"), (col("bal_cents") + 7L).as("bal_cents"))
      val typoB = base.filter(col("id") % 10 === 0).select(
        (col("id") + 20000000L).as("id"),
        regexp_replace(col("name"), "Customer", "Custoner").as("name"),
        col("nation"), col("bal_cents"))
      val records = base.unionByName(typoA).unionByName(typoB)
      val blockKeys = Seq(
        expr("substring(name, length(name) - 4, 5)"),
        concat(col("nation").cast("string"), lit(":"),
          expr("CAST((bal_cents + 1000000) DIV 10000 AS STRING)")))
      val nameDist = levenshtein(col("a_name"), col("b_name"))
      val score =
        when(nameDist === 0, 40L).when(nameDist <= 2, 25L).otherwise(0L) +
        when(col("a_nation") === col("b_nation"), 20L).otherwise(0L) +
        when(abs(col("a_bal_cents") - col("b_bal_cents")) <= 10L, 15L).otherwise(0L)
      val ents = graft.operators.RecordLinkage.link(
        records, "id", blockKeys, score, threshold = 50L)
      records.join(ents, "id")
        .groupBy(col("entity_id"))
        .agg(
          count(lit(1)).as("n_members"),
          min_by(col("name"), col("id")).as("name"),
          min_by(col("nation"), col("id")).as("nation"),
          max(col("bal_cents")).as("max_bal_cents"))
    },
    oracle = Some(
      """WITH RECURSIVE base AS (
        |  SELECT c_custkey AS id, c_name AS name, CAST(c_nationkey AS BIGINT) AS nation,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
        |  FROM customer
        |), records AS (
        |  SELECT * FROM base
        |  UNION ALL
        |  SELECT id + 10000000, replace(name, '#', '@'), nation, bal_cents + 7
        |  FROM base WHERE id % 4 = 0
        |  UNION ALL
        |  SELECT id + 20000000, replace(name, 'Customer', 'Custoner'), nation, bal_cents
        |  FROM base WHERE id % 10 = 0
        |), keyed AS (
        |  SELECT id, 0 AS ki, substr(name, strlen(name) - 4, 5) AS kv FROM records
        |  UNION ALL
        |  SELECT id, 1, CAST(nation AS VARCHAR) || ':' ||
        |         CAST((bal_cents + 1000000) // 10000 AS VARCHAR) FROM records
        |), cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM keyed a JOIN keyed b ON a.ki = b.ki AND a.kv = b.kv AND a.id < b.id
        |), scored AS (
        |  SELECT id_a, id_b,
        |    (CASE WHEN levenshtein(ra.name, rb.name) = 0 THEN 40
        |          WHEN levenshtein(ra.name, rb.name) <= 2 THEN 25 ELSE 0 END)
        |    + (CASE WHEN ra.nation = rb.nation THEN 20 ELSE 0 END)
        |    + (CASE WHEN abs(ra.bal_cents - rb.bal_cents) <= 10 THEN 15 ELSE 0 END)
        |      AS match_score
        |  FROM cand
        |  JOIN records ra ON ra.id = id_a
        |  JOIN records rb ON rb.id = id_b
        |), matched AS (
        |  SELECT id_a, id_b FROM scored WHERE match_score >= 50
        |), edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM matched
        |  UNION SELECT id_b, id_a FROM matched
        |), reach AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
        |), comp AS (
        |  SELECT id, min(r) AS rep FROM reach GROUP BY id
        |), ents AS (
        |  SELECT r.id, coalesce(c.rep, r.id) AS entity_id
        |  FROM records r LEFT JOIN comp c ON c.id = r.id
        |)
        |SELECT e.entity_id, count(*) AS n_members,
        |  arg_min(r.name, r.id) AS name,
        |  arg_min(r.nation, r.id) AS nation,
        |  max(r.bal_cents) AS max_bal_cents
        |FROM ents e JOIN records r ON r.id = e.id
        |GROUP BY e.entity_id""".stripMargin))

  /** #86b Phonetic-blocking record linkage
    * ([[graft.operators.RecordLinkage.soundexKey]]): supplier records
    * carry nation-derived pseudo-names ("GERMANY-37"), and every 3rd
    * record gets a phonetically-silent misspelling (non-first I→Y —
    * both code 0, so the Soundex key is PROVABLY unchanged while
    * levenshtein sees a real edit). Blocking on (soundex, nation)
    * alone recovers every typo pair — the pairs an exact name key
    * structurally loses — then the same Fellegi-Sunter integer
    * scoring, components and golden records as #86. The oracle
    * replays the identical translate/replace soundex chain (one
    * regexp-global-flag delta), so a single miscoded letter class
    * breaks the hash.
    */
  val qLinkagePhonetic: QueryDef = QueryDef(
    run = (s, dir) => {
      val base = t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("id"),
          concat(col("n_name"), lit("-"), (col("s_suppkey") % 50).cast("string")).as("name"),
          col("s_nationkey").cast("long").as("nation"),
          expr("CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").as("bal_cents"))
      val typo = base.filter(col("id") % 3 === 0).select(
        (col("id") + 10000000L).as("id"),
        expr("substr(name, 1, 1) || replace(substr(name, 2), 'I', 'Y')").as("name"),
        col("nation"), col("bal_cents"))
      val records = base.unionByName(typo)
      val blockKeys = Seq(concat(
        graft.operators.RecordLinkage.soundexKey("name"),
        lit(":"), col("nation").cast("string")))
      val nameDist = levenshtein(col("a_name"), col("b_name"))
      val score =
        when(nameDist === 0, 40L).when(nameDist <= 2, 25L).otherwise(0L) +
        when(col("a_nation") === col("b_nation"), 20L).otherwise(0L) +
        when(abs(col("a_bal_cents") - col("b_bal_cents")) <= 10L, 15L).otherwise(0L)
      val ents = graft.operators.RecordLinkage.link(
        records, "id", blockKeys, score, threshold = 50L)
      records.join(ents, "id")
        .groupBy(col("entity_id"))
        .agg(
          count(lit(1)).as("n_members"),
          min_by(col("name"), col("id")).as("name"),
          min_by(col("nation"), col("id")).as("nation"),
          max(col("bal_cents")).as("max_bal_cents"))
    },
    oracle = Some {
      val sdx = graft.operators.RecordLinkage.soundexKeySql("name", duckdb = true)
      s"""WITH RECURSIVE base AS (
         |  SELECT s_suppkey AS id,
         |         n_name || '-' || CAST(s_suppkey % 50 AS VARCHAR) AS name,
         |         CAST(s_nationkey AS BIGINT) AS nation,
         |         CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
         |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |), records AS (
         |  SELECT * FROM base
         |  UNION ALL
         |  SELECT id + 10000000, substr(name, 1, 1) || replace(substr(name, 2), 'I', 'Y'),
         |         nation, bal_cents
         |  FROM base WHERE id % 3 = 0
         |), keyed AS (
         |  SELECT id, $sdx || ':' || CAST(nation AS VARCHAR) AS kv FROM records
         |), cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM keyed a JOIN keyed b ON a.kv = b.kv AND a.id < b.id
         |), scored AS (
         |  SELECT id_a, id_b,
         |    (CASE WHEN levenshtein(ra.name, rb.name) = 0 THEN 40
         |          WHEN levenshtein(ra.name, rb.name) <= 2 THEN 25 ELSE 0 END)
         |    + (CASE WHEN ra.nation = rb.nation THEN 20 ELSE 0 END)
         |    + (CASE WHEN abs(ra.bal_cents - rb.bal_cents) <= 10 THEN 15 ELSE 0 END)
         |      AS match_score
         |  FROM cand
         |  JOIN records ra ON ra.id = id_a
         |  JOIN records rb ON rb.id = id_b
         |), matched AS (
         |  SELECT id_a, id_b FROM scored WHERE match_score >= 50
         |), edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM matched
         |  UNION SELECT id_b, id_a FROM matched
         |), reach AS (
         |  SELECT src AS id, src AS r FROM edges
         |  UNION
         |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
         |), comp AS (
         |  SELECT id, min(r) AS rep FROM reach GROUP BY id
         |), ents AS (
         |  SELECT r.id, coalesce(c.rep, r.id) AS entity_id
         |  FROM records r LEFT JOIN comp c ON c.id = r.id
         |)
         |SELECT e.entity_id, count(*) AS n_members,
         |  arg_min(r.name, r.id) AS name,
         |  arg_min(r.nation, r.id) AS nation,
         |  max(r.bal_cents) AS max_bal_cents
         |FROM ents e JOIN records r ON r.id = e.id
         |GROUP BY e.entity_id""".stripMargin
    })

  /** #87 Table branching + three-way merge (Nessie/LakeFS workflow on
    * the versioned table): base snapshot committed to main (v1),
    * zero-copy branch forked at v1, main moves on (every 5th key's
    * cents +100, prec 2 → v2), the branch commits its own edits
    * (every 7th key's status → 'B', prec 3) and deletions (every 11th
    * key), then merges back under the "latest" policy → main v3. The
    * oracle re-derives the merged table from first principles:
    * theirs-only and ours-only changes route directly, the %35
    * overlap resolves to the branch row (prec 3 > 2), delete-vs-
    * modify keeps the modify, deletions elsewhere vanish. Reading
    * main v3 back verifies the COMMITTED result, not an in-memory
    * plan — the whole branch lifecycle runs through real files.
    */
  val qBranchMerge: QueryDef = QueryDef(
    run = (s, dir) => {
      val path = scratch("branch_merge")
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_custkey"),
        col("o_orderstatus").as("status"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"),
        lit(1L).as("prec"))
      graft.sources.UpsertWriter.upsert(base, path, Seq("k"), "prec", keepVersions = 3)
      graft.sources.Branching.create(s, path, "feature")
      val mainUpd = base.filter(col("k") % 5 === 0)
        .withColumn("cents", col("cents") + 100L).withColumn("prec", lit(2L))
      graft.sources.UpsertWriter.upsert(mainUpd, path, Seq("k"), "prec", keepVersions = 3)
      val branchUpd = base.filter(col("k") % 7 === 0)
        .withColumn("status", lit("B")).withColumn("prec", lit(3L))
      graft.sources.Branching.upsertBranch(branchUpd, path, "feature", Seq("k"), "prec")
      graft.sources.Branching.deleteFromBranch(
        base.filter(col("k") % 11 === 0).select(col("k")), path, "feature", Seq("k"))
      graft.sources.Branching.mergeBranch(s, path, "feature", Seq("k"), "prec",
        onConflict = "latest", keepVersions = 4)
      graft.sources.UpsertWriter.read(s, path)
    },
    oracle = Some(
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_custkey, o_orderstatus AS status,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |         CAST(1 AS BIGINT) AS prec
        |  FROM orders
        |)
        |SELECT k, o_custkey,
        |  CASE WHEN k % 7 = 0 AND k % 11 <> 0 THEN 'B' ELSE status END AS status,
        |  CASE WHEN k % 5 = 0 AND NOT (k % 7 = 0 AND k % 11 <> 0)
        |       THEN cents + 100 ELSE cents END AS cents,
        |  CASE WHEN k % 7 = 0 AND k % 11 <> 0 THEN 3
        |       WHEN k % 5 = 0 THEN 2 ELSE 1 END AS prec
        |FROM base
        |WHERE k % 11 <> 0 OR k % 5 = 0""".stripMargin))

  /** #87c Write-Audit-Publish ([[graft.sources.Wap]]): the orders
    * snapshot commits to main (v1), then TWO batches go through the
    * full WAP lifecycle — a clean batch (every %10==3 key, cents+5,
    * prec 2) stages on a branch, passes its audits (status not-null,
    * cents in range, key uniqueness) and publishes as v2; a poisoned
    * batch (every %10==7 key with NULL status) stages, FAILS the
    * not-null audit, and is rejected with main untouched. Reading
    * main back proves both outcomes at once: the clean batch's
    * changes are in, the poisoned batch left no trace, and both
    * staging branches are gone. The run asserts the pass/fail
    * outcomes loudly — a WAP that publishes bad data must fail the
    * gate, not just mis-time it.
    */
  val qWapPublish: QueryDef = QueryDef(
    run = (s, dir) => {
      val path = scratch("wap_publish")
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_custkey"),
        col("o_orderstatus").as("status"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"),
        lit(1L).as("prec"))
      graft.sources.UpsertWriter.upsert(base, path, Seq("k"), "prec", keepVersions = 3)
      def audit(staged: DataFrame): Seq[DataFrame] = Seq(
        graft.operators.QualityChecks.notNull(staged, "status", "status_not_null"),
        graft.operators.QualityChecks.inRange(staged, "cents", 0, 1e12, "cents_in_range"),
        graft.operators.QualityChecks.unique(staged, Seq("k"), "key_unique"))
      val good = base.filter(col("k") % 10 === 3)
        .withColumn("cents", col("cents") + 5L).withColumn("prec", lit(2L))
      val r1 = graft.sources.Wap.writeAuditPublish(good, path, Seq("k"), "prec", audit)
      val bad = base.filter(col("k") % 10 === 7)
        .withColumn("status", lit(null).cast("string")).withColumn("prec", lit(3L))
      val r2 = graft.sources.Wap.writeAuditPublish(bad, path, Seq("k"), "prec", audit)
      require(r1.published && r1.version.contains(2),
        s"WAP: clean batch must publish as v2, got $r1")
      require(!r2.published && r2.audit.exists(a => a._1 == "status_not_null" && !a._3),
        s"WAP: poisoned batch must be rejected by status_not_null, got $r2")
      graft.sources.UpsertWriter.read(s, path)
    },
    oracle = Some(
      """SELECT o_orderkey AS k, o_custkey, o_orderstatus AS status,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    + CASE WHEN o_orderkey % 10 = 3 THEN 5 ELSE 0 END AS cents,
        |  CAST(CASE WHEN o_orderkey % 10 = 3 THEN 2 ELSE 1 END AS BIGINT) AS prec
        |FROM orders""".stripMargin))

  /** #88 χ² token–label feature selection: per-token 2×2 presence
    * contingency against the is-English label, χ²·10⁴ in one
    * DECIMAL(38,0) integral division — the classic ranking used to
    * pick classifier features before training (see
    * [[graft.operators.Association.chi2Features]]).
    */
  val qChi2Features: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Association.chi2Features(
      t(s, dir, "documents"), col("doc_id"), col("text"), col("lang") === "en", minDf = 2L),
    oracle = Some(
      """WITH d AS (
        |  SELECT doc_id, (lang = 'en') AS p, string_split(text, ' ') AS w FROM documents
        |), pres AS (
        |  SELECT DISTINCT doc_id, CASE WHEN p THEN 1 ELSE 0 END AS pi, unnest(w) AS token
        |  FROM d
        |), pres2 AS (
        |  SELECT * FROM pres WHERE token <> ''
        |), tot AS (
        |  SELECT count(*) AS n_docs,
        |         sum(CASE WHEN p THEN 1 ELSE 0 END) AS n_pos
        |  FROM d
        |), byt AS (
        |  SELECT token, count(*) AS df, sum(pi) AS a FROM pres2 GROUP BY token
        |), cells AS (
        |  SELECT token, df, a, df - a AS b, n_pos - a AS c,
        |         n_docs - n_pos - (df - a) AS dd, n_docs
        |  FROM byt CROSS JOIN tot WHERE df >= 2
        |)
        |SELECT token, CAST(df AS BIGINT) AS df, CAST(a AS BIGINT) AS n_pos_docs,
        |  CASE WHEN (a+b) * (c+dd) * (a+c) * (b+dd) = 0 THEN NULL
        |       ELSE CAST(CAST(n_docs AS HUGEINT)
        |              * (CAST(a AS HUGEINT) * dd - CAST(b AS HUGEINT) * c)
        |              * (CAST(a AS HUGEINT) * dd - CAST(b AS HUGEINT) * c) * 10000
        |            // (CAST(a + b AS HUGEINT) * (c + dd) * (a + c) * (b + dd))
        |            AS BIGINT) END AS chi2_x10000
        |FROM cells""".stripMargin))

  /** #89 PMI collocation mining: adjacent-bigram association ratio
    * p(xy)/(p(x)p(y))·10⁴ in exact integers (log dropped — monotone,
    * so ranking/thresholding are unchanged), the phrase-mining step
    * for tokenizer and vocab construction (see
    * [[graft.operators.Association.pmiCollocations]]).
    */
  val qPmiCollocations: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Association.pmiCollocations(
      t(s, dir, "documents"), col("text"), minCount = 5L),
    oracle = Some(
      """WITH d AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents
        |), bgp AS (
        |  SELECT unnest(list_transform(range(2, len(w) + 1),
        |                i -> w[i-1] || ' ' || w[i])) AS pair
        |  FROM d
        |), bgf AS (
        |  SELECT string_split(pair, ' ')[1] AS w1, string_split(pair, ' ')[2] AS w2 FROM bgp
        |), uc AS (
        |  SELECT tok, count(*) AS n_tok FROM (SELECT unnest(w) AS tok FROM d) GROUP BY tok
        |), bc AS (
        |  SELECT w1, w2, count(*) AS n_xy FROM bgf GROUP BY 1, 2
        |), mt AS (
        |  SELECT count(*) AS m FROM bgf
        |)
        |SELECT w1, w2, CAST(n_xy AS BIGINT) AS n_xy,
        |  CAST(CAST(n_xy AS HUGEINT) * m * 10000
        |       // (CAST(ux.n_tok AS HUGEINT) * uy.n_tok) AS BIGINT) AS ratio_x10000
        |FROM bc
        |JOIN uc ux ON ux.tok = bc.w1
        |JOIN uc uy ON uy.tok = bc.w2
        |CROSS JOIN mt
        |WHERE n_xy >= 5""".stripMargin))

  /** Unrolled k-core peel oracle: the peel is iterate-to-fixpoint,
    * which plain SQL can't loop — but each round is one HAVING filter
    * plus two joins, so the oracle UNROLLS `rounds` identical stages
    * (generated, like the BPE oracle's 20 passes). Converged stages
    * are no-ops, so any `rounds` ≥ the data's true peel depth (5 at
    * sf0.01, margin to 10) yields the exact fixpoint.
    */
  protected def kCoreOracleSql(k: Int, minEdgeCount: Long, rounds: Int): String = {
    // every stage is MATERIALIZED: DuckDB inlines plain CTEs, and a
    // chain where e_i references e_{i-1} twice inlines 2^rounds scans
    // of the parquet — fd exhaustion, not just slowness
    val prefix =
      s"""WITH d AS MATERIALIZED (
         |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents
         |), bgp AS (
         |  SELECT unnest(list_transform(range(2, len(w) + 1),
         |                i -> w[i-1] || ' ' || w[i])) AS pair
         |  FROM d
         |), bgf AS (
         |  SELECT string_split(pair, ' ')[1] AS w1, string_split(pair, ' ')[2] AS w2 FROM bgp
         |), bc AS (
         |  SELECT w1, w2, count(*) AS n FROM bgf GROUP BY 1, 2
         |), ed AS MATERIALIZED (
         |  SELECT least(w1, w2) AS a, greatest(w1, w2) AS b
         |  FROM bc WHERE w1 <> w2
         |  GROUP BY 1, 2 HAVING sum(n) >= $minEdgeCount
         |), e0 AS MATERIALIZED (
         |  SELECT a AS s, b AS dd FROM ed UNION ALL SELECT b, a FROM ed
         |)""".stripMargin
    val stages = (1 to rounds).map { i =>
      s""", n$i AS MATERIALIZED (
         |  SELECT s FROM e${i - 1} GROUP BY s HAVING count(*) >= $k
         |), e$i AS MATERIALIZED (
         |  SELECT e.s, e.dd FROM e${i - 1} e
         |  JOIN n$i x ON e.s = x.s
         |  JOIN n$i y ON e.dd = y.s
         |)""".stripMargin
    }.mkString
    prefix + stages +
      s"\nSELECT s AS word, CAST(count(*) AS BIGINT) AS degree FROM e$rounds GROUP BY s"
  }

  /** #91 k-core decomposition of the frequent-bigram word graph
    * (undirected edges where the adjacency count ≥ 65): iterative
    * peel to the unique maximal subgraph of min-degree 6 — the
    * topic-kernel extraction view, a genuinely multi-round peel on
    * this data (5 rounds: 30 words → 15 core words). Spark iterates
    * to fixpoint with per-round lineage truncation
    * ([[graft.operators.GraphAnalytics.kCore]]); the oracle unrolls
    * 10 peel stages.
    */
  val qKcore: QueryDef = QueryDef(
    run = (s, dir) => {
      val words = t(s, dir, "documents")
        .select(split(col("text"), " ").as("w"))
        .select(filter(col("w"), x => x =!= "").as("w"))
      val bg = words.filter(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w1, w[i] AS w2))")).as("bg"))
        .select(col("bg.w1"), col("bg.w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
      val edges = bg.filter(col("w1") =!= col("w2"))
        .select(least(col("w1"), col("w2")).as("a"),
          greatest(col("w1"), col("w2")).as("b"), col("n"))
        .groupBy(col("a"), col("b")).agg(sum(col("n")).as("n"))
        .filter(col("n") >= 65L)
      graft.operators.GraphAnalytics.kCore(edges, "a", "b", k = 6)
        .select(col("id").as("word"), col("degree"))
    },
    oracle = Some(kCoreOracleSql(k = 6, minEdgeCount = 65L, rounds = 10)))

  /** #92 Secondary-index maintenance + value lookup: a non-key-column
    * index (cust → record keys) built over the versioned table, then
    * kept current INCREMENTALLY — the table moves two versions
    * (custkey reassignments + deletes), and the refresh folds only
    * the SnapshotDiff of indexed-vs-live into the index in one atomic
    * applyChanges commit carrying the covered-version mark. The
    * lookup hashes probe values with the same xxhash64 the write
    * used and reads only the probed hive buckets (partition
    * pruning), then broadcast-joins the matched keys back to the
    * live table. The oracle re-derives the final table from first
    * principles and probes it directly — a stale index entry (moved
    * custkey still under its old value, deleted order resurfacing)
    * breaks the hash.
    */
  val qSecondaryIndex: QueryDef = QueryDef(
    run = (s, dir) => {
      val path = scratch("secidx_table")
      val idx = scratch("secidx_index")
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_custkey").as("cust"),
        col("o_orderstatus").as("status"), lit(1L).as("prec"))
      graft.sources.UpsertWriter.upsert(base, path, Seq("k"), "prec", keepVersions = 3)
      graft.sources.SecondaryIndex.refresh(s, path, idx, Seq("k"), "cust", nBuckets = 16)
      val moved = base.filter(col("k") % 10 === 0)
        .withColumn("cust", col("cust") + 1L).withColumn("prec", lit(2L))
      graft.sources.UpsertWriter.upsert(moved, path, Seq("k"), "prec", keepVersions = 3)
      graft.sources.UpsertWriter.delete(s, path,
        base.filter(col("k") % 13 === 0).select(col("k")), Seq("k"), keepVersions = 3)
      graft.sources.SecondaryIndex.refresh(s, path, idx, Seq("k"), "cust", nBuckets = 16)
      graft.sources.SecondaryIndex.lookup(s, path, idx, Seq("k"), "cust",
        values = Seq(7L, 11L), nBuckets = 16)
    },
    oracle = Some(
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_custkey AS cust, o_orderstatus AS status,
        |         CAST(1 AS BIGINT) AS prec
        |  FROM orders
        |), fin AS (
        |  SELECT k,
        |    CASE WHEN k % 10 = 0 THEN cust + 1 ELSE cust END AS cust,
        |    status,
        |    CASE WHEN k % 10 = 0 THEN 2 ELSE 1 END AS prec
        |  FROM base WHERE k % 13 <> 0
        |)
        |SELECT k, cust, status, CAST(prec AS BIGINT) AS prec
        |FROM fin WHERE cust IN (7, 11)""".stripMargin))

  /** #93 ROUGE-2 overlap scoring of the near-dup candidate pairs:
    * exact multiset bigram recall/precision/F1 in basis points per
    * pair (see [[graft.operators.Evaluation.rougeN]]) — the
    * quantitative "how much do they overlap" companion to the
    * boolean near-dup decision, re-derived end to end (pair
    * generation AND overlap math) by the oracle.
    */
  val qRouge: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", n = 5, threshold = 0.5)
      graft.operators.Evaluation.rougeN(docs, "doc_id", "text", pairs, n = 2)
    },
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), s AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' '))) AS sh
        |  FROM t
        |), sizes AS (
        |  SELECT doc_id, count(*) AS nsh FROM s GROUP BY doc_id
        |), cnt AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT doc_a, doc_b
        |  FROM cnt
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE CAST(common AS DOUBLE) / (sa.nsh + sb.nsh - common) >= 0.5
        |), tw AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram
        |  FROM tw
        |), gc AS (
        |  SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2
        |), sz AS (
        |  SELECT doc_id, sum(cnt) AS ntot FROM gc GROUP BY 1
        |), ov AS (
        |  SELECT p.doc_a, p.doc_b, sum(least(ga.cnt, gb.cnt)) AS overlap
        |  FROM pairs p
        |  JOIN gc ga ON ga.doc_id = p.doc_a
        |  JOIN gc gb ON gb.doc_id = p.doc_b AND gb.gram = ga.gram
        |  GROUP BY 1, 2
        |)
        |SELECT p.doc_a, p.doc_b,
        |  CAST(coalesce(ov.overlap, 0) AS BIGINT) AS overlap,
        |  CAST(sa.ntot AS BIGINT) AS n_a, CAST(sb.ntot AS BIGINT) AS n_b,
        |  CAST(CAST(coalesce(ov.overlap, 0) AS HUGEINT) * 10000 // sa.ntot AS BIGINT) AS rouge_p_bp,
        |  CAST(CAST(coalesce(ov.overlap, 0) AS HUGEINT) * 10000 // sb.ntot AS BIGINT) AS rouge_r_bp,
        |  CAST(CAST(coalesce(ov.overlap, 0) AS HUGEINT) * 20000
        |       // (sa.ntot + sb.ntot) AS BIGINT) AS rouge_f1_bp
        |FROM pairs p
        |JOIN sz sa ON sa.doc_id = p.doc_a
        |JOIN sz sb ON sb.doc_id = p.doc_b
        |LEFT JOIN ov ON ov.doc_a = p.doc_a AND ov.doc_b = p.doc_b""".stripMargin))

  /** #56e Holt linear smoothing per user (α = β = ½ fixed point): the
    * trend-aware EWMA upgrade with a one-step forecast — a true
    * DOUBLE recurrence (level and trend feed each other), run as one
    * in-array fold after the per-entity sort and oracled by replaying
    * both recurrences one row per step in a recursive CTE. Negative
    * trends make floor-vs-truncate division diverge; both engines'
    * integer division truncates toward zero (Spark div, DuckDB //),
    * which is the convention the recurrence pins (see
    * [[graft.operators.EventAnalytics.holt]]).
    */
  val qHolt: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.EventAnalytics.holt(
      t(s, dir, "events").withColumn("cents", round(col("value") * 100).cast("long")),
      entityCol = "user_id", tsCol = "ts", idCol = "event_id", centsCol = "cents"),
    oracle = Some(
      """WITH RECURSIVE e AS (
        |  SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |), r AS (
        |  SELECT user_id, event_id, ts, cents, rn,
        |         cents AS level, CAST(0 AS BIGINT) AS trend
        |  FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.ts, e.cents, e.rn,
        |    (r.level + r.trend + e.cents) // 2,
        |    (r.trend + ((r.level + r.trend + e.cents) // 2) - r.level) // 2
        |  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
        |)
        |SELECT user_id, event_id, ts, cents,
        |  CAST(level AS BIGINT) AS level, CAST(trend AS BIGINT) AS trend,
        |  CAST(level + trend AS BIGINT) AS forecast_next
        |FROM r""".stripMargin))

  /** #56g One-sided CUSUM change-point detection per entity
    * ([[graft.operators.EventAnalytics.cusum]]): s = max(0, s + cents
    * − k) with alarm-and-reset at h — the drift detector that catches
    * small persistent shifts per-point z-scores miss. Pure integer
    * max/add recurrence, so the oracle replays it exactly as a
    * recursive CTE: every accumulation, threshold crossing and
    * post-alarm reset must agree bit-for-bit.
    */
  val qCusum: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.EventAnalytics.cusum(
      t(s, dir, "events").withColumn("cents", round(col("value") * 100).cast("long")),
      entityCol = "user_id", tsCol = "ts", idCol = "event_id", centsCol = "cents",
      kCents = 6000L, hCents = 20000L),
    oracle = Some(
      """WITH RECURSIVE e AS (
        |  SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |), r AS (
        |  SELECT user_id, event_id, ts, cents, rn,
        |    greatest(0, cents - 6000) AS s,
        |    greatest(0, cents - 6000) > 20000 AS alarm,
        |    CASE WHEN greatest(0, cents - 6000) > 20000 THEN 0
        |         ELSE greatest(0, cents - 6000) END AS carry
        |  FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.ts, e.cents, e.rn,
        |    greatest(0, r.carry + e.cents - 6000),
        |    greatest(0, r.carry + e.cents - 6000) > 20000,
        |    CASE WHEN greatest(0, r.carry + e.cents - 6000) > 20000 THEN 0
        |         ELSE greatest(0, r.carry + e.cents - 6000) END
        |  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
        |)
        |SELECT user_id, event_id, ts, cents, CAST(s AS BIGINT) AS s, alarm
        |FROM r""".stripMargin))

  /** #56f Holt-Winters additive seasonal smoothing (m = 7) per
    * entity ([[graft.operators.EventAnalytics.holtWinters]]): the
    * triple (level, trend, seasonal-index) recurrence with an m-deep
    * lookback, α = β = γ = ½ fixed-point over cents, one fold per
    * entity. The oracle replays the recurrence in a recursive CTE
    * that CARRIES THE SEASON HISTORY as a growing list — the m-deep
    * lookback is `seasons[rn − 7]`, so every halving, cold-start zero
    * and next-slot forecast index must agree bit-for-bit.
    */
  val qHoltWinters: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.EventAnalytics.holtWinters(
      t(s, dir, "events").withColumn("cents", round(col("value") * 100).cast("long")),
      entityCol = "user_id", tsCol = "ts", idCol = "event_id", centsCol = "cents", m = 7),
    oracle = Some {
      val sPrev = "(CASE WHEN e.rn > 7 THEN r.seasons[e.rn - 7] ELSE 0 END)"
      val lv = s"((e.cents - $sPrev + r.level + r.trend) // 2)"
      val bv = s"((r.trend + $lv - r.level) // 2)"
      val sv = s"((e.cents - $lv + $sPrev) // 2)"
      val sNext = "(CASE WHEN e.rn - 6 >= 1 THEN r.seasons[e.rn - 6] ELSE 0 END)"
      s"""WITH RECURSIVE e AS (
         |  SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         |  FROM events
         |), r AS (
         |  SELECT user_id, event_id, ts, cents, rn,
         |         cents AS level, CAST(0 AS BIGINT) AS trend,
         |         CAST(0 AS BIGINT) AS season, CAST(0 AS BIGINT) AS snext,
         |         [CAST(0 AS BIGINT)] AS seasons
         |  FROM e WHERE rn = 1
         |  UNION ALL
         |  SELECT e.user_id, e.event_id, e.ts, e.cents, e.rn,
         |    $lv, $bv, $sv, $sNext,
         |    list_append(r.seasons, $sv)
         |  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
         |)
         |SELECT user_id, event_id, ts, cents,
         |  CAST(level AS BIGINT) AS level, CAST(trend AS BIGINT) AS trend,
         |  CAST(season AS BIGINT) AS season,
         |  CAST(level + trend + snext AS BIGINT) AS forecast_next
         |FROM r""".stripMargin
    })

  /** #94 Encoding-quality gate (the C4/CCNet mojibake step): exact
    * per-doc counts of U+FFFD replacement chars and raw control
    * chars, printable-ASCII share in floor bp, and the pass flag —
    * scan-speed single projection (see
    * [[graft.operators.TextAnalysis.encodingQuality]]). The corpus
    * is clean ASCII so the gate passes everywhere; the SPEC drives
    * real mojibake through it — this query pins the cross-engine
    * counting arithmetic.
    */
  val qEncodingGate: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.TextAnalysis.encodingQuality(t(s, dir, "documents"))
      .select(col("doc_id"), col("n_chars"), col("n_replacement"), col("n_control"),
        col("ascii_ratio_bp"), col("enc_pass")),
    oracle = Some(
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(length(text) - length(replace(text, chr(65533), '')) AS BIGINT)
        |    AS n_replacement,
        |  CAST(length(text) - length(regexp_replace(text,
        |       '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')) AS BIGINT) AS n_control,
        |  CASE WHEN length(text) = 0 THEN NULL
        |       ELSE CAST(CAST(length(text) - length(regexp_replace(text,
        |              '[\x20-\x7E\t\n\r]', '', 'g')) AS HUGEINT) * 10000
        |            // length(text) AS BIGINT) END AS ascii_ratio_bp,
        |  (length(text) - length(replace(text, chr(65533), '')) = 0
        |   AND (length(text) - length(regexp_replace(text,
        |        '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'))) * 1000 <= length(text))
        |    AS enc_pass
        |FROM documents""".stripMargin))

  /** #95 Phrase search over positional postings: the 3-word phrase
    * "stream table hash" resolved by position arithmetic (two
    * (doc, pos−i) equi-joins, each leg pre-filtered to one term) —
    * the inverted-index phrase query (see
    * [[graft.operators.TextAnalysis.phraseSearch]]). The oracle
    * re-derives matches positionally over the token arrays, so a
    * off-by-one in the position join breaks the hash.
    */
  val qPhraseSearch: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.TextAnalysis.phraseSearch(
      t(s, dir, "documents"), Seq("stream", "table", "hash")),
    oracle = Some(
      """WITH tw AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        |  FROM documents
        |), m AS (
        |  SELECT doc_id,
        |    list_filter(range(1, len(w) - 1),
        |      i -> w[i] = 'stream' AND w[i+1] = 'table' AND w[i+2] = 'hash') AS hits
        |  FROM tw
        |)
        |SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_matches,
        |       CAST(list_min(hits) AS BIGINT) AS first_pos
        |FROM m WHERE len(hits) > 0""".stripMargin))

  /** #6c ORC report sink roundtrip: the flagship transform written
    * through ReportWriter as ORC (the columnar handoff format for
    * the downstream system the report also lands in) and read back —
    * same losslessness contract as the CSV/JSONL paths, same oracle.
    */
  val qOrcRoundtrip: QueryDef = QueryDef(
    run = (s, dir) => {
      val result = new ReportPipeline(s, scratch("ckpt-orc")).transform(reportSpec(dir))
      val writer = new ReportWriter(scratch("report-root-orc"))
      val handle = writer.write(result, format = "orc")
      s.read.schema(result.schema).orc(handle.path)
    },
    oracle = Some(reportSql))

  /** #96 Metadata-only COUNT(*): the lineitem count answered from
    * parquet footer record counts — zero row-group I/O, distributed
    * footer reads (see
    * [[graft.operators.ZoneMaps.countFromFooters]]). The oracle
    * counts the rows the slow way; if a footer were misread the
    * numbers differ.
    */
  val qCountMeta: QueryDef = QueryDef(
    run = (s, dir) => {
      val n = graft.operators.ZoneMaps.countFromFooters(s, s"$dir/lineitem.parquet")
      s.sql(s"SELECT CAST($n AS BIGINT) AS n_rows")
    },
    oracle = Some("SELECT count(*) AS n_rows FROM lineitem"))

  /** #96b Metadata-only MIN/MAX
    * ([[graft.operators.ZoneMaps.minMaxFromFooters]]): the extremes
    * of an integral and a floating column answered from parquet
    * footer chunk statistics — zero row-group I/O, the stats-served
    * aggregate Iceberg/Delta give; strings refuse by contract (binary
    * stats may be writer-truncated). The oracle computes the same
    * extremes the slow way over the raw table.
    */
  val qMinmaxMeta: QueryDef = QueryDef(
    run = (s, dir) => {
      val keys = graft.operators.ZoneMaps
        .minMaxFromFooters(s, s"$dir/lineitem.parquet", "l_orderkey")
        .select(col("min_v").as("min_key"), col("max_v").as("max_key"))
      val prices = graft.operators.ZoneMaps
        .minMaxFromFooters(s, s"$dir/lineitem.parquet", "l_extendedprice")
        .select(col("min_v").as("min_price"), col("max_v").as("max_price"))
      keys.crossJoin(prices)
    },
    oracle = Some(
      """SELECT min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
        |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin))

  /** #97 Table history (DESCRIBE HISTORY analog): a 4-commit
    * lifecycle — base upsert, keyed delete, insert batch, restore —
    * read back as (version, n_rows) with counts derived from parquet
    * FOOTERS only (no data I/O). The oracle recomputes each
    * version's expected cardinality from first principles; a commit
    * that lost or duplicated rows anywhere in the lifecycle shows up
    * as the wrong count at its version.
    */
  val qHistory: QueryDef = QueryDef(
    run = (s, dir) => {
      val path = scratch("history_table")
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_custkey"),
        col("o_orderstatus").as("status"), lit(1L).as("prec"))
      graft.sources.UpsertWriter.upsert(base, path, Seq("k"), "prec", keepVersions = 5)
      graft.sources.UpsertWriter.delete(s, path,
        base.filter(col("k") % 13 === 0).select(col("k")), Seq("k"), keepVersions = 5)
      val adds = base.filter(col("k") % 2 === 0)
        .withColumn("k", col("k") + 10000000L).withColumn("prec", lit(2L))
      graft.sources.UpsertWriter.upsert(adds, path, Seq("k"), "prec", keepVersions = 5)
      graft.sources.UpsertWriter.restore(s, path, version = 1, keepVersions = 5)
      graft.sources.UpsertWriter.history(s, path).select(col("version"), col("n_rows"))
    },
    oracle = Some(
      """WITH c AS (SELECT count(*) AS n FROM orders),
        |c13 AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 13 <> 0),
        |c2 AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT CAST(1 AS BIGINT) AS version, CAST(c.n AS BIGINT) AS n_rows FROM c
        |UNION ALL SELECT 2, CAST(c13.n AS BIGINT) FROM c13
        |UNION ALL SELECT 3, CAST(c13.n + c2.n AS BIGINT) FROM c13, c2
        |UNION ALL SELECT 4, CAST(c.n AS BIGINT) FROM c""".stripMargin))

  /** #98 ANN recall@k harness: exact top-5 on full 64-dim cosine vs
    * top-5 on the FIRST 16 dims (the Matryoshka-truncation axis),
    * measured by [[graft.operators.Similarity.recallAtK]] — per-query
    * hit counts and recall in exact bp, zero-hit queries reported.
    * Both neighbor sets AND the overlap are re-derived in DuckDB, so
    * the harness itself is oracled, not just its inputs.
    */
  val qAnnRecall: QueryDef = QueryDef(
    run = (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val exact = graft.operators.Similarity.bruteForceTopK(emb, q, k = 5)
      val approx = graft.operators.Similarity.bruteForceTopK(emb, q, k = 5, dims = Some(16))
      graft.operators.Similarity.recallAtK(exact, approx, k = 5)
    },
    oracle = Some(
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
         |), sc AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.v AS va, q.v AS vb
         |  FROM e c, e q WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
         |), ex AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY $cosSql DESC, neighbor_id) AS rk
         |    FROM sc) WHERE rk <= 5
         |), sct AS (
         |  SELECT query_id, neighbor_id, va[1:16] AS va, vb[1:16] AS vb FROM sc
         |), ap AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY $cosSql DESC, neighbor_id) AS rk
         |    FROM sct) WHERE rk <= 5
         |), h AS (
         |  SELECT ex.query_id, count(*) AS n_hits
         |  FROM ex JOIN ap USING (query_id, neighbor_id) GROUP BY 1
         |)
         |SELECT q.query_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |       CAST(coalesce(h.n_hits, 0) * 10000 // 5 AS BIGINT) AS recall_bp
         |FROM (SELECT DISTINCT query_id FROM ex) q
         |LEFT JOIN h USING (query_id)""".stripMargin))

  /** #99 CMS join-size estimation: |orders ⋈ lineitem| estimated
    * from two Count-Min sketches over the join key — the AGMS/CMS
    * inner product min_r Σ_w A[r,w]·B[r,w], the classic
    * constant-space cardinality estimate a planner consults before
    * choosing a join strategy — alongside the exact size, both
    * re-derived in DuckDB (sketch buckets from the same FNV chain
    * the CMS oracle already pins). The estimate only ever
    * OVER-counts (collision mass is non-negative).
    */
  /** #99b Cardinality-guarded join ([[graft.operators.SafeJoin]]):
    * orders ⋈ lineitem runs only after the AGMS sketch proves it fits
    * the row bound (the estimate never undercounts, so an explosion
    * can never slip through — the spec locks the refusal path). The
    * guarded join's result is the plain join's, which is what the
    * oracle runs. Width is AUTO-SIZED from a KMV key-cardinality
    * pre-pass ([[graft.operators.SafeJoin.AutoWidth]]): the first
    * sf0.1 bench run proved the old fixed default w = 2048 all-noise
    * at 150k keys — est 44M vs true 0.6M, a correct loud refusal of a
    * fine join; precision is WIDTH, the guard direction never lies,
    * and the auto-sizing keeps collision overcount (≈ |A|·|B|/w)
    * well under any bound worth guarding with no caller tuning.
    */
  val qSafeJoin: QueryDef = QueryDef(
    run = (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey").as("k"), col("o_orderpriority"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey").as("k"), col("l_extendedprice"))
      graft.operators.SafeJoin.guardedEquiJoin(o, l, "k", maxRows = 10000000L)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"))
    },
    oracle = Some(
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin))

  val qCmsJoinSize: QueryDef = QueryDef(
    run = (s, dir) => {
      import graft.functions.CmsFunctions
      val d = 4; val w = 2048
      val oKeys = t(s, dir, "orders").select(col("o_orderkey").cast("string").as("k"))
      val lKeys = t(s, dir, "lineitem").select(col("l_orderkey").cast("string").as("k"))
      val ska = oKeys.agg(CmsFunctions.cmsSketch(col("k"), d, w).as("ska"))
      val skb = lKeys.agg(CmsFunctions.cmsSketch(col("k"), d, w).as("skb"))
      val exact = oKeys.join(lKeys, "k").agg(count(lit(1)).as("exact_join_size"))
      ska.crossJoin(skb).crossJoin(broadcast(exact))
        .select(CmsFunctions.cmsInnerProduct(col("ska"), col("skb"), d, w)
          .cast("bigint").as("cms_join_size"), col("exact_join_size"))
    },
    oracle = Some(
      """WITH ok AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS term, count(*) AS n FROM orders GROUP BY 1
        |), lk AS (
        |  SELECT CAST(l_orderkey AS VARCHAR) AS term, count(*) AS n FROM lineitem GROUP BY 1
        |), rws AS (
        |  SELECT unnest([0, 1, 2, 3]) AS r
        |), bka AS (
        |  SELECT term, n, r,
        |    list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |      list_transform(range(1, length(term || chr(1) || CAST(r AS VARCHAR)) + 1),
        |        i -> CAST(unicode((term || chr(1) || CAST(r AS VARCHAR))[i]) AS HUGEINT))),
        |      (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                   * 1099511628211) % 18446744073709551616) % 2048 AS bucket
        |  FROM ok CROSS JOIN rws
        |), bkb AS (
        |  SELECT term, n, r,
        |    list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |      list_transform(range(1, length(term || chr(1) || CAST(r AS VARCHAR)) + 1),
        |        i -> CAST(unicode((term || chr(1) || CAST(r AS VARCHAR))[i]) AS HUGEINT))),
        |      (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                   * 1099511628211) % 18446744073709551616) % 2048 AS bucket
        |  FROM lk CROSS JOIN rws
        |), ca AS (
        |  SELECT r, bucket, sum(n) AS cell FROM bka GROUP BY 1, 2
        |), cb AS (
        |  SELECT r, bucket, sum(n) AS cell FROM bkb GROUP BY 1, 2
        |), ip AS (
        |  SELECT ca.r, sum(CAST(ca.cell AS HUGEINT) * cb.cell) AS p
        |  FROM ca JOIN cb USING (r, bucket) GROUP BY 1
        |), ex AS (
        |  SELECT count(*) AS n FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |)
        |SELECT CAST((SELECT min(p) FROM ip) AS BIGINT) AS cms_join_size,
        |       CAST(ex.n AS BIGINT) AS exact_join_size
        |FROM ex""".stripMargin))

  /** #87b Branch-merge conflict DRY-RUN: the same diverged
    * branch/main scenario as #87, but read through
    * [[graft.sources.Branching.conflicts]] BEFORE merging — the
    * both-sides-changed keys with each side's precombine (NULL for a
    * branch deletion). The oracle enumerates the conflict set from
    * first principles: every %35 key modified on both sides, every
    * %55 key caught in delete-vs-modify.
    */
  val qBranchConflicts: QueryDef = QueryDef(
    run = (s, dir) => {
      val path = scratch("branch_conflicts")
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_custkey"),
        col("o_orderstatus").as("status"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"),
        lit(1L).as("prec"))
      graft.sources.UpsertWriter.upsert(base, path, Seq("k"), "prec", keepVersions = 3)
      graft.sources.Branching.create(s, path, "feature")
      val mainUpd = base.filter(col("k") % 5 === 0)
        .withColumn("cents", col("cents") + 100L).withColumn("prec", lit(2L))
      graft.sources.UpsertWriter.upsert(mainUpd, path, Seq("k"), "prec", keepVersions = 3)
      val branchUpd = base.filter(col("k") % 7 === 0)
        .withColumn("status", lit("B")).withColumn("prec", lit(3L))
      graft.sources.Branching.upsertBranch(branchUpd, path, "feature", Seq("k"), "prec")
      graft.sources.Branching.deleteFromBranch(
        base.filter(col("k") % 11 === 0).select(col("k")), path, "feature", Seq("k"))
      graft.sources.Branching.conflicts(s, path, "feature", Seq("k"), "prec")
    },
    oracle = Some(
      """SELECT o_orderkey AS k,
        |  CAST(2 AS BIGINT) AS ours_precombine,
        |  CASE WHEN o_orderkey % 11 = 0 THEN NULL
        |       ELSE CAST(3 AS BIGINT) END AS theirs_precombine
        |FROM orders
        |WHERE o_orderkey % 5 = 0
        |  AND (o_orderkey % 7 = 0 OR o_orderkey % 11 = 0)""".stripMargin))

}
