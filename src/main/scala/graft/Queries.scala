package graft

import graft.pipeline._
import graft.sources.{IncrementalReader, TableLoader, UpsertWriter}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The query catalog: every SURVEY.md §2 capability with a runnable
  * DataFrame implementation and (where SQL-expressible) a DuckDB
  * oracle over the same parquet tables.
  *
  * Numeric policy for oracle parity: money columns are doubles with
  * 2-decimal values, which are NOT exactly representable in binary —
  * a plain SUM(double) depends on addition order and differs between
  * engines. Every money aggregate therefore goes through
  * DECIMAL(18,2) (exact, associative) and is cast back to double at
  * the end, which is bit-deterministic on both engines. Integral
  * doubles (l_quantity) sum exactly as doubles and need no cast.
  */
object Queries {

  final case class QueryDef(
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    TableLoader.table(spark, dir, name)

  /** sum of a 2-decimal money expression, exact via decimal, returned as double */
  private def dsum(c: Column): Column = sum(c.cast("decimal(28,6)")).cast("double")

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  private def scratch(name: String): String = {
    val p = s"/root/repo/target/graft-tmp/$name"
    val f = new java.io.File(p)
    if (f.exists()) deleteRecursively(f)
    f.mkdirs()
    p
  }

  // ---------------------------------------------------------------
  // Reference surface
  // ---------------------------------------------------------------

  /** #1 Full snapshot load (reference: template.py:304). */
  val qFullLoad: QueryDef = QueryDef(
    run = (s, dir) => t(s, dir, "orders"),
    oracle = Some("SELECT * FROM orders"))

  /** #2 Incremental read since a commit watermark
    * (reference: template.py:197-217). Fixed watermark so the check
    * is stateless; the checkpoint state machine is covered in specs.
    */
  val incWatermark = "2024-01-15 00:00:00"
  val qIncLoad: QueryDef = QueryDef(
    run = (s, dir) => {
      val rdr = new IncrementalReader(s, null) // readSince needs no store
      rdr.readSince(t(s, dir, "events"), "ts", incWatermark)
    },
    oracle = Some(s"SELECT * FROM events WHERE ts > TIMESTAMP '$incWatermark'"))

  /** #4/#5 Flagship config-driven report transform — the reference's
    * own demo query re-grounded on TPC-H-ish tables
    * (reference: template.py:471-516: orders ⋈ customers, URGENT only).
    */
  val reportSql: String =
    """SELECT o.*, c.c_name AS customer_name
      |FROM orders AS o
      |JOIN customer AS c ON o.o_custkey = c.c_custkey
      |WHERE o.o_orderpriority = '1-URGENT'""".stripMargin

  def reportSpec(dir: String, reportRoot: Option[String] = None): PipelineSpec = PipelineSpec(
    sources = Seq(
      SourceSpec("orders", s"$dir/orders.parquet"),
      SourceSpec("customer", s"$dir/customer.parquet")),
    transform = TransformSpec(reportSql),
    report = reportRoot.map(root => ReportSpec(
      senderEmail = "reports@graft.local",
      recipientEmail = "customer@graft.local",
      subject = "Download Link for Data",
      reportRoot = root)))

  val qReportUrgent: QueryDef = QueryDef(
    run = (s, dir) => new ReportPipeline(s, scratch("ckpt-report")).transform(reportSpec(dir)),
    oracle = Some(reportSql))

  /** #6 CSV report sink roundtrip: run the flagship transform, write
    * it through ReportWriter (date-partitioned single CSV), read it
    * back with the declared schema. Oracle is the flagship query —
    * proving the CSV layer is lossless for this report shape.
    */
  val qCsvRoundtrip: QueryDef = QueryDef(
    run = (s, dir) => {
      val result = new ReportPipeline(s, scratch("ckpt-csv")).transform(reportSpec(dir))
      val writer = new ReportWriter(scratch("report-root"))
      val handle = writer.write(result)
      s.read.schema(result.schema).option("header", "true")
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .csv(handle.path)
    },
    oracle = Some(reportSql))

  /** #10 Upsert merge: latest-wins by (record key, precombine)
    * (reference: generate_hudi_table.py:86-214). Purchases get a
    * doubled value one hour later; the merge must surface exactly
    * those updated rows plus untouched originals.
    */
  val qUpsertMerge: QueryDef = QueryDef(
    run = (s, dir) => {
      val base = t(s, dir, "events")
      val updates = base
        .filter(col("event_type") === "purchase")
        .withColumn("value", col("value") * 2)
        .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR"))
      UpsertWriter.merge(base.unionByName(updates), Seq("event_id"), "ts")
    },
    oracle = Some(
      """WITH updates AS (
        |  SELECT event_id, ts + INTERVAL 1 HOUR AS ts, user_id, event_type, value * 2 AS value, props
        |  FROM events WHERE event_type = 'purchase'
        |), unioned AS (
        |  SELECT * FROM events UNION ALL SELECT * FROM updates
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts DESC) AS rn FROM unioned
        |)
        |SELECT event_id, ts, user_id, event_type, value, props FROM ranked WHERE rn = 1""".stripMargin))

  /** #13/#21 KV/JSON scan: typed extraction from the events.props
    * JSON column (reference: template.py:284-294), then an aggregate
    * over the extracted field — no UDF, fully codegen'd from_json.
    */
  val qJsonExtract: QueryDef = QueryDef(
    run = (s, dir) =>
      t(s, dir, "events")
        .withColumn("k", from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType)))).getField("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"), max(col("k")).as("max_k")),
    oracle = Some(
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
        |       CAST(max(CAST(props->>'k' AS INTEGER)) AS INTEGER) AS max_k
        |FROM events GROUP BY event_type""".stripMargin))

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

  // ---------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------

  val all: Map[String, QueryDef] = Map(
    "q_full_load" -> qFullLoad,
    "q_inc_load" -> qIncLoad,
    "q_report_urgent" -> qReportUrgent,
    "q_csv_roundtrip" -> qCsvRoundtrip,
    "q_upsert_merge" -> qUpsertMerge,
    "q_json_extract" -> qJsonExtract,
    "q1_agg" -> q1Agg,
    "q3_top_orders" -> q3TopOrders,
    "q5_star_join" -> q5StarJoin,
    "q_window_running" -> qWindowRunning,
    "q_topk_per_group" -> qTopkPerGroup,
    "q_anti_join" -> qAntiJoin)
}
