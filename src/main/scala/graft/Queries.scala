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
      // filter the RAW nanos column so the watermark is a pushed
      // parquet predicate, then normalize (see readSinceNanos)
      rdr.readSinceNanos(s.read.parquet(s"$dir/events.parquet"), "ts", incWatermark)
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

  /** #6b JSON-lines report sink roundtrip: the flagship transform
    * written through ReportWriter as JSONL and read back with the
    * declared schema — same losslessness contract as the CSV path
    * (doubles survive via shortest-round-trip serialization; NTZ
    * timestamps via the declared read schema).
    */
  val qJsonlRoundtrip: QueryDef = QueryDef(
    run = (s, dir) => {
      val result = new ReportPipeline(s, scratch("ckpt-jsonl")).transform(reportSpec(dir))
      val writer = new ReportWriter(scratch("report-root-jsonl"))
      val handle = writer.write(result, format = "json")
      s.read.schema(result.schema).json(handle.path)
    },
    oracle = Some(reportSql))

  /** #2b Incremental aggregate maintenance: the per-(user, type)
    * rollup is built from TWO increments split at the incremental
    * watermark — history is never rescanned on the second refresh —
    * and must equal the full recompute bit-for-bit (count and decimal
    * sum are associative and exact).
    */
  val qIncAgg: QueryDef = QueryDef(
    run = (s, dir) => {
      val statePath = scratch("inc-agg-state")
      val ev = t(s, dir, "events")
      val keys = Seq("user_id", "event_type")
      graft.operators.IncrementalAgg.refreshTable(
        s, statePath, ev.filter(col("ts") <= lit(incWatermark).cast("timestamp_ntz")), keys, "value",
        batchId = Some(1L))
      graft.operators.IncrementalAgg.refreshTable(
        s, statePath, ev.filter(col("ts") > lit(incWatermark).cast("timestamp_ntz")), keys, "value",
        batchId = Some(2L))
      // at-least-once delivery replays batch 2: the applied-batch
      // high-water mark (committed atomically with the state) makes
      // the redelivery a no-op — if it double-counted, the oracle
      // hash below would catch it
      graft.operators.IncrementalAgg.refreshTable(
        s, statePath, ev.filter(col("ts") > lit(incWatermark).cast("timestamp_ntz")), keys, "value",
        batchId = Some(2L))
      graft.operators.IncrementalAgg.read(s, statePath, keys)
        .select(col("user_id"), col("event_type"), col("n"),
          col("sum_dec").cast("double").as("sum_value"))
    },
    oracle = Some(
      """SELECT user_id, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id, event_type""".stripMargin))

  /** #2e Retraction-aware incremental aggregate maintenance
    * ([[graft.operators.IncrementalAgg.refreshFromChanges]]): the
    * rollup built from the base snapshot stays exact under a CDC
    * batch carrying INSERTS, DELETES and UPDATE pre/post images
    * (purchases doubled, errors deleted, clicks re-keyed — the
    * q_cdc_feed scenario) — pre-images subtract, post-images add,
    * fully-deleted groups tombstone to n=0 and readLive drops them.
    * The replayed batch proves the at-least-once guard. The oracle
    * recomputes the aggregate over the NEW snapshot directly.
    */
  val qIncAggCdc: QueryDef = QueryDef(
    run = (s, dir) => {
      val statePath = scratch("inc-agg-cdc-state")
      val base = t(s, dir, "events")
      val next = base
        .filter(col("event_type") =!= "error" && col("event_type") =!= "purchase")
        .unionByName(base.filter(col("event_type") === "purchase")
          .withColumn("value", col("value") * 2)
          .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR")))
        .unionByName(base.filter(col("event_type") === "click")
          .withColumn("event_id", col("event_id") + 20000000L))
      val keys = Seq("user_id", "event_type")
      graft.operators.IncrementalAgg.refreshTable(
        s, statePath, base, keys, "value", batchId = Some(1L))
      val feed = graft.operators.SnapshotDiff.changeFeed(base, next, keys = Seq("event_id"))
      graft.operators.IncrementalAgg.refreshFromChanges(
        s, statePath, feed, keys, "value", batchId = Some(2L))
      // at-least-once redelivery of the CDC batch must be a no-op
      graft.operators.IncrementalAgg.refreshFromChanges(
        s, statePath, feed, keys, "value", batchId = Some(2L))
      graft.operators.IncrementalAgg.readLive(s, statePath, keys)
        .select(col("user_id"), col("event_type"), col("n"),
          col("sum_dec").cast("double").as("sum_value"))
    },
    oracle = Some(
      """WITH next AS (
        |  SELECT * FROM events WHERE event_type NOT IN ('error', 'purchase')
        |  UNION ALL
        |  SELECT event_id, ts + INTERVAL 1 HOUR AS ts, user_id, event_type,
        |         value * 2 AS value, props
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT event_id + 20000000 AS event_id, ts, user_id, event_type, value, props
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT user_id, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM next GROUP BY user_id, event_type""".stripMargin))

  /** #2c Incremental JOIN-view maintenance: revenue by market segment
    * over orders ⋈ customer, with BOTH sides changing — orders arrive
    * as two increments split at a date watermark (fact history is
    * never rescanned; per-custkey partials fold), and the customer
    * dim is then patched (every custkey % 10 == 0 moves to segment
    * 'MOVED') as a latest-wins upsert. The read joins the two compact
    * states and must equal the full recompute over the final inputs
    * bit-for-bit.
    */
  val qIncJoin: QueryDef = QueryDef(
    run = (s, dir) => {
      import graft.operators.IncrementalJoinView
      val factState = scratch("inc-join-fact")
      val dimState = scratch("inc-join-dim")
      val o = t(s, dir, "orders")
      val cut = lit("1995-01-01").cast("timestamp_ntz")
      IncrementalJoinView.refreshFact(
        s, factState, o.filter(col("o_orderdate") <= cut), "o_custkey", "o_totalprice",
        batchId = Some(1L))
      IncrementalJoinView.refreshFact(
        s, factState, o.filter(col("o_orderdate") > cut), "o_custkey", "o_totalprice",
        batchId = Some(2L))
      // replayed fact increment: skipped by the high-water mark; a
      // double-count would fail the oracle hash
      IncrementalJoinView.refreshFact(
        s, factState, o.filter(col("o_orderdate") > cut), "o_custkey", "o_totalprice",
        batchId = Some(2L))
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      IncrementalJoinView.refreshDim(
        s, dimState, c.withColumn("_ver", lit(1L)), "c_custkey", "_ver")
      IncrementalJoinView.refreshDim(
        s, dimState,
        c.filter(col("c_custkey") % 10 === 0)
          .withColumn("c_mktsegment", lit("MOVED")).withColumn("_ver", lit(2L)),
        "c_custkey", "_ver")
      IncrementalJoinView.read(s, factState, dimState,
          joinKey = "o_custkey", dimKey = "c_custkey", groupCol = "c_mktsegment")
        .select(col("c_mktsegment"), col("n").as("n_orders"),
          col("sum_dec").cast("double").as("revenue"))
    },
    oracle = Some(
      """WITH dim AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 10 = 0 THEN 'MOVED' ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer
        |)
        |SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM orders JOIN dim ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin))

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

  /** #10f Delete operation on the versioned table (Hudi DELETE
    * analog): ingest events, tombstone every 'view' event's key, read
    * the post-delete snapshot. The delete-key batch broadcasts; the
    * oracle is the surviving set.
    */
  val qUpsertDelete: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("upsert-delete")
      val base = t(s, dir, "events")
      UpsertWriter.upsert(base, target, Seq("event_id"), "ts")
      UpsertWriter.delete(s, target,
        base.filter(col("event_type") === "view").select("event_id"), Seq("event_id"))
      UpsertWriter.read(s, target)
    },
    oracle = Some("SELECT * FROM events WHERE event_type <> 'view'"))

  /** #12d Compaction table service, oracled end-to-end: the events
    * table committed as many small files, compacted to target size as
    * a NEW version — the read-back must be content-identical to the
    * source (layout-only change; the file-count property is
    * spec-locked separately).
    */
  val qCompact: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("compact-svc")
      UpsertWriter.upsert(t(s, dir, "events"), target,
        recordKeys = Seq("event_id"), precombine = "ts",
        targetFileBytes = 64L * 1024) // force a small-file version
      UpsertWriter.compact(s, target, targetFileBytes = 512L * 1024 * 1024)
      UpsertWriter.read(s, target)
    },
    oracle = Some("SELECT * FROM events"))

  /** #10l Savepoint restore, oracled end-to-end: v1 = events, v2
    * doubles purchase values, restore(v1) re-commits v1's CONTENT as
    * v3 — the live read must equal the original table (append-only
    * timeline; the timeline shape is spec-locked separately).
    */
  val qRestore: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("restore-svc")
      val base = t(s, dir, "events")
      UpsertWriter.upsert(base, target, Seq("event_id"), "ts", keepVersions = 3)
      UpsertWriter.upsert(
        base.withColumn("value",
          when(col("event_type") === "purchase", col("value") * 2).otherwise(col("value"))),
        target, Seq("event_id"), "ts", keepVersions = 3)
      UpsertWriter.restore(s, target, version = 1, keepVersions = 3)
      UpsertWriter.read(s, target)
    },
    oracle = Some("SELECT * FROM events"))

  /** #12 Clustered (sorted-within-partition) file layout, oracled as
    * a lossless round-trip: clustering is layout-only, so the
    * read-back equals the source table (the per-file value-span
    * property is spec-locked separately).
    */
  val qClusteredRead: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("clustered-read")
      UpsertWriter.upsert(t(s, dir, "events"), target,
        recordKeys = Seq("event_id"), precombine = "ts",
        clusterBy = Seq("value"))
      UpsertWriter.read(s, target)
    },
    oracle = Some("SELECT * FROM events"))

  /** #14n Catalog sync (the reference's hive_sync,
    * generate_hudi_table.py:121-130): upsert events into a versioned
    * table with catalog registration, then read it back BY NAME via
    * `spark.table` — no temp view, no path. Oracled as the full
    * snapshot: what the catalog name resolves to must be exactly the
    * committed version's content.
    */
  val qCatalogRead: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("catalog-read")
      UpsertWriter.upsert(t(s, dir, "events"), target,
        recordKeys = Seq("event_id"), precombine = "ts",
        syncTable = Some("graft_catalog_events"))
      s.catalog.refreshTable("graft_catalog_events")
      s.table("graft_catalog_events")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    },
    oracle = Some("SELECT * FROM events"))

  /** #11 Hive-partitioned versioned write + partition-pruned read:
    * events upserted into a table partitioned by event_type, read
    * back filtered to ONE partition — the scan must touch only that
    * partition's files (PlanSpec asserts the PartitionFilters), and
    * the round-trip must be lossless vs the raw table.
    */
  val qPartitionPrune: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("upsert-partitioned")
      UpsertWriter.upsert(t(s, dir, "events"), target,
        recordKeys = Seq("event_id"), precombine = "ts",
        partitionBy = Seq("event_type"))
      UpsertWriter.read(s, target)
        .filter(col("event_type") === "click")
        // partition columns come back string-typed and appended last;
        // restore the original column order and keep the value as-is
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    },
    oracle = Some("SELECT * FROM events WHERE event_type = 'click'"))

  /** #12b Bucketed co-located join: orders and lineitem bucketed on
    * the join key — the join plans with ZERO exchanges (PlanSpec
    * asserts it); this query checks the bucketed storage path is also
    * CORRECT end-to-end against the plain-join oracle.
    */
  private val bucketedFor = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
  val qBucketedJoin: QueryDef = QueryDef(
    run = (s, dir) => {
      // table prep is ingest (one-time DDL per source dir), not the
      // query — memoize like the streaming dir staging, so reps and
      // repeat runs measure the exchange-free join itself
      // table names carry a dir hash: two source dirs in one JVM must
      // not share (or clobber) each other's bucketed tables
      val tag = java.lang.Long.toHexString(
        org.apache.spark.unsafe.types.UTF8String.fromString(dir).hashCode().toLong & 0xffffffffL)
      val (ordersTbl, lineitemTbl) = (s"graft_q_orders_b_$tag", s"graft_q_lineitem_b_$tag")
      bucketedFor.computeIfAbsent(dir, { _ =>
        graft.sources.Bucketing.writeBucketed(
          t(s, dir, "orders"), ordersTbl, Seq("o_orderkey"), buckets = 8)
        graft.sources.Bucketing.writeBucketed(
          t(s, dir, "lineitem"), lineitemTbl, Seq("l_orderkey"), buckets = 8)
        true
      })
      graft.sources.Bucketing.table(s, ordersTbl)
        .join(graft.sources.Bucketing.table(s, lineitemTbl),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"),
          sum((col("l_extendedprice").cast("decimal(18,2)") * (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,6)")).cast("double").as("revenue"))
    },
    oracle = Some(
      """SELECT o_orderstatus, count(*) AS n_items,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus""".stripMargin))

  /** #10d Time travel: two upserts build a two-version timeline;
    * reading VERSION 1 must return the pre-update snapshot exactly
    * (the raw events — event_id is unique, so the first merge is an
    * identity), while the latest read reflects the update. The latest
    * read is q_upsert_merge's territory; here the oracle pins the
    * archived version.
    */
  val qTimeTravel: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("upsert-timetravel")
      val base = t(s, dir, "events")
      UpsertWriter.upsert(base, target, Seq("event_id"), "ts", keepVersions = 3)
      val updates = base.filter(col("event_type") === "purchase")
        .withColumn("value", col("value") * 2)
        .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR"))
      UpsertWriter.upsert(updates, target, Seq("event_id"), "ts", keepVersions = 3)
      UpsertWriter.readVersion(s, target, 1)
    },
    oracle = Some("SELECT * FROM events"))

  /** #10t Deep clone ([[graft.sources.TableClone.deepClone]]): the
    * 2-version events table is physically copied — history and all —
    * and the CLONE then takes an upsert (purchases doubled) the
    * SOURCE must not see. Output: per-type rollups of the source
    * live, clone live, and clone's time-traveled v1, proving copy
    * fidelity, write isolation, and history portability in one
    * result; the oracle recomputes all three states.
    */
  val qClone: QueryDef = QueryDef(
    run = (s, dir) => {
      val src = scratch("clone-src")
      val dst = scratch("clone-dst")
      val base = t(s, dir, "events")
      UpsertWriter.upsert(
        base.filter(col("ts") <= lit(incWatermark).cast("timestamp_ntz")),
        src, Seq("event_id"), "ts", keepVersions = 3)
      UpsertWriter.upsert(
        base.filter(col("ts") > lit(incWatermark).cast("timestamp_ntz")),
        src, Seq("event_id"), "ts", keepVersions = 3)
      graft.sources.TableClone.deepClone(s, src, dst)
      UpsertWriter.upsert(
        base.filter(col("event_type") === "purchase")
          .withColumn("value", col("value") * 2)
          .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR")),
        dst, Seq("event_id"), "ts", keepVersions = 3)
      def rollup(df: DataFrame, side: String) = df
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))
        .withColumn("side", lit(side))
      rollup(UpsertWriter.read(s, src), "source")
        .unionByName(rollup(UpsertWriter.read(s, dst), "clone"))
        .unionByName(rollup(UpsertWriter.readVersion(s, dst, 1), "clone_v1"))
    },
    oracle = Some(
      s"""SELECT event_type, count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
         |  'source' AS side
         |FROM events GROUP BY 1
         |UNION ALL
         |SELECT event_type, count(*),
         |  CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value * 2 ELSE value END
         |       AS DECIMAL(28,6))) AS DOUBLE), 'clone'
         |FROM events GROUP BY 1
         |UNION ALL
         |SELECT event_type, count(*),
         |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 'clone_v1'
         |FROM events WHERE ts <= TIMESTAMP '$incWatermark' GROUP BY 1""".stripMargin))

  /** #38d Right-to-be-forgotten purge
    * ([[graft.sources.UpsertWriter.purge]]): a 2-version events table
    * forgets every user whose id ≡ 0 (mod 97) — the subjects' rows
    * vanish from the LIVE snapshot AND the retained HISTORY (a plain
    * delete only advances the head; time travel would still leak the
    * subject). Output: per-version per-type counts over both
    * retained snapshots after the purge; the oracle recomputes each
    * version's post-erasure state from first principles.
    */
  val qPurge: QueryDef = QueryDef(
    run = (s, dir) => {
      val target = scratch("upsert-purge")
      val base = t(s, dir, "events")
      UpsertWriter.upsert(
        base.filter(col("ts") <= lit(incWatermark).cast("timestamp_ntz")),
        target, Seq("event_id"), "ts", keepVersions = 3)
      UpsertWriter.upsert(
        base.filter(col("ts") > lit(incWatermark).cast("timestamp_ntz")),
        target, Seq("event_id"), "ts", keepVersions = 3)
      val forget = base.filter(col("user_id") % 97L === 0L).select("user_id")
      UpsertWriter.purge(s, target, forget, Seq("user_id"))
      UpsertWriter.readVersion(s, target, 1).withColumn("version", lit(1))
        .unionByName(UpsertWriter.readVersion(s, target, 2).withColumn("version", lit(2)))
        .groupBy(col("version"), col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
    },
    oracle = Some(
      s"""SELECT 1 AS version, event_type, count(*) AS n,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM events
         |WHERE ts <= TIMESTAMP '$incWatermark' AND user_id % 97 <> 0
         |GROUP BY 2
         |UNION ALL
         |SELECT 2, event_type, count(*), CAST(count(DISTINCT user_id) AS BIGINT)
         |FROM events WHERE user_id % 97 <> 0
         |GROUP BY 2""".stripMargin))

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

  /** #13b Semi-structured VARIANT ingestion (Spark 4 native type):
    * props parsed once with `parse_json` into a VARIANT column, then
    * path-extracted with `variant_get` — the open-schema JSON path
    * that skips per-field from_json schemas (and shreds at the
    * storage layer at scale). Same rollup and oracle shape as the
    * schema-declared extraction in q_json_extract.
    */
  val qVariantExtract: QueryDef = QueryDef(
    run = (s, dir) =>
      t(s, dir, "events")
        .withColumn("_v", parse_json(col("props")))
        .withColumn("k", variant_get(col("_v"), "$.k", "int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"),
          max(col("k")).as("max_k")),
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
  private val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
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
      """SELECT ((user_id % 2147483648) * 2654435761) % 2147483648 % 5 AS fold,
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
  private val profileCols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate")
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

  // ---------------------------------------------------------------
  // LLM-data-pipeline surface
  // ---------------------------------------------------------------

  private val enStops = graft.operators.TextAnalysis.Stopwords.toMap.apply("en")
  private def duckList(words: Seq[String]): String = words.map(w => s"'$w'").mkString("[", ", ", "]")
  private def duckHits(words: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), x -> list_contains(${duckList(words)}, x)))"

  /** #32 Token counting: whitespace and BPE-ish regex tokens. */
  val qTextTokens: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.TextAnalysis.withTokenCounts(t(s, dir, "documents"))
        .select(col("doc_id"), col("ws_tokens").cast("long").as("ws_tokens"),
          col("bpe_ish_tokens").cast("long").as("bpe_ish_tokens")),
    oracle = Some(
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_ish_tokens
        |FROM documents""".stripMargin))

  /** #31 Quality scoring: length/token/stopword metrics + composite. */
  val qTextQuality: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.TextAnalysis.withQuality(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_chars"), col("n_tokens"),
          col("avg_token_len"), col("stopword_ratio"), col("quality_score")),
    oracle = Some(
      s"""WITH q AS (
         |  SELECT doc_id,
         |    length(text) AS nc,
         |    len(string_split(text, ' ')) AS nt,
         |    ${duckHits(enStops)} AS hits
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CAST(nc AS BIGINT) AS n_chars,
         |  CAST(nt AS BIGINT) AS n_tokens,
         |  CAST(nc - (nt - 1) AS DOUBLE) / nt AS avg_token_len,
         |  CAST(hits AS DOUBLE) / nt AS stopword_ratio,
         |  least(1.0, (CAST(nt AS DOUBLE) / 100) * 0.5 + ((CAST(hits AS DOUBLE) / nt) * 5) * 0.5) AS quality_score
         |FROM q""".stripMargin))

  /** Shared DuckDB re-derivation of the stopword-vote language ID:
    * the h/m CTE block and the winner CASE — used by the langid
    * query and by its classification-report evaluation (#84b).
    */
  private val langidCtes: String = {
    val hits = graft.operators.TextAnalysis.Stopwords
      .map { case (code, words) => s"${duckHits(words)} AS c_$code" }
      .mkString(",\n    ")
    val codes = graft.operators.TextAnalysis.Stopwords.map(_._1)
    s"""h AS (
       |  SELECT doc_id, lang, $hits
       |  FROM documents
       |), m AS (
       |  SELECT *, greatest(${codes.map("c_" + _).mkString(", ")}) AS m FROM h
       |)""".stripMargin
  }
  private val langidCase: String = {
    val whens = graft.operators.TextAnalysis.Stopwords.map(_._1)
      .map(c => s"WHEN c_$c = m THEN '$c'").mkString(" ")
    s"CASE WHEN m = 0 THEN 'und' $whens ELSE 'und' END"
  }

  /** #30 Language ID by stopword voting; deterministic tie-break. */
  val qTextLangid: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.TextAnalysis.withLangId(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("lang_pred")),
    oracle = Some(
      s"""WITH $langidCtes
         |SELECT doc_id, lang,
         |  $langidCase AS lang_pred
         |FROM m""".stripMargin))

  /** #84b Classification report of the langid heuristic against the
    * corpus truth label: per-class (tp, fp, fn) from one contingency
    * pass, precision/recall/F1 in floor-divided basis points — all
    * integer arithmetic, so the whole evaluation hash-matches DuckDB
    * (see [[graft.operators.Evaluation.classificationReport]]).
    */
  val qEvalLangid: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.classificationReport(
        graft.operators.TextAnalysis.withLangId(t(s, dir, "documents")),
        col("lang"), col("lang_pred")),
    oracle = Some(
      s"""WITH $langidCtes, p AS (
         |  SELECT lang AS truth, $langidCase AS pred FROM m
         |), cells AS (
         |  SELECT truth, pred, count(*) AS n FROM p GROUP BY 1, 2
         |), tpx AS (
         |  SELECT truth AS label, n AS tp FROM cells WHERE truth = pred
         |), bt AS (
         |  SELECT truth AS label, sum(n) AS n_truth FROM cells GROUP BY 1
         |), bpp AS (
         |  SELECT pred AS label, sum(n) AS n_pred FROM cells GROUP BY 1
         |), j AS (
         |  SELECT coalesce(bt.label, bpp.label) AS label,
         |         coalesce(tpx.tp, 0) AS tp,
         |         coalesce(bpp.n_pred, 0) - coalesce(tpx.tp, 0) AS fp,
         |         coalesce(bt.n_truth, 0) - coalesce(tpx.tp, 0) AS fn
         |  FROM bt FULL JOIN bpp ON bt.label = bpp.label
         |  LEFT JOIN tpx ON coalesce(bt.label, bpp.label) = tpx.label
         |)
         |SELECT label, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
         |  CAST(fn AS BIGINT) AS fn,
         |  CASE WHEN tp + fp = 0 THEN NULL
         |       ELSE CAST(tp * 10000 // (tp + fp) AS BIGINT) END AS precision_bp,
         |  CASE WHEN tp + fn = 0 THEN NULL
         |       ELSE CAST(tp * 10000 // (tp + fn) AS BIGINT) END AS recall_bp,
         |  CASE WHEN tp * 2 + fp + fn = 0 THEN NULL
         |       ELSE CAST(tp * 20000 // (tp * 2 + fp + fn) AS BIGINT) END AS f1_bp
         |FROM j""".stripMargin))

  /** #84f Incremental classification-report maintenance: the
    * contingency cells are ADDITIVE counts, so the model-quality
    * report stays current as batches arrive by folding each batch's
    * cells into the replay-safe IncrementalAgg state and deriving the
    * report from the stored cells — continuous eval monitoring at
    * O(batch) cost, never rescoring history. Associativity makes the
    * result equal the one-shot report bit-for-bit (SAME oracle as
    * q_eval_report); batch 2 is replayed to prove the fold is
    * exactly-once under at-least-once delivery.
    */
  val qEvalReportInc: QueryDef = QueryDef(
    run = (s, dir) => {
      val statePath = scratch("eval-report-inc")
      val scored = graft.operators.TextAnalysis.withLangId(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang").as("truth"), col("lang_pred").as("pred"),
          lit(1L).as("one"))
      def fold(batch: org.apache.spark.sql.DataFrame, id: Long) =
        graft.operators.IncrementalAgg.refreshTable(
          s, statePath, batch.drop("doc_id"), Seq("truth", "pred"), "one",
          batchId = Some(id))
      fold(scored.filter(col("doc_id") % 2 === 0), 1L)
      fold(scored.filter(col("doc_id") % 2 === 1), 2L)
      fold(scored.filter(col("doc_id") % 2 === 1), 2L) // replay: must be a no-op
      graft.operators.Evaluation.reportFromCells(
        graft.operators.IncrementalAgg.read(s, statePath, Seq("truth", "pred"))
          .select(col("truth"), col("pred"), col("n")))
    },
    oracle = qEvalLangid.oracle)

  /** #84g Operating-threshold selection: smallest word-count cutoff
    * at which the quality gate holds with ≥ 80% precision — the
    * highest-recall cutoff meeting the precision bar, from the exact
    * cumulative curve (precision is non-monotone, so this is an
    * argmin over the curve, not a binary search; see
    * [[graft.operators.Evaluation.precisionThreshold]]).
    */
  val qEvalThreshold: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.precisionThreshold(
        graft.operators.TextAnalysis.qualityLinear(t(s, dir, "documents")),
        col("q_pass"), col("n_words"), targetBp = 8000L),
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
        |  SELECT n_words, stop_hits,
        |    CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END AS mwl10
        |  FROM m
        |), s AS (
        |  SELECT (2 * least(n_words, 100) + 25 * stop_hits - abs(mwl10 - 50)) >= 220 AS label,
        |         n_words AS score
        |  FROM f
        |), bys AS (
        |  SELECT score,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
        |    sum(CASE WHEN label THEN 0 ELSE 1 END) AS n_neg
        |  FROM s GROUP BY score
        |), cum AS (
        |  SELECT score,
        |    sum(n_pos) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS tp,
        |    sum(n_neg) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS fp
        |  FROM bys
        |), curve AS (
        |  SELECT score, tp, fp, CAST(tp * 10000 // (tp + fp) AS BIGINT) AS precision_bp
        |  FROM cum
        |), best AS (
        |  SELECT min(score) AS threshold FROM curve WHERE precision_bp >= 8000
        |)
        |SELECT best.threshold,
        |  CAST(curve.tp AS BIGINT) AS tp, CAST(curve.fp AS BIGINT) AS fp,
        |  curve.precision_bp,
        |  CAST(curve.tp + curve.fp AS BIGINT) AS n_kept
        |FROM best LEFT JOIN curve ON curve.score = best.threshold""".stripMargin))

  /** #84 Exact ROC AUC of the linear quality score against the
    * is-English label, Mann-Whitney tie convention, computed on the
    * grouped score distribution (one aggregation + a
    * |distinct scores|-sized window — never row pairs; see
    * [[graft.operators.Evaluation.aucExact]]). Doubled-U numerator
    * and floor division keep it integer-exact end to end.
    */
  val qEvalAuc: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.aucExact(
        graft.operators.TextAnalysis.qualityLinear(t(s, dir, "documents")),
        col("lang") === "en", col("q_score"))
        .select(col("n_pos"), col("n_neg"), col("auc_bp")),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
        |), m AS (
        |  SELECT doc_id, lang,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS BIGINT) AS stop_hits
        |  FROM t
        |), f AS (
        |  SELECT doc_id, lang, n_words, stop_hits,
        |    CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END AS mwl10
        |  FROM m
        |), scored AS (
        |  SELECT (lang = 'en') AS label,
        |    2 * least(n_words, 100) + 25 * stop_hits - abs(mwl10 - 50) AS score
        |  FROM f
        |), bys AS (
        |  SELECT score,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
        |    sum(CASE WHEN label THEN 0 ELSE 1 END) AS n_neg
        |  FROM scored GROUP BY score
        |), r AS (
        |  SELECT *, coalesce(sum(n_neg) OVER (ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
        |  FROM bys
        |)
        |SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
        |       CAST(sum(n_neg) AS BIGINT) AS n_neg,
        |       CAST(sum(n_pos * (2 * neg_below + n_neg)) * 10000
        |            // (2 * sum(n_pos) * sum(n_neg)) AS BIGINT) AS auc_bp
        |FROM r""".stripMargin))

  /** #84e Per-segment exact ROC AUC (grouped by `source`): the slice
    * view that catches a classifier that's great on average and
    * broken on one segment. The running-sum window partitions by the
    * group — the preferred scale shape whenever a segmentation
    * exists (see [[graft.operators.Evaluation.aucExactBy]]).
    */
  val qEvalAucBy: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.aucExactBy(
        graft.operators.TextAnalysis.qualityLinear(t(s, dir, "documents")),
        col("source"), col("lang") === "en", col("q_score"))
        .select(col("grp").as("source"), col("n_pos"), col("n_neg"), col("auc_bp")),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM documents
        |), m AS (
        |  SELECT doc_id, lang, source,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS BIGINT) AS stop_hits
        |  FROM t
        |), f AS (
        |  SELECT doc_id, lang, source, n_words, stop_hits,
        |    CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END AS mwl10
        |  FROM m
        |), scored AS (
        |  SELECT source, (lang = 'en') AS label,
        |    2 * least(n_words, 100) + 25 * stop_hits - abs(mwl10 - 50) AS score
        |  FROM f
        |), bys AS (
        |  SELECT source, score,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
        |    sum(CASE WHEN label THEN 0 ELSE 1 END) AS n_neg
        |  FROM scored GROUP BY 1, 2
        |), r AS (
        |  SELECT *, coalesce(sum(n_neg) OVER (PARTITION BY source ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
        |  FROM bys
        |)
        |SELECT source,
        |  CAST(sum(n_pos) AS BIGINT) AS n_pos,
        |  CAST(sum(n_neg) AS BIGINT) AS n_neg,
        |  CASE WHEN sum(n_pos) = 0 OR sum(n_neg) = 0 THEN NULL
        |       ELSE CAST(sum(n_pos * (2 * neg_below + n_neg)) * 10000
        |                 // (2 * sum(n_pos) * sum(n_neg)) AS BIGINT) END AS auc_bp
        |FROM r GROUP BY source""".stripMargin))

  /** #85 Exact average precision (PR-AUC) of the linear quality score
    * against the is-English label — the imbalance-robust companion to
    * #84: step-interpolated AP with one threshold per distinct score
    * (tied rows enter as one block), computed on the grouped score
    * distribution with per-block precision floor-quantized to 10⁻¹²
    * (see [[graft.operators.Evaluation.averagePrecision]]).
    */
  val qEvalPrAuc: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.averagePrecision(
        graft.operators.TextAnalysis.qualityLinear(t(s, dir, "documents")),
        col("lang") === "en", col("q_score")),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
        |), m AS (
        |  SELECT doc_id, lang,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS BIGINT) AS stop_hits
        |  FROM t
        |), f AS (
        |  SELECT doc_id, lang, n_words, stop_hits,
        |    CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END AS mwl10
        |  FROM m
        |), scored AS (
        |  SELECT (lang = 'en') AS label,
        |    2 * least(n_words, 100) + 25 * stop_hits - abs(mwl10 - 50) AS score
        |  FROM f
        |), bys AS (
        |  SELECT score,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
        |    sum(CASE WHEN label THEN 0 ELSE 1 END) AS n_neg
        |  FROM scored GROUP BY score
        |), cum AS (
        |  SELECT n_pos, n_neg,
        |    sum(n_pos) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS tp,
        |    sum(n_neg) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING) AS fp
        |  FROM bys
        |), q AS (
        |  SELECT n_pos, n_neg,
        |    CAST(tp AS HUGEINT) * 1000000000000 // (tp + fp) AS prec_q12
        |  FROM cum
        |)
        |SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
        |       CAST(sum(n_neg) AS BIGINT) AS n_neg,
        |       CAST(sum(CAST(n_pos AS HUGEINT) * prec_q12) * 10000
        |            // (CAST(sum(n_pos) AS HUGEINT) * 1000000000000) AS BIGINT) AS ap_bp
        |FROM q""".stripMargin))

  /** #85b Per-segment exact average precision (grouped by `source`):
    * the PR-side slice view matching #84e — per-segment windows are
    * the preferred scale shape (see
    * [[graft.operators.Evaluation.averagePrecisionBy]]).
    */
  val qEvalPrAucBy: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.averagePrecisionBy(
        graft.operators.TextAnalysis.qualityLinear(t(s, dir, "documents")),
        col("source"), col("lang") === "en", col("q_score"))
        .select(col("grp").as("source"), col("n_pos"), col("n_neg"), col("ap_bp")),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM documents
        |), m AS (
        |  SELECT doc_id, lang, source,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS BIGINT) AS stop_hits
        |  FROM t
        |), f AS (
        |  SELECT doc_id, lang, source, n_words, stop_hits,
        |    CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END AS mwl10
        |  FROM m
        |), scored AS (
        |  SELECT source, (lang = 'en') AS label,
        |    2 * least(n_words, 100) + 25 * stop_hits - abs(mwl10 - 50) AS score
        |  FROM f
        |), bys AS (
        |  SELECT source, score,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
        |    sum(CASE WHEN label THEN 0 ELSE 1 END) AS n_neg
        |  FROM scored GROUP BY 1, 2
        |), cum AS (
        |  SELECT source, n_pos, n_neg,
        |    sum(n_pos) OVER (PARTITION BY source ORDER BY score DESC
        |      ROWS UNBOUNDED PRECEDING) AS tp,
        |    sum(n_neg) OVER (PARTITION BY source ORDER BY score DESC
        |      ROWS UNBOUNDED PRECEDING) AS fp
        |  FROM bys
        |), q AS (
        |  SELECT source, n_pos, n_neg,
        |    CAST(tp AS HUGEINT) * 1000000000000 // (tp + fp) AS prec_q12
        |  FROM cum
        |)
        |SELECT source,
        |  CAST(sum(n_pos) AS BIGINT) AS n_pos,
        |  CAST(sum(n_neg) AS BIGINT) AS n_neg,
        |  CASE WHEN sum(n_pos) = 0 OR sum(n_neg) = 0 THEN NULL
        |       ELSE CAST(sum(CAST(n_pos AS HUGEINT) * prec_q12) * 10000
        |            // (CAST(sum(n_pos) AS HUGEINT) * 1000000000000) AS BIGINT) END AS ap_bp
        |FROM q GROUP BY source""".stripMargin))

  /** #84c Score-calibration table: the quality score rank-bucketed
    * into 10 bands on the grouped distribution (bin(s) =
    * ⌊rows_below(s)·10/n⌋ — all rows of one score share a bin, no
    * per-row tiebreak, no global row sort), per-band exact positive
    * rate in basis points (see [[graft.operators.Evaluation.calibration]]).
    */
  val qEvalCalibration: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.calibration(
        graft.operators.TextAnalysis.qualityLinear(t(s, dir, "documents")),
        col("lang") === "en", col("q_score"), nBins = 10),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
        |), m AS (
        |  SELECT doc_id, lang,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS BIGINT) AS stop_hits
        |  FROM t
        |), f AS (
        |  SELECT doc_id, lang, n_words, stop_hits,
        |    CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END AS mwl10
        |  FROM m
        |), scored AS (
        |  SELECT (lang = 'en') AS label,
        |    2 * least(n_words, 100) + 25 * stop_hits - abs(mwl10 - 50) AS score
        |  FROM f
        |), bys AS (
        |  SELECT score,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
        |    count(*) AS n
        |  FROM scored GROUP BY score
        |), r AS (
        |  SELECT *,
        |    coalesce(sum(n) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rows_below,
        |    sum(n) OVER () AS n_total
        |  FROM bys
        |), b AS (
        |  SELECT rows_below * 10 // n_total AS bin, n, n_pos, score FROM r
        |)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |  CAST(sum(n) AS BIGINT) AS n,
        |  CAST(sum(n_pos) AS BIGINT) AS n_pos,
        |  CAST(sum(n_pos) * 10000 // sum(n) AS BIGINT) AS pos_rate_bp,
        |  CAST(min(score) AS BIGINT) AS min_score,
        |  CAST(max(score) AS BIGINT) AS max_score
        |FROM b GROUP BY bin""".stripMargin))

  /** #84h Per-segment calibration (grouped by `source`, 4 bands):
    * each segment gets its own rank bands over ITS score
    * distribution — a score calibrated on average can be
    * mis-calibrated on one slice (see
    * [[graft.operators.Evaluation.calibrationBy]]).
    */
  val qEvalCalibrationBy: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.calibrationBy(
        graft.operators.TextAnalysis.qualityLinear(t(s, dir, "documents")),
        col("source"), col("lang") === "en", col("q_score"), nBins = 4)
        .withColumnRenamed("grp", "source"),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM documents
        |), m AS (
        |  SELECT doc_id, lang, source,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS BIGINT) AS stop_hits
        |  FROM t
        |), f AS (
        |  SELECT doc_id, lang, source, n_words, stop_hits,
        |    CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END AS mwl10
        |  FROM m
        |), scored AS (
        |  SELECT source, (lang = 'en') AS label,
        |    2 * least(n_words, 100) + 25 * stop_hits - abs(mwl10 - 50) AS score
        |  FROM f
        |), bys AS (
        |  SELECT source, score,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
        |    count(*) AS n
        |  FROM scored GROUP BY 1, 2
        |), r AS (
        |  SELECT *,
        |    coalesce(sum(n) OVER (PARTITION BY source ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rows_below,
        |    sum(n) OVER (PARTITION BY source) AS n_total
        |  FROM bys
        |), b AS (
        |  SELECT source, rows_below * 4 // n_total AS bin, n, n_pos, score FROM r
        |)
        |SELECT source, CAST(bin AS BIGINT) AS bin,
        |  CAST(sum(n) AS BIGINT) AS n,
        |  CAST(sum(n_pos) AS BIGINT) AS n_pos,
        |  CAST(sum(n_pos) * 10000 // sum(n) AS BIGINT) AS pos_rate_bp,
        |  CAST(min(score) AS BIGINT) AS min_score,
        |  CAST(max(score) AS BIGINT) AS max_score
        |FROM b GROUP BY source, bin""".stripMargin))

  /** #84d Cohen's kappa of the langid heuristic vs the truth label:
    * chance-corrected agreement from the same contingency pass as the
    * classification report, cross-multiplied exact, division
    * truncating toward zero on BOTH engines (DuckDB's `//` floors, so
    * the oracle sign-folds; see [[graft.operators.Evaluation.cohensKappa]]).
    */
  val qEvalKappa: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Evaluation.cohensKappa(
        graft.operators.TextAnalysis.withLangId(t(s, dir, "documents")),
        col("lang"), col("lang_pred")),
    oracle = Some(
      s"""WITH $langidCtes, p AS (
         |  SELECT lang AS truth, $langidCase AS pred FROM m
         |), cells AS (
         |  SELECT truth, pred, count(*) AS n FROM p GROUP BY 1, 2
         |), bt AS (
         |  SELECT truth AS label, sum(n) AS n_truth FROM cells GROUP BY 1
         |), bpp AS (
         |  SELECT pred AS label, sum(n) AS n_pred FROM cells GROUP BY 1
         |), ex AS (
         |  SELECT coalesce(sum(n_truth * n_pred), 0) AS sum_exp
         |  FROM bt JOIN bpp ON bt.label = bpp.label
         |), ag AS (
         |  SELECT sum(n) AS n,
         |    coalesce(sum(n) FILTER (truth = pred), 0) AS observed_agree
         |  FROM cells
         |)
         |SELECT CAST(n AS BIGINT) AS n,
         |  CAST(observed_agree AS BIGINT) AS observed_agree,
         |  CASE WHEN n * n - sum_exp = 0 THEN NULL
         |       WHEN n * observed_agree - sum_exp < 0 THEN
         |         CAST(-((-(n * observed_agree - sum_exp)) * 10000
         |               // (n * n - sum_exp)) AS BIGINT)
         |       ELSE
         |         CAST((n * observed_agree - sum_exp) * 10000
         |              // (n * n - sum_exp) AS BIGINT) END AS kappa_bp
         |FROM ag, ex""".stripMargin))

  /** #33 Fingerprint: 64-bit FNV-1a rolling hash (custom codegen'd
    * expression), fully oracled: the hash is deterministic integer
    * arithmetic, so DuckDB re-derives it from first principles —
    * normalize, expand codepoints to UTF-8 bytes (1–4 byte
    * sequences), then fold h = (h XOR byte) · prime in HUGEINT with
    * an explicit mod-2⁶⁴ wrap (the XOR only ever touches the low
    * byte, so it runs in BIGINT on acc%256), and re-sign the result
    * into BIGINT range at the end.
    */
  val qTextFingerprint: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.TextAnalysis.withFingerprint(t(s, dir, "documents"))
        .select(col("doc_id"), col("fingerprint")),
    oracle = Some(
      """WITH norm AS (
        |  SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS s FROM documents
        |), by AS (
        |  SELECT doc_id, flatten(list_transform(range(1, length(s)+1), i -> CASE
        |    WHEN unicode(s[i]) < 128 THEN [unicode(s[i])]
        |    WHEN unicode(s[i]) < 2048 THEN
        |      [192 + unicode(s[i]) // 64, 128 + unicode(s[i]) % 64]
        |    WHEN unicode(s[i]) < 65536 THEN
        |      [224 + unicode(s[i]) // 4096, 128 + (unicode(s[i]) // 64) % 64,
        |       128 + unicode(s[i]) % 64]
        |    ELSE
        |      [240 + unicode(s[i]) // 262144, 128 + (unicode(s[i]) // 4096) % 64,
        |       128 + (unicode(s[i]) // 64) % 64, 128 + unicode(s[i]) % 64]
        |  END)) AS bs
        |  FROM norm
        |), fp AS (
        |  SELECT doc_id, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |                 list_transform(bs, b -> CAST(b AS HUGEINT))),
        |    (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                 * 1099511628211) % 18446744073709551616
        |  ) AS h
        |  FROM by
        |)
        |SELECT doc_id,
        |  CAST(h - CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |                THEN CAST(18446744073709551616 AS HUGEINT)
        |                ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS fingerprint
        |FROM fp""".stripMargin))

  /** #23 Exact dedup: lowest doc_id survives per identical text. */
  val qDedupExact: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Dedup.exact(t(s, dir, "documents"), "text", "doc_id"),
    oracle = Some(
      """SELECT doc_id, text, lang, source, n_chars FROM (
        |  SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM documents
        |) WHERE rn = 1""".stripMargin))

  /** #26 Word-5-gram Jaccard near-dup pairs (inverted-index join). */
  val qDedupNgramJaccard: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text", n = 5, threshold = 0.5),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), s AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' '))) AS sh
        |  FROM t
        |), sizes AS (
        |  SELECT doc_id, count(*) AS nsh FROM s GROUP BY doc_id
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b,
        |       CAST(common AS DOUBLE) / (sa.nsh + sb.nsh - common) AS jaccard
        |FROM pairs
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE CAST(common AS DOUBLE) / (sa.nsh + sb.nsh - common) >= 0.5""".stripMargin))

  /** #26d Prefix-filtered Jaccard pairs (PPJoin): provably EXACT
    * result of the full inverted-index join from a fraction of the
    * candidate space — the oracle is therefore dedup_ngram_jaccard's
    * oracle verbatim.
    */
  val qDedupPrefix: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Dedup.prefixFilteredJaccardPairs(
        t(s, dir, "documents"), "doc_id", "text", n = 5, threshold = 0.5),
    oracle = qDedupNgramJaccard.oracle)

  /** #26b Edit-distance near-dup pairs: shingle-Jaccard candidates
    * (>= 0.2) verified by bounded Levenshtein (<= 30). Spark trades
    * hashed 8-byte shingles and short-circuits the DP at the
    * threshold; the oracle re-runs BOTH defining filters on raw
    * strings.
    */
  val qDedupEditdist: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Dedup.editDistancePairs(t(s, dir, "documents"), "doc_id", "text"),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
        |), s AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' '))) AS sh
        |  FROM t
        |), sizes AS (
        |  SELECT doc_id, count(*) AS nsh FROM s GROUP BY doc_id
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), cand AS (
        |  SELECT doc_a, doc_b FROM pairs
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE CAST(common AS DOUBLE) / (sa.nsh + sb.nsh - common) >= 0.2
        |)
        |SELECT c.doc_a, c.doc_b,
        |       CAST(levenshtein(ta.text, tb.text) AS INT) AS edit_dist
        |FROM cand c
        |JOIN t ta ON ta.doc_id = c.doc_a
        |JOIN t tb ON tb.doc_id = c.doc_b
        |WHERE levenshtein(ta.text, tb.text) <= 30""".stripMargin))

  /** #26c Containment near-dup pairs (one-sided Jaccard >= 0.8):
    * ordered "a mostly inside b" — the metric that catches
    * quote-and-expand duplication symmetric Jaccard misses.
    */
  val qDedupContainment: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Dedup.containmentPairs(
        t(s, dir, "documents"), "doc_id", "text", n = 5, threshold = 0.8),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), s AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' '))) AS sh
        |  FROM t
        |), sizes AS (
        |  SELECT doc_id, count(*) AS nsh FROM s GROUP BY doc_id
        |), pairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), j AS (
        |  SELECT da, db, common, sa.nsh AS nsh_a, sb.nsh AS nsh_b
        |  FROM pairs JOIN sizes sa ON sa.doc_id = da
        |             JOIN sizes sb ON sb.doc_id = db
        |), dirs AS (
        |  SELECT da AS doc_a, db AS doc_b,
        |         CAST(common AS DOUBLE) / nsh_a AS containment FROM j
        |  UNION ALL
        |  SELECT db, da, CAST(common AS DOUBLE) / nsh_b FROM j
        |)
        |SELECT doc_a, doc_b, containment FROM dirs
        |WHERE containment >= 0.8""".stripMargin))

  /** #24 MinHash LSH near-dup pairs, fully oracled: "approximate"
    * here means approximate RECALL of true near-dups — the pipeline
    * itself (FNV word hashes → 5-gram mix-chain shingles → 64
    * splitmix minima → 16 folded band keys → candidate join → exact
    * Jaccard verify) is deterministic integer arithmetic end to end,
    * so DuckDB re-derives the same candidate set and the same
    * verified pairs from first principles. The splitmix mixer's
    * 64-bit wrapping multiplies exceed int128, so the oracle (built
    * by `minhashOracleSql`) decomposes them into 32-bit halves and
    * materializes each mix step as its own CTE stage (inline lateral
    * aliases re-expand exponentially across the 5-mix chain).
    * Signature minima compare in SIGNED order via a top-bit flip,
    * matching the JVM kernel's Long comparisons.
    */
  val qDedupMinhashLsh: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text"),
    oracle = Some(minhashOracleSql))

  /** #24b Incremental MinHash-LSH near-dup: two batches fold into
    * persisted band/set state (one marker-committed version per
    * refresh); each refresh pairs only the batch against
    * state-so-far. The union of refresh emissions must equal the
    * one-shot pair set — SAME exact oracle as dedup_minhash_lsh.
    * Batch 2's emission is taken from an at-least-once REPLAY of the
    * batch: the replay appends no state and re-derives the original
    * emission from the version it was applied as, so a duplicated
    * band row or a lost/duplicated pair would fail the oracle hash.
    */
  val qDedupMinhashInc: QueryDef = QueryDef(
    run = (s, dir) => {
      val statePath = scratch("minhash-inc-state")
      val docs = t(s, dir, "documents")
      val p1 = graft.operators.Dedup.minhashLshIncremental(
        statePath, docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        batchId = Some(1L))
      graft.operators.Dedup.minhashLshIncremental(
        statePath, docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        batchId = Some(2L))
      val p2replayed = graft.operators.Dedup.minhashLshIncremental(
        statePath, docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        batchId = Some(2L))
      p1.unionByName(p2replayed)
    },
    oracle = Some(minhashOracleSql))

  /** #22o Streaming near-dup dedup-on-ingest: documents staged as 4
    * hash-split micro-batches stream through
    * `EventStream.streamNearDup` — each batch folds into the
    * persisted LSH state and emits the pairs involving it, written
    * idempotently per batch id. A pair surfaces exactly once (when
    * its later member arrives), so the union over batches equals the
    * one-shot LSH pair set and the SAME exact DuckDB oracle as
    * `dedup_minhash_lsh` applies — batch boundaries provably don't
    * change the answer.
    */
  val qStreamNearDup: QueryDef = QueryDef(
    run = (s, dir) => {
      val state = scratch("stream-neardup-state")
      // the durable source checkpoint is a SIBLING of the state dir —
      // scratch it with the state or a prior run's bookkeeping
      // references a dead staged-source path (see q_stream_inc_agg)
      scratch("stream-neardup-state_ckpt")
      val out = scratch("stream-neardup-out")
      val split = graft.streaming.EventStream.splitDir(
        s, s"$dir/documents.parquet", 4, keyCol = "doc_id")
      graft.streaming.EventStream.streamNearDup(s, split, state, out,
        queryName = "graft_stream_neardup_" +
          java.util.UUID.randomUUID().toString.replace("-", ""))
      s.read.parquet(out).select(col("doc_a"), col("doc_b"), col("jaccard"))
    },
    oracle = Some(minhashOracleSql))

  /** Generates the dedup_minhash_lsh oracle (see there). Mirrors
    * `GraftHash.hashedShingles` + `MinHashMix.{mix,signature,bandKeys}`
    * with n=5, numHashes=64, bands=16, threshold=0.5.
    */
  private def minhashOracleSqlWith(tail: String): String = {
    val M = "18446744073709551616"
    val B32 = "4294967296"
    val OFF = "14695981039346656037"
    val C1 = BigInt("11400714819323198485") // 0x9e3779b97f4a7c15
    val C2 = BigInt("13787848793156543929") // 0xbf58476d1ce4e5b9
    val C3 = BigInt("10723151780598845931") // 0x94d049bb133111eb
    val TOP = "9223372036854775808"
    def hi(c: BigInt) = c / 4294967296L
    def lo(c: BigInt) = c % 4294967296L
    // mix(h, s) over rows of `src`, one CTE per step; returns
    // (cteSql, lastCte, outCol)
    def mixCtes(name: String, src: String, keep: Seq[String], h: String, s: String)
        : (String, String, String) = {
      val k = keep.mkString(", ")
      val steps = Seq(
        s"${name}_1" -> s"SELECT $k, (($h) + ((CAST($s AS HUGEINT) + 1) * $C1) % $M) % $M AS z0 FROM $src",
        s"${name}_2" -> s"SELECT $k, xor(z0, z0 >> 30) AS x0 FROM ${name}_1",
        s"${name}_3" -> s"SELECT $k, x0 // $B32 AS ah, x0 % $B32 AS al FROM ${name}_2",
        s"${name}_4" -> s"SELECT $k, (((al * ${hi(C2)} + ah * ${lo(C2)}) % $B32) * $B32 + al * ${lo(C2)}) % $M AS z1 FROM ${name}_3",
        s"${name}_5" -> s"SELECT $k, xor(z1, z1 >> 27) AS x1 FROM ${name}_4",
        s"${name}_6" -> s"SELECT $k, x1 // $B32 AS ah, x1 % $B32 AS al FROM ${name}_5",
        s"${name}_7" -> s"SELECT $k, (((al * ${hi(C3)} + ah * ${lo(C3)}) % $B32) * $B32 + al * ${lo(C3)}) % $M AS z2 FROM ${name}_6",
        s"${name}_8" -> s"SELECT $k, xor(z2, z2 >> 31) AS mo FROM ${name}_7")
      (steps.map { case (n, q) => s"$n AS ($q)" }.mkString(",\n"), s"${name}_8", "mo")
    }
    val fnvWord =
      s"""list_reduce(
         |    list_prepend(CAST($OFF AS HUGEINT),
         |      list_transform(flatten(list_transform(range(1, length(w)+1), i -> CASE
         |        WHEN unicode(w[i]) < 128 THEN [unicode(w[i])]
         |        WHEN unicode(w[i]) < 2048 THEN [192 + unicode(w[i]) // 64, 128 + unicode(w[i]) % 64]
         |        WHEN unicode(w[i]) < 65536 THEN [224 + unicode(w[i]) // 4096, 128 + (unicode(w[i]) // 64) % 64, 128 + unicode(w[i]) % 64]
         |        ELSE [240 + unicode(w[i]) // 262144, 128 + (unicode(w[i]) // 4096) % 64, 128 + (unicode(w[i]) // 64) % 64, 128 + unicode(w[i]) % 64]
         |      END)), b -> CAST(b AS HUGEINT))),
         |    (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT))) * 1099511628211) % $M
         |  )""".stripMargin
    val parts = Seq.newBuilder[String]
    parts +=
      s"""ws AS (
         |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
         |), words AS (
         |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS wi, l[CAST(i AS INT)] AS w
         |  FROM (SELECT doc_id, l, unnest(range(1, len(l)+1)) AS i FROM ws)
         |), wh AS MATERIALIZED (
         |  SELECT doc_id, wi, $fnvWord AS uh FROM words
         |), windows AS MATERIALIZED (
         |  SELECT a0.doc_id, a0.wi AS p,
         |         a0.uh AS w0, a1.uh AS w1, a2.uh AS w2, a3.uh AS w3, a4.uh AS w4
         |  FROM wh a0
         |  JOIN wh a1 ON a1.doc_id = a0.doc_id AND a1.wi = a0.wi + 1
         |  JOIN wh a2 ON a2.doc_id = a0.doc_id AND a2.wi = a0.wi + 2
         |  JOIN wh a3 ON a3.doc_id = a0.doc_id AND a3.wi = a0.wi + 3
         |  JOIN wh a4 ON a4.doc_id = a0.doc_id AND a4.wi = a0.wi + 4
         |)""".stripMargin
    // shingle chain: h = OFF; for j in 0..4: h = mix(h ^ w_j, 5)
    var src = "windows"
    var h = s"CAST($OFF AS HUGEINT)"
    for (j <- 0 until 5) {
      val keep = Seq("doc_id", "p") ++ ((j + 1) until 5).map(i => s"w$i")
      val (sql, nsrc, out) = mixCtes(s"c$j", src, keep, s"xor($h, w$j)", "5")
      parts += sql; src = nsrc; h = out
    }
    parts +=
      s"""shingles AS MATERIALIZED (
         |  SELECT DISTINCT doc_id, $h AS sh FROM $src
         |), sigrows AS (
         |  SELECT doc_id, sh, r.s AS s FROM shingles, range(0, 64) r(s)
         |)""".stripMargin
    val (gSql, gSrc, gOut) = mixCtes("g", "sigrows", Seq("doc_id", "s"), "sh", "s")
    parts += gSql
    parts +=
      s"""sig AS MATERIALIZED (
         |  SELECT doc_id, s, xor(min(xor($gOut, CAST($TOP AS HUGEINT))), CAST($TOP AS HUGEINT)) AS sv
         |  FROM $gSrc GROUP BY doc_id, s
         |), bandp AS (
         |  SELECT doc_id, s // 4 AS band,
         |    min(CASE WHEN s % 4 = 0 THEN sv END) AS s0,
         |    min(CASE WHEN s % 4 = 1 THEN sv END) AS s1,
         |    min(CASE WHEN s % 4 = 2 THEN sv END) AS s2,
         |    min(CASE WHEN s % 4 = 3 THEN sv END) AS s3
         |  FROM sig GROUP BY doc_id, s // 4
         |)""".stripMargin
    // band fold: k = mix(band, 64); k = mix(k ^ s_i, band*4+i)
    src = "bandp"
    val (b0Sql, b0Src, b0Out) = mixCtes("b0", src,
      Seq("doc_id", "band", "s0", "s1", "s2", "s3"), "CAST(band AS HUGEINT)", "64")
    parts += b0Sql; src = b0Src
    var k = b0Out
    for (i <- 0 until 4) {
      val keep = Seq("doc_id", "band") ++ ((i + 1) until 4).map(j => s"s$j")
      val (sql, nsrc, out) = mixCtes(s"b${i + 1}", src, keep, s"xor($k, s$i)", s"band*4+$i")
      parts += sql; src = nsrc; k = out
    }
    parts +=
      s"""bkeys AS MATERIALIZED (
         |  SELECT doc_id, band, $k AS bkey FROM $src
         |), sets AS (
         |  SELECT doc_id, list(sh) AS hs, count(*) AS nsh FROM shingles GROUP BY doc_id
         |)""".stripMargin
    "WITH " + parts.result().mkString(",\n") + "\n" + tail
  }

  /** The one-corpus minhash oracle: within-table candidates (a < b). */
  private def minhashOracleSql: String = minhashOracleSqlWith(
    """, cands AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bkeys a JOIN bkeys b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
      |)
      |SELECT doc_a, doc_b,
      |  CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
      |    / (CAST(sa.nsh + sb.nsh AS DOUBLE) - CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)) AS jaccard
      |FROM cands
      |JOIN sets sa ON sa.doc_id = doc_a
      |JOIN sets sb ON sb.doc_id = doc_b
      |WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
      |    / (CAST(sa.nsh + sb.nsh AS DOUBLE) - CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)) >= 0.5""".stripMargin)

  /** The cross-corpus (fuzzy-decontamination) tail: candidates join
    * the train side (doc_id % 10 <> 0) against the holdout side
    * (doc_id % 10 = 0) on band keys — no a<b ordering.
    */
  private def minhashCrossOracleSql: String = minhashOracleSqlWith(
    """, cands AS (
      |  SELECT DISTINCT a.doc_id AS train_id, b.doc_id AS holdout_id
      |  FROM bkeys a JOIN bkeys b ON a.band = b.band AND a.bkey = b.bkey
      |  WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
      |)
      |SELECT train_id, holdout_id,
      |  CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
      |    / (CAST(sa.nsh + sb.nsh AS DOUBLE) - CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)) AS jaccard
      |FROM cands
      |JOIN sets sa ON sa.doc_id = train_id
      |JOIN sets sb ON sb.doc_id = holdout_id
      |WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
      |    / (CAST(sa.nsh + sb.nsh AS DOUBLE) - CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)) >= 0.5""".stripMargin)

  /** #45c Fuzzy benchmark decontamination: training docs flagged as
    * MinHash-LSH near-duplicates of holdout docs — the
    * paraphrase-robust complement of the exact shared-8-gram gate
    * (#45). Same deterministic kernel as dedup_minhash_lsh, so the
    * whole pipeline (both corpora banded, cross-candidates, exact
    * Jaccard verify) is re-derived from first principles in DuckDB.
    */
  val qDecontamFuzzy: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Curation.decontaminateFuzzy(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0))
    },
    oracle = Some(minhashCrossOracleSql))

  /** #25 SimHash near-dup pairs (Hamming <= 3 via 16-bit banding),
    * fully oracled: the 4×16-bit pigeonhole banding provably catches
    * EVERY pair at Hamming ≤ 3, so the output is exactly the set
    * {(a,b) : a < b, hamming(sig_a, sig_b) ≤ 3} — and the signature
    * is deterministic integer arithmetic DuckDB re-derives from first
    * principles (per-token FNV fold as in `text_fingerprint`, 64 bit
    * tallies, sign bits assembled in HUGEINT and re-signed).
    */
  val qDedupSimhash: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text"),
    oracle = Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |), by AS (
        |  SELECT doc_id, flatten(list_transform(range(1, length(tok)+1), i -> CASE
        |    WHEN unicode(tok[i]) < 128 THEN [unicode(tok[i])]
        |    WHEN unicode(tok[i]) < 2048 THEN
        |      [192 + unicode(tok[i]) // 64, 128 + unicode(tok[i]) % 64]
        |    WHEN unicode(tok[i]) < 65536 THEN
        |      [224 + unicode(tok[i]) // 4096, 128 + (unicode(tok[i]) // 64) % 64,
        |       128 + unicode(tok[i]) % 64]
        |    ELSE
        |      [240 + unicode(tok[i]) // 262144, 128 + (unicode(tok[i]) // 4096) % 64,
        |       128 + (unicode(tok[i]) // 64) % 64, 128 + unicode(tok[i]) % 64]
        |  END)) AS bs
        |  FROM toks
        |), th AS (
        |  SELECT doc_id, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |                 list_transform(bs, b -> CAST(b AS HUGEINT))),
        |    (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                 * 1099511628211) % 18446744073709551616
        |  ) AS h
        |  FROM by
        |), votes AS (
        |  SELECT doc_id, r.b AS b,
        |    sum(CASE WHEN (h >> CAST(r.b AS HUGEINT)) % 2 = 1 THEN 1 ELSE -1 END) AS tally
        |  FROM th, range(0, 64) r(b) GROUP BY doc_id, r.b
        |), sigs AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN tally > 0 THEN (CAST(1 AS HUGEINT) << CAST(b AS HUGEINT))
        |                  ELSE CAST(0 AS HUGEINT) END)
        |      - CASE WHEN max(CASE WHEN b = 63 AND tally > 0 THEN 1 ELSE 0 END) = 1
        |             THEN CAST(18446744073709551616 AS HUGEINT)
        |             ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS sig
        |  FROM votes GROUP BY doc_id
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin))

  /** #27 Embedding near-dup pairs: cosine >= 0.45 (exact kernel;
    * DuckDB list_dot_product verified bit-identical to the codegen'd
    * sequential loop).
    */
  private val cosSql =
    "list_dot_product(va, vb) / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb)))"

  val qDedupEmbedding: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Similarity.embeddingNearDupPairs(t(s, dir, "embeddings"), threshold = 0.45),
    oracle = Some(
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
         |), p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id
         |)
         |SELECT id_a, id_b, round($cosSql, 9) AS sim
         |FROM p WHERE $cosSql >= 0.45""".stripMargin))

  /** #27b Embedding near-dup pairs, LSH-banded (the scale path for
    * #27): cosine only within shared random-hyperplane buckets, L
    * independent tables for recall amplification. FULLY ORACLED:
    * the plane components are xxhash64-int chains and the buckets
    * sign patterns of sequential dot folds, all re-derived from
    * first principles in DuckDB ([[OracleSql.embLshPairsSql]]); the
    * recall spec vs the exact kernel stays as the semantic check.
    * (b=2, L=8) suits this LOOSE 0.45 threshold: per-plane separation
    * p ≈ 0.35 ⇒ per-table collision 0.65² ≈ 0.42 ⇒ recall ≈ 0.99.
    */
  val qDedupEmbeddingLsh: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Similarity.embeddingNearDupPairsLsh(
        t(s, dir, "embeddings"), threshold = 0.45, numTables = 8, planesPerTable = 2),
    oracle = Some(OracleSql.embLshPairsSql(0.45, numTables = 8, planesPerTable = 2)))

  /** #27c SemDeDup semantic dedup: k-means cells + within-cell min-id
    * cosine pruning — FULLY ORACLED: the hash-ordered sample and the
    * 10 Lloyd iterations are deterministic arithmetic DuckDB replays
    * exactly ([[OracleSql.semanticDedupSql]]); the spec pins planted
    * duplicates and the drop rule.
    */
  val qDedupSemantic: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Similarity.semanticDedup(
        t(s, dir, "embeddings"), threshold = 0.45, nclusters = 16),
    oracle = Some(OracleSql.semanticDedupSql(0.45, nclusters = 16)))

  /** #28f Hard-negative mining: per anchor (vec_id < 10), the top-5
    * most-similar corpus rows with a DIFFERENT label — exact kernel,
    * fully oracled like the other exact-cosine queries.
    */
  val qSimHardNegatives: QueryDef = QueryDef(
    run = (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 10), k = 5)
    },
    oracle = Some(
      s"""WITH e AS (
         |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.v AS va, q.v AS vb
         |  FROM e c, e q
         |  WHERE q.vec_id < 10 AND c.vec_id != q.vec_id AND c.label != q.label
         |), r AS (
         |  SELECT query_id, neighbor_id, $cosSql AS sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY $cosSql DESC, neighbor_id) AS rk
         |  FROM scored
         |)
         |SELECT query_id, CAST(rk AS BIGINT) AS "rank", neighbor_id, round(sim, 9) AS sim
         |FROM r WHERE rk <= 5""".stripMargin))

  /** #28g Embedding L2 normalization (ingest step that turns cosine
    * into plain dot at scale), oracled exactly: both engines fold the
    * norm sequentially and quantize each normalized coordinate to
    * fixed-point, so the projection is hash-matched coordinate by
    * coordinate.
    */
  val qEmbNormalize: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Similarity.normalizeEmbeddings(t(s, dir, "embeddings"))
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          floor(col("x") * lit(1e9d)).cast("long").as("x_fp")),
    oracle = Some(
      """WITH n AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
        |), m AS (
        |  SELECT vec_id, v,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), v), (acc, x) -> acc + x*x)) AS nrm
        |  FROM n
        |), ex AS (
        |  SELECT vec_id, unnest(range(0, length(v))) AS pos, v, nrm FROM m
        |)
        |SELECT vec_id, CAST(pos AS BIGINT) AS pos,
        |  CAST(floor((CASE WHEN nrm = 0 THEN v[CAST(pos+1 AS INT)]
        |                   ELSE v[CAST(pos+1 AS INT)]/nrm END) * 1e9) AS BIGINT) AS x_fp
        |FROM ex""".stripMargin))

  /** #28 Brute-force cosine top-k: queries vec_id < 10, k = 5. */
  val qSimBruteforceTopk: QueryDef = QueryDef(
    run = (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
    },
    oracle = Some(
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
         |), scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.v AS va, q.v AS vb
         |  FROM e c, e q WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
         |), r AS (
         |  SELECT query_id, neighbor_id, $cosSql AS sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY $cosSql DESC, neighbor_id) AS rk
         |  FROM scored
         |)
         |SELECT query_id, CAST(rk AS BIGINT) AS "rank", neighbor_id, round(sim, 9) AS sim
         |FROM r WHERE rk <= 5""".stripMargin))

  /** #29 LSH-bucketed approximate top-k (multi-probe radius 1) —
    * FULLY ORACLED via the xxhash64-derived plane re-derivation
    * ([[OracleSql.lshTopkSql]]); the recall spec stays as the
    * semantic check. */
  val qSimLshTopk: QueryDef = QueryDef(
    run = (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), k = 5,
        numPlanes = 4, probeRadius = 1)
    },
    oracle = Some(OracleSql.lshTopkSql(k = 5, numPlanes = 4)))

  /** Shared oracle prefix for the curation pipelines: stopword-hit
    * scoring, language ID, and the quality/length filter as DuckDB
    * CTEs (`h`/`m`/`scored`/`filtered`) — one definition so the two
    * curation oracles can never drift from each other.
    */
  private lazy val curateFilteredPrefix: String = {
    val hits = graft.operators.TextAnalysis.Stopwords
      .map { case (code, words) => s"${duckHits(words)} AS c_$code" }
      .mkString(",\n    ")
    val codes = graft.operators.TextAnalysis.Stopwords.map(_._1)
    val whens = codes.map(c => s"WHEN c_$c = m THEN '$c'").mkString(" ")
    s"""h AS (
       |  SELECT doc_id, lang, text,
       |    len(string_split(text, ' ')) AS nt,
       |    $hits
       |  FROM documents
       |), m AS (
       |  SELECT *, greatest(${codes.map("c_" + _).mkString(", ")}) AS m FROM h
       |), scored AS (
       |  SELECT doc_id, lang, text,
       |    CAST(nt AS BIGINT) AS n_tokens,
       |    least(1.0, (CAST(nt AS DOUBLE) / 100) * 0.5 + ((CAST(c_en AS DOUBLE) / nt) * 5) * 0.5) AS quality_score,
       |    CASE WHEN m = 0 THEN 'und' $whens ELSE 'und' END AS lang_pred
       |  FROM m
       |), filtered AS (
       |  SELECT * FROM scored WHERE quality_score >= 0.45 AND n_tokens >= 20
       |)""".stripMargin
  }

  /** #35 End-to-end corpus curation: quality scoring → language ID →
    * quality/length filter → exact dedup, the composed
    * training-data-prep pipeline over the documents table. Every stage
    * is one of the already-oracled operators; this query checks the
    * COMPOSITION against a single SQL oracle.
    */
  val qCurateDocs: QueryDef = QueryDef(
    run = (s, dir) => {
      import graft.operators.{Dedup, TextAnalysis}
      val scored = TextAnalysis.withLangId(TextAnalysis.withQuality(t(s, dir, "documents")))
      val filtered = scored.filter(col("quality_score") >= 0.45 && col("n_tokens") >= 20)
      Dedup.exact(filtered, "text", "doc_id")
        .select(col("doc_id"), col("lang"), col("lang_pred"), col("n_tokens"), col("quality_score"))
    },
    oracle = Some(
      s"""WITH $curateFilteredPrefix, dedup AS (
         |  SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM filtered
         |)
         |SELECT doc_id, lang, lang_pred, n_tokens, quality_score FROM dedup WHERE rn = 1""".stripMargin))

  /** #35b Curation with NEAR-dup removal: the same quality/langid
    * filter, then greedy pair-drop over 5-gram Jaccard >= 0.5 pairs —
    * every doc appearing as the higher id of a near-dup pair is
    * dropped (the practical one-pass near-dedup; full transitive
    * clustering is dedup_clusters). Pairs are computed on the
    * FILTERED set, exactly as the oracle does.
    */
  val qCurateNeardup: QueryDef = QueryDef(
    run = (s, dir) => {
      import graft.operators.{Dedup, TextAnalysis}
      val scored = TextAnalysis.withLangId(TextAnalysis.withQuality(t(s, dir, "documents")))
      val filtered = scored.filter(col("quality_score") >= 0.45 && col("n_tokens") >= 20)
      val losers = Dedup.ngramJaccardPairs(filtered, "doc_id", "text", n = 5, threshold = 0.5)
        .select(col("doc_b").as("doc_id")).distinct()
      filtered.join(losers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang_pred"), col("n_tokens"))
    },
    oracle = Some(
      s"""WITH $curateFilteredPrefix, tkn AS (
         |  SELECT doc_id, string_split(text, ' ') AS w FROM filtered
         |), sh AS (
         |  SELECT DISTINCT doc_id,
         |         unnest(list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' '))) AS sh
         |  FROM tkn
         |), sizes AS (
         |  SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id
         |), cnt AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), losers AS (
         |  SELECT DISTINCT doc_b AS doc_id
         |  FROM cnt
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE CAST(common AS DOUBLE) / (sa.nsh + sb.nsh - common) >= 0.5
         |)
         |SELECT doc_id, lang_pred, n_tokens FROM filtered
         |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin))

  /** #37 Document chunking: 50-token chunks, stride 40 (10-token
    * overlap) — the doc→training-sample splitter.
    */
  val qTextChunk: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.TextAnalysis.chunk(t(s, dir, "documents"), chunkTokens = 50, stride = 40)
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          col("chunk_text"), col("chunk_tokens")),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), c AS (
        |  SELECT doc_id, w,
        |    1 + greatest(0, CAST(ceil((len(w) - 50) / 40.0) AS INT)) AS nch
        |  FROM t
        |), e AS (
        |  SELECT doc_id, w, unnest(range(0, nch)) AS i FROM c
        |)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        |  array_to_string(w[i*40 + 1 : i*40 + 50], ' ') AS chunk_text,
        |  CAST(least(50, len(w) - i*40) AS BIGINT) AS chunk_tokens
        |FROM e""".stripMargin))

  /** #38 PII redaction over text with synthesized PII (the corpus has
    * none): an email, a phone, and an IP derived from doc_id are
    * appended identically on both engines, then scrubbed. Counts come
    * from the pre-redaction text.
    */
  /** #32b Canonical normalization: a deliberately-messied projection
    * of the corpus (injected case, tabs, padding) must normalize
    * identically on both engines — character-class regexes only, so
    * the semantics can't drift between regex dialects.
    */
  val qTextNormalize: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.TextAnalysis.normalized(
        t(s, dir, "documents").withColumn("messy",
          concat(lit("  "), upper(expr("substring(text, 1, 50)")),
            lit("\t\t"), expr("substring(text, 51)"))),
        "messy", "text_norm")
        .select(col("doc_id"), col("text_norm")),
    oracle = Some(
      """SELECT doc_id,
        |  lower(trim(regexp_replace(regexp_replace(
        |    '  ' || upper(substr(text, 1, 50)) || chr(9) || chr(9) || substr(text, 51),
        |    '[\x00-\x1f\x7f]', ' ', 'g'), '[ \t\n\r]+', ' ', 'g'))) AS text_norm
        |FROM documents""".stripMargin))

  val qTextRedact: QueryDef = QueryDef(
    run = (s, dir) => {
      val withPii = t(s, dir, "documents").withColumn("text",
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-000-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" from 10.0."), pmod(col("doc_id"), lit(256)), lit(".7")))
      graft.operators.TextAnalysis.redact(withPii)
        .select(col("doc_id"), col("redacted"), col("n_email"), col("n_phone"), col("n_ipv4"))
    },
    oracle = {
      val Seq(email, phone, ipv4) = graft.operators.TextAnalysis.RedactPatterns.map(_._2)
      Some(
        s"""WITH p AS (
           |  SELECT doc_id,
           |    text || ' contact user' || doc_id || '@example.com or +1-555-000-' ||
           |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
           |    ' from 10.0.' || (doc_id % 256) || '.7' AS text
           |  FROM documents
           |)
           |SELECT doc_id,
           |  regexp_replace(regexp_replace(regexp_replace(text,
           |    '$email', '[EMAIL]', 'g'),
           |    '$phone', '[PHONE]', 'g'),
           |    '$ipv4', '[IPV4]', 'g') AS redacted,
           |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_email,
           |  CAST(len(regexp_extract_all(text, '$phone')) AS BIGINT) AS n_phone,
           |  CAST(len(regexp_extract_all(text, '$ipv4')) AS BIGINT) AS n_ipv4
           |FROM p""".stripMargin)
    })

  /** #39 Near-dup clusters: connected components (min-label
    * propagation) over the n-gram Jaccard pairs. Oracle computes the
    * same components with a recursive CTE — two very different
    * algorithms must agree on every cluster assignment.
    */
  val qDedupClusters: QueryDef = QueryDef(
    run = (s, dir) => {
      val pairs = graft.operators.Dedup.ngramJaccardPairs(
        t(s, dir, "documents"), "doc_id", "text", n = 5, threshold = 0.5)
      graft.operators.Dedup.clusters(pairs, "doc_a", "doc_b")
    },
    oracle = Some(
      """WITH RECURSIVE t AS (
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
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b, doc_a FROM pairs
        |), reach AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
        |)
        |SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id""".stripMargin))

  /** #35d Cluster-aware dedup retention: near-dup pairs → connected
    * components → keep the argmax-quality member per cluster (ties
    * to lowest id) plus every unclustered doc — the production
    * near-dup policy (greedy pair-drop can evict the best copy; the
    * cluster argmax provably keeps it). Whole path oracled: shingle
    * pairs, recursive-CTE components, quality argmax.
    */
  val qCurateClusterBest: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", n = 5, threshold = 0.5)
      val quality = graft.operators.TextAnalysis.qualityLinear(docs)
        .select(col("doc_id"), col("q_score"))
      graft.operators.Curation.keepBestPerCluster(docs, pairs, quality)
    },
    oracle = Some(
      """WITH RECURSIVE t AS (
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
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b, doc_a FROM pairs
        |), reach AS (
        |  SELECT src AS id, src AS r FROM edges
        |  UNION
        |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
        |), comp AS (
        |  SELECT id AS doc_id, min(r) AS cluster_rep FROM reach GROUP BY id
        |), qm AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> strlen(x))) AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(w, x -> x IN ('the', 'of', 'and', 'to', 'in', 'is',
        |        'that', 'it', 'was', 'for'))) AS BIGINT) AS stop_hits
        |  FROM t
        |), q AS (
        |  SELECT doc_id,
        |    2 * least(n_words, 100) + 25 * stop_hits
        |      - abs(CASE WHEN n_words > 0 THEN word_chars * 10 // n_words ELSE 0 END - 50) AS q_score
        |  FROM qm
        |), best AS (
        |  SELECT doc_id FROM (
        |    SELECT c.doc_id,
        |      row_number() OVER (PARTITION BY c.cluster_rep
        |                         ORDER BY q.q_score DESC, c.doc_id ASC) AS rn
        |    FROM comp c JOIN q ON q.doc_id = c.doc_id)
        |  WHERE rn = 1
        |), keep AS (
        |  SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM comp)
        |  UNION ALL
        |  SELECT doc_id FROM best
        |)
        |SELECT k.doc_id, q.q_score FROM keep k JOIN q ON q.doc_id = k.doc_id""".stripMargin))

  /** #40 Mergeable approximate distinct — a KMV/theta sketch over
    * xxhash64 ([[graft.operators.Sketches.approxDistinctKmv]]):
    * distinct users per event type in O(k) mergeable state.
    * Replaces the earlier `approx_count_distinct` (HLL++) form whose
    * register/bias internals no other engine can replay — the KMV
    * estimate is a pure integer function of the input set, so the
    * driver's DuckDB gate re-derives it exactly
    * ([[OracleSql.kmvDistinctSql]]); the spec still bounds error vs
    * the exact distinct count (σ ≈ 1/√(k−2)).
    */
  val qApproxDistinct: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Sketches.approxDistinctKmv(
        t(s, dir, "events"), Seq("event_type"), "user_id", k = 64)
        .select(col("event_type"), col("approx_distinct").as("approx_users"),
          col("n_rows").as("n_events")),
    oracle = Some(OracleSql.kmvDistinctSql(64)))

  /** #18e4 KMV audience overlap ([[graft.operators.Sketches.kmvOverlap]]):
    * distinct purchasers, distinct clickers, their union from the
    * MERGED segment sketches (KMV union is exactly mergeable), the
    * inclusion-exclusion intersection and floor-quantized Jaccard —
    * audience overlap without shuffling user ids. The oracle
    * re-derives all three estimates from first principles.
    */
  val qKmvOverlap: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Sketches.kmvOverlap(
      t(s, dir, "events"), "event_type", "user_id", "purchase", "click", k = 64),
    oracle = Some(OracleSql.kmvOverlapSql(64, "purchase", "click")))

  /** #18e3 Incremental distinct-count sketch maintenance: the events
    * table arrives as two batches (one replayed — recognized no-op),
    * each folding its per-type KMV sketch into the versioned O(k)
    * state; the read-time estimate must equal the whole-corpus sketch
    * EXACTLY (the sketch is a pure function of the input set and
    * merge is associative re-insertion) — which the oracle proves by
    * re-deriving the full-corpus estimate from first principles.
    */
  val qKmvInc: QueryDef = QueryDef(
    run = (s, dir) => {
      val state = scratch("kmv-inc")
      val ev = t(s, dir, "events")
      val b1 = ev.filter(col("event_id") % 2 === 0)
      val b2 = ev.filter(col("event_id") % 2 === 1)
      graft.operators.IncrementalAgg.refreshKmv(s, state, b1, Seq("event_type"), "user_id",
        k = 64, batchId = Some(1L))
      graft.operators.IncrementalAgg.refreshKmv(s, state, b2, Seq("event_type"), "user_id",
        k = 64, batchId = Some(2L))
      // crash-redelivery: replayed batch id is a recognized no-op
      graft.operators.IncrementalAgg.refreshKmv(s, state, b2, Seq("event_type"), "user_id",
        k = 64, batchId = Some(2L))
      graft.operators.IncrementalAgg.readKmvEstimate(s, state, Seq("event_type"), k = 64)
    },
    oracle = Some(OracleSql.kmvDistinctSql(64, withCounts = false, estimateAs = "approx_distinct")))

  /** #18f2 Mergeable approximate quantiles — a deterministic
    * hash-sample sketch ([[graft.operators.Sketches.sampledQuantiles]]):
    * the engine-reproducible Bernoulli cut pins the sampled SET, and
    * exact interpolated percentiles of the sample are the estimate
    * (error O(1/√(f·n)), spec-bounded vs the exact percentiles).
    * Replaces the earlier `approx_percentile` (GK) form, whose answer
    * depends on partition merge order no other engine can replay —
    * this one is a pure function of the data and hash-matches DuckDB.
    */
  val qApproxQuantiles: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Sketches.sampledQuantiles(
        t(s, dir, "lineitem"), Seq("l_returnflag"), "l_quantity",
        col("l_orderkey") * 8 + col("l_linenumber"), Seq(0.5, 0.9), fraction = 0.125)
        .select(col("l_returnflag"), col("p50").as("approx_p50"),
          col("p90").as("approx_p90"), col("n_rows").as("n")),
    oracle = Some(
      """WITH s AS (
        |  SELECT l_returnflag, l_quantity FROM lineitem
        |  WHERE (((l_orderkey * 8 + l_linenumber) % 2147483648) * 2654435761) % 2147483648
        |        < 268435456
        |), q AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_quantity, 0.50) AS approx_p50,
        |    quantile_cont(l_quantity, 0.90) AS approx_p90
        |  FROM s GROUP BY l_returnflag
        |), n AS (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag)
        |SELECT n.l_returnflag, q.approx_p50, q.approx_p90, n.n
        |FROM n JOIN q USING (l_returnflag)""".stripMargin))

  /** #81 TextRank keyword scores: 10 fixed-point integer PageRank
    * steps over the word-adjacency graph (see
    * [[graft.operators.TextRank]]). The oracle UNROLLS the ten power
    * iterations as generated chained CTEs — floor division (`//`) and
    * long addition reproduce Spark's `div`/`+` exactly, so the final
    * ranks hash-match as plain BIGINTs.
    */
  val qTextPagerank: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.TextRank.rank(t(s, dir, "documents"), iterations = 10),
    oracle = Some {
      val graph =
        """WITH tok AS (
          |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
          |), pos AS (
          |  SELECT doc_id, ts, unnest(range(len(ts) - 1)) AS i FROM tok
          |), und AS (
          |  SELECT DISTINCT least(ts[i+1], ts[i+2]) AS a, greatest(ts[i+1], ts[i+2]) AS b
          |  FROM pos WHERE ts[i+1] <> ts[i+2]
          |), edges AS (
          |  SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und
          |), deg AS (
          |  SELECT src, count(*) AS d FROM edges GROUP BY src
          |), r0 AS (
          |  SELECT src AS word, CAST(1000000000000 AS BIGINT) AS r FROM deg
          |)""".stripMargin
      val steps = (1 to 10).map { k =>
        s""", r$k AS (
           |  SELECT n.src AS word, CAST(150000000000 + coalesce(c.s, 0) AS BIGINT) AS r
           |  FROM deg n LEFT JOIN (
           |    SELECT e.dst, sum((p.r * 85) // (100 * d.d)) AS s
           |    FROM r${k - 1} p JOIN edges e ON p.word = e.src JOIN deg d ON d.src = e.src
           |    GROUP BY e.dst) c ON c.dst = n.src
           |)""".stripMargin
      }.mkString
      graph + steps + "\nSELECT word, r AS rank FROM r10"
    })

  /** #44 Vocabulary build: top-200 terms by frequency with document
    * frequency and deterministic token ids.
    */
  val qTextVocab: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.TextAnalysis.vocab(t(s, dir, "documents"), topK = 200),
    oracle = Some(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), agg AS (
        |  SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
        |), top AS (
        |  SELECT *, row_number() OVER (ORDER BY tf DESC, term) AS token_id FROM agg
        |)
        |SELECT CAST(token_id AS BIGINT) AS token_id, term, tf, df
        |FROM top WHERE token_id <= 200""".stripMargin))

  /** #40b Inverted index (postings) over the top-50 vocab terms:
    * term → sorted doc-id list + df. Postings sort inside each
    * aggregation buffer, never globally.
    */
  val qTextPostings: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      // The operator's natural output is a list-valued posting column;
      // the gate needs a scalar per cell (pandas can't hash arrays), so
      // the query serializes the (already sorted) posting to CSV.
      graft.operators.TextAnalysis.postings(
        docs, graft.operators.TextAnalysis.vocab(docs, topK = 50))
        .select(col("term"),
          array_join(col("posting").cast("array<string>"), ",").as("posting"),
          col("df"))
    },
    oracle = Some(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), agg AS (
        |  SELECT term, count(*) AS tf FROM tok GROUP BY term
        |), v AS (
        |  SELECT term FROM agg ORDER BY tf DESC, term LIMIT 50
        |), d AS (
        |  SELECT DISTINCT doc_id, term FROM tok
        |)
        |SELECT term, array_to_string(list_sort(list(doc_id)), ',') AS posting, count(*) AS df
        |FROM d JOIN v USING (term)
        |GROUP BY term""".stripMargin))

  /** #40c Skip-gram co-occurrence counts (window 2): the word2vec
    * training-pair table. Oracle slices the token list per position
    * in SQL.
    */
  val qTextSkipgrams: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.TextAnalysis.skipgrams(t(s, dir, "documents"), window = 2),
    oracle = Some(
      """WITH tok AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |), pos AS (
        |  SELECT unnest(w) AS a, unnest(range(len(w))) AS i, w FROM tok
        |), pairs AS (
        |  SELECT a, unnest(w[i + 2:i + 3]) AS b FROM pos
        |)
        |SELECT a, b, count(*) AS n FROM pairs GROUP BY a, b""".stripMargin))

  /** #42 TF-IDF top-3 terms per document (rational idf for
    * cross-engine bit-exactness — see TextAnalysis.tfIdf).
    */
  val qTextTfidf: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.TextAnalysis.tfIdf(t(s, dir, "documents"), topK = 3),
    oracle = Some(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
        |), n AS (
        |  SELECT count(*) AS n_docs FROM documents
        |), scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |         CAST(tf.tf * n.n_docs AS DOUBLE) / dfreq.df AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
        |)
        |SELECT doc_id, rk, term, tf, df, tfidf FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
        |  FROM scored
        |) WHERE rk <= 3""".stripMargin))

  /** #39b Triangle enumeration on the word co-occurrence graph
    * (skip-gram pairs collapsed to undirected edges, weight >= 100):
    * degree-ordered wedge enumeration (O(m^1.5) candidates) must
    * produce exactly the same triangle set as the oracle's naive
    * id-ordered 3-way self-join — two different algorithms, one
    * answer. The graph is vocab-bounded (same gate philosophy as
    * TextRank), so the fixture's density is stable across SFs.
    */
  val qTriangles: QueryDef = QueryDef(
    run = (s, dir) => {
      val sg = graft.operators.TextAnalysis.skipgrams(t(s, dir, "documents"), window = 2)
      val edges = sg.filter(col("a") =!= col("b"))
        .groupBy(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .agg(sum(col("n")).as("n"))
        .filter(col("n") >= 100L)
      graft.operators.GraphAnalytics.triangles(edges, "u", "v")
    },
    oracle = Some(
      """WITH tok AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |), pos AS (
        |  SELECT unnest(w) AS a, unnest(range(len(w))) AS i, w FROM tok
        |), prs AS (
        |  SELECT a, unnest(w[i + 2:i + 3]) AS b FROM pos
        |), dirw AS (
        |  SELECT a, b, count(*) AS n FROM prs GROUP BY 1, 2
        |), e AS (
        |  SELECT least(a, b) AS u, greatest(a, b) AS v
        |  FROM dirw WHERE a <> b
        |  GROUP BY 1, 2 HAVING sum(n) >= 100
        |)
        |SELECT p1.u AS x, p1.v AS y, p2.v AS z
        |FROM e p1 JOIN e p2 ON p2.u = p1.v
        |JOIN e p3 ON p3.u = p1.u AND p3.v = p2.v""".stripMargin))

  /** #39c Link prediction ([[graft.operators.GraphAnalytics.linkPrediction]]):
    * the word co-occurrence graph's non-adjacent pairs ranked by
    * common neighbors, integer resource-allocation (Σ⌊10⁶/deg(z)⌋ —
    * a shared rare neighbor outweighs a shared hub), and
    * preferential attachment — the "which near-dup pairs did LSH
    * probably miss" scores. The oracle re-derives the whole chain:
    * adjacency, degrees, wedge join, floor-divided RA sum, and the
    * NOT-EXISTS non-adjacency gate.
    */
  val qLinkPredict: QueryDef = QueryDef(
    run = (s, dir) => {
      val sg = graft.operators.TextAnalysis.skipgrams(t(s, dir, "documents"), window = 2)
      val edges = sg.filter(col("a") =!= col("b"))
        .groupBy(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .agg(sum(col("n")).as("n"))
        .filter(col("n") >= 100L)
      graft.operators.GraphAnalytics.linkPrediction(edges, "u", "v")
    },
    oracle = Some(
      """WITH tok AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |), pos AS (
        |  SELECT unnest(w) AS a, unnest(range(len(w))) AS i, w FROM tok
        |), prs AS (
        |  SELECT a, unnest(w[i + 2:i + 3]) AS b FROM pos
        |), dirw AS (
        |  SELECT a, b, count(*) AS n FROM prs GROUP BY 1, 2
        |), e AS (
        |  SELECT least(a, b) AS u, greatest(a, b) AS v
        |  FROM dirw WHERE a <> b
        |  GROUP BY 1, 2 HAVING sum(n) >= 100
        |), adj AS (
        |  SELECT u AS n, v AS nbr FROM e UNION ALL SELECT v AS n, u AS nbr FROM e
        |), deg AS (
        |  SELECT n, count(*) AS d FROM adj GROUP BY 1
        |), cand AS (
        |  SELECT a1.nbr AS x, a2.nbr AS y, count(*) AS cn,
        |         CAST(sum(1000000 // dz.d) AS BIGINT) AS ra_x1e6
        |  FROM adj a1
        |  JOIN adj a2 ON a2.n = a1.n AND a1.nbr < a2.nbr
        |  JOIN deg dz ON dz.n = a1.n
        |  GROUP BY 1, 2
        |)
        |SELECT c.x, c.y, c.cn, c.ra_x1e6, dx.d * dy.d AS pa
        |FROM cand c
        |JOIN deg dx ON dx.n = c.x
        |JOIN deg dy ON dy.n = c.y
        |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = c.x AND e.v = c.y)""".stripMargin))

  /** #48b Count-Min sketch token-frequency estimates: the corpus
    * folds into ONE depth×width=4×16 long buffer (mergeable,
    * map-side-combined), then the top-20 true-frequency terms probe
    * it. Buckets are salted-FNV mod width — fully deterministic, so
    * the oracle rebuilds the identical sketch cell-for-cell in
    * DuckDB and the estimates (incl. every collision's overcount)
    * hash-match exactly. width=16 < vocab size forces real
    * collisions; the min over 4 rows is what keeps estimates tight.
    */
  val qCmsCounts: QueryDef = QueryDef(
    run = (s, dir) => {
      import graft.functions.CmsFunctions
      val tok = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
      val sketch = tok.agg(CmsFunctions.cmsSketch(col("term"), 4, 16).as("sk"))
      val top = tok.groupBy(col("term")).agg(count(lit(1)).as("true_n"))
        .orderBy(col("true_n").desc, col("term")).limit(20)
      top.crossJoin(broadcast(sketch))
        .select(col("term"), col("true_n"),
          CmsFunctions.cmsEstimate(col("sk"), col("term"), 4, 16).as("cms_est"))
    },
    oracle = Some(
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents
        |), cnt AS (
        |  SELECT term, count(*) AS true_n FROM tok GROUP BY 1
        |), rws AS (
        |  SELECT unnest([0, 1, 2, 3]) AS r
        |), bk AS (
        |  SELECT term, true_n, r,
        |    list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |      list_transform(range(1, length(term || chr(1) || CAST(r AS VARCHAR)) + 1),
        |        i -> CAST(unicode((term || chr(1) || CAST(r AS VARCHAR))[i]) AS HUGEINT))),
        |      (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                   * 1099511628211) % 18446744073709551616) % 16 AS bucket
        |  FROM cnt CROSS JOIN rws
        |), cells AS (
        |  SELECT r, bucket, sum(true_n) AS cell FROM bk GROUP BY 1, 2
        |), est AS (
        |  SELECT bk.term, bk.true_n, min(cells.cell) AS cms_est
        |  FROM bk JOIN cells ON cells.r = bk.r AND cells.bucket = bk.bucket
        |  GROUP BY 1, 2
        |), top AS (
        |  SELECT term, true_n FROM cnt ORDER BY true_n DESC, term LIMIT 20
        |)
        |SELECT est.term, est.true_n, CAST(est.cms_est AS BIGINT) AS cms_est
        |FROM est JOIN top USING (term, true_n)""".stripMargin))

  /** #42b BM25 retrieval: top-10 docs for a 3-term bag-of-words
    * query, Okapi BM25 (k1 = 6/5, b = 3/4) with rational idf and
    * per-term 1e-9 floor quantization — every step integer-exact, so
    * score AND ranking are pinned cross-engine (see
    * TextAnalysis.bm25).
    */
  val qTextBm25: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.TextAnalysis.bm25(
      t(s, dir, "documents"), queryTerms = Seq("join", "vector", "stream"), topK = 10),
    oracle = Some(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), dl AS (
        |  SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
        |), tot AS (
        |  SELECT (SELECT count(*) FROM documents) AS n_docs,
        |         (SELECT count(*) FROM tok) AS t_tok
        |), qt AS (
        |  SELECT unnest(['join', 'vector', 'stream']) AS term
        |), q AS (
        |  SELECT doc_id, term FROM tok JOIN qt USING (term)
        |), dfreq AS (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM q GROUP BY 1
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM q GROUP BY 1, 2
        |), contrib AS (
        |  SELECT tf.doc_id,
        |    CAST(CAST(2*n_docs - 2*df + 1 AS HUGEINT) * (11*tf) * (4*t_tok) * 1000000000
        |      // (CAST(2*df + 1 AS HUGEINT)
        |          * (CAST(20 AS HUGEINT)*tf*t_tok + 6*t_tok
        |             + CAST(18 AS HUGEINT)*dl.dl*n_docs)) AS BIGINT) AS c
        |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
        |)
        |SELECT doc_id, score_fp, n_terms_hit, rk FROM (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_fp,
        |         count(*) AS n_terms_hit,
        |         row_number() OVER (ORDER BY sum(c) DESC, doc_id) AS rk
        |  FROM contrib GROUP BY doc_id
        |) WHERE rk <= 10""".stripMargin))

  /** #100 Hybrid retrieval (RRF fusion): one request, two legs — the
    * BM25 lexical top-20 for a 3-term query and the cosine semantic
    * top-20 around doc 0's embedding — fused by Reciprocal Rank
    * Fusion with floor-quantized integer contributions
    * (⌊10⁶/(60+rank)⌋, [[graft.operators.Retrieval.rrfFuse]]). The
    * RAG-stack production shape: score scales never calibrated, only
    * ranks fused. FULLY ORACLED: both legs' rankings are already
    * first-principles-derivable (the BM25 cross-multiplied rational
    * and the cosine kernel), and the fusion is plain integer
    * division, so DuckDB re-derives the ENTIRE hybrid pipeline.
    */
  val qHybridSearch: QueryDef = QueryDef(
    run = (s, dir) => {
      val lex = graft.operators.TextAnalysis.bm25(
        t(s, dir, "documents"), queryTerms = Seq("join", "vector", "stream"), topK = 20)
        .select(col("doc_id"), col("rk"))
      val emb = t(s, dir, "embeddings")
      val sem = graft.operators.Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") === 0), k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rank").as("rk"))
      graft.operators.Retrieval.rrfFuse(Seq(lex, sem), k = 10)
    },
    oracle = Some(
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
         |), dl AS (
         |  SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
         |), tot AS (
         |  SELECT (SELECT count(*) FROM documents) AS n_docs,
         |         (SELECT count(*) FROM tok) AS t_tok
         |), qt AS (
         |  SELECT unnest(['join', 'vector', 'stream']) AS term
         |), q AS (
         |  SELECT doc_id, term FROM tok JOIN qt USING (term)
         |), dfreq AS (
         |  SELECT term, count(DISTINCT doc_id) AS df FROM q GROUP BY 1
         |), tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM q GROUP BY 1, 2
         |), contrib AS (
         |  SELECT tf.doc_id,
         |    CAST(CAST(2*n_docs - 2*df + 1 AS HUGEINT) * (11*tf) * (4*t_tok) * 1000000000
         |      // (CAST(2*df + 1 AS HUGEINT)
         |          * (CAST(20 AS HUGEINT)*tf*t_tok + 6*t_tok
         |             + CAST(18 AS HUGEINT)*dl.dl*n_docs)) AS BIGINT) AS c
         |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
         |), lex AS (
         |  SELECT doc_id, rk FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY sum(c) DESC, doc_id) AS rk
         |    FROM contrib GROUP BY doc_id
         |  ) WHERE rk <= 20
         |), e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
         |), scored AS (
         |  SELECT c.vec_id AS doc_id, c.v AS va, q.v AS vb
         |  FROM e c, e q WHERE q.vec_id = 0 AND c.vec_id != 0
         |), sem AS (
         |  SELECT doc_id, rk FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY $cosSql DESC, doc_id) AS rk
         |    FROM scored
         |  ) WHERE rk <= 20
         |), legs AS (
         |  SELECT doc_id, rk FROM lex UNION ALL SELECT doc_id, rk FROM sem
         |), fused AS (
         |  SELECT doc_id, CAST(sum(1000000 // (60 + rk)) AS BIGINT) AS rrf_fp,
         |         count(*) AS n_legs
         |  FROM legs GROUP BY doc_id
         |)
         |SELECT doc_id, rrf_fp, n_legs, rk FROM (
         |  SELECT doc_id, rrf_fp, n_legs,
         |         row_number() OVER (ORDER BY rrf_fp DESC, doc_id) AS rk
         |  FROM fused
         |) WHERE rk <= 10""".stripMargin))

  /** #100b Graded retrieval evaluation — NDCG@10 + reciprocal rank
    * per query ([[graft.operators.Retrieval.ndcgAtK]]): the exact
    * cosine top-10 as the run, graded qrels derived from embedding
    * labels (same label → rel 2, adjacent label → rel 1), and the
    * whole metric chain in frozen integers — gains 2^rel−1, the
    * ⌊10⁶/log₂(r+1)⌋ discount table computed ONCE on the driver and
    * inlined as literals into BOTH the plan and this oracle, DCG/IDCG
    * as BIGINT sums, ndcg_bp/rr_fp as integer division. DuckDB
    * re-derives the run (cosine ranking), the qrels, the ideal
    * ordering, and every metric bit-for-bit. Queries with no
    * relevant docs still report zeros (the recallAtK anti-lying
    * contract).
    */
  val qEvalNdcg: QueryDef = QueryDef(
    run = (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val run = graft.operators.Similarity.bruteForceTopK(emb, q, k = 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank").as("rk"))
      val qrels = emb.select(col("vec_id").as("doc_id"), col("label").as("_dl"))
        .crossJoin(broadcast(q.select(col("vec_id").as("query_id"), col("label").as("_ql"))))
        .filter(col("doc_id") =!= col("query_id"))
        .withColumn("rel",
          when(col("_dl") === col("_ql"), 2)
            .when(abs(col("_dl") - col("_ql")) === 1, 1).otherwise(0))
        .select(col("query_id"), col("doc_id"), col("rel"))
      graft.operators.Retrieval.ndcgAtK(run, qrels, k = 10)
    },
    oracle = Some {
      // the SAME frozen discount literals the plan ships (see
      // Retrieval.discounts) — interpolated, never recomputed in SQL
      val discVals = graft.operators.Retrieval.discounts(10)
        .zipWithIndex.map { case (d, i) => s"(${i + 1}, ${d})" }.mkString(", ")
      s"""WITH e AS (
         |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |), sc AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id, c.v AS va, q.v AS vb
         |  FROM e c, e q WHERE q.vec_id < 10 AND c.vec_id != q.vec_id
         |), run AS (
         |  SELECT query_id, doc_id, rk FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY $cosSql DESC, doc_id) AS rk
         |    FROM sc) WHERE rk <= 10
         |), qr AS (
         |  SELECT q.vec_id AS query_id, d.vec_id AS doc_id,
         |         CASE WHEN d.label = q.label THEN 2 ELSE 1 END AS rel
         |  FROM e d, e q
         |  WHERE q.vec_id < 10 AND d.vec_id != q.vec_id
         |    AND (d.label = q.label OR abs(d.label - q.label) = 1)
         |), disc AS (
         |  SELECT * FROM (VALUES $discVals) AS t(rk, d)
         |), hit AS (
         |  SELECT r.query_id, r.rk, CASE qr.rel WHEN 2 THEN 3 ELSE 1 END AS gain
         |  FROM run r JOIN qr ON qr.query_id = r.query_id AND qr.doc_id = r.doc_id
         |), dcg AS (
         |  SELECT query_id, sum(gain * d.d) AS dcg_fp, count(*) AS n_rel_found,
         |         min(rk) AS frk
         |  FROM hit JOIN disc d USING (rk) GROUP BY 1
         |), ideal AS (
         |  SELECT query_id, rel,
         |         row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id) AS irk
         |  FROM qr
         |), idcg AS (
         |  SELECT query_id,
         |    sum(CASE WHEN irk <= 10
         |             THEN (CASE rel WHEN 2 THEN 3 ELSE 1 END) * d.d END) AS idcg_fp,
         |    count(*) AS n_rel
         |  FROM ideal LEFT JOIN disc d ON d.rk = irk GROUP BY 1
         |)
         |SELECT qq.query_id,
         |  CAST(coalesce(dcg_fp, 0) AS BIGINT) AS dcg_fp,
         |  CAST(coalesce(idcg_fp, 0) AS BIGINT) AS idcg_fp,
         |  CAST(CASE WHEN coalesce(idcg_fp, 0) = 0 THEN 0
         |            ELSE coalesce(dcg_fp, 0) * 10000 // idcg_fp END AS BIGINT) AS ndcg_bp,
         |  CAST(coalesce(1000000 // frk, 0) AS BIGINT) AS rr_fp,
         |  CAST(coalesce(n_rel_found, 0) AS BIGINT) AS n_rel_found,
         |  CAST(coalesce(n_rel, 0) AS BIGINT) AS n_rel
         |FROM (SELECT DISTINCT query_id FROM run) qq
         |LEFT JOIN dcg USING (query_id) LEFT JOIN idcg USING (query_id)""".stripMargin
    })

  /** #43 Language-balanced capping: at most 60 docs per language,
    * deterministically by doc_id — rebalances the en-heavy corpus.
    * The seeded-hash order variant is spec-tested (no cross-engine
    * hash to oracle against); doc_id order IS the oracle-able one.
    */
  val qLangBalance: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Sampling.capPerGroup(
        t(s, dir, "documents"), groupCol = "lang", orderCol = "doc_id", k = 60,
        seqCol = "lang_seq")
        .select(col("doc_id"), col("lang"), col("lang_seq")),
    oracle = Some(
      """SELECT doc_id, lang, lang_seq FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS lang_seq
        |  FROM documents
        |) WHERE lang_seq <= 60""".stripMargin))

  /** #41c Engine-reproducible stratified sample: en documents
    * downsampled to 25% by multiplicative key hash, other strata kept
    * — the oracle runs the identical integer formula, so the sampled
    * SET (not just its size) is pinned cross-engine.
    */
  val qHashSample: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Sampling.reproducibleStratified(
        t(s, dir, "documents"), "lang", "doc_id", Map("en" -> 0.25))
        .select(col("doc_id"), col("lang"), col("source")),
    oracle = Some(
      """SELECT doc_id, lang, source FROM documents
        |WHERE ((doc_id % 2147483648) * 2654435761) % 2147483648
        |      < CASE WHEN lang = 'en'
        |             THEN CAST(round(0.25 * 2147483648) AS BIGINT)
        |             ELSE 2147483648 END""".stripMargin))

  /** #43c Deterministic negative sampling: 3 pseudo-random contrast
    * partners per document from a fixed integer schedule — the oracle
    * regenerates the identical (doc_id, j, neg_id) triples, so the
    * training pairs themselves are pinned cross-engine.
    */
  val qNegSample: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Sampling.negativeSamples(
        t(s, dir, "documents"), "doc_id", k = 3),
    oracle = Some(
      """SELECT doc_id, j,
        |  ((doc_id % 2147483648) * 2654435761 + j * 40503) % 2147483648
        |    % (SELECT count(*) FROM documents) AS neg_id
        |FROM documents, unnest([1, 2, 3]) AS t(j)""".stripMargin))

  /** #43b Deterministic corpus shuffle + sharding: multiplicative-
    * hash pseudo-random order, reproducible engine-to-engine (the
    * oracle runs the identical integer formula) — training-data read
    * order without `ORDER BY rand()` or a global sort.
    */
  val qShuffleShard: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Sampling.shuffleShard(
        t(s, dir, "documents").select(col("doc_id")), "doc_id", shards = 8),
    oracle = Some(
      """WITH h AS (
        |  SELECT doc_id,
        |    ((doc_id % 2147483648) * 2654435761) % 2147483648 AS hv
        |  FROM documents
        |)
        |SELECT doc_id, hv % 8 AS shard,
        |  row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) AS pos
        |FROM h""".stripMargin))

  /** #44 Source-blocklist filtering: drop documents from denylisted
    * sources via broadcast anti join (the blocklist is a TABLE — see
    * Curation.dropBlockedSources).
    */
  private val blockedSources = Seq("src3", "src7", "src13")
  val qBlocklist: QueryDef = QueryDef(
    run = (s, dir) => {
      import s.implicits._
      val block = blockedSources.toDF("blocked_source")
      graft.operators.Curation.dropBlockedSources(
        t(s, dir, "documents"), "source", block, "blocked_source")
        .select(col("doc_id"), col("lang"), col("source"))
    },
    oracle = Some(
      // `IS NULL OR NOT IN` matches left-anti semantics: the anti join
      // KEEPS null sources, plain NOT IN would drop them
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE source IS NULL OR source NOT IN (${blockedSources.map(b => s"'$b'").mkString(", ")})""".stripMargin))

  /** #45 Benchmark decontamination: training docs (doc_id % 10 != 9)
    * sharing any 8-gram with the holdout (doc_id % 10 == 9). Spark
    * joins on 64-bit hashed shingles (codegen'd kernel, 8-byte
    * shuffle); the oracle joins raw n-gram strings — identical
    * results barring a 2^-64 hash collision.
    */
  val qDecontam: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 9)
      val test = docs.filter(pmod(col("doc_id"), lit(10)) === 9)
      graft.operators.Curation.decontaminate(train, test, n = 8)
    },
    oracle = Some(
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), tr AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_transform(range(1, len(w) - 6), i -> array_to_string(w[i:i+7], ' '))) AS sh
        |  FROM w WHERE doc_id % 10 != 9
        |), te AS (
        |  SELECT DISTINCT doc_id AS test_id,
        |         unnest(list_transform(range(1, len(w) - 6), i -> array_to_string(w[i:i+7], ' '))) AS sh
        |  FROM w WHERE doc_id % 10 = 9
        |)
        |SELECT tr.doc_id,
        |       count(DISTINCT sh) AS n_shared_ngrams,
        |       count(DISTINCT test_id) AS n_test_docs
        |FROM tr JOIN te USING (sh)
        |GROUP BY tr.doc_id""".stripMargin))

  /** #45b Incremental decontamination: holdout n-gram index built
    * ONCE, two train batches checked against it at O(batch) each;
    * union of batch outputs == the one-shot run — same oracle as
    * decontam_ngram.
    */
  val qDecontamInc: QueryDef = QueryDef(
    run = (s, dir) => {
      val idx = scratch("decontam-index")
      val docs = t(s, dir, "documents")
      val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 9)
      graft.operators.Curation.buildDecontamIndex(
        docs.filter(pmod(col("doc_id"), lit(10)) === 9), idx, n = 8)
      val b1 = graft.operators.Curation.decontaminateIncremental(
        s, idx, train.filter(col("doc_id") % 2 === 0), n = 8)
      val b2 = graft.operators.Curation.decontaminateIncremental(
        s, idx, train.filter(col("doc_id") % 2 === 1), n = 8)
      b1.unionByName(b2)
    },
    oracle = qDecontam.oracle)

  /** #46 Sequence packing: per-language concatenate-and-cut into
    * 512-token packs (see Curation.pack) — the doc→training-batch
    * layout step.
    */
  val qTextPack: QueryDef = QueryDef(
    run = (s, dir) => {
      val withTok = graft.operators.TextAnalysis.withTokenCounts(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("ws_tokens").cast("long").as("n_tokens"))
      graft.operators.Curation.pack(withTok,
        partitionCol = "lang", orderCol = "doc_id", weightCol = "n_tokens", budget = 512L)
    },
    oracle = Some(
      """WITH tkn AS (
        |  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM tkn
        |)
        |SELECT doc_id, lang, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id,
        |  CAST((cum - n_tokens) % 512 AS BIGINT) AS pack_off
        |FROM c""".stripMargin))

  /** #46b Whole-document bin packing (first-fit decreasing): docs
    * never split across packs — attention-boundary-safe batching.
    * The placement rule is sequential per shard, but DETERMINISTIC
    * integer arithmetic — so the oracle replays it exactly with a
    * recursive CTE that places one document per recursion step,
    * carrying each shard's bin fills as a list (first fit =
    * `nullif(list_position(...), 0)`, DuckDB's 0 = not-found).
    * Invariants (budget, ceil(total/budget) lower bound,
    * bit-reproducibility) are additionally spec-tested.
    */
  val qTextPackFfd: QueryDef = QueryDef(
    run = (s, dir) => {
      val withTok = graft.operators.TextAnalysis.withTokenCounts(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("ws_tokens").cast("long").as("n_tokens"))
      graft.operators.Curation.packFfd(withTok,
        partitionCol = "lang", idCol = "doc_id", weightCol = "n_tokens", budget = 512L)
    },
    oracle = Some(
      """WITH RECURSIVE tkn AS (
        |  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents
        |), items AS (
        |  SELECT lang, doc_id, n_tokens,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_tokens DESC, doc_id) AS rn
        |  FROM tkn
        |), steps AS (
        |  SELECT lang, CAST(0 AS BIGINT) AS rn, CAST([] AS BIGINT[]) AS fills,
        |         CAST([] AS STRUCT(id BIGINT, w BIGINT, pack INT, off BIGINT)[]) AS asg
        |  FROM (SELECT DISTINCT lang FROM items)
        |  UNION ALL
        |  SELECT s.lang, i.rn,
        |    CASE WHEN coalesce(nullif(list_position(list_transform(s.fills, f -> f + i.n_tokens <= 512), true), 0), len(s.fills)+1) <= len(s.fills)
        |         THEN list_transform(s.fills, (f, ix) -> CASE WHEN ix = coalesce(nullif(list_position(list_transform(s.fills, f2 -> f2 + i.n_tokens <= 512), true), 0), len(s.fills)+1) THEN f + i.n_tokens ELSE f END)
        |         ELSE list_append(s.fills, i.n_tokens) END AS fills,
        |    list_append(s.asg, {id: i.doc_id, w: i.n_tokens,
        |      pack: CAST(coalesce(nullif(list_position(list_transform(s.fills, f -> f + i.n_tokens <= 512), true), 0), len(s.fills)+1) - 1 AS INT),
        |      off: coalesce(s.fills[coalesce(nullif(list_position(list_transform(s.fills, f -> f + i.n_tokens <= 512), true), 0), len(s.fills)+1)], 0)}) AS asg
        |  FROM steps s JOIN items i ON i.lang = s.lang AND i.rn = s.rn + 1
        |), final AS (
        |  SELECT lang, asg, row_number() OVER (PARTITION BY lang ORDER BY rn DESC) AS rk FROM steps
        |)
        |SELECT lang, u.a.id AS doc_id, u.a.w AS n_tokens, u.a.pack AS pack_id, u.a.off AS pack_off
        |FROM (SELECT lang, unnest(asg) AS a FROM final WHERE rk = 1) u(lang, a)""".stripMargin))

  /** #82 DSIR-style importance weights (hashed-unigram frequency
    * ratios vs the English target domain, add-one smoothed, exact
    * integer arithmetic — see Curation.importanceWeights). The
    * oracle re-derives word buckets from the FNV fold over ASCII
    * codepoints and the same floor-divided ratio in HUGEINT.
    */
  val qImportance: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Curation.importanceWeights(
      t(s, dir, "documents"), isTarget = col("lang") === "en"),
    oracle = Some(
      """WITH tok AS (
        |  SELECT doc_id, lang = 'en' AS t, w
        |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE strlen(w) >= 1
        |), wh AS (
        |  SELECT w, CAST(list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |      list_transform(range(1, strlen(w)+1), i -> CAST(unicode(w[i]) AS HUGEINT))),
        |    (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                 * 1099511628211) % 18446744073709551616
        |  ) % 256 AS BIGINT) AS b
        |  FROM (SELECT DISTINCT w FROM tok)
        |), bc AS (
        |  SELECT b,
        |    sum(CASE WHEN t THEN 1 ELSE 0 END) AS tc,
        |    sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS rc
        |  FROM tok JOIN wh USING (w) GROUP BY b
        |), tot AS (
        |  SELECT CAST(sum(tc) AS HUGEINT) AS ttot, CAST(sum(rc) AS HUGEINT) AS rtot FROM bc
        |), r AS (
        |  SELECT b, CAST((CAST(tc + 1 AS HUGEINT) * rtot * 10000)
        |                 // (CAST(rc + 1 AS HUGEINT) * ttot) AS BIGINT) AS ratio
        |  FROM bc, tot
        |)
        |SELECT doc_id, count(*) AS n_tokens, CAST(sum(ratio) AS BIGINT) AS importance
        |FROM tok JOIN wh USING (w) JOIN r USING (b)
        |GROUP BY doc_id""".stripMargin))

  /** #82b Importance RESAMPLING — the selection half DSIR's weights
    * exist for: keep doc i with P = importanceᵢ/max(importance),
    * drawn deterministically (hash₃₁(id)·wMax < w·2³¹,
    * division-free cross-multiplication) so the kept SET is
    * byte-identical on any engine — oracled by suffixing the
    * resample onto the full importance-weight re-derivation (see
    * [[graft.operators.Sampling.weightedBernoulli]]).
    */
  val qImportanceResample: QueryDef = QueryDef(
    run = (s, dir) => {
      val w = graft.operators.Curation.importanceWeights(
        t(s, dir, "documents"), isTarget = col("lang") === "en")
      graft.operators.Sampling.weightedBernoulli(w, col("doc_id"), col("importance"))
    },
    oracle = Some {
      val imp = qImportance.oracle.get
      val cut = imp.lastIndexOf("SELECT doc_id, count(*) AS n_tokens")
      require(cut > 0, "importance oracle shape changed; fix the resample suffix")
      imp.substring(0, cut) +
        """, imp AS (
          |  SELECT doc_id, count(*) AS n_tokens, CAST(sum(ratio) AS BIGINT) AS importance
          |  FROM tok JOIN wh USING (w) JOIN r USING (b)
          |  GROUP BY doc_id
          |), mx AS (
          |  SELECT CAST(max(importance) AS HUGEINT) AS m FROM imp
          |)
          |SELECT doc_id, n_tokens, importance
          |FROM imp CROSS JOIN mx
          |WHERE CAST(((doc_id % 2147483648) * 2654435761) % 2147483648 AS HUGEINT) * m
          |      < CAST(importance AS HUGEINT) * 2147483648""".stripMargin
    })

  /** #47 Repetition metrics: within-doc duplicate 3-gram signals
    * (see TextAnalysis.repetitionMetrics).
    */
  val qTextRepetition: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.TextAnalysis.repetitionMetrics(t(s, dir, "documents"), n = 3),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), g AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))) AS g
        |  FROM t WHERE len(w) >= 3
        |), c AS (
        |  SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2
        |)
        |SELECT doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_ngrams,
        |  count(*) AS n_distinct,
        |  CAST(max(c) AS BIGINT) AS max_rep,
        |  CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dup_ratio
        |FROM c GROUP BY doc_id""".stripMargin))

  /** #48 Heavy-hitter terms (share >= 0.5%): Misra-Gries candidates +
    * exact verification (see HeavyHitters) — the oracle is the plain
    * exact HAVING query, which the sketch-pruned plan must reproduce
    * EXACTLY by the survival guarantee.
    */
  val qHeavyTerms: QueryDef = QueryDef(
    run = (s, dir) => {
      val tokens = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
      graft.operators.HeavyHitters.frequent(tokens, "term", minShare = 0.005)
    },
    oracle = Some(
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents
        |), n AS (
        |  SELECT count(*) AS n_total FROM tok
        |)
        |SELECT term, count(*) AS n, (SELECT n_total FROM n) AS n_total
        |FROM tok GROUP BY term
        |HAVING count(*) >= 0.005 * (SELECT n_total FROM n)""".stripMargin))

  /** #49 Token-id encoding against the built vocabulary (top-200
    * covers the corpus; OOV stays null by LEFT-join semantics).
    */
  val qTextEncode: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.TextAnalysis.encode(
        docs, graft.operators.TextAnalysis.vocab(docs, topK = 200))
    },
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(range(len(w))) AS pos, unnest(w) AS term FROM t
        |), agg AS (
        |  SELECT term, count(*) AS tf FROM tok GROUP BY term
        |), vocab AS (
        |  SELECT term, row_number() OVER (ORDER BY tf DESC, term) AS token_id FROM agg
        |  QUALIFY token_id <= 200
        |)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos, v.token_id
        |FROM tok LEFT JOIN vocab v USING (term)""".stripMargin))

  /** #28b Per-label embedding centroids: elementwise mean via
    * posexplode + one hash aggregate — map-side partial combine
    * collapses the exploded rows to labels × dims before the shuffle.
    * Accumulation is FIXED-POINT (floor(v·1e9) summed as longs): an
    * order-independent, rounding-mode-free quantization — decimal
    * casts of a dyadic float differ between engines (Spark HALF_UP vs
    * DuckDB HALF_EVEN at the cut digit), while floor after an exact
    * float→double widen is bit-defined everywhere. 1e-9 resolution
    * dwarfs float32 input precision.
    */
  val qEmbCentroids: QueryDef = QueryDef(
    run = (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(
          (sum(floor(col("v").cast("double") * 1e9).cast("long")).cast("double")
            / count(lit(1)) / 1e9).as("centroid"),
          count(lit(1)).as("n_vectors"))
        .withColumn("pos", col("pos").cast("long")),
    oracle = Some(
      """WITH e AS (
        |  SELECT label,
        |         unnest(range(len(embedding))) AS pos,
        |         unnest(embedding) AS v
        |  FROM embeddings
        |)
        |SELECT label, CAST(pos AS BIGINT) AS pos,
        |  CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000000.0) AS BIGINT)) AS DOUBLE)
        |    / count(*) / 1000000000.0 AS centroid,
        |  count(*) AS n_vectors
        |FROM e GROUP BY label, pos""".stripMargin))

  /** #28c Int8 scalar quantization of embeddings (bounded to
    * vec_id < 200 for the dump; the operator is corpus-generic) —
    * floor-based so codes are bit-identical across engines.
    */
  val qEmbQuantize: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Similarity.scalarQuantize(
        t(s, dir, "embeddings").filter(col("vec_id") < 200)),
    oracle = Some(
      """WITH e AS (
        |  SELECT vec_id,
        |         CAST(list_min(embedding) AS DOUBLE) AS mn,
        |         CAST(list_max(embedding) AS DOUBLE) AS mx,
        |         unnest(range(len(embedding))) AS pos,
        |         unnest(embedding) AS v
        |  FROM embeddings WHERE vec_id < 200
        |)
        |SELECT vec_id, CAST(pos AS BIGINT) AS pos,
        |  CAST(CASE WHEN mx = mn THEN 0
        |       ELSE least(255, floor((CAST(v AS DOUBLE) - mn) * 255 / (mx - mn))) END AS INT) AS code
        |FROM e""".stripMargin))

  /** #29b IVF (KMeans coarse quantizer) approximate top-k — FULLY
    * ORACLED: sample order, the 10 Lloyd iterations, float-cast cell
    * assignment, probes, and the in-cell cosine top-k are all
    * re-derived in DuckDB ([[OracleSql.ivfTopkSql]]); the recall spec
    * against brute force stays as the semantic check. */
  val qSimIvfTopk: QueryDef = QueryDef(
    run = (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
    },
    oracle = Some(OracleSql.ivfTopkSql()))

  /** #29c Persisted IVF index: built once (centroids + cell-
    * partitioned corpus on disk), queried with explicit partition
    * pruning — probe work AND I/O are ~nprobe/nlist of the corpus.
    * Shares sim_ivf_topk's oracle: centroids round-trip parquet as
    * exact doubles, so the persisted index must answer exactly what
    * the inline computation answers — the gate now PROVES the
    * equality the spec used to assert.
    */
  val qSimIvfIndexTopk: QueryDef = QueryDef(
    run = (s, dir) => {
      val idx = scratch("ivf-index")
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.buildIvfIndex(emb, idx, nlist = 16)
      graft.operators.Similarity.ivfIndexTopK(s, idx, emb.filter(col("vec_id") < 10),
        k = 5, nprobe = 2)
    },
    oracle = Some(OracleSql.ivfTopkSql()))

  /** #34 Multimodal plumbing, ORACLED: binary payloads → batch
    * decode stub → feature columns, with the 8-dim content embedding
    * EXPLODED to (dim, fval) rows. Every output is deterministic
    * integer-or-IEEE arithmetic DuckDB re-derives from first
    * principles: dims/frames as modular arithmetic on the payload's
    * FNV-1a64 (the q_mm_decode derivation), and each feature value
    * as one more FNV fold step (payload ++ dim byte) divided by
    * Long.MaxValue — integer→double casts, division, and the
    * double→float demotion are all correctly-rounded IEEE ops, so
    * the floats match bit-for-bit cross-engine. Only byte_entropy
    * (log-based, libm-dependent) stays out of the gate projection;
    * the ScalaTest spec covers it.
    */
  val qMmFeatures: QueryDef = QueryDef(
    run = (s, dir) => {
      val media = graft.operators.Multimodal.mediaFromDocuments(t(s, dir, "documents"))
      graft.operators.Multimodal.decodeStub(media).toDF()
        .select(col("media_id"), col("modality"), col("n_bytes"), col("width"),
          col("height"), col("n_frames"), posexplode(col("feature")).as(Seq("dim", "fval")))
    },
    oracle = Some(
      """WITH by AS (
        |  SELECT doc_id, flatten(list_transform(range(1, length(text)+1), i -> CASE
        |    WHEN unicode(text[i]) < 128 THEN [unicode(text[i])]
        |    WHEN unicode(text[i]) < 2048 THEN
        |      [192 + unicode(text[i]) // 64, 128 + unicode(text[i]) % 64]
        |    WHEN unicode(text[i]) < 65536 THEN
        |      [224 + unicode(text[i]) // 4096, 128 + (unicode(text[i]) // 64) % 64,
        |       128 + unicode(text[i]) % 64]
        |    ELSE
        |      [240 + unicode(text[i]) // 262144, 128 + (unicode(text[i]) // 4096) % 64,
        |       128 + (unicode(text[i]) // 64) % 64, 128 + unicode(text[i]) % 64]
        |  END)) AS bs
        |  FROM documents
        |), fp AS (
        |  SELECT doc_id, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |                 list_transform(bs, b -> CAST(b AS HUGEINT))),
        |    (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                 * 1099511628211) % 18446744073709551616
        |  ) AS h
        |  FROM by
        |), fd AS (
        |  SELECT doc_id, h, unnest(range(0, 8)) AS dim FROM fp
        |), fv AS (
        |  SELECT doc_id, dim,
        |    ((h - h % 256 + xor(CAST(h % 256 AS BIGINT), CAST(dim AS BIGINT)))
        |     * 1099511628211) % 18446744073709551616 AS hd
        |  FROM fd
        |)
        |SELECT doc_id AS media_id,
        |  CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(64 + (CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |                  THEN CAST(18446744073709551616 AS HUGEINT) - h
        |                  ELSE h END) % 1024 AS INT) AS width,
        |  CAST(64 + (h // 131072) % 1024 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 2
        |            THEN 1 + (h // 2147483648) % 32 ELSE 1 END AS INT) AS n_frames,
        |  CAST(dim AS INT) AS dim,
        |  CAST(CAST(CASE WHEN hd >= CAST(9223372036854775808 AS HUGEINT)
        |                 THEN hd - CAST(18446744073709551616 AS HUGEINT)
        |                 ELSE hd END AS DOUBLE)
        |       / CAST(9223372036854775807 AS DOUBLE) AS REAL) AS fval
        |FROM fv JOIN fp USING (doc_id) JOIN documents USING (doc_id)""".stripMargin))

  /** #34b Multimodal metadata rollup, ORACLED: per-modality counts
    * and byte-size stats computed on the opaque `binary` payload
    * (length() over binary = payload bytes). The oracle reconstructs
    * the media table's metadata from documents (payload = UTF-8 text
    * bytes; the corpus is ASCII, so strlen == octet count — asserted
    * by the hash match itself).
    */
  val qMmMetadata: QueryDef = QueryDef(
    run = (s, dir) => {
      val media = graft.operators.Multimodal.mediaFromDocuments(t(s, dir, "documents"))
      media.toDF()
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n_media"),
          sum(length(col("content"))).as("total_bytes"),
          min(length(col("content"))).as("min_bytes"),
          max(length(col("content"))).as("max_bytes"))
    },
    oracle = Some(
      """SELECT CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  count(*) AS n_media,
        |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        |  CAST(min(strlen(text)) AS INTEGER) AS min_bytes,
        |  CAST(max(strlen(text)) AS INTEGER) AS max_bytes
        |FROM documents GROUP BY 1""".stripMargin))

  /** #34c Multimodal decode-stub dimensions, ORACLED: the stub's
    * width/height/frame outputs are pure integer functions of the
    * payload's FNV-1a64 (decodeOne, Multimodal.scala), so DuckDB
    * re-derives them from first principles — UTF-8 byte expansion of
    * the RAW text payload (no normalization, unlike the fingerprint),
    * the same HUGEINT FNV fold, then width/height/frames as modular
    * arithmetic on the unsigned hash. byte_entropy and the float
    * feature vector stay under mm_features' rows-only check.
    */
  val qMmDecode: QueryDef = QueryDef(
    run = (s, dir) => {
      val media = graft.operators.Multimodal.mediaFromDocuments(t(s, dir, "documents"))
      graft.operators.Multimodal.decodeStub(media).toDF()
        .select(col("media_id"), col("modality"), col("n_bytes"),
          col("width"), col("height"), col("n_frames"))
    },
    oracle = Some(
      """WITH by AS (
        |  SELECT doc_id, flatten(list_transform(range(1, length(text)+1), i -> CASE
        |    WHEN unicode(text[i]) < 128 THEN [unicode(text[i])]
        |    WHEN unicode(text[i]) < 2048 THEN
        |      [192 + unicode(text[i]) // 64, 128 + unicode(text[i]) % 64]
        |    WHEN unicode(text[i]) < 65536 THEN
        |      [224 + unicode(text[i]) // 4096, 128 + (unicode(text[i]) // 64) % 64,
        |       128 + unicode(text[i]) % 64]
        |    ELSE
        |      [240 + unicode(text[i]) // 262144, 128 + (unicode(text[i]) // 4096) % 64,
        |       128 + (unicode(text[i]) // 64) % 64, 128 + unicode(text[i]) % 64]
        |  END)) AS bs
        |  FROM documents
        |), fp AS (
        |  SELECT doc_id, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |                 list_transform(bs, b -> CAST(b AS HUGEINT))),
        |    (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                 * 1099511628211) % 18446744073709551616
        |  ) AS h
        |  FROM by
        |)
        |SELECT doc_id AS media_id,
        |  CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(64 + (CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |                  THEN CAST(18446744073709551616 AS HUGEINT) - h
        |                  ELSE h END) % 1024 AS INT) AS width,
        |  CAST(64 + (h // 131072) % 1024 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 2
        |            THEN 1 + (h // 2147483648) % 32 ELSE 1 END AS INT) AS n_frames
        |FROM fp JOIN documents USING (doc_id)""".stripMargin))

  /** #34d Perceptual-hash multimodal near-dup (dHash): 64-bit
    * signature from an 8×9 block-mean downsample of the binary
    * payload (adjacent-mean comparison bits — the real dHash shape
    * with the pixel decode stubbed to the byte signal), banded by the
    * same 4×16-bit pigeonhole as dedup_simhash (provably complete at
    * Hamming ≤ 3). The corpus is the media table PLUS a re-encoded
    * copy of every payload (first byte changed, id offset 10⁶) — the
    * re-saved-image scenario perceptual hashing exists for: a 1-byte
    * difference moves one block sum, flipping at most the two
    * comparisons that block borders, so every (original, copy) pair
    * is within Hamming 2 and provably caught. FULLY ORACLED: block
    * sums are exact integer arithmetic over the payload's UTF-8
    * bytes, mean comparisons are cross-multiplied sums (no division
    * anywhere), so DuckDB re-derives every signature from first
    * principles and checks the complete pair set brute-force.
    */
  val qDedupPhash: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      val reencoded = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        overlay(col("text"), lit("x"), lit(1)).as("text"),
        col("source"))
      val media = graft.operators.Multimodal
        .mediaFromDocuments(docs.select(col("doc_id"), col("text"), col("source"))
          .unionByName(reencoded)).toDF()
      graft.operators.Dedup.phashPairs(media, "media_id", "content")
    },
    oracle = Some(
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'x' || substr(text, 2) FROM documents
        |), by AS (
        |  SELECT doc_id, flatten(list_transform(range(1, length(text)+1), i -> CASE
        |    WHEN unicode(text[i]) < 128 THEN [unicode(text[i])]
        |    WHEN unicode(text[i]) < 2048 THEN
        |      [192 + unicode(text[i]) // 64, 128 + unicode(text[i]) % 64]
        |    WHEN unicode(text[i]) < 65536 THEN
        |      [224 + unicode(text[i]) // 4096, 128 + (unicode(text[i]) // 64) % 64,
        |       128 + unicode(text[i]) % 64]
        |    ELSE
        |      [240 + unicode(text[i]) // 262144, 128 + (unicode(text[i]) // 4096) % 64,
        |       128 + (unicode(text[i]) // 64) % 64, 128 + unicode(text[i]) % 64]
        |  END)) AS bs
        |  FROM corpus
        |), blocks AS (
        |  SELECT doc_id, r.b AS b,
        |    coalesce(list_sum(bs[(r.b * len(bs) // 72) + 1 : ((r.b + 1) * len(bs) // 72)]), 0) AS s,
        |    ((r.b + 1) * len(bs) // 72) - (r.b * len(bs) // 72) AS n
        |  FROM by, range(0, 72) r(b)
        |), bits AS (
        |  SELECT b0.doc_id, (b0.b // 9) * 8 + (b0.b % 9) AS pos,
        |    CASE WHEN b1.s * b0.n > b0.s * b1.n THEN 1 ELSE 0 END AS bit
        |  FROM blocks b0 JOIN blocks b1 ON b1.doc_id = b0.doc_id AND b1.b = b0.b + 1
        |  WHERE b0.b % 9 < 8
        |), sigs AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN bit = 1 THEN (CAST(1 AS HUGEINT) << CAST(pos AS HUGEINT))
        |                  ELSE CAST(0 AS HUGEINT) END)
        |      - CASE WHEN max(CASE WHEN pos = 63 AND bit = 1 THEN 1 ELSE 0 END) = 1
        |             THEN CAST(18446744073709551616 AS HUGEINT)
        |             ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS sig
        |  FROM bits GROUP BY doc_id
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin))

  /** #34e Chunk-level media payload dedup via content-defined
    * chunking ([[graft.operators.Multimodal.chunkStoreStats]]): the
    * media corpus PLUS a footer-appended re-encode of every payload
    * (id +3·10⁶ so modality assignment is preserved) — the appended-
    * metadata scenario CDC exists for. Because boundaries are decided
    * by a local 16-byte window hash (positions independent, mod-32
    * gear), appending bytes at the END changes no interior boundary:
    * every chunk of the copy except the tail region hits the chunk
    * store, and the per-modality stored/total ratio shows it. FULLY
    * ORACLED: the UTF-8 byte expansion, every window hash, every
    * chunk hash and the store stats are re-derived in DuckDB with
    * the same HUGEINT FNV fold (mod-32 of the unsigned fold equals
    * the JVM's signed floorMod — 32 divides 2⁶⁴).
    */
  val qMmChunkDedup: QueryDef = QueryDef(
    run = (s, dir) => {
      val docs = t(s, dir, "documents")
      val copies = docs.select((col("doc_id") + 3000000L).as("doc_id"),
        concat(col("text"), lit("#footer")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      val media = graft.operators.Multimodal.mediaFromDocuments(docs.unionByName(copies))
      graft.operators.Multimodal.chunkStoreStats(media.toDF(), w = 16, div = 32)
    },
    oracle = Some(
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 3000000, text || '#footer' FROM documents
        |), by AS (
        |  SELECT doc_id, flatten(list_transform(range(1, length(text)+1), i -> CASE
        |    WHEN unicode(text[i]) < 128 THEN [unicode(text[i])]
        |    WHEN unicode(text[i]) < 2048 THEN
        |      [192 + unicode(text[i]) // 64, 128 + unicode(text[i]) % 64]
        |    WHEN unicode(text[i]) < 65536 THEN
        |      [224 + unicode(text[i]) // 4096, 128 + (unicode(text[i]) // 64) % 64,
        |       128 + unicode(text[i]) % 64]
        |    ELSE
        |      [240 + unicode(text[i]) // 262144, 128 + (unicode(text[i]) // 4096) % 64,
        |       128 + (unicode(text[i]) // 64) % 64, 128 + unicode(text[i]) % 64]
        |  END)) AS bs
        |  FROM corpus
        |), bd AS (
        |  SELECT doc_id, bs,
        |    [0] || list_filter(range(16, len(bs)), p ->
        |      list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |        list_transform(bs[p-15:p], b -> CAST(b AS HUGEINT))),
        |        (acc, b) -> ((acc - acc % 256
        |                      + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                     * 1099511628211) % 18446744073709551616
        |      ) % 32 = 0) || [len(bs)] AS edges
        |  FROM by
        |), ch AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(edges)), j ->
        |    {h: list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |          list_transform(bs[edges[j]+1:edges[j+1]], b -> CAST(b AS HUGEINT))),
        |          (acc, b) -> ((acc - acc % 256
        |                        + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                       * 1099511628211) % 18446744073709551616),
        |     l: edges[j+1] - edges[j]})) AS c
        |  FROM bd
        |), rows_ AS (
        |  SELECT CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |              ELSE 'video' END AS modality,
        |         c.h AS hash, c.l AS len
        |  FROM ch WHERE c.l > 0
        |), g AS (
        |  SELECT modality, hash, len, count(*) AS n FROM rows_ GROUP BY 1, 2, 3
        |)
        |SELECT modality,
        |  CAST(sum(n) AS BIGINT) AS n_chunks,
        |  CAST(count(*) AS BIGINT) AS n_distinct_chunks,
        |  CAST(sum(len * n) AS BIGINT) AS total_bytes,
        |  CAST(sum(len) AS BIGINT) AS stored_bytes,
        |  CAST(sum(len) * 10000 // sum(len * n) AS BIGINT) AS dedup_bp
        |FROM g GROUP BY 1""".stripMargin))

  /** #14o Merkle-style table content digest per partition — the
    * anti-entropy primitive of table replication (compare digests,
    * re-sync only mismatched groups). Order-independent: Σ fnv64 of
    * a canonical row string in decimal, mod 2⁶³ — so file layout and
    * shuffle order never matter, only content. The oracle re-derives
    * the FNV fold over the canonical string's ASCII codepoints and
    * the same modular sum in HUGEINT.
    */
  val qTableDigest: QueryDef = QueryDef(
    run = (s, dir) => {
      val canonical = concat_ws("\u001f",
        col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)"))
      graft.operators.Profiler.contentDigest(
        t(s, dir, "orders"), Seq("o_orderpriority"), canonical)
    },
    oracle = Some(
      """WITH c AS (
        |  SELECT o_orderpriority,
        |    CAST(o_orderkey AS VARCHAR) || chr(31) || CAST(o_custkey AS VARCHAR) || chr(31)
        |      || o_orderpriority || chr(31) || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS s
        |  FROM orders
        |), h AS (
        |  SELECT o_orderpriority, list_reduce(
        |    list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |      list_transform(range(1, length(s)+1), i -> CAST(unicode(s[i]) AS HUGEINT))),
        |    (acc, b) -> ((acc - acc % 256 + xor(CAST(acc % 256 AS BIGINT), CAST(b AS BIGINT)))
        |                 * 1099511628211) % 18446744073709551616
        |  ) AS hu
        |  FROM c
        |)
        |SELECT o_orderpriority, count(*) AS n_rows,
        |  CAST(sum(hu) % 9223372036854775808 AS BIGINT) AS digest
        |FROM h GROUP BY o_orderpriority""".stripMargin))

  /** #56b Fixed-point EWMA per user (α = ½): s₁ = x₁,
    * sₜ = ⌊(sₜ₋₁+xₜ)/2⌋ over cents in (ts, event_id) order — see
    * EventAnalytics.ewma. The oracle replays the recurrence with a
    * recursive CTE stepping row_number per user (values are
    * non-negative, so `//` floor = Spark `div` truncation).
    */
  val qEwma: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.EventAnalytics.ewma(
      t(s, dir, "events").withColumn("cents", round(col("value") * 100).cast("long")),
      entityCol = "user_id", tsCol = "ts", idCol = "event_id", centsCol = "cents"),
    oracle = Some(
      """WITH RECURSIVE e AS (
        |  SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |), r AS (
        |  SELECT user_id, event_id, ts, cents, rn, cents AS ewma FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.ts, e.cents, e.rn, (r.ewma + e.cents) // 2
        |  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
        |)
        |SELECT user_id, event_id, ts, cents, CAST(ewma AS BIGINT) AS ewma FROM r""".stripMargin))

  /** #56c Time-weighted average value per user (TWAP): each event's
    * value holds until the next event; weights in epoch-micros,
    * cents through decimal(18,2), weighted sum in decimal(38,0),
    * final division integer DIV — exact on any engine (cents are
    * non-negative, so floor = truncation).
    */
  val qTwap: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.EventAnalytics.timeWeightedAvg(
      t(s, dir, "events"), entityCol = "user_id", tsCol = "ts",
      idCol = "event_id", valueCol = "value"),
    oracle = Some(
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events
        |), led AS (
        |  SELECT user_id, ts_us, cents,
        |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS next_us
        |  FROM e
        |), agg AS (
        |  SELECT user_id, count(*) AS n_events,
        |         max(ts_us) - min(ts_us) AS span_us,
        |         sum(CASE WHEN next_us IS NOT NULL
        |             THEN CAST(cents AS HUGEINT) * (next_us - ts_us)
        |             ELSE CAST(0 AS HUGEINT) END) AS num
        |  FROM led GROUP BY user_id
        |)
        |SELECT user_id, n_events, span_us, CAST(num // span_us AS BIGINT) AS twap_cents
        |FROM agg WHERE span_us > 0""".stripMargin))

  /** #56d Throttle / debounce: per (user, type), keep an event only
    * when >= 1h has passed since the last KEPT event — a true
    * recurrence (see EventAnalytics.throttle), oracled like q_ewma
    * by replaying the fold one row per step in a recursive CTE.
    */
  val qThrottle: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.EventAnalytics.throttle(
      t(s, dir, "events"), entityCol = "user_id", channelCol = "event_type",
      tsCol = "ts", idCol = "event_id", minGap = lit(3600L)),
    oracle = Some(
      """WITH RECURSIVE e AS (
        |  SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
        |  FROM events
        |), r AS (
        |  SELECT user_id, event_type, event_id, ts, ts_us, rn,
        |         ts_us AS last_kept, TRUE AS kept
        |  FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_type, e.event_id, e.ts, e.ts_us, e.rn,
        |    CASE WHEN e.ts_us >= r.last_kept + 3600000000 THEN e.ts_us ELSE r.last_kept END,
        |    e.ts_us >= r.last_kept + 3600000000
        |  FROM r JOIN e ON e.user_id = r.user_id AND e.event_type = r.event_type
        |                AND e.rn = r.rn + 1
        |)
        |SELECT user_id, event_type, event_id, ts FROM r WHERE kept""".stripMargin))

  /** #20g Interval-overlap join: click-intervals × view-intervals
    * per user ([ts, ts + value minutes], closed ends) through the
    * binned equi-join — the oracle is the plain inequality join the
    * optimizer-unfriendly formulation would run. 10-minute bins;
    * each pair emits once (the bin owning the overlap's start).
    */
  val qIntervalJoin: QueryDef = QueryDef(
    run = (s, dir) => {
      val ev = t(s, dir, "events")
      def side(tp: String, pfx: String) = ev.filter(col("event_type") === tp)
        .select(col("user_id"), col("event_id").as(s"${pfx}_id"),
          unix_micros(col("ts").cast("timestamp")).as(s"${pfx}_start"),
          (unix_micros(col("ts").cast("timestamp")) +
            (col("value").cast("decimal(18,2)") * 100).cast("long") * 600000L)
            .as(s"${pfx}_end"))
      graft.operators.RangeJoin.intervalOverlap(
        side("click", "c"), side("view", "v"), Seq("user_id"),
        "c_start", "c_end", "v_start", "v_end", binWidth = 600L * 1000000L)
    },
    oracle = Some(
      """WITH b AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS s_us,
        |    epoch_us(CAST(ts AS TIMESTAMP))
        |      + CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) * 600000 AS e_us
        |  FROM events
        |)
        |SELECT c.user_id, c.event_id AS c_id, c.s_us AS c_start, c.e_us AS c_end,
        |       v.event_id AS v_id, v.s_us AS v_start, v.e_us AS v_end
        |FROM b c JOIN b v ON c.user_id = v.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND c.s_us <= v.e_us AND v.s_us <= c.e_us""".stripMargin))

  /** #14p MAD outliers: |x − median| > 3 × median-absolute-deviation
    * per event type — the 50%-breakdown robust fence next to IQR and
    * z-scores. Percentile interpolation parity with quantile_cont
    * plus IEEE deviation arithmetic makes the flagged set exact.
    */
  val qMadOutliers: QueryDef = QueryDef(
    run = (s, dir) => graft.operators.Profiler.madOutliers(
        t(s, dir, "events").withColumn("cents", round(col("value") * 100).cast("long")),
        "event_type", "cents", k = 3.0)
      .select(col("event_id"), col("event_type"), col("cents"), col("med"), col("mad")),
    oracle = Some(
      """WITH c AS (
        |  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
        |), m AS (
        |  SELECT event_type, quantile_cont(cents, 0.5) AS med FROM c GROUP BY 1
        |), d AS (
        |  SELECT event_type, quantile_cont(abs(cents - med), 0.5) AS mad
        |  FROM c JOIN m USING (event_type) GROUP BY 1
        |)
        |SELECT c.event_id, c.event_type, c.cents, m.med, d.mad
        |FROM c JOIN m USING (event_type) JOIN d USING (event_type)
        |WHERE abs(c.cents - m.med) > 3 * d.mad""".stripMargin))

  /** #14h Winsorization: per-type clamp of integral cents to the
    * [12.5%, 87.5%] interpolated percentiles. Dyadic percentile
    * positions (k/2³) over integral values interpolate exactly in
    * double on both engines — the quartile-fence trick generalized.
    */
  val qWinsorize: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Profiler.winsorize(
        t(s, dir, "events").withColumn("cents", round(col("value") * 100)),
        "event_type", "cents")
        .select(col("event_id"), col("event_type"), col("cents"),
          col("clip_lo"), col("clip_hi"), col("cents_clipped")),
    oracle = Some(
      """WITH c AS (
        |  SELECT event_id, event_type, round(value * 100) AS cents FROM events
        |), q AS (
        |  SELECT event_type,
        |    quantile_cont(cents, 0.125) AS clip_lo,
        |    quantile_cont(cents, 0.875) AS clip_hi
        |  FROM c GROUP BY event_type
        |)
        |SELECT c.event_id, c.event_type, c.cents, q.clip_lo, q.clip_hi,
        |  least(greatest(c.cents, q.clip_lo), q.clip_hi) AS cents_clipped
        |FROM c JOIN q USING (event_type)""".stripMargin))

  /** #14i Pairwise sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²)
    * per event_type over (cents, props.k) — exact BIGINT sums, so the
    * derived covariance and OLS slope are single exact-integer
    * divisions, bit-identical cross-engine (built-in covar_pop runs
    * order-dependent double accumulation — never oracle-able).
    */
  val qPairStats: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Profiler.pairStats(
        t(s, dir, "events")
          .withColumn("cents", round(col("value") * 100).cast("long"))
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long")),
        "event_type", "cents", "k"),
    oracle = Some(
      """WITH c AS (
        |  SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS x,
        |    CAST(json_extract(props, 'k') AS BIGINT) AS y
        |  FROM events
        |)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
        |  CAST(sum(x * y) AS BIGINT) AS sum_xy,
        |  CAST(sum(x * x) AS BIGINT) AS sum_x2, CAST(sum(y * y) AS BIGINT) AS sum_y2,
        |  CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
        |    / CAST(count(*) * count(*) AS DOUBLE) AS cov_pop,
        |  CASE WHEN count(*) * sum(x * x) = sum(x) * sum(x) THEN NULL
        |       ELSE CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
        |              / CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
        |  END AS slope
        |FROM c GROUP BY event_type""".stripMargin))

  /** Deterministic synthetic URL per document (the corpus carries
    * opaque source ids, not URLs): provenance fields a web corpus
    * derives from the crawl URL.
    */
  private def docUrl: Column =
    concat(lit("https://www."), col("source"), lit("-mirror.org/"),
      col("lang"), lit("/doc/"), col("doc_id").cast("string"),
      lit("?p="), pmod(col("doc_id"), lit(7)).cast("string"))

  /** #50 URL parsing (host/path/query/registered domain) via the
    * codegen'd parse_url built-in; oracle re-derives the same parts
    * with regexes.
    */
  val qUrlParse: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.WebCuration.parseUrls(
        t(s, dir, "documents").select(col("doc_id"), docUrl.as("url"))),
    oracle = Some(
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://www.' || source || '-mirror.org/' || lang || '/doc/' || doc_id
        |      || '?p=' || (doc_id % 7) AS url
        |  FROM documents
        |)
        |SELECT doc_id, url,
        |  regexp_extract(url, 'https?://([^/?#]+)', 1) AS host,
        |  regexp_extract(url, 'https?://[^/?#]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS "query",
        |  regexp_extract(regexp_extract(url, 'https?://([^/?#]+)', 1),
        |                 '([^.]+\.[^.]+)$', 1) AS domain
        |FROM u""".stripMargin))

  /** #50b Per-domain quota (C4-style): at most 10 docs per registered
    * domain, best-first by n_chars (quality proxy), doc_id tiebreak.
    */
  val qDomainCap: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.WebCuration.domainCap(
        graft.operators.WebCuration.parseUrls(
          t(s, dir, "documents").select(col("doc_id"), col("n_chars"), docUrl.as("url"))),
        k = 10, orderCol = "n_chars")
        .select(col("doc_id"), col("domain"), col("n_chars"), col("domain_rank")),
    oracle = Some(
      """WITH p AS (
        |  SELECT doc_id, n_chars,
        |    regexp_extract('www.' || source || '-mirror.org', '([^.]+\.[^.]+)$', 1) AS domain
        |  FROM documents
        |)
        |SELECT doc_id, domain, n_chars, domain_rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY domain
        |    ORDER BY n_chars DESC, doc_id) AS domain_rank
        |  FROM p
        |) WHERE domain_rank <= 10""".stripMargin))

  /** #23b Paragraph-level exact dedup: 10-word chunks deduped
    * corpus-wide (first (doc, position) wins), docs reassembled from
    * surviving chunks.
    */
  val qDedupParagraph: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Dedup.paragraphs(t(s, dir, "documents"), chunkTokens = 10),
    oracle = Some(
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), n AS (
        |  SELECT doc_id, w, greatest(1, (len(w) + 9) // 10) AS n_chunks FROM t
        |), c AS (
        |  SELECT doc_id, n_chunks, unnest(range(n_chunks)) AS idx, w FROM n
        |), ch AS (
        |  SELECT doc_id, n_chunks, idx,
        |    array_to_string(w[idx * 10 + 1 : idx * 10 + 10], ' ') AS chunk
        |  FROM c
        |), keep AS (
        |  SELECT *, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
        |  FROM ch
        |)
        |SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks, count(*) AS n_kept,
        |       string_agg(chunk, ' ' ORDER BY idx) AS text_kept
        |FROM keep WHERE rn = 1
        |GROUP BY doc_id, n_chunks""".stripMargin))

  /** #23d Incremental exact dedup: two document batches fold into the
    * content-keyed survivor state (lowest doc_id wins, no rescans of
    * prior batches); the final state must equal `exact` over the full
    * corpus bit-for-bit — same oracle as dedup_exact.
    */
  val qDedupIncremental: QueryDef = QueryDef(
    run = (s, dir) => {
      val statePath = scratch("dedup-inc-state")
      val docs = t(s, dir, "documents")
      graft.operators.Dedup.incrementalExact(
        statePath, docs.filter(col("doc_id") % 2 === 0), "text", "doc_id")
      graft.operators.Dedup.incrementalExact(
        statePath, docs.filter(col("doc_id") % 2 === 1), "text", "doc_id")
      graft.operators.Dedup.incrementalExactRead(s, statePath)
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    },
    oracle = Some(
      """SELECT doc_id, text, lang, source, n_chars FROM (
        |  SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM documents
        |) WHERE rn = 1""".stripMargin))

  /** #23c Duplicated-substring excision (Lee et al. ExactSubstr
    * shape): every 8-token window occurring ≥2× corpus-wide is a
    * duplicated span; covered tokens are cut from every doc. The
    * oracle re-derives the duplicated-window set by grouping the
    * window STRINGS themselves (DuckDB-side exact; the Spark side
    * groups their 64-bit hashes — identical result absent a hash
    * collision, which the hash match itself certifies).
    */
  val qDedupSubstring: QueryDef = QueryDef(
    run = (s, dir) =>
      graft.operators.Dedup.duplicatedSpanExcision(t(s, dir, "documents"), w = 8),
    oracle = Some(
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS ts,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents
        |), win AS (
        |  SELECT doc_id, ts, unnest(range(greatest(n - 8 + 1, 0))) AS p FROM base
        |), ws AS (
        |  SELECT doc_id, p, array_to_string(ts[p + 1 : p + 8], ' ') AS wstr FROM win
        |), dup AS (
        |  SELECT wstr FROM ws GROUP BY wstr HAVING count(*) >= 2
        |), st AS (
        |  SELECT w.doc_id, w.p, unnest(range(8)) AS o
        |  FROM ws w JOIN dup d ON w.wstr = d.wstr
        |), cov AS (
        |  SELECT DISTINCT doc_id, p + o AS pos FROM st
        |), covagg AS (
        |  SELECT doc_id, count(*) AS n_removed, list(pos) AS cl FROM cov GROUP BY doc_id
        |)
        |SELECT b.doc_id,
        |  coalesce(array_to_string(
        |    list_filter(b.ts, (t, i) -> NOT list_contains(coalesce(c.cl, []), i - 1)),
        |    ' '), '') AS clean_text,
        |  CAST(b.n AS BIGINT) AS n_tokens,
        |  CAST(coalesce(c.n_removed, 0) AS BIGINT) AS n_removed
        |FROM base b LEFT JOIN covagg c USING (doc_id)""".stripMargin))

  /** #10g Schema-drift union: two snapshots whose schemas diverged
    * (one gained a column) merged with unionByName + missing-column
    * null-fill — the "old files lack the new field" ETL reality.
    * Oracle is DuckDB's UNION ALL BY NAME, the same semantic.
    */
  val qSchemaUnion: QueryDef = QueryDef(
    run = (s, dir) => {
      val ord = t(s, dir, "orders")
      val old = ord.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val grown = ord.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
      old.unionByName(grown, allowMissingColumns = true)
    },
    oracle = Some(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL BY NAME
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin))

  /** #22j Streaming incremental-aggregate maintenance: micro-batches
    * folded into the versioned rollup by foreachBatch →
    * IncrementalAgg.refreshTable (4 hash-split files, one batch
    * each). count + decimal sum are associative AND commutative, so
    * the final state is batch-boundary- and order-independent ==
    * the batch groupBy bit-for-bit.
    */
  val qStreamIncAgg: QueryDef = QueryDef(
    run = (s, dir) => {
      val statePath = scratch("stream-inc-agg-state")
      // the source checkpoint is a SIBLING of the state dir (see
      // streamIncAgg) — scratch it too, or a previous run's batch
      // bookkeeping survives the state wipe and the restarted query
      // either references a dead staged-source path or skips every
      // batch as already-applied against empty state
      scratch("stream-inc-agg-state_ckpt")
      val keys = Seq("user_id", "event_type")
      val split = graft.streaming.EventStream.splitDir(s, s"$dir/events.parquet", 4)
      graft.streaming.EventStream.streamIncAgg(s, split, statePath, keys, "value",
        queryName = "graft_stream_inc_agg_" +
          java.util.UUID.randomUUID().toString.replace("-", ""))
      // crash-redelivery simulation: re-fold an already-applied batch
      // id (the stream applied ids 0..3); the high-water mark inside
      // the state commit makes it a no-op or the oracle hash fails
      graft.operators.IncrementalAgg.refreshTable(
        s, statePath, t(s, dir, "events"), keys, "value", batchId = Some(0L))
      graft.operators.IncrementalAgg.read(s, statePath, keys)
        .select(col("user_id"), col("event_type"), col("n"),
          col("sum_dec").cast("double").as("sum_value"))
    },
    oracle = Some(
      """SELECT user_id, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id, event_type""".stripMargin))

  /** #22q Streaming distinct-count sketch maintenance: micro-batches
    * fold per-type KMV sketches into the versioned O(k) state
    * (foreachBatch → IncrementalAgg.refreshKmv; 4 hash-split files,
    * one batch each, plus an inline redelivery that must no-op). The
    * sketch is a pure function of the input SET and the fold is
    * associative/commutative, so the streamed state answers EXACTLY
    * what the one-shot whole-corpus sketch answers — re-derived from
    * first principles by the oracle.
    */
  val qStreamKmv: QueryDef = QueryDef(
    run = (s, dir) => {
      val statePath = scratch("stream-kmv-state")
      scratch("stream-kmv-state_ckpt")
      val split = graft.streaming.EventStream.splitDir(s, s"$dir/events.parquet", 4)
      graft.streaming.EventStream.streamKmv(s, split, statePath, Seq("event_type"), "user_id",
        queryName = "graft_stream_kmv_" +
          java.util.UUID.randomUUID().toString.replace("-", ""))
      // crash-redelivery simulation: an already-applied batch id
      graft.operators.IncrementalAgg.refreshKmv(
        s, statePath, t(s, dir, "events"), Seq("event_type"), "user_id", batchId = Some(0L))
      graft.operators.IncrementalAgg.readKmvEstimate(s, statePath, Seq("event_type"))
    },
    oracle = Some(OracleSql.kmvDistinctSql(64, withCounts = false, estimateAs = "approx_distinct")))

  /** #22r Streaming frequent-items maintenance: micro-batches fold
    * Misra-Gries summaries into the persisted O(capacity) state
    * (foreachBatch → IncrementalAgg.refreshFreq; 4 hash-split files,
    * one batch each, plus an inline redelivery that must no-op),
    * then the candidates are VERIFIED with one exact filtered count
    * — exact heavy hitters from a streamed sketch, because the MG
    * superset guarantee (capacity 256 > 1/minShare = 200) holds
    * across merged summaries. The oracle re-derives the exact answer
    * with no sketch at all: if the stream state lost a heavy user or
    * the redelivery double-counted, the hash breaks.
    */
  val qStreamHeavy: QueryDef = QueryDef(
    run = (s, dir) => {
      val statePath = scratch("stream-freq-state")
      scratch("stream-freq-state_ckpt")
      val split = graft.streaming.EventStream.splitDir(s, s"$dir/events.parquet", 4)
      graft.streaming.EventStream.streamFreq(s, split, statePath, "user_id", capacity = 256,
        queryName = "graft_stream_freq_" +
          java.util.UUID.randomUUID().toString.replace("-", ""))
      // crash-redelivery simulation: an already-applied batch id
      graft.operators.IncrementalAgg.refreshFreq(
        s, statePath, t(s, dir, "events"), "user_id", capacity = 256, batchId = Some(0L))
      val cands = graft.operators.IncrementalAgg.readFreqCandidates(s, statePath)
        .select(col("value").as("user_key"))
      graft.operators.HeavyHitters.verified(
        t(s, dir, "events").select(col("user_id").cast("string").as("user_key")),
        "user_key", cands, minShare = 0.005)
    },
    oracle = Some(
      """WITH t AS (
        |  SELECT CAST(user_id AS VARCHAR) AS user_key FROM events
        |), tot AS (
        |  SELECT count(*) AS n_total FROM t
        |)
        |SELECT user_key, count(*) AS n, n_total
        |FROM t CROSS JOIN tot
        |GROUP BY user_key, n_total
        |HAVING count(*) >= n_total * 0.005""".stripMargin))

  /** #90 A/B experiment readout: engine-reproducible 50/50 variant
    * assignment (Knuth multiplicative hash on user_id — any engine
    * recomputes identical groups, the auditability property), UNIT-
    * level conversion (a user converts once however many purchase
    * events they fire — event-level rows would fake narrow
    * confidence), and the exact two-proportion z² in one
    * DECIMAL(38,0) integral division (see
    * [[graft.operators.Experiment.twoProportionZ2]]).
    */
  val qAbTest: QueryDef = QueryDef(
    run = (s, dir) => {
      val units = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
        .withColumn("variant", graft.operators.Experiment.assignVariant(col("user_id")))
      graft.operators.Experiment.twoProportionZ2(units, col("variant"), col("converted"))
    },
    oracle = Some(
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c,
        |    CASE WHEN ((user_id % 2147483648) * 2654435761) % 2147483648 < 1073741824
        |         THEN 'A' ELSE 'B' END AS v
        |  FROM events GROUP BY user_id
        |), a AS (
        |  SELECT count(*) AS n_a, sum(c) AS x_a FROM u WHERE v = 'A'
        |), b AS (
        |  SELECT count(*) AS n_b, sum(c) AS x_b FROM u WHERE v = 'B'
        |)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS x_a,
        |  CAST(CAST(x_a AS HUGEINT) * 10000 // n_a AS BIGINT) AS rate_a_bp,
        |  CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS x_b,
        |  CAST(CAST(x_b AS HUGEINT) * 10000 // n_b AS BIGINT) AS rate_b_bp,
        |  CAST(CAST(x_b AS HUGEINT) * 10000 // n_b
        |     - CAST(x_a AS HUGEINT) * 10000 // n_a AS BIGINT) AS lift_bp,
        |  CAST(CAST(n_a + n_b AS HUGEINT)
        |       * (CAST(x_a AS HUGEINT) * n_b - CAST(x_b AS HUGEINT) * n_a)
        |       * (CAST(x_a AS HUGEINT) * n_b - CAST(x_b AS HUGEINT) * n_a) * 10000
        |     // (CAST(n_a AS HUGEINT) * n_b * (x_a + x_b)
        |         * ((n_a + n_b) - (x_a + x_b))) AS BIGINT) AS z2_x10000
        |FROM a CROSS JOIN b""".stripMargin))

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
  private def bpeOracleSql(iters: Int, finalSelect: String): String = {
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

  private def perplexityOracleSql: String =
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
  private def kCoreOracleSql(k: Int, minEdgeCount: Long, rounds: Int): String = {
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
    * oracle runs. Width is sized to the key cardinality (w = 2¹⁷ ⇒
    * collision overcount ≈ |A|·|B|/w stays well under the bound at
    * sf0.1's 150k keys — the first sf0.1 bench run proved w = 2048
    * all-noise here: est 44M vs true 0.6M, a correct loud refusal of
    * a fine join; precision is WIDTH, the guard direction never lies).
    */
  val qSafeJoin: QueryDef = QueryDef(
    run = (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey").as("k"), col("o_orderpriority"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey").as("k"), col("l_extendedprice"))
      graft.operators.SafeJoin.guardedEquiJoin(o, l, "k", maxRows = 10000000L,
        d = 4, w = 131072)
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

  // ---------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------

  val all: Map[String, QueryDef] = Map(
    "q_full_load" -> qFullLoad,
    "q_inc_load" -> qIncLoad,
    "q_inc_agg" -> qIncAgg,
    "q_inc_agg_cdc" -> qIncAggCdc,
    "q_inc_join" -> qIncJoin,
    "q_report_urgent" -> qReportUrgent,
    "q_csv_roundtrip" -> qCsvRoundtrip,
    "q_jsonl_roundtrip" -> qJsonlRoundtrip,
    "q_upsert_merge" -> qUpsertMerge,
    "q_partition_prune" -> qPartitionPrune,
    "q_time_travel" -> qTimeTravel,
    "q_purge" -> qPurge,
    "q_clone" -> qClone,
    "q_bucketed_join" -> qBucketedJoin,
    "q_json_extract" -> qJsonExtract,
    "q_variant_extract" -> qVariantExtract,
    "q1_agg" -> q1Agg,
    "q3_top_orders" -> q3TopOrders,
    "q5_star_join" -> q5StarJoin,
    "q14_promo_share" -> q14PromoShare,
    "q_rollup" -> qRollup,
    "q_grouping_sets" -> qGroupingSets,
    "q_window_range" -> qWindowRange,
    "q_upsert_delete" -> qUpsertDelete,
    "q_catalog_read" -> qCatalogRead,
    "q_compact" -> qCompact,
    "q_restore" -> qRestore,
    "q_clustered_read" -> qClusteredRead,
    "q_cube" -> qCube,
    "q_pivot" -> qPivot,
    "q_unpivot" -> qUnpivot,
    "q_percentiles" -> qPercentiles,
    "q_asof_join" -> qAsofJoin,
    "q_asof_tolerance" -> qAsofTolerance,
    "q_asof_nearest" -> qAsofNearest,
    "q_window_lag" -> qWindowLag,
    "q_window_dist" -> qWindowDist,
    "q_snapshot_diff" -> qSnapshotDiff,
    "q_scd2" -> qScd2,
    "q_approx_distinct" -> qApproxDistinct,
    "q_kmv_inc" -> qKmvInc,
    "q_kmv_overlap" -> qKmvOverlap,
    "q_approx_quantiles" -> qApproxQuantiles,
    "q_hash_sample" -> qHashSample,
    "q_stream_hopping" -> qStreamHopping,
    "q_profile" -> qProfile,
    "q_quality_checks" -> qQualityChecks,
    "q_split" -> qSplit,
    "q_kfold" -> qKfold,
    "q_pseudonymize" -> qPseudonymize,
    "q_kanon" -> qKanon,
    "q_window_running" -> qWindowRunning,
    "q_topk_per_group" -> qTopkPerGroup,
    "q_topk_heap" -> qTopkHeap,
    "q_inc_topk" -> qIncTopk,
    "curate_docs" -> qCurateDocs,
    "curate_neardup" -> qCurateNeardup,
    "q_anti_join" -> qAntiJoin,
    "q_skew_join" -> qSkewJoin,
    "q_set_ops" -> qSetOps,
    "q_range_join" -> qRangeJoin,
    "q_range_join_auto" -> qRangeJoinAuto,
    "q_stream_window" -> qStreamWindow,
    "q_stream_dedup" -> qStreamDedup,
    "q_stream_late_dlq" -> qStreamLateDlq,
    "q_stream_upsert" -> qStreamUpsert,
    "q_stream_milestones" -> qStreamMilestones,
    "q_stream_milestones_v2" -> qStreamMilestonesV2,
    "q_stream_attribution" -> qStreamAttribution,
    "q_stream_left_attr" -> qStreamLeftAttr,
    "q_stream_enrich" -> qStreamEnrich,
    "q_corr_subquery" -> qCorrSubquery,
    "q_sessionize" -> qSessionize,
    "q_stream_sessions" -> qStreamSessions,
    "text_tokens" -> qTextTokens,
    "text_quality" -> qTextQuality,
    "text_langid" -> qTextLangid,
    "text_fingerprint" -> qTextFingerprint,
    "text_chunk" -> qTextChunk,
    "text_redact" -> qTextRedact,
    "dedup_clusters" -> qDedupClusters,
    "curate_cluster_best" -> qCurateClusterBest,
    "q_triangles" -> qTriangles,
    "q_link_predict" -> qLinkPredict,
    "dedup_exact" -> qDedupExact,
    "dedup_ngram_jaccard" -> qDedupNgramJaccard,
    "dedup_editdist" -> qDedupEditdist,
    "dedup_containment" -> qDedupContainment,
    "q_histogram" -> qHistogram,
    "text_normalize" -> qTextNormalize,
    "dedup_minhash_lsh" -> qDedupMinhashLsh,
    "dedup_minhash_inc" -> qDedupMinhashInc,
    "dedup_simhash" -> qDedupSimhash,
    "dedup_phash" -> qDedupPhash,
    "q_mm_chunk_dedup" -> qMmChunkDedup,
    "dedup_embedding" -> qDedupEmbedding,
    "dedup_embedding_lsh" -> qDedupEmbeddingLsh,
    "dedup_semantic" -> qDedupSemantic,
    "text_vocab" -> qTextVocab,
    "text_pagerank" -> qTextPagerank,
    "text_postings" -> qTextPostings,
    "text_skipgrams" -> qTextSkipgrams,
    "q_heavy_terms" -> qHeavyTerms,
    "q_cms_counts" -> qCmsCounts,
    "text_encode" -> qTextEncode,
    "text_tfidf" -> qTextTfidf,
    "text_bm25" -> qTextBm25,
    "q_hybrid_search" -> qHybridSearch,
    "q_eval_ndcg" -> qEvalNdcg,
    "q_lang_balance" -> qLangBalance,
    "q_shuffle_shard" -> qShuffleShard,
    "q_neg_sample" -> qNegSample,
    "q_outlier_fence" -> qOutlierFence,
    "q_mad_outliers" -> qMadOutliers,
    "q_blocklist" -> qBlocklist,
    "decontam_ngram" -> qDecontam,
    "decontam_inc" -> qDecontamInc,
    "decontam_fuzzy" -> qDecontamFuzzy,
    "q_importance" -> qImportance,
    "q_importance_resample" -> qImportanceResample,
    "text_pack" -> qTextPack,
    "text_pack_ffd" -> qTextPackFfd,
    "text_repetition" -> qTextRepetition,
    "emb_centroids" -> qEmbCentroids,
    "emb_quantize" -> qEmbQuantize,
    "emb_normalize" -> qEmbNormalize,
    "sim_hard_negatives" -> qSimHardNegatives,
    "sim_bruteforce_topk" -> qSimBruteforceTopk,
    "sim_lsh_topk" -> qSimLshTopk,
    "sim_ivf_topk" -> qSimIvfTopk,
    "sim_ivf_index_topk" -> qSimIvfIndexTopk,
    "mm_features" -> qMmFeatures,
    "q_mm_metadata" -> qMmMetadata,
    "q_mm_decode" -> qMmDecode,
    "q_table_digest" -> qTableDigest,
    "q_winsorize" -> qWinsorize,
    "q_pair_stats" -> qPairStats,
    "q_url_parse" -> qUrlParse,
    "q_domain_cap" -> qDomainCap,
    "dedup_paragraph" -> qDedupParagraph,
    "dedup_substring" -> qDedupSubstring,
    "dedup_incremental" -> qDedupIncremental,
    "q_schema_union" -> qSchemaUnion,
    "q_stream_inc_agg" -> qStreamIncAgg,
    "q_stream_kmv" -> qStreamKmv,
    "q_stream_heavy" -> qStreamHeavy,
    "q_ab_test" -> qAbTest,
    "q_kcore" -> qKcore,
    "q_secondary_index" -> qSecondaryIndex,
    "q_rouge" -> qRouge,
    "q_holt" -> qHolt,
    "q_cusum" -> qCusum,
    "q_holt_winters" -> qHoltWinters,
    "q_encoding_gate" -> qEncodingGate,
    "q_phrase_search" -> qPhraseSearch,
    "q_stream_sessions_timer" -> qStreamSessionsTimer,
    "q_orc_roundtrip" -> qOrcRoundtrip,
    "q_ann_recall" -> qAnnRecall,
    "q_cms_join_size" -> qCmsJoinSize,
    "q_safe_join" -> qSafeJoin,
    "q_count_meta" -> qCountMeta,
    "q_history" -> qHistory,
    "q_funnel" -> qFunnel,
    "q_attribution" -> qAttribution,
    "q_cohort" -> qCohort,
    "q_streaks" -> qStreaks,
    "q_interval_merge" -> qIntervalMerge,
    "q_twap" -> qTwap,
    "q_throttle" -> qThrottle,
    "q_interval_join" -> qIntervalJoin,
    "q_resample" -> qResample,
    "q_ewma" -> qEwma,
    "q_bloom_join" -> qBloomJoin,
    "q_trigram_search" -> qTrigramSearch,
    "q_gopher_rules" -> qGopherRules,
    "q_window_rows" -> qWindowRows,
    "q_mom_change" -> qMomChange,
    "q_transitions" -> qTransitions,
    "q_session_paths" -> qSessionPaths,
    "q_zscore_outliers" -> qZscoreOutliers,
    "q_mor_read" -> qMorRead,
    "q_mor_ro" -> qMorRo,
    "q_cdc_feed" -> qCdcFeed,
    "q_point_lookup" -> qPointLookup,
    "q_zonemap_scan" -> qZonemapScan,
    "q_zonemap_semi" -> qZonemapSemi,
    "q_bloom_index" -> qBloomIndex,
    "q_bloom_index_semi" -> qBloomIndexSemi,
    "text_bpe_pairs" -> qBpePairs,
    "text_bpe_merges" -> qBpeMerges,
    "q_quality_score" -> qQualityScore,
    "q_nb_classify" -> qNbClassify,
    "q_eval_auc" -> qEvalAuc,
    "q_eval_report" -> qEvalLangid,
    "q_eval_calibration" -> qEvalCalibration,
    "q_eval_kappa" -> qEvalKappa,
    "q_eval_auc_by" -> qEvalAucBy,
    "q_eval_pr_auc" -> qEvalPrAuc,
    "q_eval_pr_auc_by" -> qEvalPrAucBy,
    "q_linkage" -> qLinkage,
    "q_linkage_phonetic" -> qLinkagePhonetic,
    "q_branch_merge" -> qBranchMerge,
    "q_branch_conflicts" -> qBranchConflicts,
    "q_wap_publish" -> qWapPublish,
    "q_chi2_features" -> qChi2Features,
    "q_pmi_collocations" -> qPmiCollocations,
    "q_eval_report_inc" -> qEvalReportInc,
    "q_eval_threshold" -> qEvalThreshold,
    "q_eval_calibration_by" -> qEvalCalibrationBy,
    "sim_pq_topk" -> qSimPqTopk,
    "sim_ivfpq_topk" -> qSimIvfPqTopk,
    "sim_ivfpq_rerank" -> qSimIvfPqRerank,
    "q4_priority" -> q4Priority,
    "q10_returns" -> q10Returns,
    "q18_large_orders" -> q18LargeOrders,
    "q_temporal_join" -> qTemporalJoin,
    "q7_volume" -> q7Volume,
    "q_stream_mor" -> qStreamMor,
    "dedup_prefix" -> qDedupPrefix,
    "q_quantile_bins" -> qQuantileBins,
    "q_impute" -> qImpute,
    "q_emb_profile" -> qEmbProfile,
    "q_emb_project" -> qEmbProject,
    "q6_forecast" -> q6Forecast,
    "q2_min_cost" -> q2MinCost,
    "q8_share" -> q8Share,
    "q9_profit" -> q9Profit,
    "q11_important" -> q11Important,
    "q12_late" -> q12Late,
    "q20_dominant" -> q20Dominant,
    "q13_custdist" -> q13Custdist,
    "q15_top_supplier" -> q15TopSupplier,
    "q16_variety" -> q16Variety,
    "q17_small_qty" -> q17SmallQty,
    "q19_bands" -> q19Bands,
    "q21_waiting" -> q21Waiting,
    "q22_idle" -> q22Idle,
    "q_insert_overwrite" -> qInsertOverwrite,
    "q_partial_update" -> qPartialUpdate,
    "q_stream_cdc" -> qStreamCdc,
    "q_drift" -> qDrift,
    "sim_knn_classify" -> qSimKnnClassify,
    "sim_pq_rerank" -> qSimPqRerank,
    "text_surprisal" -> qTextSurprisal,
    "text_perplexity" -> qTextPerplexity,
    "text_perplexity_inc" -> qTextPerplexityInc,
    "curate_gold" -> qCurateGold,
    "sim_ivf_inc_topk" -> qSimIvfIncTopk,
    "q_stream_neardup" -> qStreamNearDup,
    "q_mixture" -> qMixture,
    "text_bpe_encode" -> qBpeEncode)
}
