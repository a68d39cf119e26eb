package graft

import graft.sources.{IncrementalReader, TableLoader}
import org.apache.spark.sql.DataFrame

/** Plan-shape regression tests: the scale properties SURVEY §5 claims
  * (pushdown, broadcast dimensions, partial aggregation) asserted
  * against the actual physical plans, so a refactor that silently
  * de-optimizes a plan fails CI — not just the 100 TB run.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.treeString

  test("incremental watermark is a pushed parquet predicate (raw nanos column)") {
    val df = Queries.qIncLoad.run(spark, sfDir)
    assert(plan(df).contains("GreaterThan(ts"), "watermark must reach the scan")
    // and raw-column filtering is semantically the normalized filter
    val viaNormalized = new IncrementalReader(spark, null)
      .readSince(TableLoader.table(spark, sfDir, "events"), "ts", Queries.incWatermark)
    assert(df.count() == viaNormalized.count())
  }

  test("partitioned upsert read prunes to the filtered hive partition") {
    val df = Queries.qPartitionPrune.run(spark, sfDir)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.treeString).mkString("\n")
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"), scan)
    // pruned scan reads only the click partition's files
    assert(df.count() > 0)
  }

  test("declared-schema scans keep parquet pushdown (Delta and Iceberg readers)") {
    // the schema-evolution reader change requests an explicit schema;
    // the lock: predicates still reach the parquet scan as
    // PushedFilters — a scan that lost pushdown would read every row
    // of every file at 100 TB
    val s = spark
    import s.implicits._
    val dt = tmpDir("plan-declscan-d") + "/t"
    graft.sources.DeltaTableWriter.create(
      (1 to 500).map(i => (i.toLong, s"g${i % 4}", i * 2L)).toDF("id", "grp", "v"), dt): Unit
    val dScan = graft.sources.DeltaTableReader.snapshot(spark, dt)
      .where($"id" === 7L)
    val dLeaves = dScan.queryExecution.executedPlan.collectLeaves()
      .map(_.treeString).mkString("\n")
    assert(dLeaves.contains("PushedFilters: [IsNotNull(id), EqualTo(id,7)]"), dLeaves)

    val it = tmpDir("plan-declscan-i") + "/t"
    graft.sources.IcebergTableWriter.create(
      (1 to 500).map(i => (i.toLong, s"g${i % 4}", i * 2L)).toDF("id", "grp", "v"), it): Unit
    val iScan = graft.sources.IcebergTableReader.snapshot(spark, it)
      .where($"id" === 7L)
    val iLeaves = iScan.queryExecution.executedPlan.collectLeaves()
      .map(_.treeString).mkString("\n")
    assert(iLeaves.contains("PushedFilters: [IsNotNull(id), EqualTo(id,7)]"), iLeaves)

    // Hudi: the EVOLVED table's declared-schema scan (commit-metadata
    // authority) must keep pushdown too
    val ht = tmpDir("plan-declscan-h") + "/t"
    graft.sources.HudiTableWriter.create(
      (1 to 300).map(i => (i.toLong, s"g${i % 4}", i * 2L)).toDF("id", "grp", "v"), ht,
      recordKeys = Seq("id")): Unit
    graft.sources.HudiTableWriter.append(
      (301 to 400).map(i => (i.toLong, s"g${i % 4}", i * 2L, "late"))
        .toDF("id", "grp", "v", "tag"), ht): Unit
    val hScan = graft.sources.HudiTableReader.snapshot(spark, ht)
      .where($"id" === 7L)
    val hLeaves = hScan.queryExecution.executedPlan.collectLeaves()
      .map(_.treeString).mkString("\n")
    assert(hLeaves.contains("PushedFilters: [IsNotNull(id), EqualTo(id,7)]"), hLeaves)
  }

  test("mapped Delta reads keep pushdown on flat columns — only nested-mapped columns pay the rename cast") {
    import org.apache.spark.sql.types._
    val s = spark
    import s.implicits._
    val table = tmpDir("plan-mapped") + "/t"
    new java.io.File(s"$table/_delta_log").mkdirs()
    val stage = tmpDir("plan-mapped-stage") + "/out"
    (1 to 300).map(i => (i.toLong, i * 2L)).toDF("id", "v")
      .select($"id".as("col-m1"),
        org.apache.spark.sql.functions.struct($"v".as("col-x")).as("col-s"))
      .coalesce(1).write.parquet(stage)
    val part = new java.io.File(stage).listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, new java.io.File(table, "part-a.parquet").toPath): Unit
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true, new MetadataBuilder()
        .putLong("delta.columnMapping.id", 1L)
        .putString("delta.columnMapping.physicalName", "col-m1").build()),
      StructField("s", StructType(Seq(
        StructField("a", LongType, nullable = true, new MetadataBuilder()
          .putLong("delta.columnMapping.id", 3L)
          .putString("delta.columnMapping.physicalName", "col-x").build()))),
        nullable = true, new MetadataBuilder()
          .putLong("delta.columnMapping.id", 2L)
          .putString("delta.columnMapping.physicalName", "col-s").build()))).json
    val sq = new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(schema)
    val size = new java.io.File(table, "part-a.parquet").length()
    java.nio.file.Files.write(
      new java.io.File(s"$table/_delta_log", f"${0L}%020d.json").toPath,
      (Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"pm","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":$sq,"partitionColumns":[],""" +
          s""""configuration":{"delta.columnMapping.mode":"name",""" +
          s""""delta.columnMapping.maxColumnId":"3"},"createdTime":0}}""",
        s"""{"add":{"path":"part-a.parquet","partitionValues":{},"size":$size,""" +
          s""""modificationTime":0,"dataChange":true}}""").mkString("\n") + "\n")
        .getBytes("UTF-8")): Unit
    // a flat-column predicate must reach the parquet scan under the
    // PHYSICAL name — the nested rename cast applies ONLY to col-s
    val scan = graft.sources.DeltaTableReader.snapshot(spark, table)
      .where($"id" === 7L)
    val leaves = scan.queryExecution.executedPlan.collectLeaves()
      .map(_.treeString).mkString("\n")
    assert(leaves.contains("PushedFilters: [IsNotNull(`col-m1`), EqualTo(`col-m1`,7)]"),
      leaves)
    assert(scan.count() == 1L && scan.head().getAs[org.apache.spark.sql.Row]("s")
      .getAs[Long]("a") == 14L)
  }

  test("star join (q5): every dimension joins broadcast, never sort-merge") {
    val p = plan(Queries.q5StarJoin.run(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("flagship report join is a broadcast hash join") {
    val p = plan(Queries.qReportUrgent.run(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q1 aggregate is partial+final hash aggregation (map-side combine)") {
    val p = plan(Queries.q1Agg.run(spark, sfDir))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("partial_"))
  }

  test("upsert merge: single shuffle, partial+final aggregate, no window") {
    val p = plan(graft.sources.UpsertWriter.merge(
      TableLoader.table(spark, sfDir, "events"), Seq("event_id"), "ts"))
    // argmax of a whole row has a struct buffer, so Spark plans a
    // SortAggregate (per-partition sorts) — the properties that matter
    // at scale are: exactly ONE exchange, map-side partial combine,
    // and no Window operator (which would also sort but can't combine
    // map-side, shuffling every duplicate).
    assert(p.contains("partial_max_by"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
    assert(!p.contains("Window"))
  }

  test("three-way merge: ONE hash exchange (union+tag+agg), no join, no window") {
    val base = TableLoader.table(spark, sfDir, "orders")
      .select(org.apache.spark.sql.functions.col("o_orderkey").as("k"),
        org.apache.spark.sql.functions.col("o_totalprice").as("v"),
        org.apache.spark.sql.functions.lit(1L).as("ver"))
    val ours = base.withColumn("ver", org.apache.spark.sql.functions.lit(2L))
    val theirs = base.withColumn("ver", org.apache.spark.sql.functions.lit(3L))
    val p = plan(graft.sources.Branching.threeWayMerge(
      base, ours, theirs, Seq("k"), "ver", "latest"))
    // the dry-run shares this exact keyed plan — a second exchange or
    // a join here is the regression that made predicting a merge cost
    // more than running it
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"three-way merge must be a single hash exchange:\n$p")
    assert(!p.contains("Join"), s"no join operator expected:\n$p")
    assert(!p.contains("Window"))
  }

  test("brute-force top-k broadcasts the query side; corpus is never shuffled") {
    val emb = TableLoader.table(spark, sfDir, "embeddings")
    val p = plan(graft.operators.Similarity.bruteForceTopK(
      emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10), k = 5))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    // the only exchange is for the final top-k merge of partial heaps
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1)
  }

  test("as-of join: one hash exchange + sort, never an inequality join") {
    val ev = TableLoader.table(spark, sfDir, "events")
    val c = org.apache.spark.sql.functions.col _
    val p = plan(graft.operators.AsOfJoin.asof(
      ev.filter(c("event_type") === "purchase"),
      ev.filter(c("event_type") === "click"),
      Seq("user_id"), "ts", "ts", Seq("event_id")))
    // the union trick: no join operator at all — one keyed window pass
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
  }

  test("IVF assignment is a projection: no iterative jobs, one broadcast join") {
    val emb = TableLoader.table(spark, sfDir, "embeddings")
    val p = plan(graft.operators.Similarity.ivfTopK(
      emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5), k = 5))
    assert(p.contains("BroadcastHashJoin"))
    // corpus side: scan -> project(cell) -> join, never an exchange
    // before the join; the only hash exchange merges top-k heaps
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1)
  }

  test("ivfPqTopK: probe list broadcast-hash-joins on cell — never a nested-loop scan") {
    val emb = TableLoader.table(spark, sfDir, "embeddings")
    val p = plan(graft.operators.Similarity.ivfPqTopK(
      emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5), k = 5))
    // the composition's point vs flat PQ: candidates come from an
    // equi-join on the routed cell, not a full-corpus conditional scan
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("semanticDedup: pair space is an equi-join on the k-means cell — no nested loop") {
    val emb = TableLoader.table(spark, sfDir, "embeddings")
    val p = plan(graft.operators.Similarity.semanticDedup(emb, 0.45, nclusters = 8))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("cell"), p)
  }

  test("embeddingNearDupPairsLsh: equi-join on (table, bucket) — no nested loop, no cartesian") {
    val emb = TableLoader.table(spark, sfDir, "embeddings")
    val p = plan(graft.operators.Similarity.embeddingNearDupPairsLsh(
      emb, 0.45, numTables = 8, planesPerTable = 2))
    // the whole point of the LSH path: the pair space is an equi-join
    // on the (table, bucket) key, never an all-pairs nested loop
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("bucket"), p)
  }

  test("correlated scalar subquery de-correlates: aggregate + join, no cartesian") {
    TableLoader.register(spark, sfDir, "orders")
    val p = plan(spark.sql(graft.Queries.corrSubquerySql))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Aggregate") || p.contains("HashAggregate"))
  }

  test("rollup: one shuffle (grouping sets expand map-side, partial agg)") {
    val p = plan(graft.Queries.qRollup.run(spark, sfDir))
    assert(p.contains("Expand"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_"))
  }

  test("profiler: one pass — a single shuffle for all columns' stats") {
    val p = plan(graft.operators.Profiler.profile(
      TableLoader.table(spark, sfDir, "orders"), Seq("o_orderkey", "o_orderstatus")))
    assert("Exchange".r.findAllIn(p).size <= 2, p) // expand lanes + final single-group merge
    assert(p.contains("partial_"))
  }

  test("decontamination joins on 8-byte hashed shingles, never strings") {
    val df = Queries.qDecontam.run(spark, sfDir)
    val p = plan(df)
    // the join key is the exploded hash column (long), and both sides
    // aggregate AFTER the join — no string shingle ever shuffles
    assert(p.contains("_sh"))
    assert(!p.toLowerCase.contains("cartesian"))
  }

  test("tf-idf and encode: vocab-sized side broadcasts, corpus never shuffles for the join") {
    assert(plan(Queries.qTextEncode.run(spark, sfDir)).contains("BroadcastHashJoin"))
    // tfIdf's df side is joined post-aggregation; AQE decides at runtime,
    // so assert on the executed adaptive plan after an action
    val tfidf = Queries.qTextTfidf.run(spark, sfDir)
    tfidf.count()
    assert(tfidf.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("heavy hitters: candidates broadcast back; exact count aggregates only matches") {
    val df = Queries.qHeavyTerms.run(spark, sfDir)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("freqsketchaggregate") || p.toLowerCase.contains("freqsketch"), p)
  }

  test("kmvOverlap: ONE scan of the input, structurally — a single conditional aggregate") {
    val ev = TableLoader.table(spark, sfDir, "events")
    val df = graft.operators.Sketches.kmvOverlap(ev, "event_type", "user_id",
      "purchase", "click", k = 64)
    val p = plan(df)
    val scans = "FileScan|BatchScan|Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"one-scan claim broken: $scans scans\n$p")
    // one global aggregate: partial -> single-partition exchange -> final
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
  }

  test("snapshot diff: one join, no window, no cartesian") {
    val ev = TableLoader.table(spark, sfDir, "events")
    val p = plan(graft.operators.SnapshotDiff.diff(ev, ev, Seq("event_id")))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
    assert("Join".r.findAllIn(p).size >= 1)
  }

  test("hash sample is a pure map-side filter: no exchange, no rand") {
    val p = plan(Queries.qHashSample.run(spark, sfDir))
    assert(!p.contains("Exchange"), p)
    assert(!p.toLowerCase.contains("rand"), p)
  }

  test("histogram/outlier fences: stats side broadcasts, never sort-merge") {
    Seq(Queries.qHistogram, Queries.qOutlierFence).foreach { q =>
      val p = plan(q.run(spark, sfDir))
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("SortMergeJoin"), p)
    }
  }

  test("winsorize: bounds broadcast back, clamp is map-side (no fact shuffle for the join)") {
    val p = plan(Queries.qWinsorize.run(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("pair stats: one shuffle with map-side partial aggregation") {
    val p = plan(Queries.qPairStats.run(spark, sfDir))
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_count") || p.contains("partial"), p)
    assert(!p.contains("Window") && !p.contains("Join"), p)
  }

  test("url parse is a pure projection: zero exchanges, no UDF") {
    val p = plan(Queries.qUrlParse.run(spark, sfDir))
    assert(!p.contains("Exchange"), p)
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"), p)
  }

  test("paragraph dedup: exactly two exchanges (chunk-hash winner, doc reassembly)") {
    val p = plan(Queries.qDedupParagraph.run(spark, sfDir))
    assert("Exchange".r.findAllIn(p).size == 2, p)
    assert(!p.contains("Join"), p)
  }

  test("q6: every predicate reaches the parquet scan; no join; partial agg") {
    val df = Queries.q6Forecast.run(spark, sfDir)
    val p = plan(df)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.treeString).mkString
    assert(scan.contains("l_shipdate") && scan.contains("l_quantity"), scan)
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_"), p)
  }

  test("TPC-H dims broadcast: q9/q16/q17/q19 never sort-merge against part/supplier") {
    Seq(Queries.q9Profit, Queries.q16Variety, Queries.q17SmallQty, Queries.q19Bands)
      .foreach { q =>
        val p = plan(q.run(spark, sfDir))
        assert(p.contains("BroadcastHashJoin"), p)
      }
    // q19's shared quantity bound (1..30 across the OR bands) must not
    // defeat pushdown of the part-side join entirely: the filter stays
    // post-join but the part dim still broadcasts (asserted above)
  }

  test("q21: the EXISTS/NOT EXISTS pair plans as semi + anti joins") {
    val p = plan(Queries.q21Waiting.run(spark, sfDir))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("q13: zero-order customers survive the left join") {
    val df = Queries.q13Custdist.run(spark, sfDir)
    val zero = df.filter(org.apache.spark.sql.functions.col("c_count") === 0).count()
    assert(zero >= 0) // presence of the c_count=0 bucket is data-dependent;
    // the structural lock is the OUTER join in the plan:
    assert(plan(df).contains("LeftOuter"), plan(df))
  }

  test("q11: dims broadcast; the global total joins as a one-row broadcast, never sort-merge") {
    val p = plan(Queries.q11Important.run(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q20: dominant-supplier gate plans as a semi join; nation broadcasts") {
    val p = plan(Queries.q20Dominant.run(spark, sfDir))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("substring excision: hash-keyed joins only — no nested-loop or cartesian pair space") {
    val p = plan(graft.operators.Dedup.duplicatedSpanExcision(
      TableLoader.table(spark, sfDir, "documents"), w = 8))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("importance weights: the bucket table broadcasts, the corpus never sort-merges") {
    val p = plan(Queries.qImportance.run(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("table digest: one partial+final hash aggregate, no window, no join") {
    val p = plan(Queries.qTableDigest.run(spark, sfDir))
    assert(p.contains("partial_"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("AUC and calibration collapse to the grouped score distribution before any window") {
    // the window must run over |distinct scores| rows, never |rows|:
    // a partial+final hash aggregate keyed on score sits below it
    Seq(Queries.qEvalAuc.run(spark, sfDir),
        Queries.qEvalCalibration.run(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assert(p.contains("partial_"), p)
      assert("HashAggregate".r.findAllIn(p).size >= 2, p)
      val aggIdx = p.indexOf("HashAggregate")
      val winIdx = p.indexOf("Window")
      assert(winIdx >= 0 && aggIdx >= 0 && winIdx < p.lastIndexOf("HashAggregate"),
        s"window must sit above the score-grouping aggregate\n$p")
    }
  }

  test("kappa: contingency combines map-side; the expected-agreement scalar broadcasts") {
    val p = plan(Queries.qEvalKappa.run(spark, sfDir))
    assert(p.contains("partial_"), p)
    // the 1-row expected-sum side joins as a broadcast, never a
    // shuffled cartesian
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("MOR realtime: only DIRTY groups feed the merge window; clean groups bypass it") {
    import graft.sources.{HudiTableReader, HudiTableWriter}
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val table = java.nio.file.Files.createTempDirectory("plan-mor").toString + "/t"
    def rows(r: Range) = r.map(i => (i.toLong, i * 2L)).toDF("id", "v")
    HudiTableWriter.createMor(rows(1 to 50).coalesce(1), table, recordKeys = Seq("id")): Unit
    HudiTableWriter.append(rows(51 to 100).coalesce(1), table): Unit // clean group
    HudiTableWriter.updateLog(rows(1 to 3).withColumn("v", lit(0L)), table): Unit
    val df = HudiTableReader.realtime(spark, table)
    assert(df.count() == 100L)
    // the pre-adaptive physical plan: AQE's wrapper hides its subtree
    // from collect, and the window/scan split is decided before AQE
    val exec = df.queryExecution.sparkPlan
    val windows = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size == 1, s"exactly one merge window expected\n${exec.treeString}")
    val windowScanFiles = windows.head.collectLeaves()
      .flatMap(_.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.toSeq
      }).flatten
    val cleanBases = new java.io.File(table).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName)
      .filterNot(windowScanFiles.map(p => p.substring(p.lastIndexOf('/') + 1)).contains)
    assert(cleanBases.nonEmpty, "the clean group's base file must NOT sit under the window")
    assert(windowScanFiles.nonEmpty &&
      windowScanFiles.forall(f => !cleanBases.exists(f.contains)),
      s"window subtree must scan dirty bases only, got $windowScanFiles")
  }

  test("Iceberg equality deletes: broadcast anti join on the key columns, never sort-merge") {
    val p = plan(Queries.qIcebergEqDelete.run(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("Delta change feed: DV-diff delete leg is a broadcast semi join, never sort-merge") {
    val p = plan(Queries.qDeltaCdc.run(spark, sfDir))
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("foreign upserts: the merged snapshot's delete legs broadcast, never sort-merge") {
    // Delta: the post-upsert snapshot subtracts DV positions via a
    // broadcast anti join (the upsert's own match ran at write time —
    // what we lock is that READS of the merge never degrade)
    val pd = plan(Queries.qDeltaUpsert.run(spark, sfDir))
    assert(pd.contains("BroadcastHashJoin") && pd.contains("LeftAnti"), pd)
    assert(!pd.contains("SortMergeJoin"), pd)
    // Iceberg: the equality-delete apply is a sequence-scoped
    // broadcast anti join — |batch keys|-bounded at any table size
    val pi = plan(Queries.qIcebergUpsert.run(spark, sfDir))
    assert(pi.contains("BroadcastHashJoin") && pi.contains("LeftAnti"), pi)
    assert(!pi.contains("SortMergeJoin"), pi)
    assert(!pi.contains("BroadcastNestedLoopJoin"), pi)
  }

  test("Iceberg change feed: pre-image leg is a broadcast semi join on (file, pos)") {
    val p = plan(Queries.qIcebergCdc.run(spark, sfDir))
    assert(p.contains("LeftSemi") || p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
