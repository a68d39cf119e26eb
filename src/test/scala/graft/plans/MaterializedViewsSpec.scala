package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MaterializedViewsSpec extends SparkSpec {

  private def scanPaths(df: DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves().map(_.treeString).mkString("\n")

  private def fixture(): (String, String) = {
    val base = tmpDir("mv-base")
    val mv = tmpDir("mv-view")
    val s = spark
    import s.implicits._
    (1 to 1000).map { i =>
      (if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c",
        if (i % 2 == 0) "x" else "y",
        i.toLong,
        if (i % 50 == 0) null else java.lang.Double.valueOf(i.toDouble % 13))
    }.toDF("g1", "g2", "v", "w")
      .repartition(4).write.mode("overwrite").parquet(base)
    (base, mv)
  }

  test("covered aggregate is rewritten to scan the MV, result identical, base scan gone") {
    val (base, mv) = fixture()
    try {
      MaterializedViews.define(spark, base, Seq("g1", "g2"), Seq("v", "w"), mv)
      def query() = spark.read.parquet(base)
        .where(col("g2") === "x")
        .groupBy("g1")
        .agg(
          sum(col("v")).as("sv"),
          count(lit(1)).as("n"),
          count(col("w")).as("nw"),
          min(col("v")).as("mn"),
          max(col("v")).as("mx"),
          avg(col("v")).as("av"))
      val rewritten = query()
      val plan = scanPaths(rewritten)
      assert(plan.contains(mv), s"rewritten plan must scan the MV:\n$plan")
      assert(!plan.contains(base), s"rewritten plan must NOT scan the base:\n$plan")
      val got = rewritten.orderBy("g1").collect()
      MaterializedViews.deregister(base)
      val want = query().orderBy("g1").collect()
      assert(got.toSeq == want.toSeq, s"rewrite changed the answer:\n$got\nvs\n$want")
    } finally MaterializedViews.deregister(base)
  }

  test("group-subset rollup and filterless query both rewrite; schema and exprIds survive a HAVING") {
    val (base, mv) = fixture()
    try {
      MaterializedViews.define(spark, base, Seq("g1", "g2"), Seq("v", "w"), mv)
      val q = spark.read.parquet(base)
        .groupBy("g2") // subset of MV keys — re-aggregation across g1
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .where(col("n") > 100) // HAVING over the rewritten output attrs
        .orderBy("g2")
      assert(scanPaths(q).contains(mv))
      val got = q.collect()
      MaterializedViews.deregister(base)
      val want = spark.read.parquet(base)
        .groupBy("g2").agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .where(col("n") > 100).orderBy("g2").collect()
      assert(got.toSeq == want.toSeq)
    } finally MaterializedViews.deregister(base)
  }

  test("uncovered queries bail to the base: non-group filter, distinct agg, unstored column") {
    val (base, mv) = fixture()
    try {
      MaterializedViews.define(spark, base, Seq("g1"), Seq("v"), mv)
      val nonGroupFilter = spark.read.parquet(base)
        .where(col("v") > 10).groupBy("g1").agg(sum(col("v")).as("sv"))
      assert(scanPaths(nonGroupFilter).contains(base))
      val distinctAgg = spark.read.parquet(base)
        .groupBy("g1").agg(countDistinct(col("v")).as("dv"))
      assert(scanPaths(distinctAgg).contains(base))
      val unstored = spark.read.parquet(base)
        .groupBy("g1").agg(sum(col("w")).as("sw"))
      assert(scanPaths(unstored).contains(base))
    } finally MaterializedViews.deregister(base)
  }

  test("count(col) counts non-nulls through the MV; empty-match filter yields empty not wrong") {
    val (base, mv) = fixture()
    try {
      MaterializedViews.define(spark, base, Seq("g1", "g2"), Seq("v", "w"), mv)
      def q() = spark.read.parquet(base)
        .groupBy("g1").agg(count(col("w")).as("nw"))
      val got = q().orderBy("g1").collect()
      assert(scanPaths(q()).contains(mv))
      MaterializedViews.deregister(base)
      assert(got.toSeq == q().orderBy("g1").collect().toSeq)

      MaterializedViews.define(spark, base, Seq("g1", "g2"), Seq("v", "w"), mv)
      val none = spark.read.parquet(base)
        .where(col("g2") === "zzz").groupBy("g1").agg(sum(col("v")).as("sv"))
      assert(scanPaths(none).contains(mv))
      assert(none.count() == 0L)
    } finally MaterializedViews.deregister(base)
  }

  test("incremental refresh == full rebuild, and the rewrite answers over base + append") {
    val (base, mv) = fixture()
    try {
      val d = MaterializedViews.define(spark, base, Seq("g1", "g2"), Seq("v", "w"), mv)
      val s = spark
      import s.implicits._
      val batch = (2000 to 2500).map { i =>
        ("a", if (i % 2 == 0) "x" else "z", i.toLong,
          if (i % 7 == 0) null else java.lang.Double.valueOf(i.toDouble % 5))
      }.toDF("g1", "g2", "v", "w")
      batch.write.mode("append").parquet(base)
      val inc = MaterializedViews.refreshIncremental(spark, d, batch)
      // fold == rebuild, row for row (new group 'z' included)
      val folded = spark.read.parquet(inc.dataDir)
      MaterializedViews.deregister(base)
      val rebuilt = MaterializedViews.define(spark, base, Seq("g1", "g2"), Seq("v", "w"), mv + "2")
      val direct = spark.read.parquet(rebuilt.dataDir)
      assert(folded.exceptAll(direct).isEmpty && direct.exceptAll(folded).isEmpty,
        "incremental fold must equal the full rebuild")
      MaterializedViews.deregister(base)
      // and a rewritten query over the folded view answers for base+append
      MaterializedViews.registry.put(inc.basePath, inc)
      def q() = spark.read.parquet(base).groupBy("g2")
        .agg(sum(col("v")).as("sv"), count(col("w")).as("nw"),
          min(col("v")).as("mn"), max(col("v")).as("mx"))
      assert(scanPaths(q()).contains(inc.dataDir))
      val got = q().orderBy("g2").collect()
      MaterializedViews.deregister(base)
      assert(got.toSeq == q().orderBy("g2").collect().toSeq)
    } finally MaterializedViews.deregister(base)
  }

  test("CDC fold == full rebuild: extremes-touching retractions recompute only their groups") {
    val base = tmpDir("mv-cdc-base")
    val mv = tmpDir("mv-cdc-view")
    val s = spark
    import s.implicits._
    val rows0 = (1 to 600).map { i =>
      (i.toLong, s"g${i % 4}", s"h${i % 2}", (i % 50).toLong, (i % 31).toLong)
    }
    rows0.toDF("id", "g1", "g2", "v", "w")
      .repartition(3).write.mode("overwrite").parquet(base)
    try {
      val d = MaterializedViews.define(spark, base, Seq("g1", "g2"), Seq("v", "w"), mv)
      val old = rows0.toDF("id", "g1", "g2", "v", "w")
      // transition: delete ids % 9 == 0 (hits several group extremes),
      // double v where id % 10 == 3 (update pre/post), insert new ids
      // incl. a brand-new group value
      val next = old.filter(col("id") % 9 =!= 0)
        .withColumn("v", when(col("id") % 10 === 3, col("v") * 2).otherwise(col("v")))
        .unionByName(Seq(
          (9001L, "g9", "h0", 7L, 3L),
          (9002L, "g1", "h1", 999L, 0L)).toDF("id", "g1", "g2", "v", "w"))
      val feed = graft.operators.SnapshotDiff.changeFeed(old, next, keys = Seq("id"))
      next.repartition(3).write.mode("overwrite").parquet(base)
      val folded = MaterializedViews.refreshFromChanges(spark, d, feed)
      val foldedRows = spark.read.parquet(folded.dataDir)
      MaterializedViews.deregister(base)
      val rebuilt = MaterializedViews.define(spark, base, Seq("g1", "g2"), Seq("v", "w"), mv + "2")
      val directRows = spark.read.parquet(rebuilt.dataDir)
      assert(foldedRows.exceptAll(directRows).isEmpty && directRows.exceptAll(foldedRows).isEmpty,
        "CDC fold must equal the full rebuild row-for-row")
    } finally {
      MaterializedViews.deregister(base)
    }
  }

  test("CDC fold with NULL grouping keys: deletes/updates on the null-keyed group fold exactly") {
    val base = tmpDir("mv-cdc-null-base")
    val mv = tmpDir("mv-cdc-null-view")
    val s = spark
    import s.implicits._
    // every 5th key NULL; the null group owns both the global max and
    // rows that get deleted/updated — the exact shape the null-unsafe
    // USING join silently dropped
    val rows0 = (1 to 400).map { i =>
      (i.toLong, if (i % 5 == 0) null else s"g${i % 3}", (i % 97).toLong)
    }
    rows0.toDF("id", "g1", "v").repartition(3).write.mode("overwrite").parquet(base)
    try {
      val d = MaterializedViews.define(spark, base, Seq("g1"), Seq("v"), mv)
      val old = rows0.toDF("id", "g1", "v")
      // delete ids % 10 == 0 (all null-keyed, several extreme-touching),
      // double v on ids % 10 == 5 (null-keyed updates), insert one new
      // null-keyed row and one keyed row
      val next = old.filter(col("id") % 10 =!= 0)
        .withColumn("v", when(col("id") % 10 === 5, col("v") * 2).otherwise(col("v")))
        .unionByName(Seq(
          (9001L, null.asInstanceOf[String], 7L),
          (9002L, "g1", 999L)).toDF("id", "g1", "v"))
      val feed = graft.operators.SnapshotDiff.changeFeed(old, next, keys = Seq("id"))
      next.repartition(3).write.mode("overwrite").parquet(base)
      val folded = MaterializedViews.refreshFromChanges(spark, d, feed)
      val foldedRows = spark.read.parquet(folded.dataDir)
      MaterializedViews.deregister(base)
      val rebuilt = MaterializedViews.define(spark, base, Seq("g1"), Seq("v"), mv + "2")
      val directRows = spark.read.parquet(rebuilt.dataDir)
      assert(foldedRows.exceptAll(directRows).isEmpty && directRows.exceptAll(foldedRows).isEmpty,
        "null-keyed groups must fold/recompute exactly, not drop:\n" +
          foldedRows.collect().mkString("\n") + "\nvs\n" + directRows.collect().mkString("\n"))
    } finally MaterializedViews.deregister(base)
  }

  test("multi-column NULL grouping keys survive the CDC fold") {
    val base = tmpDir("mv-cdc-null2-base")
    val mv = tmpDir("mv-cdc-null2-view")
    val s = spark
    import s.implicits._
    val rows0 = (1 to 300).map { i =>
      (i.toLong,
        if (i % 4 == 0) null else s"a${i % 2}",
        if (i % 6 == 0) null else s"b${i % 3}",
        (i % 41).toLong)
    }
    rows0.toDF("id", "g1", "g2", "v").repartition(2).write.mode("overwrite").parquet(base)
    try {
      val d = MaterializedViews.define(spark, base, Seq("g1", "g2"), Seq("v"), mv)
      val old = rows0.toDF("id", "g1", "g2", "v")
      val next = old.filter(col("id") % 12 =!= 0) // deletes hit (null, null) and (null, b*) groups
        .withColumn("v", when(col("id") % 7 === 3, col("v") + 100).otherwise(col("v")))
      val feed = graft.operators.SnapshotDiff.changeFeed(old, next, keys = Seq("id"))
      next.repartition(2).write.mode("overwrite").parquet(base)
      val folded = MaterializedViews.refreshFromChanges(spark, d, feed)
      val foldedRows = spark.read.parquet(folded.dataDir)
      MaterializedViews.deregister(base)
      val rebuilt = MaterializedViews.define(spark, base, Seq("g1", "g2"), Seq("v"), mv + "2")
      val directRows = spark.read.parquet(rebuilt.dataDir)
      assert(foldedRows.exceptAll(directRows).isEmpty && directRows.exceptAll(foldedRows).isEmpty)
    } finally MaterializedViews.deregister(base)
  }

  test("targeted recompute scan pushes IN/IS NULL literals to the parquet footers") {
    val base = tmpDir("mv-prune-base")
    val mv = tmpDir("mv-prune-view")
    val s = spark
    import s.implicits._
    (1 to 500).map(i => (i.toLong, s"g${i % 10}", (i % 23).toLong))
      .toDF("id", "g1", "v").repartition(4).write.mode("overwrite").parquet(base)
    try {
      val d = MaterializedViews.define(spark, base, Seq("g1"), Seq("v"), mv)
      val keys = Seq(org.apache.spark.sql.Row("g3"), org.apache.spark.sql.Row(null))
      val scan = MaterializedViews.dirtyRecomputeScan(spark, d, keys)
      val plan = scan.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        (plan.contains("In(g1") || plan.contains("EqualTo(g1")),
        s"dirty-group IN list must reach the scan as PushedFilters:\n$plan")
      assert(plan.contains("IsNull(g1"),
        s"a null dirty key must push IsNull for footer skipping:\n$plan")
      // and the scan is EXACT: precisely the g3 + null-keyed rows
      val want = spark.read.parquet(base).where(col("g1") === "g3" || col("g1").isNull)
      assert(scan.count() == want.count() && scan.exceptAll(want).isEmpty)
      // multi-column keys: superset filter + null-safe semi join stays exact
      val d2 = MaterializedViews.define(spark, base, Seq("g1", "v"), Seq("id"), mv + "2")
      val keys2 = Seq(org.apache.spark.sql.Row("g3", 5L), org.apache.spark.sql.Row("g7", 9L))
      val scan2 = MaterializedViews.dirtyRecomputeScan(spark, d2, keys2)
      val want2 = spark.read.parquet(base)
        .where((col("g1") === "g3" && col("v") === 5L) || (col("g1") === "g7" && col("v") === 9L))
      assert(scan2.count() == want2.count() && scan2.exceptAll(want2).isEmpty,
        "multi-column dirty scan must be tuple-exact, not the IN-list cross product")
      val plan2 = scan2.queryExecution.executedPlan.toString
      assert(plan2.contains("In(g1") && plan2.contains("In(v"),
        s"both columns' IN lists must push down:\n$plan2")
    } finally {
      MaterializedViews.deregister(base)
    }
  }

  test("refresh retains the previous generation; the one before dies on the next commit") {
    val (base, mv) = fixture()
    val s = spark
    import s.implicits._
    try {
      val d0 = MaterializedViews.define(spark, base, Seq("g1"), Seq("v"), mv)
      def gens(): Seq[String] = {
        val root = new org.apache.hadoop.fs.Path(mv)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(root).map(_.getPath.getName).filter(_.startsWith("gen-")).sorted.toSeq
      }
      val b1 = Seq(("a", "x", 5000L, 1.0)).toDF("g1", "g2", "v", "w")
      b1.write.mode("append").parquet(base)
      val d1 = MaterializedViews.refreshIncremental(spark, d0, b1)
      assert(gens() == Seq("gen-000000", "gen-000001"),
        s"gen-0 must survive until gen-2 commits, have: ${gens()}")
      val b2 = Seq(("b", "y", 6000L, 2.0)).toDF("g1", "g2", "v", "w")
      b2.write.mode("append").parquet(base)
      MaterializedViews.refreshIncremental(spark, d1, b2)
      assert(gens() == Seq("gen-000001", "gen-000002"),
        s"gen-0 dies when gen-2 commits, gen-1 retained, have: ${gens()}")
    } finally MaterializedViews.deregister(base)
  }

  test("a query planned against generation N still answers after a refresh commits N+1") {
    val (base, mv) = fixture()
    val s = spark
    import s.implicits._
    try {
      val d0 = MaterializedViews.define(spark, base, Seq("g1"), Seq("v"), mv)
      // plan (and pin the physical plan of) ONE rewritten query against
      // gen-0 — queryExecution is cached per DataFrame, so re-collecting
      // THIS DataFrame re-executes the gen-0 physical plan
      val planned = spark.read.parquet(base)
        .groupBy("g1").agg(sum(col("v")).as("sv")).orderBy("g1")
      assert(scanPaths(planned).contains(mv))
      val before = planned.collect() // materializes the gen-0 plan
      // refresh commits gen-1 and repoints the registry — gen-0 must remain readable
      val b1 = Seq(("a", "x", 100000L, 1.0)).toDF("g1", "g2", "v", "w")
      b1.write.mode("append").parquet(base)
      MaterializedViews.refreshIncremental(spark, d0, b1)
      // the ALREADY-PLANNED DataFrame re-executes against its captured
      // gen-0 file listing: with eager gen deletion this threw
      // FileNotFoundException mid-scan; with one-generation retention
      // it answers consistently for the snapshot it was planned on
      val after = planned.collect()
      assert(after.toSeq == before.toSeq,
        "a reader planned on generation N must keep answering N's snapshot")
      // and a FRESHLY planned query sees the new generation's answer
      val fresh = spark.read.parquet(base)
        .groupBy("g1").agg(sum(col("v")).as("sv")).orderBy("g1")
      assert(scanPaths(fresh).contains(mv))
      assert(fresh.collect().toSeq != before.toSeq,
        "a new query must observe the refreshed view")
    } finally MaterializedViews.deregister(base)
  }

  test("the SQL transform surface benefits too: spark.sql over parquet.`path` rewrites") {
    val (base, mv) = fixture()
    try {
      MaterializedViews.define(spark, base, Seq("g1"), Seq("v"), mv)
      val q = spark.sql(
        s"SELECT g1, sum(v) AS sv, count(*) AS n FROM parquet.`$base` GROUP BY g1")
      assert(scanPaths(q).contains(mv),
        "the config-driven SQL surface (#5) must ride the same rewrite")
      val got = q.orderBy("g1").collect()
      MaterializedViews.deregister(base)
      val want = spark.sql(
        s"SELECT g1, sum(v) AS sv, count(*) AS n FROM parquet.`$base` GROUP BY g1")
        .orderBy("g1").collect()
      assert(got.toSeq == want.toSeq)
    } finally MaterializedViews.deregister(base)
  }

  private def joinFixture(): (String, String, String) = {
    val s = spark
    import s.implicits._
    val facts = tmpDir("mvj-facts")
    val dims = tmpDir("mvj-dims")
    val mv = tmpDir("mvj-view")
    (1 to 2000).map { i =>
      (i.toLong, (i % 37).toLong, s"p${i % 3}", (i % 11).toLong)
    }.toDF("fact_id", "cust_id", "priority", "amount")
      .repartition(4).write.mode("overwrite").parquet(facts)
    (0 to 36).map(i => (i.toLong, s"seg${i % 4}"))
      .toDF("c_id", "segment")
      .write.mode("overwrite").parquet(dims)
    (facts, dims, mv)
  }

  test("join view: covered aggregate over fact ⋈ dim rewrites — both base scans AND the join vanish") {
    val (facts, dims, mv) = joinFixture()
    try {
      MaterializedViews.defineJoin(spark, facts, dims,
        joinKeys = Seq(("cust_id", "c_id")),
        groupCols = Seq("segment", "priority"), aggCols = Seq("amount"), mvPath = mv)
      def query() = {
        val f = spark.read.parquet(facts)
        val d = spark.read.parquet(dims)
        f.join(d, f("cust_id") === d("c_id"))
          .where(col("priority") === "p1")
          .groupBy("segment")
          .agg(sum(col("amount")).as("sa"), count(lit(1)).as("n"),
            min(col("amount")).as("mn"), max(col("amount")).as("mx"),
            avg(col("amount")).as("av"))
      }
      val rewritten = query()
      val plan = scanPaths(rewritten)
      assert(plan.contains(mv), s"join-view rewrite must scan the MV:\n$plan")
      assert(!plan.contains(facts) && !plan.contains(dims),
        s"join-view rewrite must scan NEITHER base:\n$plan")
      val got = rewritten.orderBy("segment").collect()
      MaterializedViews.deregisterJoin(facts, dims)
      val want = query().orderBy("segment").collect()
      assert(got.toSeq == want.toSeq, s"join-view rewrite changed the answer")
    } finally MaterializedViews.deregisterJoin(facts, dims)
  }

  test("join view: the flipped equality and a dim-side filter also rewrite; group-subset re-aggregates") {
    val (facts, dims, mv) = joinFixture()
    try {
      MaterializedViews.defineJoin(spark, facts, dims,
        joinKeys = Seq(("cust_id", "c_id")),
        groupCols = Seq("segment", "priority"), aggCols = Seq("amount"), mvPath = mv)
      def query() = {
        val f = spark.read.parquet(facts)
        val d = spark.read.parquet(dims)
        // flipped operand order + filter on the DIM side's group col +
        // grouping on a subset (priority only)
        f.join(d, d("c_id") === f("cust_id"))
          .where(col("segment").isin("seg0", "seg2"))
          .groupBy("priority")
          .agg(sum(col("amount")).as("sa"), count(col("amount")).as("na"))
      }
      assert(scanPaths(query()).contains(mv))
      val got = query().orderBy("priority").collect()
      MaterializedViews.deregisterJoin(facts, dims)
      assert(got.toSeq == query().orderBy("priority").collect().toSeq)
    } finally MaterializedViews.deregisterJoin(facts, dims)
  }

  test("join view bails: extra join predicate, non-equi term, outer join, non-group filter, unstored agg") {
    val (facts, dims, mv) = joinFixture()
    try {
      MaterializedViews.defineJoin(spark, facts, dims,
        joinKeys = Seq(("cust_id", "c_id")),
        groupCols = Seq("segment", "priority"), aggCols = Seq("amount"), mvPath = mv)
      val f = spark.read.parquet(facts)
      val d = spark.read.parquet(dims)
      def agged(j: org.apache.spark.sql.DataFrame) =
        j.groupBy("segment").agg(sum(col("amount")).as("sa"))
      // extra equi predicate beyond the registered keys
      val extra = agged(f.join(d, f("cust_id") === d("c_id") && f("amount") === d("c_id")))
      assert(scanPaths(extra).contains(facts), "extra join predicate must bail")
      // non-equi join term
      val nonEqui = agged(f.join(d, f("cust_id") === d("c_id") && f("amount") > d("c_id")))
      assert(scanPaths(nonEqui).contains(facts), "non-equi term must bail")
      // outer join
      val outer = agged(f.join(d, f("cust_id") === d("c_id"), "left"))
      assert(scanPaths(outer).contains(facts), "outer join must bail")
      // filter on a non-group column
      val badFilter = agged(f.join(d, f("cust_id") === d("c_id")).where(col("amount") > 3))
      assert(scanPaths(badFilter).contains(facts), "non-group filter must bail")
      // aggregate on an unstored column
      val unstored = f.join(d, f("cust_id") === d("c_id"))
        .groupBy("segment").agg(sum(col("fact_id")).as("sf"))
      assert(scanPaths(unstored).contains(facts), "unstored agg column must bail")
    } finally MaterializedViews.deregisterJoin(facts, dims)
  }

  test("join view: fact-side incremental fold == full rebuild; rewrite answers over base + append") {
    val (facts, dims, mv) = joinFixture()
    val s = spark
    import s.implicits._
    try {
      val d0 = MaterializedViews.defineJoin(spark, facts, dims,
        joinKeys = Seq(("cust_id", "c_id")),
        groupCols = Seq("segment", "priority"), aggCols = Seq("amount"), mvPath = mv)
      val batch = (5000 to 5600).map { i =>
        (i.toLong, (i % 37).toLong, s"p${i % 5}", 1000L + i)
      }.toDF("fact_id", "cust_id", "priority", "amount")
      batch.write.mode("append").parquet(facts)
      val d1 = MaterializedViews.refreshJoinIncremental(spark, d0, batch)
      val folded = spark.read.parquet(d1.dataDir)
      MaterializedViews.deregisterJoin(facts, dims)
      val rebuilt = MaterializedViews.defineJoin(spark, facts, dims,
        joinKeys = Seq(("cust_id", "c_id")),
        groupCols = Seq("segment", "priority"), aggCols = Seq("amount"), mvPath = mv + "2")
      val direct = spark.read.parquet(rebuilt.dataDir)
      assert(folded.exceptAll(direct).isEmpty && direct.exceptAll(folded).isEmpty,
        "fact-side fold must equal the full join-view rebuild (new priority groups included)")
      MaterializedViews.deregisterJoin(facts, dims)
      // rewritten query over the folded view answers for base + append
      MaterializedViews.joinRegistry.put((d1.leftPath, d1.rightPath), d1)
      def q() = {
        val f = spark.read.parquet(facts)
        val dd = spark.read.parquet(dims)
        f.join(dd, f("cust_id") === dd("c_id"))
          .groupBy("segment", "priority")
          .agg(sum(col("amount")).as("sa"), count(lit(1)).as("n"))
      }
      assert(scanPaths(q()).contains(d1.dataDir))
      val got = q().orderBy("segment", "priority").collect()
      MaterializedViews.deregisterJoin(facts, dims)
      assert(got.toSeq == q().orderBy("segment", "priority").collect().toSeq)
    } finally MaterializedViews.deregisterJoin(facts, dims)
  }

  test("expressions OVER aggregate calls rewrite: casts and arithmetic collapsed into the Aggregate") {
    val (base, mv) = fixture()
    try {
      MaterializedViews.define(spark, base, Seq("g1", "g2"), Seq("v", "w"), mv)
      // the optimizer collapses the final select INTO the Aggregate, so
      // the rule sees `cast(sum(v)) AS x` / `sum(v)+count(*) AS y` /
      // `g1-dependent arithmetic` as aggregateExpressions
      def q() = spark.read.parquet(base)
        .groupBy("g1")
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .select(col("g1"),
          col("sv").cast("double").as("svd"),
          (col("sv") + col("n") * 2).as("combo"))
      assert(scanPaths(q()).contains(mv), s"collapsed-projection shape must rewrite:\n${scanPaths(q())}")
      val got = q().orderBy("g1").collect()
      MaterializedViews.deregister(base)
      assert(got.toSeq == q().orderBy("g1").collect().toSeq)
      // non-deterministic expressions over aggregates still bail
      MaterializedViews.define(spark, base, Seq("g1", "g2"), Seq("v", "w"), mv)
      val nondet = spark.read.parquet(base).groupBy("g1")
        .agg((sum(col("v")) + (rand(7) * 0)).as("s"))
      assert(scanPaths(nondet).contains(base), "non-deterministic output expr must bail")
    } finally MaterializedViews.deregister(base)
  }

  test("deregister restores the base scan") {
    val (base, mv) = fixture()
    try {
      MaterializedViews.define(spark, base, Seq("g1"), Seq("v"), mv)
      def q() = spark.read.parquet(base).groupBy("g1").agg(sum(col("v")).as("sv"))
      assert(scanPaths(q()).contains(mv))
      MaterializedViews.deregister(base)
      assert(scanPaths(q()).contains(base))
    } finally MaterializedViews.deregister(base)
  }
}
