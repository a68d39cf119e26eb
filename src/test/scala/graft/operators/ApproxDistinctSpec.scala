package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxDistinctSpec extends SparkSpec {

  test("approx_count_distinct stays within HLL++ error of exact per group") {
    val ev = graft.sources.TableLoader.table(spark, sfDir, "events")
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      // default rsd = 0.05; allow 3 sigma plus integer slack
      assert(math.abs(a - e) <= math.max(3, 0.15 * e), s"$k: approx $a vs exact $e")
    }
  }

  test("sketches merge: per-partition HLL union equals whole-column estimate") {
    val ev = graft.sources.TableLoader.table(spark, sfDir, "events")
    val whole = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .collect()(0).getLong(0)
    // same sketch built as a two-level merge (the 1000-executor shape)
    val merged = ev.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .collect()(0).getLong(0)
    assert(merged == whole)
  }

  test("approx_percentile lands within rank error of the exact percentile") {
    val li = graft.sources.TableLoader.table(spark, sfDir, "lineitem")
    val approx = li.groupBy("l_returnflag")
      .agg(approx_percentile(col("l_quantity"), array(lit(0.5), lit(0.9)), lit(1000)).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(percentile(col("l_quantity"), array(lit(0.5), lit(0.9))).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // accuracy=1000 => rank error <= 1/1000; l_quantity spans 1..50,
    // so value error on this near-uniform column stays within ~1 unit
    exact.foreach { case (k, e) =>
      approx(k).zip(e).foreach { case (a, x) =>
        assert(math.abs(a - x) <= 1.5, s"$k: approx $a vs exact $x")
      }
    }
  }

  test("approx_percentile locked vector: single-partition GK is deterministic and exact on small inputs") {
    val s = spark
    import s.implicits._
    // GK with accuracy >= n keeps every value: the sketch answer IS
    // the exact lower-interpolation percentile, and with one
    // partition the merge tree is fixed — so the outputs are a locked
    // contract, not a tolerance band
    val df = (1L to 100L).map(_.toDouble).toDF("v").repartition(1)
    def run() = df.agg(approx_percentile(col("v"),
        array(lit(0.1), lit(0.5), lit(0.9), lit(0.99)), lit(1000)).as("q"))
      .head().getSeq[Double](0)
    assert(run() == Seq(10.0, 50.0, 90.0, 99.0))
    assert(run() == run(), "same input + partitioning must reproduce bit-for-bit")
    // tie-heavy locked vector: the sketch must sit on a real value
    val tied = Seq.fill(50)(7.0).concat(Seq.fill(50)(9.0)).toDF("v").repartition(1)
    val tq = tied.agg(approx_percentile(col("v"), array(lit(0.25), lit(0.75)), lit(1000)))
      .head().getSeq[Double](0)
    assert(tq == Seq(7.0, 9.0))
  }

  test("kmvDistinct: estimate within 3 sigma of exact per group") {
    val ev = graft.sources.TableLoader.table(spark, sfDir, "events")
    val k = 64
    val approx = Sketches.approxDistinctKmv(ev, Seq("event_type"), "user_id", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, e) =>
      val a = approx(g)
      // KMV sigma ~ e/sqrt(k-2); 3 sigma plus integer slack
      assert(math.abs(a - e) <= math.max(3, 3.0 * e / math.sqrt(k - 2.0)),
        s"$g: approx $a vs exact $e")
    }
  }

  test("kmvDistinct is a pure function of the input SET: partitioning/order never move it") {
    val ev = graft.sources.TableLoader.table(spark, sfDir, "events")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.approxDistinctKmv(df, Seq("event_type"), "user_id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val base = run(ev.repartition(1))
    assert(run(ev.repartition(13)) == base, "13-partition merge tree must match single-partition")
    assert(run(ev.orderBy(col("event_id").desc)) == base, "insertion order must not matter")
  }

  test("kmvDistinct: sketch below capacity returns the exact distinct count") {
    val s = spark
    import s.implicits._
    val df = Seq.tabulate(200)(i => ("g", i.toLong % 40)).toDF("g", "v")
    val got = Sketches.approxDistinctKmv(df, Seq("g"), "v", k = 64)
      .head()
    assert(got.getLong(1) == 40L, "40 distinct < k=64 must be exact")
    assert(got.getLong(2) == 200L)
  }

  test("sampledQuantiles: deterministic, and within sampling error of exact percentiles") {
    val li = graft.sources.TableLoader.table(spark, sfDir, "lineitem")
    val key = col("l_orderkey") * 8 + col("l_linenumber")
    def run() = Sketches.sampledQuantiles(
      li, Seq("l_returnflag"), "l_quantity", key, Seq(0.5, 0.9), fraction = 0.125)
    val a = run().collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val b = run().collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(a == b, "hash-cut sample must be run-stable")
    val exact = li.groupBy("l_returnflag")
      .agg(percentile(col("l_quantity"), array(lit(0.5), lit(0.9))).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // rank error sigma ~ 0.5/sqrt(f*n); on the near-uniform 1..50
    // l_quantity that's ~50*3*0.5/sqrt(0.125*n) value units at 3 sigma
    val counts = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, e) =>
      val (p50, p90) = a(g)
      val tol = math.max(2.0, 50.0 * 3 * 0.5 / math.sqrt(0.125 * counts(g).toDouble))
      assert(math.abs(p50 - e(0)) <= tol, s"$g p50: $p50 vs ${e(0)} (tol $tol)")
      assert(math.abs(p90 - e(1)) <= tol, s"$g p90: $p90 vs ${e(1)} (tol $tol)")
    }
  }

  test("refreshKmv: incremental fold == one-shot sketch; replay is a byte-identical no-op") {
    val ev = graft.sources.TableLoader.table(spark, sfDir, "events")
    val state = tmpDir("graft-kmv-inc-") + "/s"
    val b1 = ev.filter(col("event_id") % 2 === 0)
    val b2 = ev.filter(col("event_id") % 2 === 1)
    assert(IncrementalAgg.refreshKmv(spark, state, b1, Seq("event_type"), "user_id",
      k = 64, batchId = Some(1L)))
    assert(IncrementalAgg.refreshKmv(spark, state, b2, Seq("event_type"), "user_id",
      k = 64, batchId = Some(2L)))
    // replay: recognized no-op, state version unchanged
    val vBefore = graft.sources.UpsertWriter.versions(spark, state)
    assert(!IncrementalAgg.refreshKmv(spark, state, b2, Seq("event_type"), "user_id",
      k = 64, batchId = Some(2L)))
    assert(graft.sources.UpsertWriter.versions(spark, state) == vBefore)
    val inc = IncrementalAgg.readKmvEstimate(spark, state, Seq("event_type"), k = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = Sketches.approxDistinctKmv(ev, Seq("event_type"), "user_id", k = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(inc == oneShot, s"incremental $inc != one-shot $oneShot")
  }

  test("kmv_estimate_from(sketch state) == kmv_distinct estimate, including truncation ties") {
    val ev = graft.sources.TableLoader.table(spark, sfDir, "events")
    import graft.functions.KmvFunctions._
    val both = ev.groupBy(col("event_type"))
      .agg(kmv_distinct(xxhash64(col("user_id")), 64).as("direct"),
        kmv_estimate_from(kmv_sketch(xxhash64(col("user_id")), 64), 64).as("derived"))
      .collect()
    both.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"${r.getString(0)}: direct ${r.getLong(1)} != derived ${r.getLong(2)}"))
  }

  test("reproducibleStratified: exact fraction semantics, run-stable, oracle formula") {
    val docs = graft.sources.TableLoader.table(spark, sfDir, "documents")
    def run() = Sampling.reproducibleStratified(docs, "lang", "doc_id", Map("en" -> 0.25))
    assert(run().count() == run().count())
    // kept set == rows whose multiplicative hash clears the cut —
    // recomputed independently on the driver
    val kept = run().select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val m = 2147483648L
    val expect = all.filter { case (id, lang) =>
      val h = ((id % m) * 2654435761L) % m
      h < (if (lang == "en") math.round(0.25 * m) else m)
    }.map(_._1).toSet
    assert(kept == expect)
  }

  test("kmvOverlap: below-capacity sketches give EXACT set algebra; estimates track truth at scale") {
    val s = spark
    import s.implicits._
    // A = users 1..40, B = users 21..70: |A|=40 |B|=50 |A∪B|=70 |A∩B|=20
    val rows = (1L to 40L).map(u => ("a", u)) ++ (21L to 70L).map(u => ("b", u))
    val df = rows.toDF("seg", "user")
    val r = Sketches.kmvOverlap(df, "seg", "user", "a", "b", k = 128).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == (40L, 50L, 70L, 20L),
      s"below-capacity KMV must be exact, got $r")
    assert(r.getLong(4) == 20L * 10000L / 70L) // jaccard_bp floor
    // k smaller than the sets: estimates within 3-sigma KMV error of truth
    val big = ((1L to 3000L).map(u => ("a", u)) ++ (2001L to 6000L).map(u => ("b", u))).toDF("seg", "user")
    val e = Sketches.kmvOverlap(big, "seg", "user", "a", "b", k = 256).head()
    val sigma = 1.0 / math.sqrt(256)
    assert(math.abs(e.getLong(0) - 3000.0) < 3 * sigma * 3000, s"est_a ${e.getLong(0)}")
    assert(math.abs(e.getLong(2) - 6000.0) < 3 * sigma * 6000, s"est_union ${e.getLong(2)}")
    // disjoint segments: intersection clamps to >= 0, never negative
    val disj = ((1L to 500L).map(u => ("a", u)) ++ (10001L to 10500L).map(u => ("b", u))).toDF("seg", "user")
    val d = Sketches.kmvOverlap(disj, "seg", "user", "a", "b", k = 64).head()
    assert(d.getLong(3) >= 0L)
  }

  test("kmvOverlap: ALWAYS exactly one row — an absent segment is the empty set, estimate 0") {
    val s = spark
    import s.implicits._
    // segment 'b' has no members at all
    val df = (1L to 30L).map(u => ("a", u)).toDF("seg", "user")
    val rows = Sketches.kmvOverlap(df, "seg", "user", "a", "b", k = 64).collect()
    assert(rows.length == 1, s"must be exactly one result row, got ${rows.length}")
    val r = rows(0)
    assert(r.getLong(0) == 30L, "present segment exact below capacity")
    assert(r.getLong(1) == 0L, "absent segment is the empty set, not a vanished row")
    assert(r.getLong(2) == 30L && r.getLong(3) == 0L && r.getLong(4) == 0L)
    // BOTH segments absent: still one row, all zeros (union=0 guards the ratio)
    val none = Seq(("z", 1L)).toDF("seg", "user")
    val z = Sketches.kmvOverlap(none, "seg", "user", "a", "b", k = 64).collect()
    assert(z.length == 1 && (0 to 4).forall(i => z(0).getLong(i) == 0L), s"got ${z.toSeq}")
  }
}
