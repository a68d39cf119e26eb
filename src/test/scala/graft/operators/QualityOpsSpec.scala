package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityOpsSpec extends SparkSpec {

  test("profiler: nulls, distinct, min/max per column in one pass") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")))
      .toDF("id", "name")
    val out = Profiler.profile(df, Seq("id", "name"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(out("id") == ((4L, 0L, 4L, "1", "4")))
    assert(out("name") == ((4L, 1L, 2L, "a", "b")))
  }

  test("quality checks: each kind counts its violations") {
    val s = spark
    import s.implicits._
    val child = Seq((1L, Some(10L), "x"), (1L, Some(20L), "y"), (2L, Some(99L), "z"),
      (3L, None, "w")).toDF("id", "fk", "v")
    val parent = Seq(10L, 20L).toDF("pk")
    val out = QualityChecks.run(Seq(
      QualityChecks.notNull(child, "fk", "fk_not_null"),
      QualityChecks.unique(child, Seq("id"), "id_unique"),
      QualityChecks.acceptedValues(child, "v", Seq("x", "y"), "v_domain"),
      QualityChecks.referential(child, "fk", parent, "pk", "fk_exists")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out("fk_not_null") == ((1L, false)))
    assert(out("id_unique") == ((2L, false))) // both rows of the dup key
    assert(out("v_domain") == ((2L, false))) // z and w
    assert(out("fk_exists") == ((1L, false))) // 99 has no parent
  }

  test("hashSplit: deterministic, group-stable, fractions roughly honored") {
    val ev = graft.sources.TableLoader.table(spark, sfDir, "events")
    def run() = Sampling.hashSplit(ev, "user_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val a = run().groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = run().groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b) // seeded: stable across runs
    // group-stability: every user maps to exactly one split
    val multi = run().groupBy("user_id").agg(count_distinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(multi == 0)
    // ~150 users; binomial slack is wide but train must dominate
    val n = a.values.sum.toDouble
    assert(a.getOrElse("train", 0L) / n > 0.6, a.toString)
    assert(a.keySet.subsetOf(Set("train", "val", "test")))
  }

  test("hashSplit rejects negative fractions instead of mis-cutting") {
    val ev = graft.sources.TableLoader.table(spark, sfDir, "events")
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ev, "user_id", Seq("train" -> 0.9, "val" -> -0.1, "test" -> 0.1))
    }
  }

  test("modSplit covers all rows with the declared labels") {
    val ev = graft.sources.TableLoader.table(spark, sfDir, "events")
    val out = Sampling.modSplit(ev, "user_id", 10, Seq("train" -> 8, "val" -> 1, "test" -> 1))
    assert(out.count() == ev.count())
    assert(out.filter(!col("split").isin("train", "val", "test")).count() == 0)
  }

  test("referential works when child and parent key share a name") {
    val s = spark
    import s.implicits._
    val child = Seq(1L, 2L, 9L).toDF("k")
    val parent = Seq(1L, 2L).toDF("k")
    val out = QualityChecks.run(Seq(QualityChecks.referential(child, "k", parent, "k", "fk")))
      .collect()(0)
    assert(out.getLong(1) == 1L && !out.getBoolean(2))
  }

  test("iqrOutliers: fences and counts on a planted distribution") {
    val s = spark
    import s.implicits._
    // group g: 1..9 plus one far outlier
    val vals = (1 to 9).map(_.toDouble) :+ 1000.0
    val df = vals.map(("g", _)).toDF("grp", "v")
    val row = Profiler.iqrOutliers(df, "grp", "v").collect()(0)
    val (p25, p75) = (row.getDouble(1), row.getDouble(2))
    // interpolated quartiles over 10 sorted values: idx 2.25 and 6.75
    assert(p25 == 3.25 && p75 == 7.75, s"$p25/$p75")
    assert(row.getDouble(3) == 3.25 - 1.5 * 4.5) // fence_lo
    assert(row.getDouble(4) == 7.75 + 1.5 * 4.5) // fence_hi
    assert(row.getLong(5) == 1L && row.getLong(6) == 10L) // only 1000.0 is out
  }

  test("winsorize: dyadic-percentile bounds, tails clamp, interior unchanged") {
    val s = spark
    import s.implicits._
    // 9 sorted values 10..90: p=1/8 lands exactly on position 1 (=20),
    // p=7/8 on position 7 (=80)
    val df = (1 to 9).map(v => ("g", (v * 10).toDouble)).toDF("grp", "v")
    val out = Profiler.winsorize(df, "grp", "v")
      .select("v", "clip_lo", "clip_hi", "v_clipped")
      .collect().map(r => r.getDouble(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(10.0) == ((20.0, 80.0, 20.0))) // low tail clamps up
    assert(out(90.0)._3 == 80.0)              // high tail clamps down
    assert(out(50.0)._3 == 50.0)              // interior untouched
  }

  test("pairStats: exact sums, covariance, slope on a planted line") {
    val s = spark
    import s.implicits._
    // y = 2x + 1 exactly: cov = 2·var(x), slope = 2
    val df = Seq((1L, 3L), (2L, 5L), (3L, 7L), (4L, 9L))
      .map { case (x, y) => ("g", x, y) }.toDF("grp", "x", "y")
    val r = Profiler.pairStats(df, "grp", "x", "y").collect()(0)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("sum_x") == 10L && r.getAs[Long]("sum_y") == 24L)
    assert(r.getAs[Long]("sum_xy") == 3 + 10 + 21 + 36)
    assert(r.getAs[Long]("sum_x2") == 30L && r.getAs[Long]("sum_y2") == 164L)
    // cov_pop = E[xy] - E[x]E[y] = 17.5 - 2.5·6 = 2.5; var(x)=1.25
    assert(r.getAs[Double]("cov_pop") == 2.5)
    assert(r.getAs[Double]("slope") == 2.0)
  }

  test("pairStats: constant x yields null slope, not a division blowup") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", 5L, 1L), ("g", 5L, 2L)).toDF("grp", "x", "y")
    val r = Profiler.pairStats(df, "grp", "x", "y").collect()(0)
    assert(r.isNullAt(r.fieldIndex("slope")))
  }

  test("histogram: integer bin edges, sparse bins, counts cover all rows") {
    val s = spark
    import s.implicits._
    // values 0..99 in one group, 10 bins -> width 10, ten bins of 10
    val df = (0 until 100).map(v => ("g", v.toLong)).toDF("grp", "v")
    val out = Profiler.histogram(df, "grp", "v", bins = 10)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.size == 10)
    (0L to 9L).foreach { b =>
      assert(out(b) == ((b * 10, b * 10 + 9, 10L)), s"bin $b: ${out(b)}")
    }
    // sparse: a far outlier occupies its own bin, middle bins absent
    val sparse = (Seq(0L, 1L, 2L) :+ 1000L).map(("g", _)).toDF("grp", "v")
    val bins = Profiler.histogram(sparse, "grp", "v", bins = 10)
      .collect().map(_.getLong(1)).sorted
    assert(bins.length < 10 && bins.last == 9L, bins.mkString(","))
  }

  test("shuffleShard: deterministic, covers all rows, per-shard dense positions") {
    val docs = graft.sources.TableLoader.table(spark, sfDir, "documents").select("doc_id")
    def run() = Sampling.shuffleShard(docs, "doc_id", 8)
    val a = run().collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    val b = run().collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(a.sameElements(b), "run-to-run deterministic")
    assert(a.length == docs.count())
    // positions are 1..n_shard within each shard (dense ranking)
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length), s"shard $shard")
    }
    // the order is actually scrambled: sharded order != key order
    val firstShard = a.filter(_._2 == a(0)._2).sortBy(_._3).map(_._1)
    assert(!firstShard.sameElements(firstShard.sorted), "hash order must not equal key order")
    // and no global sort in the plan: the only Sort is shard-partitioned
    val plan = run().queryExecution.executedPlan.treeString
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("weightedPriorityPerGroup: weight-sensitive, deterministic, non-positive weights excluded") {
    val s = spark
    import s.implicits._
    // two weight classes in one group: heavy rows (w=1000) vs light
    // (w=1) — with k = 1/4 of the rows, the heavy half must dominate
    val rows = (1L to 400L).map(i => ("g", i, if (i % 2 == 0) 1000L else 1L))
    val df = rows.toDF("grp", "id", "w")
    val picked = Sampling.weightedPriorityPerGroup(df, "grp", "id", "w", k = 100)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(picked.length == 100)
    val heavy = picked.count(_._2 == 1000L)
    assert(heavy > 80, s"heavy rows must dominate the weighted sample, got $heavy/100")
    // deterministic: identical sample on re-run
    val again = Sampling.weightedPriorityPerGroup(df, "grp", "id", "w", k = 100)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(picked.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // per-group k and dense ranks
    val multi = Sampling.weightedPriorityPerGroup(
      (1L to 100L).map(i => (s"g${i % 2}", i, i)).toDF("grp", "id", "w"),
      "grp", "id", "w", k = 10)
    assert(multi.groupBy("grp").count().collect().forall(_.getLong(1) == 10L))
    // zero/negative weights can never be sampled
    val withDead = df.union(Seq(("g", 1000L, 0L), ("g", 1001L, -5L)).toDF("grp", "id", "w"))
    val alive = Sampling.weightedPriorityPerGroup(withDead, "grp", "id", "w", k = 500)
    assert(alive.where(col("id") >= 1000L).isEmpty)
    assert(alive.count() == 400L)
    // non-integral keys refuse loudly — pmod would silently coerce a
    // string/decimal key and the priorities would diverge from the
    // documented integer hash (and any oracle)
    val strKeyed = df.withColumn("sid", col("id").cast("string"))
    val err = intercept[IllegalArgumentException] {
      Sampling.weightedPriorityPerGroup(strKeyed, "grp", "sid", "w", k = 10)
    }
    assert(err.getMessage.contains("integral"))
  }

  test("negativeSamples: k per anchor, in-range, deterministic, shuffle-free") {
    val docs = graft.sources.TableLoader.table(spark, sfDir, "documents").select("doc_id")
    val n = docs.count()
    def run() = Sampling.negativeSamples(docs, "doc_id", k = 3)
    val rows = run().collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == n * 3)
    assert(rows.forall { case (_, _, neg) => neg >= 0 && neg < n })
    assert(rows.sortBy(t => (t._1, t._2)).sameElements(
      run().collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(t => (t._1, t._2))))
    // negatives scatter: anchors don't all map to the same partner
    assert(rows.map(_._3).distinct.length > n / 10)
    val plan = run().queryExecution.executedPlan.treeString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("stratified: per-stratum fractions, deterministic, group-stable") {
    val docs = graft.sources.TableLoader.table(spark, sfDir, "documents")
    def run() = Sampling.stratified(docs, "lang", "doc_id",
      Map("en" -> 0.3), defaultFraction = 1.0)
    val a = run(); val b = run()
    assert(a.count() == b.count()) // seeded determinism
    val byLang = docs.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // non-en strata fully kept
    byLang.filterNot(_._1 == "en").foreach { case (l, n) => assert(kept.getOrElse(l, 0L) == n, l) }
    // en downsampled to roughly 30% (wide slack: small corpus)
    val en = kept.getOrElse("en", 0L).toDouble / byLang("en")
    assert(en > 0.1 && en < 0.6, s"en kept $en")
  }

  test("mixtureResample: floor copies + hash extra, w=0 drops, deterministic") {
    val s2 = spark
    import s2.implicits._
    val docs = (0L until 100L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    def run() = Sampling.mixtureResample(docs, "source", "doc_id",
      Map("src0" -> 2.0, "src1" -> 0.5, "src2" -> 0.0))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val out = run()
    assert(out == run()) // deterministic
    // integer weight: exactly 2 copies of every src0 row, epochs 0 and 1
    val src0 = out.filter(_._2 == "src0")
    assert(src0.size == 50 && src0.count(_._3 == 1L) == 25)
    // w=0 drops the source entirely
    assert(!out.exists(_._2 == "src2"))
    // fractional: the kept src1 set matches the hash formula exactly
    val expected = (0L until 100L).filter(_ % 4 == 1)
      .filter(k => ((k % 2147483648L) * 2654435761L) % 2147483648L < 1073741824L).toSet
    assert(out.filter(_._2 == "src1").map(_._1) == expected)
    // default weight 1.0: every src3 row exactly once
    assert(out.count(_._2 == "src3") == 25)
  }

  test("surprisal: digit buckets and fixed-point mean are hand-checkable") {
    val s2 = spark
    import s2.implicits._
    // corpus: "a" ×9, "b" ×1 → total=10; bucket(a)=digits(10 DIV 9)-1=0,
    // bucket(b)=digits(10 DIV 1)-1=1
    val docs = Seq(
      (1L, "a a a a a a a a a"), // 9 tokens, all common → surprisal 0
      (2L, "b")                  // 1 rare token → bucket 1, score 10000
    ).toDF("doc_id", "text")
    val out = TextAnalysis.surprisal(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(1L -> ((9L, 0L, 0L)), 2L -> ((1L, 1L, 10000L))))
  }

  test("zscoreOutliers: flags exactly the >kσ points, integer-exact") {
    val s = spark
    import s.implicits._
    // 100 values of 10 plus one 1000: mean≈19.8, σ≈98.5 → only the
    // 1000 clears 3σ. All arithmetic stays in decimals — assert the
    // flag set, which is what the cross-multiplied form guarantees.
    val df = ((1 to 100).map(i => (i.toLong, "g", 10L)) :+ ((101L, "g", 1000L)))
      .toDF("id", "grp", "v")
    val out = Profiler.zscoreOutliers(df, "grp", "v", k = 3).select("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(101L))
    // with k large enough nothing is flagged
    assert(Profiler.zscoreOutliers(df, "grp", "v", k = 20).count() == 0L)
  }

  test("zscoreOutliers: zero-variance group flags nothing") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "g", 5L), (2L, "g", 5L), (3L, "g", 5L)).toDF("id", "grp", "v")
    assert(Profiler.zscoreOutliers(df, "grp", "v", k = 3).count() == 0L)
  }

  test("quantileBins: quartiles of 1..8 bucket evenly; boundary goes up") {
    val s = spark
    import s.implicits._
    // sorted 1..8: p25=2.75, p50=4.5, p75=6.25
    val df = (1L to 8L).map(("g", _)).toDF("grp", "v")
    val bins = Profiler.quantileBins(df, "grp", "v")
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(bins == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2,
      5L -> 3, 6L -> 3, 7L -> 4, 8L -> 4))
  }

  test("imputeMean: nulls fill with the group mean of survivors; all-null group stays null") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Some(10.0)), ("a", Some(20.0)), ("a", None),
      ("b", None)).toDF("grp", "v")
    val out = Profiler.imputeMean(df, "grp", "v", "filled")
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(out == Set(
      ("a", Some(10.0), Some(10.0)),
      ("a", Some(20.0), Some(20.0)),
      ("a", None, Some(15.0)),
      ("b", None, None)))
  }

  test("madOutliers: robust to the outlier itself; flags exactly the planted extremes") {
    val s = spark
    import s.implicits._
    // group g: nine values near 10 plus one gross outlier at 1000 —
    // MAD ignores the outlier (median stays 10, MAD stays 1), so the
    // outlier is flagged and the near-10 values are not; mean-based
    // z-scores would have been dragged by the 1000
    val df = (Seq(8L, 9L, 9L, 10L, 10L, 10L, 11L, 11L, 12L, 1000L).map(("g", _)) ++
      Seq(("h", 5L), ("h", 5L), ("h", 5L))).toDF("grp", "v")
    val out = Profiler.madOutliers(df, "grp", "v", k = 3.0)
      .select(col("grp"), col("v")).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSet == Set(("g", 1000L)))
    // constant group: MAD 0, strict > flags nothing
    assert(!out.exists(_._1 == "h"))
  }

  test("contentDigest: layout/order independent, content sensitive") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.concat_ws
    val base = Seq((1L, "g1", "x"), (2L, "g1", "y"), (3L, "g2", "z")).toDF("id", "g", "v")
    def digest(df: org.apache.spark.sql.DataFrame) =
      Profiler.contentDigest(df, Seq("g"), concat_ws("", col("id"), col("v")))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val d = digest(base)
    assert(digest(base.repartition(7).sortWithinPartitions(col("v").desc)) == d,
      "digest must ignore partitioning and row order")
    val changed = digest(Seq((1L, "g1", "x"), (2L, "g1", "CHANGED"), (3L, "g2", "z"))
      .toDF("id", "g", "v"))
    assert(changed("g2") == d("g2"), "untouched group keeps its digest")
    assert(changed("g1") != d("g1"), "changed content must change the digest")
    assert(d("g1")._1 == 2L && d("g2")._1 == 1L)
  }

  test("weightedBernoulli: deterministic, max weight always kept, rates track weights") {
    val s = spark
    import s.implicits._
    val rows = (0L until 4000L).map(i => (i, if (i % 4 == 0) 10000L else 2500L))
    val df = rows.toDF("id", "w")
    def keep(salt: Long) = Sampling.weightedBernoulli(df, col("id"), col("w"), salt)
      .select("id").collect().map(_.getLong(0)).toSet
    val k1 = keep(0L); val k2 = keep(0L)
    assert(k1 == k2, "same salt must reproduce the identical SET")
    // every max-weight row survives (P = 1 exactly)
    assert(rows.filter(_._2 == 10000L).map(_._1).forall(k1.contains), "P=1 rows must all keep")
    // quarter-weight rows keep at ~25%
    val q = rows.filter(_._2 == 2500L).map(_._1)
    val rate = q.count(k1.contains).toDouble / q.size
    assert(rate > 0.20 && rate < 0.30, s"P=0.25 rows kept at $rate")
    // a different salt draws a genuinely different sample
    assert(keep(7L) != k1)
    // zero weight never keeps
    val z = Sampling.weightedBernoulli(
      Seq((1L, 0L), (2L, 5L)).toDF("id", "w"), col("id"), col("w"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(z == Set(2L))
  }

  test("kFoldByGroup: one fold per group, folds in range, deterministic, rough balance") {
    val s = spark
    import s.implicits._
    val rows = (1L to 200L).flatMap(g => Seq((g, g * 10), (g, g * 10 + 1)))
    val df = rows.toDF("uid", "event")
    val out = Sampling.kFoldByGroup(df, "uid", k = 5)
    val byGroup = out.groupBy(col("uid"))
      .agg(countDistinct(col("fold")).as("nf"), first(col("fold")).as("f"))
      .collect()
    assert(byGroup.forall(_.getLong(1) == 1L), "a group must never straddle folds")
    val folds = byGroup.map(_.getLong(2))
    assert(folds.forall(f => f >= 0 && f < 5))
    // all 5 folds used, none empty or dominant at 200 groups
    val sizes = folds.groupBy(identity).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(sizes.values.min > 10 && sizes.values.max < 100)
    // deterministic across invocations
    val again = Sampling.kFoldByGroup(df, "uid", k = 5)
      .select("uid", "fold").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byGroup.map(r => r.getLong(0) -> r.getLong(2)).toMap == again)
  }
}
