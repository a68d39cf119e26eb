package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SafeJoinSpec extends SparkSpec {

  test("estimate never undercounts; guarded join passes under the bound and matches the plain join") {
    val s = spark
    import s.implicits._
    // 100 keys x (3 left, 4 right) = 1200 true join rows
    val a = (1L to 100L).flatMap(k => Seq.fill(3)(k)).toDF("k").withColumn("av", col("k") * 2)
    val b = (1L to 100L).flatMap(k => Seq.fill(4)(k)).toDF("k").withColumn("bv", col("k") * 3)
    val est = SafeJoin.estimateJoinSize(a, b, "k")
    assert(est >= 1200L, s"AGMS estimate must never undercount, got $est")
    assert(est <= 2400L, s"estimate wildly high for w=2048 at 100 keys: $est")
    val got = SafeJoin.guardedEquiJoin(a, b, "k", maxRows = 5000L)
    val want = a.join(b, "k")
    assert(got.count() == 1200L)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("an exploding join is refused loudly before any shuffle") {
    val s = spark
    import s.implicits._
    // one hot key on both sides: 1000 x 1000 = 1e6 rows
    val a = (1L to 1000L).map(_ => 7L).toDF("k")
    val b = (1L to 1000L).map(_ => 7L).toDF("k")
    val e = intercept[IllegalStateException] {
      SafeJoin.guardedEquiJoin(a, b, "k", maxRows = 100000L)
    }
    assert(e.getMessage.contains("exceeds maxRows"))
    intercept[IllegalArgumentException](SafeJoin.guardedEquiJoin(a, b, "k", maxRows = 0L))
  }

  test("auto width: a 150k-key join passes with NO explicit width where w=2048 falsely refused") {
    // the sf0.1 lesson as a spec: at 150k distinct keys the old fixed
    // default put ~73 keys in every cell — collision mass alone
    // estimated a 150k-row join in the tens of millions (loud FALSE
    // refusal). The KMV-sized width keeps cells sparse.
    val a = spark.range(1, 150001).select(col("id").as("k"), (col("id") * 2).as("av"))
    val b = spark.range(1, 150001).select(col("id").as("k"), (col("id") * 3).as("bv"))
    // fixed narrow width: all-noise estimate, loud refusal of a fine join
    val eNarrow = SafeJoin.estimateJoinSize(a, b, "k", d = 4, w = 2048)
    assert(eNarrow > 1000000L, s"fixture broken: narrow width should be all-noise, got $eNarrow")
    intercept[IllegalStateException](
      SafeJoin.guardedEquiJoin(a, b, "k", maxRows = 1000000L, d = 4, w = 2048))
    // auto width: estimate lands near truth, join runs
    val eAuto = SafeJoin.estimateJoinSize(a, b, "k")
    assert(eAuto >= 150000L, s"never-undercount violated: $eAuto")
    assert(eAuto <= 1000000L, s"auto width still too noisy: $eAuto")
    assert(SafeJoin.guardedEquiJoin(a, b, "k", maxRows = 1000000L).count() == 150000L)
  }

  test("single-job auto width picks the SAME width as two per-side KMV jobs (estimate bit-unchanged)") {
    val s = spark
    import s.implicits._
    // asymmetric cardinalities so max() direction matters
    val a = (1L to 40000L).toDF("k")
    val b = ((1L to 900L) ++ (1L to 900L)).toDF("k")
    // the pre-r13 two-job width, computed exactly as SafeJoin.autoWidth
    // used to: one KMV action per side, then nextPow2(4 * max)
    def kmvOf(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(graft.functions.KmvFunctions.kmv_distinct(
        xxhash64(col("k").cast("string")), 256).as("d")).head().getLong(0)
    val twoJob = {
      var w = 2048L
      val n = 4L * math.max(kmvOf(a), kmvOf(b))
      while (w < n && w < (1L << 26)) w <<= 1
      w.toInt
    }
    val viaAuto = SafeJoin.estimateJoinSize(a, b, "k") // single tagged-union job inside
    val viaExplicit = SafeJoin.estimateJoinSize(a, b, "k", w = twoJob)
    assert(viaAuto == viaExplicit,
      s"single-job auto width must reproduce the two-job estimate bit-for-bit: " +
        s"auto=$viaAuto explicit(w=$twoJob)=$viaExplicit")
  }

  test("sparse cell plan computes EXACTLY the dense kernel's estimate at the same (d, w)") {
    val s = spark
    import s.implicits._
    // skewed multiplicities + disjoint key ranges so both collision
    // mass and zero-overlap cells exist; w chosen to straddle the
    // dense/sparse threshold in both directions at the same width
    val a = ((1L to 400L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k)) ++ Seq.fill(50)(9999L)).toDF("k")
    val b = ((200L to 600L).flatMap(k => Seq.fill((k % 3 + 1).toInt)(k)) ++ Seq.fill(40)(9999L)).toDF("k")
    for (w <- Seq(1 << 12, 1 << 17)) {
      val dense = {
        val ka = a.select(col("k").cast("string").as("_k"))
          .agg(graft.functions.CmsFunctions.cmsSketch(col("_k"), 4, w).as("ska"))
        val kb = b.select(col("k").cast("string").as("_k"))
          .agg(graft.functions.CmsFunctions.cmsSketch(col("_k"), 4, w).as("skb"))
        ka.crossJoin(kb)
          .select(graft.functions.CmsFunctions.cmsInnerProduct(col("ska"), col("skb"), 4, w)
            .cast("long")).head().getLong(0)
      }
      val viaApi = SafeJoin.estimateJoinSize(a, b, "k", d = 4, w = w)
      assert(viaApi == dense,
        s"w=$w: estimateJoinSize ($viaApi) must equal the dense kernel ($dense) bit-for-bit")
    }
    // zero-overlap sides: the sparse inner join is empty and the
    // estimate must be 0 (null-safe), not a crash or a phantom count
    val disj1 = (1L to 500L).toDF("k")
    val disj2 = (100000L to 100500L).toDF("k")
    val z = SafeJoin.estimateJoinSize(disj1, disj2, "k", d = 4, w = 1 << 17)
    assert(z >= 0L && z <= 5L, s"disjoint sides should estimate ~0, got $z")
  }

  test("property: sparse == dense and never-undercount over random skewed inputs") {
    val s = spark
    import s.implicits._
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed * 15485863L)
      def side() = {
        val keys = 1 + rnd.nextInt(300)
        (1 to 200 + rnd.nextInt(400)).map(_ => rnd.nextInt(keys).toLong)
      }
      val (xs, ys) = (side(), side())
      val a = xs.toDF("k"); val b = ys.toDF("k")
      val truth = {
        val fa = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val fb = ys.groupBy(identity).view.mapValues(_.size.toLong).toMap
        fa.keys.map(k => fa(k) * fb.getOrElse(k, 0L)).sum
      }
      val w = 1 << (17 + rnd.nextInt(3)) // always the sparse path
      val sparse = SafeJoin.estimateJoinSize(a, b, "k", d = 4, w = w)
      val dense = {
        val ka = a.select(col("k").cast("string").as("_k"))
          .agg(graft.functions.CmsFunctions.cmsSketch(col("_k"), 4, w).as("ska"))
        val kb = b.select(col("k").cast("string").as("_k"))
          .agg(graft.functions.CmsFunctions.cmsSketch(col("_k"), 4, w).as("skb"))
        ka.crossJoin(kb)
          .select(graft.functions.CmsFunctions.cmsInnerProduct(col("ska"), col("skb"), 4, w)
            .cast("long")).head().getLong(0)
      }
      assert(sparse == dense, s"seed=$seed w=$w sparse=$sparse dense=$dense")
      assert(sparse >= truth, s"seed=$seed undercount: est=$sparse truth=$truth")
    }
  }
}
