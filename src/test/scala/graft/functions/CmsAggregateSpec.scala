package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class CmsAggregateSpec extends SparkSpec {

  test("bucket: locked hash vector (the oracle re-derives this exact value)") {
    // fnv1a64("a0") mod 16, unsigned — computed once and pinned so
    // any kernel change that would silently break the DuckDB oracle fails here
    val b = CmsSketch.bucket(UTF8String.fromString("a"), 0, 16)
    val bytes = Array[Byte]('a', 0x01, '0')
    val expect = java.lang.Long.remainderUnsigned(GraftHash.fnv1a64(bytes), 16L).toInt
    assert(b == expect)
    assert(b >= 0 && b < 16)
    // rows give independent buckets (not all equal for a sample term)
    val all = (0 until 4).map(r => CmsSketch.bucket(UTF8String.fromString("join"), r, 16))
    assert(all.distinct.size > 1)
  }

  test("estimates never undercount; exact when a term has no collisions") {
    val s = spark
    import s.implicits._
    val terms = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq("z")).toDF("term")
    // width 2: collisions guaranteed among 3 distinct terms
    val sk = terms.agg(CmsFunctions.cmsSketch(col("term"), 4, 2).as("sk"))
    val est = terms.distinct().crossJoin(sk)
      .select(col("term"), CmsFunctions.cmsEstimate(col("sk"), col("term"), 4, 2).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Map("x" -> 5L, "y" -> 3L, "z" -> 1L)
    truth.foreach { case (t, n) => assert(est(t) >= n, s"undercount for $t") }
  }

  test("merge is exact: sketch of a repartitioned corpus is identical") {
    val s = spark
    import s.implicits._
    val terms = (1 to 500).map(i => s"t${i % 37}").toDF("term")
    def sketchOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(CmsFunctions.cmsSketch(col("term"), 4, 16).as("sk"))
        .collect()(0).getSeq[Long](0)
    assert(sketchOf(terms) == sketchOf(terms.repartition(7)))
  }

  test("sketch cells sum to depth × corpus size (nothing dropped)") {
    val s = spark
    import s.implicits._
    val terms = (1 to 100).map(i => s"w$i").toDF("term")
    val cells = terms.agg(CmsFunctions.cmsSketch(col("term"), 4, 16).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(cells.sum == 4L * 100)
    assert(cells.length == 64)
  }

  test("cmsInnerProduct: never under-counts the true join size; exact when collision-free") {
    val s = spark
    import s.implicits._
    // true join size = Σ_v fA(v)·fB(v): A = {x×3, y×2, z}, B = {x×2, z×4} → 6+4 = 10
    val a = (Seq.fill(3)("x") ++ Seq.fill(2)("y") ++ Seq("z")).toDF("k")
    val b = (Seq.fill(2)("x") ++ Seq.fill(4)("z")).toDF("k")
    def est(width: Int): Long = a.agg(CmsFunctions.cmsSketch(col("k"), 4, width).as("sa"))
      .crossJoin(b.agg(CmsFunctions.cmsSketch(col("k"), 4, width).as("sb")))
      .select(CmsFunctions.cmsInnerProduct(col("sa"), col("sb"), 4, width).cast("long"))
      .head().getLong(0)
    // wide sketch: 3 keys across 1024 buckets × 4 rows — collision-free
    // with overwhelming certainty → exactly 10
    assert(est(1024) == 10L)
    // tiny sketch: collisions only ADD mass, never subtract
    assert(est(2) >= 10L)
  }
}
