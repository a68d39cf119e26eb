package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class GraphAnalyticsSpec extends SparkSpec {

  private def tri(edges: DataFrame): Set[(Long, Long, Long)] =
    GraphAnalytics.triangles(edges, "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def naive(edges: DataFrame): Set[(Long, Long, Long)] = {
    val e = edges.select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    e.as("p1")
      .join(e.as("p2"), col("p2.a") === col("p1.b"))
      .join(e.as("p3"), col("p3.a") === col("p1.a") && col("p3.b") === col("p2.b"))
      .select(col("p1.a"), col("p1.b"), col("p2.b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("K4 has 4 triangles; paths and stars have none") {
    val s = spark
    import s.implicits._
    val k4 = (for { i <- 1L to 4L; j <- 1L to 4L if i < j } yield (i, j)).toDF("u", "v")
    assert(tri(k4) == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    assert(tri(path).isEmpty)
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("u", "v")
    assert(tri(star).isEmpty)
  }

  test("orientation/duplicate noise is normalized away") {
    val s = spark
    import s.implicits._
    // triangle {1,2,3} given with mixed orientations, dupes and a self-loop
    val messy = Seq((2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L), (1L, 1L), (2L, 1L))
      .toDF("u", "v")
    assert(tri(messy) == Set((1L, 2L, 3L)))
  }

  test("degree-ordered enumeration matches the naive 3-way join on a hub-heavy graph") {
    val s = spark
    import s.implicits._
    // one hub (0) connected to everything + a pseudo-random sparse layer:
    // exercises orientation under extreme degree skew and degree ties
    val hub = (1L to 40L).map(i => (0L, i))
    val rnd = (1L to 40L).flatMap(i => (i + 1 to 40L).filter(j => (i * 7919 + j * 104729) % 11 == 0).map(j => (i, j)))
    val edges = (hub ++ rnd).toDF("u", "v")
    val got = tri(edges)
    assert(got == naive(edges))
    assert(got.nonEmpty)
    // every reported triple is ascending
    assert(got.forall { case (x, y, z) => x < y && y < z })
  }

  /** Reference peel: in-memory iterate-to-fixpoint k-core. */
  private def refKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    edges.foreach { case (a, b) =>
      if (a != b) {
        adj.getOrElseUpdate(a, scala.collection.mutable.Set()) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.Set()) += a
      }
    }
    var changed = true
    while (changed) {
      val bad = adj.collect { case (n, ns) if ns.size < k => n }.toSeq
      changed = bad.nonEmpty
      bad.foreach { n => adj(n).foreach(m => adj(m) -= n); adj -= n }
    }
    adj.map { case (n, ns) => n -> ns.size }.toMap
  }

  private def core(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    GraphAnalytics.kCore(edges.toDF("u", "v"), "u", "v", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("kCore: cascading multi-round peel matches the reference fixpoint") {
    // chain 1-2-3-4-5 hanging off a 4-clique {10,11,12,13}: the 2-core
    // must shed the chain one node per round (5 cascading rounds) and
    // keep exactly the clique
    val clique = Seq((10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L))
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 10L))
    val edges = clique ++ chain
    val got = core(edges, 2)
    assert(got == refKCore(edges, 2).map { case (n, d) => n -> d.toLong })
    assert(got.keySet == Set(10L, 11L, 12L, 13L))
    assert(got.values.forall(_ >= 2))
    // k=3: the clique survives intact; k=4: empty
    assert(core(edges, 3).keySet == Set(10L, 11L, 12L, 13L))
    assert(core(edges, 4).isEmpty)
  }

  test("kCore: duplicate/reversed/self edges are cleaned; random graph matches reference") {
    val dirty = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L), (1L, 3L))
    assert(core(dirty, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    for (k <- Seq(2, 3, 4))
      assert(core(edges, k) == refKCore(edges, k).map { case (n, d) => n -> d.toLong }, s"k=$k")
  }

  test("linkPrediction: hand-computed scores on a path+star; adjacent pairs excluded") {
    val s = spark
    import s.implicits._
    // path 1-2-3-4 plus 5 attached to 2: deg = 1:1, 2:3, 3:2, 4:1, 5:1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L)).toDF("u", "v")
    val got = GraphAnalytics.linkPrediction(edges, "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // non-adjacent pairs sharing a neighbor:
    //   (1,3) via 2 (deg 3): cn=1 ra=333333 pa=1*2
    //   (1,5) via 2:         cn=1 ra=333333 pa=1*1
    //   (3,5) via 2:         cn=1 ra=333333 pa=2*1
    //   (2,4) via 3 (deg 2): cn=1 ra=500000 pa=3*1
    assert(got == Map(
      (1L, 3L) -> (1L, 333333L, 2L),
      (1L, 5L) -> (1L, 333333L, 1L),
      (3L, 5L) -> (1L, 333333L, 2L),
      (2L, 4L) -> (1L, 500000L, 3L)))
    // duplicate/reversed/self edges clean identically
    val dirty = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (5L, 2L), (4L, 4L)).toDF("u", "v")
    val got2 = GraphAnalytics.linkPrediction(dirty, "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == got.keySet)
  }

  test("linkPrediction: hub cap fails loudly by default, dropHubs bounds the wedge join") {
    val s = spark
    import s.implicits._
    // star center 0 with 5 leaves, plus a pendant 6 hanging off leaf 4
    val star = (1L to 5L).map(l => (0L, l)) :+ (4L, 6L)
    val edges = star.toDF("u", "v")
    val e = intercept[Exception] {
      GraphAnalytics.linkPrediction(edges, "u", "v", maxCenterDegree = 4).collect()
    }
    assert(e.getMessage.contains("maxCenterDegree")
      || Option(e.getCause).exists(_.getMessage.contains("maxCenterDegree")))
    // dropHubs: the star center (deg 5) is excluded as a CENTER, so
    // only wedges through leaf 4 (deg 2) remain: (0,6) — the pair
    // (x,y) keeps the hub as an ENDPOINT, only centering is capped
    val got = GraphAnalytics.linkPrediction(edges, "u", "v", maxCenterDegree = 4, dropHubs = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map((0L, 6L) -> (1L, 500000L, 5L)))
  }
}
