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
}
