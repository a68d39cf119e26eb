package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextRankSpec extends SparkSpec {

  test("adjacencyEdges: canonical distinct pairs, both directions, no self-loops") {
    val df = docsDf(Seq(
      1L -> "a b a b",   // pairs (a,b) x3 -> one undirected edge
      2L -> "b c",
      3L -> "x x",       // self-loop dropped
      4L -> "solo"))     // no pair
    val edges = TextRank.adjacencyEdges(df)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges == Set(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")))
  }

  test("rank: one fixed-point iteration on a 3-node path matches hand arithmetic") {
    // path a - b - c: deg(a)=deg(c)=1, deg(b)=2
    val df = docsDf(Seq(1L -> "a b c"))
    val out = TextRank.rank(df, iterations = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s = TextRank.RankScale
    val contribFromB = (s * 85) / (100 * 2) // b splits over 2 neighbors
    val contribFromEnd = (s * 85) / (100 * 1)
    assert(out("a") == TextRank.Base + contribFromB)
    assert(out("c") == TextRank.Base + contribFromB)
    assert(out("b") == TextRank.Base + 2 * contribFromEnd)
  }

  test("rank: ten iterations are deterministic and hub outranks leaves") {
    // star: hub adjacent to 4 leaves (each doc contributes hub-leaf pairs)
    val df = docsDf(Seq(
      1L -> "hub l1 hub l2",
      2L -> "hub l3 hub l4"))
    val once = TextRank.rank(df, iterations = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val again = TextRank.rank(df, iterations = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(once == again, "fixed-point ranks must be bit-reproducible")
    // "hub l2 hub" also links l1-hub etc; hub has the max degree
    assert(Seq("l1", "l2", "l3", "l4").forall(l => once("hub") > once(l)))
  }

  test("rank: local and distributed paths are bit-identical") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(40)
    val local = TextRank.rank(docs, iterations = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dist = TextRank.rank(docs, iterations = 4, maxLocalEdges = 0)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(local == dist)
  }

  test("rank: total mass stays near n*scale (sanity against overflow/drift)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val out = TextRank.rank(docs, iterations = 3)
    val n = out.count()
    val total = out.agg(sum(col("rank"))).head().getLong(0)
    // damping leaks floor-division remainders only: within 16% of n*1.0
    assert(math.abs(total - n * TextRank.RankScale).toDouble / (n * TextRank.RankScale) < 0.16)
  }
}
