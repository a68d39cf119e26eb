package graft.operators

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {

  test("rrfFuse: hand-computed quantized fusion, union semantics, doc_id tie-break") {
    val s = spark
    import s.implicits._
    // scale 1e6, rrfK 60: rank 1 -> 16393, rank 2 -> 16129, rank 3 -> 15873
    val lex = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rk")
    val sem = Seq((2L, 1), (4L, 2)).toDF("doc_id", "rk")
    val out = Retrieval.rrfFuse(Seq(lex, sem), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(out == Seq(
      (2L, 32522L, 2L, 1), // both legs: 16129 + 16393
      (1L, 16393L, 1L, 2),
      (4L, 16129L, 1L, 3))) // ties with doc 1's leg count but lower score; doc 3 cut by k
  }

  test("rrfFuse: equal scores break ties by doc_id; single leg is identity ranking") {
    val s = spark
    import s.implicits._
    val leg = Seq((9L, 1), (4L, 1), (7L, 2)).toDF("doc_id", "rk")
    val out = Retrieval.rrfFuse(Seq(leg), k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(3))).toSeq
    assert(out == Seq((4L, 1), (9L, 2), (7L, 3)))
  }

  test("discounts: frozen fixed-point table matches hand-derived values") {
    assert(Retrieval.discounts(3) == Seq(1000000L, 630929L, 500000L))
    // rank 7: log2(8) = 3 exactly -> 333333
    assert(Retrieval.discounts(7).last == 333333L)
  }

  test("ndcgAtK: hand-computed DCG/IDCG/ndcg/rr; unjudged query reports zeros") {
    val s = spark
    import s.implicits._
    val run = Seq(
      (1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3), // q1: d1,d2,d3
      (2L, 5L, 1), (2L, 6L, 2)) // q2: nothing judged
      .toDF("query_id", "doc_id", "rk")
    val qrels = Seq(
      (1L, 1L, 1), (1L, 3L, 2), (1L, 9L, 2), // d9 relevant but missed
      (1L, 4L, 0)) // rel 0 = non-relevant, ignored
      .toDF("query_id", "doc_id", "rel")
    val out = Retrieval.ndcgAtK(run, qrels, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1).toSeq
    // q1: DCG = 1*1000000 (d1@1) + 3*500000 (d3@3) = 2500000
    //     ideal = d3(2),d9(2),d1(1) -> 3*1000000 + 3*630929 + 1*500000 = 5392787
    //     ndcg = 25000000000 DIV 5392787 = 4635; rr = 1000000 DIV 1
    assert(out == Seq(
      (1L, 2500000L, 5392787L, 4635L, 1000000L, 2L, 3L),
      (2L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }
}
