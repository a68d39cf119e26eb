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
}
