package graft.operators

import graft.SparkSpec

class TrigramIndexSpec extends SparkSpec {

  test("search matches the exact contains() scan on real docs") {
    val docs = graft.sources.TableLoader.table(spark, sfDir, "documents")
    for (needle <- Seq("merge batch", "zzz nothing matches", "ab")) {
      val viaIndex = TrigramIndex.search(docs, needle)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      val viaScan = docs.filter(org.apache.spark.sql.functions.col("text").contains(needle))
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(viaIndex == viaScan, s"needle '$needle'")
    }
  }

  test("postings: short docs produce no trigrams, 3-char docs exactly one") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "ab"), (2L, "abc"), (3L, "abab")).toDF("doc_id", "text")
    val p = TrigramIndex.postings(docs)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(p == Seq((2L, "abc"), (3L, "aba"), (3L, "bab")))
  }

  test("candidate pruning touches only needle-trigram postings") {
    val s = spark
    import s.implicits._
    // a doc sharing SOME but not all trigrams must not reach the verify
    val docs = Seq((1L, "hello world"), (2L, "hello there"), (3L, "cold war")).toDF("doc_id", "text")
    val hits = TrigramIndex.search(docs, "hello w")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(hits == Seq(1L))
  }
}
