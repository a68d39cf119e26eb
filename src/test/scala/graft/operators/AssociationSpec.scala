package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AssociationSpec extends SparkSpec {

  test("chi2Features: hand-computed 2x2 contingency, presence not counts") {
    val s = spark
    import s.implicits._
    // 4 docs: "cat" in both positive docs and neither negative → perfectly
    // associated; "dog" in one of each → independent; "cat cat" counts once
    val docs = Seq(
      (1L, "cat cat dog", true),
      (2L, "cat fish", true),
      (3L, "dog fish", false),
      (4L, "fish bird", false))
      .toDF("id", "text", "label")
    val out = Association.chi2Features(docs, col("id"), col("text"), col("label"), minDf = 1L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    // cat: a=2 b=0 c=0 d=2 → chi2 = 4*(4-0)^2/(2*2*2*2) = 4 → 40000
    assert(out("cat") == ((2L, 2L, Some(40000L))))
    // dog: a=1 b=1 c=1 d=1 → chi2 = 0
    assert(out("dog") == ((2L, 1L, Some(0L))))
    // fish: df=3, a=1 b=2 c=1 d=0 → chi2 = 4*(0-2)^2/(3*1*2*2) = 16/12 → 13333
    assert(out("fish") == ((3L, 1L, Some(13333L))))
    // bird: df=1 a=0 b=1 c=2 d=1 → chi2 = 4*(0-2)^2/(1*3*2*2) = 16/12 → 13333
    assert(out("bird") == ((1L, 0L, Some(13333L))))
  }

  test("chi2Features: minDf filters, NULL labels excluded, degenerate denominator → NULL") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "rare common", Some(true)),
      (2L, "common", Some(true)),
      (3L, "ghost word", Option.empty[Boolean]))
      .toDF("id", "text", "label")
    val out = Association.chi2Features(docs, col("id"), col("text"), col("label"), minDf = 2L)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // df-1 tokens gone; ghost doc (NULL label) contributes nothing
    assert(!out.contains("rare") && !out.contains("ghost") && !out.contains("word"))
    // all docs positive → (b+d)=0 → NULL, not a crash or divide error
    assert(out("common") == None)
  }

  test("pmiCollocations: hand-computed ratio; single-token docs add no bigrams") {
    val s = spark
    import s.implicits._
    // "a b" ×3, "b c" ×1 adjacency; plus a single-token doc
    val docs = Seq("a b", "a b", "a b c", "x").toDF("text")
    val out = Association.pmiCollocations(docs, col("text"), minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // bigrams: (a,b)x3, (b,c)x1 → M=4; unigrams: a=3 b=4(wait: b appears 4? docs: a b, a b, a b c, x → b ×3)
    // unigrams: a=3, b=3, c=1, x=1
    // (a,b): 3*4*10000/(3*3) = 13333 ; (b,c): 1*4*10000/(3*1) = 13333
    assert(out(("a", "b")) == ((3L, 13333L)))
    assert(out(("b", "c")) == ((1L, 13333L)))
    assert(out.size == 2)
  }
}
