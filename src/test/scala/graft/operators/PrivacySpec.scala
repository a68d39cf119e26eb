package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {

  test("pseudonymize: joins survive masking; tokens deterministic; salts unlinkable") {
    val s = spark
    import s.implicits._
    val facts = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("uid", "payload")
    val dims = Seq((1L, "gold"), (2L, "basic"), (3L, "basic")).toDF("uid", "tier")
    val mf = Privacy.pseudonymize(facts, Seq("uid"), "s1")
    val md = Privacy.pseudonymize(dims, Seq("uid"), "s1")
    // join on tokens gives exactly the clear join's row multiset
    val joined = mf.join(md, "uid").groupBy(col("tier")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(joined == Map("gold" -> 2L, "basic" -> 1L))
    // same salt, same run -> identical tokens (deterministic)
    val again = Privacy.pseudonymize(facts, Seq("uid"), "s1")
    assert(mf.select("uid").collect().toSeq == again.select("uid").collect().toSeq)
    // a different salt yields a disjoint token space for these ids
    val other = Privacy.pseudonymize(dims, Seq("uid"), "s2")
    assert(mf.join(other, "uid").count() == 0L)
    // tokens are the documented kernel: fnv64("s1:<id>")
    val tok = mf.filter(col("payload") === "a").head.getLong(0)
    assert(tok == graft.functions.GraftHash.fnv1a64("s1:1".getBytes("UTF-8")))
  }

  test("pseudonymize: rejects empty column list and ':' in salt") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x")).toDF("uid", "p")
    intercept[IllegalArgumentException](Privacy.pseudonymize(df, Nil, "s"))
    intercept[IllegalArgumentException](Privacy.pseudonymize(df, Seq("uid"), "a:b"))
  }
}
