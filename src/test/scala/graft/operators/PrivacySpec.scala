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

  test("kAnonymityAudit and suppress: group sizes, flags, and the release invariant") {
    val s = spark
    import s.implicits._
    // QI = (zip, age band): zip 100 has 3 rows in band 2 (k=3 group),
    // zip 200 has 1 (singleton), zip 100 band 3 has 2
    val df = Seq(
      (1L, 100, 2), (2L, 100, 2), (3L, 100, 2),
      (4L, 100, 3), (5L, 100, 3),
      (6L, 200, 2)).toDF("id", "zip", "band")
    val audit = Privacy.kAnonymityAudit(df, Seq("zip", "band"), k = 3L)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(audit == Map(
      (100, 2) -> (3L, true), (100, 3) -> (2L, false), (200, 2) -> (1L, false)))
    // suppression drops exactly the under-k groups' rows
    val kept = Privacy.suppress(df, Seq("zip", "band"), k = 3L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L))
    // the release satisfies k-anonymity by construction
    val releaseAudit = Privacy.kAnonymityAudit(
      Privacy.suppress(df, Seq("zip", "band"), k = 2L), Seq("zip", "band"), k = 2L)
    assert(releaseAudit.filter(!col("anonymous")).count() == 0L)
  }

  test("pseudonymize: NULL identifiers stay NULL — never a shared stable pseudo-identity") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some("u1")), (2L, None), (3L, None), (4L, Some("u1")))
      .toDF("row_id", "uid")
    val masked = Privacy.pseudonymize(df, Seq("uid"), "epoch1")
    val out = masked.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(2).isEmpty && out(3).isEmpty,
      "null ids must stay null — a fingerprint(salt) token would join all unknowns together")
    assert(out(1).nonEmpty && out(1) == out(4), "non-null determinism unchanged")
  }

  test("pseudonymize: rejects empty column list and ':' in salt") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x")).toDF("uid", "p")
    intercept[IllegalArgumentException](Privacy.pseudonymize(df, Nil, "s"))
    intercept[IllegalArgumentException](Privacy.pseudonymize(df, Seq("uid"), "a:b"))
  }
}
