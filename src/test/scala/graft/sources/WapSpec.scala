package graft.sources

import graft.SparkSpec
import graft.operators.QualityChecks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class WapSpec extends SparkSpec {

  private def df(rows: (Long, Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("k", "ver", "payload")
  }

  private def snap(d: DataFrame): Map[Long, (Long, String)] =
    d.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  private def audit(staged: DataFrame): Seq[DataFrame] = Seq(
    QualityChecks.notNull(staged, "payload", "payload_not_null"),
    QualityChecks.unique(staged, Seq("k"), "key_unique"))

  test("clean batch: stages, passes audit, publishes as one main commit; stage branch gone") {
    val table = tmpDir("graft-wap-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "a"), (2L, 1L, "b")), table, Seq("k"), "ver")
    val r = Wap.writeAuditPublish(df((2L, 2L, "B"), (3L, 2L, "new")), table,
      Seq("k"), "ver", audit)
    assert(r.published && r.version.contains(2))
    assert(r.audit.map(a => (a._1, a._2, a._3)).toSet ==
      Set(("payload_not_null", 0L, true), ("key_unique", 0L, true)))
    assert(snap(UpsertWriter.read(spark, table)) ==
      Map(1L -> ((1L, "a")), 2L -> ((2L, "B")), 3L -> ((2L, "new"))))
    // staging branch cleaned up -> the name is reusable immediately
    Branching.create(spark, table, "wap_stage")
    Branching.deleteBranch(spark, table, "wap_stage")
  }

  test("failing batch: audit rejects, main untouched, no version consumed") {
    val table = tmpDir("graft-wap-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "a"), (2L, 1L, "b")), table, Seq("k"), "ver")
    val before = snap(UpsertWriter.read(spark, table))
    val bad = df((2L, 2L, "B")).unionByName(
      df((3L, 2L, "x")).withColumn("payload", lit(null).cast("string")))
    val r = Wap.writeAuditPublish(bad, table, Seq("k"), "ver", audit)
    assert(!r.published && r.version.isEmpty)
    assert(r.audit.contains(("payload_not_null", 1L, false)))
    assert(snap(UpsertWriter.read(spark, table)) == before)
    // next clean WAP still lands as v2: the rejected run burned nothing
    val r2 = Wap.writeAuditPublish(df((4L, 2L, "ok")), table, Seq("k"), "ver", audit)
    assert(r2.published && r2.version.contains(2))
  }
}
