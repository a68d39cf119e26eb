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

  test("two racing publishers serialize through the merge's OCC: both batches exactly once, or one loud conflict") {
    val table = tmpDir("graft-wap-race-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "base")), table, Seq("k"), "ver", keepVersions = 5)
    // disjoint batches, DISTINCT stage names (same-name staging is a
    // loud branch-create collision by design — also asserted below)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Wap.WapResult]()
    val threads = Seq(
      ("wap_a", df((10L, 2L, "from-a"))),
      ("wap_b", df((20L, 2L, "from-b")))).map { case (stage, batch) =>
      new Thread(() => {
        try results.add(Wap.writeAuditPublish(batch, table, Seq("k"), "ver", audit,
          stage = stage, keepVersions = 5))
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(threads.forall(!_.isAlive), "publishers must terminate")
    import scala.jdk.CollectionConverters._
    val published = results.asScala.filter(_.published).toSeq
    // every failure must be the documented LOUD conflict, nothing silent
    errs.asScala.foreach(t => assert(
      t.isInstanceOf[java.util.ConcurrentModificationException] ||
        t.isInstanceOf[IllegalStateException],
      s"unexpected failure mode: $t"))
    assert(published.nonEmpty, "at least one publisher must land")
    val live = snap(UpsertWriter.read(spark, table))
    assert(live(1L) == ((1L, "base")))
    // a published batch's rows are present EXACTLY once; a conflicted
    // publisher's rows are absent entirely (no half-publish)
    if (errs.isEmpty) {
      assert(live.keySet == Set(1L, 10L, 20L), s"both batches exactly once: $live")
      // linear timeline: versions strictly consecutive
      val vs = UpsertWriter.versions(spark, table)
      assert(vs == (vs.head to vs.last), s"timeline must stay linear: $vs")
    } else {
      assert(live.keySet.size == 2, s"exactly one batch may land on a conflict: $live")
    }
    // same stage name refuses loudly up front — no silent double-stage
    Branching.create(spark, table, "wap_same")
    try intercept[IllegalStateException](Branching.create(spark, table, "wap_same"))
    finally Branching.deleteBranch(spark, table, "wap_same")
  }
}
