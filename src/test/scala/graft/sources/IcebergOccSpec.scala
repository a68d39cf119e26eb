package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Iceberg OPTIMISTIC CONCURRENCY for stale-sensitive commits
  * (iceberg.apache.org spec, commit validation): deletes/rewrites
  * whose manifests were computed against a PLANNED snapshot may
  * rebase over interleaved APPENDS (appends never conflict — the
  * re-read loop carries their manifests forward), but any interleaved
  * delete/replace/overwrite refuses loudly — it may have removed or
  * re-deleted the very rows the stale manifests were computed from.
  */
class IcebergOccSpec extends SparkSpec {

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"g${i % 3}", i * 2L)).toDF("id", "grp", "v")
  }

  test("a stale-planned delete rebases over an interleaved APPEND") {
    val table = tmpDir("iocc-append") + "/t"
    IcebergTableWriter.create(df(1 to 40), table): Unit
    val planned = IcebergTableReader.snapshotLog(spark, table)._2
    // a concurrent append lands after the plan
    IcebergTableWriter.append(df(41 to 80), table): Unit
    // the planned-against delete (no-op content: the validation is
    // what's under test) lands at the NEXT snapshot
    val newId = IcebergTableWriter.commitSnapshotGroups(spark, table,
      IcebergTableReader.snapshot(spark, table).schema, Nil,
      groups = Nil, operation = "delete", plannedAgainst = Some(planned))
    assert(newId > planned + 1)
    // both effects visible: the append's rows survive
    assert(IcebergTableReader.snapshot(spark, table).count() == 80L)
  }

  test("a stale-planned delete REFUSES over an interleaved DELETE") {
    val table = tmpDir("iocc-delete") + "/t"
    IcebergTableWriter.create(df(1 to 40), table): Unit
    val planned = IcebergTableReader.snapshotLog(spark, table)._2
    IcebergTableWriter.deleteDv(spark, table, col("id") <= 5): Unit
    val e = intercept[java.util.ConcurrentModificationException](
      IcebergTableWriter.commitSnapshotGroups(spark, table,
        IcebergTableReader.snapshot(spark, table).schema, Nil,
        groups = Nil, operation = "delete", plannedAgainst = Some(planned)))
    assert(e.getMessage.contains("concurrent") && e.getMessage.contains("stale"))
    // the winner's effect is intact
    assert(IcebergTableReader.snapshot(spark, table).count() == 35L)
  }

  test("the real ops still land back-to-back: each plans against the head it commits on") {
    val table = tmpDir("iocc-seq") + "/t"
    IcebergTableWriter.create(df(1 to 60), table): Unit
    IcebergTableWriter.deleteDv(spark, table, col("id") % 10 === 0): Unit
    IcebergTableWriter.deleteDv(spark, table, col("id") % 7 === 0): Unit
    val snap = IcebergTableReader.snapshot(spark, table)
    assert(snap.count() == (1 to 60).count(i => i % 10 != 0 && i % 7 != 0).toLong)
  }
}
