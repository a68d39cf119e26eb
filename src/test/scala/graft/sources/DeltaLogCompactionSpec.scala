package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Minor LOG COMPACTION (delta-spark's `<x>.<y>.compacted.json`): one
  * file carrying the reconciled actions of commits x..y, which the
  * reader substitutes for the span during snapshot replay. The
  * contract under test: replay through a span is byte-identical to
  * replaying the individual commits (file state, DVs, stats, schema,
  * domains), the span is PROVABLY taken (covered JSONs deleted
  * out-of-contract as instrumentation — real cleanup stays the
  * checkpoint's job), asOf inside a span refuses once the singles are
  * gone (mid-span granularity honestly unreconstructable), and
  * malformed/irrelevant spans never corrupt a read.
  */
class DeltaLogCompactionSpec extends SparkSpec {

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"g${i % 4}", i * 2L)).toDF("id", "grp", "v")
  }

  private def deleteCommit(table: String, v: Long): Unit = {
    val f = new java.io.File(s"$table/_delta_log", f"$v%020d.json")
    assert(f.delete(), s"fixture: could not delete commit $v")
    new java.io.File(s"$table/_delta_log", f".$v%020d.json.crc").delete(): Unit
  }

  test("replay through a span is identical; the span is provably taken; asOf honest") {
    val table = tmpDir("dlc-basic") + "/t"
    DeltaTableWriter.create(df(1 to 100), table): Unit // v0
    DeltaTableWriter.append(df(101 to 200), table): Unit // v1
    DeltaTableWriter.append(df(201 to 300), table): Unit // v2
    // v3: a DV delete — remove+re-add of the same paths; the span must
    // carry the RE-ADD with its final vector, not the stale state
    DeltaTableWriter.delete(spark, table, col("id") <= 50L): Unit
    DeltaTableWriter.append(df(301 to 400), table): Unit // v4
    val before = DeltaTableReader.snapshot(spark, table)
      .agg(sum("id"), count(lit(1))).head()
    DeltaTableWriter.compactLog(spark, table, 1L, 3L)
    // with every original present the result is unchanged
    assert(DeltaTableReader.snapshot(spark, table)
      .agg(sum("id"), count(lit(1))).head() == before)
    // delete the covered commits: only the compacted span can serve
    // them now — this read PROVES the span is replayed
    (1L to 3L).foreach(deleteCommit(table, _))
    val after = DeltaTableReader.snapshot(spark, table)
    assert(after.agg(sum("id"), count(lit(1))).head() == before)
    assert(after.where(col("id") <= 50L).count() == 0L, "the DV must ride the span")
    // version-pinned reads: the span END is reconstructable, a
    // MID-SPAN version is not (and says so)
    assert(DeltaTableReader.snapshotAsOf(spark, table, 4L).count() == 350L)
    val e = intercept[IllegalStateException](
      DeltaTableReader.snapshotAsOf(spark, table, 2L))
    assert(e.getMessage.contains("not contiguous"))
  }

  test("reconciliation: add-then-remove drops to a tombstone, domains tombstone through, schema rides") {
    val table = tmpDir("dlc-reconcile") + "/t"
    DeltaTableWriter.create(df(1 to 100), table, clusterBy = Seq("id")): Unit // v0 (domain set)
    DeltaTableWriter.append(df(101 to 200), table): Unit // v1
    // v2: drop the clustering domain, as an external engine could
    val domainRemove =
      """{"domainMetadata":{"domain":"delta.clustering","configuration":"",""" +
        """"removed":true}}"""
    val w = new java.io.PrintWriter(
      new java.io.File(s"$table/_delta_log", f"${2L}%020d.json"), "UTF-8")
    try w.println(domainRemove) finally w.close()
    // v3: OPTIMIZE — removes every pre-v3 file, adds compacted ones
    // (add-then-remove inside the span ⇒ pure tombstones)
    DeltaTableWriter.compact(spark, table, targetFiles = 2): Unit
    DeltaTableWriter.compactLog(spark, table, 1L, 3L)
    (1L to 3L).foreach(deleteCommit(table, _))
    val st = DeltaTableReader.snapshotState(spark, table)
    assert(st.domainMetadata.isEmpty,
      s"the domain REMOVAL must tombstone through the span: ${st.domainMetadata}")
    assert(DeltaTableReader.snapshot(spark, table).count() == 200L)
    assert(DeltaTableReader.snapshot(spark, table).agg(sum("id")).head().getLong(0) ==
      (1L to 200L).sum)
    // v1's files were added AND removed inside the span — none of
    // them may survive in the active set
    val active = st.active.map(_.path)
    assert(active.size == 2, s"only the OPTIMIZE output survives: $active")
  }

  test("txn watermarks survive through a span after the singles are lost") {
    val table = tmpDir("dlc-txn") + "/t"
    DeltaTableWriter.create(df(1 to 50), table,
      transaction = Some(("sink-app", 7L))): Unit
    DeltaTableWriter.append(df(51 to 100), table,
      transaction = Some(("sink-app", 8L))): Unit // v1
    DeltaTableWriter.append(df(101 to 150), table,
      transaction = Some(("sink-app", 9L))): Unit // v2
    DeltaTableWriter.append(df(151 to 200), table): Unit // v3
    assert(DeltaTableReader.lastTransactionVersion(spark, table, "sink-app")
      .contains(9L))
    DeltaTableWriter.compactLog(spark, table, 1L, 3L)
    (1L to 3L).foreach(deleteCommit(table, _))
    // the span is now the only copy of v1/v2's txn actions — a
    // dropped watermark would make the sink REPLAY batches 8 and 9
    assert(DeltaTableReader.lastTransactionVersion(spark, table, "sink-app")
      .contains(9L),
      "the compacted span must keep serving the app's watermark")
  }

  test("span selection: longest wins, pre-checkpoint spans ignored, singles preferred only when no span") {
    val table = tmpDir("dlc-select") + "/t"
    DeltaTableWriter.create(df(1 to 50), table): Unit
    (1 to 4).foreach(i => DeltaTableWriter.append(df(i * 50 + 1 to i * 50 + 50), table): Unit)
    val expect = DeltaTableReader.snapshot(spark, table)
      .agg(sum("id"), count(lit(1))).head()
    // two spans from the same start: 1..2 and 1..3 — the longest wins
    DeltaTableWriter.compactLog(spark, table, 1L, 2L)
    DeltaTableWriter.compactLog(spark, table, 1L, 3L)
    (1L to 3L).foreach(deleteCommit(table, _))
    assert(DeltaTableReader.snapshot(spark, table)
      .agg(sum("id"), count(lit(1))).head() == expect)
    // a checkpoint PAST the spans: replay starts behind them and the
    // stale spans are ignored, not mis-applied
    DeltaTableWriter.writeCheckpoint(spark, table): Unit
    DeltaTableWriter.append(df(251 to 300), table): Unit // v5
    val withMore = DeltaTableReader.snapshot(spark, table)
    assert(withMore.count() == 300L)
    assert(withMore.agg(sum("id")).head().getLong(0) == (1L to 300L).sum)
  }
}
