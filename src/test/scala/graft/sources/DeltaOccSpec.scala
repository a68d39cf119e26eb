package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Delta OPTIMISTIC CONCURRENCY for non-append commits (delta.io
  * PROTOCOL.md ConflictChecker semantics under WriteSerializable):
  * a delete/upsert whose action lines were computed against a stale
  * snapshot may REBASE over a concurrent commit iff that commit
  * changed no metadata/protocol and touched none of the files this
  * commit removes — two interleaved writers on disjoint files both
  * land; overlapping pairs still refuse loudly. The race is replayed
  * deterministically at the commit layer: lines computed against
  * snapshot v, the CAS target taken by a concurrent commit, then the
  * stale lines submitted.
  */
class DeltaOccSpec extends SparkSpec {

  // one file per batch so "the file" is a deterministic unit
  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"g${i % 3}", i * 2L)).toDF("id", "grp", "v").coalesce(1)
  }

  private def removeLine(path: String): String =
    s"""{"remove":{"path":"$path","deletionTimestamp":1,"dataChange":true}}"""

  test("a stale delete rebases over a concurrent DISJOINT append — both commits land") {
    val table = tmpDir("occ-disjoint") + "/t"
    DeltaTableWriter.create(df(1 to 40), table): Unit          // v0: file A
    val staleState = DeltaTableReader.snapshotState(spark, table)
    val fileA = staleState.active.head.path
    // writer 2 wins the race: a blind append of file B at v1
    DeltaTableWriter.append(df(41 to 80), table): Unit
    // writer 1 submits lines computed against v0, targeting v1
    val won = DeltaTableWriter.commit(spark, table, staleState.version + 1,
      Seq(removeLine(fileA)), rebaseSafe = false, rebaseDisjoint = true)
    assert(won == staleState.version + 2, "the rebase must land at the NEXT free version")
    // both effects hold: A's rows gone, B's rows present
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.count() == 40L)
    assert(snap.agg(min(col("id"))).head().getLong(0) == 41L)
  }

  test("a stale delete REFUSES over a concurrent commit touching the same file") {
    val table = tmpDir("occ-overlap") + "/t"
    DeltaTableWriter.create(df(1 to 40), table): Unit
    val staleState = DeltaTableReader.snapshotState(spark, table)
    val fileA = staleState.active.head.path
    // writer 2 wins with a DV delete ON file A (remove+re-add A)
    DeltaTableWriter.delete(spark, table, col("id") <= 5): Unit
    val e = intercept[java.util.ConcurrentModificationException](
      DeltaTableWriter.commit(spark, table, staleState.version + 1,
        Seq(removeLine(fileA)), rebaseSafe = false, rebaseDisjoint = true))
    assert(e.getMessage.contains("conflicts"))
    // the winner's effect is intact
    assert(DeltaTableReader.snapshot(spark, table).count() == 35L)
  }

  test("a concurrent METADATA change blocks the rebase even on disjoint files") {
    val table = tmpDir("occ-meta") + "/t"
    DeltaTableWriter.create(df(1 to 40), table): Unit
    val staleState = DeltaTableReader.snapshotState(spark, table)
    val fileA = staleState.active.head.path
    // writer 2 wins with a metadata-bearing commit (the schema-
    // evolution shape) touching NO files at all
    DeltaTableWriter.commit(spark, table, staleState.version + 1,
      Seq("""{"metaData":{"id":"occ-meta","format":{"provider":"parquet",""" +
        """"options":{}},"schemaString":"{}","partitionColumns":[],""" +
        """"configuration":{}}}""")): Unit
    val e = intercept[java.util.ConcurrentModificationException](
      DeltaTableWriter.commit(spark, table, staleState.version + 1,
        Seq(removeLine(fileA)), rebaseSafe = false, rebaseDisjoint = true))
    assert(e.getMessage.contains("conflicts"))
  }

  test("without rebaseDisjoint the stale commit still fails loudly on ANY lost race") {
    val table = tmpDir("occ-strict") + "/t"
    DeltaTableWriter.create(df(1 to 40), table): Unit
    val staleState = DeltaTableReader.snapshotState(spark, table)
    val fileA = staleState.active.head.path
    DeltaTableWriter.append(df(41 to 80), table): Unit // disjoint, but strict mode
    val e = intercept[java.util.ConcurrentModificationException](
      DeltaTableWriter.commit(spark, table, staleState.version + 1,
        Seq(removeLine(fileA)), rebaseSafe = false))
    assert(e.getMessage.contains("re-read the table"))
  }

  test("end-to-end: interleaved delete and upsert on DISJOINT files both land through the public ops") {
    val table = tmpDir("occ-e2e") + "/t"
    val s = spark
    import s.implicits._
    DeltaTableWriter.create(df(1 to 40), table): Unit   // file A
    DeltaTableWriter.append(df(41 to 80), table): Unit  // file B
    // seed the DV protocol upgrade (a one-time protocol line would
    // otherwise ride the racing upsert and conflict BY DESIGN)
    DeltaTableWriter.delete(spark, table, col("id") === 2L): Unit
    // two writers race the same base version; the harness can't pause
    // mid-op, so drive writer 1 through the commit layer with lines a
    // real delete WOULD compute (remove of file B), while writer 2's
    // upsert into file A's keys wins the CAS first
    val staleState = DeltaTableReader.snapshotState(spark, table)
    val beforeDv = staleState.active
      .map(f => f.path -> f.dv.map(_.pathOrInlineDv)).toMap
    DeltaTableWriter.upsert(Seq((1L, "g1", 999L)).toDF("id", "grp", "v"),
      table, keys = Seq("id")): Unit
    // the file the upsert did NOT touch (same path, same DV) is the
    // disjoint delete target
    val after = DeltaTableReader.snapshotState(spark, table)
    val untouched = after.active.filter(f =>
      beforeDv.get(f.path).contains(f.dv.map(_.pathOrInlineDv))).map(_.path)
    assert(untouched.nonEmpty)
    val fileB = untouched.head
    val won = DeltaTableWriter.commit(spark, table, staleState.version + 1,
      Seq(removeLine(fileB)), rebaseSafe = false, rebaseDisjoint = true)
    assert(won == staleState.version + 2)
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.where(col("id") === 1L).head().getAs[Long]("v") == 999L,
      "the upsert's effect must survive the rebased delete")
    assert(snap.where(col("id") > 40L).isEmpty || snap.count() < 80L)
  }

  // --- operation markers + winnerMustBeBlind (the MERGE rebase gate) ---

  private def commitInfoOf(table: String, v: Long): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$table/_delta_log", f"$v%020d.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    text.split('\n').find(_.contains("\"commitInfo\""))
  }

  test("appends stamp isBlindAppend=true; upserts stamp MERGE/isBlindAppend=false") {
    val table = tmpDir("occ-marker") + "/t"
    val s = spark
    import s.implicits._
    DeltaTableWriter.create(df(1 to 40), table): Unit
    val vA = DeltaTableWriter.append(df(41 to 80), table)
    val ciA = commitInfoOf(table, vA)
    assert(ciA.exists(_.contains(""""isBlindAppend":true""")), s"append commitInfo: $ciA")
    val vM = DeltaTableWriter.upsert(Seq((1L, "g1", 7L)).toDF("id", "grp", "v"),
      table, keys = Seq("id"))
    val ciM = commitInfoOf(table, vM)
    assert(ciM.exists(_.contains(""""operation":"MERGE"""")), s"upsert commitInfo: $ciM")
    assert(ciM.exists(_.contains(""""isBlindAppend":false""")))
  }

  test("a stale MERGE rebases over an AFFIRMED blind-append winner only") {
    val table = tmpDir("occ-blind") + "/t"
    DeltaTableWriter.create(df(1 to 40), table): Unit
    val staleState = DeltaTableReader.snapshotState(spark, table)
    // winner: a graft append — add-only AND marked isBlindAppend=true
    DeltaTableWriter.append(df(41 to 80), table): Unit
    // loser: an insert-only merge's lines (adds only) computed at v0
    val addLines = Seq(
      """{"add":{"path":"merge-ins.parquet","partitionValues":{},"size":1,""" +
        """"modificationTime":1,"dataChange":true}}""")
    val won = DeltaTableWriter.commit(spark, table, staleState.version + 1, addLines,
      rebaseSafe = false, rebaseDisjoint = true,
      opInfo = Some(("MERGE", false)), winnerMustBeBlind = true)
    assert(won == staleState.version + 2)
  }

  test("a stale MERGE REFUSES over an add-only winner that was ITSELF a merge") {
    // two racing upserts both inserting the same ABSENT key produce
    // add-only, file-disjoint commits — rebasing the loser would land
    // the key twice; the winner's isBlindAppend=false marker is what
    // refuses it (file-set disjointness alone cannot)
    val table = tmpDir("occ-mergewin") + "/t"
    val s = spark
    import s.implicits._
    DeltaTableWriter.create(df(1 to 40), table): Unit
    val staleState = DeltaTableReader.snapshotState(spark, table)
    // winner: a real upsert inserting key 999 (insert-only → add-only)
    DeltaTableWriter.upsert(Seq((999L, "g9", 1L)).toDF("id", "grp", "v"),
      table, keys = Seq("id")): Unit
    val addLines = Seq(
      """{"add":{"path":"merge-dup.parquet","partitionValues":{},"size":1,""" +
        """"modificationTime":1,"dataChange":true}}""")
    val e = intercept[java.util.ConcurrentModificationException](
      DeltaTableWriter.commit(spark, table, staleState.version + 1, addLines,
        rebaseSafe = false, rebaseDisjoint = true,
        opInfo = Some(("MERGE", false)), winnerMustBeBlind = true))
    assert(e.getMessage.contains("conflicts"))
  }

  test("an UNMARKED add-only winner refuses a MERGE rebase (no affirmation, no rebase)") {
    val table = tmpDir("occ-unmarked") + "/t"
    DeltaTableWriter.create(df(1 to 40), table): Unit
    val staleState = DeltaTableReader.snapshotState(spark, table)
    // winner: raw add-only lines with NO commitInfo — could be a
    // foreign writer's insert-only merge; ambiguity refuses
    DeltaTableWriter.commit(spark, table, staleState.version + 1, Seq(
      """{"add":{"path":"foreign.parquet","partitionValues":{},"size":1,""" +
        """"modificationTime":1,"dataChange":true}}""")): Unit
    val addLines = Seq(
      """{"add":{"path":"merge-x.parquet","partitionValues":{},"size":1,""" +
        """"modificationTime":1,"dataChange":true}}""")
    val e = intercept[java.util.ConcurrentModificationException](
      DeltaTableWriter.commit(spark, table, staleState.version + 1, addLines,
        rebaseSafe = false, rebaseDisjoint = true,
        opInfo = Some(("MERGE", false)), winnerMustBeBlind = true))
    assert(e.getMessage.contains("conflicts"))
  }

  test("an evolution-carrying append REFUSES a lost race against another evolution") {
    val table = tmpDir("occ-evo") + "/t"
    val s = spark
    import s.implicits._
    DeltaTableWriter.create(df(1 to 40), table): Unit
    val staleState = DeltaTableReader.snapshotState(spark, table)
    // winner: a concurrent evolution (metaData-bearing commit)
    DeltaTableWriter.commit(spark, table, staleState.version + 1,
      Seq("""{"metaData":{"id":"occ-evo","format":{"provider":"parquet",""" +
        """"options":{}},"schemaString":"{}","partitionColumns":[],""" +
        """"configuration":{}}}""")): Unit
    // loser: an append whose metaData was computed from the stale
    // snapshot — the append path's rebaseDisjoint refuses on the
    // winner's metaData line instead of silently re-landing ours
    val metaPlusAdd = Seq(
      """{"metaData":{"id":"stale-evo","format":{"provider":"parquet",""" +
        """"options":{}},"schemaString":"{}","partitionColumns":[],""" +
        """"configuration":{}}}""",
      """{"add":{"path":"evo.parquet","partitionValues":{},"size":1,""" +
        """"modificationTime":1,"dataChange":true}}""")
    val e = intercept[java.util.ConcurrentModificationException](
      DeltaTableWriter.commit(spark, table, staleState.version + 1, metaPlusAdd,
        rebaseSafe = false, rebaseDisjoint = true,
        opInfo = Some(("WRITE", false))))
    assert(e.getMessage.contains("conflicts"))
  }
}
