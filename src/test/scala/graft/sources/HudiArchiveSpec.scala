package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Archived-timeline contract: instants rotated into
  * `.hoodie/archived` (the [[HudiTableWriter.archiveTimeline]]
  * service, Hudi-log-container archives) replay UNDER the active
  * timeline — file groups written ONLY by archived instants stay
  * visible to every read path; corrupt archives refuse loudly.
  */
class HudiArchiveSpec extends SparkSpec {

  private def df(r: Range, v: Long => Long = _ * 2L) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"k$i", v(i.toLong))).toDF("id", "key", "v")
  }

  test("COW: archived create-commit's file groups stay visible; incremental and as-of replay") {
    val table = tmpDir("harc-cow") + "/t"
    val c1 = HudiTableWriter.create(df(1 to 40), table, recordKeys = Seq("id"))
    val c2 = HudiTableWriter.append(df(41 to 60), table)
    val c3 = HudiTableWriter.append(df(61 to 70), table)
    val n = HudiTableWriter.archiveTimeline(spark, table, keepLast = 1)
    assert(n == 2, s"two of three instants must archive, got $n")
    // the active listing no longer carries the archived instants
    val hoodie = new java.io.File(s"$table/.hoodie").listFiles().map(_.getName)
    assert(!hoodie.contains(s"$c1.commit") && !hoodie.contains(s"$c2.commit"))
    assert(hoodie.contains(s"$c3.commit"))
    assert(new java.io.File(s"$table/.hoodie/archived").listFiles().nonEmpty)
    // the create commit's file groups are reachable ONLY through the
    // archive now — the snapshot must still serve all 70 rows
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.count() == 70L)
    assert(snap.where(col("id") === 5L).head().getAs[Long]("v") == 10L)
    // incremental pull from an ARCHIVED checkpoint still replays
    assert(HudiTableReader.incrementalSince(spark, table, c1).count() == 30L)
    // point-in-time as-of an archived instant
    assert(HudiTableReader.snapshotAsOf(spark, table, c2).count() == 60L)
    // a second archival round stacks a second archive file
    HudiTableWriter.append(df(71 to 80), table): Unit
    assert(HudiTableWriter.archiveTimeline(spark, table, keepLast = 1) == 1)
    assert(HudiTableReader.snapshot(spark, table).count() == 80L)
    assert(new java.io.File(s"$table/.hoodie/archived").listFiles()
      .count(_.getName.startsWith(".commits_.archive.")) == 2)
  }

  test("COW: upsert across the archival horizon keeps carried stamps exact") {
    val table = tmpDir("harc-ups") + "/t"
    val c1 = HudiTableWriter.create(df(1 to 30), table, recordKeys = Seq("id"))
    HudiTableWriter.archiveTimeline(spark, table, keepLast = 1): Unit
    // no-op when everything is within keepLast
    assert(HudiTableWriter.archiveTimeline(spark, table, keepLast = 5) == 0)
    val c2 = HudiTableWriter.upsert(df(10 to 15, _ * 100L), table)
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.count() == 30L)
    assert(snap.where(col("id") === 12L).head().getAs[Long]("v") == 1200L)
    // carried rows keep the ARCHIVED create instant's stamp
    assert(snap.where(col("id") === 5L).head()
      .getAs[String]("_hoodie_commit_time") == c1)
    assert(HudiTableReader.incrementalSince(spark, table, c1).count() == 6L)
    assert(snap.where(col("id") === 12L).head()
      .getAs[String]("_hoodie_commit_time") == c2)
  }

  test("MOR: archived deltacommits replay into the real-time view") {
    val s = spark
    import s.implicits._
    val table = tmpDir("harc-mor") + "/t"
    val c1 = HudiTableWriter.createMor(df(1 to 20), table, recordKeys = Seq("id"))
    HudiTableWriter.updateLog(Seq((3L, "k3", 333L)).toDF("id", "key", "v"), table): Unit
    HudiTableWriter.updateLog(Seq((7L, "k7", 777L)).toDF("id", "key", "v"), table): Unit
    assert(HudiTableWriter.archiveTimeline(spark, table, keepLast = 1) == 2)
    val rt = HudiTableReader.snapshot(spark, table)
    assert(rt.count() == 20L)
    assert(rt.where($"id" === 3L).head().getAs[Long]("v") == 333L)
    assert(rt.where($"id" === 7L).head().getAs[Long]("v") == 777L)
    // the MOR incremental pull replays from an ARCHIVED checkpoint:
    // pulling since the archived create instant yields the two log
    // updates (their deltacommits are archived too)
    val inc = HudiTableReader.incrementalSince(spark, table, c1)
    assert(inc.count() == 2L)
    assert(inc.where($"id" === 3L).head().getAs[Long]("v") == 333L)
  }

  test("a table REBUILT at the same path never serves the old table's memoized archive") {
    // the bench caught this: archives of a rebuilt table collide on
    // name AND length (fixed-width instants/fileIds), so a
    // content-blind memo replayed the OLD timeline over the new files
    val table = tmpDir("harc-rebuild") + "/t"
    def build(values: Long => Long): Unit = {
      HudiTableWriter.create(df(1 to 40, values), table, recordKeys = Seq("id")): Unit
      HudiTableWriter.append(df(41 to 60, values), table): Unit
      HudiTableWriter.archiveTimeline(spark, table, keepLast = 1): Unit
    }
    build(_ * 2L)
    assert(HudiTableReader.snapshot(spark, table).count() == 60L) // memo primed
    // wipe and rebuild the SAME path — shape-identical, same archive
    // file name, same length class
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(table))
    Thread.sleep(5) // a same-millisecond rebuild is not the claim here
    build(_ * 3L)
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.count() == 60L)
    assert(snap.where(col("id") === 5L).head().getAs[Long]("v") == 15L,
      "the rebuilt table's rows must serve — not the old memoized timeline's")
  }

  test("corrupt archive file refuses loudly; crash-window duplicate instants dedupe") {
    val table = tmpDir("harc-corrupt") + "/t"
    HudiTableWriter.create(df(1 to 10), table, recordKeys = Seq("id")): Unit
    val c2 = HudiTableWriter.append(df(11 to 20), table)
    // simulate the crash window: archive landed but one active meta
    // file survived — copy it back after archiving
    val metaDir = new java.io.File(s"$table/.hoodie")
    val c2Bytes = java.nio.file.Files.readAllBytes(
      new java.io.File(metaDir, s"$c2.commit").toPath)
    HudiTableWriter.archiveTimeline(spark, table, keepLast = 1): Unit
    java.nio.file.Files.write(new java.io.File(metaDir, s"$c2.commit").toPath, c2Bytes)
    assert(HudiTableReader.snapshot(spark, table).count() == 20L,
      "an instant present both active and archived must serve once")
    // now corrupt the archive — every read must refuse, not miss rows
    val arch = new java.io.File(s"$table/.hoodie/archived").listFiles().head
    java.nio.file.Files.write(arch.toPath, "not a hudi log".getBytes("UTF-8"))
    intercept[Exception](HudiTableReader.snapshot(spark, table).count())
  }
}
