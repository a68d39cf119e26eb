package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hudi COW upsert OPTIMISTIC CONCURRENCY: a commit landing between
  * the upsert's planning snapshot and its publish is safe iff it
  * touched none of the groups the upsert rewrote (untouched groups
  * never move) and is not a clustering replacecommit (which rewires
  * groups wholesale). Overlap refuses loudly before the meta file
  * lands — publishing would silently clobber the winner's slice.
  */
class HudiOccSpec extends SparkSpec {

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"k${i % 5}", i * 2L)).toDF("id", "key", "v")
  }

  test("disjoint interleaves pass; overlapping commits and clusterings refuse") {
    val table = tmpDir("hudi-occ") + "/t"
    val s = spark
    import s.implicits._
    HudiTableWriter.create(df(1 to 50), table, recordKeys = Seq("id")): Unit
    val plannedHead = HudiTableReader.latestInstant(spark, table)
    // writer 2 wins: an APPEND (new groups only) — disjoint from any
    // rewrite, the validation passes
    HudiTableWriter.append(df(51 to 100), table): Unit
    val appended = HudiTableReader.activeSlices(spark, table)
      .filter(_.instant > plannedHead).map(_.fileId).toSet
    val original = HudiTableReader.activeSlices(spark, table)
      .map(_.fileId).toSet -- appended
    HudiTableWriter.validateNoConcurrentOverlap(spark, table, plannedHead, original)
    // writer 2 wins with an UPSERT touching one of OUR groups → refuse
    val planned2 = HudiTableReader.latestInstant(spark, table)
    HudiTableWriter.upsert(Seq((42L, "k2", 999L)).toDF("id", "key", "v"), table): Unit
    val touched = HudiTableReader.activeSlices(spark, table)
      .filter(_.instant > planned2).map(_.fileId).toSet
    assert(touched.nonEmpty)
    val e1 = intercept[java.util.ConcurrentModificationException](
      HudiTableWriter.validateNoConcurrentOverlap(spark, table, planned2, touched))
    assert(e1.getMessage.contains("re-read and retry"))
    // but an upsert of OTHER groups passes the same check
    HudiTableWriter.validateNoConcurrentOverlap(spark, table, planned2,
      original -- touched)
    // a clustering replacecommit conflicts with EVERYTHING
    val planned3 = HudiTableReader.latestInstant(spark, table)
    HudiTableWriter.cluster(spark, table, targetGroups = 2): Unit
    val e2 = intercept[java.util.ConcurrentModificationException](
      HudiTableWriter.validateNoConcurrentOverlap(spark, table, planned3,
        Set("definitely-not-touched")))
    assert(e2.getMessage.contains("replacecommit"))
    // sequential upserts through the public API stay green (each
    // plans against the head it publishes on)
    HudiTableWriter.upsert(Seq((1L, "k1", 11L)).toDF("id", "key", "v"), table): Unit
    HudiTableWriter.upsert(Seq((2L, "k2", 22L)).toDF("id", "key", "v"), table): Unit
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.where(col("id") === 1L).head().getAs[Long]("v") == 11L)
    assert(snap.where(col("id") === 42L).head().getAs[Long]("v") == 999L)
  }
}
