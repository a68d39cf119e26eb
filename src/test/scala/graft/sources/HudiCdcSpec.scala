package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** hoodie.table.cdc.enabled contract: data-changing writes land
  * pre/post images under `.hoodie/cdc/<instant>/` and
  * `changeFeedSince` serves them VERBATIM with precedence over
  * post-image reconstruction — the Delta-CDF-precedence analog on
  * the Hudi leg, including the previously-impossible COW feed.
  */
class HudiCdcSpec extends SparkSpec {

  private def df(r: Range, v: Long => Long = _ * 2L) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"k$i", v(i.toLong))).toDF("id", "key", "v")
  }

  test("COW: upsert lands pre/post/insert images; the feed serves them verbatim") {
    val table = tmpDir("hcdc-cow") + "/t"
    val c1 = HudiTableWriter.create(df(1 to 30), table,
      recordKeys = Seq("id"), cdcEnabled = true)
    val c2 = HudiTableWriter.upsert(df(10 to 12, _ * 100L).union(df(31 to 33)), table)
    assert(new java.io.File(s"$table/.hoodie/cdc/$c2").exists(),
      "cdc images must land under .hoodie/cdc/<instant>/")
    val feed = HudiTableReader.changeFeedSince(spark, table, c1)
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update_preimage" -> 3L, "update_postimage" -> 3L,
      "insert" -> 3L), s"got $byType")
    // pre-images carry the OLD values and the OLD stamp
    val pre = feed.where(col("_change_type") === "update_preimage" && col("id") === 11L).head()
    assert(pre.getAs[Long]("v") == 22L)
    assert(pre.getAs[String]("_hoodie_commit_time") == c1)
    val post = feed.where(col("_change_type") === "update_postimage" && col("id") === 11L).head()
    assert(post.getAs[Long]("v") == 1100L)
    assert(post.getAs[String]("_hoodie_commit_time") == c2)
    // a feed from BEFORE the create serves the insert commit too
    val full = HudiTableReader.changeFeedSince(spark, table, "0")
    assert(full.where(col("_change_type") === "insert").count() == 33L)
  }

  test("COW: an upsert instant without images refuses; plain COW still refuses entirely") {
    val table = tmpDir("hcdc-off") + "/t"
    HudiTableWriter.create(df(1 to 10), table, recordKeys = Seq("id")): Unit
    val e = intercept[IllegalArgumentException](
      HudiTableReader.changeFeedSince(spark, table, "0"))
    assert(e.getMessage.contains("COPY_ON_WRITE"))
    // enabling cdc AFTER a non-cdc upsert: the old instant refuses
    val table2 = tmpDir("hcdc-late") + "/t"
    val c1 = HudiTableWriter.create(df(1 to 10), table2,
      recordKeys = Seq("id"), cdcEnabled = true)
    // simulate a pre-enablement upsert by deleting its cdc dir
    val c2 = HudiTableWriter.upsert(df(3 to 4, _ * 9L), table2)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete(): Unit
    }
    rmrf(new java.io.File(s"$table2/.hoodie/cdc/$c2"))
    val e2 = intercept[IllegalStateException](
      HudiTableReader.changeFeedSince(spark, table2, c1))
    assert(e2.getMessage.contains("predates"))
  }

  test("MOR: cdc images take precedence over reconstruction; fold reproduces the head view") {
    val s = spark
    import s.implicits._
    val table = tmpDir("hcdc-mor") + "/t"
    val c1 = HudiTableWriter.createMor(df(1 to 20), table,
      recordKeys = Seq("id"), cdcEnabled = true)
    HudiTableWriter.upsert(df(5 to 6, _ * 100L).union(df(21 to 22)), table): Unit
    HudiTableWriter.deleteLog(Seq(Tuple1(9L)).toDF("id"), table): Unit
    val feed = HudiTableReader.changeFeedSince(spark, table, c1)
    val types = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types == Map("update_preimage" -> 2L, "update_postimage" -> 2L,
      "insert" -> 2L, "delete" -> 1L), s"got $types")
    // the delete image is the FULL pre-image row, not a bare key
    val del = feed.where(col("_change_type") === "delete").head()
    assert(del.getAs[Long]("id") == 9L && del.getAs[Long]("v") == 18L)
    // fold equivalence: as-of(c1) + feed (deletes, then post/insert
    // images per key) == head real-time view
    val before = HudiTableReader.snapshotAsOf(spark, table, c1)
      .select("id", "key", "v")
    val applies = feed
      .where(col("_change_type").isin("update_postimage", "insert"))
      .select("id", "key", "v")
    val deletes = feed.where(col("_change_type") === "delete").select("id")
    val folded = before
      .join(deletes, Seq("id"), "left_anti")
      .join(applies.select("id"), Seq("id"), "left_anti")
      .unionByName(applies)
    val head = HudiTableReader.snapshot(spark, table).select("id", "key", "v")
    assert(folded.exceptAll(head).isEmpty && head.exceptAll(folded).isEmpty)
  }
}
