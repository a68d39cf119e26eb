package graft.operators

import graft.SparkSpec
import graft.sources.UpsertWriter

class SnapshotDiffSpec extends SparkSpec {

  test("diff classifies insert/update/delete and drops unchanged rows") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v")
    val neu = Seq((1L, "a", 10.0), (2L, "b", 99.0), (4L, "d", 40.0)).toDF("id", "name", "v")
    val out = SnapshotDiff.diff(old, neu, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    assert(out == Set(
      (2L, "update", "b", 99.0),
      (3L, "delete", "c", 30.0), // old-side values surface for deletes
      (4L, "insert", "d", 40.0)))
  }

  test("update to NULL is a change and surfaces the new NULL, not the old value") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, Some("x"))).toDF("id", "name")
    val neu = Seq((1L, None: Option[String])).toDF("id", "name")
    val out = SnapshotDiff.diff(old, neu, Seq("id")).collect()
    assert(out.length == 1)
    assert(out(0).getString(1) == "update" && out(0).isNullAt(2))
  }

  test("diff of two written upsert versions = the applied update batch") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-diff-versions-")
    val base = Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c")).toDF("id", "ver", "payload")
    UpsertWriter.upsert(base, dir, Seq("id"), "ver")
    val batch = Seq((2L, 2L, "B!"), (4L, 2L, "d")).toDF("id", "ver", "payload")
    UpsertWriter.upsert(batch, dir, Seq("id"), "ver", keepVersions = 2)
    val Seq(v1, v2) = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.toString).sorted.toSeq
    val out = SnapshotDiff.diff(spark.read.parquet(v1), spark.read.parquet(v2), Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
    assert(out == Set((2L, "update", "B!"), (4L, "insert", "d")))
  }

  test("changeFeed: updates emit pre+post images; inserts/deletes one row each") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "name", "v")
    val neu = Seq((1L, "a", 10.0), (2L, "b", 99.0), (4L, "d", 40.0)).toDF("id", "name", "v")
    val out = SnapshotDiff.changeFeed(old, neu, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    assert(out == Set(
      (2L, "update_preimage", "b", 20.0),
      (2L, "update_postimage", "b", 99.0),
      (3L, "delete", "c", 30.0),
      (4L, "insert", "d", 40.0))) // id=1 unchanged → absent
  }

  test("changeFeed: update to NULL keeps a non-null preimage and a null postimage") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, Some("x"))).toDF("id", "name")
    val neu = Seq((1L, None: Option[String])).toDF("id", "name")
    val out = SnapshotDiff.changeFeed(old, neu, Seq("id"))
      .collect().map(r => r.getString(1) -> Option(r.getString(2))).toMap
    assert(out == Map("update_preimage" -> Some("x"), "update_postimage" -> None))
  }
}
