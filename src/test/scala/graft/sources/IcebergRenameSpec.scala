package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Column RENAME as a metadata-only commit (iceberg.apache.org spec
  * Schema Evolution): names change freely because data files bind to
  * parquet FIELD IDS — which the writer now stamps on every landed
  * file, making old files serve the new name through the reader's id
  * resolution.
  */
class IcebergRenameSpec extends SparkSpec {

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"g${i % 3}", i * 2L)).toDF("id", "grp", "v")
  }

  test("rename serves old files under the new name; writes after the rename compose") {
    val table = tmpDir("irn-basic") + "/t"
    IcebergTableWriter.create(df(1 to 40), table): Unit
    IcebergTableWriter.append(df(41 to 60), table): Unit
    IcebergTableWriter.renameColumn(spark, table, "v", "value")
    val snap = IcebergTableReader.snapshot(spark, table)
    assert(snap.columns.toSeq == Seq("id", "grp", "value"),
      s"renamed schema must serve, got ${snap.columns.toSeq}")
    assert(snap.count() == 60L)
    assert(snap.where(col("id") === 7L).head().getAs[Long]("value") == 14L,
      "pre-rename files must serve their data under the NEW name")
    // the rename added no snapshot — history is untouched
    val (snaps, _) = IcebergTableReader.snapshotLog(spark, table)
    assert(snaps.size == 2, "a rename is a metadata commit, not a snapshot")
    // appends and upserts AFTER the rename carry the new name
    val s = spark
    import s.implicits._
    IcebergTableWriter.append(
      (61 to 70).map(i => (i.toLong, s"g${i % 3}", i * 2L)).toDF("id", "grp", "value"),
      table): Unit
    IcebergTableWriter.upsert(
      Seq((7L, "g1", 999L)).toDF("id", "grp", "value"), table, Seq("id")): Unit
    val after = IcebergTableReader.snapshot(spark, table)
    assert(after.count() == 70L)
    assert(after.where(col("id") === 7L).head().getAs[Long]("value") == 999L,
      "equality deletes bind to field ids — the upsert must land across the rename")
  }

  test("drop is metadata-only: readers stop projecting, files untouched, ids never reused") {
    val table = tmpDir("irn-drop") + "/t"
    IcebergTableWriter.create(df(1 to 30), table): Unit
    val filesBefore = IcebergTableReader.planFiles(spark, table).data.toSet
    IcebergTableWriter.dropColumn(spark, table, "grp")
    assert(IcebergTableReader.planFiles(spark, table).data.toSet == filesBefore,
      "a drop must not touch data files")
    val snap = IcebergTableReader.snapshot(spark, table)
    assert(snap.columns.toSeq == Seq("id", "v"))
    assert(snap.count() == 30L)
    // a LATER additive evolution must not reuse the dropped field id
    val s = spark
    import s.implicits._
    IcebergTableWriter.append(
      (31 to 35).map(i => (i.toLong, i * 2L, s"t$i")).toDF("id", "v", "tag"), table): Unit
    val after = IcebergTableReader.snapshot(spark, table)
    assert(after.columns.toSeq == Seq("id", "v", "tag") && after.count() == 35L)
    assert(after.where(col("id") <= 30L && col("tag").isNull).count() == 30L)
    // the resurrected NAME would be a new field id, never the old one
    // (old files' grp bytes must NOT leak into a re-added grp column)
    IcebergTableWriter.dropColumn(spark, table, "tag")
    IcebergTableWriter.append(
      (36 to 40).map(i => (i.toLong, i * 2L, s"G$i")).toDF("id", "v", "grp"), table): Unit
    val re = IcebergTableReader.snapshot(spark, table)
    assert(re.where(col("id") <= 30L && col("grp").isNotNull).count() == 0L,
      "a re-added name is a NEW field — old files' bytes must not leak into it")
    // dropping a partition source or the only column refuses
    val pt = tmpDir("irn-drop-part") + "/t"
    IcebergTableWriter.create(df(1 to 10), pt, partitionBy = Seq("grp")): Unit
    val e1 = intercept[IllegalArgumentException](
      IcebergTableWriter.dropColumn(spark, pt, "grp"))
    assert(e1.getMessage.contains("partition-spec source"))
  }

  test("refusals: unknown column, collision, no-op, and id-less live files") {
    val table = tmpDir("irn-refuse") + "/t"
    IcebergTableWriter.create(df(1 to 10), table): Unit
    val e1 = intercept[IllegalArgumentException](
      IcebergTableWriter.renameColumn(spark, table, "nope", "x"))
    assert(e1.getMessage.contains("no column"))
    val e2 = intercept[IllegalArgumentException](
      IcebergTableWriter.renameColumn(spark, table, "v", "grp"))
    assert(e2.getMessage.contains("collide"))
    val e3 = intercept[IllegalArgumentException](
      IcebergTableWriter.renameColumn(spark, table, "v", "v"))
    assert(e3.getMessage.contains("no-op"))
    // metadata published over ID-LESS parquet (the UniForm shape):
    // renaming would silently null the column on those files — refuse
    val plain = tmpDir("irn-plain")
    df(1 to 20).coalesce(1).write.mode("overwrite").parquet(plain)
    val part = new java.io.File(plain).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val mirror = tmpDir("irn-mirror") + "/t"
    IcebergTableWriter.publishMetadataOnly(spark, mirror,
      Seq((part.getAbsolutePath, 20L)),
      df(1 to 1).schema): Unit
    val e4 = intercept[IllegalArgumentException](
      IcebergTableWriter.renameColumn(spark, mirror, "v", "value"))
    assert(e4.getMessage.contains("field id"), e4.getMessage)
  }
}
