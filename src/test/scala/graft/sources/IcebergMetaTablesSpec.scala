package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Iceberg METADATA TABLES (iceberg.apache.org "Inspecting tables"):
  * snapshots/history/refs/manifests/files as DataFrames, built from
  * driver metadata with zero data I/O.
  */
class IcebergMetaTablesSpec extends SparkSpec {

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"g${i % 3}", i * 2L)).toDF("id", "grp", "v")
  }

  test("snapshots/history/refs/manifests/files expose the inspection surface") {
    val table = tmpDir("imeta") + "/t"
    val s1 = IcebergTableWriter.create(df(1 to 40), table)
    IcebergTableWriter.append(df(41 to 80), table): Unit
    IcebergTableWriter.setRef(spark, table, "audit", s1, refType = "tag"): Unit
    IcebergTableWriter.delete(spark, table, col("id") <= 4): Unit

    val snaps = IcebergTableReader.metadataTable(spark, table, "snapshots")
    assert(snaps.count() == 3L)
    assert(snaps.select("operation").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("append", "append", "delete"))
    // the standard summary fields real engines stamp
    val create = snaps.orderBy(col("snapshot_id")).head()
    val summary = create.getAs[Map[String, String]]("summary")
    assert(summary.get("added-records").contains("40"),
      s"the create snapshot must summarize its added records, got $summary")
    assert(summary.get("added-data-files").exists(_.toInt >= 1))

    val history = IcebergTableReader.metadataTable(spark, table, "history")
    assert(history.count() == 3L)
    assert(history.where(col("is_current_ancestor")).count() == 3L,
      "a linear timeline is all current ancestors")

    val refs = IcebergTableReader.metadataTable(spark, table, "refs")
    assert(refs.where(col("name") === "main" && col("type") === "branch").count() == 1L)
    assert(refs.where(col("name") === "audit" && col("type") === "tag")
      .head().getAs[Long]("snapshot_id") == s1)

    val manifests = IcebergTableReader.metadataTable(spark, table, "manifests")
    assert(manifests.where(col("content") === 1).count() >= 1L,
      "the delete manifest must show content=1")

    val files = IcebergTableReader.metadataTable(spark, table, "files")
    val dataRows = files.where(col("content") === 0)
      .agg(sum(col("record_count"))).head().getLong(0)
    assert(dataRows == 80L, "live data-file record counts sum to the table rows")
    val delRows = files.where(col("content") === 1)
      .agg(sum(col("record_count"))).head().getLong(0)
    assert(delRows == 4L, "delete-file record counts sum to the deleted rows")
    // zero data I/O: the files table never opens the parquet it lists
    assert(files.inputFiles.isEmpty)

    val e = intercept[IllegalArgumentException](
      IcebergTableReader.metadataTable(spark, table, "nope"))
    assert(e.getMessage.contains("unknown metadata table"))
  }

  test("the partitions table aggregates live data entries per partition value") {
    val table = tmpDir("imeta-parts") + "/t"
    val s = spark
    import s.implicits._
    IcebergTableWriter.create(df(1 to 60), table, partitionBy = Seq("grp")): Unit
    val parts = IcebergTableReader.metadataTable(spark, table, "partitions")
    assert(parts.count() == 3L, "one row per identity-partition value")
    assert(parts.agg(sum(col("record_count"))).head().getLong(0) == 60L)
    val g0 = parts.where(element_at(col("partition"), "grp") === "g0").head()
    assert(g0.getAs[Long]("record_count") == 20L)
    assert(g0.getAs[Long]("file_count") >= 1L)
    assert(parts.inputFiles.isEmpty, "partitions is metadata only")
  }
}
