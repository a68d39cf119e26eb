package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PARTITION STATISTICS (iceberg.apache.org spec): a per-partition
  * census parquet registered in metadata's `partition-statistics`,
  * served as a metadata-only read. Under test: census exactness
  * against directly-recomputed numbers (data, position-delete/DV and
  * equality-delete grains), the replace-not-duplicate registration
  * rule, the stale-stats refusal (stats for an older snapshot never
  * serve silently), and the unpartitioned refusal.
  */
class IcebergPartitionStatsSpec extends SparkSpec {

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"g${i % 4}", i * 2L)).toDF("id", "grp", "v")
  }

  private def metaJson(table: String): com.fasterxml.jackson.databind.JsonNode = {
    val hint = scala.io.Source.fromFile(s"$table/metadata/version-hint.text", "UTF-8")
    val v = try hint.mkString.trim finally hint.close()
    val src = scala.io.Source.fromFile(s"$table/metadata/v$v.metadata.json", "UTF-8")
    val text = try src.mkString finally src.close()
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
  }

  test("census is exact per partition; DV deletes census as position deletes; re-run replaces") {
    val table = tmpDir("ipstats") + "/t"
    IcebergTableWriter.create(df(1 to 800), table, partitionBy = Seq("grp")): Unit
    IcebergTableWriter.append(df(801 to 1000), table): Unit
    // v3 DV delete: masks rows, physical data rows unchanged
    IcebergTableWriter.deleteDv(spark, table, pmod(col("id"), lit(10)) === 0): Unit
    val rel = IcebergTableWriter.writePartitionStats(spark, table)
    assert(rel.startsWith("metadata/partition-stats-"))
    val stats = IcebergTableReader.partitionStats(spark, table)
      .collect().map(r => Option(r.getStruct(0).getString(0)) ->
        ((r.getLong(2), r.getInt(3), r.getLong(4), r.getLong(5), r.getInt(6)))).toMap
    // data grain: each grp partition holds exactly 250 PHYSICAL rows
    (0 to 3).foreach { g =>
      val (drc, dfc, bytes, _, _) = stats(Some(s"g$g"))
      assert(drc == 250L, s"g$g physical rows: $drc")
      assert(dfc > 0 && bytes > 0L)
    }
    // the DV census: 100 masked rows across the table, content=1
    assert(stats.values.map(_._4).sum == 100L,
      s"DV record count must equal the masked rows: $stats")
    assert(stats.values.map(_._5).sum > 0)
    // the metadata entry: spec fields, one per snapshot
    val arr = metaJson(table).get("partition-statistics")
    assert(arr != null && arr.isArray && arr.size() == 1)
    val e = arr.get(0)
    assert(e.get("statistics-path").asText() == rel)
    assert(e.get("file-size-in-bytes").asLong() > 0)
    // a RE-RUN for the same snapshot replaces the entry
    val rel2 = IcebergTableWriter.writePartitionStats(spark, table)
    val arr2 = metaJson(table).get("partition-statistics")
    assert(arr2.size() == 1 && arr2.get(0).get("statistics-path").asText() == rel2)
  }

  test("orphan removal: grace shields fresh files; referenced files and stats survive any horizon") {
    val table = tmpDir("ipstats-orphan") + "/t"
    IcebergTableWriter.create(df(1 to 400), table, partitionBy = Seq("grp")): Unit
    IcebergTableWriter.deleteDv(spark, table, pmod(col("id"), lit(7)) === 0): Unit
    val statsRel = IcebergTableWriter.writePartitionStats(spark, table)
    val orphan = new java.io.File(table, "stray.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](80, 65, 82, 49)): Unit
    // a LONG grace: the fresh orphan survives (it could be a racing
    // writer's in-flight file)
    assert(IcebergTableWriter.removeOrphanFiles(spark, table, graceMs = 3600000L).isEmpty)
    assert(orphan.exists())
    // horizon past everything: the orphan goes, every referenced
    // file — data, puffin DVs, the registered stats parquet — stays
    val before = IcebergTableReader.snapshot(spark, table).count()
    val deleted = IcebergTableWriter.removeOrphanFiles(spark, table, graceMs = 0L,
      nowMs = System.currentTimeMillis() + 60000L)
    assert(deleted == Seq("stray.parquet"), s"only the orphan: $deleted")
    assert(IcebergTableReader.snapshot(spark, table).count() == before)
    assert(new java.io.File(s"$table/$statsRel").exists(),
      "the registered partition-statistics file is referenced, not an orphan")
    // 4 data partitions + the unpartitioned DV entries' null-grain row
    val census = IcebergTableReader.partitionStats(spark, table)
    assert(census.count() == 5L)
    assert(census.where(col("data_file_count") > 0).count() == 4L)
  }

  test("stale stats refuse; a fresh census for the new snapshot serves; unpartitioned refuses") {
    val table = tmpDir("ipstats-stale") + "/t"
    IcebergTableWriter.create(df(1 to 100), table, partitionBy = Seq("grp")): Unit
    IcebergTableWriter.writePartitionStats(spark, table): Unit
    assert(IcebergTableReader.partitionStats(spark, table).count() == 4L)
    // the table moves on: yesterday's census must not serve silently
    IcebergTableWriter.append(df(101 to 200), table): Unit
    val e = intercept[IllegalStateException](
      IcebergTableReader.partitionStats(spark, table))
    assert(e.getMessage.contains("no partition statistics registered"))
    IcebergTableWriter.writePartitionStats(spark, table): Unit
    val fresh = IcebergTableReader.partitionStats(spark, table)
    assert(fresh.agg(sum("data_record_count")).head().getLong(0) == 200L)
    // both snapshots' entries coexist in the metadata list
    assert(metaJson(table).get("partition-statistics").size() == 2)
    // unpartitioned: no grain to census
    val flat = tmpDir("ipstats-flat") + "/t"
    IcebergTableWriter.create(df(1 to 10), flat): Unit
    val e2 = intercept[IllegalArgumentException](
      IcebergTableWriter.writePartitionStats(spark, flat))
    assert(e2.getMessage.contains("partitioned"))
  }
}
