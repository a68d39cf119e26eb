package graft.sources

import graft.SparkSpec

class CatalogSyncSpec extends SparkSpec {

  private def df(rows: (Long, Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("k", "ver", "payload")
  }

  test("sync registers the committed version; a second session discovers it by name") {
    val table = tmpDir("graft-catalog-") + "/t"
    val name = "graft_catalog_spec_t"
    try {
      UpsertWriter.upsert(df((1L, 1L, "a"), (2L, 1L, "b")), table, Seq("k"), "ver",
        keepVersions = 5, syncTable = Some(name))
      // a DIFFERENT session (no temp views shared) resolves the name —
      // the reference's hive_sync behavior a temp view can never give
      val other = spark.newSession()
      val seen = other.table(name).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(seen == Map(1L -> "a", 2L -> "b"))
      assert(other.table(name).inputFiles.forall(_.contains("v00000001")))

      // commit again: the name re-points to the NEW version. A reader
      // session that already resolved the table refreshes its own
      // relation cache — the standard Spark contract when an external
      // writer changes a catalog table (same as Hive/Glue sync).
      UpsertWriter.upsert(df((1L, 2L, "a2")), table, Seq("k"), "ver",
        keepVersions = 5, syncTable = Some(name))
      other.catalog.refreshTable(name)
      val seen2 = other.table(name).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(seen2 == Map(1L -> "a2", 2L -> "b"))
      assert(other.table(name).inputFiles.forall(_.contains("v00000002")))
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("sync points at a version snapshot, never the table root") {
    val table = tmpDir("graft-catalog-snap-") + "/t"
    val name = "graft_catalog_spec_snap"
    try {
      UpsertWriter.upsert(df((1L, 1L, "a")), table, Seq("k"), "ver", keepVersions = 5)
      CatalogSync.sync(spark, name, table)
      // an uncommitted writer's files (even a full new version dir
      // without its marker) stay invisible to catalog readers
      UpsertWriter.upsert(df((9L, 1L, "uncommitted-elsewhere")), table, Seq("k"), "ver",
        keepVersions = 5)
      assert(spark.table(name).count() == 1) // still the synced v1 snapshot
      CatalogSync.sync(spark, name, table)
      assert(spark.table(name).count() == 2) // re-point picks up v2
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("sync on a hive-partitioned table recovers partitions") {
    val table = tmpDir("graft-catalog-part-") + "/t"
    val name = "graft_catalog_spec_part"
    val s = spark
    import s.implicits._
    try {
      val in = Seq((1L, 1L, "a", "p1"), (2L, 1L, "b", "p2")).toDF("k", "ver", "payload", "part")
      UpsertWriter.upsert(in, table, Seq("k"), "ver", partitionBy = Seq("part"),
        keepVersions = 5, syncTable = Some(name))
      val got = spark.table(name).where($"part" === "p2").collect()
      assert(got.length == 1 && got.head.getAs[String]("payload") == "b")
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("isSynced reflects catalog state") {
    assert(!CatalogSync.isSynced(spark, "graft_catalog_spec_missing"))
  }
}
