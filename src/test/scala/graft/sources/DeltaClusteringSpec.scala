package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain Metadata + Clustered Table (delta.io PROTOCOL.md): the
  * `domainMetadata` action carries a per-domain configuration string
  * with latest-wins replay and `removed` tombstones; a clustered
  * table declares the `clustering` + `domainMetadata` writer features
  * and records its columns in the `delta.clustering` domain. Both are
  * WRITER features, so external clustered tables stay readable; the
  * writer obligations under test are preservation (domains ride
  * checkpoints verbatim — after log cleanup the checkpoint is the
  * only copy) and the advisory cluster-on-write.
  *
  * External fixtures are hand-built in PROTOCOL.md's action JSON, the
  * same no-delta-library contract the reader spec is locked against.
  */
class DeltaClusteringSpec extends SparkSpec {

  private def writeDataFile(df: DataFrame, table: String, name: String): Unit = {
    val tmp = tmpDir("dclu-part")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val src = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
    new java.io.File(table, name).getParentFile.mkdirs()
    java.nio.file.Files.copy(src.toPath, new java.io.File(table, name).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  private def writeCommit(table: String, version: Long, lines: Seq[String]): Unit = {
    val dir = new java.io.File(table, "_delta_log")
    dir.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(dir, f"$version%020d.json"), "UTF-8")
    try lines.foreach(w.println) finally w.close()
  }

  private def meta(schemaJson: String): String =
    s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":"${schemaJson.replace("\"", "\\\"")}",""" +
      """"partitionColumns":[],"configuration":{},"createdTime":1700000000000}}"""

  private def domain(name: String, conf: String, removed: Boolean = false): String =
    s"""{"domainMetadata":{"domain":"$name","configuration":"${conf.replace("\"", "\\\"")}",""" +
      s""""removed":$removed}}"""

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"g${i % 4}", i * 2L)).toDF("id", "grp", "v")
  }

  test("external fixture: domainMetadata replays latest-wins, tombstones drop, asOf sees history") {
    val table = tmpDir("dclu-ext") + "/t"
    val d = df(1 to 10)
    writeDataFile(d, table, "part-0.parquet")
    writeCommit(table, 0L, Seq(
      // writer-feature-only protocol: minReaderVersion 1 is legal and
      // MUST stay readable here
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["domainMetadata","clustering"]}}""",
      meta(d.schema.json),
      domain("delta.clustering", """{"clusteringColumns":[["id"]]}"""),
      domain("custom.owner", """{"team":"ingest"}"""),
      """{"add":{"path":"part-0.parquet","partitionValues":{},"size":1024,""" +
        """"modificationTime":1700000000000,"dataChange":true}}"""))
    // overwrite one domain, tombstone the other
    writeCommit(table, 1L, Seq(
      domain("delta.clustering", """{"clusteringColumns":[["grp"],["id"]]}"""),
      domain("custom.owner", "", removed = true)))
    val head = DeltaTableReader.snapshotState(spark, table)
    assert(head.domainMetadata.keySet == Set("delta.clustering"))
    assert(DeltaTableReader.clusteringColumns(spark, table) ==
      Seq(Seq("grp"), Seq("id")))
    // the snapshot itself still serves (clustering is writer-scoped)
    assert(DeltaTableReader.snapshot(spark, table).count() == 10L)
    // history: VERSION AS OF 0 sees the original domains
    val v0 = DeltaTableReader.snapshotState(spark, table, asOf = Some(0L))
    assert(v0.domainMetadata.keySet == Set("delta.clustering", "custom.owner"))
    assert(v0.domainMetadata("custom.owner") == """{"team":"ingest"}""")
    assert(DeltaTableReader.clusteringColumnsOf(v0, table) == Seq(Seq("id")))
  }

  test("create clusterBy: protocol features, delta.clustering domain, files range-cut, append re-clusters") {
    val table = tmpDir("dclu-create") + "/t"
    DeltaTableWriter.create(df(1 to 4000), table, clusterBy = Seq("id")): Unit
    val st = DeltaTableReader.snapshotState(spark, table)
    val proto = st.protocol.getOrElse(fail("clustered create must record a protocol"))
    assert(proto.minWriterVersion == 7)
    assert(proto.minReaderVersion == 1,
      "clustering + domainMetadata are writer features; readers stay legacy")
    assert(proto.writerFeatures.toSet == Set("domainMetadata", "clustering"))
    assert(DeltaTableReader.clusteringColumns(spark, table) == Seq(Seq("id")))
    // range clustering must make stats skipping CUT the file set
    val full = DeltaTableReader.snapshot(spark, table)
    val low = DeltaTableReader.snapshotSkipping(spark, table, "id", 0.0, 100.0)
    assert(full.inputFiles.length > 1, "fixture must land multiple files")
    assert(low.inputFiles.length < full.inputFiles.length,
      s"clustered files must prune (${low.inputFiles.length} of ${full.inputFiles.length})")
    // an append to a clustered table range-clusters the BATCH too —
    // its new files must not re-widen the low-range file set by more
    // than the batch's own low-range slice
    val before = low.inputFiles.length
    DeltaTableWriter.append(df(4001 to 8000), table): Unit
    val low2 = DeltaTableReader.snapshotSkipping(spark, table, "id", 0.0, 100.0)
    val full2 = DeltaTableReader.snapshot(spark, table)
    assert(full2.count() == 8000L)
    assert(low2.inputFiles.length < full2.inputFiles.length,
      "the clustered append's files must stay prunable")
    assert(low2.inputFiles.length == before,
      "an all-high append (ids 4001+) must add NO files to the 0..100 slice — " +
        "the appended batch was range-clustered, so its low file covers only its own range")
    // the domain survives data commits
    assert(DeltaTableReader.clusteringColumns(spark, table) == Seq(Seq("id")))
    // values, not layout: the table reads back exactly
    assert(DeltaTableReader.snapshot(spark, table).agg(sum("id")).head().getLong(0) ==
      (1L to 8000L).sum)
  }

  test("domains ride checkpoints verbatim: classic and v2, survive log cleanup, tombstoned domains absent") {
    val table = tmpDir("dclu-ckpt") + "/t"
    DeltaTableWriter.create(df(1 to 1000), table, clusterBy = Seq("id")): Unit
    // an EXTERNAL engine's unknown user domain lands in the log; the
    // checkpoint must carry it even though graft has no idea what it
    // means — dropping it would corrupt the other engine's state
    writeCommit(table, 1L, Seq(
      domain("ext.engine.state", """{"watermark":42}""")))
    DeltaTableWriter.writeCheckpoint(spark, table): Unit
    // log cleanup: the checkpoint is now the ONLY copy of the domains
    (0L to 1L).foreach { v =>
      assert(new java.io.File(s"$table/_delta_log", f"$v%020d.json").delete())
    }
    val st = DeltaTableReader.snapshotState(spark, table)
    assert(st.domainMetadata.keySet == Set("delta.clustering", "ext.engine.state"))
    assert(st.domainMetadata("ext.engine.state") == """{"watermark":42}""")
    assert(DeltaTableReader.clusteringColumns(spark, table) == Seq(Seq("id")))
    assert(DeltaTableReader.snapshot(spark, table).count() == 1000L)
    // tombstone one domain, force the V2 layout (manifest + sidecars):
    // live domains present, removed domain absent
    writeCommit(table, 2L, Seq(domain("ext.engine.state", "", removed = true)))
    DeltaTableWriter.writeCheckpoint(spark, table, v2Threshold = 0): Unit
    assert(new java.io.File(s"$table/_delta_log", f"${2L}%020d.json").delete())
    val st2 = DeltaTableReader.snapshotState(spark, table)
    assert(st2.domainMetadata.keySet == Set("delta.clustering"),
      s"v2 checkpoint must carry live domains and drop tombstoned ones: ${st2.domainMetadata}")
    assert(DeltaTableReader.snapshot(spark, table).count() == 1000L)
  }

  test("a winner carrying domainMetadata blocks stale-snapshot rebase (OCC conservatism)") {
    val table = tmpDir("dclu-occ") + "/t"
    DeltaTableWriter.create(df(1 to 100), table): Unit
    val rel = DeltaTableReader.activeFiles(spark, table).head.path
    // version 1 goes to a concurrent writer that CHANGES a domain —
    // lines computed against snapshot 0 must not rebase over it
    writeCommit(table, 1L, Seq(
      domain("delta.clustering", """{"clusteringColumns":[["id"]]}""")))
    intercept[java.util.ConcurrentModificationException] {
      DeltaTableWriter.commit(spark, table, 1L,
        Seq(s"""{"remove":{"path":"$rel","deletionTimestamp":1700000000000,""" +
          """"dataChange":true}}"""),
        rebaseSafe = false, rebaseDisjoint = true)
    }
  }

  test("OPTIMIZE re-establishes the clustered layout a hand-landed wide file diluted") {
    val table = tmpDir("dclu-optimize") + "/t"
    DeltaTableWriter.create(df(1 to 4000), table, clusterBy = Seq("id")): Unit
    // an unclustered writer (spec-legal) lands one file spanning the
    // whole key space: the low slice now includes it
    val wide = df(1 to 4000).orderBy(rand(7)).coalesce(1)
    writeDataFile(wide, table, "wide.parquet")
    val fs = new java.io.File(s"$table/wide.parquet")
    writeCommit(table, 1L, Seq(
      s"""{"add":{"path":"wide.parquet","partitionValues":{},"size":${fs.length()},""" +
        s""""modificationTime":1700000000000,"dataChange":true}}"""))
    assert(DeltaTableReader.snapshot(spark, table).count() == 8000L)
    // OPTIMIZE on a clustered table range-reclusters instead of the
    // blind row-count split — afterwards skipping cuts again
    DeltaTableWriter.compact(spark, table, targetFiles = 8): Unit
    val full = DeltaTableReader.snapshot(spark, table)
    val low = DeltaTableReader.snapshotSkipping(spark, table, "id", 0.0, 100.0)
    assert(full.inputFiles.length > 1)
    assert(low.inputFiles.length < full.inputFiles.length,
      s"post-OPTIMIZE files must prune (${low.inputFiles.length} of " +
        s"${full.inputFiles.length})")
    assert(full.count() == 8000L)
    assert(DeltaTableReader.clusteringColumns(spark, table) == Seq(Seq("id")))
  }

  test("unclustered tables keep the legacy protocol and an empty clustering answer") {
    val table = tmpDir("dclu-plain") + "/t"
    DeltaTableWriter.create(df(1 to 50), table): Unit
    val st = DeltaTableReader.snapshotState(spark, table)
    assert(st.protocol.exists(p => p.minWriterVersion == 2 && p.minReaderVersion == 1))
    assert(st.domainMetadata.isEmpty)
    assert(DeltaTableReader.clusteringColumns(spark, table).isEmpty)
    // a clustering domain whose configuration is garbage refuses
    // loudly instead of reporting "unclustered"
    writeCommit(table, 1L, Seq(domain("delta.clustering", "not json")))
    val e = intercept[IllegalStateException](
      DeltaTableReader.clusteringColumns(spark, table))
    assert(e.getMessage.contains("delta.clustering"))
  }
}
