package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The format-agnostic entry point: `TableLoader.open(path)` detects
  * each layout from its own on-disk markers and snapshot-reads it
  * through the matching adapter — "point the engine at an existing
  * table" with nothing but a path.
  */
class TableLoaderOpenSpec extends SparkSpec {

  private def rows(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, i * 2L)).toDF("id", "v")
  }

  test("detectFormat + open dispatch: graft, delta, hudi, plain; incremental contracts hold") {
    // graft versioned: upserts declare their record keys in commit
    // metadata, so openIncremental derives the CDC feed with no
    // out-of-band key declaration — and it must equal the explicit
    // SnapshotDiff.changeFeed call
    val g = tmpDir("open-graft")
    UpsertWriter.upsert(rows(1 to 40).withColumn("ver", lit(1L)), g, Seq("id"), "ver",
      keepVersions = 3)
    assert(TableLoader.detectFormat(spark, g) == TableLoader.GraftVersioned)
    assert(TableLoader.open(spark, g).count() == 40L)
    UpsertWriter.upsert(
      rows(31 to 50).withColumn("v", col("v") * 10L).withColumn("ver", lit(2L)),
      g, Seq("id"), "ver", keepVersions = 3)
    val feed = TableLoader.openIncremental(spark, g, "1")
    val explicit = graft.operators.SnapshotDiff.changeFeed(
      UpsertWriter.readVersion(spark, g, 1), UpsertWriter.read(spark, g), Seq("id"))
    assert(feed.columns.toSeq == explicit.columns.toSeq)
    assert(feed.exceptAll(explicit).isEmpty && explicit.exceptAll(feed).isEmpty,
      "openIncremental must be exactly the explicit changeFeed")
    // 10 updates (ids 31..40, two images each) + 10 inserts
    assert(feed.count() == 30L)
    assert(feed.where(col("change_type") === "insert").count() == 10L)
    // a keyless table (raw commitVersion services only) refuses with directions
    val g2 = tmpDir("open-graft-keyless")
    UpsertWriter.upsert(rows(1 to 5).withColumn("ver", lit(1L)), g2, Seq("id"), "ver")
    new java.io.File(s"$g2/v00000001", "_graft_meta").delete(): Unit
    val eg = intercept[IllegalArgumentException](TableLoader.openIncremental(spark, g2, "1"))
    assert(eg.getMessage.contains("graft.record.keys"))

    // delta layout (external-writer fixture shape)
    val d = tmpDir("open-delta")
    val tmp = tmpDir("open-delta-stage")
    rows(1 to 30).coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, new java.io.File(d, "p0.parquet").toPath)
    new java.io.File(d, "_delta_log").mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(s"$d/_delta_log", f"${0L}%020d.json"), "UTF-8")
    try {
      w.println("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""")
      w.println("""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[]}","partitionColumns":[],"configuration":{},"createdTime":0}}""")
      w.println("""{"add":{"path":"p0.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
    } finally w.close()
    assert(TableLoader.detectFormat(spark, d) == TableLoader.DeltaFormat)
    assert(TableLoader.open(spark, d).count() == 30L)

    // hudi layout
    val h = tmpDir("open-hudi")
    java.nio.file.Files.copy(part.toPath, new java.io.File(h, "g1_0-0-0_20240101090000.parquet").toPath)
    new java.io.File(h, ".hoodie").mkdirs()
    val hw = new java.io.PrintWriter(new java.io.File(s"$h/.hoodie", "20240101090000.commit"), "UTF-8")
    try hw.println("""{"partitionToWriteStats":{"":[{"fileId":"g1","path":"g1_0-0-0_20240101090000.parquet","numWrites":1,"numUpdateWrites":0,"totalWriteBytes":1,"prevCommit":"null"}]},"operationType":"UPSERT"}""")
    finally hw.close()
    assert(TableLoader.detectFormat(spark, h) == TableLoader.HudiFormat)
    assert(TableLoader.open(spark, h).count() == 30L)

    // plain parquet
    val p = tmpDir("open-plain")
    rows(1 to 25).write.mode("overwrite").parquet(p)
    assert(TableLoader.detectFormat(spark, p) == TableLoader.PlainParquet)
    assert(TableLoader.open(spark, p).count() == 25L)
    val ep = intercept[IllegalArgumentException](TableLoader.openIncremental(spark, p, "0"))
    assert(ep.getMessage.contains("no commit log"))
  }

  test("checkpointed consumer loop: bootstrap, pull, crash-replay, commit — any format") {
    import org.apache.spark.sql.functions._
    val store = new CheckpointStore(tmpDir("cc-store"),
      spark.sparkContext.hadoopConfiguration)
    // Delta leg
    val d = tmpDir("cc-delta") + "/t"
    DeltaTableWriter.create(rows(1 to 40), d): Unit
    // first pull bootstraps with the FULL snapshot
    val Some((boot, tok1)) = TableLoader.pullIncremental(spark, d, "orders_d", store): @unchecked
    assert(boot.count() == 40L && tok1 == "0")
    // crash BEFORE commit: the same pull re-delivers (at-least-once)
    val Some((replay, _)) = TableLoader.pullIncremental(spark, d, "orders_d", store): @unchecked
    assert(replay.count() == 40L)
    TableLoader.commitToken(d, "orders_d", store, tok1)
    // up to date: no increment
    assert(TableLoader.pullIncremental(spark, d, "orders_d", store).isEmpty)
    // an append advances the head; the pull serves exactly it
    DeltaTableWriter.append(rows(41 to 55), d): Unit
    val Some((inc, tok2)) = TableLoader.pullIncremental(spark, d, "orders_d", store): @unchecked
    assert(inc.count() == 15L && tok2 == "1")
    TableLoader.commitToken(d, "orders_d", store, tok2)
    assert(TableLoader.pullIncremental(spark, d, "orders_d", store).isEmpty)

    // Hudi MOR leg: the same call shape, tokens are instants, the
    // increment is the touched-group merge
    val h = tmpDir("cc-hudi") + "/t"
    HudiTableWriter.createMor(rows(1 to 30).coalesce(1), h, recordKeys = Seq("id")): Unit
    val Some((hboot, htok1)) = TableLoader.pullIncremental(spark, h, "orders_h", store): @unchecked
    assert(hboot.count() == 30L)
    TableLoader.commitToken(h, "orders_h", store, htok1)
    HudiTableWriter.updateLog(rows(1 to 3).withColumn("v", lit(7L)), h): Unit
    val Some((hinc, htok2)) = TableLoader.pullIncremental(spark, h, "orders_h", store): @unchecked
    assert(hinc.count() == 3L, "the MOR pull must serve exactly the post-checkpoint upserts")
    assert(htok2 > htok1)
    TableLoader.commitToken(h, "orders_h", store, htok2)
    assert(TableLoader.pullIncremental(spark, h, "orders_h", store).isEmpty)
  }

  test("checkpointed consumer SURVIVES a mid-range overwrite: the pull auto-follows the refusal to the CDC feed") {
    import org.apache.spark.sql.DataFrame
    val store = new CheckpointStore(tmpDir("cc-ow-store"),
      spark.sparkContext.hadoopConfiguration)

    // Iceberg leg: after the checkpoint, an append AND an upsert (an
    // `overwrite` snapshot — equality deletes) land; the append-scoped
    // pull cannot represent the range, and instead of dying the
    // consumer receives the CDC-grade feed, marked by _change_type
    val t = tmpDir("cc-ow-ice") + "/t"
    IcebergTableWriter.create(rows(1 to 30), t): Unit
    val Some((boot, tok1)) = TableLoader.pullIncremental(spark, t, "ow_ice", store): @unchecked
    assert(boot.count() == 30L)
    TableLoader.commitToken(t, "ow_ice", store, tok1)
    IcebergTableWriter.append(rows(31 to 40), t): Unit
    IcebergTableWriter.upsert(rows(5 to 8).withColumn("v", lit(999L)), t, Seq("id")): Unit
    val Some((inc, tok2)) = TableLoader.pullIncremental(spark, t, "ow_ice", store): @unchecked
    assert(inc.columns.contains("_change_type"),
      "the overwrite-containing range must arrive CDC-shaped")
    // folding the feed onto the consumer's mirror reproduces the live
    // snapshot — the correctness a blind append could never give
    var mirror: DataFrame = TableLoader.openAsOf(spark, t, tok1).select("id", "v")
    inc.select("_snapshot_id").distinct().collect().map(_.getLong(0)).sorted.foreach { sid =>
      val dels = inc.where(col("_snapshot_id") === sid && col("_change_type") === "delete")
      val ins = inc.where(col("_snapshot_id") === sid && col("_change_type") === "insert")
        .select("id", "v")
      mirror =
        (if (dels.isEmpty) mirror
         else if (dels.where(col("v").isNull).count() == dels.count())
           mirror.join(dels.select("id"), Seq("id"), "left_anti") // key-images
         else mirror.join(dels.select("id", "v"), Seq("id", "v"), "left_anti"))
          .unionByName(ins)
    }
    val live = TableLoader.open(spark, t).select("id", "v")
    assert(mirror.exceptAll(live).isEmpty && live.exceptAll(mirror).isEmpty,
      "folding the fallback feed must reproduce the live snapshot")
    TableLoader.commitToken(t, "ow_ice", store, tok2)
    assert(TableLoader.pullIncremental(spark, t, "ow_ice", store).isEmpty)

    // Delta leg: a mid-range DV delete triggers the same fallback;
    // delete images are FULL pre-images there, so the fold is by row
    val d = tmpDir("cc-ow-delta") + "/t"
    DeltaTableWriter.create(rows(1 to 20), d): Unit
    val Some((_, dtok1)) = TableLoader.pullIncremental(spark, d, "ow_delta", store): @unchecked
    TableLoader.commitToken(d, "ow_delta", store, dtok1)
    DeltaTableWriter.append(rows(21 to 25), d): Unit
    DeltaTableWriter.delete(spark, d, col("id") <= 3L): Unit
    val Some((dinc, dtok2)) = TableLoader.pullIncremental(spark, d, "ow_delta", store): @unchecked
    assert(dinc.columns.contains("_change_type"))
    var dm: DataFrame = TableLoader.openAsOf(spark, d, dtok1).select("id", "v")
    dinc.select("_commit_version").distinct().collect().map(_.getLong(0)).sorted.foreach { v =>
      val dels = dinc.where(col("_commit_version") === v && col("_change_type") === "delete")
        .select("id", "v")
      val ins = dinc.where(col("_commit_version") === v && col("_change_type") === "insert")
        .select("id", "v")
      dm = dm.join(dels, Seq("id", "v"), "left_anti").unionByName(ins)
    }
    val dlive = TableLoader.open(spark, d).select("id", "v")
    assert(dm.exceptAll(dlive).isEmpty && dlive.exceptAll(dm).isEmpty)
    assert(dlive.count() == 22L) // 25 - 3 deleted
    TableLoader.commitToken(d, "ow_delta", store, dtok2)
    assert(TableLoader.pullIncremental(spark, d, "ow_delta", store).isEmpty)
  }

  test("openAsOf: one token, any format's time travel") {
    // graft versioned: version 1 before the second upsert
    val g = tmpDir("asof-graft")
    UpsertWriter.upsert(rows(1 to 20).withColumn("ver", lit(1L)), g, Seq("id"), "ver",
      keepVersions = 3)
    UpsertWriter.upsert(rows(21 to 30).withColumn("ver", lit(2L)), g, Seq("id"), "ver",
      keepVersions = 3)
    assert(TableLoader.openAsOf(spark, g, "1").count() == 20L)
    assert(TableLoader.open(spark, g).count() == 30L)
    // delta: version 0 before the append (writer-landed table)
    val d = tmpDir("asof-delta") + "/t"
    DeltaTableWriter.create(rows(1 to 15), d)
    DeltaTableWriter.append(rows(16 to 40), d)
    assert(TableLoader.openAsOf(spark, d, "0").count() == 15L)
    // iceberg: snapshot 1 before the append
    val i = tmpDir("asof-ice") + "/t"
    IcebergTableWriter.create(rows(1 to 12), i)
    val tsBetween = System.currentTimeMillis()
    Thread.sleep(5L)
    IcebergTableWriter.append(rows(13 to 50), i)
    assert(TableLoader.openAsOf(spark, i, "1").count() == 12L)
    // ... and the ts:<epoch-millis> token resolves off the snapshot log
    assert(TableLoader.openAsOf(spark, i, s"ts:$tsBetween").count() == 12L)
    assert(TableLoader.openAsOf(spark, i, s"ts:${System.currentTimeMillis()}").count() == 50L)
    // hudi: the create instant before the append
    val h = tmpDir("asof-hudi") + "/t"
    val c1 = HudiTableWriter.create(rows(1 to 18), h)
    HudiTableWriter.append(rows(19 to 60), h)
    assert(TableLoader.openAsOf(spark, h, c1).count() == 18L)
    // plain parquet refuses
    val p = tmpDir("asof-plain")
    rows(1 to 5).write.mode("overwrite").parquet(p)
    val e = intercept[IllegalArgumentException](TableLoader.openAsOf(spark, p, "0"))
    assert(e.getMessage.contains("time-travel"))
  }

  test("upsert dispatch: one call merges into any format; the token advances; plain refuses") {
    import org.apache.spark.sql.functions._
    def mergedOk(path: String): Unit = {
      val snap = TableLoader.open(spark, path)
      assert(snap.count() == 25L, s"$path: 20 base ∪ 5 new keys")
      assert(snap.where(col("id") === 3L).select("v").head().getLong(0) == 999L,
        s"$path: matched key must carry the batch value")
      assert(snap.where(col("id") === 10L).select("v").head().getLong(0) == 20L,
        s"$path: unmatched base row must survive untouched")
    }
    val batch = rows(1 to 5).withColumn("v", lit(999L))
      .unionByName(rows(21 to 25))

    val d = tmpDir("up-delta") + "/t"
    DeltaTableWriter.create(rows(1 to 20), d): Unit
    val dTok = TableLoader.upsert(batch, d, Seq("id"))
    assert(dTok == TableLoader.latestToken(spark, d)); mergedOk(d)

    val h = tmpDir("up-hudi") + "/t"
    HudiTableWriter.create(rows(1 to 20), h, recordKeys = Seq("id")): Unit
    val hTok = TableLoader.upsert(batch, h, Seq("id"))
    assert(hTok == TableLoader.latestToken(spark, h)); mergedOk(h)
    // a keys argument disagreeing with hoodie.properties refuses
    val eH = intercept[IllegalArgumentException](TableLoader.upsert(batch, h, Seq("v")))
    assert(eH.getMessage.contains("recordkey"))

    val i = tmpDir("up-ice") + "/t"
    IcebergTableWriter.create(rows(1 to 20), i): Unit
    val iTok = TableLoader.upsert(batch, i, Seq("id"))
    assert(iTok == TableLoader.latestToken(spark, i)); mergedOk(i)

    val g = tmpDir("up-graft")
    UpsertWriter.upsert(rows(1 to 20), g, Seq("id"), precombine = "v")
    val gTok = TableLoader.upsert(batch, g, Seq("id"))
    assert(gTok == TableLoader.latestToken(spark, g)); mergedOk(g)

    val p = tmpDir("up-plain")
    rows(1 to 5).write.mode("overwrite").parquet(p)
    val eP = intercept[IllegalArgumentException](TableLoader.upsert(batch, p, Seq("id")))
    assert(eP.getMessage.contains("merge contract"))
  }

  test("publishIcebergMirror: one data copy, two formats; republish syncs; refusals hold") {
    import org.apache.spark.sql.functions._
    val t = tmpDir("uniform") + "/t"
    DeltaTableWriter.create(rows(1 to 30), t): Unit
    DeltaTableWriter.append(rows(31 to 50), t): Unit
    TableLoader.publishIcebergMirror(spark, t): Unit
    // Delta stays primary; Iceberg reads the same files
    assert(TableLoader.detectFormat(spark, t) == TableLoader.DeltaFormat)
    val ice = IcebergTableReader.snapshot(spark, t)
    assert(ice.count() == 50L)
    assert(ice.select(sum("v")).head().getLong(0) ==
      DeltaTableReader.snapshot(spark, t).select(sum("v")).head().getLong(0))
    // the mirror references the SAME files — no data was copied
    assert(ice.inputFiles.map(_.split('/').last).toSet ==
      DeltaTableReader.snapshot(spark, t).inputFiles.map(_.split('/').last).toSet)
    // a later Delta append is invisible until republish (per-call sync)
    DeltaTableWriter.append(rows(51 to 60), t): Unit
    assert(IcebergTableReader.snapshot(spark, t).count() == 50L)
    TableLoader.publishIcebergMirror(spark, t): Unit
    assert(IcebergTableReader.snapshot(spark, t).count() == 60L)
    // a Delta compaction rewrite + republish must not resurrect old files
    DeltaTableWriter.compact(spark, t, targetFiles = 1): Unit
    TableLoader.publishIcebergMirror(spark, t): Unit
    assert(IcebergTableReader.snapshot(spark, t).count() == 60L)
    // DV-carrying tables refuse
    DeltaTableWriter.delete(spark, t, col("id") === 5L): Unit
    val eDv = intercept[IllegalArgumentException](TableLoader.publishIcebergMirror(spark, t))
    assert(eDv.getMessage.contains("deletion vectors"))
    // partitioned tables refuse
    val tp = tmpDir("uniform-part") + "/t"
    DeltaTableWriter.create(rows(1 to 10).withColumn("p", col("id") % 2),
      tp, partitionBy = Seq("p")): Unit
    val eP = intercept[IllegalArgumentException](TableLoader.publishIcebergMirror(spark, tp))
    assert(eP.getMessage.contains("partitioned"))
    // non-Delta refuses
    val ti = tmpDir("uniform-ice") + "/t"
    IcebergTableWriter.create(rows(1 to 5), ti): Unit
    val eI = intercept[IllegalArgumentException](TableLoader.publishIcebergMirror(spark, ti))
    assert(eI.getMessage.contains("DELTA"))
  }

  test("openChangeFeed dispatch: CDC feeds across formats; Hudi and plain refuse with directions") {
    import org.apache.spark.sql.functions._
    val batch = rows(3 to 5).withColumn("v", lit(999L)).unionByName(rows(21 to 22))

    // Delta: upsert commit → delete pre-images + inserts
    val d = tmpDir("cf-delta") + "/t"
    DeltaTableWriter.create(rows(1 to 20), d): Unit
    DeltaTableWriter.upsert(batch, d, Seq("id")): Unit
    val dFeed = TableLoader.openChangeFeed(spark, d, "0")
    assert(dFeed.where(col("_change_type") === "delete").count() == 3L)
    assert(dFeed.where(col("_change_type") === "insert").count() == 5L)

    // Iceberg: upsert snapshot → key-image deletes + inserts
    val i = tmpDir("cf-ice") + "/t"
    val s1 = IcebergTableWriter.create(rows(1 to 20), i)
    IcebergTableWriter.upsert(batch, i, Seq("id")): Unit
    val iFeed = TableLoader.openChangeFeed(spark, i, s1.toString)
    assert(iFeed.where(col("_change_type") === "delete").count() == 5L,
      "an equality delete names every batch key")
    assert(iFeed.where(col("_change_type") === "insert").count() == 5L)

    // graft versioned: the existing CDC derivation
    val g = tmpDir("cf-graft")
    UpsertWriter.upsert(rows(1 to 20), g, Seq("id"), precombine = "v")
    UpsertWriter.upsert(batch, g, Seq("id"), precombine = "v")
    val gFeed = TableLoader.openChangeFeed(spark, g, "1")
    assert(gFeed.count() > 0L && gFeed.columns.exists(_.contains("change")))

    // Hudi refuses toward the post-image pull; plain parquet refuses
    val h = tmpDir("cf-hudi") + "/t"
    HudiTableWriter.create(rows(1 to 10), h, recordKeys = Seq("id")): Unit
    val eH = intercept[IllegalArgumentException](TableLoader.openChangeFeed(spark, h, "0"))
    assert(eH.getMessage.contains("openIncremental"))
    val p = tmpDir("cf-plain")
    rows(1 to 5).write.mode("overwrite").parquet(p)
    val eP = intercept[IllegalArgumentException](TableLoader.openChangeFeed(spark, p, "0"))
    assert(eP.getMessage.contains("change feed"))
  }

  test("rename/drop dispatch: metadata commits on Delta and Iceberg; name-bound layouts refuse") {
    import org.apache.spark.sql.functions._
    // Delta needs column mapping for metadata renames — the dispatch
    // passes the writer's own refusal through for unmapped tables
    val d = tmpDir("rn-delta") + "/t"
    DeltaTableWriter.create(rows(1 to 10), d): Unit
    val eD = intercept[IllegalArgumentException](
      TableLoader.renameColumn(spark, d, "v", "value"))
    assert(eD.getMessage.contains("columnMapping"))
    // Iceberg renames + drops through the one-call dispatch
    val i = tmpDir("rn-ice") + "/t"
    IcebergTableWriter.create(rows(1 to 10).withColumn("x", lit(1L)), i): Unit
    TableLoader.renameColumn(spark, i, "v", "value")
    assert(TableLoader.open(spark, i).columns.toSeq == Seq("id", "value", "x"))
    TableLoader.dropColumn(spark, i, "x")
    assert(TableLoader.open(spark, i).columns.toSeq == Seq("id", "value"))
    // name-bound layouts refuse with the rewrite direction
    val h = tmpDir("rn-hudi") + "/t"
    HudiTableWriter.create(rows(1 to 10), h): Unit
    val eH = intercept[IllegalArgumentException](
      TableLoader.renameColumn(spark, h, "v", "value"))
    assert(eH.getMessage.contains("bind to column NAMES"))
    val eH2 = intercept[IllegalArgumentException](
      TableLoader.dropColumn(spark, h, "v"))
    assert(eH2.getMessage.contains("bind to column NAMES"))
  }
}
