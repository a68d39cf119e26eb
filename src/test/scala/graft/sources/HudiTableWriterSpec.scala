package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interop contract: what the writer lands must be a layout-true Hudi
  * COW table — the round trip goes through [[HudiTableReader]], which
  * is itself spec-locked against hand-built timeline fixtures.
  */
class HudiTableWriterSpec extends SparkSpec {

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"k$i", i * 2L)).toDF("id", "key", "v")
  }

  test("create + append round-trip; incremental pulls exactly the appended commit") {
    val table = tmpDir("hwr-basic") + "/t"
    val c1 = HudiTableWriter.create(df(1 to 60), table, recordKeys = Seq("id"))
    val snap1 = HudiTableReader.snapshot(spark, table)
    assert(snap1.count() == 60L)
    assert(snap1.select("_hoodie_commit_time").distinct().head().getString(0) == c1)
    assert(snap1.where(col("id") === 7L).select("_hoodie_record_key").head().getString(0)
      == "id:7")
    assert(TableLoader.detectFormat(spark, table) == TableLoader.HudiFormat)
    assert(TableLoader.open(spark, table).count() == 60L)

    val c2 = HudiTableWriter.append(df(61 to 90), table, recordKeys = Seq("id"))
    assert(c2 > c1, "instants must be strictly increasing")
    assert(HudiTableReader.snapshot(spark, table).count() == 90L)
    // incremental pull since c1: exactly the appended rows
    val inc = HudiTableReader.incrementalSince(spark, table, c1)
    assert(inc.count() == 30L)
    assert(inc.agg(min("id"), max("id")).head().toSeq == Seq(61L, 90L))
    // format-agnostic incremental dispatch takes the same instant token
    assert(TableLoader.openIncremental(spark, table, c1).count() == 30L)

    // a batch DROPPING a column refuses (evolution is additive only)
    val s = spark
    import s.implicits._
    val e = intercept[IllegalArgumentException](
      HudiTableWriter.append(Seq((1L, "x")).toDF("id", "key"), table))
    assert(e.getMessage.contains("ADDITIVE"))
    // create on an existing table refuses
    val e2 = intercept[IllegalArgumentException](HudiTableWriter.create(df(1 to 5), table))
    assert(e2.getMessage.contains("already"))
  }

  test("layout is Hudi-true: base-file naming, commit stats, COW properties") {
    val table = tmpDir("hwr-layout") + "/t"
    val c1 = HudiTableWriter.create(df(1 to 20), table, tableName = "evts")
    // base files follow <fileId>_<writeToken>_<instant>.parquet
    val bases = new java.io.File(table).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(bases.nonEmpty)
    assert(bases.forall(_.getName.endsWith(s"_$c1.parquet")))
    // hoodie.properties declares COPY_ON_WRITE (the reader's MOR gate reads this)
    val props = scala.io.Source.fromFile(s"$table/.hoodie/hoodie.properties").mkString
    assert(props.contains("hoodie.table.type=COPY_ON_WRITE"))
    assert(props.contains("hoodie.table.name=evts"))
    // the commit names every base file it landed
    val commit = scala.io.Source.fromFile(s"$table/.hoodie/$c1.commit").mkString
    bases.foreach(b => assert(commit.contains(b.getName)))
    // readOptimized == snapshot on a COW table
    assert(HudiTableReader.readOptimized(spark, table).count() == 20L)
  }

  test("record keys are a TABLE property: persisted at create, derived on append") {
    val table = tmpDir("hwr-keys") + "/t"
    HudiTableWriter.create(df(1 to 20), table, recordKeys = Seq("id", "key")): Unit
    val props = scala.io.Source.fromFile(s"$table/.hoodie/hoodie.properties").mkString
    assert(props.contains("hoodie.table.recordkey.fields=id,key"),
      "the declaration must ride hoodie.properties, Hudi's own key")
    assert(HudiTableWriter.declaredRecordKeys(spark, table) == Seq("id", "key"))
    // an append WITHOUT the argument still stamps the declared keys —
    // otherwise base files disagree on _hoodie_record_key and the
    // snapshot schema depends on which footer Spark samples
    HudiTableWriter.append(df(21 to 30), table): Unit
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.where(col("_hoodie_record_key").isNull).count() == 0L)
    assert(snap.where(col("id") === 25L).select("_hoodie_record_key").head().getString(0)
      == "id:25,key:k25")
    // an append asserting DIFFERENT keys refuses — the table wins
    val e = intercept[IllegalArgumentException](
      HudiTableWriter.append(df(31 to 40), table, recordKeys = Seq("id")))
    assert(e.getMessage.contains("recordkey"))
    // matching assertion is fine
    HudiTableWriter.append(df(31 to 40), table, recordKeys = Seq("id", "key")): Unit
    assert(HudiTableReader.snapshot(spark, table).count() == 40L)
  }

  test("partitioned COW: hive dirs land, stats key by partition, appends derive the fields") {
    import org.apache.spark.sql.functions._
    val table = tmpDir("hwr-part") + "/t"
    val c1 = HudiTableWriter.create(df(1 to 80), table,
      recordKeys = Seq("id"), partitionBy = Seq("key"))
    // hive-style partition dirs with base files inside
    val dirs = new java.io.File(table).listFiles().filter(_.isDirectory)
      .map(_.getName).filterNot(_.startsWith(".")).toSet
    assert(dirs.exists(_.startsWith("key=")), s"expected key= dirs, got $dirs")
    // partition columns stay IN the data files; rows carry the
    // _hoodie_partition_path meta column
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.count() == 80L)
    assert(snap.columns.contains("key") && snap.columns.contains("_hoodie_partition_path"))
    assert(snap.where(col("key") === "k3").select("_hoodie_partition_path")
      .head().getString(0) == "key=k3")
    // the commit's stats are keyed BY PARTITION (the reader's replay
    // resolves paths under the partition dirs)
    val commit = scala.io.Source.fromFile(s"$table/.hoodie/$c1.commit").mkString
    assert(commit.contains("\"key=k3\":["))
    // appends derive the partitioning from hoodie.properties
    assert(HudiTableWriter.declaredPartitionFields(spark, table) == Seq("key"))
    HudiTableWriter.append(df(81 to 100), table): Unit
    assert(HudiTableReader.snapshot(spark, table).count() == 100L)
    // incremental still works across partitioned commits
    assert(HudiTableReader.incrementalSince(spark, table, c1).count() == 20L)
    // timeline-level partition pruning: only the asked partition's
    // slices reach the scan
    val pruned = HudiTableReader.snapshotPruned(spark, table, _ == "key=k3")
    assert(pruned.count() == 1L)
    assert(pruned.inputFiles.forall(_.contains("key=k3")),
      s"pruned scan must touch only key=k3 files, got ${pruned.inputFiles.toSeq}")
    val e = intercept[IllegalArgumentException](
      HudiTableReader.snapshotPruned(spark, table, _ == "key=zzz"))
    assert(e.getMessage.contains("rejected every"))
  }

  test("MOR lifecycle: createMor → updateLog → deleteLog → realtime merge → compact → RO equality") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val table = tmpDir("hwr-mor") + "/t"
    HudiTableWriter.createMor(df(1 to 100), table, recordKeys = Seq("id")): Unit
    val props = scala.io.Source.fromFile(s"$table/.hoodie/hoodie.properties").mkString
    assert(props.contains("hoodie.table.type=MERGE_ON_READ"))
    assert(HudiTableReader.isMor(spark, table))
    assert(HudiTableReader.snapshot(spark, table).count() == 100L)

    // updates land as log blocks — NO base file is rewritten
    val basesBefore = new java.io.File(table).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    HudiTableWriter.updateLog(
      df(1 to 10).withColumn("v", col("v") + 1000L), table): Unit
    val basesAfter = new java.io.File(table).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(basesAfter == basesBefore, "a log append must not touch base files")
    assert(new java.io.File(table).listFiles().exists(_.getName.contains(".log.")),
      "the update must land as a log file")
    val rt1 = HudiTableReader.snapshot(spark, table)
    assert(rt1.count() == 100L)
    assert(rt1.where(col("id") === 3L).select("v").head().getLong(0) == 1006L,
      "the real-time view must serve the log-updated value")
    assert(rt1.where(col("id") === 50L).select("v").head().getLong(0) == 100L)
    // the RO view is stale by contract
    assert(HudiTableReader.readOptimized(spark, table)
      .where(col("id") === 3L).select("v").head().getLong(0) == 6L)

    // a second update to the SAME key: latest block wins
    HudiTableWriter.updateLog(
      df(3 to 3).withColumn("v", col("v") + 5000L), table): Unit
    assert(HudiTableReader.snapshot(spark, table)
      .where(col("id") === 3L).select("v").head().getLong(0) == 5006L)

    // deletes land as tombstone blocks
    HudiTableWriter.deleteLog(Seq(5L, 6L).toDF("id"), table): Unit
    val rt2 = HudiTableReader.snapshot(spark, table)
    assert(rt2.count() == 98L)
    assert(rt2.where(col("id").isin(5L, 6L)).count() == 0L)

    // compaction folds logs into base files; RO == pre-compaction realtime
    val pre = rt2.select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    HudiTableWriter.compact(spark, table): Unit
    val ro = HudiTableReader.readOptimized(spark, table)
      .select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ro == pre, "post-compaction RO view must equal the pre-compaction real-time view")
    assert(HudiTableReader.snapshot(spark, table).count() == 98L)
    // compacting again with no pending logs refuses
    val e = intercept[IllegalArgumentException](HudiTableWriter.compact(spark, table))
    assert(e.getMessage.contains("nothing to compact"))

    // updates after compaction keep working (fresh log generation)
    HudiTableWriter.updateLog(df(7 to 7).withColumn("v", lit(42L)), table): Unit
    assert(HudiTableReader.snapshot(spark, table)
      .where(col("id") === 7L).select("v").head().getLong(0) == 42L)
    // POINT-IN-TIME realtime: the timeline cut BEFORE the last update
    // serves the compacted state (id 7 still deleted-era value)
    val instants = new java.io.File(s"$table/.hoodie").listFiles()
      .map(_.getName).filter(n => n.endsWith(".commit") || n.endsWith(".deltacommit"))
      .map(_.takeWhile(_ != '.')).sorted
    val atCompaction = instants(instants.length - 2) // the compaction instant
    val asOf = HudiTableReader.snapshotAsOf(spark, table, atCompaction)
    assert(asOf.count() == 98L)
    assert(asOf.where(col("id").isin(5L, 6L)).count() == 0L,
      "the as-of cut keeps the pre-compaction deletes")
    assert(asOf.where(col("id") === 7L).select("v").head().getLong(0) == 1014L,
      "the as-of cut must show id 7 before the POST-compaction update")
  }

  test("PARTITIONED MOR: logs land beside their partition's base; stats key by partition; compact keeps the layout") {
    val s = spark
    import s.implicits._
    val table = tmpDir("hwr-mor-part") + "/t"
    val base = Seq((1L, "us", 10L), (2L, "us", 20L), (3L, "eu", 30L), (4L, "eu", 40L))
      .toDF("id", "region", "v")
    HudiTableWriter.createMor(base, table, recordKeys = Seq("id"),
      partitionBy = Seq("region")): Unit
    // base files live under hive dirs
    assert(new java.io.File(s"$table/region=us").listFiles()
      .exists(_.getName.endsWith(".parquet")))
    // update one key per partition; the LOG files must land IN the dirs
    HudiTableWriter.updateLog(
      Seq((1L, "us", 11L), (3L, "eu", 33L)).toDF("id", "region", "v"), table): Unit
    assert(new java.io.File(s"$table/region=us").listFiles()
      .exists(_.getName.contains(".log.")),
      "a group's log files must land beside its base, in the partition dir")
    assert(new java.io.File(s"$table/region=eu").listFiles()
      .exists(_.getName.contains(".log.")))
    // the deltacommit's stats key BY PARTITION
    val dc = new java.io.File(s"$table/.hoodie").listFiles()
      .filter(_.getName.endsWith(".deltacommit")).map(f =>
        scala.io.Source.fromFile(f).mkString).mkString
    assert(dc.contains(""""region=us":[""") && dc.contains(""""region=eu":["""))
    // the real-time view merges per partition
    val rt = HudiTableReader.snapshot(spark, table)
    assert(rt.count() == 4L)
    assert(rt.where(col("id") === 1L).head().getAs[Long]("v") == 11L)
    assert(rt.where(col("id") === 3L).head().getAs[Long]("v") == 33L)
    // compaction lands the new bases back under their partition dirs
    HudiTableWriter.compact(spark, table): Unit
    val ro = HudiTableReader.readOptimized(spark, table)
    assert(ro.count() == 4L && ro.where(col("id") === 1L).head().getAs[Long]("v") == 11L)
    // the dirty group's NEW slice (latest instant in its name) landed
    // in the partition dir, next to the untouched bases
    val usBases = new java.io.File(s"$table/region=us").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName)
    val instants = usBases.map(_.split('_').last.stripSuffix(".parquet")).distinct.sorted
    assert(instants.length == 2 &&
      usBases.count(_.endsWith(s"_${instants.last}.parquet")) == 1,
      s"compaction must land exactly the dirty group's new slice in the partition dir " +
        s"(saw ${usBases.mkString(", ")})")
  }

  test("MOR incremental: touched groups only, stamp-filtered, tombstones absent") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val table = tmpDir("hwr-mor-inc") + "/t"
    // group A: ids 1..50 (single file); group B appended later
    HudiTableWriter.createMor(df(1 to 50).coalesce(1), table, recordKeys = Seq("id")): Unit
    val c2 = HudiTableWriter.append(df(51 to 100).coalesce(1), table)
    // log ops touch group A only
    HudiTableWriter.updateLog(df(1 to 5).withColumn("v", col("v") + 1000L), table): Unit
    HudiTableWriter.deleteLog(Seq(7L).toDF("id"), table): Unit
    val inc = HudiTableReader.incrementalSince(spark, table, c2)
    assert(inc.select("id").collect().map(_.getLong(0)).toSet == (1L to 5L).toSet,
      "only post-checkpoint upserts surface; carried-forward rows and tombstones do not")
    assert(inc.where(col("id") === 3L).select("v").head().getLong(0) == 1006L)
    // group B (untouched since the checkpoint) is never scanned
    val bBase = new java.io.File(table).listFiles()
      .filter(f => f.getName.endsWith(s"_$c2.parquet")).map(_.getName)
    assert(bBase.nonEmpty)
    assert(!inc.inputFiles.exists(f => bBase.exists(f.contains)),
      "untouched file groups must not enter the incremental scan")
    // the full pull since table birth serves everything live
    val incAll = HudiTableReader.incrementalSince(spark, table, "0")
    assert(incAll.count() == 99L) // 100 minus the tombstoned id 7
  }

  test("MOR change feed: upsert post-images + delete key-images; compaction silent; the fold reproduces realtime") {
    val s = spark
    import s.implicits._
    val table = tmpDir("hwr-mor-cdc") + "/t"
    val c1 = HudiTableWriter.createMor(df(1 to 20).coalesce(1), table,
      recordKeys = Seq("id"))
    HudiTableWriter.updateLog(
      Seq((3L, "k3b", 333L), (4L, "k4b", 444L)).toDF("id", "key", "v"), table): Unit
    HudiTableWriter.deleteLog(Seq(Tuple1(7L)).toDF("id"), table): Unit
    HudiTableWriter.upsert(
      Seq((5L, "k5b", 555L), (21L, "k21", 42L)).toDF("id", "key", "v"), table): Unit
    HudiTableWriter.compact(spark, table): Unit
    val feed = HudiTableReader.changeFeedSince(spark, table, c1)
    feed.cache()
    // upserts: 2 log updates + morUpsert's 1 update + 1 insert
    assert(feed.where(col("_change_type") === "upsert").count() == 4L)
    assert(feed.where(col("_change_type") === "upsert" && col("id") === 3L)
      .head().getAs[Long]("v") == 333L)
    // deletes: key-image only
    val del = feed.where(col("_change_type") === "delete")
    assert(del.count() == 1L)
    assert(del.head().getAs[String]("_hoodie_record_key") == "id:7")
    assert(del.head().getAs[java.lang.Long]("v") == null,
      "a tombstone names a key, not a row")
    // compaction contributed NOTHING (no logical change)
    val instants = feed.select("_commit_instant").distinct().count()
    assert(instants == 3L, s"3 data-changing instants expected, got $instants")
    // THE property: folding the feed (per instant: delete-by-key,
    // then upsert-by-key) onto the bootstrap reproduces realtime
    var mirror = HudiTableReader.realtimeAsOf(spark, table, c1)
      .select("_hoodie_record_key", "id", "key", "v")
    feed.select("_commit_instant").distinct().collect().map(_.getString(0)).sorted
      .foreach { i =>
        val dels = feed.where(col("_commit_instant") === i &&
          col("_change_type") === "delete").select("_hoodie_record_key")
        val ups = feed.where(col("_commit_instant") === i &&
          col("_change_type") === "upsert")
          .select("_hoodie_record_key", "id", "key", "v")
        mirror = mirror
          .join(dels, Seq("_hoodie_record_key"), "left_anti")
          .join(ups.select("_hoodie_record_key"), Seq("_hoodie_record_key"), "left_anti")
          .unionByName(ups)
          .localCheckpoint()
      }
    val now = HudiTableReader.snapshot(spark, table)
      .select("_hoodie_record_key", "id", "key", "v")
    assert(mirror.exceptAll(now).isEmpty && now.exceptAll(mirror).isEmpty,
      "the folded feed must reproduce the head real-time view")
    feed.unpersist()
    // COW tables refuse toward the post-image pull; the dispatch serves MOR
    val cow = tmpDir("hwr-cdc-cow") + "/t"
    HudiTableWriter.create(df(1 to 5), cow, recordKeys = Seq("id")): Unit
    val e = intercept[IllegalArgumentException](
      TableLoader.openChangeFeed(spark, cow, "0"))
    assert(e.getMessage.contains("openIncremental"))
    assert(TableLoader.openChangeFeed(spark, table, c1).count() == feed.count())
  }

  test("MOR guardrails: COW tables refuse log ops; unknown keys refuse routing") {
    val s = spark
    import s.implicits._
    val cow = tmpDir("hwr-mor-cow") + "/t"
    HudiTableWriter.create(df(1 to 10), cow, recordKeys = Seq("id")): Unit
    val e1 = intercept[IllegalArgumentException](HudiTableWriter.updateLog(df(1 to 2), cow))
    assert(e1.getMessage.contains("COPY_ON_WRITE"))
    val mor = tmpDir("hwr-mor-route") + "/t"
    HudiTableWriter.createMor(df(1 to 10), mor, recordKeys = Seq("id")): Unit
    // a key no base file holds cannot be routed to a file group
    val e2 = intercept[IllegalArgumentException](
      HudiTableWriter.updateLog(df(999 to 999), mor))
    assert(e2.getMessage.contains("no base file group"))
    val e3 = intercept[IllegalArgumentException](
      HudiTableWriter.deleteLog(Seq(999L).toDF("id"), mor))
    assert(e3.getMessage.contains("no base file group"))
    // keyless MOR create refuses up front
    val e4 = intercept[IllegalArgumentException](
      HudiTableWriter.createMor(df(1 to 5), tmpDir("hwr-mor-nokey") + "/t"))
    assert(e4.getMessage.contains("record keys"))
  }
}
