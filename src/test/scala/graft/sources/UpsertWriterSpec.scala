package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.{col, count, input_file_name, lit, max, min, sum}

class UpsertWriterSpec extends SparkSpec {

  private def df(rows: (Long, Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("k", "ver", "payload")
  }

  test("merge: latest precombine wins, deterministic on ties via tiebreakers") {
    val in = df((1L, 1L, "old"), (1L, 2L, "new"), (2L, 1L, "only"))
    val out = UpsertWriter.merge(in, Seq("k"), "ver")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "new", 2L -> "only"))

    // tie on ver: tiebreaker column decides, not input order
    val tie = df((1L, 1L, "a"), (1L, 1L, "b"))
      .withColumn("src", org.apache.spark.sql.functions.expr("CASE WHEN payload='b' THEN 1 ELSE 0 END"))
    val won = UpsertWriter.merge(tie, Seq("k"), "ver", tiebreakers = Seq("src"))
      .collect().map(_.getString(2))
    assert(won.sameElements(Array("b")))
  }

  test("merge equals the window-based oracle shape on sf0.001 events") {
    val events = TableLoader.table(spark, sfDir, "events")
    val a = UpsertWriter.merge(events, Seq("user_id"), "ts", Seq("event_id"))
    val b = UpsertWriter.mergeViaWindow(events, Seq("user_id"), "ts", Seq("event_id"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("upsert: immutable versions, latest-read, updates win, cleaner retains") {
    val table = tmpDir("graft-upsert-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "v1"), (2L, 1L, "x")), table, Seq("k"), "ver")
    assert(UpsertWriter.latestVersion(spark, table).get.endsWith("v00000001"))

    // second upsert: same key, same precombine — the UPDATE must win
    UpsertWriter.upsert(df((1L, 1L, "v2")), table, Seq("k"), "ver")
    val out = UpsertWriter.read(spark, table)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "v2", 2L -> "x"))
    assert(UpsertWriter.latestVersion(spark, table).get.endsWith("v00000002"))

    // a third upsert triggers the cleaner (keepVersions=2): v1 is gone
    UpsertWriter.upsert(df((3L, 1L, "y")), table, Seq("k"), "ver")
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(table, "v00000001")))
    assert(fs.exists(new Path(table, "v00000002")))
    assert(UpsertWriter.read(spark, table).count() == 3)
  }

  test("additive schema evolution: new update column back-fills null for old rows") {
    val s = spark
    import s.implicits._
    val table = tmpDir("graft-upsert-evo-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "a"), (2L, 1L, "b")), table, Seq("k"), "ver")
    // v2 updates arrive with a NEW column
    val evolved = Seq((2L, 2L, "b2", "fresh")).toDF("k", "ver", "payload", "tag")
    UpsertWriter.upsert(evolved, table, Seq("k"), "ver")
    val out = UpsertWriter.read(spark, table)
      .select("k", "payload", "tag")
      .collect().map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2)))).toMap
    assert(out == Map(1L -> ("a", None), 2L -> ("b2", Some("fresh"))))

    // and updates MISSING a column keep the table's values for other rows
    UpsertWriter.upsert(df((3L, 1L, "c")), table, Seq("k"), "ver")
    val out2 = UpsertWriter.read(spark, table)
      .select("k", "tag")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out2 == Map(1L -> None, 2L -> Some("fresh"), 3L -> None))
  }

  test("time travel: read a past version; diff between versions is the upsert's change") {
    val s = spark
    import s.implicits._
    val table = tmpDir("graft-upsert-tt-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "a"), (2L, 1L, "b")), table, Seq("k"), "ver", keepVersions = 3)
    UpsertWriter.upsert(df((2L, 2L, "b2"), (3L, 1L, "c")), table, Seq("k"), "ver", keepVersions = 3)
    assert(UpsertWriter.versions(spark, table) == Seq(1, 2))

    val v1 = UpsertWriter.readVersion(spark, table, 1)
    assert(v1.collect().map(r => r.getLong(0) -> r.getString(2)).toMap == Map(1L -> "a", 2L -> "b"))

    // CDC between retained versions: exactly the second upsert's changes
    val changes = graft.operators.SnapshotDiff.diff(
        v1, UpsertWriter.readVersion(spark, table, 2), keys = Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(changes == Set((2L, "update"), (3L, "insert")))

    // beyond the retained window / unknown version: loud failure
    intercept[IllegalArgumentException] {
      UpsertWriter.readVersion(spark, table, 7)
    }
  }

  test("crash safety: an uncommitted version directory is invisible") {
    val table = tmpDir("graft-upsert-crash-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "good")), table, Seq("k"), "ver")
    // simulate a writer that died before its commit marker
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(table, "v00000002"))
    assert(UpsertWriter.latestVersion(spark, table).get.endsWith("v00000001"))
    assert(UpsertWriter.read(spark, table).count() == 1)
    // and the next upsert reclaims the debris dir
    UpsertWriter.upsert(df((2L, 1L, "next")), table, Seq("k"), "ver")
    assert(UpsertWriter.read(spark, table).count() == 2)
  }

  test("file sizing: small tables bin-pack to one file, tiny targets split") {
    val events = TableLoader.table(spark, sfDir, "events")
    val one = tmpDir("graft-upsert-size1-") + "/t"
    UpsertWriter.upsert(events, one, Seq("event_id"), "ts") // default 512MB target
    val fs = new Path(one).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partFiles(table: String): Int = {
      val vdir = new Path(UpsertWriter.latestVersion(spark, table).get)
      fs.listStatus(vdir).count(_.getPath.getName.startsWith("part-"))
    }
    assert(partFiles(one) == 1) // no small-file spray

    val many = tmpDir("graft-upsert-size2-") + "/t"
    UpsertWriter.upsert(events, many, Seq("event_id"), "ts", targetFileBytes = 4 * 1024)
    assert(partFiles(many) > 1) // tiny target caps per-file size
  }

  test("compact: collapses a small-file version content-identically, as a new version") {
    val events = TableLoader.table(spark, sfDir, "events")
    val table = tmpDir("graft-compact-") + "/t"
    // spray small files deliberately, then compact them away
    UpsertWriter.upsert(events, table, Seq("event_id"), "ts", targetFileBytes = 4 * 1024)
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partFiles(): Int = {
      val vdir = new Path(UpsertWriter.latestVersion(spark, table).get)
      fs.listStatus(vdir).count(_.getPath.getName.startsWith("part-"))
    }
    val before = partFiles()
    assert(before > 1)
    val vBefore = UpsertWriter.versions(spark, table).max
    UpsertWriter.compact(spark, table) // default 512MB target -> 1 file
    assert(partFiles() == 1)
    assert(UpsertWriter.versions(spark, table).max == vBefore + 1, "compaction commits a new version")
    val back = UpsertWriter.read(spark, table)
    assert(back.count() == events.count())
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty)
  }

  test("compact with zOrderBy: content-identical rewrite, files cover narrow ranges of BOTH z columns") {
    val s = spark
    import s.implicits._
    val table = tmpDir("graft-zcluster-") + "/t"
    // 32x32 grid written in row-major order: a linear sort would give
    // each file the FULL y range
    val grid = (0 until 32).flatMap(x => (0 until 32).map(y => (x.toLong * 32 + y, x, y)))
      .toDF("id", "x", "y")
    UpsertWriter.upsert(grid, table, Seq("id"), "id")
    val vBefore = UpsertWriter.versions(spark, table).max
    UpsertWriter.compact(spark, table, targetFileBytes = 1024, zOrderBy = Seq("x", "y"))
    assert(UpsertWriter.versions(spark, table).max == vBefore + 1)
    val back = UpsertWriter.read(spark, table)
    assert(back.exceptAll(grid).isEmpty && grid.exceptAll(back).isEmpty)
    // per-file spans: each z-clustered file must cover well under the
    // full 0..31 range on BOTH columns (the point of the Morton curve)
    val spans = spark.read.parquet(UpsertWriter.latestVersion(spark, table).get)
      .select(col("x"), col("y"), input_file_name().as("f"))
      .groupBy("f")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(spans.length > 1, "sizing must produce multiple files")
    // a row-major (linear-sort) layout spans the full 0..31 y range in
    // EVERY file (mean 31); z-order files stay near-square except where
    // one straddles a high-level curve boundary — so judge the MEAN
    val meanSpan = spans.map(r => math.max(r.getInt(1), r.getInt(2)).toDouble).sum / spans.length
    assert(meanSpan < 20, s"z-clustered files span too much per axis on average: $meanSpan")
  }

  test("delete: tombstoned keys vanish as a new version; unknown keys are a no-op") {
    val s = spark
    import s.implicits._
    val table = tmpDir("graft-delete-") + "/t"
    val in = Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c")).toDF("k", "ver", "payload")
    UpsertWriter.upsert(in, table, Seq("k"), "ver")
    UpsertWriter.delete(spark, table, Seq(2L, 99L).toDF("k"), Seq("k"))
    val after = UpsertWriter.read(spark, table).select("k").collect().map(_.getLong(0)).toSet
    assert(after == Set(1L, 3L))
    assert(UpsertWriter.versions(spark, table).size == 2, "delete committed a new version")
    // time travel still sees the pre-delete snapshot
    val v1 = UpsertWriter.readVersion(spark, table, 1).select("k")
      .collect().map(_.getLong(0)).toSet
    assert(v1 == Set(1L, 2L, 3L))
  }

  test("restore: an older snapshot re-commits as a NEW version (append-only timeline)") {
    val s = spark
    import s.implicits._
    val table = tmpDir("graft-restore-") + "/t"
    UpsertWriter.upsert(Seq((1L, 1L, "v1")).toDF("k", "ver", "p"), table,
      Seq("k"), "ver", keepVersions = 5)
    UpsertWriter.upsert(Seq((1L, 2L, "v2"), (2L, 2L, "v2")).toDF("k", "ver", "p"), table,
      Seq("k"), "ver", keepVersions = 5)
    UpsertWriter.restore(spark, table, version = 1, keepVersions = 5)
    // timeline grew to v3; live content == v1's
    assert(UpsertWriter.versions(spark, table) == Seq(1, 2, 3))
    val live = UpsertWriter.read(spark, table)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(live == Set((1L, "v1")))
    // the rolled-back state is still reachable for incremental diffing
    assert(UpsertWriter.readVersion(spark, table, 2).count() == 2L)
  }

  test("insertOverwrite: named partitions replaced, others byte-identical, old snapshot retained") {
    val s = spark
    import s.implicits._
    val table = tmpDir("graft-iow-") + "/t"
    val base = Seq((1L, 1L, "a", "p1"), (2L, 1L, "b", "p1"), (3L, 1L, "c", "p2"))
      .toDF("k", "ver", "payload", "part")
    UpsertWriter.upsert(base, table, Seq("k"), "ver")
    val replacement = Seq((9L, 2L, "Z", "p1")).toDF("k", "ver", "payload", "part")
    UpsertWriter.insertOverwrite(spark, table, replacement, Seq("part"))
    val out = UpsertWriter.read(spark, table)
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[String]("payload"), r.getAs[String]("part")))).toMap
    // p1 is wholly replaced (keys 1,2 gone, 9 in); p2 untouched
    assert(out == Map(9L -> ("Z", "p1"), 3L -> ("c", "p2")))
    // time travel: the pre-overwrite snapshot is still readable
    assert(UpsertWriter.readVersion(spark, table, 1).count() == 3)
  }

  test("patch rejects a duplicate-keyed batch loudly (guard folded into the join pass)") {
    val s = spark
    import s.implicits._
    val table = tmpDir("graft-patch-dup-") + "/t"
    UpsertWriter.upsert(Seq((1L, 10L, 1L), (2L, 20L, 1L)).toDF("k", "score", "v"),
      table, Seq("k"), "v")
    val dup = Seq((1L, 5L), (1L, 6L)).toDF("k", "score")
    val e = intercept[Exception] { UpsertWriter.patch(spark, table, dup, Seq("k")) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("duplicate record keys")),
      s"expected the duplicate-key guard, got: ${e.getMessage}")
    // the failed patch must not have committed a new version
    assert(UpsertWriter.versions(spark, table) == Seq(1))
  }

  test("patch: only the patch's columns change; patch nulls SET null; unknown keys ignored") {
    val s = spark
    import s.implicits._
    val table = tmpDir("graft-patch-") + "/t"
    UpsertWriter.upsert(
      Seq((1L, 1L, "a", 10L), (2L, 1L, "b", 20L)).toDF("k", "ver", "payload", "score"),
      table, Seq("k"), "ver")
    // patch k=1 (score -> null explicitly), k=7 (absent from table: ignored)
    val patchDf = Seq((1L, Option.empty[Long]), (7L, Some(99L))).toDF("k", "score")
    UpsertWriter.patch(spark, table, patchDf, Seq("k"))
    val rows = UpsertWriter.read(spark, table).collect()
      .map { r =>
        val si = r.fieldIndex("score")
        r.getAs[Long]("k") ->
          ((r.getAs[String]("payload"), if (r.isNullAt(si)) None else Some(r.getLong(si))))
      }.toMap
    assert(rows == Map(1L -> ("a", None), 2L -> ("b", Some(20L))))
    // a patch column not in the table schema must fail loudly
    intercept[IllegalArgumentException] {
      UpsertWriter.patch(spark, table, Seq((1L, 5L)).toDF("k", "nope"), Seq("k"))
    }
  }

  test("hive-style partitioned + clustered write") {
    val table = tmpDir("graft-upsert-part-") + "/t"
    val s = spark
    import s.implicits._
    val in = Seq((1L, 1L, "a", "p1"), (2L, 1L, "b", "p2")).toDF("k", "ver", "payload", "part")
    UpsertWriter.upsert(in, table, Seq("k"), "ver", partitionBy = Seq("part"), clusterBy = Seq("k"))
    val vdir = UpsertWriter.latestVersion(spark, table).get
    val fs = new Path(vdir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(vdir, "part=p1")) && fs.exists(new Path(vdir, "part=p2")))
    assert(UpsertWriter.read(spark, table).count() == 2)
    // history must count the data files INSIDE the partition dirs —
    // a flat listing reports 0 files while n_rows says 2
    val h = UpsertWriter.history(spark, table).collect()
    assert(h.length == 1 && h.head.getAs[Long]("n_rows") == 2L)
    assert(h.head.getAs[Long]("n_files") >= 2L,
      s"partitioned version must report its per-partition data files, got ${h.head}")
  }

  test("clean: out-of-band retention; latest snapshot untouched") {
    val table = tmpDir("graft-clean-") + "/t"
    // writers opt out of inline cleaning with a large keepVersions
    UpsertWriter.upsert(df((1L, 1L, "a")), table, Seq("k"), "ver", keepVersions = 99)
    UpsertWriter.upsert(df((1L, 2L, "b")), table, Seq("k"), "ver", keepVersions = 99)
    UpsertWriter.upsert(df((1L, 3L, "c")), table, Seq("k"), "ver", keepVersions = 99)
    assert(UpsertWriter.versions(spark, table) == Seq(1, 2, 3))
    // the async service enforces the real retention
    val dropped = UpsertWriter.clean(spark, table, keepVersions = 1)
    assert(dropped == Seq(1, 2))
    assert(UpsertWriter.versions(spark, table) == Seq(3))
    assert(UpsertWriter.read(spark, table)
      .collect().map(_.getString(2)).sameElements(Array("c")))
    // idempotent: nothing left beyond retention
    assert(UpsertWriter.clean(spark, table, keepVersions = 1).isEmpty)
  }

  test("upsertConcurrent: two racing writers — both rows land, linear timeline, no lost update") {
    val table = tmpDir("graft-occ-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "base")), table, Seq("k"), "ver", keepVersions = 5)

    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(rows: (Long, Long, String)*): Runnable = () => {
      start.await()
      try UpsertWriter.upsertConcurrent(df(rows: _*), table, Seq("k"), "ver", keepVersions = 5)
      catch { case t: Throwable => failures.add(t) }
    }
    pool.submit(writer((2L, 1L, "from-A")))
    pool.submit(writer((3L, 1L, "from-B")))
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "writers did not finish")
    assert(failures.isEmpty, s"writer failed: ${Option(failures.peek()).map(_.toString)}")

    // no lost update: the loser rebased on the winner's commit
    val rows = UpsertWriter.read(spark, table)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rows == Map(1L -> "base", 2L -> "from-A", 3L -> "from-B"))
    // linear timeline: base v1, then exactly one version per writer
    assert(UpsertWriter.versions(spark, table) == Seq(1, 2, 3))
  }

  test("upsertConcurrent: stale claim from a crashed writer is broken and re-taken") {
    val table = tmpDir("graft-occ-stale-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "base")), table, Seq("k"), "ver", keepVersions = 5)
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crashed writer claimed v2 (from ANOTHER process — no JVM entry)
    // and never committed; its claim goes stale after claimStaleMs
    fs.createNewFile(new Path(table, "v00000002_claim"))
    Thread.sleep(30)
    UpsertWriter.upsertConcurrent(df((2L, 1L, "after-crash")), table, Seq("k"), "ver",
      keepVersions = 5, claimStaleMs = 10)
    assert(UpsertWriter.versions(spark, table) == Seq(1, 2))
    assert(UpsertWriter.read(spark, table).count() == 2)
  }

  test("commit metadata rides the version: readMeta sees the latest commit's map") {
    val table = tmpDir("graft-meta-") + "/t"
    assert(UpsertWriter.readMeta(spark, table).isEmpty)
    UpsertWriter.upsert(df((1L, 1L, "a")), table, Seq("k"), "ver",
      meta = Map("graft.appliedBatchId" -> "7", "note" -> "first"))
    // caller meta rides alongside the table's own key declarations
    // (record keys + precombine, written on every upsert commit)
    assert(UpsertWriter.readMeta(spark, table) == Map(
      "graft.appliedBatchId" -> "7", "note" -> "first",
      UpsertWriter.RecordKeysKey -> "k", UpsertWriter.PrecombineKey -> "ver"))
    // CALLER metadata is PER VERSION: a commit without meta carries
    // only the standing key declarations
    UpsertWriter.upsert(df((2L, 1L, "b")), table, Seq("k"), "ver")
    assert(UpsertWriter.readMeta(spark, table) == Map(
      UpsertWriter.RecordKeysKey -> "k", UpsertWriter.PrecombineKey -> "ver"))
  }

  test("a committed version is never clobbered: slow writer with a broken claim aborts, no lost update") {
    val table = tmpDir("graft-occ-slow-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "base")), table, Seq("k"), "ver", keepVersions = 5)
    // Simulate the advisor's lost-update scenario: writer A (another
    // process) claimed v2 but is slow; B breaks the stale claim and
    // COMMITS v2. A then wakes up and tries to write v2 — the commit
    // marker must make A abort instead of deleting B's data.
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.createNewFile(new Path(table, "v00000002_claim")) // A's stale claim
    Thread.sleep(30)
    UpsertWriter.upsertConcurrent(df((2L, 1L, "from-B")), table, Seq("k"), "ver",
      keepVersions = 5, claimStaleMs = 10) // B breaks it and commits v2
    // A resumes its write against its STALE view of the timeline
    // (only v1 committed, next = v2) — exactly mergeAndCommit's path —
    // and must fail loudly on the commit marker...
    intercept[java.util.ConcurrentModificationException] {
      UpsertWriter.mergeAndCommit(df((9L, 9L, "from-A")), spark, fs, new Path(table),
        versions = Seq(1 -> new Path(table, "v00000001")), nextNum = 2,
        recordKeys = Seq("k"), precombine = "ver", partitionBy = Nil, clusterBy = Nil,
        keepVersions = 5, targetFileBytes = 512L * 1024 * 1024)
    }
    // ...and B's committed row survives
    val rows = UpsertWriter.read(spark, table)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rows == Map(1L -> "base", 2L -> "from-B"))
  }

  test("upsertConcurrent: live contention exhausts maxAttempts loudly") {
    val table = tmpDir("graft-occ-contend-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "base")), table, Seq("k"), "ver", keepVersions = 5)
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a LIVE competing claim (fresh mtime, never commits): the writer
    // must give up after maxAttempts instead of spinning forever
    fs.createNewFile(new Path(table, "v00000002_claim"))
    intercept[IllegalStateException] {
      UpsertWriter.upsertConcurrent(df((2L, 1L, "blocked")), table, Seq("k"), "ver",
        keepVersions = 5, maxAttempts = 2)
    }
  }

  test("purge: subject vanishes from live AND history; timeline, metadata, other rows intact") {
    val s = spark
    import s.implicits._
    val table = tmpDir("graft-purge-") + "/t"
    // record key = k, subject column = user (not the record key)
    val v1 = Seq((1L, 7L, "a1"), (2L, 8L, "b1"), (3L, 7L, "c1"))
      .toDF("k", "user", "payload").withColumn("ver", col("k") * 0 + 1)
    val v2 = Seq((2L, 8L, "b2"), (4L, 9L, "d1")).toDF("k", "user", "payload")
      .withColumn("ver", col("k") * 0 + 2)
    UpsertWriter.upsert(v1, table, Seq("k"), "ver", keepVersions = 5,
      meta = Map("who" -> "writer1"))
    UpsertWriter.upsert(v2, table, Seq("k"), "ver", keepVersions = 5)
    val rewritten = UpsertWriter.purge(spark, table, Seq(7L).toDF("user"), Seq("user"))
    assert(rewritten == Seq(1, 2))
    // live: user 7's records gone, others intact
    val live = UpsertWriter.read(spark, table)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(live == Set(2L, 4L))
    // HISTORY: time travel to v1 must not resurrect the subject
    val old = UpsertWriter.readVersion(spark, table, 1)
      .select("k", "user").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(old == Set((2L, 8L)), s"purged subject leaked from history: $old")
    // timeline shape and commit metadata preserved
    assert(UpsertWriter.versions(spark, table) == Seq(1, 2))
    // a fresh upsert after the purge works on the rewritten table
    UpsertWriter.upsert(Seq((5L, 10L, "e1", 3L)).toDF("k", "user", "payload", "ver"),
      table, Seq("k"), "ver", keepVersions = 5)
    assert(UpsertWriter.read(spark, table).count() == 3L)
  }

  test("purge recovery: a crash in ANY swap window rolls forward or back; no committed version lost") {
    val s = spark
    import s.implicits._
    val table = tmpDir("graft-purge-rec-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "keep"), (2L, 1L, "subject")), table, Seq("k"), "ver")
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(root, "v00000001")
    val old = new Path(root, "v00000001.old")
    val staged = new Path(root, "v00000001.purging")

    // window 1: staged rewrite is COMPLETE (data + marker), live dir
    // already stepped aside, crash before staged -> dir. Roll FORWARD.
    Seq((1L, 1L, "keep")).toDF("k", "ver", "payload")
      .write.mode("overwrite").parquet(staged.toString)
    fs.create(new Path(staged, "_graft_commit"), true).close()
    assert(fs.rename(dir, old))
    UpsertWriter.recoverPurgeDebris(fs, root)
    assert(!fs.exists(old) && !fs.exists(staged), "debris must be consumed")
    assert(UpsertWriter.read(spark, table).select("payload").head().getString(0) == "keep",
      "complete staged rewrite must win the swap")

    // window 2: staged rewrite INCOMPLETE (no marker), live dir aside.
    // Roll BACK — the original committed version must survive.
    Seq((9L, 9L, "torn")).toDF("k", "ver", "payload")
      .write.mode("overwrite").parquet(staged.toString) // no marker
    assert(fs.rename(dir, old))
    UpsertWriter.recoverPurgeDebris(fs, root)
    assert(!fs.exists(old) && !fs.exists(staged))
    assert(UpsertWriter.read(spark, table).select("payload").head().getString(0) == "keep",
      "incomplete staged rewrite must NOT win; the backup restores")

    // a rerun of purge over the recovered table is clean end-to-end
    val rewritten = UpsertWriter.purge(spark, table, Seq(999L).toDF("k"), Seq("k"))
    assert(rewritten == Seq(1))
    assert(UpsertWriter.read(spark, table).count() == 1L)
  }

  test("purge is a writer: refuses while a fresh claim is held; racing upsertConcurrent stays linear") {
    val s = spark
    import s.implicits._
    val table = tmpDir("graft-purge-race-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "a"), (2L, 1L, "subject")), table, Seq("k"), "ver",
      keepVersions = 5)
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a competing writer holds the next version slot (fresh claim)
    val claim = new Path(root, "v00000002_claim")
    val out = fs.create(claim, true); out.write("other-writer".getBytes("UTF-8")); out.close()
    intercept[java.util.ConcurrentModificationException] {
      UpsertWriter.purge(spark, table, Seq(2L).toDF("k"), Seq("k"))
    }
    assert(UpsertWriter.read(spark, table).count() == 2L, "refused purge must change nothing")
    fs.delete(claim, false)

    // live race: purge vs a concurrent OCC upsert of NON-subject rows.
    // The claim serializes them: every version purge rewrote is
    // subject-free, the upsert's rows land exactly once, timeline linear.
    val writer = new Thread(() => {
      UpsertWriter.upsertConcurrent(df((5L, 2L, "late")), table, Seq("k"), "ver",
        keepVersions = 5)
    })
    writer.start()
    // purge either wins the claim (writer rebases after it) or loses
    // it LOUDLY (ConcurrentModificationException) — never interleaves;
    // a losing purge simply reruns once the writer's commit lands
    val purged = try UpsertWriter.purge(spark, table, Seq(2L).toDF("k"), Seq("k"))
    catch {
      case _: java.util.ConcurrentModificationException =>
        writer.join(60000)
        UpsertWriter.purge(spark, table, Seq(2L).toDF("k"), Seq("k"))
    }
    writer.join(60000)
    assert(!writer.isAlive, "racing writer must finish (claim released after purge)")
    assert(purged.nonEmpty)
    purged.foreach { v =>
      val subj = UpsertWriter.readVersion(spark, table, v).filter(col("k") === 2L).count()
      assert(subj == 0L, s"subject survived purge in rewritten v$v")
    }
    val vs = UpsertWriter.versions(spark, table)
    assert(vs == (vs.head to vs.last), s"timeline must stay linear: $vs")
    assert(UpsertWriter.read(spark, table).filter(col("k") === 5L).count() == 1L,
      "racing writer's committed row must survive exactly once")
  }

  test("needsCompaction: fragmented layouts advise true, compacted and healthy ones false — metadata only") {
    val s = spark
    import s.implicits._
    // fragmented plain dir: 20 tiny files
    val frag = tmpDir("uw-advisor") + "/frag"
    (1 to 100).map(i => (i.toLong, s"p$i")).toDF("k", "p")
      .repartition(20).write.mode("overwrite").parquet(frag)
    assert(UpsertWriter.needsCompaction(spark, frag))
    // healthy versioned table (post-write resize keeps commits sane)
    val table = tmpDir("uw-advisor") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "a"), (2L, 1L, "b")), table, Seq("k"), "ver")
    assert(!UpsertWriter.needsCompaction(spark, table))
    // tiny-target advisor: even one file per few rows is fine when
    // the target is tiny — the threshold scales with targetFileBytes
    assert(!UpsertWriter.needsCompaction(spark, frag, targetFileBytes = 16))
  }

  test("partition evolution: each version carries its OWN layout; reads and time travel are scheme-agnostic") {
    val s = spark
    import s.implicits._
    val table = tmpDir("uw-partevo") + "/t"
    val rows = (1 to 200).map(i => (i.toLong, 1L, s"g${i % 3}", s"h${i % 5}"))
      .toDF("k", "ver", "g", "h")
    UpsertWriter.upsert(rows, table, Seq("k"), "ver", partitionBy = Seq("g"))
    // evolve: the next commit re-partitions by h — no migration step,
    // copy-on-write versions are self-contained layouts
    UpsertWriter.upsert(rows.withColumn("ver", lit(2L)), table, Seq("k"), "ver",
      partitionBy = Seq("h"))
    val live = UpsertWriter.latestVersion(spark, table).get
      .replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/*", "/")
    val liveDirs = new java.io.File(live).listFiles().filter(_.isDirectory).map(_.getName)
    assert(liveDirs.forall(_.startsWith("h=")), s"live layout should be h-partitioned: ${liveDirs.toSeq}")
    assert(UpsertWriter.read(spark, table).count() == 200L)
    // old layout intact under time travel
    val v1 = UpsertWriter.readVersion(spark, table, 1)
    assert(v1.count() == 200L)
    assert(v1.filter(col("g") === "g1").count() == 67L)
  }

  test("upsertChecked: a violating batch refuses loudly and leaves the timeline byte-identical") {
    import graft.operators.QualityChecks
    val table = tmpDir("uw-checked") + "/t"
    val checks = (b: org.apache.spark.sql.DataFrame) => Seq(
      QualityChecks.notNull(b, "payload", "payload_not_null"),
      QualityChecks.inRange(b, "ver", 0, 100, "ver_range"),
      QualityChecks.unique(b, Seq("k"), "key_unique"))
    UpsertWriter.upsertChecked(
      df((1L, 1L, "a"), (2L, 1L, "b")), table, Seq("k"), "ver", checks)
    assert(UpsertWriter.read(spark, table).count() == 2L)

    val s = spark
    import s.implicits._
    val bad = Seq((3L, 999L, "c"), (3L, 1L, null.asInstanceOf[String]))
      .toDF("k", "ver", "payload")
    val e = intercept[IllegalStateException](
      UpsertWriter.upsertChecked(bad, table, Seq("k"), "ver", checks))
    assert(e.getMessage.contains("ver_range=1") &&
      e.getMessage.contains("payload_not_null=1") &&
      e.getMessage.contains("key_unique=2"), e.getMessage)
    // the refused commit left nothing behind: still one version, same rows
    assert(UpsertWriter.versions(spark, table) == Seq(1))
    assert(UpsertWriter.read(spark, table).count() == 2L)
  }

  test("readAsOf: commit-instant resolution — between-commits ts reads the earlier version, pre-history refuses") {
    val table = tmpDir("uw-asof") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "a"), (2L, 1L, "b")), table, Seq("k"), "ver")
    Thread.sleep(30) // separate the marker mtimes
    UpsertWriter.upsert(df((1L, 2L, "a2"), (3L, 1L, "c")), table, Seq("k"), "ver")
    val instants = UpsertWriter.commitInstants(spark, table).toMap
    assert(instants.keySet == Set(1, 2) && instants(2) >= instants(1))
    // at-or-after v2's instant: the live snapshot
    assert(UpsertWriter.readAsOf(spark, table, instants(2)).count() == 3L)
    assert(UpsertWriter.readAsOf(spark, table, System.currentTimeMillis() + 60000).count() == 3L)
    // between the two commits (when distinguishable): the v1 snapshot
    if (instants(2) > instants(1)) {
      val v1 = UpsertWriter.readAsOf(spark, table, instants(2) - 1)
      assert(v1.count() == 2L)
      assert(v1.filter(col("k") === 1L && col("payload") === "a").count() == 1L)
    }
    // before the first retained commit: loud refusal, never a silent
    // oldest-retained answer
    val e = intercept[IllegalArgumentException](
      UpsertWriter.readAsOf(spark, table, instants(1) - 1))
    assert(e.getMessage.contains("no retained commit"))
  }

  test("time travel survives a purge: original commit instants are preserved in version meta") {
    val table = tmpDir("uw-purge-tt")
    UpsertWriter.upsert(df((1L, 1L, "a"), (2L, 1L, "subject")), table,
      recordKeys = Seq("k"), precombine = "ver", keepVersions = 5)
    Thread.sleep(30)
    UpsertWriter.upsert(df((3L, 2L, "c")), table,
      recordKeys = Seq("k"), precombine = "ver", keepVersions = 5)
    val instantsBefore = UpsertWriter.commitInstants(spark, table).toMap
    Thread.sleep(30)
    // purge rewrites every retained version — marker files are re-created
    UpsertWriter.purge(spark, table, df((2L, 1L, "subject")).select("k"), Seq("k"))
    // instants must be the ORIGINAL commit times, not the purge time
    val instantsAfter = UpsertWriter.commitInstants(spark, table).toMap
    assert(instantsAfter == instantsBefore,
      s"purge must not rewrite commit instants: $instantsBefore -> $instantsAfter")
    // TIMESTAMP AS OF a pre-purge instant still resolves (minus the subject)
    val asOfV1 = UpsertWriter.readAsOf(spark, table, instantsBefore(1))
    assert(asOfV1.select("k").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L))
    val asOfV2 = UpsertWriter.readAsOf(spark, table, instantsBefore(2))
    assert(asOfV2.select("k").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // idempotent rerun keeps the original instants (not the first purge's time)
    Thread.sleep(30)
    UpsertWriter.purge(spark, table, df((99L, 1L, "x")).select("k"), Seq("k"))
    assert(UpsertWriter.commitInstants(spark, table).toMap == instantsBefore)
  }

  test("post-write self-check splits oversized files: a join-shaped load lands near target-size files") {
    val s = spark
    import s.implicits._
    val table = tmpDir("uw-toobig")
    // join-shaped updates plan (stats-inflatable) whose REAL output is
    // ~100x the tiny target file size: the sizing can't trust the
    // estimate, AQE coalesces the small shuffle to one file, and the
    // post-write check must split it up to what measured bytes justify
    val left = (1L to 5000L).map(i => (i, i % 97)).toDF("k", "g")
    val right = (1L to 5000L).map(i => (i, s"payload-$i-${"x" * 40}")).toDF("k", "p")
    val updates = left.join(right, "k").withColumn("ver", lit(1L))
    UpsertWriter.upsert(updates, table, recordKeys = Seq("k"), precombine = "ver",
      targetFileBytes = 4096L)
    val vdir = new java.io.File(UpsertWriter.latestVersion(spark, table).get
      .stripPrefix("file:"))
    val parts = vdir.listFiles().filter(_.getName.startsWith("part-"))
    val bytes = parts.map(_.length()).sum
    assert(parts.length > 8,
      s"too-big check must split the landed version: ${parts.length} files for $bytes bytes")
    assert(bytes / parts.length < 8 * 4096L,
      s"split files still far over target: avg ${bytes / parts.length}")
    // and the data survives the resize intact
    assert(UpsertWriter.read(spark, table).count() == 5000L)
  }

  test("stats-lied sizing self-corrects: the CDC-fold plan shape commits few sane files, not thousands of tasks") {
    // miniature of the q_inc_agg_cdc pathology: the retraction fold's
    // merged plan (full-outer diff → generate → aggregate → join) has
    // Catalyst size stats inflated by ORDERS OF MAGNITUDE (1.66 TB
    // claimed for 60 real rows at sf0.001), and repartition(N) is
    // AQE-exempt — pre-fix this ran a 3244-task near-empty shuffle
    // per commit (~17s of task overhead) and committed the state as
    // 76 tiny files, snowballing every subsequent read and merge
    val s = spark
    import s.implicits._
    val root = tmpDir("uw-resize")
    val basePath = root + "/events"
    val statePath = root + "/state"
    (1L to 300L).map(i => (i, i % 20, if (i % 3 == 0) "purchase" else "click", i * 1.5))
      .toDF("event_id", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(basePath)
    val base = spark.read.parquet(basePath)
    val next = base.filter(col("event_type") =!= "purchase")
      .unionByName(base.filter(col("event_type") === "purchase")
        .withColumn("value", col("value") * 2))
    val keys = Seq("user_id", "event_type")
    graft.operators.IncrementalAgg.refreshTable(
      spark, statePath, base, keys, "value", batchId = Some(1L))
    val feed = graft.operators.SnapshotDiff.changeFeed(base, next, keys = Seq("event_id"))
    graft.operators.IncrementalAgg.refreshFromChanges(
      spark, statePath, feed, keys, "value", batchId = Some(2L))
    // every committed state version must be sanely sized — the stats
    // lie can neither fragment files nor survive to poison readers
    UpsertWriter.versions(spark, statePath).foreach { v =>
      val dir = new java.io.File(f"$statePath/v$v%08d")
      val parts = dir.listFiles().count(_.getName.startsWith("part-"))
      assert(parts <= 8, s"stats lie fragmented v$v into $parts files for ~40 rows")
    }
    // and the fold is still CORRECT: state equals the direct rollup of next
    val got = graft.operators.IncrementalAgg.readLive(spark, statePath, keys)
      .select(col("user_id"), col("event_type"), col("n"), col("sum_dec"))
    val want = next.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).cast("decimal(38,6)").as("sum_dec"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
