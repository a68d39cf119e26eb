package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

class TableCloneSpec extends SparkSpec {

  private def df(rows: (Long, Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("k", "ver", "payload")
  }

  test("deepClone: history ports; writes to clone and source are isolated; dest must be empty") {
    val src = tmpDir("graft-clone-src-") + "/t"
    val dst = tmpDir("graft-clone-dst-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "a1"), (2L, 1L, "b1")), src, Seq("k"), "ver", keepVersions = 5)
    UpsertWriter.upsert(df((2L, 2L, "b2"), (3L, 2L, "c1")), src, Seq("k"), "ver", keepVersions = 5)
    assert(TableClone.deepClone(spark, src, dst) == Seq(1, 2))
    // clone reads identically, including time travel
    def snap(p: String, v: Int) = UpsertWriter.readVersion(spark, p, v)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(snap(dst, 2) == snap(src, 2) && snap(dst, 1) == snap(src, 1))
    // diverge both sides: neither sees the other's write
    UpsertWriter.upsert(df((4L, 3L, "clone-only")), dst, Seq("k"), "ver", keepVersions = 5)
    UpsertWriter.upsert(df((5L, 3L, "src-only")), src, Seq("k"), "ver", keepVersions = 5)
    assert(snap(dst, 3).exists(_._2 == "clone-only") && !snap(dst, 3).exists(_._2 == "src-only"))
    assert(snap(src, 3).exists(_._2 == "src-only") && !snap(src, 3).exists(_._2 == "clone-only"))
    // non-empty destination refuses
    intercept[IllegalArgumentException](TableClone.deepClone(spark, src, dst))
  }

  test("vacuum: old debris removed, committed versions and young debris kept") {
    val table = tmpDir("graft-vacuum-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "a")), table, Seq("k"), "ver", keepVersions = 5)
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // debris: uncommitted version dir, purge staging, stale claim — all OLD
    val debris = Seq(new Path(root, "v00000009"), new Path(root, "v00000002.purging"))
    debris.foreach(fs.mkdirs(_))
    fs.createNewFile(new Path(root, "v00000003_claim"))
    val old = System.currentTimeMillis() - 7200_000L
    (debris :+ new Path(root, "v00000003_claim")).foreach(p => fs.setTimes(p, old, old))
    // young debris survives (an in-flight writer)
    fs.mkdirs(new Path(root, "v00000010"))
    val removed = TableClone.vacuum(spark, table, ttlMs = 3600_000L).sorted
    assert(removed == Seq("v00000002.purging", "v00000003_claim", "v00000009"))
    assert(fs.exists(new Path(root, "v00000010")), "young debris must survive the TTL gate")
    assert(UpsertWriter.read(spark, table).count() == 1L, "committed data untouched")
    assert(UpsertWriter.versions(spark, table) == Seq(1))
    // idempotent: second pass removes nothing
    assert(TableClone.vacuum(spark, table, ttlMs = 3600_000L).isEmpty)
  }

  test("vacuum recovers an interrupted purge swap instead of reaping the only surviving copy") {
    val table = tmpDir("graft-vacuum-rec-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "survivor")), table, Seq("k"), "ver")
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(root, "v00000001")
    val old = new Path(root, "v00000001.old")
    // crash window: live dir stepped aside, staged rewrite never
    // completed — the .old backup is the ONLY copy of the version
    assert(fs.rename(dir, old))
    val stale = System.currentTimeMillis() - 7200_000L
    fs.setTimes(old, stale, stale)
    TableClone.vacuum(spark, table, ttlMs = 3600_000L)
    assert(fs.exists(new Path(dir, "_graft_commit")),
      "vacuum must restore the backup as the live version, not reap it")
    assert(UpsertWriter.read(spark, table).select("payload").head().getString(0) == "survivor")
  }

  test("vacuum: an uncommitted dir under a FRESH writer claim survives (claim mtime = heartbeat)") {
    val table = tmpDir("graft-vacuum-hb-") + "/t"
    UpsertWriter.upsert(df((1L, 1L, "a")), table, Seq("k"), "ver")
    val root = new Path(table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a SLOW writer: uncommitted dir older than ttl, but its OCC
    // claim is fresh — the writer is alive, just slow
    val inflight = new Path(root, "v00000002")
    fs.mkdirs(inflight)
    val stale = System.currentTimeMillis() - 7200_000L
    fs.setTimes(inflight, stale, stale)
    val claim = new Path(root, "v00000002_claim")
    val out = fs.create(claim, true); out.write("w1".getBytes("UTF-8")); out.close()
    assert(!TableClone.vacuum(spark, table, ttlMs = 3600_000L).contains("v00000002"),
      "fresh claim must protect the in-flight writer's dir")
    assert(fs.exists(inflight))
    // the writer died: claim goes stale, the next vacuum reaps both
    fs.setTimes(claim, stale, stale)
    val removed = TableClone.vacuum(spark, table, ttlMs = 3600_000L)
    assert(removed.contains("v00000002") && removed.contains("v00000002_claim"))
  }
}
