package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomFileIndexSpec extends SparkSpec {

  test("point probe prunes files on a hash layout; result equals the full scan; no false negatives") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-bfi-") + "/t"
    // keys 1..400, each with 25 rows, hash-scattered into 20 files:
    // no file is "the" file for a key, but each key touches few files
    (1L to 10000L).map(i => (i % 400 + 1, i, s"r$i")).toDF("k", "id", "p")
      .repartition(20, col("id"))
      .write.mode("overwrite").parquet(dir)
    val idx = BloomFileIndex.build(spark, dir, "k", m = 4096).cache()
    val nFiles = idx.count()
    assert(nFiles >= 16, s"expected ~20 files, got $nFiles")
    // zone maps CANNOT prune this layout (every file spans ~the whole domain)
    val zm = ZoneMaps.build(spark, dir, "k")
    assert(ZoneMaps.candidateFiles(zm, 7L, 7L).size == nFiles,
      "fixture broken: zone maps should be useless on the hash layout")
    // the bloom index can: ~10% fill per file (≈500 distinct buckets of 4096)
    val cand = BloomFileIndex.candidateFiles(idx, Seq(7L), m = 4096)
    assert(cand.size < nFiles, s"bloom index pruned nothing: ${cand.size} of $nFiles")
    val pruned = BloomFileIndex.prunedRead(spark, dir, idx, "k", Seq(7L), m = 4096)
    val full = spark.read.parquet(dir).filter(col("k") === 7L)
    assert(pruned.count() == full.count() && full.count() == 25L)
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
    // absent key: bloom may pass files (false positives) but rows are exact
    assert(BloomFileIndex.prunedRead(spark, dir, idx, "k", Seq(999999L)).count() == 0L)
    idx.unpersist()
  }

  test("prunedReadSemiJoin equals prunedRead; probe DataFrame never collects") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-bfi-semi-") + "/t"
    (1L to 5000L).map(i => (i % 100 + 1, i)).toDF("k", "id")
      .repartition(10, col("id"))
      .write.mode("overwrite").parquet(dir)
    val idx = BloomFileIndex.build(spark, dir, "k", m = 1024).cache()
    val probes = Seq(3L, 42L, 777L).toDF("pk") // 777 absent
    val viaSemi = BloomFileIndex.prunedReadSemiJoin(
      spark, dir, idx, "k", probes, "pk", m = 1024)
    val viaDriver = BloomFileIndex.prunedRead(
      spark, dir, idx, "k", Seq(3L, 42L, 777L), m = 1024)
    assert(viaSemi.count() == 100L)
    assert(viaSemi.exceptAll(viaDriver).isEmpty && viaDriver.exceptAll(viaSemi).isEmpty)
    assert(viaSemi.columns.toSeq == Seq("k", "id"), "probe plumbing must not leak columns")
    idx.unpersist()
  }

  test("plan lock: prunedRead PLANS over exactly the candidate files (file opens pruned, not just rows)") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-bfi-plan-") + "/t"
    // 4000 distinct keys x 2 rows over 16 files: each key touches ~2
    // files, each file holds ~500 of 4000 keys — genuinely prunable
    (1L to 8000L).map(i => (i % 4000 + 1, i)).toDF("k", "id")
      .repartition(16, col("id"))
      .write.mode("overwrite").parquet(dir)
    val idx = BloomFileIndex.build(spark, dir, "k", m = 2048).cache()
    val cand = BloomFileIndex.candidateFiles(idx, Seq(42L), m = 2048)
    val all = spark.read.parquet(dir).inputFiles.length
    assert(cand.nonEmpty && cand.size < all, s"fixture must prune: ${cand.size} of $all")
    // the pruned frame's scan inputs ARE the candidate list — the I/O
    // win is in the plan, not a runtime filter
    val planned = BloomFileIndex.prunedRead(spark, dir, idx, "k", Seq(42L), m = 2048)
      .inputFiles.map(f => f.split("/").last).toSet
    assert(planned == cand.map(f => f.split("/").last).toSet)
    idx.unpersist()
  }

  test("canonical hashing: probe type drift (Int/String vs Long key) never causes false negatives") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-bfi-typ-") + "/t"
    (1L to 4000L).map(i => (i % 200 + 1, i)).toDF("k", "id") // k is LongType
      .repartition(8, col("id"))
      .write.mode("overwrite").parquet(dir)
    val idx = BloomFileIndex.build(spark, dir, "k", m = 1024).cache()
    // probes typed Int and String — xxhash64 would bucket each
    // differently raw; the canonical string form makes them identical
    assert(BloomFileIndex.prunedRead(spark, dir, idx, "k", Seq(7), m = 1024).count() == 20L,
      "Int probe of a Long-keyed index lost rows (type-sensitive hash)")
    assert(BloomFileIndex.prunedRead(spark, dir, idx, "k", Seq("7"), m = 1024).count() == 20L,
      "String probe of a Long-keyed index lost rows")
    val intProbes = Seq(3, 42).toDF("pk") // IntegerType probe column
    assert(BloomFileIndex.prunedReadSemiJoin(spark, dir, idx, "k", intProbes, "pk", m = 1024)
      .count() == 40L, "Int-typed probe DataFrame lost rows")
    idx.unpersist()
  }

  test("refresh: appends scan ONLY new files, removals are metadata-only, result == full rebuild") {
    val s = spark
    import s.implicits._
    val base = tmpDir("graft-bfi-ref-")
    val dir = base + "/t"
    val idxPath = base + "/idx"
    def rows(a: Long, b: Long, parts: Int) =
      (a to b).map(i => (i % 300 + 1, i)).toDF("k", "id").repartition(parts, col("id"))
    rows(1L, 5000L, 8).write.mode("overwrite").parquet(dir)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("file"), col("n_rows"), col("bits"))
        .collect().map(r => (r.getString(0).split("/").last, r.getLong(1),
          r.getSeq[Long](2))).sortBy(_._1).toSeq

    // first refresh IS the build
    val s1 = BloomFileIndex.refresh(spark, dir, idxPath, "k", m = 1024)
    assert(s1.added >= 8 && s1.removed == 0)
    assert(canon(BloomFileIndex.load(spark, idxPath)) ==
      canon(BloomFileIndex.build(spark, dir, "k", m = 1024)))

    // append a batch: refresh folds exactly the new files in
    val before = spark.read.parquet(dir).inputFiles.toSet
    rows(5001L, 7000L, 4).write.mode("append").parquet(dir)
    val newFiles = spark.read.parquet(dir).inputFiles.toSet -- before
    val s2 = BloomFileIndex.refresh(spark, dir, idxPath, "k", m = 1024)
    assert(s2.added == newFiles.size && s2.removed == 0,
      s"refresh must scan exactly the appended files: $s2 vs ${newFiles.size}")
    assert(canon(BloomFileIndex.load(spark, idxPath)) ==
      canon(BloomFileIndex.build(spark, dir, "k", m = 1024)),
      "incremental refresh must equal a full rebuild bucket-for-bucket")

    // remove files (a compaction/clean): rows drop with NO scan
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victims = newFiles.take(2)
    victims.foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f), false))
    val s3 = BloomFileIndex.refresh(spark, dir, idxPath, "k", m = 1024)
    assert(s3.added == 0 && s3.removed == 2, s"expected pure-removal refresh, got $s3")
    assert(canon(BloomFileIndex.load(spark, idxPath)) ==
      canon(BloomFileIndex.build(spark, dir, "k", m = 1024)))

    // up to date: metadata no-op
    val s4 = BloomFileIndex.refresh(spark, dir, idxPath, "k", m = 1024)
    assert(s4.added == 0 && s4.removed == 0)

    // the maintained index serves correct pruned reads
    val viaIdx = BloomFileIndex.prunedRead(spark, dir,
      BloomFileIndex.load(spark, idxPath), "k", Seq(17L), m = 1024)
    val full = spark.read.parquet(dir).filter(col("k") === 17L)
    assert(viaIdx.exceptAll(full).isEmpty && full.exceptAll(viaIdx).isEmpty)
  }

  test("refresh: mismatched keyCol or m refuses loudly (buckets incomparable)") {
    val s = spark
    import s.implicits._
    val base = tmpDir("graft-bfi-meta-")
    val dir = base + "/t"
    Seq((1L, 1L), (2L, 2L)).toDF("k", "id").write.mode("overwrite").parquet(dir)
    BloomFileIndex.refresh(spark, dir, base + "/idx", "k", m = 512)
    intercept[IllegalStateException](
      BloomFileIndex.refresh(spark, dir, base + "/idx", "k", m = 1024))
    intercept[IllegalStateException](
      BloomFileIndex.refresh(spark, dir, base + "/idx", "id", m = 512))
    intercept[IllegalStateException](BloomFileIndex.load(spark, base + "/nothere"))
  }

  test("guards: m >= 2, non-empty probe list") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1L)).toDF("k", "id")
    intercept[IllegalArgumentException](
      BloomFileIndex.candidateFiles(df.withColumn("bits", array()).withColumn("file", lit("f"))
        .select("file", "bits"), Nil))
    val dir = tmpDir("graft-bfi-g-") + "/t"
    df.write.mode("overwrite").parquet(dir)
    intercept[IllegalArgumentException](BloomFileIndex.build(spark, dir, "k", m = 1))
  }
}
