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
