package graft.operators

import graft.SparkSpec

class ZoneMapsSpec extends SparkSpec {

  test("range-layout files prune to the overlapping few; result equals the full scan") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-zm-") + "/t"
    (1L to 10000L).map(i => (i, s"r$i")).toDF("v", "p")
      .repartitionByRange(10, org.apache.spark.sql.functions.col("v"))
      .write.mode("overwrite").parquet(dir)
    val zm = ZoneMaps.build(spark, dir, "v").cache()
    val nFiles = zm.count()
    assert(nFiles >= 8, s"expected ~10 files, got $nFiles")
    // a 5%-wide range on a range-clustered layout touches ~1 file
    val cand = ZoneMaps.candidateFiles(zm, 2000L, 2400L)
    assert(cand.size <= 2, s"zone map failed to prune: ${cand.size} of $nFiles files")
    val pruned = ZoneMaps.prunedRead(spark, dir, zm, "v", 2000L, 2400L)
    assert(pruned.count() == 401L)
    // empty-overlap range: zero candidates, empty result, schema intact
    val none = ZoneMaps.prunedRead(spark, dir, zm, "v", 999999L, 1000000L)
    assert(none.count() == 0L && none.columns.toSeq == Seq("v", "p"))
    zm.unpersist()
  }

  test("prunedReadSemiJoin: result-identical to prunedRead, no driver file-list, broadcast semi plan") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-zm3-") + "/t"
    (1L to 10000L).map(i => (i, s"r$i")).toDF("v", "p")
      .repartitionByRange(10, org.apache.spark.sql.functions.col("v"))
      .write.mode("overwrite").parquet(dir)
    val zm = ZoneMaps.build(spark, dir, "v")
    val semi = ZoneMaps.prunedReadSemiJoin(spark, dir, zm, "v", 2000L, 2400L)
    val planned = ZoneMaps.prunedRead(spark, dir, zm, "v", 2000L, 2400L)
    assert(semi.collect().map(_.getLong(0)).sorted.toSeq ==
      planned.collect().map(_.getLong(0)).sorted.toSeq)
    // the scale contract in the plan: candidates arrive via a
    // broadcast LEFT SEMI join — never a collected file list
    val plan = semi.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a left-semi join in:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected the candidate list to broadcast in:\n$plan")
  }

  test("random layout prunes nothing but stays correct (superset contract)") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-zm2-") + "/t"
    // hash-repartition → every file spans ~the whole value range
    (1L to 5000L).map(i => (i, i % 97)).toDF("v", "salt")
      .repartition(8, org.apache.spark.sql.functions.col("salt"))
      .write.mode("overwrite").parquet(dir)
    val zm = ZoneMaps.build(spark, dir, "v")
    val out = ZoneMaps.prunedRead(spark, dir, zm, "v", 100L, 199L)
    assert(out.count() == 100L)
  }

  test("countFromFooters: exact over multi-file, hive-partitioned, and single-file layouts") {
    val s = spark
    import s.implicits._
    val flat = tmpDir("graft-zmc-") + "/flat"
    (1L to 3456L).toDF("v").repartition(7).write.mode("overwrite").parquet(flat)
    assert(ZoneMaps.countFromFooters(spark, flat) == 3456L)
    // hive-partitioned: footer walk must recurse and skip _SUCCESS
    val part = tmpDir("graft-zmc-") + "/part"
    (1L to 1000L).map(i => (i, i % 3)).toDF("v", "p")
      .write.partitionBy("p").mode("overwrite").parquet(part)
    assert(ZoneMaps.countFromFooters(spark, part) == 1000L)
    // a single bare file (the testdata layout)
    assert(ZoneMaps.countFromFooters(spark, s"$sfDir/region.parquet") ==
      graft.sources.TableLoader.table(spark, sfDir, "region").count())
  }
}
