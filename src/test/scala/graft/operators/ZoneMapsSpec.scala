package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  test("persisted refresh: only new files scanned, refresh == rebuild, no-op when current, statsCol pinned") {
    val s = spark
    import s.implicits._
    val root = tmpDir("graft-zmr-")
    val table = root + "/t"
    val idx = root + "/idx"
    (1L to 1000L).toDF("v").repartitionByRange(4, col("v"))
      .write.mode("overwrite").parquet(table)
    val st1 = ZoneMaps.refresh(spark, table, idx, "v")
    assert(st1.added == 4L && st1.removed == 0L && st1.indexedFiles == 4L)
    (1001L to 2000L).toDF("v").repartitionByRange(3, col("v"))
      .write.mode("append").parquet(table)
    val st2 = ZoneMaps.refresh(spark, table, idx, "v")
    assert(st2.added == 3L, s"refresh must scan ONLY the appended files, got $st2")
    assert(st2.indexedFiles == 7L)
    // refreshed index == a from-scratch build, row for row
    val built = ZoneMaps.build(spark, table, "v")
    val loaded = ZoneMaps.load(spark, idx)
    assert(loaded.exceptAll(built).isEmpty && built.exceptAll(loaded).isEmpty)
    // up-to-date refresh is a metadata no-op
    val st3 = ZoneMaps.refresh(spark, table, idx, "v")
    assert(st3.added == 0L && st3.removed == 0L)
    // pruned read through the maintained index is row-identical
    val out = ZoneMaps.prunedRead(spark, table, loaded, "v", 900L, 1100L)
    assert(out.count() == 201L)
    // a different stats column refuses loudly
    intercept[IllegalStateException](ZoneMaps.refresh(spark, table, idx, "other"))
    intercept[IllegalStateException](ZoneMaps.load(spark, root + "/nothere"))
  }

  test("minMaxFromFooters: exact for long and double, nulls skipped, strings refused") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-zmm-") + "/t"
    Seq(
      (5L, Option(2.5), "b"),
      (-17L, Option(-0.125), "a"),
      (9000000000L, None, "z"),
      (42L, Option(9.75), "m"))
      .toDF("k", "x", "name")
      .repartition(3).write.mode("overwrite").parquet(dir)

    val longs = ZoneMaps.minMaxFromFooters(spark, dir, "k").collect()(0)
    assert(longs.getLong(0) == -17L && longs.getLong(1) == 9000000000L)

    val dbls = ZoneMaps.minMaxFromFooters(spark, dir, "x").collect()(0)
    assert(dbls.getDouble(0) == -0.125 && dbls.getDouble(1) == 9.75)

    val e = intercept[org.apache.spark.SparkException] {
      ZoneMaps.minMaxFromFooters(spark, dir, "name").collect()
    }
    assert(e.getMessage.contains("truncated") || e.getCause != null)

    // all-null column: SQL answer is null, typed row not a crash
    val nullDir = tmpDir("graft-zmm-") + "/nulls"
    Seq.fill(10)(Option.empty[Long]).toDF("k").write.mode("overwrite").parquet(nullDir)
    val nr = ZoneMaps.minMaxFromFooters(spark, nullDir, "k").collect()(0)
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }
}
