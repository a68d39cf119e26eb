package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SecondaryIndexSpec extends SparkSpec {

  private def df(rows: (Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("k", "city", "payload").withColumn("prec", lit(1L))
  }

  private def found(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("k").collect().map(_.getLong(0)).toSet

  test("build, incremental refresh on moves/deletes, lookup correctness") {
    val table = tmpDir("graft-secidx-") + "/t"
    val idx = tmpDir("graft-secidx-") + "/i"
    UpsertWriter.upsert(df((1L, "rome", "a"), (2L, "rome", "b"), (3L, "oslo", "c")),
      table, Seq("k"), "prec", keepVersions = 5)
    assert(SecondaryIndex.refresh(spark, table, idx, Seq("k"), "city", nBuckets = 4) == 1)
    assert(found(SecondaryIndex.lookup(spark, table, idx, Seq("k"), "city",
      Seq("rome"), nBuckets = 4)) == Set(1L, 2L))
    // record 2 moves to oslo (new version), record 3 deleted
    UpsertWriter.upsert(df((2L, "oslo", "b2")).withColumn("prec", lit(2L)),
      table, Seq("k"), "prec", keepVersions = 5)
    UpsertWriter.delete(spark, table,
      df((3L, "", "")).select(col("k")), Seq("k"), keepVersions = 5)
    assert(SecondaryIndex.refresh(spark, table, idx, Seq("k"), "city", nBuckets = 4) == 3)
    // moved record: gone from the old value, present under the new one
    assert(found(SecondaryIndex.lookup(spark, table, idx, Seq("k"), "city",
      Seq("rome"), nBuckets = 4)) == Set(1L))
    assert(found(SecondaryIndex.lookup(spark, table, idx, Seq("k"), "city",
      Seq("oslo"), nBuckets = 4)) == Set(2L))
    // up-to-date refresh is a no-op returning the covered version
    assert(SecondaryIndex.refresh(spark, table, idx, Seq("k"), "city", nBuckets = 4) == 3)
    assert(SecondaryIndex.indexedVersion(spark, idx).contains(3))
  }

  test("lookup plans only the probed hive buckets (partition pruning)") {
    val table = tmpDir("graft-secidx-") + "/t"
    val idx = tmpDir("graft-secidx-") + "/i"
    val s = spark
    import s.implicits._
    val rows = (0L until 200L).map(i => (i, s"city-${i % 40}", "x")).toSeq
    UpsertWriter.upsert(rows.toDF("k", "city", "payload").withColumn("prec", lit(1L)),
      table, Seq("k"), "prec")
    SecondaryIndex.refresh(spark, table, idx, Seq("k"), "city", nBuckets = 32)
    val out = SecondaryIndex.lookup(spark, table, idx, Seq("k"), "city",
      Seq("city-7"), nBuckets = 32)
    assert(found(out) == (0L until 200L).filter(i => i % 40 == 7).toSet)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"index probe must partition-prune on bucket:\n$plan")
  }

  test("DataFrame probe: same partition-pruned plan, values never enumerated on the driver") {
    val table = tmpDir("graft-secidx-") + "/t"
    val idx = tmpDir("graft-secidx-") + "/i"
    val s = spark
    import s.implicits._
    val rows = (0L until 200L).map(i => (i, s"city-${i % 40}", "x")).toSeq
    UpsertWriter.upsert(rows.toDF("k", "city", "payload").withColumn("prec", lit(1L)),
      table, Seq("k"), "prec")
    SecondaryIndex.refresh(spark, table, idx, Seq("k"), "city", nBuckets = 32)
    val probe = Seq("city-7", "city-13", "no-such-city").toDF("city")
    val out = SecondaryIndex.lookup(spark, table, idx, Seq("k"), "city", probe, nBuckets = 32)
    assert(found(out) == (0L until 200L).filter(i => i % 40 == 7 || i % 40 == 13).toSet)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"DF probe must partition-prune on bucket:\n$plan")
    assert(plan.contains("LeftSemi"), s"values must semi-join, not enumerate:\n$plan")
    // empty probe: no scan, empty result, table schema preserved
    val none = SecondaryIndex.lookup(spark, table, idx, Seq("k"), "city",
      probe.filter(lit(false)), nBuckets = 32)
    assert(none.columns.sameElements(Array("k", "city", "payload", "prec")) && none.count() == 0)
  }

  test("stale diff base (cleaned from the timeline) forces a WIPE rebuild, not a merge") {
    val table = tmpDir("graft-secidx-") + "/t"
    val idx = tmpDir("graft-secidx-") + "/i"
    UpsertWriter.upsert(df((1L, "rome", "a"), (9L, "pisa", "z")),
      table, Seq("k"), "prec", keepVersions = 1)
    SecondaryIndex.refresh(spark, table, idx, Seq("k"), "city", nBuckets = 4)
    // two more versions with keepVersions=1: v1 (the indexed base) is cleaned
    UpsertWriter.delete(spark, table,
      df((9L, "pisa", "z")).select(col("k")), Seq("k"), keepVersions = 1)
    UpsertWriter.upsert(df((2L, "rome", "b")), table, Seq("k"), "prec", keepVersions = 1)
    SecondaryIndex.refresh(spark, table, idx, Seq("k"), "city", nBuckets = 4)
    // deleted record 9 must NOT survive in the rebuilt index
    assert(found(SecondaryIndex.lookup(spark, table, idx, Seq("k"), "city",
      Seq("pisa"), nBuckets = 4)).isEmpty)
    assert(found(SecondaryIndex.lookup(spark, table, idx, Seq("k"), "city",
      Seq("rome"), nBuckets = 4)) == Set(1L, 2L))
  }
}
