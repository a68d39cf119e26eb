package graft.sources

import graft.SparkSpec

class RecordIndexSpec extends SparkSpec {

  test("lookup returns exactly the probed keys' rows and prunes partitions in-plan") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-ridx-") + "/t"
    val df = (1L to 1000L).map(i => (i, s"payload$i")).toDF("k", "p")
    RecordIndex.write(df, dir, "k", nBuckets = 32)
    val out = RecordIndex.lookup(spark, dir, "k", "bigint", Seq(7L, 700L, 9999L), nBuckets = 32)
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((7L, "payload7"), (700L, "payload700"))) // 9999 absent, not an error
    // plan lock: the scan carries a partition filter on bucket — the
    // unprobed buckets' directories are pruned at planning, not read
    // and discarded
    val leaves = out.queryExecution.executedPlan.collectLeaves().map(_.treeString).mkString("\n")
    assert(leaves.contains("PartitionFilters") && leaves.contains("bucket"), leaves)
  }

  test("write+lookup agree on hashing (no bucket misses over many keys)") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft-ridx2-") + "/t"
    val df = (1L to 500L).map(i => (i, i * 2)).toDF("k", "v")
    RecordIndex.write(df, dir, "k", nBuckets = 16)
    val keys: Seq[Any] = (1L to 500L by 7L).toSeq
    val hits = RecordIndex.lookup(spark, dir, "k", "bigint", keys, nBuckets = 16).count()
    assert(hits == keys.size.toLong)
  }
}
