package graft.sources

import graft.SparkSpec

class IncrementalReaderSpec extends SparkSpec {

  private def writeBatch(path: String, ids: Range, tsBase: Long): Unit = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, tsBase + i)).toDF("id", "commit_ts")
      .write.mode("append").parquet(path)
  }

  test("checkpoint state machine: full first read, then only increments") {
    val store = new CheckpointStore(tmpDir("graft-inc-ckpt-"), spark.sparkContext.hadoopConfiguration)
    val rdr = new IncrementalReader(spark, store)
    val data = tmpDir("graft-inc-data-") + "/t"

    writeBatch(data, 1 to 10, 1000)
    val first = rdr.read("t", data, "commit_ts")
    assert(first.count() == 10) // no checkpoint: from the beginning
    assert(store.read("t").get.lastProcessedCommit == "1010")

    // no new data: empty increment, checkpoint untouched
    assert(rdr.read("t", data, "commit_ts").count() == 0)
    assert(store.read("t").get.lastProcessedCommit == "1010")

    writeBatch(data, 11 to 15, 1000)
    val inc = rdr.read("t", data, "commit_ts")
    assert(inc.count() == 5)
    assert(inc.agg(org.apache.spark.sql.functions.min("commit_ts")).head.getLong(0) == 1011)
    assert(store.read("t").get.lastProcessedCommit == "1015")
  }

  test("pull does not advance; commit does (at-least-once)") {
    val store = new CheckpointStore(tmpDir("graft-inc-ckpt2-"), spark.sparkContext.hadoopConfiguration)
    val rdr = new IncrementalReader(spark, store)
    val data = tmpDir("graft-inc-data2-") + "/t"
    writeBatch(data, 1 to 5, 0)

    val (inc, wm) = rdr.pull("t", data, "commit_ts")
    assert(inc.count() == 5 && wm.contains("5"))
    assert(store.read("t").isEmpty) // not yet committed: a crash here replays

    rdr.commit("t", data, wm.get)
    assert(store.read("t").get.lastProcessedCommit == "5")
    assert(rdr.pull("t", data, "commit_ts")._2.isEmpty)
  }

  test("pulled increment is bounded at its watermark even if files land later") {
    val store = new CheckpointStore(tmpDir("graft-inc-ckpt3-"), spark.sparkContext.hadoopConfiguration)
    val rdr = new IncrementalReader(spark, store)
    val data = tmpDir("graft-inc-data3-") + "/t"
    writeBatch(data, 1 to 5, 0)

    val (inc, wm) = rdr.pull("t", data, "commit_ts")
    writeBatch(data, 6 to 9, 0) // lands between pull and materialization
    // The lazy df re-lists the directory, but the <= watermark bound
    // keeps rows above the commit point out of THIS increment.
    assert(inc.count() == 5)
    rdr.commit("t", data, wm.get)
    assert(rdr.pull("t", data, "commit_ts")._1.count() == 4) // next pull gets them
  }

  test("readSince filters strictly greater, in column type") {
    val events = TableLoader.table(spark, sfDir, "events")
    val rdr = new IncrementalReader(spark, null)
    val all = events.count()
    val none = rdr.readSince(events, "ts", "2999-01-01 00:00:00").count()
    val some = rdr.readSince(events, "ts", "2024-01-15 00:00:00").count()
    assert(none == 0 && some > 0 && some < all)
  }
}
