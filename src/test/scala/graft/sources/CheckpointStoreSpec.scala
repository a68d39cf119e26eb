package graft.sources

import graft.SparkSpec

class CheckpointStoreSpec extends SparkSpec {

  private def newStore = new CheckpointStore(tmpDir("graft-ckpt-"), spark.sparkContext.hadoopConfiguration)

  test("read of a missing checkpoint is None") {
    assert(newStore.read("nope").isEmpty)
  }

  test("write/read round-trip") {
    val store = newStore
    store.write(Checkpoint("events", "2024-01-15 00:00:00", "/data/events"))
    val cp = store.read("events").get
    assert(cp.lastProcessedCommit == "2024-01-15 00:00:00")
    assert(cp.path == "/data/events")
    assert(store.exists("events"))
  }

  test("values with quotes, backslashes and newlines round-trip") {
    val store = newStore
    val nasty = "a\"b\\c\nd"
    store.write(Checkpoint("t", nasty, s"/p/$nasty"))
    val cp = store.read("t").get
    assert(cp.lastProcessedCommit == nasty)
    assert(cp.path == s"/p/$nasty")
  }

  test("overwrite advances; delete removes") {
    val store = newStore
    store.write(Checkpoint("t", "1", "/p"))
    store.write(Checkpoint("t", "2", "/p"))
    assert(store.read("t").get.lastProcessedCommit == "2")
    store.delete("t")
    assert(store.read("t").isEmpty)
  }
}
