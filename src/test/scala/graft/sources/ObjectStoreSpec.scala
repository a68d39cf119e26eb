package graft.sources

import graft.SparkSpec

import java.time.Instant

class ObjectStoreSpec extends SparkSpec {

  private def newStore = new ObjectStore(tmpDir("graft-os-"), spark.sparkContext.hadoopConfiguration)

  test("put / exists / get / delete round-trip") {
    val os = newStore
    assert(!os.exists("a/b.json"))
    assert(os.get("a/b.json").isEmpty)
    os.putString("a/b.json", """{"x": 1}""")
    assert(os.exists("a/b.json"))
    assert(os.getString("a/b.json").contains("""{"x": 1}"""))
    assert(os.delete("a/b.json"))
    assert(!os.exists("a/b.json"))
  }

  test("findOneUpdate: returns stored value if present, else stores") {
    val os = newStore
    val first = os.findOneUpdate("k", "one".getBytes)
    assert(new String(first) == "one")
    val second = os.findOneUpdate("k", "two".getBytes)
    assert(new String(second) == "one") // existing wins, like the reference
  }

  test("listKeys by prefix and regex search") {
    val os = newStore
    os.putString("reports/2026/jan.csv", "a")
    os.putString("reports/2026/feb.csv", "b")
    os.putString("metadata/t.json", "c")
    assert(os.listKeys().size == 3)
    assert(os.listKeys("reports").map(_.split('/').last).sorted == Seq("feb.csv", "jan.csv"))
    // S3 semantics: a prefix is a string prefix of the key, not a dir
    assert(os.listKeys("reports/2026/ja") == Seq("reports/2026/jan.csv"))
    assert(os.listKeys("repo").size == 2) // partial top-level segment
    assert(os.listKeys("/reports").size == 2) // leading slash normalized
    assert(os.findSimilarKeys("\\.json$") == Seq("metadata/t.json"))
    assert(os.listKeys("nope").isEmpty)
  }

  test("presigned-URL analog carries the expiry") {
    val os = newStore
    os.putString("r.csv", "data")
    val fixed = Instant.parse("2026-03-05T10:00:00Z")
    val (url, expires) = os.presignedUrl("r.csv", 3600, () => fixed)
    assert(url.startsWith("file:") && url.endsWith("/r.csv"))
    assert(expires == fixed.plusSeconds(3600))
  }
}
