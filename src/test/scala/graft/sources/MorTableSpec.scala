package graft.sources

import graft.SparkSpec

class MorTableSpec extends SparkSpec {

  test("read merges base + logs latest-wins; later log beats earlier at equal precombine") {
    val s = spark
    import s.implicits._
    val table = tmpDir("graft-mor-") + "/t"
    MorTable.writeBase(Seq((1L, 1L, "base"), (2L, 1L, "base")).toDF("k", "ver", "src"), table)
    MorTable.appendLog(Seq((1L, 2L, "log1")).toDF("k", "ver", "src"), table)
    // log2 updates k=1 at the SAME precombine value as log1 → commit
    // order must break the tie; also inserts k=3
    MorTable.appendLog(Seq((1L, 2L, "log2"), (3L, 1L, "log2")).toDF("k", "ver", "src"), table)
    val out = MorTable.read(spark, table, Seq("k"), "ver")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "log2", 2L -> "base", 3L -> "log2"))
  }

  test("appendLog requires a base; compact folds logs and preserves content") {
    val s = spark
    import s.implicits._
    val table = tmpDir("graft-mor-c-") + "/t"
    intercept[IllegalArgumentException] {
      MorTable.appendLog(Seq((1L, 1L, "x")).toDF("k", "ver", "src"), table)
    }
    MorTable.writeBase(Seq((1L, 1L, "base")).toDF("k", "ver", "src"), table)
    MorTable.appendLog(Seq((1L, 2L, "upd"), (2L, 1L, "new")).toDF("k", "ver", "src"), table)
    val before = MorTable.read(spark, table, Seq("k"), "ver")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(MorTable.logStats(spark, table)._1 == 1)
    MorTable.compact(spark, table, Seq("k"), "ver")
    assert(MorTable.logStats(spark, table)._1 == 0, "logs folded into the new base")
    val after = MorTable.read(spark, table, Seq("k"), "ver")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(after == before, "compaction is invisible to readers")
    // table keeps accepting deltas after compaction
    MorTable.appendLog(Seq((2L, 2L, "post")).toDF("k", "ver", "src"), table)
    val out = MorTable.read(spark, table, Seq("k"), "ver")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "upd", 2L -> "post"))
  }

  test("readOptimized: base-only view — stale by exactly the uncompacted logs, compaction advances it") {
    val s = spark
    import s.implicits._
    val table = tmpDir("graft-mor-ro-") + "/t"
    MorTable.writeBase(Seq((1L, 1L, "base"), (2L, 1L, "base")).toDF("k", "ver", "src"), table)
    MorTable.appendLog(Seq((1L, 2L, "log1")).toDF("k", "ver", "src"), table)
    def ro() = MorTable.readOptimized(spark, table)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(ro() == Map(1L -> "base", 2L -> "base"), "RO must not see uncompacted logs")
    MorTable.compact(spark, table, Seq("k"), "ver")
    assert(ro() == Map(1L -> "log1", 2L -> "base"), "compaction advances the RO view")
    MorTable.appendLog(Seq((3L, 1L, "log2")).toDF("k", "ver", "src"), table)
    assert(ro() == Map(1L -> "log1", 2L -> "base"), "new logs stay invisible until compacted")
    val rt = MorTable.read(spark, table, Seq("k"), "ver")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rt == Map(1L -> "log1", 2L -> "base", 3L -> "log2"))
  }

  test("schema evolution: a column new in a log null-fills base rows") {
    val s = spark
    import s.implicits._
    val table = tmpDir("graft-mor-e-") + "/t"
    MorTable.writeBase(Seq((1L, 1L)).toDF("k", "ver"), table)
    MorTable.appendLog(Seq((2L, 1L, "tagged")).toDF("k", "ver", "tag"), table)
    val rows = MorTable.read(spark, table, Seq("k"), "ver")
      .select("k", "tag").collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows == Map(1L -> None, 2L -> Some("tagged")))
  }
}
