package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SafeJoinSpec extends SparkSpec {

  test("estimate never undercounts; guarded join passes under the bound and matches the plain join") {
    val s = spark
    import s.implicits._
    // 100 keys x (3 left, 4 right) = 1200 true join rows
    val a = (1L to 100L).flatMap(k => Seq.fill(3)(k)).toDF("k").withColumn("av", col("k") * 2)
    val b = (1L to 100L).flatMap(k => Seq.fill(4)(k)).toDF("k").withColumn("bv", col("k") * 3)
    val est = SafeJoin.estimateJoinSize(a, b, "k")
    assert(est >= 1200L, s"AGMS estimate must never undercount, got $est")
    assert(est <= 2400L, s"estimate wildly high for w=2048 at 100 keys: $est")
    val got = SafeJoin.guardedEquiJoin(a, b, "k", maxRows = 5000L)
    val want = a.join(b, "k")
    assert(got.count() == 1200L)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("an exploding join is refused loudly before any shuffle") {
    val s = spark
    import s.implicits._
    // one hot key on both sides: 1000 x 1000 = 1e6 rows
    val a = (1L to 1000L).map(_ => 7L).toDF("k")
    val b = (1L to 1000L).map(_ => 7L).toDF("k")
    val e = intercept[IllegalStateException] {
      SafeJoin.guardedEquiJoin(a, b, "k", maxRows = 100000L)
    }
    assert(e.getMessage.contains("exceeds maxRows"))
    intercept[IllegalArgumentException](SafeJoin.guardedEquiJoin(a, b, "k", maxRows = 0L))
  }
}
