package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  private def frames() = {
    val s = spark
    import s.implicits._
    // key 1 is the heavy hitter: 1000 of 1010 rows
    val big = (Seq.fill(1000)(1L) ++ (2L to 11L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (99L, "unmatched")).toDF("k", "name")
    (big, small)
  }

  test("salted join equals the plain join") {
    val (big, small) = frames()
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = SkewJoin.salted(big, small, Seq("k"), salt = 8).select("k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hot-key-only salting equals the plain join") {
    val (big, small) = frames()
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = SkewJoin.saltedHotKeys(big, small, "k", hotKeys = Seq(1L), salt = 8)
      .select("k", "payload", "name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salting actually scatters the hot key") {
    val (big, _) = frames()
    val salts = big.withColumn("s", pmod(xxhash64(monotonically_increasing_id()), lit(8L)).cast("int"))
      .filter(col("k") === 1L).select("s").distinct().count()
    assert(salts == 8)
  }
}
