package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashSpec extends SparkSpec {

  test("mixer is deterministic and permutation-distinct") {
    assert(MinHashMix.mix(42L, 0) == MinHashMix.mix(42L, 0))
    assert(MinHashMix.mix(42L, 0) != MinHashMix.mix(42L, 1))
    assert(MinHashMix.mix(42L, 0) != MinHashMix.mix(43L, 0))
  }

  test("aggregate over exploded hashes equals the scalar kernel signature") {
    val s = spark
    import s.implicits._
    val sets = Seq(
      (1L, Seq(10L, 20L, 30L, 40L)),
      (2L, Seq(99L)),
      (3L, (1L to 200L).toSeq))
    val exploded = sets.toDF("doc", "hs")
      .select(col("doc"), explode(col("hs")).as("h"))
    val agg = exploded.groupBy("doc")
      .agg(MinHashFunctions.minhash(col("h"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    sets.foreach { case (doc, hs) =>
      assert(agg(doc) == MinHashMix.signature(hs.toArray, 16).toSeq, s"doc $doc")
    }
  }

  test("band keys: identical sets collide everywhere, disjoint sets nowhere") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(10L, 20L, 30L)),
      (2L, Seq(10L, 20L, 30L)),
      (3L, Seq(77L, 88L, 99L)))
      .toDF("doc", "hs")
      .select(col("doc"), MinHashFunctions.lshBandKeys(col("hs"), 64, 16).as("keys"))
    val keys = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(keys(1L).size == 16)
    assert(keys(1L) == keys(2L))
    assert((0 until 16).forall(b => keys(1L)(b) != keys(3L)(b)))
  }
}
