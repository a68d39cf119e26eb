package graft.functions

import graft.SparkSpec
import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

/** Misra-Gries sketch: eviction actually exercised (domain larger
  * than capacity), survival guarantee, merge across partitions, and
  * the candidates+verify operator equalling the exact plan.
  */
class FreqSketchSpec extends SparkSpec {

  /** 1 heavy value ('hot', 40%), 1 warm ('warm', 20%), 200 singleton
    * noise values — capacity 8 forces constant eviction.
    */
  private def skewed = {
    val s = spark; import s.implicits._
    val rows = Seq.fill(200)("hot").take(160) ++ Seq.fill(80)("warm") ++
      (0 until 200).map(i => s"noise_$i")
    scala.util.Random.shuffle(rows).toDF("v").repartition(7)
  }

  test("values above n/(capacity+1) always survive the sketch, across partitions") {
    val sk = skewed.agg(FreqSketchFunctions.freq_sketch(col("v"), 8).as("sk"))
      .select(explode(col("sk")).as("h"))
      .select(col("h.value"), col("h.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk.size <= 8, "state bounded by capacity")
    // n=440; guarantee: freq > 440/9 ≈ 49 survives; est undercounts only
    assert(sk.contains("hot") && sk.contains("warm"))
    assert(sk("hot") <= 160 && sk("warm") <= 80)
  }

  test("HeavyHitters.frequent equals the exact HAVING plan on the skewed fixture") {
    val df = skewed
    val got = HeavyHitters.frequent(df, "v", minShare = 0.15, capacity = 8)
      .select("v", "n").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact: hot 160/440 = 36%, warm 80/440 = 18%; noise far below 15%
    assert(got == Map("hot" -> 160L, "warm" -> 80L))
  }

  test("capacity below 1/minShare is rejected") {
    intercept[IllegalArgumentException] {
      HeavyHitters.frequent(skewed, "v", minShare = 0.01, capacity = 10)
    }
  }

  test("nulls are ignored; empty input yields an empty sketch") {
    val s = spark; import s.implicits._
    val df = Seq(Some("a"), None, Some("a"), None).toDF("v")
    val sk = df.agg(FreqSketchFunctions.freq_sketch(col("v"), 4).as("sk"))
      .select(explode(col("sk")).as("h")).select("h.value", "h.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk == Map("a" -> 2L))
    val empty = Seq.empty[String].toDF("v")
      .agg(FreqSketchFunctions.freq_sketch(col("v"), 4).as("sk"))
      .select(size(col("sk"))).head.getInt(0)
    assert(empty == 0)
  }
}
