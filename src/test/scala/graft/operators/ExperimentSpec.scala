package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExperimentSpec extends SparkSpec {

  test("twoProportionZ2: hand-computed textbook 2x2") {
    val s = spark
    import s.implicits._
    // A: 40/100 convert, B: 60/100 → pooled 100/200
    // z² = 200·(40·100 − 60·100)²/(100·100·100·100) = 200·4e6/1e8 = 8
    val units =
      (Seq.fill(40)(("A", true)) ++ Seq.fill(60)(("A", false)) ++
        Seq.fill(60)(("B", true)) ++ Seq.fill(40)(("B", false))).toDF("v", "c")
    val r = Experiment.twoProportionZ2(units, col("v"), col("c")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((100L, 40L, 4000L)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((100L, 60L, 6000L)))
    assert(r.getLong(6) == 2000L)     // lift +20pp
    assert(r.getLong(7) == 80000L)    // z² = 8.0000
  }

  test("twoProportionZ2: no difference → z² 0; degenerate arms → NULL z²") {
    val s = spark
    import s.implicits._
    val same = (Seq.fill(5)(("A", true)) ++ Seq.fill(5)(("A", false)) ++
      Seq.fill(5)(("B", true)) ++ Seq.fill(5)(("B", false))).toDF("v", "c")
    assert(Experiment.twoProportionZ2(same, col("v"), col("c")).head().getLong(7) == 0L)
    // nobody converted anywhere: pooled X = 0 → NULL, not a crash
    val none = Seq(("A", false), ("B", false)).toDF("v", "c")
    assert(Experiment.twoProportionZ2(none, col("v"), col("c")).head().isNullAt(7))
    // one arm empty
    val solo = Seq(("A", true), ("A", false)).toDF("v", "c")
    val r = Experiment.twoProportionZ2(solo, col("v"), col("c")).head()
    assert(r.getLong(3) == 0L && r.isNullAt(5) && r.isNullAt(7))
  }

  test("assignVariant: deterministic, salt-sensitive, roughly balanced") {
    val s = spark
    import s.implicits._
    val ids = (0L until 1000L).toDF("id")
    val v1 = ids.select(Experiment.assignVariant(col("id")).as("v")).collect().map(_.getString(0))
    val v2 = ids.select(Experiment.assignVariant(col("id")).as("v")).collect().map(_.getString(0))
    assert(v1.sameElements(v2), "assignment must be deterministic")
    val nA = v1.count(_ == "A")
    assert(nA > 400 && nA < 600, s"50/50 split badly unbalanced: $nA/1000 in A")
    val salted = ids.select(Experiment.assignVariant(col("id"), salt = 7L).as("v"))
      .collect().map(_.getString(0))
    assert(!salted.sameElements(v1), "salt must shift the assignment")
  }
}
