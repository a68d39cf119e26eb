package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalJoinViewSpec extends SparkSpec {

  test("fact increments + dim patch converge to the full recompute; dim change reweights without fact rescan") {
    val s = spark
    import s.implicits._
    val factState = tmpDir("graft-ijv-fact-")
    val dimState = tmpDir("graft-ijv-dim-")
    val facts = Seq(
      (1L, 10.25), (1L, 4.50), (2L, 3.00), // batch 1
      (2L, 1.75), (3L, 8.00))              // batch 2 (key 3 is new)
      .toDF("k", "v")
    IncrementalJoinView.refreshFact(spark, factState, facts.limit(3), "k", "v")
    IncrementalJoinView.refreshFact(spark, factState, facts.offset(3), "k", "v")
    val dim1 = Seq((1L, "red"), (2L, "blue"), (3L, "red"))
      .toDF("dk", "grp").withColumn("_ver", lit(1L))
    IncrementalJoinView.refreshDim(spark, dimState, dim1, "dk", "_ver")

    def snap() = IncrementalJoinView.read(spark, factState, dimState, "k", "dk", "grp")
      .select(col("grp"), col("n"), col("sum_dec").cast("double").as("sum"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    val before = snap()
    assert(before("red") == ((3L, 22.75))) // keys 1 (2 rows) + 3 (1 row)
    assert(before("blue") == ((2L, 4.75)))

    // key 2 moves blue -> red: view reweights from COMPACT state only —
    // the fact partial table still holds exactly one row per key
    val patch = Seq((2L, "red")).toDF("dk", "grp").withColumn("_ver", lit(2L))
    IncrementalJoinView.refreshDim(spark, dimState, patch, "dk", "_ver")
    val after = snap()
    assert(after("red") == ((5L, 27.5)))
    assert(!after.contains("blue"))
    val partials = IncrementalAgg.read(spark, factState, Seq("k"))
    assert(partials.count() == 3, "fact state is per-key partials, not history")
  }

  test("fact keys missing from the dim drop out; dim keys with no facts contribute nothing") {
    val s = spark
    import s.implicits._
    val factState = tmpDir("graft-ijv-fact2-")
    val dimState = tmpDir("graft-ijv-dim2-")
    IncrementalJoinView.refreshFact(spark, factState,
      Seq((1L, 2.0), (9L, 5.0)).toDF("k", "v"), "k", "v")
    IncrementalJoinView.refreshDim(spark, dimState,
      Seq((1L, "a"), (7L, "b")).toDF("dk", "grp").withColumn("_ver", lit(1L)), "dk", "_ver")
    val out = IncrementalJoinView.read(spark, factState, dimState, "k", "dk", "grp")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 1L))
  }
}
