package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {

  test("no false negatives: every real match survives the prune") {
    val s = spark
    import s.implicits._
    val fact = (1L to 10000L).map(k => (k, k % 7)).toDF("fk", "v")
    val dim = Seq(3L, 500L, 9999L, 10001L).toDF("dk")
    val out = BloomPrune.prunedJoin(fact, Seq("fk"), dim, Seq("dk"),
      expectedKeys = 16, fpp = 0.01)
    assert(out.select("fk").as[Long].collect().sorted.toSeq == Seq(3L, 500L, 9999L))
  }

  test("the probe actually prunes: filter passes ~fpp of non-matching keys") {
    val s = spark
    import s.implicits._
    val dim = (1L to 100L).toDF("dk")
    val bloom = BloomPrune.dimBloom(dim, Seq("dk"), expectedKeys = 100, fpp = 0.01).get
    val probes = (1000000L to 1100000L).toDF("fk")
    val passed = probes.filter(BloomPrune.mightContain(bloom, Seq(col("fk")))).count()
    assert(passed < 5000, s"bloom passed $passed of 100001 non-members") // ~1% expected
  }

  test("empty dimension yields an empty join, not a crash") {
    val s = spark
    import s.implicits._
    val fact = Seq((1L, "a")).toDF("fk", "v")
    val dim = Seq.empty[Long].toDF("dk")
    assert(BloomPrune.prunedJoin(fact, Seq("fk"), dim, Seq("dk")).count() == 0L)
  }

  test("multi-column keys hash consistently on both sides") {
    val s = spark
    import s.implicits._
    val fact = Seq((1L, "x", 10), (2L, "y", 20), (3L, "z", 30)).toDF("k1", "k2", "v")
    val dim = Seq((1L, "x"), (3L, "z"), (3L, "w")).toDF("d1", "d2")
    val out = BloomPrune.prunedJoin(fact, Seq("k1", "k2"), dim, Seq("d1", "d2"))
    assert(out.select("v").as[Int].collect().sorted.toSeq == Seq(10, 30))
  }

  test("plan shape: the might_contain probe survives optimization on a real scan") {
    val li = graft.sources.TableLoader.table(spark, sfDir, "lineitem")
    val urgent = graft.sources.TableLoader.table(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val out = BloomPrune.prunedJoin(li, Seq("l_orderkey"), urgent, Seq("o_orderkey"))
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), s"expected bloom probe in plan:\n$plan")
    // the probe must sit BELOW the join (on the fact branch), pruning pre-shuffle
    val joinIdx = plan.indexOf("Join")
    assert(plan.indexOf("might_contain") > joinIdx, "probe should be inside a join branch")
  }
}
