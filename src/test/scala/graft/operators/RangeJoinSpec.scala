package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("pointInInterval: containment incl. boundaries; bin-spanning intervals work") {
    val s = spark
    import s.implicits._
    val points = Seq(("a", 1L, 5L), ("a", 2L, 10L), ("a", 3L, 15L), ("b", 4L, 5L))
      .toDF("k", "pid", "p")
    // interval [5, 15] spans bins 0..1 at width 10; [0, 4] only bin 0
    val ivs = Seq(("a", 10L, 5L, 15L), ("a", 20L, 0L, 4L), ("b", 30L, 6L, 9L))
      .toDF("k", "iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, ivs, Seq("k"), "p", "lo", "hi", binWidth = 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 10L), (3L, 10L))) // 5,10,15 all in [5,15]; 4L is key b outside [6,9]
  }

  test("pointInInterval: matches the inequality join on real events") {
    val ev = graft.sources.TableLoader.table(spark, sfDir, "events")
    val us = unix_micros(col("ts").cast("timestamp"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), us.as("p"))
    val w = 30L * 60 * 1000 * 1000
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), us.as("lo"), (us + w).as("hi"))
    val binned = RangeJoin.pointInInterval(clicks, purchases, Seq("user_id"), "p", "lo", "hi", w)
      .select("purchase_id", "click_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val theta = clicks.join(purchases, Seq("user_id"))
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("purchase_id", "click_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == theta)
    assert(binned.nonEmpty)
  }

  test("intervalOverlap: matches the inequality join on real events; one row per pair") {
    val ev = graft.sources.TableLoader.table(spark, sfDir, "events")
    val us = unix_micros(col("ts").cast("timestamp"))
    def side(tp: String, p: String) = ev.filter(col("event_type") === tp)
      .select(col("user_id"), col("event_id").as(s"${p}_id"),
        us.as(s"${p}_lo"), (us + 45L * 60 * 1000 * 1000).as(s"${p}_hi"))
    val l = side("click", "c")
    val r = side("view", "v")
    // binWidth much smaller than the interval length, so intervals span
    // many bins and the emit-once filter is actually exercised
    val binned = RangeJoin.intervalOverlap(l, r, Seq("user_id"),
        "c_lo", "c_hi", "v_lo", "v_hi", binWidth = 10L * 60 * 1000 * 1000)
      .select("c_id", "v_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    val theta = l.join(r, Seq("user_id"))
      .filter(col("c_lo") <= col("v_hi") && col("v_lo") <= col("c_hi"))
      .select("c_id", "v_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(binned.length == binned.toSet.size, "duplicate pairs emitted")
    assert(binned.toSet == theta)
    assert(theta.nonEmpty)
  }

  test("intervalOverlap: closed-end boundaries (touching intervals overlap)") {
    val s = spark
    import s.implicits._
    val l = Seq(("a", 1L, 0L, 10L)).toDF("k", "lid", "l_lo", "l_hi")
    val r = Seq(("a", 2L, 10L, 20L), ("a", 3L, 11L, 20L)).toDF("k", "rid", "r_lo", "r_hi")
    val out = RangeJoin.intervalOverlap(l, r, Seq("k"), "l_lo", "l_hi", "r_lo", "r_hi", 7L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(out == Set((1L, 2L))) // [0,10] touches [10,20]; [11,20] is disjoint
  }

  test("plan shape: binned range join is a hash/merge equi-join, not a nested loop") {
    val s = spark
    import s.implicits._
    val points = Seq(("a", 1L, 5L)).toDF("k", "pid", "p")
    val ivs = Seq(("a", 10L, 0L, 9L)).toDF("k", "iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, ivs, Seq("k"), "p", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
