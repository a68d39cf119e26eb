package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("co-bucketed tables join without any exchange") {
    val ord = TableLoader.table(spark, sfDir, "orders")
    val li = TableLoader.table(spark, sfDir, "lineitem")
    Bucketing.writeBucketed(ord, "graft_orders_b", Seq("o_orderkey"), 8)
    Bucketing.writeBucketed(li, "graft_lineitem_b", Seq("l_orderkey"), 8)

    // force a non-broadcast join so the exchange-free property is the
    // bucketing's doing, then restore the session conf
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val joined = Bucketing.table(spark, "graft_orders_b")
        .join(Bucketing.table(spark, "graft_lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.treeString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // and the same result as the plain join
      assert(joined.count() == li.join(ord, col("o_orderkey") === col("l_orderkey")).count())
    } finally spark.conf.set(key, prev)
  }
}
