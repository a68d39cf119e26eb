package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxDistinctSpec extends SparkSpec {

  test("approx_count_distinct stays within HLL++ error of exact per group") {
    val ev = graft.sources.TableLoader.table(spark, sfDir, "events")
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      // default rsd = 0.05; allow 3 sigma plus integer slack
      assert(math.abs(a - e) <= math.max(3, 0.15 * e), s"$k: approx $a vs exact $e")
    }
  }

  test("sketches merge: per-partition HLL union equals whole-column estimate") {
    val ev = graft.sources.TableLoader.table(spark, sfDir, "events")
    val whole = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .collect()(0).getLong(0)
    // same sketch built as a two-level merge (the 1000-executor shape)
    val merged = ev.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .collect()(0).getLong(0)
    assert(merged == whole)
  }
}
