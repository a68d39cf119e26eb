package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Randomized property: for ANY covered query shape — random grouping
  * subset, random decomposable aggregate set, random filters over
  * grouping columns — the MV rewrite answers bit-identically to the
  * deregistered base plan. One fixture, many seeded trials
  * (reproducible failures); every trial also asserts the rewrite
  * actually FIRED, so a silently-bailing rule can't pass by answering
  * from the base.
  */
class MvRewritePropertySpec extends SparkSpec {

  private def scanPaths(df: DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves().map(_.treeString).mkString("\n")

  test("random covered queries: rewrite == base, and the rewrite fires every time") {
    val base = tmpDir("mvp-base")
    val mv = tmpDir("mvp-view")
    val s = spark
    import s.implicits._
    (1 to 2000).map { i =>
      (s"g${i % 5}", s"h${i % 3}", s"k${i % 7}",
        i.toLong * (if (i % 11 == 0) -1 else 1),
        if (i % 13 == 0) null else java.lang.Long.valueOf(i % 97))
    }.toDF("g1", "g2", "g3", "v", "w")
      .repartition(4).write.mode("overwrite").parquet(base)
    try {
      MaterializedViews.define(spark, base, Seq("g1", "g2", "g3"), Seq("v", "w"), mv)
      val groupPool = Vector("g1", "g2", "g3")
      def aggPool(rnd: Random): Seq[Column] = {
        val all = Vector[Int => Column](
          i => sum(col("v")).as(s"a$i"),
          i => sum(col("w")).as(s"a$i"),
          i => count(lit(1)).as(s"a$i"),
          i => count(col("w")).as(s"a$i"),
          i => min(col("v")).as(s"a$i"),
          i => max(col("w")).as(s"a$i"),
          i => avg(col("v")).as(s"a$i"))
        val picks = 1 + rnd.nextInt(4)
        (0 until picks).map(i => all(rnd.nextInt(all.size))(i))
      }
      (1 to 12).foreach { seed =>
        val rnd = new Random(seed * 7919L)
        val keys = rnd.shuffle(groupPool).take(1 + rnd.nextInt(3))
        val aggs = aggPool(rnd)
        val filter: Option[Column] = rnd.nextInt(3) match {
          case 0 => None
          case 1 => Some(col("g1").isin("g0", "g2", "g4"))
          case _ => Some(col("g2") =!= "h1" && col("g3").isin("k1", "k2", "k3", "k5"))
        }
        def q(): DataFrame = {
          val b = spark.read.parquet(base)
          val f = filter.fold(b)(b.where)
          f.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
        }
        assert(scanPaths(q()).contains(mv), s"seed=$seed: rewrite did not fire")
        val got = q().orderBy(keys.map(col): _*).collect()
        MaterializedViews.registry.remove(MaterializedViews.canonical(base))
        val want = q().orderBy(keys.map(col): _*).collect()
        // re-register for the next trial (define would rebuild; reuse)
        MaterializedViews.registry.put(MaterializedViews.canonical(base),
          MaterializedViews.MvDef(MaterializedViews.canonical(base), mv,
            Seq("g1", "g2", "g3"), Seq("v", "w"), mv + "/gen-000000", base))
        assert(got.toSeq == want.toSeq,
          s"seed=$seed keys=$keys rewrite diverged:\n${got.toSeq}\nvs\n${want.toSeq}")
      }
    } finally MaterializedViews.deregister(base)
  }
}
