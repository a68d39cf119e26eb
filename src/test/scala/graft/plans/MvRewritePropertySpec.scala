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

  test("property: CDC fold == full rebuild over random transitions (null keys, extreme hits, group death)") {
    val s = spark
    import s.implicits._
    (1 to 6).foreach { seed =>
      val rnd = new Random(seed * 104729L)
      val base = tmpDir(s"mvp-cdc-$seed-base")
      val mv = tmpDir(s"mvp-cdc-$seed-view")
      val nGroups = 2 + rnd.nextInt(5)
      val n = 200 + rnd.nextInt(400)
      val rows0 = (1 to n).map { i =>
        (i.toLong,
          if (i % (3 + rnd.nextInt(4)) == 0) null else s"g${i % nGroups}",
          (rnd.nextInt(1000) - 200).toLong)
      }
      rows0.toDF("id", "g1", "v").repartition(3).write.mode("overwrite").parquet(base)
      try {
        val d = MaterializedViews.define(spark, base, Seq("g1"), Seq("v"), mv)
        val old = rows0.toDF("id", "g1", "v")
        // random transition: delete a random residue class, bump a
        // random residue class by a random delta (hits extremes with
        // positive probability), insert a few rows incl. null-keyed
        val delMod = 2 + rnd.nextInt(8)
        val updMod = 2 + rnd.nextInt(6)
        val bump = (rnd.nextInt(2000) - 1000).toLong
        val inserts = (1 to 1 + rnd.nextInt(5)).map(j =>
          (100000L + j, if (j % 2 == 0) null else s"g${rnd.nextInt(nGroups)}",
            (rnd.nextInt(3000) - 1500).toLong))
        val next = old.filter(col("id") % delMod =!= 0)
          .withColumn("v", when(col("id") % updMod === 1, col("v") + bump).otherwise(col("v")))
          .unionByName(inserts.toDF("id", "g1", "v"))
        val feed = graft.operators.SnapshotDiff.changeFeed(old, next, keys = Seq("id"))
        next.repartition(3).write.mode("overwrite").parquet(base)
        val folded = MaterializedViews.refreshFromChanges(spark, d, feed,
          maxPruneKeys = if (rnd.nextBoolean()) 1000 else 1) // exercise BOTH recompute lanes
        val foldedRows = spark.read.parquet(folded.dataDir)
        MaterializedViews.deregister(base)
        val rebuilt = MaterializedViews.define(spark, base, Seq("g1"), Seq("v"), mv + "2")
        val directRows = spark.read.parquet(rebuilt.dataDir)
        assert(foldedRows.exceptAll(directRows).isEmpty && directRows.exceptAll(foldedRows).isEmpty,
          s"seed=$seed delMod=$delMod updMod=$updMod bump=$bump: CDC fold diverged from rebuild:\n" +
            foldedRows.orderBy("g1").collect().mkString("\n") + "\nvs\n" +
            directRows.orderBy("g1").collect().mkString("\n"))
      } finally MaterializedViews.deregister(base)
    }
  }
}
