package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch profiling/plan-review main: timings and formatted plans for
  * queries under tuning. Not part of the driver contract.
  * Args: query names to explain+time (default: a headline set).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")

    def time(name: String)(df: => DataFrame): Unit = {
      val d = df
      if (explain) {
        println(s"===== $name =====")
        d.explain("formatted")
      }
      val t0 = System.nanoTime()
      val n = d.count()
      val t1 = (System.nanoTime() - t0) / 1e9
      val t2 = { val s = System.nanoTime(); d.count(); (System.nanoTime() - s) / 1e9 }
      println(f"[profile] $name%-24s cold=$t1%7.2f s  warm=$t2%7.2f s  rows=$n")
    }

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_top_orders", "q5_star_join", "dedup_minhash_lsh",
        "dedup_ngram_jaccard", "dedup_simhash", "q_upsert_merge", "sim_bruteforce_topk")
    names.foreach { n => time(n)(Queries.all(n).run(spark, sfDir)) }
    spark.stop()
  }
}
