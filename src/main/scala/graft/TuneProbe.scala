package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: isolate the cost of the minhash auto-tuner vs the
  * pipeline at given parameters, on the derived sf1 corpus. Scratch
  * main, not part of the gate.
  */
object TuneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMED $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val docs01 = sources.TableLoader.table(spark, "/root/testdata/sf0.1", "documents")
    val docs1 = spark.read.parquet("/root/repo/target/scale-sf1/documents.parquet")
    val p01 = timed("tuner-sf0.1") {
      operators.Dedup.tunedMinhashParams(docs01, "doc_id", "text")
    }
    println(s"MINHASH sf0.1 $p01")
    val p1 = timed("tuner-sf1") {
      operators.Dedup.tunedMinhashParams(docs1, "doc_id", "text")
    }
    println(s"MINHASH sf1 $p1")
    timed("pipeline-tuned-sf1") {
      noop(operators.Dedup.minhashLshPairs(docs1, "doc_id", "text", 5, p1._1, p1._2, 0.5))
    }
    timed("pipeline-64-16-sf1") {
      noop(operators.Dedup.minhashLshPairs(docs1, "doc_id", "text", 5, 64, 16, 0.5))
    }
    spark.stop()
  }
}
