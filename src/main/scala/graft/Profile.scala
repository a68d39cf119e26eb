package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch profiling main: stage-by-stage timings for operators under
  * tuning. Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = sources.TableLoader.table(spark, sfDir, "documents")
    val idCol = "doc_id"; val textCol = "text"
    val n = 5; val numHashes = 64; val bands = 16; val rows = numHashes / bands

    val sh = docs.select(col(idCol).as("doc"), explode(Dedup.hashedShingles(col(textCol), n)).as("h"))
    time("sh explode")(sh)

    val minCols = (0 until numHashes).map(s => min(xxhash64(lit(s), col("h"))).as(s"_m$s"))
    val sigs = sh.groupBy(col("doc")).agg(minCols.head, minCols.tail: _*)
    time("sigs agg")(sigs)

    val bandKeys = (0 until bands).map { b =>
      val slice = (b * rows until (b + 1) * rows).map(i => col(s"_m$i"))
      xxhash64((lit(b) +: slice): _*)
    }
    val banded = sigs.select(col("doc"), posexplode(array(bandKeys: _*)).as(Seq("band", "bkey")))
    time("banded")(banded)

    val candidates = banded.as("a").join(banded.as("b"), Seq("band", "bkey"))
      .filter(col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
    time("candidates")(candidates)

    val sets = sh.groupBy(col("doc"))
      .agg(collect_set(col("h")).as("hs"), count(lit(1)).as("nsh"))
    time("sets")(sets)

    time("full minhashLshPairs")(Dedup.minhashLshPairs(docs, idCol, textCol))
    time("full again")(Dedup.minhashLshPairs(docs, idCol, textCol))
    spark.stop()
  }
}
