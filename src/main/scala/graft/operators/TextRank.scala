package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** TextRank (Mihalcea & Tarau 2004): PageRank over the word
  * co-occurrence graph as a corpus-level keyword-importance score —
  * the graph-centrality member of the quality/curation family (the
  * same shape Common Crawl-scale pipelines use for harmonic/PageRank
  * domain centrality).
  *
  * Determinism contract (what makes this oracle-able cross-engine):
  * ranks are FIXED-POINT LONGS, not doubles. r₀ = 10¹²; each
  * iteration computes r' (v) = 0.15·10¹² + Σ_{u→v} ⌊r(u)·85 /
  * (100·deg(u))⌋ in pure positive-integer arithmetic — floor division
  * is identical in Spark (`div`) and DuckDB (`//`), addition is
  * associative, so ten iterations reproduce bit-for-bit on any
  * engine. No float damping, no convergence test (fixed iteration
  * count), no tie-dependent ordering.
  *
  * Scale shape: the graph builds with ONE shuffle (distinct canonical
  * adjacent pairs; pair extraction is an in-array kernel, tokens
  * never explode row-wise). Each iteration is one join of the
  * vocab-sized rank table against the edge list plus one regroup —
  * the standard distributed power-iteration layout — with
  * `localCheckpoint` after every step so the plan stays constant-size
  * instead of growing 10 optimizer generations deep. Everything that
  * is corpus-sized is touched exactly once.
  */
object TextRank {

  val RankScale = 1000000000000L // r0 = 1.0 in fixed point
  val Base = 150000000000L       // 0.15 damping floor

  /** Directed edge list of the undirected word-adjacency graph:
    * distinct canonical (least, greatest) adjacent-token pairs, then
    * both directions. Self-loops dropped.
    */
  def adjacencyEdges(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val arr = split(col(textCol), " ")
    val und = docs
      .select(explode(when(size(arr) >= 2,
        transform(sequence(lit(0), size(arr) - 2),
          i => struct(element_at(arr, i + 1).as("x"), element_at(arr, i + 2).as("y"))))
        .otherwise(array().cast("array<struct<x:string,y:string>>"))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct()
    und.select(col("a").as("src"), col("b").as("dst"))
      .union(und.select(col("b").as("src"), col("a").as("dst")))
  }

  /** Fixed-point ranks after `iterations` power steps:
    * (word, rank: long). Words with no neighbor (single-token docs)
    * carry no edge and are excluded — they would sit at the damping
    * floor forever.
    *
    * Size-gated like [[Dedup.clusters]]: the EDGE LIST of a word
    * graph is vocab²-bounded, not corpus-bounded — once the corpus
    * passes a modest size the graph stops growing while the scan
    * cost doesn't. Up to `maxLocalEdges` directed edges the power
    * loop runs on the driver over primitive arrays (one Spark job to
    * collect, zero per-iteration jobs; integer addition is
    * associative, so the result is bit-identical to the distributed
    * loop). Bigger graphs — web-domain centrality at crawl scale —
    * take the distributed join/regroup loop with `localCheckpoint`
    * truncating lineage per step.
    */
  def rank(
      docs: DataFrame,
      textCol: String = "text",
      iterations: Int = 10,
      maxLocalEdges: Long = 2000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val spark = docs.sparkSession
    // materialize the distinct edge list ONCE — the gate aggregate,
    // the degree table, and the local-path collect all reuse it
    // instead of re-scanning and re-deduping the corpus per action
    val edges0 = adjacencyEdges(docs, textCol).localCheckpoint(true)
    val deg = edges0.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val nEdges = deg.agg(sum(col("d"))).head() match {
      case row if row.isNullAt(0) => 0L
      case row => row.getLong(0)
    }
    if (nEdges <= maxLocalEdges) {
      val pairs = edges0.collect().map(r => (r.getString(0), r.getString(1)))
      val words = pairs.iterator.map(_._1).toArray.distinct.sorted
      val idx = words.zipWithIndex.toMap
      val srcs = pairs.map(p => idx(p._1))
      val dsts = pairs.map(p => idx(p._2))
      val d = new Array[Long](words.length)
      srcs.foreach(s => d(s) += 1)
      var r = Array.fill(words.length)(RankScale)
      for (_ <- 1 to iterations) {
        val next = Array.fill(words.length)(Base)
        var i = 0
        while (i < srcs.length) {
          next(dsts(i)) += (r(srcs(i)) * 85) / (100 * d(srcs(i)))
          i += 1
        }
        r = next
      }
      import spark.implicits._
      words.zip(r).toSeq.toDF("word", "rank")
    } else {
      // (src, dst, d): materialized once, reused by every iteration
      val edges = edges0.join(deg, "src").localCheckpoint()
      var r = deg.select(col("src").as("word"), lit(RankScale).as("r")).localCheckpoint()
      for (_ <- 1 to iterations) {
        val contrib = edges.join(r, edges("src") === r("word"))
          .select(col("dst"), expr("(r * 85) div (100 * d)").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("s"))
        r = deg.select(col("src").as("word"))
          .join(contrib, col("word") === col("dst"), "left")
          .select(col("word"), (lit(Base) + coalesce(col("s"), lit(0L))).as("r"))
          .localCheckpoint()
      }
      r.select(col("word"), col("r").as("rank"))
    }
  }
}
