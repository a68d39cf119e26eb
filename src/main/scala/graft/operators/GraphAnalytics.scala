package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over pair lists — the graphs graft manufactures
  * (near-dup pair sets, word co-occurrence) analyzed in place, no
  * graph library. Triangle structure is the local-cohesion signal:
  * in a near-dup graph, triangle-rich neighborhoods are template
  * families (safe to collapse aggressively) while triangle-free
  * chains are drift (A~B~C without A~C — collapsing the chain
  * over-merges); in a word graph it's the clustering coefficient's
  * numerator.
  */
object GraphAnalytics {

  /** Enumerate all triangles of an undirected graph given as a pair
    * list (either orientation, duplicates tolerated). Output one row
    * per triangle as (x, y, z), endpoints ascending.
    *
    * Scale design — DEGREE-ordered wedge enumeration (the
    * node-iterator bound of Schank & Wagner / Latapy): every edge is
    * oriented from its lower-(degree, id) endpoint to the higher
    * one, and wedges are enumerated only at each triangle's
    * lowest-degree apex. Out-degrees in this orientation are
    * O(√m), so the wedge join generates O(m^{3/2}) candidates
    * total — against the id-ordered or naive formulation whose
    * wedge count is Σ deg², quadratic in the hub degree (one
    * celebrity node in a mention graph and the join explodes).
    * Three hash joins (degree attach ×2, wedge close), no driver
    * state; the closing probe trades (t1, t2) key pairs only.
    */
  def triangles(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    val e = edges
      .select(least(col(uCol), col(vCol)).as("lo"), greatest(col(uCol), col(vCol)).as("hi"))
      .filter(col("lo") =!= col("hi") && col("lo").isNotNull && col("hi").isNotNull)
      .distinct()
    val deg = e.select(explode(array(col("lo"), col("hi"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient each edge toward the higher (degree, id); keep the
    // destination's rank key so wedge legs order without re-joining
    val loLower = col("dlo") < col("dhi") ||
      (col("dlo") === col("dhi") && col("lo") < col("hi"))
    val oriented = e
      .join(deg.select(col("n").as("lo"), col("d").as("dlo")), "lo")
      .join(deg.select(col("n").as("hi"), col("d").as("dhi")), "hi")
      .select(
        when(loLower, col("lo")).otherwise(col("hi")).as("src"),
        when(loLower, col("hi")).otherwise(col("lo")).as("dst"),
        when(loLower, col("dhi")).otherwise(col("dlo")).as("ddst"))
    val l = oriented.select(col("src"), col("dst").as("t1"), col("ddst").as("d1"))
    val r = oriented.select(col("src"), col("dst").as("t2"), col("ddst").as("d2"))
    val wedges = l.join(r, "src")
      .filter(col("d1") < col("d2") || (col("d1") === col("d2") && col("t1") < col("t2")))
    wedges
      .join(oriented.select(col("src").as("t1"), col("dst").as("t2")), Seq("t1", "t2"))
      .select(
        array_sort(array(col("src"), col("t1"), col("t2"))).as("_t"))
      .select(col("_t").getItem(0).as("x"), col("_t").getItem(1).as("y"),
        col("_t").getItem(2).as("z"))
  }

  /** Link prediction over an undirected pair graph: for every
    * NON-adjacent pair (x, y) sharing at least one neighbor, the
    * three classical neighborhood scores —
    * `cn` = |N(x) ∩ N(y)| (common neighbors),
    * `ra_x1e6` = Σ_z∈N(x)∩N(y) ⌊10⁶ / deg(z)⌋ (resource allocation,
    * Zhou et al. 2009, in exact integer fixed point — consistently
    * the strongest of the simple indices because a shared rare
    * neighbor is worth more than a shared hub), and
    * `pa` = deg(x)·deg(y) (preferential attachment). In a near-dup
    * graph these rank the pairs MinHash probably missed; in an
    * entity graph they rank candidate merges for review.
    *
    * Scale shape: wedge generation is the quadratic risk — each
    * center z contributes deg(z)² wedge pairs, so one celebrity hub
    * explodes the join. `maxCenterDegree` bounds it: by default a
    * center over the cap FAILS LOUDLY (raise_error riding the degree
    * attach — silent truncation would read as "no link evidence");
    * with `dropHubs = true` over-cap centers are excluded and the
    * scores become documented lower bounds (the standard practice —
    * a hub shared by everyone carries ~zero RA weight anyway:
    * ⌊10⁶/deg⌋ → 0). Work is then ≤ |V|·C² wedges plus node-keyed
    * hash joins; nothing driver-sized.
    */
  def linkPrediction(edges: DataFrame, uCol: String, vCol: String,
      maxCenterDegree: Int = 100000, dropHubs: Boolean = false): DataFrame = {
    require(maxCenterDegree >= 2, "maxCenterDegree must be >= 2")
    val e = edges
      .select(least(col(uCol), col(vCol)).as("lo"), greatest(col(uCol), col(vCol)).as("hi"))
      .filter(col("lo") =!= col("hi") && col("lo").isNotNull && col("hi").isNotNull)
      .distinct()
    val adj = e.select(col("lo").as("n"), col("hi").as("nbr"))
      .unionByName(e.select(col("hi").as("n"), col("lo").as("nbr")))
    val deg = adj.groupBy(col("n")).agg(count(lit(1)).as("d"))
    val centerDeg =
      if (dropHubs) deg.filter(col("d") <= maxCenterDegree)
      else deg.withColumn("d", col("d") +
        when(col("d") > maxCenterDegree,
          raise_error(concat(lit("linkPrediction: center degree exceeds maxCenterDegree="),
            lit(maxCenterDegree), lit(" — pass dropHubs=true for bounded lower-bound scores")))
            .cast("long"))
          .otherwise(lit(0L)))
    val centers = adj.join(centerDeg.withColumnRenamed("d", "dz"), "n")
    val l = centers.select(col("n").as("z"), col("nbr").as("x"), col("dz"))
    val r = centers.select(col("n").as("z"), col("nbr").as("y"))
    val cand = l.join(r, "z")
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000 div dz")).as("ra_x1e6"))
    cand
      .join(e, cand("x") === e("lo") && cand("y") === e("hi"), "left_anti")
      .join(deg.select(col("n").as("x"), col("d").as("dx")), "x")
      .join(deg.select(col("n").as("y"), col("d").as("dy")), "y")
      .select(col("x"), col("y"), col("cn"), col("ra_x1e6"),
        (col("dx") * col("dy")).as("pa"))
  }

  /** k-core decomposition: the maximal subgraph in which every node
    * has degree ≥ k, by iterative peeling — drop all nodes under
    * degree k, recompute, repeat to fixpoint. The k-core is UNIQUE
    * (removal order never matters), so the result is deterministic on
    * any engine, and it is the standard density filter on the graphs
    * graft builds: in a near-dup graph the 2-core separates template
    * families from accidental chains; in a word graph the k-core is
    * the tightly-connected topic kernel (k-core-based keyword
    * extraction).
    *
    * Scale shape: each round is one map-side-combined degree
    * aggregation plus two semi-joins of the edge list against the
    * surviving-node set — everything keyed on node ids, nothing
    * driver-sized except the per-round scalar convergence count.
    * Lineage is truncated per round (localCheckpoint) exactly like
    * Dedup.clusters — an iterative plan otherwise compounds until
    * planning itself OOMs — and the previous round's checkpoint
    * blocks are freed eagerly. Rounds are data-bounded: each round
    * removes ≥ 1 node or stops, and real peels converge in a handful
    * (the worst case, one long chain, is maxRounds's job to cap
    * loudly).
    *
    * Returns (id, degree) over the k-core, degree measured INSIDE
    * the core.
    */
  def kCore(edges: DataFrame, uCol: String, vCol: String, k: Int,
      maxRounds: Int = 50): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val und = edges
      .select(least(col(uCol), col(vCol)).as("lo"), greatest(col(uCol), col(vCol)).as("hi"))
      .filter(col("lo") =!= col("hi") && col("lo").isNotNull && col("hi").isNotNull)
      .distinct()
    var e = und.select(col("lo").as("s"), col("hi").as("d"))
      .unionByName(und.select(col("hi").as("s"), col("lo").as("d")))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val deg = e.groupBy(col("s")).agg(count(lit(1)).as("deg"))
      val nBad = deg.filter(col("deg") < k).count()
      if (nBad == 0) converged = true
      else {
        val keep = deg.filter(col("deg") >= k).select(col("s"))
        val prev = e
        e = e.join(keep, "s")
          .join(keep.withColumnRenamed("s", "d"), "d")
          .select(col("s"), col("d"))
          .localCheckpoint(true)
        unpersistCheckpoint(prev)
      }
      round += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"GraphAnalytics.kCore stopped after maxRounds=$maxRounds without converging: " +
          "the returned subgraph may still contain nodes under degree k. Raise maxRounds.")
    e.groupBy(col("s")).agg(count(lit(1)).as("degree"))
      .select(col("s").as("id"), col("degree"))
  }

  /** Free the blocks behind an eagerly-localCheckpointed DataFrame
    * (same rationale as Dedup's helper: Dataset.unpersist consults
    * only the CacheManager; checkpoint blocks hang off the LogicalRDD
    * leaf and leak O(rounds) otherwise).
    */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}
