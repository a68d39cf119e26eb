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
}
