package graft.operators

import graft.functions.CmsFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cardinality-guarded equi-join — the pre-flight check that stops a
  * join explosion BEFORE the shuffle: |A ⋈ B| is estimated with the
  * AGMS/CMS inner product (two constant-size sketches, one
  * map-side-combined scan each — the [[graft.functions.CmsFunctions]]
  * kernel q_cms_join_size verifies) and the join only runs when the
  * estimate is under the caller's bound.
  *
  * The guard direction is what makes it SAFE: CMS cell collisions
  * only ADD, so the inner-product estimate NEVER undercounts the true
  * join size. estimate ≤ maxRows therefore PROVES the join fits; an
  * over-bound join can never slip through. The price is one-sided
  * false refusals (a small join estimated high by collisions —
  * expected overcount ≤ |A|·|B|/w per row, so size w to the key
  * cardinality). At 100 TB this is the difference between a loud
  * 2-scan refusal and a 10¹⁴-row shuffle discovered by the pager.
  */
object SafeJoin {

  /** Estimate |a ⋈ b| on `key` (never undercounts). One tiny
    * driver-side scalar — the two input scans are the whole cost.
    */
  def estimateJoinSize(a: DataFrame, b: DataFrame, key: String,
      d: Int = 4, w: Int = 2048): Long = {
    val ka = a.select(col(key).cast("string").as("_k"))
      .agg(CmsFunctions.cmsSketch(col("_k"), d, w).as("ska"))
    val kb = b.select(col(key).cast("string").as("_k"))
      .agg(CmsFunctions.cmsSketch(col("_k"), d, w).as("skb"))
    ka.crossJoin(kb)
      .select(CmsFunctions.cmsInnerProduct(col("ska"), col("skb"), d, w)
        .cast("long").as("est"))
      .head().getLong(0)
  }

  /** Run the equi-join iff the (never-undercounting) estimate fits
    * `maxRows`; refuse loudly otherwise. Inner join on `key`.
    */
  def guardedEquiJoin(a: DataFrame, b: DataFrame, key: String, maxRows: Long,
      d: Int = 4, w: Int = 2048): DataFrame = {
    require(maxRows > 0, s"maxRows must be positive, got $maxRows")
    val est = estimateJoinSize(a, b, key, d, w)
    if (est > maxRows)
      throw new IllegalStateException(
        s"guardedEquiJoin: estimated join size $est exceeds maxRows=$maxRows on key '$key' " +
          "(the AGMS estimate never undercounts, so the true size may be as large) — " +
          "aggregate or filter a side first, or raise the bound deliberately")
    a.join(b, key)
  }
}
