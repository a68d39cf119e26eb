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

  /** `w = AutoWidth` (the default) sizes the sketch to the data: one
    * O(k) KMV pre-pass estimates each side's key cardinality and w
    * becomes the power of two ≥ 4× the larger estimate, clamped to
    * [2048, 2^20]. The first bench run of the fixed default proved
    * why: at sf0.1's 150k keys, w=2048 put ~73 keys in every cell and
    * the collision mass (≈ |A|·|B|/w) estimated a fine 0.6M-row join
    * at 44M — a loud FALSE REFUSAL. Auto-sizing keeps cells ≲¼
    * occupied so collision noise stays well under any bound worth
    * guarding, at the price of two O(k) scans and a ≤32 MB sketch
    * (d=4 × 2^20 longs) — pre-flight change, guard direction
    * unchanged: the estimate still never undercounts at ANY width.
    */
  val AutoWidth: Int = 0

  private def nextPow2(n: Long): Int = {
    var w = 2048L
    while (w < n && w < (1L << 20)) w <<= 1
    w.toInt
  }

  private def autoWidth(a: DataFrame, b: DataFrame, key: String): Int = {
    import graft.functions.KmvFunctions
    def distinctEst(df: DataFrame): Long =
      df.agg(KmvFunctions.kmv_distinct(xxhash64(col(key).cast("string")), 256).as("d"))
        .head().getLong(0)
    nextPow2(4L * math.max(distinctEst(a), distinctEst(b)))
  }

  /** Estimate |a ⋈ b| on `key` (never undercounts). One tiny
    * driver-side scalar — the two input scans are the whole cost.
    */
  def estimateJoinSize(a: DataFrame, b: DataFrame, key: String,
      d: Int = 4, w: Int = AutoWidth): Long = {
    val w1 = if (w > 0) w else autoWidth(a, b, key)
    val ka = a.select(col(key).cast("string").as("_k"))
      .agg(CmsFunctions.cmsSketch(col("_k"), d, w1).as("ska"))
    val kb = b.select(col(key).cast("string").as("_k"))
      .agg(CmsFunctions.cmsSketch(col("_k"), d, w1).as("skb"))
    ka.crossJoin(kb)
      .select(CmsFunctions.cmsInnerProduct(col("ska"), col("skb"), d, w1)
        .cast("long").as("est"))
      .head().getLong(0)
  }

  /** Run the equi-join iff the (never-undercounting) estimate fits
    * `maxRows`; refuse loudly otherwise. Inner join on `key`.
    */
  def guardedEquiJoin(a: DataFrame, b: DataFrame, key: String, maxRows: Long,
      d: Int = 4, w: Int = AutoWidth): DataFrame = {
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
