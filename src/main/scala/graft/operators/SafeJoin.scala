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

  /** `w = AutoWidth` (the default) sizes the sketch to the data: a
    * KMV estimate of each side's key cardinality (read off the same
    * single-scan keyed fold the estimator itself uses — see
    * [[estimateAutoWidth]]) and w becomes the power of two ≥ 4× the
    * larger estimate, clamped to [2048, 2^26]. The first bench run of
    * the fixed default proved why: at sf0.1's 150k keys, w=2048 put
    * ~73 keys in every cell and the collision mass (≈ |A|·|B|/w)
    * estimated a fine 0.6M-row join at 44M — a loud FALSE REFUSAL.
    * Auto-sizing keeps cells ≲¼ occupied so collision noise stays
    * well under any bound worth guarding — the guard direction is
    * unchanged: the estimate still never undercounts at ANY width.
    */
  val AutoWidth: Int = 0

  /** Above this width the estimate switches from the dense
    * array-buffer kernel to the sparse cell-table plan (same hash
    * chain, bit-identical estimate — see [[estimateJoinSize]]). The
    * first sf1 rehearsal of the auto-width default measured why the
    * dense kernel must not grow unbounded: at w=2^20 each partial
    * aggregate carries a d·w = 32 MB long buffer, and 32 map-side
    * partials funnel into ONE reducer's ~1 GB of single-threaded
    * array merging — 10.3× wall at 10× data. The sparse plan's cost
    * is bounded by OCCUPIED cells (≤ d·distinct keys) regardless of
    * w, so width can keep growing with cardinality after buffers
    * would have hit a wall.
    */
  val DensePathMaxWidth: Int = 1 << 16

  private def nextPow2(n: Long): Int = {
    var w = 2048L
    while (w < n && w < (1L << 26)) w <<= 1
    w.toInt
  }

  /** The auto-width guard pipeline, restructured so each input is
    * scanned EXACTLY ONCE for the whole estimate (the r12 bench paid
    * 2.48× on q_safe_join for a KMV pre-pass that re-read both inputs
    * before the sketch pass re-read them again — at 100 TB those are
    * two avoidable full passes over the fact table):
    *
    *  1. per side, ONE scan folds to distinct-key counts
    *     (key_string, multiplicity) — cached (spills past memory;
    *     state is |distinct keys|-sized, the same bound the sparse
    *     cell table already carries);
    *  2. the KMV width sizing reads the CACHED key sets. KMV keeps
    *     the k smallest DISTINCT hashes — a pure function of the key
    *     SET — so the estimate over distinct keys is BIT-IDENTICAL
    *     to the raw-row fold, and the derived width is the same
    *     width the two-job pre-pass chose;
    *  3. the inner product runs the sparse occupied-cell plan over
    *     the cached keyed counts (weights = multiplicities): same
    *     buckets, same per-cell sums, same DECIMAL(38,0) products —
    *     and the dense/sparse equality spec already pins that the
    *     sparse plan reproduces the dense kernel at ANY width, so
    *     the auto estimate is unchanged bit-for-bit at widths where
    *     the old code ran the dense kernel too.
    *
    * The cell join is also folded into ONE exchange: cells of both
    * sides are side-tagged, unioned, and grouped once on (r, b) with
    * conditional sums — dropping a cells⋈cells shuffle join in favor
    * of a single map-side-combined aggregation.
    */
  private def estimateAutoWidth(a: DataFrame, b: DataFrame, key: String, d: Int): Long = {
    import graft.functions.KmvFunctions
    def keyed(df: DataFrame): DataFrame =
      df.where(col(key).isNotNull)
        .groupBy(col(key))
        .agg(count(lit(1)).as("_n"))
        .select(col(key).cast("string").as("_t"), col("_n"))
    val ka = keyed(a).persist()
    val kb = keyed(b).persist()
    try {
      // width sizing: one tiny job over the two cached key sets
      val perSide = ka.select(col("_t"), lit(0).as("_side"))
        .unionByName(kb.select(col("_t"), lit(1).as("_side")))
        .groupBy(col("_side"))
        .agg(KmvFunctions.kmv_distinct(xxhash64(col("_t")), 256).as("c"))
        .collect().map(_.getLong(1))
      val w = nextPow2(4L * (if (perSide.isEmpty) 0L else perSide.max))
      // weighted sparse cells of both sides, single-exchange inner product
      def cellRows(k: DataFrame, side: Int): DataFrame =
        k.select(
          posexplode(array((0 until d).map(r =>
            CmsFunctions.cmsBucket(col("_t"), r, w)): _*)).as(Seq("r", "b")),
          col("_n"), lit(side).as("_side"))
      val row = cellRows(ka, 0).unionByName(cellRows(kb, 1))
        .groupBy(col("r"), col("b"))
        .agg(sum(when(col("_side") === 0, col("_n"))).as("ca"),
          sum(when(col("_side") === 1, col("_n"))).as("cb"))
        .where(col("ca").isNotNull && col("cb").isNotNull) // the inner cells join
        .groupBy(col("r"))
        .agg(sum(col("ca").cast("decimal(38,0)") * col("cb").cast("decimal(38,0)")).as("ip"))
        .agg(min(col("ip")).cast("long").as("est"))
        .head()
      if (row.isNullAt(0)) 0L else row.getLong(0)
    } finally {
      ka.unpersist()
      kb.unpersist(): Unit
    }
  }

  /** Occupied sketch cells of one side as grouped rows (r, b, cnt) —
    * the SPARSE representation of exactly the array the dense kernel
    * fills: same [[graft.functions.CmsSketch.bucket]] chain, absent
    * cells are zero. Explode fans each key to its d cells, partial
    * aggregation collapses a partition to its occupied cells before
    * the exchange, so the shuffle carries ≤ d·(distinct keys) thin
    * rows however large w is — no d·w buffer exists anywhere.
    */
  private def sparseCells(df: DataFrame, key: String, d: Int, w: Int): DataFrame = {
    val term = col(key).cast("string")
    val cells = (0 until d).map(r =>
      struct(lit(r).as("r"), CmsFunctions.cmsBucket(term, r, w).as("b")))
    df.where(col(key).isNotNull)
      .select(explode(array(cells: _*)).as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Estimate |a ⋈ b| on `key` (never undercounts). Small widths run
    * the dense kernel (two map-side-combined scans, one tiny driver
    * scalar); widths past [[DensePathMaxWidth]] run the sparse plan:
    * per-side occupied-cell tables, an (r,b) equi-join (cells missing
    * on either side contribute zero product and are correctly dropped
    * by the inner join), per-row DECIMAL(38,0) sums, min over rows.
    * Both paths evaluate the SAME estimator over the SAME buckets —
    * the dense/sparse choice is a physical plan decision, not a
    * semantic one, and the equality spec pins it.
    */
  def estimateJoinSize(a: DataFrame, b: DataFrame, key: String,
      d: Int = 4, w: Int = AutoWidth): Long = {
    if (w == AutoWidth) return estimateAutoWidth(a, b, key, d)
    val w1 = w
    if (w1 <= DensePathMaxWidth) {
      val ka = a.select(col(key).cast("string").as("_k"))
        .agg(CmsFunctions.cmsSketch(col("_k"), d, w1).as("ska"))
      val kb = b.select(col(key).cast("string").as("_k"))
        .agg(CmsFunctions.cmsSketch(col("_k"), d, w1).as("skb"))
      ka.crossJoin(kb)
        .select(CmsFunctions.cmsInnerProduct(col("ska"), col("skb"), d, w1)
          .cast("long").as("est"))
        .head().getLong(0)
    } else {
      val ca = sparseCells(a, key, d, w1).withColumnRenamed("cnt", "ca")
      val cb = sparseCells(b, key, d, w1).withColumnRenamed("cnt", "cb")
      val row = ca.join(cb, Seq("r", "b"))
        .groupBy("r")
        .agg(sum(col("ca").cast("decimal(38,0)") * col("cb").cast("decimal(38,0)")).as("ip"))
        .agg(min(col("ip")).cast("long").as("est"))
        .head()
      // both sides non-empty but zero occupied-cell overlap -> the
      // inner product is exactly 0 (no key collides anywhere), which
      // the empty join correctly reports as null -> 0
      if (row.isNullAt(0)) 0L else row.getLong(0)
    }
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
