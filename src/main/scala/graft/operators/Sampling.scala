package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset splitting for training pipelines.
  *
  * Both variants are GROUP-STABLE: the split is a pure function of a
  * key column, so every row of a user (or document, or session) lands
  * in the same fold — the property that prevents train/test leakage
  * when entities span many rows. Re-running on new data never moves
  * an existing key between folds (unlike `randomSplit`, which is
  * order- and partitioning-sensitive).
  *
  * Scale: a projection — no shuffle, no state, embarrassingly
  * parallel; the split column pushes into partition pruning when the
  * output is written partitioned by it.
  */
object Sampling {

  /** Production path: seeded-hash split. Buckets the key's xxhash64
    * into `resolution` slots and cuts them by cumulative fraction.
    * Fractions must sum to <= 1; keys hashing past the last cut get
    * the `rest` label (use it as holdout, or make fractions sum to 1).
    */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      fractions: Seq[(String, Double)],
      seed: Long = 42L,
      rest: String = "rest",
      resolution: Int = 1000000): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    // a negative fraction would make the cumulative cuts non-monotone —
    // rows silently land in the wrong split instead of failing here
    require(fractions.forall(_._2 >= 0), "fractions must be non-negative")
    val slot = pmod(xxhash64(col(keyCol), lit(seed)), lit(resolution))
    val cuts = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val expr = fractions.zip(cuts).foldRight(lit(rest): org.apache.spark.sql.Column) {
      case (((name, _), cut), els) =>
        when(slot < math.round(cut * resolution), lit(name)).otherwise(els)
    }
    df.withColumn("split", expr)
  }

  /** Stratified deterministic sampling: keep a per-stratum fraction
    * of keys (e.g. downsample 'en' to 10% while keeping all 'de').
    * Same seeded-hash mechanics as hashSplit — repeatable, group-
    * stable, pure projection; the way a corpus gets rebalanced without
    * a shuffle or an RNG whose draw depends on row order.
    */
  def stratified(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0,
      seed: Long = 42L,
      resolution: Int = 1000000): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val slot = pmod(xxhash64(col(keyCol), lit(seed)), lit(resolution))
    val cut = fractions.toSeq.sortBy(_._1).foldRight(
        lit(math.round(defaultFraction * resolution)): org.apache.spark.sql.Column) {
      case ((stratum, f), els) =>
        when(col(strataCol) === stratum, lit(math.round(f * resolution))).otherwise(els)
    }
    df.filter(slot < cut)
  }

  /** Group-balanced capping: keep at most `k` rows per group,
    * deterministically by `orderCol` — how a skewed corpus gets
    * rebalanced (cap the over-represented language/source) without an
    * RNG whose draw depends on row order. One shuffle on the group
    * key; the per-group rank streams, so groups larger than a
    * partition never materialize. For k small and groups huge,
    * TopKAggregate (O(k) state, map-side combine) computes the same
    * set — see q_topk_heap for that plan shape.
    *
    * Determinism contract: `(orderCol, tiebreakCols...)` must be
    * UNIQUE within each group — row_number over a tied order is
    * partitioning-dependent, so duplicate order values without a
    * tiebreaker give an unstable kept-set across runs. Pass the
    * table's unique key as a tiebreaker when `orderCol` alone can tie.
    */
  def capPerGroup(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      k: Int,
      seqCol: String = "grp_seq",
      tiebreakCols: Seq[String] = Nil): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val order = (orderCol +: tiebreakCols).map(col)
    df.withColumn(seqCol,
        row_number().over(Window.partitionBy(col(groupCol)).orderBy(order: _*)))
      .filter(col(seqCol) <= k)
  }

  /** SQL-expressible variant (key modulo `buckets` against cumulative
    * bucket counts) — same group-stability, reproducible in any
    * engine; used by the cross-engine oracle. Prefer `hashSplit` in
    * production: modulo inherits any periodicity in key assignment.
    */
  def modSplit(
      df: DataFrame,
      keyCol: String,
      buckets: Int,
      cuts: Seq[(String, Int)]): DataFrame = {
    require(cuts.map(_._2).sum == buckets, "bucket counts must sum to buckets")
    val m = pmod(col(keyCol), lit(buckets))
    val cum = cuts.scanLeft(0) { case (acc, (_, n)) => acc + n }.tail
    val expr = cuts.zip(cum).foldRight(lit(cuts.last._1): org.apache.spark.sql.Column) {
      case (((name, _), cut), els) => when(m < cut, lit(name)).otherwise(els)
    }
    df.withColumn("split", expr)
  }

  /** Group-aware k-fold assignment (cross-validation folds): every
    * row of a group lands in EXACTLY one fold — fold =
    * multiplicative-hash(group) mod k, the same engine-reproducible
    * integer hash as [[reproducibleStratified]] — so no group ever
    * straddles a train/validation boundary (the leakage k-fold
    * exists to prevent). A map-side projection: no shuffle, no RNG
    * state, stable across runs/engines. `groupCol` must be integral
    * (hash the key first for strings).
    */
  def kFoldByGroup(df: DataFrame, groupCol: String, k: Int,
      foldCol: String = "fold"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val m = 2147483648L // 2^31
    val h = pmod(pmod(col(groupCol), lit(m)) * lit(2654435761L), lit(m))
    df.withColumn(foldCol, pmod(h, lit(k.toLong)))
  }

  /** Engine-reproducible stratified Bernoulli sample: keep a row iff
    * its key's multiplicative hash falls under the stratum's cut —
    * the ORACLE-able twin of `stratified` (whose xxhash64 no other
    * engine reproduces). Same group-stability and determinism, pure
    * integer arithmetic, map-side only (a filter projection; no
    * shuffle, no RNG state).
    */
  def reproducibleStratified(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val m = 2147483648L // 2^31
    val h = pmod(pmod(col(keyCol), lit(m)) * lit(2654435761L), lit(m))
    val cut = fractions.toSeq.sortBy(_._1).foldRight(
        lit(math.round(defaultFraction * m)): org.apache.spark.sql.Column) {
      case ((stratum, f), els) =>
        when(col(strataCol) === stratum, lit(math.round(f * m))).otherwise(els)
    }
    df.filter(h < cut)
  }

  /** Deterministic mixture resampling (the data-mixing step of a
    * multi-source training corpus): each source gets an epoch weight
    * w — every row is repeated floor(w) times, plus one more iff its
    * key's multiplicative hash falls under frac(w)·2³¹ (the same
    * integer-hash cut `reproducibleStratified` uses) — so the
    * realized mixture converges to the target weights with ZERO
    * randomness: re-running regenerates byte-identical epochs on any
    * engine. Upsampling (w > 1) emits an `epoch` column so downstream
    * shuffling can spread the copies; w < 1 is plain deterministic
    * downsampling; w = 0 drops the source.
    *
    * Scale: a projection + local explode — no shuffle, no RNG state,
    * no driver-side sampling pass.
    */
  def mixtureResample(
      df: DataFrame,
      sourceCol: String,
      keyCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0), "weights must be >= 0")
    // The operator ADDS epoch (and a transient _copies) — refuse to
    // silently clobber an input column of either name, and the hash
    // cut needs an integral key for pmod to be exact.
    require(!df.columns.contains("epoch") && !df.columns.contains("_copies"),
      "mixtureResample emits an `epoch` column; input already has `epoch`/`_copies`")
    val keyType = df.schema(keyCol).dataType
    require(
      Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType
      ).contains(keyType),
      s"mixtureResample keyCol `$keyCol` must be integral, got $keyType")
    val m = 2147483648L // 2^31
    val h = pmod(pmod(col(keyCol), lit(m)) * lit(2654435761L), lit(m))
    def caseOver(f: Double => Long): org.apache.spark.sql.Column =
      weights.toSeq.sortBy(_._1).foldRight(lit(f(defaultWeight)): org.apache.spark.sql.Column) {
        case ((src, wgt), els) => when(col(sourceCol) === src, lit(f(wgt))).otherwise(els)
      }
    val base = caseOver(w => math.floor(w).toLong)
    val cut = caseOver(w => math.round((w - math.floor(w)) * m))
    df.withColumn("_copies", base + when(h < cut, 1L).otherwise(0L))
      .filter(col("_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_copies")
  }

  /** Deterministic negative sampling for contrastive training: k
    * pseudo-random partner rows per anchor, reproducible across runs
    * AND engines (pure integer arithmetic on a dense 0..n-1 id
    * space). negative_j(d) = (d·A + j·B) mod 2^31 mod n — a fixed
    * derangement-ish schedule, not an RNG draw, so re-running the
    * pipeline regenerates byte-identical training pairs.
    *
    * Scale: a projection + local explode (k rows per anchor) and one
    * broadcast of the single-row corpus count — no shuffle at all
    * until the caller joins the negatives' payloads (which trades on
    * dense int ids, the cheapest possible join key).
    */
  /** Deterministic weighted (importance) Bernoulli resampling:
    * P(keep) = wᵢ / max(w) — the SELECTION half of DSIR-style
    * importance sampling (importanceWeights scores, this draws), with
    * the draw a pure function of (id, salt): any engine recomputes
    * the identical kept SET, re-runs never move a row in or out, and
    * the decision is DIVISION-FREE — hash₃₁(id)·wMax < wᵢ·2³¹
    * cross-multiplied in DECIMAL(38,0), so no rounding policy can
    * drift between engines. The max is one scalar aggregate
    * broadcast back; everything else is a scan-speed projection.
    * `salt` draws an independent sample from the same weights.
    */
  def weightedBernoulli(df: DataFrame, idCol: org.apache.spark.sql.Column,
      weightCol: org.apache.spark.sql.Column, salt: Long = 0L): DataFrame = {
    val wmax = df.agg(max(weightCol).cast("decimal(38,0)").as("_g_wmax"))
    val h = pmod(idCol.cast("long") + lit(salt), lit(2147483648L)) * 2654435761L % 2147483648L
    df.crossJoin(broadcast(wmax))
      .filter(h.cast("decimal(38,0)") * col("_g_wmax") <
        weightCol.cast("decimal(38,0)") * lit(2147483648L).cast("decimal(38,0)"))
      .drop("_g_wmax")
  }

  def negativeSamples(
      df: DataFrame,
      keyCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val m = 2147483648L // 2^31
    val n = df.select(count(lit(1)).as("_n"))
    df.select(col(keyCol))
      .crossJoin(broadcast(n))
      .select(col(keyCol), col("_n"), explode(array((1 to k).map(lit): _*)).as("j"))
      .withColumn("neg_id",
        pmod(pmod(pmod(col(keyCol), lit(m)) * lit(2654435761L) + col("j") * lit(40503L), lit(m)),
          col("_n")))
      .drop("_n")
  }

  /** Deterministic corpus shuffle + sharding: training data wants a
    * pseudo-random READ ORDER that is reproducible run-to-run and
    * engine-to-engine — never `ORDER BY rand()` (row-order-dependent)
    * and never one global sort. Each row gets a Knuth multiplicative
    * hash of its key; `shard = h % shards` scatters neighbors, and
    * the within-shard position ranks by `(h, key)`.
    *
    * Scale: one shuffle on the shard key and a PER-SHARD sort of
    * 8-byte hashes — shards are written/consumed independently, so no
    * global ordering step ever exists. Pure integer arithmetic
    * (key reduced mod 2^31 keeps the product under 2^63), so any
    * engine reproduces the exact same order — the SQL oracle runs the
    * same formula.
    *
    * Keys must be unique and non-negative (the (h, key) order is then
    * a total order; negative keys would diverge on `%` semantics
    * across engines).
    */
  def shuffleShard(
      df: DataFrame,
      keyCol: String,
      shards: Int,
      shardCol: String = "shard",
      posCol: String = "pos"): DataFrame = {
    require(shards > 0, "shards must be positive")
    import org.apache.spark.sql.expressions.Window
    val m = 2147483648L // 2^31
    val h = pmod(pmod(col(keyCol), lit(m)) * lit(2654435761L), lit(m))
    df.withColumn("_h", h)
      .withColumn(shardCol, pmod(col("_h"), lit(shards)))
      .withColumn(posCol,
        row_number().over(Window.partitionBy(col(shardCol)).orderBy(col("_h"), col(keyCol))))
      .drop("_h")
  }

  /** Deterministic WEIGHTED priority sample: the k rows per group
    * with the smallest `hash(key)/weight` priority — heavier rows get
    * proportionally smaller priorities, so they are proportionally
    * more likely to make the cut, with ZERO randomness: re-running
    * regenerates the identical sample on any engine. The priority is
    * the multiplicative integer hash [[reproducibleStratified]] uses
    * divided by the weight — IEEE division is exactly rounded, so the
    * DOUBLE priorities (and the sample) are bit-identical across
    * engines, which exponential keys (true Efraimidis-Spirakis,
    * `-ln(u)/w`) cannot promise: `ln` is not correctly rounded and a
    * one-ulp disagreement flips an ordering. Stated tradeoff: this is
    * PRIORITY sampling with weight-scaled uniform priorities, not
    * E-S-exact inclusion probabilities — the right trade when the
    * sample must be reproducible engine-to-engine. Rows with
    * non-positive weight are EXCLUDED by contract (weightless rows
    * can never be sampled); ties break on the key, deterministically.
    *
    * Scale: one shuffle on `groupCol` for the window — the same shape
    * as [[capPerGroup]]; the priority itself is a map-side projection.
    * `keyCol` must be integral (hash strings first).
    */
  def weightedPriorityPerGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      weightCol: String,
      k: Int,
      rankCol: String = "pri_rank"): DataFrame = {
    require(k > 0, "k must be positive")
    df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"weightedPriorityPerGroup: keyCol '$keyCol' must be integral (got $other) — " +
          "the documented priority is an integer multiplicative hash; hash string keys " +
          "first (e.g. xxhash64) so the sample stays engine-reproducible")
    }
    import org.apache.spark.sql.expressions.Window
    val m = 2147483648L // 2^31
    val h = pmod(pmod(col(keyCol), lit(m)) * lit(2654435761L), lit(m))
    df.filter(col(weightCol) > 0)
      .withColumn("_g_pri", h.cast("double") / col(weightCol).cast("double"))
      .withColumn(rankCol,
        row_number().over(
          Window.partitionBy(col(groupCol)).orderBy(col("_g_pri"), col(keyCol))))
      .filter(col(rankCol) <= k)
      .drop("_g_pri")
  }
}
