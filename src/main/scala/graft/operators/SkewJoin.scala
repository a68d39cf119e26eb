package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew handling for joins whose hot keys are known or
  * discoverable — the manual complement to AQE's skew-join splitting.
  *
  * AQE only repairs skew it can see at shuffle-materialization time
  * (sort-merge joins, post-shuffle). A pathological key (a null-ish
  * default id, a celebrity user) in a shuffled hash join still lands
  * on one task. Salting fixes that structurally: scatter the big
  * side's hot rows across `salt` sub-keys and replicate the matching
  * small-side rows once per sub-key — each sub-key shuffles to its own
  * partition, so the hot key's work spreads over `salt` tasks.
  */
object SkewJoin {

  private val SaltCol = "_graft_salt"

  /** Inner equi-join with uniform salting: every big-side row gets a
    * deterministic salt in [0, salt); the small side is replicated
    * `salt` ways. Same result as `big.join(small, keys)`, `salt`×
    * the small-side shuffle volume, 1/`salt` the per-task hot-key load.
    */
  def salted(big: DataFrame, small: DataFrame, keys: Seq[String], salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    // deterministic scatter: hash the join key columns with a row id so
    // equal keys still spread (hashing only the key would not)
    val bigS = big.withColumn(
      SaltCol, pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)).cast("int"))
    val smallS = small.withColumn(SaltCol, explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, keys :+ SaltCol).drop(SaltCol)
  }

  /** Hybrid variant: only rows whose key is in `hotKeys` are salted;
    * the long tail joins un-replicated. This is the 100 TB shape —
    * replicating the whole small side `salt`× is wasteful when only a
    * handful of keys are hot.
    */
  def saltedHotKeys(
      big: DataFrame,
      small: DataFrame,
      key: String,
      hotKeys: Seq[Any],
      salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val isHot = col(key).isin(hotKeys: _*)
    val bigS = big.withColumn(
      SaltCol,
      when(isHot, pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)).cast("int"))
        .otherwise(lit(0)))
    val smallS = small.withColumn(
      SaltCol,
      explode(when(isHot, sequence(lit(0), lit(salt - 1))).otherwise(array(lit(0)))))
    bigS.join(smallS, Seq(key, SaltCol)).drop(SaltCol)
  }
}
