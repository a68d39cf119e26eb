package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff / change-data-capture between two versions of a
  * keyed table — the read-side complement of `sources.UpsertWriter`'s
  * versioned timeline (diff two committed versions to get the change
  * stream a downstream incremental consumer would replay).
  *
  * Scale: one full-outer hash join on the record key (the same
  * shuffle an upsert merge pays), row comparison via null-safe struct
  * equality — codegen'd, no per-column join conditions, no window.
  */
object SnapshotDiff {

  /** Rows added, removed, or changed from `oldDf` to `newDf`.
    *
    * Output: key columns, `change_type` ('insert' | 'update' |
    * 'delete'), then the non-key columns — new-side values for
    * insert/update, old-side values for delete (what was removed).
    * Unchanged rows (all non-key columns null-safe-equal) are dropped.
    * Both inputs must share `newDf`'s schema.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = newDf.columns.filterNot(keys.contains).toIndexedSeq
    require(valueCols.nonEmpty, "diff needs at least one non-key column")
    val o = oldDf.select(
      keys.map(c => col(c).as(s"_k_$c")) ++
        Seq(struct(valueCols.map(col): _*).as("_old")): _*)
    val n = newDf.select(
      keys.map(col) ++ Seq(struct(valueCols.map(col): _*).as("_new")): _*)
    val joinCond = keys.map(c => col(c) <=> col(s"_k_$c")).reduce(_ && _)
    val joined = n.join(o, joinCond, "full_outer")
    val changeType = when(col("_old").isNull, lit("insert"))
      .when(col("_new").isNull, lit("delete"))
      .otherwise(lit("update"))
    val keep = col("_old").isNull || col("_new").isNull || !(col("_new") <=> col("_old"))
    val outKeys = keys.map(c => coalesce(col(c), col(s"_k_$c")).as(c))
    // delete rows surface old values; insert/update surface new values
    // (a per-column coalesce would resurrect old values on
    // updated-to-NULL columns)
    val outVals = valueCols.map(c =>
      when(col("_new").isNull, col(s"_old.$c")).otherwise(col(s"_new.$c")).as(c))
    joined.filter(keep)
      .select(outKeys ++ Seq(changeType.as("change_type")) ++ outVals: _*)
  }

  /** Full change-data-feed between two versions, with BOTH images for
    * updates (Delta CDF / Hudi incremental-query semantics): inserts
    * emit one `insert` row (new values), deletes one `delete` row
    * (old values), updates TWO rows — `update_preimage` (old values)
    * and `update_postimage` (new values) — so a downstream consumer
    * can retract-then-apply without re-reading either snapshot.
    *
    * Same single full-outer hash join as `diff`; the pre/post pair
    * comes from exploding a 1-or-2-element array built per joined
    * row, not from a second join or pass.
    */
  def changeFeed(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = newDf.columns.filterNot(keys.contains).toIndexedSeq
    require(valueCols.nonEmpty, "changeFeed needs at least one non-key column")
    val o = oldDf.select(
      keys.map(c => col(c).as(s"_k_$c")) ++
        Seq(struct(valueCols.map(col): _*).as("_old")): _*)
    val n = newDf.select(
      keys.map(col) ++ Seq(struct(valueCols.map(col): _*).as("_new")): _*)
    val joinCond = keys.map(c => col(c) <=> col(s"_k_$c")).reduce(_ && _)
    val joined = n.join(o, joinCond, "full_outer")
    val keep = col("_old").isNull || col("_new").isNull || !(col("_new") <=> col("_old"))
    val images = when(col("_old").isNull,
        array(struct(lit("insert").as("_ct"), col("_new").as("_img"))))
      .when(col("_new").isNull,
        array(struct(lit("delete").as("_ct"), col("_old").as("_img"))))
      .otherwise(array(
        struct(lit("update_preimage").as("_ct"), col("_old").as("_img")),
        struct(lit("update_postimage").as("_ct"), col("_new").as("_img"))))
    val outKeys = keys.map(c => coalesce(col(c), col(s"_k_$c")).as(c))
    joined.filter(keep)
      .select(outKeys :+ explode(images).as("_e"): _*)
      .select(keys.map(col) ++
        Seq(col("_e._ct").as("change_type")) ++
        valueCols.map(c => col(s"_e._img.$c").as(c)): _*)
  }
}
