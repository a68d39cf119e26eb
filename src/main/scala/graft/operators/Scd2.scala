package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: queryable attribute HISTORY as
  * [valid_from, valid_to) intervals with an `is_current` flag.
  *
  * The reference's upsert tables (generate_hudi_table.py:86-214) keep
  * only latest-wins state; SCD2 is the standard warehouse layout when
  * point-in-time questions ("what was this key's segment on date D?")
  * must stay answerable after the fact.
  */
object Scd2 {

  /** Build the SCD2 history from a change log (one row per observed
    * change event): consecutive rows whose tracked attributes are
    * unchanged collapse into the earlier row's interval; `valid_to`
    * is the next change's `valid_from`, null while current.
    *
    * Scale: both windows partition by `keyCol` with the same sort
    * order, so the whole history builds on ONE shuffle of the change
    * log — per-key sorted streams, never a self-join against "the
    * previous version" (which would double-scan and double-shuffle).
    *
    * Determinism contract: `(orderCol, tiebreakCols...)` must be
    * unique per key (same contract as Sampling.capPerGroup).
    */
  def fromChangeLog(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      attrCols: Seq[String],
      tiebreakCols: Seq[String] = Nil): DataFrame = {
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val order = (orderCol +: tiebreakCols).map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val attrs = struct(attrCols.map(col): _*)
    df
      .withColumn("_prev_attrs", lag(attrs, 1).over(w))
      // null-safe inequality: a run of identical attrs (nulls
      // included) is ONE interval; the first row per key always opens
      .filter(col("_prev_attrs").isNull || !(col("_prev_attrs") <=> attrs))
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCol +: attrCols ++: Seq("valid_from", "valid_to", "is_current")).map(col): _*)
  }

  /** Merge a batch of new change rows into an existing SCD2 table.
    *
    * An SCD2 table IS a change log (each row: key, attrs,
    * valid_from) — so the merge rebuilds history from
    * `dim-as-changelog UNION updates`, but only for keys the batch
    * actually touches: untouched keys' rows pass through verbatim
    * (left-anti on the batch's key set), touched keys re-derive
    * their full interval chain. At scale the touched-key set is the
    * small side — it broadcasts, and the rebuild shuffles only the
    * touched slice of history, not the dimension.
    *
    * `updates` must carry `keyCol :: orderCol :: attrCols`; its
    * orderCol values must be unique per key and distinct from the
    * key's existing valid_from values (dim intervals are disjoint, so
    * the union stays tie-free without extra tiebreakers).
    */
  def applyChanges(
      dim: DataFrame,
      updates: DataFrame,
      keyCol: String,
      orderCol: String,
      attrCols: Seq[String]): DataFrame = {
    val cols = keyCol +: orderCol +: attrCols
    val touchedKeys = updates.select(col(keyCol)).distinct()
    val touchedLog = dim
      .join(broadcast(touchedKeys), Seq(keyCol), "left_semi")
      .withColumn(orderCol, col("valid_from"))
      .select(cols.map(col): _*)
      .unionByName(updates.select(cols.map(col): _*))
    val untouched = dim.join(broadcast(touchedKeys), Seq(keyCol), "left_anti")
    fromChangeLog(touchedLog, keyCol, orderCol, attrCols)
      .unionByName(untouched.select((keyCol +: attrCols ++: Seq("valid_from", "valid_to", "is_current")).map(col): _*))
  }

  /** Point-in-time (temporal) join: enrich each fact row with the
    * dimension attributes that were valid AT the fact's timestamp —
    * the feature-store correctness rule (training joins must never
    * leak a dimension state from after the label event).
    *
    * SCD2 intervals are disjoint and contiguous per key, so "the row
    * with the greatest valid_from at-or-before the fact ts" IS the
    * containing interval — an as-of join (union + per-key window, no
    * range join, no interval explosion). Facts before the key's first
    * interval get nulls, matching the LEFT JOIN
    * `valid_from <= ts < valid_to` formulation exactly; at an
    * interval boundary the NEWER interval wins ([from, to)
    * semantics). Output: fact columns + `asof_<attr>` per attribute.
    */
  def temporalJoin(
      facts: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      factTs: String,
      attrCols: Seq[String]): DataFrame =
    AsOfJoin.asof(facts, dim, keys, factTs, rightTs = "valid_from",
        rightPayload = attrCols, inclusive = true)
}
