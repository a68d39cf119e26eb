package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row
  * (by `rightTs <= leftTs`, per join key). The time-series join the
  * analytics surface of the reference's SQL layer can't express
  * without a correlated subquery.
  *
  * Scale design — the "union trick", not an inequality join: tag both
  * sides, union, and run ONE window sorted by (key, ts) where
  * `last(right-payload, ignoreNulls)` carries the latest right row
  * forward onto each left row. A plain `l.ts >= r.ts` theta-join
  * explodes to O(|L|·|R|) per key before a row_number prunes it; the
  * union shape is a single hash-shuffle + per-partition sort of
  * |L| + |R| rows — the same cost as any keyed window, and it holds
  * at 100 TB where per-key event counts reach millions.
  */
object AsOfJoin {

  /** Left-outer as-of join.
    *
    * @param rightPayload right columns to carry onto the left rows
    *                     (emitted as `asof_<name>`, null when no right
    *                     row is at-or-before the left timestamp)
    * @param inclusive    true: right rows at exactly leftTs match
    *                     (DuckDB `ASOF JOIN ... ON l.ts >= r.ts`);
    *                     false: strictly-earlier only.
    * Among right rows tied on (key, ts), the one with the greatest
    * payload tuple wins — deterministic regardless of input order.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      inclusive: Boolean = true): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val pay = struct(rightPayload.map(right(_)): _*)
    // side ordering at equal ts decides inclusivity: right-before-left
    // (0 < 1) makes a tied right row visible to the left row.
    val (rSide, lSide) = if (inclusive) (0, 1) else (1, 0)
    // a NULL right timestamp can never be "at or before" anything
    // (ASOF comparison semantics) — and unfiltered it would sort to
    // the partition front and masquerade as a match for matchless rows
    val r = right.filter(right(rightTs).isNotNull).select(
      keys.map(right(_)) ++ Seq(
        right(rightTs).as("_graft_ts"),
        lit(rSide).as("_graft_side"),
        pay.as("_graft_pay")): _*)
    val l = left
      .withColumn("_graft_ts", col(leftTs))
      .withColumn("_graft_side", lit(lSide))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_graft_ts") +: col("_graft_side") +: Seq(col("_graft_pay")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_graft_match", last(col("_graft_pay"), ignoreNulls = true).over(w))
      .filter(col("_graft_side") === lSide)
    val leftCols = left.columns.map(col).toIndexedSeq
    val payCols = rightPayload.map(p => col(s"_graft_match.$p").as(s"asof_$p"))
    matched.select(leftCols ++ payCols: _*)
  }

  /** As-of join with a match tolerance (pandas `merge_asof(...,
    * tolerance=)` semantics): a right row older than `leftTs -
    * tolerance` does not match. Because the plain as-of already picks
    * the LATEST right row at-or-before, a too-old best match implies
    * no in-tolerance match exists — so tolerance is a null-out
    * projection over the union+window result, costing nothing beyond
    * the base join. `rightTs` must be in `rightPayload` (it carries
    * the match's timestamp for the check). `tolerance` subtracts from
    * the left timestamp — an INTERVAL for timestamp domains, a plain
    * number for numeric ones.
    */
  /** Nearest-direction as-of join (pandas `merge_asof(...,
    * direction='nearest')`): for each left row, the right row with
    * the smallest |rightTs − leftTs| in EITHER direction — the
    * sensor-alignment join (match each reading to the closest
    * calibration sample, before or after). Equidistant candidates
    * resolve to the at-or-before side (pandas' backward preference);
    * right rows tied on (key, ts) resolve to the greatest payload
    * tuple backward / least forward — fully deterministic.
    *
    * Same one-shuffle union shape as [[asof]], NOT two joins: both
    * direction candidates come from ONE window over the tagged union
    * — `last(pay) ignoreNulls` over (-∞, current] is the backward
    * candidate and `first(pay) ignoreNulls` over [current, +∞) the
    * forward one (two frames over one sort), then a projection picks
    * the closer. Cost identical to the plain as-of join: one hash
    * shuffle + one per-key sort of |L| + |R| rows, at any scale.
    *
    * Timestamp distances compare in epoch micros (exact BIGINT);
    * numeric domains compare natively. `rightTs` must be in
    * `rightPayload` (the distance check reads the match's own ts).
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.contains(rightTs),
      s"rightPayload must include $rightTs for the distance comparison")
    val isTs = Set("timestamp", "timestamp_ntz")
      .contains(left.schema(leftTs).dataType.typeName)
    def num(c: Column): Column = if (isTs) unix_micros(c.cast("timestamp")) else c
    val pay = struct(rightPayload.map(right(_)): _*)
    // right-before-left at equal ts: a tied right row lands in the
    // BACKWARD frame (distance 0, backward preference — same result)
    val r = right.filter(right(rightTs).isNotNull).select(
      keys.map(right(_)) ++ Seq(
        right(rightTs).as("_graft_ts"),
        lit(0).as("_graft_side"),
        pay.as("_graft_pay")): _*)
    val l = left
      .withColumn("_graft_ts", col(leftTs))
      .withColumn("_graft_side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val base = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_graft_ts"), col("_graft_side"), col("_graft_pay"))
    val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = unioned
      .withColumn("_graft_back", last(col("_graft_pay"), ignoreNulls = true).over(wb))
      .withColumn("_graft_fwd", first(col("_graft_pay"), ignoreNulls = true).over(wf))
      .filter(col("_graft_side") === 1)
    val bd = num(col(leftTs)) - num(col(s"_graft_back.$rightTs"))
    val fd = num(col(s"_graft_fwd.$rightTs")) - num(col(leftTs))
    val winner = when(col("_graft_fwd").isNull, col("_graft_back"))
      .when(col("_graft_back").isNull, col("_graft_fwd"))
      .when(bd <= fd, col("_graft_back"))
      .otherwise(col("_graft_fwd"))
    val leftCols = left.columns.map(col).toIndexedSeq
    val withWin = matched.withColumn("_graft_win", winner)
    withWin.select(leftCols ++
      rightPayload.map(p => col(s"_graft_win.$p").as(s"asof_$p")): _*)
  }

  def asofWithin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      tolerance: Column,
      inclusive: Boolean = true): DataFrame = {
    require(rightPayload.contains(rightTs), s"rightPayload must include $rightTs for the tolerance check")
    val base = asof(left, right, keys, leftTs, rightTs, rightPayload, inclusive)
    val inTol = col(s"asof_$rightTs") >= col(leftTs) - tolerance
    rightPayload.foldLeft(base) { (df, p) =>
      df.withColumn(s"asof_$p", when(inTol, col(s"asof_$p")))
    }
  }
}
