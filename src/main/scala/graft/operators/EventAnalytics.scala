package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics over the reference's report surface — the
  * product-analytics queries a report consumer runs on top of the
  * incremental event feed (reference: template.py:319-322, the SQL
  * transform slot): conversion funnels, cohort retention, activity
  * streaks, and merged-interval coverage.
  *
  * Scale design: every operator here keys its shuffles on the entity
  * id (`user_id` / `o_custkey`) and uses only entity-partitioned
  * windows — no global ordering anywhere, so each works unchanged on
  * a 1000-executor cluster: state per key is bounded by one user's
  * events, and AQE handles residual key skew.
  */
object EventAnalytics {

  /** Ordered N-step conversion funnel. Step k counts users whose
    * earliest step-k event at-or-after their step-(k-1) time exists.
    * One aggregation per step, each keyed on `userCol` — k small
    * (3-5), so this is k user-keyed shuffles over an
    * already-filtered (single event type) input, NOT k passes over
    * the raw log: the per-step filter prunes at the scan.
    *
    * Returns one row per user reaching step 1, with `t1..tN`
    * nullable timestamps of each reached step.
    */
  def funnel(events: DataFrame, steps: Seq[String], userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val next = events.filter(col(typeCol) === step)
        .join(acc.select(col(userCol), col(prev)), Seq(userCol))
        .filter(col(tsCol) >= col(prev))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(cur))
      // left join keeps users stranded at earlier steps (null later ts)
      acc.join(next.select(col(userCol), col(cur)), Seq(userCol), "left")
    }
  }

  /** Funnel stage totals: one row, `n_step1..n_stepN` user counts. */
  def funnelCounts(events: DataFrame, steps: Seq[String], userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type"): DataFrame = {
    val perUser = funnel(events, steps, userCol, tsCol, typeCol)
    val counts = steps.indices.map(i => count(col(s"t${i + 1}")).as(s"n_step${i + 1}"))
    perUser.agg(counts.head, counts.tail: _*)
  }

  /** Cohort retention: cohort = month of the entity's first event;
    * cell (cohort_month, month_offset) counts distinct entities from
    * that cohort active at that offset. Month offset is explicit
    * integer arithmetic (`12*Δyear + Δmonth`) so every engine agrees.
    * Two shuffles: first-event agg on the entity key, then the
    * (cohort, offset) cell agg — both well-distributed.
    */
  def cohortRetention(events: DataFrame, entityCol: String, tsCol: String): DataFrame = {
    val firstTs = events.groupBy(col(entityCol)).agg(min(col(tsCol)).as("first_ts"))
    events.select(col(entityCol), col(tsCol))
      .join(firstTs, Seq(entityCol))
      .select(
        date_trunc("month", col("first_ts")).cast("date").as("cohort_month"),
        ((year(col(tsCol)) - year(col("first_ts"))) * 12 +
          (month(col(tsCol)) - month(col("first_ts")))).as("month_offset"),
        col(entityCol))
      .groupBy(col("cohort_month"), col("month_offset"))
      .agg(count_distinct(col(entityCol)).as("n_active"))
  }

  /** Gaps-and-islands activity streaks: consecutive events of one
    * entity at most `maxGapDays` apart form one streak. Returns one
    * row per entity with streak count and longest streak (in events).
    * Entity-partitioned lag + running-sum windows — per-key state
    * only, no global sort.
    */
  def streaks(events: DataFrame, entityCol: String, tsCol: String,
      maxGapDays: Int): DataFrame = {
    val byTs = Window.partitionBy(col(entityCol)).orderBy(col(tsCol))
    val day = col(tsCol).cast("date")
    val prevDay = lag(day, 1).over(byTs)
    val newStreak = when(prevDay.isNull.or(datediff(day, prevDay) > maxGapDays), 1L)
      .otherwise(0L)
    events
      .withColumn("streak_id", sum(newStreak).over(byTs))
      .groupBy(col(entityCol), col("streak_id"))
      .agg(count(lit(1)).as("streak_len"))
      .groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_streaks"), max(col("streak_len")).as("longest_streak"))
  }

  /** Merged-interval coverage: each event spans
    * `[ts, ts + floor(durSeconds)]`; overlapping spans of one entity
    * merge, and the result is per-entity total covered seconds and
    * merged-interval count. All arithmetic in epoch-micros BIGINT —
    * bit-exact on any engine. Classic sweep as two entity-partitioned
    * windows (running max of interval end, then island running sum).
    */
  def intervalCoverage(events: DataFrame, entityCol: String, tsCol: String,
      durSeconds: Column): DataFrame = {
    val byTs = Window.partitionBy(col(entityCol))
      .orderBy(col("start_us"), col("end_us"))
    val prevMaxEnd = max(col("end_us"))
      .over(byTs.rowsBetween(Window.unboundedPreceding, -1))
    events
      .select(col(entityCol), unix_micros(col(tsCol).cast("timestamp")).as("start_us"),
        (unix_micros(col(tsCol).cast("timestamp")) +
          floor(durSeconds).cast("long") * 1000000L).as("end_us"))
      .withColumn("new_island",
        when(prevMaxEnd.isNull.or(col("start_us") > prevMaxEnd), 1L).otherwise(0L))
      .withColumn("island_id", sum(col("new_island")).over(byTs))
      .groupBy(col(entityCol), col("island_id"))
      .agg(min(col("start_us")).as("s"), max(col("end_us")).as("e"))
      .groupBy(col(entityCol))
      // integer `div`, not `/`: float division + double→long cast
      // truncates on Spark but rounds on other engines
      .agg(expr("sum(e - s) div 1000000").as("covered_seconds"),
        count(lit(1)).as("n_intervals"))
  }

  /** Markov next-event transition matrix: per entity, order events
    * by (`tsCol`, `tieCol`) — the tiebreak makes the sequence a total
    * order so every engine derives the same successor — pair each
    * event with its successor via an entity-partitioned `lead`, and
    * count (from, to) pairs. `share_bp` is the transition
    * probability in integer basis points (n*10000 div row-total of
    * the from-state), exact on any engine. One entity-keyed window
    * + one (from,to)-keyed agg; the final per-from share window runs
    * over |types|² rows, not the event log.
    */
  def transitions(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    val byFrom = Window.partitionBy(col("from_type"))
    events
      .select(col(entityCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("share_bp",
        expr("n_transitions * 10000 div sum(n_transitions) over (partition by from_type)"))
  }

  /** Session path mining: gap-sessionize (`gapMinutes`) per entity,
    * render each session's event-type sequence as a `>`-joined path
    * string (ordered by ts with `tieCol` tiebreak), and count
    * sessions per path, keeping paths with at least `minCount`
    * sessions. The collect_list is bounded by one session's events —
    * the same per-key-state bound streaming sessionization has.
    */
  def sessionPaths(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, tieCol: String, gapMinutes: Int, minCount: Long): DataFrame = {
    val byTs = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    val prevTs = lag(col(tsCol), 1).over(byTs)
    val newSess = when(
      prevTs.isNull.or(col(tsCol) > prevTs + expr(s"INTERVAL $gapMinutes MINUTE")),
      1L).otherwise(0L)
    events
      .withColumn("sess_seq", sum(newSess).over(byTs))
      .groupBy(col(entityCol), col("sess_seq"))
      .agg(array_join(
        // explicit struct-field aliases: a user column literally named
        // "_p3" aside, sort order is (ts, tie) and extraction is by
        // our field name, immune to input column name collisions
        transform(
          array_sort(collect_list(struct(
            col(tsCol).as("_p1"), col(tieCol).as("_p2"), col(typeCol).as("_p3")))),
          x => x.getField("_p3")),
        ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .filter(col("n_sessions") >= minCount)
  }

  /** Daily resample with gap fill: per entity, one row per calendar
    * day from its first to its last event day; days without events
    * get `n_events = 0` and forward-fill `last_active_day` from the
    * most recent active day. The day spine is generated per entity
    * (`sequence` + explode) — spine size is bounded by the entity's
    * own span, and the join back to the daily aggregate is keyed on
    * (entity, day), so the whole op distributes on the entity key.
    */
  /** Fixed-point EWMA per entity (α = 1/2): s₁ = x₁,
    * sₜ = ⌊(sₜ₋₁ + xₜ) / 2⌋ over integer cents in event-time order —
    * the exponential smoothing every monitoring/trend pipeline wants,
    * expressed so any engine reproduces it bit-for-bit (values are
    * non-negative longs, so floor division = truncation on both).
    *
    * The recurrence is sequential per entity, so it runs as ONE
    * in-array fold after a per-entity sort — a single shuffle on the
    * entity key, state bounded by the entity's history (same bound as
    * session paths; entities with unbounded history need windowed
    * variants). The fold appends to an array accumulator — O(n²)
    * copies per entity in Catalyst, fine at per-entity history sizes;
    * total order inside the entity is (ts, idCol) so ties are stable.
    */
  def ewma(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      idCol: String,
      centsCol: String): DataFrame = {
    val tsSql = events.schema(tsCol).dataType.sql
    val idSql = events.schema(idCol).dataType.sql
    val centsSql = events.schema(centsCol).dataType.sql
    val rowT = struct(col(tsCol).as("ts"), col(idCol).as("id"), col(centsCol).as("cents"))
    events
      .groupBy(col(entityCol))
      .agg(array_sort(collect_list(rowT)).as("_rows"))
      .select(col(entityCol), explode(
        expr(
          s"""aggregate(
             |  _rows,
             |  cast(array() as array<struct<ts:$tsSql,id:$idSql,cents:$centsSql,ewma:$centsSql>>),
             |  (acc, x) -> array_append(acc, named_struct(
             |    'ts', x.ts, 'id', x.id, 'cents', x.cents,
             |    'ewma', if(size(acc) = 0, x.cents,
             |               (element_at(acc, -1).ewma + x.cents) div 2))))""".stripMargin))
        .as("r"))
      .select(col(entityCol), col("r.id").as(idCol), col("r.ts").as(tsCol),
        col("r.cents").as(centsCol), col("r.ewma").as("ewma"))
  }

  /** Holt linear (level + trend) exponential smoothing per entity,
    * fixed-point with α = β = ½ — the trend-aware upgrade of [[ewma]]
    * (a plain EWMA lags a ramping series forever; Holt's trend term
    * tracks it), plus a one-step-ahead forecast per row:
    *   level₁ = c₁, trend₁ = 0
    *   levelₜ = ⌊(levelₜ₋₁ + trendₜ₋₁ + cₜ)/2⌋        (α = ½)
    *   trendₜ = ⌊(trendₜ₋₁ + levelₜ − levelₜ₋₁)/2⌋   (β = ½)
    *   forecast_next = level + trend
    * A TRUE double recurrence — not expressible as any window
    * aggregate. Same execution shape as ewma: one shuffle groups each
    * entity, array_sort orders its (ts, id) rows, and ONE in-array
    * fold runs the recurrence — no per-step joins, no driver loop;
    * at 100 TB the cost is the groupBy shuffle plus O(events) fold
    * work. Entities must fit one task's array — the contract of every
    * per-entity-sequence op here (entities are users/devices, not the
    * corpus).
    *
    * Division discipline: the trend can go NEGATIVE, where truncating
    * and flooring division disagree — the halving here TRUNCATES
    * toward zero on both engines (Spark `div` and DuckDB `//` share
    * that convention; verified, not assumed), so the recurrence is
    * bit-identical cross-engine including the negative-trend path.
    */
  def holt(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      idCol: String,
      centsCol: String): DataFrame = {
    val tsSql = events.schema(tsCol).dataType.sql
    val idSql = events.schema(idCol).dataType.sql
    val centsSql = events.schema(centsCol).dataType.sql
    val rowT = struct(col(tsCol).as("ts"), col(idCol).as("id"), col(centsCol).as("cents"))
    val prevL = "element_at(acc, -1).level"
    val prevB = "element_at(acc, -1).trend"
    def floor2(x: String) = s"($x) div 2"
    val lNew = floor2(s"$prevL + $prevB + x.cents")
    val bNew = floor2(s"$prevB + ($lNew) - $prevL")
    events
      .groupBy(col(entityCol))
      .agg(array_sort(collect_list(rowT)).as("_rows"))
      .select(col(entityCol), explode(
        expr(
          s"""aggregate(
             |  _rows,
             |  cast(array() as array<struct<ts:$tsSql,id:$idSql,cents:$centsSql,level:bigint,trend:bigint>>),
             |  (acc, x) -> array_append(acc, named_struct(
             |    'ts', x.ts, 'id', x.id, 'cents', x.cents,
             |    'level', if(size(acc) = 0, cast(x.cents as bigint), $lNew),
             |    'trend', if(size(acc) = 0, cast(0 as bigint), $bNew))))""".stripMargin))
        .as("r"))
      .select(col(entityCol), col("r.id").as(idCol), col("r.ts").as(tsCol),
        col("r.cents").as(centsCol), col("r.level").as("level"), col("r.trend").as("trend"),
        (col("r.level") + col("r.trend")).as("forecast_next"))
  }

  /** One-sided CUSUM change-point detection per entity (Page 1954):
    * the classic drift detector over a per-entity event series —
    * s_i = max(0, s_{i-1} + cents_i − k) accumulates evidence that
    * the series is running above its allowance k, and an ALARM fires
    * when s_i exceeds the decision threshold h (after which s resets,
    * so successive change points each alarm once). CUSUM is optimal
    * for detecting small persistent shifts that per-point z-scores
    * miss (many slightly-high values, no single outlier) — the data-
    * pipeline use is drift watch on per-source quality/volume series.
    *
    * Exactness: the whole recurrence is integer cents (max, +, −),
    * so any engine replays it bit-for-bit — q_cusum's oracle runs it
    * as a recursive CTE. Scale shape: identical to [[holt]] — one
    * shuffle groups each entity, one in-array fold per entity, no
    * global sort; per-entity history must fit a task (documented
    * bound of the whole per-entity family; window the series
    * upstream when an entity's history is unbounded).
    *
    * @return (entity, id, ts, cents, s, alarm) — s the pre-reset
    *         statistic, alarm true on threshold crossings
    */
  def cusum(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      idCol: String,
      centsCol: String,
      kCents: Long,
      hCents: Long): DataFrame = {
    require(hCents > 0, s"decision threshold hCents must be positive, got $hCents")
    val tsSql = events.schema(tsCol).dataType.sql
    val idSql = events.schema(idCol).dataType.sql
    val centsSql = events.schema(centsCol).dataType.sql
    val rowT = struct(col(tsCol).as("ts"), col(idCol).as("id"), col(centsCol).as("cents"))
    val sNew = "greatest(cast(0 as bigint), " +
      s"if(size(acc) = 0, cast(0 as bigint), element_at(acc, -1).carry) + x.cents - $kCents)"
    events
      .groupBy(col(entityCol))
      .agg(array_sort(collect_list(rowT)).as("_rows"))
      .select(col(entityCol), explode(
        expr(
          s"""aggregate(
             |  _rows,
             |  cast(array() as array<struct<ts:$tsSql,id:$idSql,cents:$centsSql,s:bigint,alarm:boolean,carry:bigint>>),
             |  (acc, x) -> array_append(acc, named_struct(
             |    'ts', x.ts, 'id', x.id, 'cents', x.cents,
             |    's', $sNew,
             |    'alarm', ($sNew) > $hCents,
             |    'carry', if(($sNew) > $hCents, cast(0 as bigint), $sNew))))""".stripMargin))
        .as("r"))
      .select(col(entityCol), col("r.id").as(idCol), col("r.ts").as(tsCol),
        col("r.cents").as(centsCol), col("r.s").as("s"), col("r.alarm").as("alarm"))
  }

  /** Position-based (U-shaped 40/20/40) multi-touch attribution: each
    * conversion's value is credited across the user's touch events in
    * the lookback window — first touch 40%, last touch 40%, the
    * middle 20% split evenly; one touch takes 100%, two split 50/50.
    * The marketing-analytics op downstream of sessionization/funnels.
    *
    * Exact-cents discipline: every split is integer floor at bp
    * precision and the LAST touch absorbs all rounding remainders, so
    * per conversion the credits sum to EXACTLY its cents — an
    * attribution report that leaks cents to rounding reconciles with
    * nothing. Deterministic: touches order by (ts, id).
    *
    * Scale shape: one equi-join on the user key (the range predicate
    * rides the join as a filter — there IS an equi key, so no binned
    * range join needed), then windows PARTITIONed by conversion
    * (touch counts per conversion are lookback-bounded), then one
    * channel aggregate. No global window, no driver loop.
    *
    * @return (channel, n_touches, credit_cents)
    */
  def attributePositionBased(
      conversions: DataFrame,
      touches: DataFrame,
      userCol: String,
      convIdCol: String, convTsCol: String, centsCol: String,
      touchIdCol: String, touchTsCol: String, channelCol: String,
      lookback: Column): DataFrame = {
    val j = touches.join(conversions, Seq(userCol))
      .filter(col(touchTsCol) <= col(convTsCol) &&
        col(touchTsCol) >= col(convTsCol) - lookback)
    val wOrd = Window.partitionBy(col(convIdCol))
      .orderBy(col(touchTsCol), col(touchIdCol))
    val wAll = Window.partitionBy(col(convIdCol))
    val ranked = j
      .withColumn("_pos", row_number().over(wOrd))
      .withColumn("_n", count(lit(1)).over(wAll))
    val c = col(centsCol)
    val n = col("_n")
    val firstC = when(n === 2, expr(s"$centsCol * 5000 DIV 10000"))
      .otherwise(expr(s"$centsCol * 4000 DIV 10000"))
    val midEach = when(n >= 3,
      expr(s"($centsCol * 2000 DIV 10000) DIV (_n - 2)")).otherwise(lit(0L))
    val credit =
      when(n === 1, c)
        .when(col("_pos") === 1, firstC)
        .when(col("_pos") === n, c - firstC - midEach * (n - 2))
        .otherwise(midEach)
    ranked
      .withColumn("_credit", credit)
      .groupBy(col(channelCol))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("_credit")).as("credit_cents"))
  }

  /** Holt-Winters additive seasonal smoothing per entity, fixed-point
    * with α = β = γ = ½ and season length `m` — the seasonal upgrade
    * of [[holt]] (a level+trend model lags any series with a periodic
    * component; the seasonal index array absorbs it):
    *   lₜ = ⌊(yₜ − sₜ₋ₘ + lₜ₋₁ + bₜ₋₁)/2⌋   (α = ½)
    *   bₜ = ⌊(bₜ₋₁ + lₜ − lₜ₋₁)/2⌋          (β = ½)
    *   sₜ = ⌊(yₜ − lₜ + sₜ₋ₘ)/2⌋            (γ = ½)
    *   forecast_next = lₜ + bₜ + sₜ₊₁₋ₘ
    * Cold start: l₁ = y₁, b₁ = 0, and every not-yet-observed seasonal
    * index is 0 (the indexes are learned, not pre-fit — the first m
    * rows run as plain Holt). A TRIPLE recurrence with an m-deep
    * lookback — far outside any window aggregate, but still ONE
    * in-array fold per entity: `element_at(acc, -m)` reads sₜ₋ₘ
    * straight from the accumulating array (the fold already carries
    * the entity's history — no season ring buffer, no self-join, and
    * the next-slot index for the forecast is the same read at
    * −(m−1)). Execution shape identical to [[holt]]: one groupBy
    * shuffle, array_sort per entity, O(events) fold work.
    *
    * Division discipline matches [[holt]]: the halvings TRUNCATE
    * toward zero on both engines (Spark `div`, DuckDB `//`),
    * including the negative paths (trend AND the yₜ−sₜ₋ₘ term).
    */
  def holtWinters(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      idCol: String,
      centsCol: String,
      m: Int = 7): DataFrame = {
    require(m >= 2, s"season length must be >= 2, got $m")
    val tsSql = events.schema(tsCol).dataType.sql
    val idSql = events.schema(idCol).dataType.sql
    val centsSql = events.schema(centsCol).dataType.sql
    val rowT = struct(col(tsCol).as("ts"), col(idCol).as("id"), col(centsCol).as("cents"))
    val prevL = "element_at(acc, -1).level"
    val prevB = "element_at(acc, -1).trend"
    val sPrevM = s"if(size(acc) >= $m, element_at(acc, -$m).season, cast(0 as bigint))"
    val lNew = s"((x.cents - ($sPrevM) + $prevL + $prevB) div 2)"
    val bNew = s"(($prevB + $lNew - $prevL) div 2)"
    val sNew = s"((x.cents - $lNew + $sPrevM) div 2)"
    // sₜ₊₁₋ₘ: acc holds t−1 rows here, so the next slot's index is −(m−1)
    val sNext = s"if(size(acc) >= ${m - 1}, element_at(acc, -${m - 1}).season, cast(0 as bigint))"
    events
      .groupBy(col(entityCol))
      .agg(array_sort(collect_list(rowT)).as("_rows"))
      .select(col(entityCol), explode(
        expr(
          s"""aggregate(
             |  _rows,
             |  cast(array() as array<struct<ts:$tsSql,id:$idSql,cents:$centsSql,
             |                               level:bigint,trend:bigint,season:bigint,snext:bigint>>),
             |  (acc, x) -> array_append(acc, named_struct(
             |    'ts', x.ts, 'id', x.id, 'cents', x.cents,
             |    'level', if(size(acc) = 0, cast(x.cents as bigint), $lNew),
             |    'trend', if(size(acc) = 0, cast(0 as bigint), $bNew),
             |    'season', if(size(acc) = 0, cast(0 as bigint), $sNew),
             |    'snext', $sNext)))""".stripMargin))
        .as("r"))
      .select(col(entityCol), col("r.id").as(idCol), col("r.ts").as(tsCol),
        col("r.cents").as(centsCol), col("r.level").as("level"), col("r.trend").as("trend"),
        col("r.season").as("season"),
        (col("r.level") + col("r.trend") + col("r.snext")).as("forecast_next"))
  }

  /** Time-weighted average (TWAP) per entity: each event's value
    * holds until the entity's next event, and the average weights
    * each value by its holding duration —
    * twap = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first). The metric a
    * balance/price/utilization series needs (a plain mean
    * over-counts bursts of short-lived values).
    *
    * Exact cross-engine: values go through DECIMAL(18,2)→cents
    * BIGINT, durations are epoch-micros BIGINT, the weighted sum
    * accumulates in decimal(38,0) (cents × a year of micros ≈ 1e18
    * per term — BIGINT would wrap on long histories), and the final
    * division is integer floor DIV. One entity-partitioned lead
    * window + one entity-keyed aggregate — a single shuffle, no
    * global sort. Entities whose events all share one timestamp have
    * no holding time and are dropped (span_us > 0).
    */
  def timeWeightedAvg(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col("ts_us"), col(idCol))
    events
      .select(col(entityCol), col(idCol),
        unix_micros(col(tsCol).cast("timestamp")).as("ts_us"),
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("next_us", lead(col("ts_us"), 1).over(w))
      .groupBy(col(entityCol))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("ts_us")) - min(col("ts_us"))).as("span_us"),
        sum(when(col("next_us").isNotNull,
          col("cents").cast("decimal(38,0)") * (col("next_us") - col("ts_us")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("_num"))
      .filter(col("span_us") > 0L)
      .withColumn("twap_cents",
        expr("CAST(_num DIV CAST(span_us AS DECIMAL(38,0)) AS BIGINT)"))
      .drop("_num")
  }

  /** Throttle / debounce: per (entity, channel), keep an event only
    * if at least `minGap` has elapsed since the LAST KEPT event —
    * the rate-limiting rule notification and alerting pipelines
    * apply before fan-out. This is a true recurrence (whether a row
    * survives depends on which earlier rows survived, not on a fixed
    * window), so like [[ewma]] it runs as ONE in-array fold after a
    * per-key sort: a single shuffle on (entity, channel), state
    * bounded by one key's history, total order (ts, id) so ties are
    * stable. Session-gap logic is NOT equivalent: a chain of events
    * each within `minGap` of its predecessor collapses to one
    * session, but throttling re-emits as soon as `minGap` has passed
    * since the last emission.
    */
  def throttle(
      events: DataFrame,
      entityCol: String,
      channelCol: String,
      tsCol: String,
      idCol: String,
      minGap: Column): DataFrame = {
    val idSql = events.schema(idCol).dataType.sql
    val rowT = struct(unix_micros(col(tsCol).cast("timestamp")).as("ts_us"),
      col(idCol).as("id"))
    events
      .groupBy(col(entityCol), col(channelCol))
      .agg(array_sort(collect_list(rowT)).as("_rows"),
        first(minGap.cast("long") * 1000000L).as("_gap_us"))
      .select(col(entityCol), col(channelCol), explode(
        expr(
          s"""aggregate(
             |  _rows,
             |  cast(array() as array<struct<ts_us:BIGINT,id:$idSql>>),
             |  (acc, x) -> if(size(acc) = 0 OR x.ts_us >= element_at(acc, -1).ts_us + _gap_us,
             |              array_append(acc, x), acc))""".stripMargin))
        .as("r"))
      .select(col(entityCol), col(channelCol), col("r.id").as(idCol),
        timestamp_micros(col("r.ts_us")).as(tsCol))
  }

  def resampleDaily(events: DataFrame, entityCol: String, tsCol: String): DataFrame = {
    val day = col(tsCol).cast("date")
    val daily = events.groupBy(col(entityCol), day.as("day"))
      .agg(count(lit(1)).as("n"))
    val spine = events.groupBy(col(entityCol))
      .agg(min(day).as("d0"), max(day).as("d1"))
      .select(col(entityCol),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val byDay = Window.partitionBy(col(entityCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq(entityCol, "day"), "left")
      .select(col(entityCol), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(when(col("n").isNotNull, col("day")), ignoreNulls = true)
          .over(byDay).as("last_active_day"))
  }
}
