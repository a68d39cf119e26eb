package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions.lit

class EventAnalyticsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel: a later step only counts at-or-after the prior step") {
    val s = spark
    import s.implicits._
    // u1 completes in order; u2 clicked BEFORE its first view and
    // never after → stalls at step 1; u3 never viewed → absent.
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (3L, "click", ts("2024-01-01 10:00:00")),
      (3L, "purchase", ts("2024-01-01 11:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val row = EventAnalytics.funnelCounts(ev, Seq("view", "click", "purchase")).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((2L, 1L, 1L)))
  }

  test("streaks: gap > maxGapDays starts a new streak") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-05 00:00:00")),
      (1L, ts("2024-03-01 00:00:00")), // 56-day gap → new streak at 30-day cap
      (2L, ts("2024-01-01 00:00:00"))
    ).toDF("id", "t")
    val out = EventAnalytics.streaks(ev, "id", "t", maxGapDays = 30)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((2L, 2L))) // two streaks, longest has 2 events
    assert(out(2L) == ((1L, 1L)))
  }

  test("intervalCoverage: overlapping spans merge, disjoint ones add") {
    val s = spark
    import s.implicits._
    // [0,60] and [30,90] merge to 90s; [200,260] separate → 150s total
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 60.9),
      (1L, ts("2024-01-01 00:00:30"), 60.0),
      (1L, ts("2024-01-01 00:03:20"), 60.0)
    ).toDF("id", "t", "dur")
    val row = EventAnalytics.intervalCoverage(ev, "id", "t",
      org.apache.spark.sql.functions.col("dur")).collect()(0)
    assert((row.getLong(1), row.getLong(2)) == ((150L, 2L)))
  }

  test("resampleDaily: fills gap days with zero and forward-fills last active day") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-04 10:00:00"))
    ).toDF("id", "t")
    val out = EventAnalytics.resampleDaily(ev, "id", "t")
      .collect().map(r => (r.getDate(1).toString, r.getLong(2), r.getDate(3).toString))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      ("2024-01-01", 2L, "2024-01-01"),
      ("2024-01-02", 0L, "2024-01-01"),
      ("2024-01-03", 0L, "2024-01-01"),
      ("2024-01-04", 1L, "2024-01-04")))
  }

  test("cohortRetention: offsets count distinct entities per cohort month") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, ts("2024-01-15 00:00:00")), (1L, ts("2024-03-02 00:00:00")),
      (2L, ts("2024-01-20 00:00:00")),
      (3L, ts("2024-02-01 00:00:00")), (3L, ts("2024-02-28 00:00:00"))
    ).toDF("id", "t")
    val out = EventAnalytics.cohortRetention(ev, "id", "t")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(out(("2024-01-01", 0)) == 2L) // u1+u2 in their cohort month
    assert(out(("2024-01-01", 2)) == 1L) // u1 back in March
    assert(out(("2024-02-01", 0)) == 1L) // u3, twice but distinct
  }

  test("transitions: successors pair within entity and share_bp sums to ~10000 per from-state") {
    val s = spark
    import s.implicits._
    // u1: a→b→a ; u2: a→b. Transitions: a→b ×2, b→a ×1.
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a", 1L),
      (1L, ts("2024-01-01 11:00:00"), "b", 2L),
      (1L, ts("2024-01-01 12:00:00"), "a", 3L),
      (2L, ts("2024-01-01 10:00:00"), "a", 4L),
      (2L, ts("2024-01-01 11:00:00"), "b", 5L)
    ).toDF("user_id", "t", "typ", "eid")
    val out = EventAnalytics.transitions(ev, "user_id", "t", "typ", "eid")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("a", "b")) == ((2L, 10000L)))
    assert(out(("b", "a")) == ((1L, 10000L)))
    assert(out.size == 2) // u2's trailing 'b' has no successor
  }

  test("transitions: tie column decides successor when timestamps collide") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "x", 2L),
      (1L, ts("2024-01-01 10:00:00"), "y", 1L) // same ts; eid orders y first
    ).toDF("user_id", "t", "typ", "eid")
    val out = EventAnalytics.transitions(ev, "user_id", "t", "typ", "eid").collect()
    assert(out.length == 1)
    assert((out(0).getString(0), out(0).getString(1)) == (("y", "x")))
  }

  test("sessionPaths: gap splits sessions; paths keep event order; minCount filters") {
    val s = spark
    import s.implicits._
    // u1 session1: a>b; 40-min gap; session2: a>b. u2: a>b. c alone once.
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a", 1L),
      (1L, ts("2024-01-01 10:10:00"), "b", 2L),
      (1L, ts("2024-01-01 11:00:00"), "a", 3L),
      (1L, ts("2024-01-01 11:05:00"), "b", 4L),
      (2L, ts("2024-01-01 10:00:00"), "a", 5L),
      (2L, ts("2024-01-01 10:20:00"), "b", 6L),
      (2L, ts("2024-01-02 09:00:00"), "c", 7L)
    ).toDF("user_id", "t", "typ", "eid")
    val out = EventAnalytics.sessionPaths(ev, "user_id", "t", "typ", "eid",
      gapMinutes = 30, minCount = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a>b" -> 3L)) // the lone "c" path (count 1) is filtered
  }

  test("ewma: hand-computed halving recurrence in time order; ties broken by id") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 4L),
      (1L, 11L, ts("2024-01-01 11:00:00"), 2L),
      (1L, 12L, ts("2024-01-01 12:00:00"), 9L), // (3+9)/2 = 6
      // user 2: same timestamp twice -> id order decides
      (2L, 21L, ts("2024-01-01 10:00:00"), 8L),
      (2L, 20L, ts("2024-01-01 10:00:00"), 2L))
      .toDF("user_id", "event_id", "t", "cents")
    val out = EventAnalytics.ewma(ev, "user_id", "t", "event_id", "cents")
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(out == Map(10L -> 4L, 11L -> 3L, 12L -> 6L, 20L -> 2L, 21L -> 5L))
  }

  test("holt: matches a scalar floorDiv reference, negative trend included") {
    val s = spark
    import s.implicits._
    // user 1 ramps up (positive trend), user 2 collapses hard enough
    // to drive level+trend sums negative — the floor-vs-truncate trap
    val series = Map(
      1L -> Seq(0L, 10L, 20L, 30L, 40L),
      2L -> Seq(100L, 0L, 0L, 0L))
    val rows = series.toSeq.flatMap { case (u, cs) =>
      cs.zipWithIndex.map { case (c, i) =>
        (u, u * 100 + i, ts(f"2024-01-01 ${10 + i}%02d:00:00"), c) }
    }
    def ref(cs: Seq[Long]): Seq[(Long, Long)] = {
      var l = cs.head; var b = 0L
      (l, b) +: cs.tail.map { c =>
        val lN = (l + b + c) / 2L // Scala / truncates like Spark div & DuckDB //
        val bN = (b + lN - l) / 2L
        l = lN; b = bN; (l, b)
      }
    }
    val out = EventAnalytics.holt(rows.toDF("user_id", "event_id", "t", "cents"),
        "user_id", "t", "event_id", "cents")
      .collect().map(r => r.getLong(1) -> ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    for ((u, cs) <- series; ((l, b), i) <- ref(cs).zipWithIndex) {
      assert(out(u * 100 + i) == ((l, b, l + b)), s"user $u step $i")
    }
    // the ramp's trend must be strictly positive after warmup
    assert(out(103L)._2 > 0)
    // the collapse must produce a negative trend somewhere
    assert(series(2L).indices.exists(i => out(200L + i)._2 < 0))
  }

  test("attributePositionBased: U-shape splits, remainder to last, lookback excludes") {
    val s = spark
    import s.implicits._
    val conv = Seq(
      (100L, 1L, ts("2024-01-10 12:00:00"), 999L), // 3 touches in window
      (101L, 2L, ts("2024-01-10 12:00:00"), 1000L), // 1 touch
      (102L, 3L, ts("2024-01-10 12:00:00"), 999L)) // 2 touches
      .toDF("conv_id", "user_id", "conv_ts", "cents")
    val touches = Seq(
      (1L, 1L, ts("2024-01-09 10:00:00"), "click"),  // first: 999*4000/1e4 = 399
      (2L, 1L, ts("2024-01-09 11:00:00"), "view"),   // mid:   999*2000/1e4 = 199
      (3L, 1L, ts("2024-01-09 12:00:00"), "signup"), // last:  999-399-199 = 401
      (4L, 1L, ts("2024-01-01 00:00:00"), "click"),  // outside 7d lookback
      (5L, 2L, ts("2024-01-10 11:00:00"), "click"),  // solo: 1000
      (6L, 3L, ts("2024-01-10 10:00:00"), "view"),   // 50%: 499
      (7L, 3L, ts("2024-01-10 11:00:00"), "click"))  // 999-499 = 500
      .toDF("touch_id", "user_id", "touch_ts", "channel")
    val out = EventAnalytics.attributePositionBased(conv, touches, "user_id",
        "conv_id", "conv_ts", "cents", "touch_id", "touch_ts", "channel",
        lookback = org.apache.spark.sql.functions.expr("INTERVAL 7 DAYS"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      "click" -> ((3L, 399L + 1000L + 500L)),
      "view" -> ((2L, 199L + 499L)),
      "signup" -> ((1L, 401L))))
    // credits reconcile: every touched conversion's cents fully assigned
    assert(out.values.map(_._2).sum == 999L + 1000L + 999L)
  }

  test("holtWinters: scalar reference incl. m-deep lookback, negative dip, next-slot forecast") {
    val s = spark
    import s.implicits._
    // m = 3: a period-3-ish series long enough that sₜ₋ₘ reads real
    // learned indexes, with a hard negative dip for the truncation path
    val m = 3
    val cs = Seq(10L, 40L, 20L, 12L, 44L, -30L, 14L, 46L)
    val rows = cs.zipWithIndex.map { case (c, i) =>
      (1L, 100L + i, ts(f"2024-01-01 ${10 + i}%02d:00:00"), c) }
    def ref(cs: Seq[Long]): Seq[(Long, Long, Long, Long)] = {
      var level = 0L; var trend = 0L
      val seasons = scala.collection.mutable.ArrayBuffer.empty[Long]
      cs.zipWithIndex.map { case (c, i) =>
        val sNext = if (i + 1 - m >= 0) seasons(i + 1 - m) else 0L
        if (i == 0) { level = c; trend = 0L; seasons += 0L }
        else {
          val sPrev = if (i - m >= 0) seasons(i - m) else 0L
          val lN = (c - sPrev + level + trend) / 2L // truncating, like div & //
          val bN = (trend + lN - level) / 2L
          val sN = (c - lN + sPrev) / 2L
          level = lN; trend = bN; seasons += sN
        }
        (level, trend, seasons(i), level + trend + sNext)
      }
    }
    val out = EventAnalytics.holtWinters(rows.toDF("user_id", "event_id", "t", "cents"),
        "user_id", "t", "event_id", "cents", m = m)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    for (((l, b, sn, fc), i) <- ref(cs).zipWithIndex)
      assert(out(100L + i) == ((l, b, sn, fc)), s"step $i")
    // the learned seasonal indexes must actually differ by slot
    assert(ref(cs).map(_._3).distinct.size > 2)
  }

  test("timeWeightedAvg: hand-computed weighting; single-ts entity dropped") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // user 1: 100 cents held 3h, 400 cents held 1h, last value unheld
      // twap = (100*3 + 400*1) / 4 = 175 cents
      (1L, 10L, ts("2024-01-01 00:00:00"), 1.00),
      (1L, 11L, ts("2024-01-01 03:00:00"), 4.00),
      (1L, 12L, ts("2024-01-01 04:00:00"), 9.99),
      // user 2: all events share one ts -> zero span -> dropped
      (2L, 20L, ts("2024-01-01 00:00:00"), 5.00),
      (2L, 21L, ts("2024-01-01 00:00:00"), 7.00))
      .toDF("user_id", "event_id", "t", "value")
    val out = EventAnalytics.timeWeightedAvg(ev, "user_id", "t", "event_id", "value")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(1L))
    val (n, span, twap) = out(1L)
    assert(n == 3L && span == 4L * 3600L * 1000000L && twap == 175L)
  }

  test("throttle: re-emits after gap since last KEPT (not session-gap semantics)") {
    val s = spark
    import s.implicits._
    // chain 0, 40m, 80m, 120m with a 60m gap: session logic would merge
    // the whole chain into one session (consecutive gaps 40m < 60m) and
    // keep only the first; throttle keeps 0 (first), 80m (>= 0+60m),
    // and NOT 40m (< 0+60m) / 120m (< 80m+60m... 120-80=40 < 60) -> kept = {0, 80m}
    val ev = Seq(
      (1L, "alert", 10L, ts("2024-01-01 00:00:00")),
      (1L, "alert", 11L, ts("2024-01-01 00:40:00")),
      (1L, "alert", 12L, ts("2024-01-01 01:20:00")),
      (1L, "alert", 13L, ts("2024-01-01 02:00:00")),
      // other channel throttles independently
      (1L, "mail", 20L, ts("2024-01-01 00:50:00")),
      // boundary: exactly minGap after last kept -> kept (>=)
      (2L, "alert", 30L, ts("2024-01-01 00:00:00")),
      (2L, "alert", 31L, ts("2024-01-01 01:00:00")))
      .toDF("user_id", "channel", "event_id", "t")
    val kept = EventAnalytics.throttle(ev, "user_id", "channel", "t", "event_id",
        minGap = lit(3600L))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 12L, 20L, 30L, 31L))
  }

  test("cusum: accumulation, alarm at threshold crossing, post-alarm reset, per-entity isolation") {
    val s = spark
    import s.implicits._
    def ts(x: String) = java.sql.Timestamp.valueOf(x)
    // k=10, h=25. entity 1: values 15,20,18,5 ->
    //   s1=max(0,15-10)=5; s2=max(0,5+20-10)=15; s3=max(0,15+18-10)=23;
    //   s4=max(0,23+5-10)=18 — no alarm (never >25)
    // entity 2: values 40,30,8 ->
    //   s1=30 ALARM (reset); s2=max(0,0+30-10)=20; s3=max(0,20+8-10)=18
    val ev = Seq(
      (1L, 101L, ts("2024-01-01 00:00:00"), 15L),
      (1L, 102L, ts("2024-01-01 00:01:00"), 20L),
      (1L, 103L, ts("2024-01-01 00:02:00"), 18L),
      (1L, 104L, ts("2024-01-01 00:03:00"), 5L),
      (2L, 201L, ts("2024-01-01 00:00:00"), 40L),
      (2L, 202L, ts("2024-01-01 00:01:00"), 30L),
      (2L, 203L, ts("2024-01-01 00:02:00"), 8L))
      .toDF("user_id", "event_id", "t", "cents")
    val got = EventAnalytics.cusum(ev, "user_id", "t", "event_id", "cents",
        kCents = 10L, hCents = 25L)
      .collect().map(r => r.getLong(1) -> (r.getLong(4), r.getBoolean(5))).toMap
    assert(got == Map(
      101L -> (5L, false), 102L -> (15L, false), 103L -> (23L, false), 104L -> (18L, false),
      201L -> (30L, true), 202L -> (20L, false), 203L -> (18L, false)))
    // s never negative even under a deep dive
    val dive = Seq((9L, 1L, ts("2024-01-01 00:00:00"), 1L),
      (9L, 2L, ts("2024-01-01 00:01:00"), 1L)).toDF("user_id", "event_id", "t", "cents")
    val dv = EventAnalytics.cusum(dive, "user_id", "t", "event_id", "cents", 10L, 25L)
      .select("s").collect().map(_.getLong(0))
    assert(dv.forall(_ == 0L))
    intercept[IllegalArgumentException](
      EventAnalytics.cusum(ev, "user_id", "t", "event_id", "cents", 10L, 0L))
  }
}
