package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {

  test("gap semantics: chained events merge, silence splits") {
    val s = spark
    import s.implicits._
    // user 1: events at 0, 20, 40 min (chained: each within 30m of the
    // previous, though 0 and 40 are not) then 120 min (new session)
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 00:20:00", 2.0),
      (1L, "2024-01-01 00:40:00", 4.0),
      (1L, "2024-01-01 02:00:00", 8.0),
      (2L, "2024-01-01 00:00:00", 16.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")

    val out = Sessionize.sessions(rows, "user_id", "ts", "value")
      .select(col("user_id"), col("session_start").cast("string"),
        col("n_events"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01 00:00:00", 3L, 7.0),   // chained session of 3
      (1L, "2024-01-01 02:00:00", 1L, 8.0),   // split by the 80m gap
      (2L, "2024-01-01 00:00:00", 1L, 16.0)))
    // session_end = last event + gap
    val ends = Sessionize.sessions(rows, "user_id", "ts", "value")
      .filter(col("user_id") === 1L && col("n_events") === 3)
      .select(col("session_end").cast("string")).head.getString(0)
    assert(ends == "2024-01-01 01:10:00")
  }

  test("sessionStats aggregates per key") {
    val events = graft.sources.TableLoader.table(spark, sfDir, "events")
    val sessions = Sessionize.sessions(events, "user_id", "ts", "value")
    val stats = Sessionize.sessionStats(sessions, "user_id")
    assert(stats.count() == events.select("user_id").distinct().count())
    assert(stats.filter(col("events_per_session") < 1).count() == 0)
  }
}
