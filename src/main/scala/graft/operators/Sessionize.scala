package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: consecutive events of
  * the same key belong to one session while each is within `gap` of
  * the previous; a longer silence starts a new session.
  *
  * Spark-first: `session_window` is the engine's native merging
  * session window — one shuffle on the key, sessions assembled inside
  * the aggregation (works identically in batch and Structured
  * Streaming with a watermark). The equivalent lag()/cumsum window
  * formulation sorts every partition AND needs a second aggregation;
  * the oracle uses that formulation in DuckDB to cross-check.
  *
  * Scale: state per key is one open session during assembly; the
  * shuffle is the one hash-partition by key any per-user computation
  * pays. Skewed keys (bot users) are AQE's skew-join/agg territory.
  */
object Sessionize {

  /** Per (key, session): start, end (= last event + gap, the native
    * session_window bound), event count, and a summed measure.
    */
  def sessions(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(28,6)")).cast("double").as("sum_value"))
      .select(
        col(keyCol),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Mean session length (seconds) and events-per-session per key —
    * the rollup a report over sessions typically wants.
    */
  def sessionStats(sessionsDf: DataFrame, keyCol: String): DataFrame =
    sessionsDf
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_sessions"),
        avg(unix_timestamp(col("session_end")) - unix_timestamp(col("session_start")))
          .as("avg_session_seconds"),
        (sum(col("n_events")) / count(lit(1))).as("events_per_session"))
}
