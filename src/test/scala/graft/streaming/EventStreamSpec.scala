package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkSpec {

  test("streaming sessionization emits exactly the watermark-passed batch sessions") {
    val streamed = EventStream.runSessionsToBatch(spark, s"$sfDir/events.parquet",
      queryName = "spec_sessions")
    val events = graft.sources.TableLoader.table(spark, sfDir, "events")
    val batch = graft.operators.Sessionize.sessions(events, "user_id", "ts", "value")

    // final watermark = max event time (MILLISECOND-truncated, as the
    // engine tracks it) - 1h; append emits sessions the watermark
    // passed, holds the trailing ones in (discarded) state
    val cutoff = events.agg(max(col("ts"))).head.getAs[java.time.LocalDateTime](0)
      .truncatedTo(java.time.temporal.ChronoUnit.MILLIS).minusHours(1)
    val emitted = batch.filter(col("session_end") <= lit(cutoff))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty) // nothing invented
    assert(emitted.exceptAll(streamed).isEmpty, "every watermark-passed session emitted")
  }

  test("streaming hourly agg equals the batch equivalent") {
    val streamed = EventStream.runToBatch(spark, s"$sfDir/events.parquet", queryName = "spec_stream")
    val batch = graft.sources.TableLoader.table(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming dedup over a doubled directory equals a single copy") {
    val streamed = EventStream.runDedupToBatch(spark, s"$sfDir/events.parquet", queryName = "spec_dedup")
    val batch = graft.sources.TableLoader.table(spark, sfDir, "events")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
