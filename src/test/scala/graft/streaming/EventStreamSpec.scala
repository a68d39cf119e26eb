package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkSpec {

  test("streaming hourly agg equals the batch equivalent") {
    val streamed = EventStream.runToBatch(spark, s"$sfDir/events.parquet", queryName = "spec_stream")
    val batch = graft.sources.TableLoader.table(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
