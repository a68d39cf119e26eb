package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Snapshot ("FULL") table loading — the graft analog of the
  * reference's full Hudi load → temp view
  * (reference: template.py:304-305).
  *
  * Tables are parquet under `dir/<name>.parquet`. Loading is lazy and
  * declarative: Catalyst pushes filters/projections from downstream
  * operators into the scan, so registering every table in a pipeline
  * spec costs nothing until the transform actually reads it.
  */
object TableLoader {

  /** Read one table as a DataFrame. Nanosecond parquet timestamps
    * (which Spark reads as raw longs under
    * `spark.sql.legacy.parquet.nanosAsLong=true`) are normalized to
    * TIMESTAMP_NTZ at microsecond precision — the testdata `events.ts`
    * values are micro-aligned, so the narrowing is lossless.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeNanos(df, "ts") else df
  }

  /** Convert a raw nanos-since-epoch long column into TIMESTAMP_NTZ.
    * Integer `div` (not `/`) — epoch nanos exceed 2^53 and would lose
    * precision through a double.
    */
  def normalizeNanos(df: DataFrame, column: String): DataFrame =
    if (df.schema.fieldNames.contains(column) && df.schema(column).dataType == LongType)
      df.withColumn(column, timestamp_micros(expr(s"$column div 1000")).cast("timestamp_ntz"))
    else df

  /** Epoch nanos of a UTC wall-clock timestamp string — for pushing a
    * timestamp watermark down onto a RAW nanos-long column (a filter
    * on the normalized column is post-scan; a filter on the raw long
    * reaches the parquet reader as a pushed predicate).
    */
  def toEpochNanos(timestamp: String): Long = {
    val t = java.time.LocalDateTime.parse(timestamp.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC)
    t.getEpochSecond * 1000000000L + t.getNano
  }

  /** Read a table and register it as a temp view under its own name,
    * mirroring the reference's `createOrReplaceTempView(table_name)`.
    */
  def register(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = table(spark, dir, name)
    df.createOrReplaceTempView(name)
    df
  }

  /** All driver testdata tables. */
  val AllTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every known table in `dir` as a temp view. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    AllTables.foreach(register(spark, dir, _))
}
