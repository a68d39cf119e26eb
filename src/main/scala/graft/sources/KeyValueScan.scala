package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Key-value record scans → DataFrame — graft analog of the
  * reference's DynamoDB `table.scan()` → `createDataFrame`
  * (reference: template.py:284-294).
  *
  * Two shapes:
  *  - `scanJsonLines`: a directory/file of JSON records (the portable
  *    stand-in for a KV-store export); `spark.read.json` distributes
  *    the scan instead of paginating on the driver like the reference.
  *  - `parseJsonColumn`: records already landed in a table as a JSON
  *    string column (e.g. `events.props`) — parsed with `from_json`
  *    into typed columns, fully codegen'd, no UDFs.
  */
object KeyValueScan {

  def scanJsonLines(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val reader = spark.read
    schema.fold(reader)(reader.schema).json(path)
  }

  /** Parse a JSON-string column into a struct column named `parsed`. */
  def parseJsonColumn(df: DataFrame, column: String, schema: StructType): DataFrame =
    df.withColumn("parsed", from_json(col(column), schema))
}
