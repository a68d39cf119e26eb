package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class KeyValueScanSpec extends SparkSpec {

  test("scanJsonLines: distributed KV-export scan with and without schema") {
    val dir = tmpDir("graft-kv-")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/records.json"),
      """{"pk": "a", "n": 1}
        |{"pk": "b", "n": 2}
        |""".stripMargin)
    assert(KeyValueScan.scanJsonLines(spark, dir).count() == 2)
    val typed = KeyValueScan.scanJsonLines(spark, dir,
      Some(StructType(Seq(StructField("pk", StringType), StructField("n", LongType)))))
    assert(typed.schema("n").dataType == LongType)
    assert(typed.agg(sum("n")).head.getLong(0) == 3)
  }

  test("parseJsonColumn: typed extraction from events.props") {
    val events = TableLoader.table(spark, sfDir, "events").limit(100)
    val parsed = KeyValueScan.parseJsonColumn(events, "props",
      StructType(Seq(StructField("k", IntegerType))))
    assert(parsed.filter(col("parsed.k").isNotNull).count() > 0)
  }
}
