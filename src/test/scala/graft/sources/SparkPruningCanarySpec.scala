package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CANARY: pins the Spark behavior graft's id-mode NESTED read design
  * depends on — nested schema pruning rebuilds pruned inner structs
  * WITHOUT field metadata, so a requested schema whose INNER fields
  * carry parquet.field.id silently loses them (and the scan
  * null-fills) the moment a query selects a nested field. That trap
  * is why the id-mode reader resolves inner fields by their recorded
  * PHYSICAL NAMES (physInnerType + positional cast) instead of inner
  * ids. If a Spark upgrade makes this test FAIL (the pruned select
  * starts returning values), pruning now preserves inner metadata and
  * the inner-id request shape becomes viable — revisit
  * DeltaTableReader.fieldIdSchemaOf.
  */
class SparkPruningCanarySpec extends SparkSpec {

  test("nested schema pruning drops inner parquet.field.id metadata (the id-mode design premise)") {
    def pqMeta(id: Long) = new MetadataBuilder().putLong("parquet.field.id", id).build()
    // TWO inner fields matter: selecting one forces pruning to
    // REBUILD the inner struct (a one-field struct prunes to itself
    // and keeps its metadata — no trap there)
    val fileSchema = StructType(Seq(
      StructField("p_top", StructType(Seq(
        StructField("p_name", StringType, nullable = true, pqMeta(2)),
        StructField("p_score", LongType, nullable = true, pqMeta(3)))),
        nullable = true, pqMeta(1)),
      StructField("p_k", LongType, nullable = true, pqMeta(4))))
    import scala.jdk.CollectionConverters._
    val rows = (1 to 3).map(i =>
      org.apache.spark.sql.Row(org.apache.spark.sql.Row(s"n$i", i * 10L), i.toLong))
    val out = tmpDir("pruning-canary")
    val wKey = "spark.sql.parquet.fieldId.write.enabled"
    spark.conf.set(wKey, "true")
    try spark.createDataFrame(rows.asJava, fileSchema)
      .coalesce(1).write.mode("overwrite").parquet(out)
    finally spark.conf.unset(wKey)
    val rKey = "spark.sql.parquet.fieldId.read.enabled"
    val prior = spark.conf.getOption(rKey)
    spark.conf.set(rKey, "true")
    try {
      // request LOGICAL names resolved by ids at both levels
      val req = StructType(Seq(
        StructField("cust", StructType(Seq(
          StructField("name", StringType, nullable = true, pqMeta(2)),
          StructField("score", LongType, nullable = true, pqMeta(3)))),
          nullable = true, pqMeta(1)),
        StructField("k", LongType, nullable = true, pqMeta(4))))
      val df = spark.read.schema(req).parquet(out)
      // FULL reads resolve by id at every level — this works
      assert(df.collect().map(_.getStruct(0).getString(0)).sorted.sameElements(
        Seq("n1", "n2", "n3")))
      // ... but selecting the nested field prunes the request, the
      // pruned inner struct loses its id metadata, and the scan
      // null-fills: THE PREMISE. A future Spark fixing this flips the
      // assertion — revisit the id-mode nested design then.
      val pruned = df.select(col("cust.name")).collect().map(_.getString(0))
      assert(pruned.forall(_ == null),
        "Spark's nested schema pruning now PRESERVES inner field-id metadata — " +
          "the id-mode inner-id request shape is viable; revisit fieldIdSchemaOf " +
          s"(got ${pruned.mkString(",")})")
    } finally prior match {
      case Some(v) => spark.conf.set(rKey, v)
      case None => spark.conf.unset(rKey)
    }
  }
}
