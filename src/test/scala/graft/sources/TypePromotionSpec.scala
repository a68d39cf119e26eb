package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spec-legal TYPE PROMOTIONS as metadata-only schema evolution.
  *
  * Iceberg (iceberg.apache.org spec, Schema Evolution — "Valid type
  * promotions"): int→long, float→double, decimal(P,S)→decimal(P',S)
  * with P'>P. The promotion lands as a NEW schemas node (field ids
  * verbatim, primitive widened, current-schema-id bumped); files
  * written before it keep their narrow physical type and the
  * declared-schema scan widens them (Spark 4's vectorized parquet
  * reader performs exactly these conversions).
  *
  * Delta (delta.io PROTOCOL.md, typeWidening table feature): the
  * read side — a table whose schemaString declares a wider type than
  * some files physically carry reads correctly through the declared
  * scan, and the typeWidening reader feature is honored rather than
  * refused.
  */
class TypePromotionSpec extends SparkSpec {

  private def intDf(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i, s"g${i % 3}", i.toFloat / 2f)).toDF("id", "grp", "score")
  }

  private def longDf(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"g${i % 3}", i.toDouble / 2d)).toDF("id", "grp", "score")
  }

  test("Iceberg: int→long + float→double promotions evolve metadata; old files widen at scan") {
    val table = tmpDir("promo-ice") + "/t"
    IcebergTableWriter.create(intDf(1 to 30), table): Unit
    // the promoted append: same columns, wider types
    IcebergTableWriter.append(longDf(31 to 50), table): Unit
    val snap = IcebergTableReader.snapshot(spark, table)
    // the widened declared schema serves BOTH halves
    assert(snap.schema("id").dataType == LongType)
    assert(snap.schema("score").dataType == DoubleType)
    assert(snap.count() == 50L)
    assert(snap.agg(sum(col("id"))).head().getLong(0) == (1 to 50).map(_.toLong).sum)
    // pre-promotion rows read back exactly (physically int32/float)
    assert(snap.where(col("id") === 7L).head().getAs[Double]("score") == 3.5d)
    // the promotion is METADATA: a new schemas node with the same
    // field ids, current-schema-id bumped — no old file rewritten
    val fs = new java.io.File(s"$table/metadata")
    val meta = fs.listFiles().filter(_.getName.endsWith(".metadata.json"))
      .maxBy(_.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt)
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(scala.io.Source.fromFile(meta).mkString)
    val schemas = node.get("schemas")
    assert(schemas.size() >= 2, "the promotion must append a new schemas node")
    val cur = {
      val sid = node.get("current-schema-id").asInt()
      var found: com.fasterxml.jackson.databind.JsonNode = null
      schemas.forEach(sn => if (sn.get("schema-id").asInt() == sid) found = sn)
      found
    }
    val typesById = {
      val b = Map.newBuilder[Int, String]
      cur.get("fields").forEach(f =>
        if (f.get("type").isTextual) b += (f.get("id").asInt() -> f.get("type").asText()))
      b.result()
    }
    assert(typesById(1) == "long" && typesById(3) == "double",
      s"promoted types must land in the current schema node, got $typesById")
    // old schema node keeps declaring int — history is immutable
    val first = schemas.get(0)
    val firstTypes = {
      val b = Seq.newBuilder[String]
      first.get("fields").forEach(f => b += f.get("type").asText())
      b.result()
    }
    assert(firstTypes.contains("int"))
    // appends AFTER the promotion carry long natively
    IcebergTableWriter.append(longDf(51 to 60), table): Unit
    assert(IcebergTableReader.snapshot(spark, table).count() == 60L)
  }

  test("Iceberg: stats skipping stays SAFE across a promotion — int-bound files are kept, not mis-decoded") {
    val table = tmpDir("promo-skip") + "/t"
    IcebergTableWriter.create(intDf(1 to 40).repartition(2), table): Unit
    IcebergTableWriter.append(longDf(1000 to 1040).repartitionByRange(2, col("id")), table): Unit
    // bounds for the old files are 4-byte ints; with the column now
    // long they must be conservatively KEPT (never decoded as long)
    val pruned = IcebergTableReader.snapshotSkipping(spark, table, "id", 0.0, 100.0)
    assert(pruned.where(col("id") <= 100L).count() == 40L,
      "skipping must never lose pre-promotion rows")
    // and the long-bound files DO prune on a disjoint ask
    val full = IcebergTableReader.snapshot(spark, table)
    val prunedHigh = IcebergTableReader.snapshotSkipping(spark, table, "id", 2000.0, 3000.0)
    assert(prunedHigh.inputFiles.length < full.inputFiles.length,
      "post-promotion files carry 8-byte bounds and must keep pruning")
  }

  test("Iceberg: decimal precision widening at the same scale evolves; scale changes refuse") {
    val s = spark
    import s.implicits._
    val table = tmpDir("promo-dec") + "/t"
    val narrow = Seq((1L, BigDecimal("12.34")), (2L, BigDecimal("56.78")))
      .toDF("id", "amt").select(col("id"), col("amt").cast(DecimalType(10, 2)).as("amt"))
    IcebergTableWriter.create(narrow, table): Unit
    val wide = Seq((3L, BigDecimal("99999999.99")))
      .toDF("id", "amt").select(col("id"), col("amt").cast(DecimalType(18, 2)).as("amt"))
    IcebergTableWriter.append(wide, table): Unit
    val snap = IcebergTableReader.snapshot(spark, table)
    assert(snap.schema("amt").dataType == DecimalType(18, 2))
    assert(snap.count() == 3L)
    assert(snap.where(col("id") === 1L).head().getDecimal(1).toPlainString == "12.34")
    // scale change is NOT a legal promotion
    val reScaled = Seq((4L, BigDecimal("1.234")))
      .toDF("id", "amt").select(col("id"), col("amt").cast(DecimalType(18, 3)).as("amt"))
    val e = intercept[IllegalArgumentException](IcebergTableWriter.append(reScaled, table))
    assert(e.getMessage.contains("promotions"))
    // narrowing refuses too
    val narrowed = Seq((5L, BigDecimal("1.23")))
      .toDF("id", "amt").select(col("id"), col("amt").cast(DecimalType(8, 2)).as("amt"))
    val e2 = intercept[IllegalArgumentException](IcebergTableWriter.append(narrowed, table))
    assert(e2.getMessage.contains("promotions"))
  }

  test("Iceberg: illegal promotions keep refusing (long→int, string→long, double→float)") {
    val s = spark
    import s.implicits._
    val table = tmpDir("promo-illegal") + "/t"
    IcebergTableWriter.create(longDf(1 to 10), table): Unit
    // narrowing long→int
    val e = intercept[IllegalArgumentException](
      IcebergTableWriter.append(intDf(11 to 20), table))
    assert(e.getMessage.contains("cannot change column"))
    // string→long
    val bad = Seq((11L, 5L, 1.0d)).toDF("id", "grp", "score")
    val e2 = intercept[IllegalArgumentException](IcebergTableWriter.append(bad, table))
    assert(e2.getMessage.contains("cannot change column"))
  }

  test("Delta: typeWidening reader feature is honored — widened declared schema reads narrow files") {
    val s = spark
    import s.implicits._
    val table = tmpDir("promo-delta") + "/t"
    // v0: an int-typed table with one data file (physically int32)
    DeltaTableWriter.create(intDf(1 to 20), table): Unit
    // an external engine widens id→long via typeWidening: protocol
    // declares the feature, metaData re-declares the schema wider
    val widened = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("grp", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true))).json
    val q = new com.fasterxml.jackson.databind.ObjectMapper()
    java.nio.file.Files.write(
      new java.io.File(s"$table/_delta_log", f"${1L}%020d.json").toPath,
      (Seq(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}""",
        s"""{"metaData":{"id":"promo","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":${q.writeValueAsString(widened)},""" +
          s""""partitionColumns":[],"configuration":{},"createdTime":0}}""")
        .mkString("\n") + "\n").getBytes("UTF-8")): Unit
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.schema("id").dataType == LongType)
    assert(snap.schema("score").dataType == DoubleType)
    assert(snap.count() == 20L)
    assert(snap.agg(sum(col("id"))).head().getLong(0) == 210L)
    // the WRITE side honors the feature too: an append to the
    // externally-widened table lands wide files beside the narrow ones
    DeltaTableWriter.append(longDf(21 to 30), table): Unit
    val both = DeltaTableReader.snapshot(spark, table)
    assert(both.count() == 30L)
    assert(both.agg(sum(col("id"))).head().getLong(0) == 465L)
  }

  test("Delta: the WRITER widens via append — typeChanges recorded, protocol upgraded, narrow files keep serving") {
    val s = spark
    import s.implicits._
    val table = tmpDir("promo-delta-w") + "/t"
    // v0: int/float table on a LEGACY 1/2 protocol
    DeltaTableWriter.create(intDf(1 to 20), table): Unit
    // the widening append: same columns, long/double — a metadata
    // commit plus the wide data files, NOT a refusal
    DeltaTableWriter.append(longDf(21 to 30), table): Unit
    val snap = DeltaTableReader.snapshot(spark, table)
    assert(snap.schema("id").dataType == LongType)
    assert(snap.schema("score").dataType == DoubleType)
    assert(snap.count() == 30L)
    assert(snap.agg(sum(col("id"))).head().getLong(0) == 465L)
    // pre-widening rows (physically int32/float) serve widened
    assert(snap.where(col("id") === 7L).head().getAs[Double]("score") == 3.5d)
    // the commit recorded its obligations: protocol declares
    // typeWidening in BOTH feature lists, and each widened field
    // carries a delta.typeChanges entry with the exact from/to names
    val state = DeltaTableReader.snapshotState(spark, table)
    val p = state.protocol.get
    assert(p.minReaderVersion == 3 && p.minWriterVersion == 7)
    assert(p.readerFeatures.contains("typeWidening"))
    assert(p.writerFeatures.contains("typeWidening"))
    val declared = DataType.fromJson(state.schemaJson.get).asInstanceOf[StructType]
    def changes(c: String) =
      declared(c).metadata.getMetadataArray("delta.typeChanges").toSeq
    assert(changes("id").map(m =>
      (m.getString("fromType"), m.getString("toType"))) == Seq(("integer", "long")))
    assert(changes("score").map(m =>
      (m.getString("fromType"), m.getString("toType"))) == Seq(("float", "double")))
    assert(!declared("grp").metadata.contains("delta.typeChanges"))
    // a SECOND append at the wide type is feature-gate clean (the
    // upgraded protocol round-trips through the writer's own gate)
    DeltaTableWriter.append(longDf(31 to 35), table): Unit
    assert(DeltaTableReader.snapshot(spark, table).count() == 35L)
    // decimal precision growth at the same scale widens; scale change
    // and narrowing keep refusing
    val dt = tmpDir("promo-delta-dec") + "/t"
    val narrow = Seq((1L, BigDecimal("12.34")), (2L, BigDecimal("56.78")))
      .toDF("id", "amt").select(col("id"), col("amt").cast(DecimalType(10, 2)).as("amt"))
    DeltaTableWriter.create(narrow, dt): Unit
    val wide = Seq((3L, BigDecimal("99999999.99")))
      .toDF("id", "amt").select(col("id"), col("amt").cast(DecimalType(18, 2)).as("amt"))
    DeltaTableWriter.append(wide, dt): Unit
    val dsnap = DeltaTableReader.snapshot(spark, dt)
    assert(dsnap.schema("amt").dataType == DecimalType(18, 2))
    assert(dsnap.where(col("id") === 1L).head().getDecimal(1).toPlainString == "12.34")
    val reScaled = Seq((4L, BigDecimal("1.234")))
      .toDF("id", "amt").select(col("id"), col("amt").cast(DecimalType(18, 3)).as("amt"))
    val e = intercept[IllegalArgumentException](DeltaTableWriter.append(reScaled, dt))
    assert(e.getMessage.contains("widening"))
    val narrowed = Seq((5L, BigDecimal("1.23")))
      .toDF("id", "amt").select(col("id"), col("amt").cast(DecimalType(8, 2)).as("amt"))
    val e2 = intercept[IllegalArgumentException](DeltaTableWriter.append(narrowed, dt))
    assert(e2.getMessage.contains("widening"))
    // string→long stays a rewrite-grade refusal
    val bad = Seq((6L, "x")).toDF("id", "amt")
    val e3 = intercept[IllegalArgumentException](DeltaTableWriter.append(bad, dt))
    assert(e3.getMessage.contains("cannot change column"))
  }
}
