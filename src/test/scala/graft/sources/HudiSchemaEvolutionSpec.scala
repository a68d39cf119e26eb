package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ADDITIVE SCHEMA EVOLUTION on the Hudi writers: a batch that ADDS
  * columns commits Hudi's own `extraMetadata.schema` authority, and
  * every later read scans with the DECLARED schema, so pre-evolution
  * base files null-fill deterministically. Drops, type changes and
  * MOR tables refuse loudly. Completes the round-15 triad (Delta and
  * Iceberg writers evolved in round 16's first leg).
  */
class HudiSchemaEvolutionSpec extends SparkSpec {

  private def df(r: Range) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"k${i % 5}", i * 2L)).toDF("id", "key", "v")
  }

  private def dfTagged(r: Range, tag: String) = {
    val s = spark
    import s.implicits._
    r.map(i => (i.toLong, s"k${i % 5}", i * 2L, tag)).toDF("id", "key", "v", "tag")
  }

  test("COW append evolution: old files null-fill the new column; incremental exact across") {
    val table = tmpDir("hse-append") + "/t"
    val c1 = HudiTableWriter.create(df(1 to 40), table, recordKeys = Seq("id"))
    HudiTableWriter.append(dfTagged(41 to 60, "late"), table): Unit
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.columns.contains("tag"), "the evolved column must be visible")
    assert(snap.count() == 60L)
    assert(snap.where(col("id") <= 40L && col("tag").isNull).count() == 40L,
      "pre-evolution rows null-fill the new column")
    assert(snap.where(col("id") > 40L && col("tag") === "late").count() == 20L)
    // the declared schema, not footer sampling, is the authority
    val declared = HudiTableReader.declaredDataSchema(spark, table)
    assert(declared.exists(_.fieldNames.toSeq == Seq("id", "key", "v", "tag")),
      s"declared schema must append the new column last, got $declared")
    // incremental from the PRE-evolution checkpoint serves the new rows
    val inc = HudiTableReader.incrementalSince(spark, table, c1)
    assert(inc.count() == 20L && inc.columns.contains("tag"))
    // a later append carrying the FULL evolved set is a plain append
    HudiTableWriter.append(dfTagged(61 to 70, "later"), table): Unit
    assert(HudiTableReader.snapshot(spark, table).count() == 70L)
  }

  test("COW upsert evolution: carried rows null-fill, keep stamps; touched groups take the update") {
    val table = tmpDir("hse-upsert") + "/t"
    val c1 = HudiTableWriter.create(df(1 to 50), table, recordKeys = Seq("id"))
    val s = spark
    import s.implicits._
    // update ids 1..10 with a NEW column; 11..50 are carried rows
    val batch = (1 to 10).map(i => (i.toLong, s"k${i % 5}", 999L, "patched"))
      .toDF("id", "key", "v", "tag")
    HudiTableWriter.upsert(batch, table): Unit
    val snap = HudiTableReader.snapshot(spark, table)
    assert(snap.count() == 50L)
    assert(snap.where(col("id") <= 10L).agg(min("v"), max("v")).head().toSeq
      == Seq(999L, 999L))
    assert(snap.where(col("id") <= 10L && col("tag") === "patched").count() == 10L)
    assert(snap.where(col("id") > 10L && col("tag").isNull).count() == 40L,
      "carried and untouched rows null-fill the evolved column")
    // carried rows keep their ORIGINAL commit stamp (the COW contract)
    assert(snap.where(col("id") > 10L)
      .select("_hoodie_commit_time").distinct().collect().map(_.getString(0)).toSeq
      == Seq(c1))
    // upserting again WITH the evolved set (no further evolution) works
    val batch2 = Seq((11L, "k1", 777L, "again")).toDF("id", "key", "v", "tag")
    HudiTableWriter.upsert(batch2, table): Unit
    val after = HudiTableReader.snapshot(spark, table)
    assert(after.where(col("id") === 11L).head().getAs[String]("tag") == "again")
    assert(after.count() == 50L)
  }

  test("refusals: dropped column, type change") {
    val s = spark
    import s.implicits._
    val cow = tmpDir("hse-refuse-cow") + "/t"
    HudiTableWriter.create(df(1 to 10), cow, recordKeys = Seq("id")): Unit
    // type change refuses
    val retyped = Seq((1L, "x", "not-a-long")).toDF("id", "key", "v")
    val e1 = intercept[IllegalArgumentException](HudiTableWriter.append(retyped, cow))
    assert(e1.getMessage.contains("type changes"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](HudiTableWriter.upsert(retyped, cow))
    assert(e2.getMessage.contains("type changes"), e2.getMessage)
    // dropped column refuses on upsert too
    val e3 = intercept[IllegalArgumentException](
      HudiTableWriter.upsert(Seq((1L, "x")).toDF("id", "key"), cow))
    assert(e3.getMessage.contains("ADDITIVE"), e3.getMessage)
  }

  test("MOR additive evolution: log upserts carry the wide schema, old bases and logs null-fill") {
    val s = spark
    import s.implicits._
    val mor = tmpDir("hse-mor-evolve") + "/t"
    HudiTableWriter.createMor(df(1 to 10), mor, recordKeys = Seq("id")): Unit
    // a pre-evolution LOG upsert at the narrow schema
    HudiTableWriter.upsert(Seq((3L, "k3", 333L)).toDF("id", "key", "v"), mor): Unit
    // the EVOLVING upsert: updates ride log blocks at the wide schema,
    // the deltacommit stamps the schema authority
    HudiTableWriter.upsert(dfTagged(1 to 2, "hot"), mor): Unit
    val snap = HudiTableReader.snapshot(spark, mor)
    assert(snap.columns.contains("tag"))
    assert(snap.count() == 10L)
    assert(snap.where(col("id") === 1L).head().getAs[String]("tag") == "hot")
    assert(snap.where(col("id") === 1L).head().getAs[Long]("v") == 2L,
      "the evolving upsert's own values must serve")
    // pre-evolution rows — base AND earlier log blocks — null-fill
    assert(snap.where(col("id") === 5L).select("tag").head().isNullAt(0))
    assert(snap.where(col("id") === 3L).select("tag").head().isNullAt(0),
      "a pre-evolution LOG row must null-fill the new column")
    assert(snap.where(col("id") === 3L).head().getAs[Long]("v") == 333L,
      "the pre-evolution log value still wins its key")
    // an evolving APPEND (new keys) on MOR lands the wide schema too
    HudiTableWriter.append(dfTagged(11 to 12, "new"), mor): Unit
    val after = HudiTableReader.snapshot(spark, mor)
    assert(after.count() == 12L)
    assert(after.where(col("id") === 11L).head().getAs[String]("tag") == "new")
  }

  test("HudiSchema round-trips every supported type; unsupported shapes refuse") {
    val st = StructType(Seq(
      StructField("a", LongType), StructField("b", IntegerType),
      StructField("c", DoubleType), StructField("d", FloatType),
      StructField("e", BooleanType), StructField("f", StringType),
      StructField("g", BinaryType), StructField("h", DateType),
      StructField("i", TimestampType), StructField("j", TimestampNTZType),
      StructField("k", DecimalType(12, 2))))
    val back = HudiSchema.fromAvroJson(HudiSchema.toAvroJson(st))
    assert(back.fields.map(f => (f.name, f.dataType)).toSeq
      == st.fields.map(f => (f.name, f.dataType)).toSeq)
    val e = intercept[IllegalArgumentException](
      HudiSchema.toAvroJson(StructType(Seq(StructField("m", ArrayType(LongType))))))
    assert(e.getMessage.contains("no Hudi commit-schema mapping"))
  }
}
