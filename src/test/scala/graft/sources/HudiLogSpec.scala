package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The log-file codec is the foundation the MOR real-time view and
  * the deltacommit writer both stand on — round trips and torn-file
  * refusals are spec-locked here, independent of any table.
  */
class HudiLogSpec extends SparkSpec {

  private val conf = new org.apache.hadoop.conf.Configuration()

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType), StructField("ok", BooleanType),
    StructField("day", DateType), StructField("at", TimestampType),
    StructField("at_ntz", TimestampNTZType), StructField("blob", BinaryType)))

  test("avro row round trip: every supported type, nulls included") {
    val avro = HudiLog.avroSchemaOf(schema)
    val row = Row(7L, "x", 1.5, true,
      java.sql.Date.valueOf("2024-02-29"),
      java.sql.Timestamp.valueOf("2024-02-29 12:34:56.789123"),
      java.time.LocalDateTime.parse("2024-02-29T01:02:03.000004"),
      Array[Byte](1, 2, 3))
    val back = HudiLog.decodeRow(HudiLog.encodeRow(row, schema, avro), avro, schema)
    assert(back.getLong(0) == 7L && back.getString(1) == "x")
    assert(back.getDouble(2) == 1.5 && back.getBoolean(3))
    assert(back.getDate(4) == java.sql.Date.valueOf("2024-02-29"))
    assert(back.getTimestamp(5) == java.sql.Timestamp.valueOf("2024-02-29 12:34:56.789123"))
    assert(back.getAs[java.time.LocalDateTime](6) ==
      java.time.LocalDateTime.parse("2024-02-29T01:02:03.000004"))
    assert(back.getAs[Array[Byte]](7).toSeq == Seq[Byte](1, 2, 3))
    // nulls survive
    val nulls = Row(null, null, null, null, null, null, null, null)
    val back2 = HudiLog.decodeRow(HudiLog.encodeRow(nulls, schema, avro), avro, schema)
    assert((0 until 8).forall(back2.isNullAt))
    // a column the WRITER schema lacks decodes as null (schema evolution)
    val wider = schema.add("extra", LongType)
    val back3 = HudiLog.decodeRow(HudiLog.encodeRow(row, schema, avro), avro, wider)
    assert(back3.isNullAt(8))
    // an unsupported type refuses at schema build, not at decode
    val e = intercept[IllegalArgumentException](
      HudiLog.avroSchemaOf(StructType(Seq(StructField("m", MapType(StringType, LongType))))))
    assert(e.getMessage.contains("no Avro mapping"))
  }

  test("log file round trip: data + delete blocks, order preserved") {
    val avro = HudiLog.avroSchemaOf(schema)
    val recs = (1 to 5).map(i => HudiLog.encodeRow(
      Row(i.toLong, s"n$i", i * 0.5, i % 2 == 0, null, null, null, null), schema, avro))
    val path = tmpDir("hudilog") + "/" + HudiLog.logFileName("g1", "20240101000000", 1)
    HudiLog.write(conf, path, Seq(
      HudiLog.DataBlock("20240102000000", avro.toString, recs),
      HudiLog.DeleteBlock("20240103000000", Seq("id:1", "id:3"))))
    val blocks = HudiLog.read(conf, path)
    assert(blocks.size == 2)
    val HudiLog.DataBlock(i1, sj, r1) = blocks(0): @unchecked
    assert(i1 == "20240102000000" && r1.size == 5)
    val decoded = r1.map(b => HudiLog.decodeRow(b,
      new org.apache.avro.Schema.Parser().parse(sj), schema))
    assert(decoded.map(_.getLong(0)) == (1 to 5).map(_.toLong))
    val HudiLog.DeleteBlock(i2, keys) = blocks(1): @unchecked
    assert(i2 == "20240103000000" && keys == Seq("id:1", "id:3"))
    // file-name parse round trip
    assert(HudiLog.parseLogFileName(HudiLog.logFileName("g1", "20240101000000", 7))
      .contains(("g1", "20240101000000", 7)))
  }

  test("torn tails, foreign bytes, and command blocks refuse loudly") {
    val dir = tmpDir("hudilog-bad")
    // foreign bytes where magic should be
    val junk = s"$dir/junk.log"
    java.nio.file.Files.write(java.nio.file.Paths.get(junk),
      "not a hudi log".getBytes("UTF-8"))
    val e1 = intercept[IllegalArgumentException](HudiLog.read(conf, junk))
    assert(e1.getMessage.contains("magic"))
    // a truncated (torn) block
    val good = s"$dir/good.log"
    HudiLog.write(conf, good, Seq(HudiLog.DeleteBlock("20240101000000", Seq("k1"))))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(good))
    val torn = s"$dir/torn.log"
    java.nio.file.Files.write(java.nio.file.Paths.get(torn),
      bytes.take(bytes.length - 3))
    intercept[Exception](HudiLog.read(conf, torn))
    // a COMMAND block (rollback instruction) refuses rather than mis-merging
    val cmd = s"$dir/cmd.log"
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(cmd))
    try {
      val header = { // one header entry: INSTANT_TIME
        val bos = new java.io.ByteArrayOutputStream()
        val d = new java.io.DataOutputStream(bos)
        d.writeInt(1); d.writeInt(HudiLog.InstantTimeKey); d.writeUTF("20240101000000")
        d.flush(); bos.toByteArray
      }
      val footer = { val bos = new java.io.ByteArrayOutputStream()
        val d = new java.io.DataOutputStream(bos); d.writeInt(0); d.flush(); bos.toByteArray }
      val afterSize = 4L + 4L + header.length + 8L + 0L + footer.length + 8L
      out.write(HudiLog.Magic); out.writeLong(afterSize)
      out.writeInt(HudiLog.FormatVersion); out.writeInt(HudiLog.CommandBlockType)
      out.write(header); out.writeLong(0L); out.write(footer)
      out.writeLong(HudiLog.Magic.length + 8L + afterSize)
    } finally out.close()
    val e3 = intercept[IllegalStateException](HudiLog.read(conf, cmd))
    assert(e3.getMessage.contains("COMMAND"))
  }
}
