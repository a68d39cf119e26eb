package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Codec for Apache Hudi MERGE-ON-READ log files, implemented from
  * the PUBLIC log-format spec (hudi.apache.org "Writer Expectations" /
  * "File Layouts" + the documented HoodieLogFormat block structure) —
  * the missing half that lets [[HudiTableReader]] serve the REAL-TIME
  * view (template.py:304's `spark.read.format("hudi")` on a MOR table)
  * instead of refusing:
  *
  *  - log files are named `.<fileId>_<baseInstant>.log.<version>_<token>`
  *    and live beside the base files of their file group;
  *  - each file is a sequence of BLOCKS: 6-byte magic `#HUDI#`, block
  *    size, log-format version (1), block type ordinal, a header map
  *    of (metadata-key ordinal → string), content length, content,
  *    footer map, and a trailing total-block-length (what lets a
  *    reader skip a torn tail block);
  *  - an AVRO data block's content is `[format version][record count]`
  *    then per record `[size][binary-Avro bytes]`, the writer schema
  *    riding the block header's SCHEMA entry;
  *  - a DELETE block carries the record keys to tombstone;
  *  - COMMAND blocks (rollback instructions) exist in the wild; this
  *    reader REFUSES them loudly rather than mis-merging a
  *    half-rolled-back log.
  *
  * Merge semantics ride the block ORDER (deltacommit instants are
  * time-ordered, blocks within a file are append-ordered): later
  * records win per record key, Hudi's default
  * overwrite-with-latest payload behavior.
  *
  * The Avro<->Row bridge below maps the Spark types graft tables use
  * (long/int/double/float/boolean/string/binary/date/timestamp) onto
  * nullable Avro unions; anything else refuses loudly at schema-build
  * time rather than writing records some future reader cannot decode.
  */
object HudiLog {

  val Magic: Array[Byte] = "#HUDI#".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  val FormatVersion: Int = 1

  /** Block type ordinals (the public HoodieLogBlockType order). */
  val CommandBlockType = 0
  val DeleteBlockType = 1
  val CorruptBlockType = 2
  val AvroDataBlockType = 3

  /** Header metadata-key ordinals (the public HeaderMetadataType order). */
  val InstantTimeKey = 0
  val TargetInstantKey = 1
  val SchemaKey = 2

  /** Inner format version of an Avro data block's content. */
  val AvroBlockVersion = 3
  /** Inner format version of this codec's delete-block content. */
  val DeleteBlockVersion = 1

  sealed trait Block { def instant: String }
  /** Upserts: full records (Hudi meta columns included) under the
    * writer `schemaJson`, appended by deltacommit `instant`. */
  final case class DataBlock(instant: String, schemaJson: String,
      records: Seq[Array[Byte]]) extends Block
  /** Tombstones: the record keys deleted by deltacommit `instant`. */
  final case class DeleteBlock(instant: String, keys: Seq[String]) extends Block

  // ----------------------------------------------------------------
  // Block I/O
  // ----------------------------------------------------------------

  private def headerBytes(entries: Seq[(Int, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(entries.size)
    entries.foreach { case (k, v) => out.writeInt(k); out.writeUTF(v) }
    out.flush()
    bos.toByteArray
  }

  private def contentOf(b: Block): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    b match {
      case DataBlock(_, _, records) =>
        out.writeInt(AvroBlockVersion)
        out.writeInt(records.size)
        records.foreach { r => out.writeInt(r.length); out.write(r) }
      case DeleteBlock(_, keys) =>
        out.writeInt(DeleteBlockVersion)
        out.writeInt(keys.size)
        keys.foreach(out.writeUTF)
    }
    out.flush()
    bos.toByteArray
  }

  /** Append `blocks` to the log file at `path` (created if absent —
    * plain create, since each log file is written once by one task).
    */
  def write(conf: Configuration, path: String, blocks: Seq[Block]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = new DataOutputStream(fs.create(p, false))
    try {
      blocks.foreach { b =>
        val header = b match {
          case DataBlock(instant, schemaJson, _) =>
            headerBytes(Seq(InstantTimeKey -> instant, SchemaKey -> schemaJson))
          case DeleteBlock(instant, _) =>
            headerBytes(Seq(InstantTimeKey -> instant))
        }
        val blockType = b match {
          case _: DataBlock => AvroDataBlockType
          case _: DeleteBlock => DeleteBlockType
        }
        val content = contentOf(b)
        val footer = headerBytes(Nil)
        // fixed parts after the size field: version(4) + type(4) +
        // header + contentLen(8) + content + footer + trailing(8)
        val afterSize = 4L + 4L + header.length + 8L + content.length + footer.length + 8L
        val total = Magic.length + 8L + afterSize
        out.write(Magic)
        out.writeLong(afterSize)
        out.writeInt(FormatVersion)
        out.writeInt(blockType)
        out.write(header)
        out.writeLong(content.length.toLong)
        out.write(content)
        out.write(footer)
        out.writeLong(total)
      }
    } finally out.close()
  }

  private def readHeader(in: DataInputStream): Map[Int, String] = {
    val n = in.readInt()
    require(n >= 0 && n < 1024, s"corrupt log header entry count $n")
    (0 until n).map(_ => in.readInt() -> in.readUTF()).toMap
  }

  /** Parse every block of the log file at `path`, in order. Refuses
    * loudly on command/corrupt/unknown blocks and torn tails — a
    * silent skip would serve a half-merged view.
    */
  def read(conf: Configuration, path: String): Seq[Block] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val in = new DataInputStream(new java.io.BufferedInputStream(fs.open(p)))
    try {
      val blocks = Seq.newBuilder[Block]
      var pos = 0L
      while (pos < len) {
        val magic = new Array[Byte](Magic.length)
        in.readFully(magic)
        require(java.util.Arrays.equals(magic, Magic),
          s"$path@$pos: bad log block magic — torn or foreign file; refusing")
        val afterSize = in.readLong()
        val version = in.readInt()
        require(version == FormatVersion,
          s"$path@$pos: log format version $version is not $FormatVersion; refusing")
        val blockType = in.readInt()
        val header = readHeader(in)
        val contentLen = in.readLong()
        require(contentLen >= 0 && contentLen <= afterSize,
          s"$path@$pos: corrupt content length $contentLen")
        val content = new Array[Byte](contentLen.toInt)
        in.readFully(content)
        readHeader(in): Unit // footer
        val total = in.readLong()
        require(total == Magic.length + 8L + afterSize,
          s"$path@$pos: trailing block length $total disagrees with header — torn block; refusing")
        pos += total
        val instant = header.getOrElse(InstantTimeKey, throw new IllegalStateException(
          s"$path@$pos: log block carries no INSTANT_TIME header"))
        val din = new DataInputStream(new ByteArrayInputStream(content))
        blockType match {
          case AvroDataBlockType =>
            val v = din.readInt()
            require(v == AvroBlockVersion,
              s"$path@$pos: avro data block version $v is not $AvroBlockVersion; refusing")
            val n = din.readInt()
            val recs = (0 until n).map { _ =>
              val sz = din.readInt()
              val bytes = new Array[Byte](sz)
              din.readFully(bytes)
              bytes
            }
            val schemaJson = header.getOrElse(SchemaKey, throw new IllegalStateException(
              s"$path@$pos: avro data block carries no SCHEMA header"))
            blocks += DataBlock(instant, schemaJson, recs)
          case DeleteBlockType =>
            val v = din.readInt()
            require(v == DeleteBlockVersion,
              s"$path@$pos: delete block version $v is not $DeleteBlockVersion; refusing")
            val n = din.readInt()
            blocks += DeleteBlock(instant, (0 until n).map(_ => din.readUTF()))
          case CommandBlockType => throw new IllegalStateException(
            s"$path@$pos: COMMAND block (rollback instruction) — merging across it would " +
              "serve half-rolled-back data; this reader refuses")
          case other => throw new IllegalStateException(
            s"$path@$pos: unknown log block type $other; refusing")
        }
      }
      blocks.result()
    } finally in.close()
  }

  /** Log-file name for file group `fileId` whose base instant is
    * `baseInstant`, at log version `version` (1-based).
    */
  def logFileName(fileId: String, baseInstant: String, version: Int,
      writeToken: String = "0-0-0"): String =
    s".${fileId}_$baseInstant.log.${version}_$writeToken"

  /** Parse `(fileId, baseInstant, version)` out of a log-file name. */
  def parseLogFileName(name: String): Option[(String, String, Int)] = {
    val re = """^\.(.+)_([0-9]+)\.log\.([0-9]+)_.+$""".r
    name match {
      case re(fileId, base, v) => Some((fileId, base, v.toInt))
      case _ => None
    }
  }

  // ----------------------------------------------------------------
  // Avro <-> Row bridge for the Spark types graft tables carry.
  // ----------------------------------------------------------------

  def avroSchemaOf(schema: StructType, recordName: String = "hudi_record"): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    schema.fields.foreach { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case DateType =>
          org.apache.avro.LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case TimestampType =>
          org.apache.avro.LogicalTypes.timestampMicros()
            .addToSchema(Schema.create(Schema.Type.LONG))
        case TimestampNTZType =>
          org.apache.avro.LogicalTypes.localTimestampMicros()
            .addToSchema(Schema.create(Schema.Type.LONG))
        case other => throw new IllegalArgumentException(
          s"column ${f.name}: Spark type $other has no Avro mapping in this codec; refusing")
      }
      val union = Schema.createUnion(java.util.Arrays.asList(
        Schema.create(Schema.Type.NULL), base))
      fields.add(new Schema.Field(f.name, union, null, Schema.Field.NULL_DEFAULT_VALUE))
    }
    Schema.createRecord(recordName, null, "graft.hudi", false, fields)
  }

  /** Encode one external-row `Row` (as produced by collect/iterator)
    * into binary Avro under `avro` built from `schema`.
    */
  def encodeRow(row: Row, schema: StructType, avro: Schema): Array[Byte] = {
    val rec = new GenericData.Record(avro)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val v: Any =
        if (row.isNullAt(i)) null
        else f.dataType match {
          case DateType => row.get(i) match {
            case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
            case d: java.time.LocalDate => d.toEpochDay.toInt
            case other => other
          }
          case TimestampType => row.get(i) match {
            case t: java.sql.Timestamp =>
              t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
            case t: java.time.Instant =>
              t.getEpochSecond * 1000000L + t.getNano / 1000L
            case other => other
          }
          case TimestampNTZType => row.get(i) match {
            case t: java.time.LocalDateTime =>
              val i0 = t.toInstant(java.time.ZoneOffset.UTC)
              i0.getEpochSecond * 1000000L + i0.getNano / 1000L
            case other => other
          }
          case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
          case _ => row.get(i)
        }
      rec.put(i, v)
    }
    val bos = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(bos, null)
    new GenericDatumWriter[GenericRecord](avro).write(rec, enc)
    enc.flush()
    bos.toByteArray
  }

  /** Decode binary Avro bytes (written under `writer` schema) into an
    * external `Row` shaped by `target`; columns absent from the writer
    * schema come back null.
    */
  def decodeRow(bytes: Array[Byte], writer: Schema, target: StructType): Row = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    val rec = new GenericDatumReader[GenericRecord](writer).read(null, dec)
    val values = target.fields.map { f =>
      val af = writer.getField(f.name)
      val raw = if (af == null) null else rec.get(af.pos())
      if (raw == null) null
      else f.dataType match {
        case StringType => raw.toString
        case DateType => java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(raw.asInstanceOf[Number].longValue()))
        case TimestampType =>
          val micros = raw.asInstanceOf[Number].longValue()
          val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
          t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
          t
        case TimestampNTZType =>
          val micros = raw.asInstanceOf[Number].longValue()
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            (Math.floorMod(micros, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
        case BinaryType =>
          val bb = raw.asInstanceOf[java.nio.ByteBuffer]
          val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
        case LongType => raw.asInstanceOf[Number].longValue()
        case IntegerType => raw.asInstanceOf[Number].intValue()
        case DoubleType => raw.asInstanceOf[Number].doubleValue()
        case FloatType => raw.asInstanceOf[Number].floatValue()
        case _ => raw
      }
    }
    Row.fromSeq(values.toIndexedSeq)
  }
}
