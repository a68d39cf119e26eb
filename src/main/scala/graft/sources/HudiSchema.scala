package graft.sources

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.spark.sql.types._

/** Spark ↔ Avro schema codec for the Hudi commit-metadata `schema`
  * key (hudi.apache.org: every commit's metadata may carry the
  * table's Avro schema under `extraMetadata.schema` — the authority
  * readers resolve ADDITIVE SCHEMA EVOLUTION against). The mapping
  * covers the column types graft's Hudi writer lands (reference:
  * template.py builds its Hudi tables from exactly such flat
  * columns); anything else refuses loudly rather than degrading to a
  * lossy guess. All fields encode as NULLABLE unions with null
  * defaults — evolution adds nullable columns only, per Hudi's own
  * compatibility rule.
  */
object HudiSchema {

  /** The Avro record-schema JSON for `schema` — what an evolution
    * commit publishes under `extraMetadata.schema`. */
  def toAvroJson(schema: StructType, recordName: String = "graft_record"): String = {
    val fields = schema.fields.map { f =>
      s"""{"name":"${f.name}","type":["null",${avroTypeOf(f.dataType, f.name)}],""" +
        s""""default":null}"""
    }.mkString(",")
    s"""{"type":"record","name":"$recordName","namespace":"hoodie.graft",""" +
      s""""fields":[$fields]}"""
  }

  private def avroTypeOf(dt: DataType, colName: String): String = dt match {
    case LongType => "\"long\""
    case IntegerType => "\"int\""
    case DoubleType => "\"double\""
    case FloatType => "\"float\""
    case BooleanType => "\"boolean\""
    case StringType => "\"string\""
    case BinaryType => "\"bytes\""
    case DateType => """{"type":"int","logicalType":"date"}"""
    case TimestampType => """{"type":"long","logicalType":"timestamp-micros"}"""
    case TimestampNTZType => """{"type":"long","logicalType":"local-timestamp-micros"}"""
    case d: DecimalType =>
      s"""{"type":"bytes","logicalType":"decimal",""" +
        s""""precision":${d.precision},"scale":${d.scale}}"""
    case other => throw new IllegalArgumentException(
      s"column $colName: Spark type $other has no Hudi commit-schema mapping; refusing")
  }

  /** Parse a commit's `extraMetadata.schema` Avro JSON back to the
    * Spark schema readers scan with. Covers the shapes real Hudi
    * writers stamp — flat primitives, fixed/bytes decimals, nested
    * records, arrays, maps, enums, millis/micros timestamps; a
    * genuinely unmappable type still refuses loudly — a
    * silently-mistyped column would make the declared-schema scan
    * read garbage. */
  def fromAvroJson(json: String): StructType = {
    val avro = new Schema.Parser().parse(json)
    require(avro.getType == Schema.Type.RECORD,
      s"commit schema must be an Avro record, got ${avro.getType}")
    structTypeOf(avro)
  }

  private def structTypeOf(record: Schema): StructType = {
    import scala.jdk.CollectionConverters._
    StructType(record.getFields.asScala.toSeq.map { f =>
      StructField(f.name(), sparkTypeOf(unwrapNullable(f.schema()), f.name()),
        nullable = true)
    })
  }

  private def unwrapNullable(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else {
      import scala.jdk.CollectionConverters._
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1,
        s"commit schema union ${s} is not a simple nullable union; refusing")
      branches.head
    }

  private def sparkTypeOf(s: Schema, colName: String): DataType = {
    val logical = s.getLogicalType
    (s.getType, logical) match {
      case (Schema.Type.LONG, l: LogicalTypes.TimestampMicros @unchecked)
        if l.getName == "timestamp-micros" => TimestampType
      case (Schema.Type.LONG, l) if l != null && l.getName == "local-timestamp-micros" =>
        TimestampNTZType
      case (Schema.Type.LONG, null) => LongType
      case (Schema.Type.INT, l) if l != null && l.getName == "date" => DateType
      case (Schema.Type.INT, null) => IntegerType
      case (Schema.Type.DOUBLE, _) => DoubleType
      case (Schema.Type.FLOAT, _) => FloatType
      case (Schema.Type.BOOLEAN, _) => BooleanType
      case (Schema.Type.STRING, _) => StringType
      case (Schema.Type.BYTES, d: LogicalTypes.Decimal) =>
        DecimalType(d.getPrecision, d.getScale)
      case (Schema.Type.BYTES, null) => BinaryType
      // real-world Hudi writers stamp decimals as FIXED (the Avro
      // default for parquet-backed decimals) and nest structs freely
      case (Schema.Type.FIXED, d: LogicalTypes.Decimal) =>
        DecimalType(d.getPrecision, d.getScale)
      case (Schema.Type.FIXED, null) => BinaryType
      case (Schema.Type.LONG, l) if l != null && l.getName == "timestamp-millis" =>
        TimestampType
      case (Schema.Type.LONG, l) if l != null && l.getName == "local-timestamp-millis" =>
        TimestampNTZType
      case (Schema.Type.ENUM, _) => StringType
      case (Schema.Type.RECORD, _) => structTypeOf(s)
      case (Schema.Type.ARRAY, _) =>
        ArrayType(sparkTypeOf(unwrapNullable(s.getElementType), s"$colName.element"),
          containsNull = true)
      case (Schema.Type.MAP, _) =>
        MapType(StringType,
          sparkTypeOf(unwrapNullable(s.getValueType), s"$colName.value"),
          valueContainsNull = true)
      case (t, l) => throw new IllegalArgumentException(
        s"column $colName: commit-schema Avro type $t (logical $l) has no Spark " +
          "mapping in this reader; refusing")
    }
  }
}
