package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg PARTITION TRANSFORMS (iceberg.apache.org spec, "Partition
  * Transforms" + Appendix B "32-bit Hash Requirements") — the piece
  * that makes most PRODUCTION Iceberg tables writable and prunable:
  * real tables are `days(ts)`- or `bucket(N, id)`-partitioned far
  * more often than identity-partitioned.
  *
  * Three faces of each transform, kept in lockstep:
  *  - [[column]]: the Spark Column that DERIVES partition values at
  *    write time (distributed, codegen-friendly built-ins; bucket
  *    rides the murmur3 kernel in [[graft.functions.GraftHash]]);
  *  - [[eval]]: the same function on a DRIVER literal — what the
  *    inverse pruner applies to predicate bounds;
  *  - [[prunerFor]]: predicate-on-source-column → pruner over the
  *    manifest's recorded partition values. Monotone transforms
  *    (identity, truncate, year/month/day/hour) map a `[lo, hi]`
  *    source range to the transformed `[T(lo), T(hi)]` range;
  *    bucket prunes only on EQUALITY (the hash scatters ranges), and
  *    any unprunable shape keeps the file — pruning cuts I/O, never
  *    semantics.
  *
  * The bucket hash is the spec's murmur3_x86_32 over the single-value
  * serialization (ints/dates widen to 8-byte little-endian longs,
  * timestamps hash their microseconds, strings their UTF-8 bytes),
  * verified against the spec's own published vectors (34 →
  * 2017239379, "iceberg" → 1210000089, date 17486 → -653330422) in
  * IcebergTransformsSpec.
  */
object IcebergTransforms {

  sealed trait Transform
  case object Identity extends Transform
  final case class Bucket(n: Int) extends Transform
  final case class Truncate(w: Int) extends Transform
  case object Year extends Transform
  case object Month extends Transform
  case object Day extends Transform
  case object Hour extends Transform

  /** One partition-spec field: the RESULT name recorded in manifests
    * (Iceberg's own conventions: `ts_day`, `id_bucket`, `s_trunc`),
    * the source column, and the transform between them.
    */
  final case class PartitionField(resultName: String, sourceCol: String,
      transform: Transform)

  /** Parse a user-facing partition spec string: a bare column name is
    * identity; `bucket(N, col)`, `truncate(W, col)`, `years(col)`,
    * `months(col)`, `days(col)`, `hours(col)` (singular accepted) are
    * the transforms, mirroring Iceberg's SQL DDL forms.
    */
  def parse(spec: String): PartitionField = {
    val s = spec.trim
    val call = """^(\w+)\s*\(\s*([^)]*)\s*\)$""".r
    s match {
      case call(fn, args) =>
        val parts = args.split(',').map(_.trim).filter(_.nonEmpty)
        fn.toLowerCase match {
          case "bucket" =>
            require(parts.length == 2 && parts(0).forall(_.isDigit),
              s"bucket takes (N, column): $spec")
            val n = parts(0).toInt
            require(n >= 1, s"bucket N must be >= 1: $spec")
            PartitionField(s"${parts(1)}_bucket", parts(1), Bucket(n))
          case "truncate" =>
            require(parts.length == 2 && parts(0).forall(_.isDigit),
              s"truncate takes (W, column): $spec")
            val w = parts(0).toInt
            require(w >= 1, s"truncate W must be >= 1: $spec")
            PartitionField(s"${parts(1)}_trunc", parts(1), Truncate(w))
          case "year" | "years" =>
            require(parts.length == 1, s"years takes (column): $spec")
            PartitionField(s"${parts(0)}_year", parts(0), Year)
          case "month" | "months" =>
            require(parts.length == 1, s"months takes (column): $spec")
            PartitionField(s"${parts(0)}_month", parts(0), Month)
          case "day" | "days" =>
            require(parts.length == 1, s"days takes (column): $spec")
            PartitionField(s"${parts(0)}_day", parts(0), Day)
          case "hour" | "hours" =>
            require(parts.length == 1, s"hours takes (column): $spec")
            PartitionField(s"${parts(0)}_hour", parts(0), Hour)
          case other => throw new IllegalArgumentException(
            s"unknown partition transform '$other' in $spec")
        }
      case _ =>
        require(s.nonEmpty && !s.contains('('), s"bad partition spec: $spec")
        PartitionField(s, s, Identity)
    }
  }

  /** The transform string the metadata `partition-specs` records —
    * the spec's forms: `identity`, `bucket[N]`, `truncate[W]`,
    * `year`/`month`/`day`/`hour`.
    */
  def specString(t: Transform): String = t match {
    case Identity => "identity"
    case Bucket(n) => s"bucket[$n]"
    case Truncate(w) => s"truncate[$w]"
    case Year => "year"
    case Month => "month"
    case Day => "day"
    case Hour => "hour"
  }

  /** Parse a metadata transform string (tolerating the plural forms
    * some writers emit). Unknown transforms throw — a misread spec
    * must refuse loudly, not prune wrongly.
    */
  def parseSpecString(s: String): Transform = {
    val bucket = """bucket\[(\d+)\]""".r
    val trunc = """truncate\[(\d+)\]""".r
    s.trim.toLowerCase match {
      case "identity" => Identity
      case bucket(n) => Bucket(n.toInt)
      case trunc(w) => Truncate(w.toInt)
      case "year" | "years" => Year
      case "month" | "months" => Month
      case "day" | "days" => Day
      case "hour" | "hours" => Hour
      case other => throw new IllegalArgumentException(
        s"unknown Iceberg partition transform '$other'")
    }
  }

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  /** Exact integer floor-division column: `(a - pmod(a, b)) / b` in
    * long arithmetic — no double round-trip (micros columns overflow
    * a Double's 2^53 mantissa eventually; the spec's day/hour values
    * must be exact).
    */
  private def floorDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / lit(b)).cast(IntegerType)

  /** Days-from-epoch column for a date or timestamp source. NTZ
    * timestamps derive from the WALL CLOCK (to_date/hour are
    * timezone-free on ntz) — Iceberg's semantics for the type.
    */
  private def epochDays(c: Column, dt: DataType): Column = dt match {
    case DateType => unix_date(c)
    case TimestampType => floorDiv(unix_micros(c), MicrosPerDay)
    case TimestampNTZType => unix_date(to_date(c))
    case other => throw new IllegalArgumentException(
      s"time transform needs a date/timestamp source, got $other")
  }

  /** The write-side derivation: a Spark Column computing the
    * transformed partition value from the source column. Time
    * transforms produce the spec's epoch-relative ints; bucket rides
    * [[graft.functions.HashFunctions.icebergBucket]].
    */
  def column(f: PartitionField, dt: DataType): Column = {
    val c = col(f.sourceCol)
    f.transform match {
      case Identity => c
      case Bucket(n) => graft.functions.HashFunctions.icebergBucket(c, n)
      case Truncate(w) => dt match {
        case StringType => substring(c, 1, w)
        case LongType | IntegerType =>
          // spec: v - (((v % W) + W) % W) — floored mod, negatives
          // truncate DOWN (e.g. -1 with W=10 → -10)
          (c - pmod(c, lit(w.toLong))).cast(dt)
        case other => throw new IllegalArgumentException(
          s"truncate supports string/int/long sources, got $other")
      }
      case Day => epochDays(c, dt)
      case Hour => dt match {
        case TimestampType => floorDiv(unix_micros(c), MicrosPerHour)
        case TimestampNTZType =>
          (unix_date(to_date(c)) * 24 + hour(c)).cast(IntegerType)
        case other => throw new IllegalArgumentException(
          s"hour transform needs a timestamp source, got $other")
      }
      case Month =>
        val d = date_from_unix_date(epochDays(c, dt))
        ((year(d) - 1970) * 12 + month(d) - 1).cast(IntegerType)
      case Year =>
        val d = date_from_unix_date(epochDays(c, dt))
        (year(d) - 1970).cast(IntegerType)
    }
  }

  /** True when the transform's result type is the spec's int (what
    * the manifest partition struct should carry as an int, not a
    * string): bucket and the time transforms.
    */
  def intResult(t: Transform): Boolean = t match {
    case Bucket(_) | Year | Month | Day | Hour => true
    case Identity | Truncate(_) => false
  }

  // ------------------------------------------------------- driver eval

  private def toEpochDays(v: Any): Long = v match {
    case d: java.time.LocalDate => d.toEpochDay
    case t: java.time.LocalDateTime => t.toLocalDate.toEpochDay
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case t: java.sql.Timestamp => Math.floorDiv(toMicros(t), MicrosPerDay)
    case t: java.time.Instant => Math.floorDiv(toMicros(t), MicrosPerDay)
    case other => throw new IllegalArgumentException(
      s"cannot read $other (${other.getClass.getName}) as a date/timestamp")
  }

  private def toMicros(v: Any): Long = v match {
    case t: java.time.LocalDateTime => Math.addExact(
      Math.multiplyExact(t.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
      t.getNano / 1000L)
    case t: java.sql.Timestamp => Math.addExact(
      Math.multiplyExact(t.getTime / 1000L, 1000000L), t.getNanos / 1000L)
    case t: java.time.Instant => Math.addExact(
      Math.multiplyExact(t.getEpochSecond, 1000000L), t.getNano / 1000L)
    case d: java.time.LocalDate => Math.multiplyExact(d.toEpochDay, MicrosPerDay)
    case d: java.sql.Date => Math.multiplyExact(d.toLocalDate.toEpochDay, MicrosPerDay)
    case other => throw new IllegalArgumentException(
      s"cannot read $other (${other.getClass.getName}) as a timestamp")
  }

  /** The same transform on a DRIVER-SIDE literal — what the inverse
    * pruner applies to predicate bounds. Matches [[column]] exactly
    * (specs lock the two faces together).
    */
  def eval(t: Transform, v: Any): Any = t match {
    case Identity => v
    case Bucket(n) =>
      val h = v match {
        case i: Int => graft.functions.GraftHash.icebergHashLong(i.toLong)
        case l: Long => graft.functions.GraftHash.icebergHashLong(l)
        case s: String =>
          graft.functions.GraftHash.icebergHashBytes(s.getBytes("UTF-8"))
        case b: Array[Byte] => graft.functions.GraftHash.icebergHashBytes(b)
        case d: java.time.LocalDate =>
          graft.functions.GraftHash.icebergHashLong(d.toEpochDay)
        case d: java.sql.Date =>
          graft.functions.GraftHash.icebergHashLong(d.toLocalDate.toEpochDay)
        case ts @ (_: java.sql.Timestamp | _: java.time.Instant |
            _: java.time.LocalDateTime) =>
          graft.functions.GraftHash.icebergHashLong(toMicros(ts))
        case other => throw new IllegalArgumentException(
          s"bucket cannot hash $other (${other.getClass.getName})")
      }
      (h & Integer.MAX_VALUE) % n
    case Truncate(w) => v match {
      case s: String => if (s.length <= w) s else s.substring(0, w)
      case i: Int => i - Math.floorMod(i, w)
      case l: Long => l - Math.floorMod(l, w.toLong)
      case other => throw new IllegalArgumentException(
        s"truncate cannot apply to $other (${other.getClass.getName})")
    }
    case Day => toEpochDays(v).toInt
    case Hour => Math.floorDiv(toMicros(v), MicrosPerHour).toInt
    case Month =>
      val d = java.time.LocalDate.ofEpochDay(toEpochDays(v))
      (d.getYear - 1970) * 12 + d.getMonthValue - 1
    case Year =>
      java.time.LocalDate.ofEpochDay(toEpochDays(v)).getYear - 1970
  }

  // ---------------------------------------------------- inverse pruner

  /** Manifest partition values arrive as strings (the reader's
    * type-erased view); compare them to an evaluated transform result
    * in the RESULT's own domain — int-typed results compare as longs
    * so `"19700"` meets `19700`, everything else compares lexically
    * on the canonical string form.
    */
  private def sameValue(recorded: String, evaluated: Any): Boolean =
    evaluated match {
      case n: Int => scala.util.Try(recorded.trim.toLong).toOption.contains(n.toLong)
      case n: Long => scala.util.Try(recorded.trim.toLong).toOption.contains(n)
      case other => recorded == String.valueOf(other)
    }

  private def inLongRange(recorded: String, lo: Long, hi: Long): Boolean =
    scala.util.Try(recorded.trim.toLong).toOption.forall(v => v >= lo && v <= hi)

  /** Pruner for `column BETWEEN lo AND hi` (equality = lo == hi) over
    * a table partitioned by `fields`: each field SOURCED on `column`
    * contributes a cut — monotone transforms map the source range to
    * the transformed range, bucket cuts only on equality — and fields
    * on other columns keep everything. Missing/unparsable recorded
    * values are KEPT (pruning cuts I/O, never semantics).
    */
  def prunerFor(fields: Seq[PartitionField], column: String,
      lo: Any, hi: Any): Map[String, String] => Boolean = {
    val cuts: Seq[Map[String, String] => Boolean] =
      fields.filter(_.sourceCol == column).flatMap { f =>
        f.transform match {
          case Bucket(_) =>
            if (lo == hi) {
              val b = eval(f.transform, lo)
              Some((pv: Map[String, String]) =>
                pv.get(f.resultName).forall(sameValue(_, b)))
            } else None // a hash scatters ranges — cannot cut
          case Identity | Truncate(_) =>
            // monotone on ordered sources; recorded values are
            // strings, so only int-typed sources compare reliably —
            // evaluate and compare as longs when both ends parse
            (eval(f.transform, lo), eval(f.transform, hi)) match {
              case (l: Int, h: Int) =>
                Some((pv: Map[String, String]) =>
                  pv.get(f.resultName).forall(inLongRange(_, l.toLong, h.toLong)))
              case (l: Long, h: Long) =>
                Some((pv: Map[String, String]) =>
                  pv.get(f.resultName).forall(inLongRange(_, l, h)))
              case (l: String, h: String) =>
                Some((pv: Map[String, String]) => pv.get(f.resultName).forall { r =>
                  // truncated-string range: recorded prefix must sit
                  // within [trunc(lo), trunc(hi)] lexically
                  r >= l && r <= h
                })
              case _ => None
            }
          case Year | Month | Day | Hour =>
            val l = eval(f.transform, lo).asInstanceOf[Int]
            val h = eval(f.transform, hi).asInstanceOf[Int]
            Some((pv: Map[String, String]) =>
              pv.get(f.resultName).forall(inLongRange(_, l.toLong, h.toLong)))
        }
      }
    pv => cuts.forall(_(pv))
  }
}
