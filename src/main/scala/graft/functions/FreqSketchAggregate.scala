package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Misra-Gries frequent-items sketch as a mergeable aggregate:
  * `freq_sketch(value, capacity)` -> `array<struct<value string,
  * est long>>` (desc by estimate, value tiebreak).
  *
  * State is AT MOST `capacity` counters per partial — constant
  * memory however large the stream — and partials merge losslessly
  * under the standard mergeable-summaries bound (Agarwal et al.,
  * TODS'13): every item's estimate undercounts its true frequency by
  * at most n/(capacity+1). Hence any item with true frequency
  * > n/(capacity+1) is GUARANTEED to survive with est > 0 — size
  * capacity at (1/threshold-fraction) or larger and use the sketch as
  * a candidate generator, then verify candidates with one exact
  * filtered count (see operators.HeavyHitters): exact answers at a
  * bounded fraction of the full-aggregation shuffle.
  */
case class FreqSketchAggregate(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(capacity >= 1, "capacity must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("est", LongType, nullable = false))))

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  /** Classic MG step: count if tracked or roomy, else decrement all —
    * amortized O(1) per element (a full decrement pass retires
    * capacity+1 stream elements at once).
    */
  override def update(buf: java.util.HashMap[String, Long], input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(key)
      if (cur != 0L || buf.containsKey(key)) buf.put(key, cur + 1)
      else if (buf.size < capacity) buf.put(key, 1L)
      else {
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1)
        }
      }
    }
    buf
  }

  /** Mergeable-summaries merge: sum counters, and if over capacity
    * subtract the (capacity+1)-th largest count from everything —
    * the error bounds add, staying <= n_total/(capacity+1).
    */
  override def merge(buf: java.util.HashMap[String, Long], other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    other.forEach { (k, v) => buf.put(k, buf.getOrDefault(k, 0L) + v) }
    if (buf.size > capacity) {
      val counts = buf.values().stream().mapToLong(_.longValue()).sorted().toArray
      val cut = counts(counts.length - capacity - 1) // (capacity+1)-th largest
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    buf.forEach { (k, v) => entries(i) = (k, v); i += 1 }
    val sorted = entries.sortBy { case (k, v) => (-v, k) }
    new GenericArrayData(sorted.map { case (k, v) => InternalRow(UTF8String.fromString(k), v) })
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed UTF-8 bytes, not writeUTF: a pathological
    // "token" past 64 KiB must round-trip, not throw UTFDataFormat
    buf.forEach { (k, v) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

object FreqSketchFunctions {
  /** Column API: `freq_sketch(value, capacity)` aggregate. */
  def freq_sketch(value: Column, capacity: Int): Column =
    toColumn(FreqSketchAggregate(toExpr(value), capacity).toAggregateExpression())
}
