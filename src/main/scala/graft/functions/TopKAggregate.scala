package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Bounded top-k as a single-pass aggregate:
  * `top_k((score, id), k)` -> `array<struct<score double, id long>>`
  * sorted by (score desc, id asc).
  *
  * This is the scale-correct shape for "top-k per group": a window
  * `row_number() <= k` must shuffle and sort EVERY row of a group;
  * this aggregate keeps an O(k) heap per group, combines map-side
  * partials before the shuffle, and never materializes more than k
  * candidates per partition per group. At 100 TB that's the
  * difference between a bounded hash-agg and a full sort.
  */
case class TopKAggregate(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = { buf.mergeFrom(other); buf }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = c(0), idExpr = c(1))
}

/** Fixed-capacity min-heap on (score, id); the root is the WORST kept
  * entry, ordered by (score asc, id desc) so that eviction keeps the
  * deterministic winners (score desc, id asc).
  */
final class TopKBuffer(val k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  // a is worse than b => a should sit nearer the root
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  def insert(s: Double, id: Long): Unit = {
    if (n < k) {
      scores(n) = s; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (k > 0 && worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var worst = i
      if (l < n && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
      if (r < n && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
      if (worst == i) return
      swap(i, worst); i = worst
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  def sortedDesc: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    out.sortBy { case (s, i) => (-s, i) }
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + n * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(scores(i)); out.writeLong(ids(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object TopKBuffer {
  def fromBytes(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val k = in.readInt(); val n = in.readInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(in.readDouble(), in.readLong()); i += 1 }
    buf
  }
}

object TopKFunctions {
  /** Column API: `top_k(score, id, k)` aggregate. */
  def top_k(score: Column, id: Column, k: Int): Column =
    toColumn(TopKAggregate(toExpr(score), toExpr(id), k).toAggregateExpression())
}
