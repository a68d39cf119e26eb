package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** All `numHashes` MinHash permutation minima in ONE aggregate:
  * `minhash(shingleHash, n)` -> `array<long>` of length n.
  *
  * Why not n separate `min(hash(s, h))` aggregate expressions? The
  * generated HashAggregate code for 64 buffers × (partial, final) ×
  * join sides runs to megabytes of Java and costs tens of seconds of
  * Janino compilation before the first row moves. This single
  * imperative aggregate keeps a primitive long[n] buffer, updates all
  * n minima in a tight loop per row, and map-side-combines before the
  * shuffle — the scale behavior is identical (one buffer per group,
  * partial merge = elementwise min), without the codegen blowup.
  */
object MinHashMix {
  /** splitmix64-style mixer (public-domain finalizer constants):
    * permutation s of shingle hash h. Documented so specs can lock
    * exact signature values.
    */
  @inline def mix(h: Long, s: Int): Long = {
    var z = h + (s + 1) * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def updateAll(buf: Array[Long], h: Long): Unit = {
    var s = 0
    while (s < buf.length) {
      val v = mix(h, s)
      if (v < buf(s)) buf(s) = v
      s += 1
    }
  }
}

case class MinHashAggregate(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) MinHashMix.updateAll(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

object MinHashFunctions {
  /** Column API: `minhash(shingleHash, numHashes)` aggregate -> array<long>. */
  def minhash(shingleHash: Column, numHashes: Int): Column =
    toColumn(MinHashAggregate(toExpr(shingleHash), numHashes).toAggregateExpression())
}
