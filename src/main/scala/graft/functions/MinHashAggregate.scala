package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** All `numHashes` MinHash permutation minima in ONE aggregate:
  * `minhash(shingleHash, n)` -> `array<long>` of length n — for inputs
  * that arrive as (group, shingle-hash) ROWS (pre-exploded or
  * streaming shapes). When the shingle set is already an array column,
  * prefer the scalar `LshBandKeys`/`MinHashMix.signature` kernel below,
  * which needs no aggregation at all; `Dedup.minhashLshPairs` uses
  * that path. Both must agree — MinHashSpec asserts it.
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

  /** Full signature of one shingle-hash set (the per-doc kernel the
    * scalar expression and the aggregate must agree on).
    */
  def signature(hashes: Array[Long], numHashes: Int): Array[Long] = {
    val buf = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) { updateAll(buf, hashes(i)); i += 1 }
    buf
  }

  /** Banded LSH keys of one shingle-hash set: signature + per-band key
    * folding in ONE pass — per-doc scalar work, no shuffle required to
    * build signatures (a groupBy would shuffle every exploded shingle).
    */
  def bandKeys(arr: org.apache.spark.sql.catalyst.util.ArrayData, numHashes: Int, bands: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val rows = numHashes / bands
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val m = arr.numElements()
    var i = 0
    while (i < m) { updateAll(sig, arr.getLong(i)); i += 1 }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var k = mix(b.toLong, numHashes) // band-distinct seed
      var j = b * rows
      while (j < (b + 1) * rows) { k = mix(k ^ sig(j), j); j += 1 }
      keys(b) = k
      b += 1
    }
    new GenericArrayData(keys)
  }
}

/** `lsh_band_keys(shingleHashes, numHashes, bands)` -> array<long>
  * of length `bands`. Scalar (no aggregation): two docs are LSH
  * candidates iff they share key value at any band position.
  */
case class LshBandKeys(child: Expression, numHashes: Int, bands: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
    s"bands ($bands) must divide numHashes ($numHashes); bands>numHashes would " +
      "give every doc the same keys and degenerate the bucket join to O(n²)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    MinHashMix.bandKeys(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes, bands)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashMix.bandKeys($c, $numHashes, $bands)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
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

  /** Column API: `lsh_band_keys(shingleHashArray, numHashes, bands)`. */
  def lshBandKeys(shingleHashes: Column, numHashes: Int, bands: Int): Column =
    toColumn(LshBandKeys(toExpr(shingleHashes), numHashes, bands))
}
