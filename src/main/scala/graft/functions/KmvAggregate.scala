package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** KMV (k-minimum-values / theta) distinct-count sketch as a
  * single-pass aggregate: `kmv_distinct(hash64, k)` -> BIGINT estimate.
  *
  * The sketch keeps the k smallest DISTINCT 64-bit hash values in
  * UNSIGNED order — O(k) state per group, map-side combinable, and a
  * pure function of the input SET (insertion order never matters,
  * unlike GK-style quantile summaries), which is what makes the
  * estimate engine-reproducible: DuckDB re-derives it from first
  * principles with a rank-k window over the same xxhash64 chain.
  *
  * Estimator: with U_(k) = θ/2⁶⁴ the k-th smallest normalized hash,
  * E[distinct] ≈ (k−1)/U_(k), so the estimate is
  * ⌊(k−1)·2⁶⁴ / θ⌋ (exact integer arithmetic, BigInt on eval —
  * HUGEINT `//` on the oracle side); a sketch that never filled
  * (fewer than k distinct hashes seen) returns its exact fill count.
  * Standard error ≈ 1/√(k−2) — the spec bounds it against the exact
  * distinct count. Hash collisions (≈ n²/2⁶⁵) are part of the
  * contract on BOTH engines, so the comparison stays exact.
  */
case class KmvAggregate(
    hashExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, "kmv_distinct needs k >= 2")

  override def children: Seq[Expression] = Seq(hashExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hashExpr.eval(input)
    if (h != null) buf.insert(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = { buf.mergeFrom(other); buf }

  override def eval(buf: KmvBuffer): Any = buf.estimate

  override def serialize(buf: KmvBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(hashExpr = c(0))
}

/** Fixed-capacity max-heap on UNSIGNED hash order (root = largest
  * kept): insertion keeps the k smallest distinct values. Linear-scan
  * dedup is O(k) per insert — k is sketch-sized (tens to thousands),
  * and a value ≥ the root short-circuits before the scan.
  */
final class KmvBuffer(val k: Int) {
  private val hs = new Array[Long](k)
  private var n = 0

  // unsigned a > unsigned b
  @inline private def gtU(a: Long, b: Long): Boolean = java.lang.Long.compareUnsigned(a, b) > 0

  def insert(h: Long): Unit = {
    if (n == k && !gtU(hs(0), h)) return // not smaller than the worst kept: can't be new bottom-k
    var i = 0
    while (i < n) { if (hs(i) == h) return; i += 1 } // already kept
    if (n < k) {
      hs(n) = h; n += 1
      siftUp(n - 1)
    } else {
      hs(0) = h
      siftDown(0)
    }
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (gtU(hs(i), hs(p))) { val t = hs(i); hs(i) = hs(p); hs(p) = t; i = p }
      else return
    }
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var big = i
      if (l < n && gtU(hs(l), hs(big))) big = l
      if (r < n && gtU(hs(r), hs(big))) big = r
      if (big == i) return
      val t = hs(i); hs(i) = hs(big); hs(big) = t; i = big
    }
  }

  def mergeFrom(other: KmvBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.hs(i)); i += 1 }
  }

  /** ⌊(k−1)·2⁶⁴/θ⌋ when full, exact fill count otherwise. */
  def estimate: Long =
    if (n < k) n.toLong
    else {
      val thetaU = BigInt(java.lang.Long.toUnsignedString(hs(0)))
      (((BigInt(k - 1)) << 64) / thetaU).toLong
    }

  /** The kept hashes in UNSIGNED ascending order — the sketch's
    * serialized-state form (last element = θ when full). Mergeable by
    * construction: re-inserting two sketches' arrays into a fresh
    * buffer equals the sketch of the concatenated inputs.
    */
  def sortedUnsigned: Array[Long] = {
    val out = java.util.Arrays.copyOf(hs, n)
    val boxed = out.map(java.lang.Long.valueOf)
    java.util.Arrays.sort(boxed, (a: java.lang.Long, b: java.lang.Long) =>
      java.lang.Long.compareUnsigned(a, b))
    boxed.map(_.longValue())
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + n * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeInt(n)
    var i = 0
    while (i < n) { out.writeLong(hs(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object KmvBuffer {
  def fromBytes(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val k = in.readInt(); val n = in.readInt()
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.insert(in.readLong()); i += 1 }
    buf
  }
}

/** The same sketch evaluated to its STATE — the kept bottom-k hashes
  * in unsigned ascending order (`array<long>`) — instead of the
  * estimate. This is the persistable/mergeable form: an incremental
  * maintainer stores it per key, folds each batch's sketch in by
  * re-aggregating the exploded union (associative, like the top-k
  * heap), and derives the estimate at read time.
  */
case class KmvSketchAggregate(
    hashExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, "kmv_sketch needs k >= 2")

  override def children: Seq[Expression] = Seq(hashExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hashExpr.eval(input)
    if (h != null) buf.insert(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = { buf.mergeFrom(other); buf }

  override def eval(buf: KmvBuffer): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf.sortedUnsigned)

  override def serialize(buf: KmvBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(hashExpr = c(0))
}

object KmvFunctions {
  /** Column API: `kmv_distinct(hash64, k)` aggregate (BIGINT estimate). */
  def kmv_distinct(hash: Column, k: Int): Column =
    toColumn(KmvAggregate(toExpr(hash), k).toAggregateExpression())

  /** Column API: `kmv_sketch(hash64, k)` aggregate (sorted bottom-k state). */
  def kmv_sketch(hash: Column, k: Int): Column =
    toColumn(KmvSketchAggregate(toExpr(hash), k).toAggregateExpression())

  /** Estimate from a stored sketch array (unsigned-ascending bottom-k):
    * exact-integer mirror of [[KmvBuffer.estimate]] as a Column —
    * ⌊(k−1)·2⁶⁴/θ⌋ with θ the array's last (largest-unsigned) element,
    * or the fill count when the sketch never filled. Division is
    * IntegralDivide (`div`), never decimal `/` — the latter ROUNDS
    * (HALF_UP) where BigInt / HUGEINT truncate.
    */
  def kmv_estimate_from(sketch: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val theta = element_at(sketch, k)
    val thetaU = when(theta < 0,
      theta.cast("decimal(38,0)") + lit((BigInt(1) << 64).toString).cast("decimal(38,0)"))
      .otherwise(theta.cast("decimal(38,0)"))
    val num = lit((BigInt(k - 1) << 64).toString).cast("decimal(38,0)")
    val floorDiv = toColumn(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(toExpr(num), toExpr(thetaU)))
    when(size(sketch) < k, size(sketch).cast("long")).otherwise(floorDiv)
  }
}
