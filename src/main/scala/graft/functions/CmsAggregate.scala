package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer

/** Count-Min sketch: a mergeable frequency summary of CONSTANT size
  * (depth × width longs) with one-sided error — estimates never
  * undercount, and overcount is bounded by collisions per row, taken
  * down by the min across `depth` independent rows (Cormode &
  * Muthukrishnan 2005). Next to the Misra-Gries candidate sketch
  * ([[FreqSketchAggregate]]) this is the POINT-QUERY summary: any
  * term's count can be estimated after the fact, not just the heavy
  * hitters' — the shape a distributed token-frequency monitor wants.
  *
  * Deterministic by construction: row r's bucket for term t is
  * fnv1a64(utf8(t) ++ 0x01 ++ ascii(r)) mod width, unsigned — no
  * RNG, no platform hash — so the whole sketch (and every estimate
  * read from it) is reproducible on ANY engine, and the driver's
  * DuckDB gate re-derives it bit-for-bit.
  *
  * Same codegen discipline as [[MinHashAggregate]]: ONE imperative
  * aggregate with a primitive long[depth·width] buffer updated in a
  * tight loop, map-side-combined (merge = elementwise add) before
  * the shuffle — never depth×width expression aggregates.
  */
object CmsSketch {
  /** Row r's bucket of a term — the single hash both the update and
    * the estimate paths must share. Salt = 0x01 separator + ASCII
    * digit of r (r <= 9 keeps the salt one byte, depth beyond 10
    * rows buys nothing — 4-5 is the standard operating point).
    */
  def bucket(term: UTF8String, row: Int, width: Int): Int = {
    val bytes = term.getBytes
    val salted = java.util.Arrays.copyOf(bytes, bytes.length + 2)
    salted(bytes.length) = 0x01.toByte
    salted(bytes.length + 1) = ('0' + row).toByte
    java.lang.Long.remainderUnsigned(GraftHash.fnv1a64(salted), width.toLong).toInt
  }
}

/** `cms_bucket(term, row, width)` -> int: the estimate path's bucket
  * lookup, codegen'd so probing stays inside whole-stage codegen.
  */
case class CmsBucket(child: Expression, row: Int, width: Int)
  extends UnaryExpression {
  require(row >= 0 && row <= 9, "row must be in [0, 9]")
  require(width > 0, "width must be positive")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    CmsSketch.bucket(v.asInstanceOf[UTF8String], row, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CmsSketch.bucket($c, $row, $width)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `cms_sketch(term, depth, width)` aggregate -> array<long> of
  * length depth·width (row-major). Estimate of t =
  * min over r of sketch[r·width + bucket(t, r)].
  */
case class CmsAggregate(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(depth >= 1 && depth <= 10, "depth must be in [1, 10]")
  require(width > 0, "width must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String]
      var r = 0
      while (r < depth) {
        buf(r * width + CmsSketch.bucket(term, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(o: Int): CmsAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

object CmsFunctions {
  /** Column API: `cmsSketch(term, depth, width)` aggregate -> array<long>. */
  def cmsSketch(term: Column, depth: Int, width: Int): Column =
    toColumn(CmsAggregate(toExpr(term), depth, width).toAggregateExpression())

  /** Column API: row r's bucket of a term. */
  def cmsBucket(term: Column, row: Int, width: Int): Column =
    toColumn(CmsBucket(toExpr(term), row, width))

  /** Point estimate of `term` against a sketch array column:
    * least over rows of the probed cells (1-based element_at).
    */
  def cmsEstimate(sketch: Column, term: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions.{element_at, least, lit}
    val probes = (0 until depth).map(r =>
      element_at(sketch, cmsBucket(term, r, width) + lit(r * width) + lit(1)))
    if (probes.size == 1) probes.head else least(probes: _*)
  }

  /** AGMS/CMS join-size estimate from two sketches built over the two
    * sides' join keys (same depth/width/salts): min over rows of
    * the row-wise inner product Σ_w A[r,w]·B[r,w]. Never
    * under-counts the true join size Σ_v fA(v)·fB(v) — collision
    * mass is non-negative — and over-counts by ≤ (e/width)·|A|·|B|
    * per the CMS bound; the planner consults it before picking a
    * join strategy. Products and the sum run in DECIMAL(38,0): two
    * billion-row sides put single cells near 2³¹ and cell products
    * past a long. Returns DECIMAL(38,0); cast down caller-side.
    */
  def cmsInnerProduct(skA: Column, skB: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions.{aggregate, least, lit, slice, zip_with}
    val rows = (0 until depth).map { r =>
      aggregate(
        zip_with(slice(skA, r * width + 1, width), slice(skB, r * width + 1, width),
          (x, y) => x.cast("decimal(38,0)") * y.cast("decimal(38,0)")),
        lit(0L).cast("decimal(38,0)"), (acc, v) => acc + v)
    }
    if (rows.size == 1) rows.head else least(rows: _*)
  }
}
