package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucketing as one codegen'd kernel.
  *
  * The HOF formulation it replaces — per plane, a `zip_with` of the
  * vector with `sequence(0, dim-1)` mapping through `xxhash64`, folded
  * by `aggregate` — is evaluated INTERPRETED, re-deriving the plane
  * components hash-by-hash for every (row, plane): the banded near-dup
  * join paid numTables × planesPerTable interpreted folds per row.
  * This expression computes every table's bucket in one pass with the
  * plane matrix CACHED per vector dimension, inside whole-stage
  * codegen.
  *
  * Plane components are BIT-IDENTICAL to the HOF form: h_p[d] =
  * xxhash64(p, d) / Long.MaxValue, where xxhash64 is Spark's
  * two-argument chain (seed 42, then fold) — so buckets, recalls, and
  * every dependent rows-only query are unchanged.
  */
object LshKernels {

  /** Spark `xxhash64(a, b)` over two INT columns: seed 42, fold left
    * with INT hashing — the HOF form hashed `lit(plane)` and the
    * `sequence(...)` index as ints, and int and long hash differently.
    */
  private def sparkXxHash64(a: Int, b: Int): Long = {
    val h1 = XxHash64Function.hash(a, IntegerType, 42L)
    XxHash64Function.hash(b, IntegerType, h1)
  }

  def planeComponent(plane: Int, d: Int): Double =
    sparkXxHash64(plane, d).toDouble / Long.MaxValue.toDouble

  /** One plane matrix per (firstPlane, numPlanes, dim), cached — the
    * matrix depends only on plane indices and the vector dimension.
    * Benign race: recomputation is idempotent.
    */
  final class PlaneCache(numPlanes: Int) extends Serializable {
    @volatile private var cached: (Int, Array[Array[Double]]) = (-1, null)
    def forDim(dim: Int): Array[Array[Double]] = {
      val c = cached
      if (c._1 == dim) return c._2
      val m = Array.tabulate(numPlanes, dim)((p, d) => planeComponent(p, d))
      cached = (dim, m)
      m
    }
  }

  /** Per-table sign-pattern buckets: table t uses planes
    * [t·b, (t+1)·b); bit j of its bucket is the sign of the dot with
    * plane t·b + j.
    */
  def buckets(
      vec: ArrayData,
      isFloat: Boolean,
      numTables: Int,
      planesPerTable: Int,
      cache: PlaneCache): ArrayData = {
    val dim = vec.numElements()
    val planes = cache.forDim(dim)
    val out = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0
      var j = 0
      while (j < planesPerTable) {
        val h = planes(t * planesPerTable + j)
        var dot = 0.0
        var d = 0
        while (d < dim) {
          val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
          dot += x * h(d)
          d += 1
        }
        if (dot >= 0) bucket |= (1 << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** lsh_buckets(vec) -> array<int>: one sign-pattern bucket per table. */
case class LshBuckets(
    child: Expression,
    numTables: Int,
    planesPerTable: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val cache =
    new LshKernels.PlaneCache(numTables * planesPerTable)

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"expected array<float|double>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    LshKernels.buckets(v.asInstanceOf[ArrayData], elemIsFloat, numTables, planesPerTable, cache)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cacheRef = ctx.addReferenceObj("planeCache", cache,
      "graft.functions.LshKernels.PlaneCache")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshKernels.buckets($c, $elemIsFloat, $numTables, $planesPerTable, $cacheRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LshFunctions {
  def lshBuckets(vec: Column, numTables: Int, planesPerTable: Int): Column =
    toColumn(LshBuckets(toExpr(vec), numTables, planesPerTable))
}
