package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Coarse-quantizer kernels for IVF / PQ as native expressions whose
  * codebooks travel as PLAN REFERENCE OBJECTS, not inlined literals.
  *
  * The first implementation expanded one struct expression per
  * centroid (`array_min(array(struct(d_0,0), struct(d_1,1), …))`),
  * which generates O(nlist · dim) Java source — Janino dies around
  * nlist = 64 on 64-dim vectors (measured: InternalCompilerException
  * at ~6.5k generated lines), and a REAL index wants nlist in the
  * thousands and ksub = 256. These expressions keep the generated
  * code CONSTANT-SIZE: the matrix lives in the plan as a reference
  * object and the argmin loop runs in a shared JVM kernel, still
  * inside whole-stage codegen.
  *
  * Arithmetic is bit-identical to the struct form it replaces:
  * d_i = ‖c_i‖² (double, from the trained doubles) − 2·(v·c_i_float)
  * with strictly sequential accumulation, ties to the lowest index.
  */
object CentroidKernels {

  /** Indices of the `nprobe` nearest centroids, ascending by (d, i). */
  def nearestCells(
      vec: ArrayData,
      isFloat: Boolean,
      cents: Array[Array[Float]],
      norms: Array[Double],
      nprobe: Int): ArrayData = {
    val k = cents.length
    val d = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cf = cents(c)
      var dot = 0.0
      var i = 0
      val n = math.min(if (isFloat) vec.numElements() else vec.numElements(), cf.length)
      while (i < n) {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        dot += x * cf(i).toDouble
        i += 1
      }
      d(c) = norms(c) - 2.0 * dot
      c += 1
    }
    val m = math.min(nprobe, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var p = 0
    while (p < m) {
      var best = -1
      var bestD = Double.MaxValue
      var c2 = 0
      while (c2 < k) {
        if (!taken(c2) && (best == -1 || d(c2) < bestD)) { best = c2; bestD = d(c2) }
        c2 += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  /** PQ codes: per subspace j, the index of the nearest codebook
    * centroid of the dsub-wide slice starting at j·dsub.
    */
  def pqEncode(
      vec: ArrayData,
      isFloat: Boolean,
      codebooks: Array[Array[Array[Float]]],
      norms: Array[Array[Double]],
      dsub: Int): ArrayData = {
    val m = codebooks.length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val nm = norms(j)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cf = cb(c)
        var dot = 0.0
        var i = 0
        while (i < dsub) {
          val x = if (isFloat) vec.getFloat(j * dsub + i).toDouble
                  else vec.getDouble(j * dsub + i)
          dot += x * cf(i).toDouble
          i += 1
        }
        val d = nm(c) - 2.0 * dot
        if (d < bestD) { bestD = d; best = c } // strict <: ties keep the lowest code
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** nearest_cells(vec) -> array<int>: the nprobe nearest centroid ids. */
case class NearestCells(
    child: Expression,
    centroids: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val centsF: Array[Array[Float]] = centroids.map(_.map(_.toFloat))
  private lazy val norms: Array[Double] = centroids.map(_.map(x => x * x).sum)

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"expected array<float|double>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    CentroidKernels.nearestCells(v.asInstanceOf[ArrayData], elemIsFloat, centsF, norms, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", centsF, "float[][]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CentroidKernels.nearestCells($c, $elemIsFloat, $centsRef, $normsRef, $nprobe)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** pq_encode(vec) -> array<int>: one code per subspace. */
case class PqEncode(
    child: Expression,
    codebooks: Array[Array[Array[Double]]],
    dsub: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val cbF: Array[Array[Array[Float]]] = codebooks.map(_.map(_.map(_.toFloat)))
  private lazy val norms: Array[Array[Double]] = codebooks.map(_.map(_.map(x => x * x).sum))

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"expected array<float|double>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    CentroidKernels.pqEncode(v.asInstanceOf[ArrayData], elemIsFloat, cbF, norms, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", cbF, "float[][][]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CentroidKernels.pqEncode($c, $elemIsFloat, $cbRef, $normsRef, $dsub)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CentroidFunctions {
  def nearestCells(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    toColumn(NearestCells(toExpr(vec), centroids, nprobe))
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]], dsub: Int): Column =
    toColumn(PqEncode(toExpr(vec), codebooks, dsub))
}
