package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Morton/Z-order bit interleaving. */
object ZOrderUtil {
  /** MSB-first round-robin interleave of `bitsPer` bits from each
    * value: result bit stream = v0[msb], v1[msb], ..., v0[msb-1], ...
    * Locality property: close z-values are close in EVERY dimension.
    */
  def interleave(vals: Array[Int], bitsPer: Int): Long = {
    var z = 0L
    var b = bitsPer - 1
    while (b >= 0) {
      var c = 0
      while (c < vals.length) {
        z = (z << 1) | ((vals(c) >> b) & 1)
        c += 1
      }
      b -= 1
    }
    z
  }
}

/** `interleave_bits(i0, i1, ...)` -> long: Morton code of up to 8
  * int inputs (each contributes floor(64 / n) bits, MSB-first). NULL
  * inputs contribute 0 — callers normalize/clamp upstream. Codegen'd:
  * a static call on materialized child values, no boxing.
  */
case class InterleaveBits(children: Seq[Expression]) extends Expression {
  require(children.nonEmpty && children.size <= 8, "interleave_bits takes 1..8 columns")

  // analysis-time type check — without it a non-int child fails LATE:
  // ClassCastException in eval or a Janino compile error in generated
  // code. (ExpectsInputTypes isn't usable outside org.apache.spark.sql
  // — AbstractDataType is private[sql] — so check explicitly.)
  override def checkInputDataTypes(): TypeCheckResult =
    children.zipWithIndex.find(_._1.dataType != IntegerType) match {
      case None => TypeCheckResult.TypeCheckSuccess
      case Some((c, i)) => TypeCheckResult.TypeCheckFailure(
        s"interleave_bits requires INT arguments, but argument ${i + 1} is ${c.dataType.catalogString}")
    }

  // capped at 31: inputs are ints (31 value bits), and an int shift
  // by >= 32 is mod-32 in JVM semantics — bitsPer 64 for a single
  // column would silently read garbage bits
  val bitsPer: Int = math.min(64 / children.size, 31)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Int](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      vals(i) = if (v == null) 0 else clamp(v.asInstanceOf[Int])
      i += 1
    }
    ZOrderUtil.interleave(vals, bitsPer)
  }

  private def clamp(v: Int): Int = {
    val maxV = if (bitsPer >= 31) Int.MaxValue else (1 << bitsPer) - 1
    if (v < 0) 0 else if (v > maxV) maxV else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val maxV = if (bitsPer >= 31) Int.MaxValue else (1 << bitsPer) - 1
    // ctx.freshName for the per-child temporaries: a fixed `v$i` would
    // collide when two InterleaveBits land in one generated function
    // (duplicate local → Janino error → whole-stage-codegen fallback)
    val fill = evals.zipWithIndex.map { case (e, i) =>
      val v = ctx.freshName(s"zv$i")
      s"""${e.code}
         |int $v = ${e.isNull} ? 0 : ${e.value};
         |$arr[$i] = $v < 0 ? 0 : ($v > $maxV ? $maxV : $v);""".stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        |int[] $arr = new int[${children.size}];
        |$fill
        |long ${ev.value} = graft.functions.ZOrderUtil.interleave($arr, $bitsPer);""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(children = c)
}

object ZOrderFunctions {
  /** Column API: Morton code of pre-scaled int columns. */
  def interleaveBits(cols: Seq[Column]): Column =
    toColumn(InterleaveBits(cols.map(toExpr)))
}
