package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-hashing kernels as codegen'd Catalyst expressions:
  * a 64-bit polynomial rolling hash (document fingerprinting) and a
  * 64-bit SimHash over a token array (near-dup detection).
  */

object GraftHash {
  /** FNV-1a-style 64-bit polynomial hash over UTF-8 bytes, base 31 —
    * stable across JVMs, documented so specs can assert exact values. */
  final val Prime = 1099511628211L
  final val Offset = -3750763034362895579L // 14695981039346656037 as signed

  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= Prime; i += 1 }
    h
  }

  /** Distinct hashed word n-grams of a token array, sorted ascending:
    * per-word FNV hash once, then an order-sensitive mix-chain over
    * each n-window — no shingle strings are ever materialized (the
    * equivalent `transform(sequence, slice+concat_ws+xxhash64)` HOF
    * chain is interpreted and allocates a slice array plus a joined
    * string per shingle). Sorted+distinct so set semantics are
    * explicit and downstream intersects see ordered input.
    */
  def hashedShingles(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    if (m < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    val wh = new Array[Long](m)
    var i = 0
    while (i < m) {
      wh(i) = if (words.isNullAt(i)) 0L else fnv1a64(words.getUTF8String(i).getBytes)
      i += 1
    }
    val k = m - n + 1
    val vals = new Array[Long](k)
    var p = 0
    while (p < k) {
      var h = Offset
      var j = p
      while (j < p + n) { h = MinHashMix.mix(h ^ wh(j), n); j += 1 }
      vals(p) = h
      p += 1
    }
    java.util.Arrays.sort(vals)
    var uniq = 1
    var q = 1
    while (q < k) { if (vals(q) != vals(q - 1)) { vals(uniq) = vals(q); uniq += 1 }; q += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(java.util.Arrays.copyOf(vals, uniq))
  }

  /** SimHash64: per-token FNV hash; each of 64 bit positions votes
    * +1/-1 per token; sign of the tally becomes the output bit. */
  def simhash64(tokens: Iterator[Array[Byte]]): Long = {
    val tally = new Array[Int](64)
    while (tokens.hasNext) {
      val h = fnv1a64(tokens.next())
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (tally(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** fingerprint64(string) -> long */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    GraftHash.fnv1a64(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.fnv1a64($c.getBytes())")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** simhash64(array<string>) -> long */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val it = (0 until arr.numElements()).iterator
      .filterNot(arr.isNullAt)
      .map(i => arr.getUTF8String(i).getBytes)
    GraftHash.simhash64(it)
  }

  // Tally loop doesn't gain from inlining; call the shared kernel.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val tally = ctx.freshName("tally")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      s"""
         |int[] $tally = new int[64];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if ($arr.isNullAt($i)) continue;
         |  long $h = graft.functions.GraftHash.fnv1a64($arr.getUTF8String($i).getBytes());
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $tally[$b]++; else $tally[$b]--;
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($tally[$b] > 0) ${ev.value} |= (1L << $b);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** hashed_shingles(array<string>, n) -> sorted distinct array<long> */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    GraftHash.hashedShingles(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.hashedShingles($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashFunctions {
  def fingerprint64(c: Column): Column = toColumn(Fingerprint64(toExpr(c)))
  def simhash64(tokens: Column): Column = toColumn(SimHash64(toExpr(tokens)))
  def hashedShingles(words: Column, n: Int): Column = toColumn(HashedShingles(toExpr(words), n))
}
