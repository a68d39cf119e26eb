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

  /** dHash-style 64-bit perceptual hash over a binary payload — the
    * multimodal near-dup signature. Real dHash downsamples the image
    * to a 9×8 grayscale grid and emits one bit per horizontally
    * adjacent pixel pair; here the downsample runs on the byte signal
    * itself (this container ships no codecs): the payload is split
    * into an 8-row × 9-col grid of contiguous blocks (block b covers
    * [b·L/72, (b+1)·L/72)) and bit (r,c) = 1 iff mean(block r,c+1) >
    * mean(block r,c), compared EXACTLY by cross-multiplied integer
    * sums (block sizes differ by ±1 byte, so means must not round).
    * A real decoder plugs in by replacing block means with pixel
    * means — the banding, pair join and hamming verification above it
    * are unchanged. Locality is genuine: payloads differing in a few
    * bytes move a few block sums slightly, flipping few bits — unlike
    * a cryptographic hash, which is the point of a perceptual hash.
    * Empty blocks (payloads under 72 bytes) compare as mean 0.
    */
  def phash64(bytes: Array[Byte]): Long = {
    val L = bytes.length
    val sums = new Array[Long](72)
    val ns = new Array[Long](72)
    var b = 0
    while (b < 72) {
      val lo = (b.toLong * L / 72).toInt
      val hi = ((b + 1).toLong * L / 72).toInt
      var s = 0L
      var i = lo
      while (i < hi) { s += (bytes(i) & 0xff); i += 1 }
      sums(b) = s
      ns(b) = (hi - lo).toLong
      b += 1
    }
    var out = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val i0 = r * 9 + c
        if (sums(i0 + 1) * ns(i0) > sums(i0) * ns(i0 + 1)) out |= (1L << (r * 8 + c))
        c += 1
      }
      r += 1
    }
    out
  }

  /** murmur3_x86_32 (public domain, Austin Appleby) over `bytes`
    * with seed 0 — the exact hash Iceberg's bucket partition
    * transform requires (iceberg.apache.org spec, Appendix B):
    * 4-byte little-endian blocks, standard tail, standard final mix.
    * Verified against the spec's published vectors in
    * IcebergTransformsSpec.
    */
  def murmur3x86(bytes: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = 0
    val n4 = bytes.length & ~3
    var i = 0
    while (i < n4) {
      var k = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    val tail = bytes.length & 3
    if (tail >= 3) k ^= (bytes(n4 + 2) & 0xff) << 16
    if (tail >= 2) k ^= (bytes(n4 + 1) & 0xff) << 8
    if (tail >= 1) {
      k ^= bytes(n4) & 0xff
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k
    }
    h ^= bytes.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
    h
  }

  /** Iceberg bucket hash of an int/long/date/timestamp value: the
    * spec widens ints and dates to longs and hashes the 8-byte
    * LITTLE-ENDIAN form (so int 34 and long 34 bucket identically).
    */
  def icebergHashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3x86(b)
  }

  /** Iceberg bucket hash of string (UTF-8) / binary payloads. */
  def icebergHashBytes(bytes: Array[Byte]): Int = murmur3x86(bytes)

  /** Content-defined chunking (CDC) of a binary payload — the
    * storage-dedup primitive (restic/borg/LBFS family): a chunk
    * boundary falls after byte i wherever the FNV-1a64 of the last
    * `w` bytes ≡ 0 (mod `div`), so boundaries are decided by CONTENT,
    * not offsets — bytes inserted or appended at one end shift no
    * boundary elsewhere, and every untouched chunk keeps its hash
    * (the property fixed-size blocking lacks). Each boundary decision
    * reads only its own w-byte window, so decisions are position-
    * independent and any engine re-derives the exact chunk set —
    * deliberately NO min/max chunk clamp, which would make boundary
    * eligibility depend on the previous boundary (sequential state an
    * oracle cannot replay position-independently). Expected chunk
    * length ≈ div bytes. Returns one struct per chunk:
    * (hash = FNV-1a64 of the chunk bytes, len). Payloads shorter than
    * w (or empty) are one chunk (empty payload: zero chunks).
    * Cost O(n·w) per payload with w small (the windowed recompute is
    * the price of position-independence; a rolling Gear hash saves
    * the ×w at the cost of oracle-hostile carry state).
    */
  def cdcChunks(bytes: Array[Byte], w: Int, div: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = bytes.length
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    def emit(lo: Int, hi: Int): Unit = {
      var h = Offset
      var i = lo
      while (i < hi) { h ^= (bytes(i) & 0xffL); h *= Prime; i += 1 }
      rows += org.apache.spark.sql.catalyst.InternalRow(h, hi - lo)
    }
    var start = 0
    var i = w // candidate end position (exclusive); final chunk always ends at n
    while (i < n) {
      var h = Offset
      var j = i - w
      while (j < i) { h ^= (bytes(j) & 0xffL); h *= Prime; j += 1 }
      // floorMod: JVM % is sign-preserving, the hash is full-range
      if (java.lang.Math.floorMod(h, div.toLong) == 0L) { emit(start, i); start = i }
      i += 1
    }
    if (start < n) emit(start, n)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.toArray)
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

/** phash64(binary) -> long — perceptual dHash over the payload. */
case class PHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    GraftHash.phash64(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.phash64($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** cdc_chunks(binary, w, div) -> array<struct<hash:long, len:int>> —
  * content-defined chunk hashes of the payload. */
case class CdcChunks(child: Expression, w: Int, div: Int) extends UnaryExpression {
  require(w > 0 && div > 0, "cdc_chunks: w/div must be positive")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("hash", LongType, nullable = false),
      StructField("len", IntegerType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any =
    GraftHash.cdcChunks(v.asInstanceOf[Array[Byte]], w, div)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.cdcChunks($c, $w, $div)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** iceberg_hash32(value) -> int — the Iceberg bucket-transform hash
  * (murmur3_x86_32 of the spec's single-value serialization): ints
  * and dates widen to 8-byte LE longs, timestamps hash their
  * microseconds, strings their UTF-8 bytes, binary verbatim. The
  * bucket itself is `(hash & Int.MaxValue) % N` composed outside.
  */
case class IcebergHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | DateType | TimestampType | TimestampNTZType |
          StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"iceberg_hash32 supports int/long/date/timestamp/string/binary, got $other")
    }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType | DateType => GraftHash.icebergHashLong(v.asInstanceOf[Int].toLong)
    case LongType | TimestampType | TimestampNTZType =>
      GraftHash.icebergHashLong(v.asInstanceOf[Long])
    case StringType => GraftHash.icebergHashBytes(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType => GraftHash.icebergHashBytes(v.asInstanceOf[Array[Byte]])
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case IntegerType | DateType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.icebergHashLong((long) $c)")
      case LongType | TimestampType | TimestampNTZType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.icebergHashLong($c)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.icebergHashBytes($c.getBytes())")
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.icebergHashBytes($c)")
      case other => throw new IllegalStateException(s"unreachable: $other")
    }

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
  def phash64(payload: Column): Column = toColumn(PHash64(toExpr(payload)))
  def cdcChunks(payload: Column, w: Int, div: Int): Column =
    toColumn(CdcChunks(toExpr(payload), w, div))
  def hashedShingles(words: Column, n: Int): Column = toColumn(HashedShingles(toExpr(words), n))
  def icebergHash32(c: Column): Column = toColumn(IcebergHash32(toExpr(c)))

  /** Iceberg bucket partition value: `(hash & Int.MaxValue) % n`. */
  def icebergBucket(c: Column, n: Int): Column = {
    import org.apache.spark.sql.functions.lit
    (icebergHash32(c).bitwiseAND(lit(Integer.MAX_VALUE)) % lit(n)).cast(IntegerType)
  }
}
