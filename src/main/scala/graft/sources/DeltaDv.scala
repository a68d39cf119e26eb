package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.roaringbitmap.RoaringBitmap

/** Codec for Delta Lake DELETION VECTORS, implemented from the PUBLIC
  * protocol (delta.io PROTOCOL.md, "Deletion Vectors" + "Deletion
  * Vector Descriptor Schema" + "Deletion Vector File Storage Format"):
  *
  *  - a descriptor on an `add` action locates the vector:
  *    `storageType` `u` (UUID-named sidecar `deletion_vector_<uuid>.bin`
  *    relative to the table, the UUID Z85-encoded in `pathOrInlineDv`
  *    behind an optional random prefix), `i` (the serialized bitmap
  *    itself Z85-encoded inline), or `p` (absolute path);
  *  - the serialized form is the 64-bit RoaringBitmapArray "portable"
  *    format: magic 1681511377 (4B LE), bitmap count (8B LE), then per
  *    bitmap its high-32-bit key (4B LE) + a standard 32-bit
  *    RoaringBitmap (RoaringFormatSpec portable, LE) of the low bits;
  *  - the sidecar FILE is: 1 format-version byte, then each vector at
  *    its descriptor `offset` as [dataSize 4B BIG-endian][data =
  *    magic+bitmaps, `sizeInBytes` bytes][CRC-32 of data, 4B
  *    big-endian].
  *
  * Both directions are implemented — [[positionsOf]] for the reader
  * ([[DeltaTableReader]] subtracts the positions with the
  * [[DeletionVectors]]-style anti join), and the encode/write half so
  * tests can hand-build REAL DV tables the way the other external
  * fixtures hand-build commit logs. The 32-bit bitmaps ride
  * org.roaringbitmap (on Spark's own classpath — Spark uses it for
  * shuffle tracking), whose serialize/deserialize IS the
  * RoaringFormatSpec portable format the protocol names.
  */
object DeltaDv {

  /** Java-serializable Hadoop Configuration carrier, so executors can
    * open sidecar files through the session's filesystems (creds,
    * schemes) — the standard broadcast-the-conf pattern.
    */
  final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  /** Deletion-vector descriptor as carried on an `add` action. */
  final case class Descriptor(
      storageType: String,
      pathOrInlineDv: String,
      offset: Long,
      sizeInBytes: Int,
      cardinality: Long)

  // ----------------------------------------------------------------
  // Z85 (ZeroMQ base-85, rfc.zeromq.org/spec/32) — the alphabet Delta's
  // codec uses for UUIDs and inline vectors.
  // ----------------------------------------------------------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val t = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => t(c.toInt) = i }
    t
  }

  /** Encode to Z85; input is zero-padded to a 4-byte multiple (the
    * decoder trims by the known payload length, as Delta's does).
    */
  def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ Array.fill[Byte](4 - bytes.length % 4)(0)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (padded(i + j) & 0xffL); j += 1 }
      val out = new Array[Char](5)
      var k = 4
      while (k >= 0) { out(k) = Z85Alphabet((v % 85).toInt); v /= 85; k -= 1 }
      sb.appendAll(out)
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 input length must be a multiple of 5, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j).toInt
        val d = if (c < 128) Z85Decode(c) else -1
        require(d >= 0, s"invalid Z85 character '${s.charAt(i + j)}'")
        v = v * 85 + d
        j += 1
      }
      var k = 3
      var b = v
      while (k >= 0) { out(i / 5 * 4 + k) = (b & 0xff).toByte; b >>= 8; k -= 1 }
      i += 5
    }
    out
  }

  // ----------------------------------------------------------------
  // RoaringBitmapArray portable serialization (the 64-bit extension).
  // ----------------------------------------------------------------

  /** Portable-format magic number (4 bytes little-endian). */
  val PortableMagic: Int = 1681511377

  /** Deserialize `data` (magic + bitmaps) into sorted 64-bit row
    * positions. Refuses loudly on a non-portable magic rather than
    * guessing at the native format.
    */
  def deserializePositions(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == PortableMagic,
      s"deletion vector bitmap magic $magic is not the portable format ($PortableMagic)")
    val nBitmaps = buf.getLong
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue, s"corrupt bitmap count $nBitmaps")
    val out = Array.newBuilder[Long]
    var i = 0L
    while (i < nBitmaps) {
      val key = buf.getInt.toLong
      val rb = new RoaringBitmap()
      rb.deserialize(buf)
      // deserialize(ByteBuffer) reads but does not advance the buffer
      buf.position(buf.position() + rb.serializedSizeInBytes())
      val it = rb.getIntIterator
      while (it.hasNext) out += (key << 32) | (it.next().toLong & 0xffffffffL)
      i += 1
    }
    out.result()
  }

  /** Serialize 64-bit positions into the portable magic+bitmaps form. */
  def serializePositions(positions: Seq[Long]): Array[Byte] = {
    val byKey = positions.groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
    val bitmaps = byKey.map { case (key, ps) =>
      val rb = new RoaringBitmap()
      ps.foreach(p => rb.add((p & 0xffffffffL).toInt))
      rb.runOptimize()
      (key, rb)
    }
    val size = 4 + 8 + bitmaps.map(b => 4 + b._2.serializedSizeInBytes()).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(PortableMagic)
    buf.putLong(bitmaps.size.toLong)
    bitmaps.foreach { case (key, rb) =>
      buf.putInt(key)
      rb.serialize(buf)
    }
    buf.array()
  }

  // ----------------------------------------------------------------
  // Sidecar file I/O.
  // ----------------------------------------------------------------

  /** Resolve a descriptor to its sidecar path, if it has one. `u`
    * decodes the Z85 UUID (last 20 chars; anything before is the
    * writer's random prefix directory) into
    * `<table>/<prefix>/deletion_vector_<uuid>.bin`; `p` is absolute;
    * `i` is inline and has no file.
    */
  def sidecarPath(tablePath: String, d: Descriptor): Option[String] = d.storageType match {
    case "p" => Some(d.pathOrInlineDv)
    case "u" =>
      val enc = d.pathOrInlineDv
      require(enc.length >= 20, s"UUID deletion-vector path '$enc' shorter than a Z85 UUID")
      val (prefix, z) = enc.splitAt(enc.length - 20)
      val raw = z85Decode(z)
      val bb = ByteBuffer.wrap(raw)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val name = s"deletion_vector_$uuid.bin"
      Some(if (prefix.isEmpty) s"$tablePath/$name" else s"$tablePath/$prefix/$name")
    case "i" => None
    case other => throw new IllegalStateException(
      s"unknown deletion-vector storageType '$other'")
  }

  /** Read one vector's data bytes (magic+bitmaps) from its sidecar:
    * seek `offset`, check the big-endian size prefix against the
    * descriptor, verify the trailing CRC-32.
    */
  def readSidecar(conf: Configuration, path: String, offset: Long, sizeInBytes: Int): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      in.seek(offset)
      val head = new Array[Byte](4)
      in.readFully(head)
      val declared = ByteBuffer.wrap(head).order(ByteOrder.BIG_ENDIAN).getInt
      require(declared == sizeInBytes,
        s"$path@$offset: size prefix $declared != descriptor sizeInBytes $sizeInBytes")
      val data = new Array[Byte](sizeInBytes)
      in.readFully(data)
      val crcBytes = new Array[Byte](4)
      in.readFully(crcBytes)
      val expected = ByteBuffer.wrap(crcBytes).order(ByteOrder.BIG_ENDIAN).getInt
      val crc = new CRC32(); crc.update(data)
      require(crc.getValue.toInt == expected, s"$path@$offset: deletion-vector CRC mismatch")
      data
    } finally in.close()
  }

  /** Decode a descriptor into its deleted row positions. Inline
    * vectors decode from the descriptor itself (they are small by
    * construction); sidecars read through the Hadoop FS, so this runs
    * on executors with a broadcast [[Configuration]] as well as on
    * the driver.
    */
  def positionsOf(conf: Configuration, tablePath: String, d: Descriptor): Array[Long] =
    d.storageType match {
      case "i" => deserializePositions(z85Decode(d.pathOrInlineDv).take(d.sizeInBytes))
      case _ =>
        val path = sidecarPath(tablePath, d).get
        deserializePositions(readSidecar(conf, path, d.offset, d.sizeInBytes))
    }

  // ----------------------------------------------------------------
  // Write half — REAL on-disk vectors for fixtures and tests.
  // ----------------------------------------------------------------

  /** Write one sidecar holding `vectors` (each a position set) under
    * `tablePath`, returning the descriptor for each vector in order.
    */
  def writeSidecar(conf: Configuration, tablePath: String,
      vectors: Seq[Seq[Long]]): Seq[Descriptor] = {
    val uuid = java.util.UUID.randomUUID()
    val name = s"deletion_vector_$uuid.bin"
    val p = new Path(tablePath, name)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    val descriptors = Seq.newBuilder[Descriptor]
    try {
      out.write(1) // format version
      var offset = 1L
      vectors.foreach { ps =>
        val data = serializePositions(ps)
        val crc = new CRC32(); crc.update(data)
        out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(data.length).array())
        out.write(data)
        out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
          .putInt(crc.getValue.toInt).array())
        val bb = ByteBuffer.allocate(16)
        bb.putLong(uuid.getMostSignificantBits); bb.putLong(uuid.getLeastSignificantBits)
        descriptors += Descriptor("u", z85Encode(bb.array()), offset, data.length, ps.size.toLong)
        offset += 4L + data.length + 4L
      }
    } finally out.close()
    descriptors.result()
  }

  /** Build an inline descriptor for `positions`. */
  def inlineDescriptor(positions: Seq[Long]): Descriptor = {
    val data = serializePositions(positions)
    Descriptor("i", z85Encode(data), offset = 0L, sizeInBytes = data.length,
      cardinality = positions.size.toLong)
  }

  /** Descriptor as the JSON object literal an `add` action carries. */
  def descriptorJson(d: Descriptor): String =
    s"""{"storageType":"${d.storageType}","pathOrInlineDv":"${d.pathOrInlineDv}",""" +
      s""""offset":${d.offset},"sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""
}
