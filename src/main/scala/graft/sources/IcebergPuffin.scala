package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** The Puffin file format (iceberg.apache.org/puffin-spec) — the
  * container Iceberg v3 DELETION VECTORS live in. Layout:
  * `Magic | Blob… | Magic | FooterPayload(JSON) | payloadSize(LE4) |
  * flags(4) | Magic`. A `deletion-vector-v1` blob is BYTE-IDENTICAL
  * to one Delta sidecar entry — `len(BE4) | magic+bitmap | crc(BE4)`
  * over the 64-bit portable RoaringBitmap serialization — which the
  * spec chose deliberately so one physical vector serves both
  * formats; graft reuses its [[DeltaDv]] codec for exactly that
  * reason. Footer-payload compression is never written and refused
  * on read (the flag bit is honored, not ignored).
  */
object IcebergPuffin {

  private[sources] val Magic = Array[Byte]('P', 'F', 'A', '1')

  /** One deletion vector to publish: the data file it masks, the
    * PRE-SERIALIZED portable bitmap (magic+bitmaps — built on
    * executors; the driver never holds raw position sets), its
    * cardinality, and the snapshot/sequence the commit assigns.
    */
  final case class DvBlob(referencedDataFile: String, dvData: Array[Byte],
      cardinality: Long, snapshotId: Long, sequenceNumber: Long)

  object DvBlob {
    /** Convenience for fixtures/specs: serialize positions inline. */
    def ofPositions(referencedDataFile: String, positions: Seq[Long],
        snapshotId: Long, sequenceNumber: Long): DvBlob =
      DvBlob(referencedDataFile, DeltaDv.serializePositions(positions),
        positions.length.toLong, snapshotId, sequenceNumber)
  }

  /** A written blob's location inside the puffin file — what the
    * manifest entry records as content_offset/content_size_in_bytes.
    */
  final case class BlobRef(referencedDataFile: String, offset: Long, length: Long,
      cardinality: Long)

  private def jq(x: String) =
    "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Write one puffin file holding one DV blob per entry of `blobs`;
    * returns each blob's ref in input order. The footer's
    * FileMetadata JSON carries the spec's required DV properties
    * (`referenced-data-file`, `cardinality`).
    */
  def writeFile(conf: Configuration, path: Path, blobs: Seq[DvBlob]): Seq[BlobRef] = {
    require(blobs.nonEmpty, s"$path: a puffin file needs at least one blob")
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, false)
    val refs = Seq.newBuilder[BlobRef]
    val metaEntries = Seq.newBuilder[String]
    try {
      out.write(Magic)
      var pos = 4L
      blobs.foreach { b =>
        val data = b.dvData
        val crc = new CRC32(); crc.update(data)
        val buf = ByteBuffer.allocate(4 + data.length + 4).order(ByteOrder.BIG_ENDIAN)
        buf.putInt(data.length)
        buf.put(data)
        buf.putInt(crc.getValue.toInt)
        out.write(buf.array())
        val len = (4 + data.length + 4).toLong
        refs += BlobRef(b.referencedDataFile, pos, len, b.cardinality)
        metaEntries +=
          s"""{"type":"deletion-vector-v1","fields":[],""" +
            s""""snapshot-id":${b.snapshotId},"sequence-number":${b.sequenceNumber},""" +
            s""""offset":$pos,"length":$len,"properties":{""" +
            s""""referenced-data-file":${jq(b.referencedDataFile)},""" +
            s""""cardinality":"${b.cardinality}"}}"""
        pos += len
      }
      val payload = (s"""{"blobs":[${metaEntries.result().mkString(",")}],""" +
        s""""properties":{"created-by":"graft"}}""").getBytes("UTF-8")
      out.write(Magic) // footer start
      out.write(payload)
      val tail = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payload.length)
      tail.putInt(0) // flags: footer payload NOT compressed
      tail.put(Magic)
      out.write(tail.array())
    } finally out.close()
    refs.result()
  }

  /** Decode one DV blob at (`offset`, `length`) into its deleted
    * positions. The framing and bitmap are Delta's sidecar-entry
    * layout verbatim, so the [[DeltaDv]] reader applies: size-prefix
    * check, CRC-32 verification, portable-magic refusal included.
    */
  def readDvPositions(conf: Configuration, path: String,
      offset: Long, length: Long): Array[Long] = {
    require(length > 8 && length <= Int.MaxValue,
      s"$path@$offset: blob length $length is not a framed deletion vector")
    val data = DeltaDv.readSidecar(conf, path, offset, (length - 8).toInt)
    DeltaDv.deserializePositions(data)
  }

  /** The footer's FileMetadata JSON — magic-checked at both ends,
    * compressed payloads refused. Spec/validation surface.
    */
  def footerJson(conf: Configuration, path: Path): String = {
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    require(len >= 20, s"$path: too short to be a puffin file ($len bytes)")
    val in = fs.open(path)
    try {
      val head = new Array[Byte](4)
      in.readFully(0L, head)
      require(head.sameElements(Magic), s"$path: missing puffin header magic")
      val tail = new Array[Byte](12)
      in.readFully(len - 12, tail)
      val bb = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN)
      val payloadSize = bb.getInt
      val flags = bb.getInt
      val endMagic = new Array[Byte](4); bb.get(endMagic)
      require(endMagic.sameElements(Magic), s"$path: missing puffin trailing magic")
      require((flags & 1) == 0,
        s"$path: compressed footer payloads are not supported by this reader; refusing")
      require(payloadSize >= 0 && payloadSize <= len - 20,
        s"$path: corrupt footer payload size $payloadSize")
      val payload = new Array[Byte](payloadSize)
      in.readFully(len - 12 - payloadSize, payload)
      val preMagic = new Array[Byte](4)
      in.readFully(len - 12 - payloadSize - 4, preMagic)
      require(preMagic.sameElements(Magic), s"$path: missing puffin footer-start magic")
      new String(payload, "UTF-8")
    } finally in.close()
  }
}
