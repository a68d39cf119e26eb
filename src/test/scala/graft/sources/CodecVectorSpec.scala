package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** PUBLISHED-VECTOR pins for every hand-rolled byte-level codec in
  * graft — the mitigation for the standing fixture self-consistency
  * risk (all foreign-format fixtures in this zero-egress sandbox are
  * graft-written, so a writer/reader pair could drift from the real
  * format TOGETHER and every roundtrip spec would stay green). Each
  * test locks an encoder/decoder against a vector from the format's
  * own specification, or against an independent implementation
  * already in the sandbox.
  *
  * Inventory of byte-level codecs and their anchors:
  *  - Z85 (Delta DV descriptors)            → ZeroMQ RFC 32 "HelloWorld" vector (here)
  *  - CRC-32 (Delta DV sidecar framing)     → IEEE 802.3 check value via java.util.zip (here)
  *  - RoaringBitmap portable 64-bit array   → Delta PROTOCOL.md magic 1681511377 (here);
  *                                            per-bitmap bytes are org.roaringbitmap, an
  *                                            independent library implementation
  *  - protobuf varint (HFile trailer/info)  → protobuf encoding docs' worked examples (here)
  *  - Hadoop vint/vlong (HFile root index)  → org.apache.hadoop.io.WritableUtils, the
  *                                            reference implementation itself (here)
  *  - HFile v3 block/trailer layout         → HudiHFileSpec structural pins (magics,
  *                                            4096-byte trailer, version int)
  *  - murmur3_x86_32 (Iceberg transforms)   → Iceberg spec Appendix B vectors
  *                                            (IcebergTransformsSpec)
  *  - Hudi log block layout                 → hudi.apache.org block structure; magic +
  *                                            ordinals pinned in HudiLogSpec
  *  - Puffin file layout (Iceberg v3 DVs)   → iceberg.apache.org puffin-spec magic,
  *                                            pinned here + exercised in IcebergDvSpec
  *  - parquet, Avro container files         → written/read through parquet-mr and
  *                                            org.apache.avro — library-backed, not
  *                                            hand-rolled, so no vector needed
  */
class CodecVectorSpec extends AnyFunSuite {

  test("Z85: the ZeroMQ RFC 32 test vector (0x86 4F D2 6F B5 59 F7 5B <-> 'HelloWorld')") {
    // https://rfc.zeromq.org/spec/32/ — the spec's only normative vector
    val bytes = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B).map(_.toByte)
    assert(DeltaDv.z85Encode(bytes) == "HelloWorld")
    assert(DeltaDv.z85Decode("HelloWorld").toSeq == bytes.toSeq)
  }

  test("CRC-32: the IEEE 802.3 check value ('123456789' -> 0xCBF43926)") {
    // the standard CRC-32 check value (ISO 3309 / IEEE 802.3; what
    // zlib documents as the 'check' constant). Delta DV sidecars
    // frame each blob with exactly this CRC via java.util.zip.CRC32 —
    // pinning it proves the JDK object IS the IEEE polynomial with
    // the expected init/final conventions.
    val crc = new java.util.zip.CRC32()
    crc.update("123456789".getBytes("US-ASCII"))
    assert(crc.getValue == 0xCBF43926L)
  }

  test("RoaringBitmap portable array: the PROTOCOL.md magic, and library-backed bitmap bytes") {
    // delta.io PROTOCOL.md (Deletion Vector Format): magic 1681511377
    // little-endian opens the portable 64-bit bitmap array
    assert(DeltaDv.PortableMagic == 1681511377)
    val ser = DeltaDv.serializePositions(Seq(1L, 2L, (5L << 32) | 7L))
    val buf = java.nio.ByteBuffer.wrap(ser).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(buf.getInt == 1681511377)
    assert(buf.getLong == 2L) // two 32-bit key buckets: 0 and 5
    assert(DeltaDv.deserializePositions(ser).toSeq == Seq(1L, 2L, (5L << 32) | 7L))
  }

  test("protobuf varint: the encoding guide's worked examples") {
    // protobuf.dev/programming-guides/encoding: 1 -> 01, 150 -> 96 01,
    // 300 -> AC 02; and the 10-byte max for a full 64-bit value
    def enc(v: Long): Seq[Int] = {
      val b = new java.io.ByteArrayOutputStream()
      HudiHFile.writeVarint(b, v)
      b.toByteArray.toSeq.map(_ & 0xFF)
    }
    assert(enc(1L) == Seq(0x01))
    assert(enc(150L) == Seq(0x96, 0x01))
    assert(enc(300L) == Seq(0xAC, 0x02))
    assert(enc(-1L).length == 10 && enc(-1L).forall(b => b == 0xFF || b == 0x01))
  }

  test("Hadoop vint/vlong: bit-identical to org.apache.hadoop.io.WritableUtils (reference impl)") {
    // the root-index key lengths and memstore timestamps in HFiles are
    // Hadoop vints; WritableUtils IS the reference implementation and
    // ships in the sandbox — cross-check both directions over the
    // value classes (single-byte span, multi-byte positive/negative)
    val values = Seq(0L, 1L, -1L, 112L, 127L, 128L, -112L, -113L, 255L, 256L,
      65535L, -65536L, Int.MaxValue.toLong, Long.MaxValue, Long.MinValue)
    values.foreach { v =>
      val ours = {
        val b = new java.io.ByteArrayOutputStream()
        val d = new java.io.DataOutputStream(b)
        HudiHFile.writeHadoopVLong(d, v)
        b.toByteArray
      }
      val theirs = {
        val b = new java.io.ByteArrayOutputStream()
        val d = new java.io.DataOutputStream(b)
        org.apache.hadoop.io.WritableUtils.writeVLong(d, v)
        b.toByteArray
      }
      assert(ours.toSeq == theirs.toSeq, s"encode($v) diverges from WritableUtils")
      val (decoded, next) = HudiHFile.readHadoopVLong(theirs, 0)
      assert(decoded == v && next == theirs.length, s"decode($v) diverges")
      val din = new java.io.DataInputStream(new java.io.ByteArrayInputStream(ours))
      assert(org.apache.hadoop.io.WritableUtils.readVLong(din) == v,
        s"WritableUtils cannot read our encoding of $v")
    }
  }

  test("Puffin: the spec's magic bytes frame the file (iceberg.apache.org/puffin-spec)") {
    // 'PFA1' = 0x50 0x46 0x41 0x31 — at offset 0, before the footer
    // payload, and as the final 4 bytes (pinned as bytes, not via the
    // writer's own constant, so writer drift cannot re-green this)
    assert(IcebergPuffin.Magic.toSeq == Seq[Byte](0x50, 0x46, 0x41, 0x31))
    assert(new String(IcebergPuffin.Magic, "US-ASCII") == "PFA1")
  }

  test("HFile v3: magics and fixed sizes as the HBase book documents them") {
    // block magics are 8 ASCII bytes; the v3 trailer is the fixed
    // 4 KiB block; the v2+ header is 33 bytes — pinned as literals
    assert(new String(HudiHFile.DataBlockMagic, "US-ASCII") == "DATABLK*")
    assert(new String(HudiHFile.RootIndexMagic, "US-ASCII") == "IDXROOT2")
    assert(new String(HudiHFile.FileInfoMagic, "US-ASCII") == "FILEINF2")
    assert(new String(HudiHFile.TrailerMagic, "US-ASCII") == "TRABLK\"$")
    assert(HudiHFile.TrailerSize == 4096 && HudiHFile.HeaderSize == 33)
    assert(HudiHFile.CompressionNone == 2) // Compression.Algorithm.NONE ordinal
  }

  test("Hudi log: the documented '#HUDI#' magic and public block-type ordinals") {
    assert(new String(HudiLog.Magic, "US-ASCII") == "#HUDI#")
    // HoodieLogBlockType ordinals (public enum order)
    assert(HudiLog.CommandBlockType == 0 && HudiLog.DeleteBlockType == 1 &&
      HudiLog.CorruptBlockType == 2 && HudiLog.AvroDataBlockType == 3)
  }
}
