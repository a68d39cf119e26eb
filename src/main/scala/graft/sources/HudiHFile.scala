package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Codec for the HFile base files of Apache Hudi's METADATA TABLE,
  * implemented from PUBLIC format documentation only — the HBase book
  * appendix "HFile format" (version 3 layout: data blocks → load-on-
  * open section → fixed trailer), the public `HFile.proto`
  * (FileTrailerProto / FileInfoProto), and hudi.apache.org's
  * tech-specs (the metadata table's base-file format is HFile;
  * records are binary-Avro `HoodieMetadataRecord` payloads keyed by
  * record key; the Avro writer schema rides the file-info `schema`
  * entry — the same convention [[HudiLog]] documents for log blocks).
  *
  * Scope — exactly what serving the metadata table needs, refusals
  * elsewhere:
  *
  *  - UNCOMPRESSED, UNENCODED files (compression / data-block
  *    encoding / multi-level indexes refuse loudly and the caller
  *    falls back to meta-file planning — correctness never depends on
  *    this reader);
  *  - cells are `KeyValue`-serialized: int keyLength, int
  *    valueLength, key = [short rowLength][row][byte familyLength=0]
  *    [timestamp 8][type 1], value = the Avro payload. An optional
  *    per-cell memstore timestamp (Hadoop vlong) is consumed when the
  *    file-info MAX_MEMSTORE_TS_KEY announces it;
  *  - the v3 trailer is the 4096-byte fixed block: 8-byte magic
  *    `TRABLK"$`, "PBUF" + varint-delimited FileTrailerProto, zero
  *    padding, final int (minor << 24 | major);
  *  - the root data index (`IDXROOT2` at load-on-open offset) holds
  *    per-block [long offset][int onDiskSizeWithHeader]
  *    [Hadoop-vint-length first key];
  *  - the file info (`FILEINF2` at its trailer offset) is "PBUF" +
  *    varint-delimited FileInfoProto of (bytes, bytes) pairs.
  *
  * The WRITER here exists for spec fixtures (building externally-
  * shaped metadata tables in a sandbox with no Hudi/HBase jars) and
  * emits the same v3 shape; reader and writer are developed against
  * the published layouts, and the structural constants (magics,
  * header width, trailer size, protobuf field numbers) are pinned in
  * HudiHFileSpec against the documentation they came from.
  */
object HudiHFile {

  val DataBlockMagic: Array[Byte] = "DATABLK*".getBytes(UTF_8)
  val RootIndexMagic: Array[Byte] = "IDXROOT2".getBytes(UTF_8)
  val FileInfoMagic: Array[Byte] = "FILEINF2".getBytes(UTF_8)
  val TrailerMagic: Array[Byte] = "TRABLK\"$".getBytes(UTF_8)
  val PbMagic: Array[Byte] = "PBUF".getBytes(UTF_8)
  /** v2+ block header width: magic 8 + onDiskSizeWithoutHeader 4 +
    * uncompressedSizeWithoutHeader 4 + prevBlockOffset 8 +
    * checksumType 1 + bytesPerChecksum 4 + onDiskDataSizeWithHeader 4. */
  val HeaderSize: Int = 33
  /** Fixed v3 trailer size (HFixedFileTrailer: 4 KiB for major ≥ 3). */
  val TrailerSize: Int = 4096
  val MajorVersion: Int = 3
  /** HBase Compression.Algorithm ordinal for NONE. */
  val CompressionNone: Int = 2
  /** KeyValue type code for Put. */
  val PutType: Byte = 4
  /** File-info key announcing per-cell memstore timestamps. */
  val MaxMemstoreTsKey = "MAX_MEMSTORE_TS_KEY"
  /** File-info key Hudi stores the Avro writer schema under. */
  val SchemaKey = "schema"

  final case class Trailer(
      fileInfoOffset: Long,
      loadOnOpenDataOffset: Long,
      dataIndexCount: Int,
      entryCount: Long,
      numDataIndexLevels: Int,
      firstDataBlockOffset: Long,
      lastDataBlockOffset: Long,
      compressionCodec: Int,
      trailerSize: Int)

  // ----------------------------------------------------------------
  // Protobuf wire helpers (varint + length-delimited — the two wire
  // types FileTrailerProto/FileInfoProto use)
  // ----------------------------------------------------------------

  private[sources] def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private final class PbReader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var acc = 0L
      while (true) {
        val b = bytes(pos); pos += 1
        acc |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
      }
      acc
    }
    def bytesField(): Array[Byte] = {
      val len = varint().toInt
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len
      out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(): Unit
      case 1 => pos += 8
      case 2 => val len = varint().toInt; pos += len
      case 5 => pos += 4
      case other => throw new IllegalStateException(s"unsupported protobuf wire type $other")
    }
  }

  private def pbVarintField(out: ByteArrayOutputStream, field: Int, v: Long): Unit = {
    writeVarint(out, (field << 3) | 0); writeVarint(out, v)
  }

  private def pbBytesField(out: ByteArrayOutputStream, field: Int, v: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2); writeVarint(out, v.length.toLong); out.write(v)
  }

  // ----------------------------------------------------------------
  // Hadoop WritableUtils vint (root-index key lengths, memstore TS)
  // ----------------------------------------------------------------

  private[sources] def writeHadoopVLong(out: DataOutputStream, v: Long): Unit = {
    if (v >= -112 && v <= 127) { out.writeByte(v.toInt); return }
    var len = -112
    var value = v
    if (value < 0) { value = ~value; len = -120 }
    var tmp = value
    while (tmp != 0) { tmp >>= 8; len -= 1 }
    out.writeByte(len)
    val n = if (len < -120) -(len + 120) else -(len + 112)
    var idx = n - 1
    while (idx >= 0) { out.writeByte(((value >> (8 * idx)) & 0xFF).toInt); idx -= 1 }
  }

  private[sources] def readHadoopVLong(bytes: Array[Byte], pos0: Int): (Long, Int) = {
    val first = bytes(pos0)
    if (first >= -112) return (first.toLong, pos0 + 1)
    val negative = first < -120
    val n = if (negative) -(first + 120) else -(first + 112)
    var acc = 0L
    var i = 0
    while (i < n) { acc = (acc << 8) | (bytes(pos0 + 1 + i) & 0xFFL); i += 1 }
    (if (negative) ~acc else acc, pos0 + 1 + n)
  }

  // ----------------------------------------------------------------
  // Read
  // ----------------------------------------------------------------

  private def readFully(conf: Configuration, path: Path): Array[Byte] = {
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    require(len <= 512L * 1024 * 1024,
      s"$path: ${len}B HFile exceeds the 512 MiB whole-file read bound this codec serves " +
        "(metadata-table base files are far smaller; refusing rather than OOMing the driver)")
    val in = fs.open(path)
    try {
      val buf = new Array[Byte](len.toInt)
      in.readFully(0L, buf)
      buf
    } finally in.close()
  }

  private def beInt(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xFF) << 24) | ((b(p + 1) & 0xFF) << 16) | ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)

  private def beLong(b: Array[Byte], p: Int): Long =
    ((beInt(b, p) & 0xFFFFFFFFL) << 32) | (beInt(b, p + 4) & 0xFFFFFFFFL)

  private def beShort(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)

  def readTrailer(bytes: Array[Byte], what: String): Trailer = {
    require(bytes.length > TrailerSize, s"$what: shorter than an HFile v3 trailer")
    val versionInt = beInt(bytes, bytes.length - 4)
    val major = versionInt & 0x00FFFFFF
    require(major == MajorVersion || major == 2,
      s"$what: HFile major version $major — this codec reads v2/v3")
    val tSize = if (major >= 3) TrailerSize else 212
    val tStart = bytes.length - tSize
    require(TrailerMagic.indices.forall(i => bytes(tStart + i) == TrailerMagic(i)),
      s"$what: trailer magic mismatch — not an HFile")
    require(PbMagic.indices.forall(i => bytes(tStart + 8 + i) == PbMagic(i)),
      s"$what: trailer is not protobuf-serialized (pre-v2 file?)")
    val r = new PbReader(bytes, tStart + 8 + 4, bytes.length - 4)
    val msgLen = r.varint().toInt // writeDelimitedTo's length prefix
    val end = r.pos + msgLen
    var fileInfoOffset = -1L; var loadOnOpen = -1L
    var dataIndexCount = 0; var entryCount = 0L; var levels = 1
    var firstData = -1L; var lastData = -1L; var codec = CompressionNone
    while (r.pos < end) {
      val tag = r.varint()
      val field = (tag >> 3).toInt
      val wire = (tag & 7).toInt
      field match {
        case 1 => fileInfoOffset = r.varint()
        case 2 => loadOnOpen = r.varint()
        case 5 => dataIndexCount = r.varint().toInt
        case 7 => entryCount = r.varint()
        case 8 => levels = r.varint().toInt
        case 9 => firstData = r.varint()
        case 10 => lastData = r.varint()
        case 12 => codec = r.varint().toInt
        case _ => r.skip(wire)
      }
    }
    Trailer(fileInfoOffset, loadOnOpen, dataIndexCount, entryCount, levels,
      firstData, lastData, codec, tSize)
  }

  /** (file-info map, cells) of an HFile, whole-file read. Cells are
    * (row key, value bytes) in file order. Refuses compression,
    * encoding, and multi-level indexes — callers fall back to their
    * non-indexed path on the refusal.
    */
  def read(conf: Configuration, path: Path): (Map[String, Array[Byte]], Seq[(String, Array[Byte])]) = {
    val bytes = readFully(conf, path)
    val t = readTrailer(bytes, path.toString)
    require(t.compressionCodec == CompressionNone,
      s"$path: HFile compression codec ordinal ${t.compressionCodec} — this codec reads " +
        "uncompressed files only (Hudi metadata defaults); falling back is the caller's job")
    require(t.numDataIndexLevels <= 1,
      s"$path: multi-level (${t.numDataIndexLevels}) data index — this codec reads " +
        "single-level root indexes; falling back is the caller's job")

    // file info: PBUF + varint-delimited FileInfoProto of bytes pairs
    val fi = parseBlock(bytes, t.fileInfoOffset.toInt, FileInfoMagic, path.toString)
    val infoMap = parseFileInfo(fi, path.toString)
    val hasMvcc = infoMap.contains(MaxMemstoreTsKey)

    // root index → data blocks → cells
    val idx = parseBlock(bytes, t.loadOnOpenDataOffset.toInt, RootIndexMagic, path.toString)
    var p = 0
    val cells = Seq.newBuilder[(String, Array[Byte])]
    var i = 0
    while (i < t.dataIndexCount) {
      val off = beLong(idx, p); p += 8
      p += 4 // onDiskSizeWithHeader — the block header re-states sizes
      val (klen, p2) = readHadoopVLong(idx, p)
      p = p2 + klen.toInt // first-key bytes — unused; blocks are walked fully
      val data = parseBlock(bytes, off.toInt, DataBlockMagic, path.toString)
      var q = 0
      while (q < data.length) {
        val keyLen = beInt(data, q)
        val valLen = beInt(data, q + 4)
        val rowLen = beShort(data, q + 8)
        val row = new String(data, q + 10, rowLen, UTF_8)
        val value = java.util.Arrays.copyOfRange(data, q + 8 + keyLen, q + 8 + keyLen + valLen)
        cells += (row -> value)
        q += 8 + keyLen + valLen
        if (hasMvcc) { val (_, q2) = readHadoopVLong(data, q); q = q2 }
      }
      i += 1
    }
    (infoMap, cells.result())
  }

  /** File-info map alone, via positioned reads of the trailer and the
    * FILEINF2 block — no data block is touched. */
  def readFileInfo(conf: Configuration, path: Path): Map[String, Array[Byte]] = {
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    require(len > TrailerSize, s"$path: shorter than an HFile v3 trailer")
    val in = fs.open(path)
    try {
      val tail = new Array[Byte](math.min(len, TrailerSize + 8L).toInt)
      in.readFully(len - tail.length, tail)
      val t = readTrailer(tail, path.toString)
      val fiRaw = new Array[Byte]((len - t.trailerSize - t.fileInfoOffset).toInt)
      in.readFully(t.fileInfoOffset, fiRaw)
      val fi = parseBlock(fiRaw, 0, FileInfoMagic, path.toString)
      parseFileInfo(fi, path.toString)
    } finally in.close()
  }

  private def parseFileInfo(fi: Array[Byte], what: String): Map[String, Array[Byte]] = {
    require(PbMagic.indices.forall(i => fi(i) == PbMagic(i)),
      s"$what: file-info block is not protobuf-serialized")
    val fir = new PbReader(fi, PbMagic.length, fi.length)
    val fiLen = fir.varint().toInt
    val fiEnd = fir.pos + fiLen
    val info = Map.newBuilder[String, Array[Byte]]
    while (fir.pos < fiEnd) {
      val tag = fir.varint()
      if ((tag >> 3).toInt == 1 && (tag & 7) == 2) {
        val entry = fir.bytesField()
        val er = new PbReader(entry, 0, entry.length)
        var k: Array[Byte] = null; var v: Array[Byte] = null
        while (er.hasMore) {
          val etag = er.varint()
          (etag >> 3).toInt match {
            case 1 => k = er.bytesField()
            case 2 => v = er.bytesField()
            case _ => er.skip((etag & 7).toInt)
          }
        }
        if (k != null && v != null) info += (new String(k, UTF_8) -> v)
      } else fir.skip((tag & 7).toInt)
    }
    info.result()
  }

  /** SEEKING point read: only the trailer, the load-on-open section,
    * and the data blocks whose ROOT-INDEX KEY RANGE may hold a
    * requested key are read (positioned reads — the whole-file bound
    * of [[read]] never applies). This is what makes a point lookup
    * against a big record-index HFile O(|keys| blocks), the access
    * pattern the format's root index exists for. Returns the
    * requested cells that exist, in file order.
    */
  def readKeysSeek(conf: Configuration, path: Path,
      keys: Set[String]): Seq[(String, Array[Byte])] = {
    if (keys.isEmpty) return Nil
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    require(len > TrailerSize, s"$path: shorter than an HFile v3 trailer")
    val in = fs.open(path)
    try {
      def readRange(off: Long, n: Int): Array[Byte] = {
        val buf = new Array[Byte](n)
        in.readFully(off, buf)
        buf
      }
      val tailLen = math.min(len, TrailerSize + 8L).toInt
      val tail = readRange(len - tailLen, tailLen)
      val t = readTrailer(tail, path.toString)
      require(t.compressionCodec == CompressionNone && t.numDataIndexLevels <= 1,
        s"$path: compressed or multi-level HFile — seek reader serves the plain layout only")
      // file info decides whether cells carry memstore timestamps
      val fiRaw = readRange(t.fileInfoOffset, (len - t.trailerSize - t.fileInfoOffset).toInt)
      val fi = parseBlock(fiRaw, 0, FileInfoMagic, path.toString)
      val hasMvcc = {
        // a cheap scan for the announcing key's bytes inside the
        // FileInfoProto — full parse lives in [[read]]
        val needle = MaxMemstoreTsKey.getBytes(UTF_8)
        fi.toSeq.indexOfSlice(needle.toSeq) >= 0
      }
      // root data index: [loadOnOpen, fileInfo)
      val idxRaw = readRange(t.loadOnOpenDataOffset,
        (t.fileInfoOffset - t.loadOnOpenDataOffset).toInt)
      val idx = parseBlock(idxRaw, 0, RootIndexMagic, path.toString)
      var p = 0
      val entries = Seq.newBuilder[(Long, Int, String)] // offset, onDiskWithHeader, firstRow
      var i = 0
      while (i < t.dataIndexCount) {
        val off = beLong(idx, p); p += 8
        val onDisk = beInt(idx, p); p += 4
        val (klen, p2) = readHadoopVLong(idx, p)
        val keyBytes = java.util.Arrays.copyOfRange(idx, p2, p2 + klen.toInt)
        p = p2 + klen.toInt
        val rowLen = ((keyBytes(0) & 0xFF) << 8) | (keyBytes(1) & 0xFF)
        entries += ((off, onDisk, new String(keyBytes, 2, rowLen, UTF_8)))
        i += 1
      }
      val index = entries.result()
      // block b covers [firstRow(b), firstRow(b+1)) — a key maps to
      // the LAST block whose firstRow <= key
      val wanted = scala.collection.mutable.SortedSet.empty[Int]
      keys.foreach { k =>
        val at = index.lastIndexWhere(_._3 <= k)
        if (at >= 0) wanted += at
      }
      val cells = Seq.newBuilder[(String, Array[Byte])]
      wanted.foreach { b =>
        val (off, onDisk, _) = index(b)
        val data = parseBlock(readRange(off, onDisk), 0, DataBlockMagic, path.toString)
        var q = 0
        while (q < data.length) {
          val keyLen = beInt(data, q)
          val valLen = beInt(data, q + 4)
          val rowLen = beShort(data, q + 8)
          val row = new String(data, q + 10, rowLen, UTF_8)
          if (keys.contains(row))
            cells += (row -> java.util.Arrays.copyOfRange(
              data, q + 8 + keyLen, q + 8 + keyLen + valLen))
          q += 8 + keyLen + valLen
          if (hasMvcc) { val (_, q2) = readHadoopVLong(data, q); q = q2 }
        }
      }
      cells.result()
    } finally in.close()
  }

  /** Decode one block at `off`: verify its magic, return the
    * UNCOMPRESSED payload (header stripped, trailing checksums
    * excluded via onDiskDataSizeWithHeader). */
  private def parseBlock(bytes: Array[Byte], off: Int, magic: Array[Byte],
      what: String): Array[Byte] = {
    require(magic.indices.forall(i => bytes(off + i) == magic(i)),
      s"$what: block at $off is not ${new String(magic, UTF_8)}")
    val uncompressed = beInt(bytes, off + 12)
    val onDiskDataWithHeader = beInt(bytes, off + 29)
    require(onDiskDataWithHeader - HeaderSize == uncompressed,
      s"$what: block at $off is compressed or encoded — unsupported; " +
        "fall back to the non-indexed path")
    java.util.Arrays.copyOfRange(bytes, off + HeaderSize, off + HeaderSize + uncompressed)
  }

  // ----------------------------------------------------------------
  // Write (spec fixtures + graft-published metadata HFiles)
  // ----------------------------------------------------------------

  /** Write a v3 HFile of `cells` (must be pre-sorted by key; one cell
    * per key), uncompressed, no checksums (checksumType NULL), one
    * data block per `blockRows` cells, single-level root index,
    * `fileInfo` entries riding FileInfoProto. */
  def write(conf: Configuration, path: Path, cells: Seq[(String, Array[Byte])],
      fileInfo: Map[String, Array[Byte]], blockRows: Int = 1024): Unit = {
    require(cells.nonEmpty, s"$path: refusing to write an empty HFile")
    require(cells.map(_._1) == cells.map(_._1).sorted,
      s"$path: HFile cells must be sorted by key")
    val out = new ByteArrayOutputStream()

    def blockHeader(magic: Array[Byte], dataLen: Int, prevOffset: Long): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.write(magic)
      d.writeInt(dataLen)      // onDiskSizeWithoutHeader (no checksums)
      d.writeInt(dataLen)      // uncompressedSizeWithoutHeader
      d.writeLong(prevOffset)
      d.writeByte(0)           // checksumType NULL
      d.writeInt(16384)        // bytesPerChecksum (conventional)
      d.writeInt(HeaderSize + dataLen) // onDiskDataSizeWithHeader
      b.toByteArray
    }

    def keyBytesOf(row: String): Array[Byte] = {
      val rb = row.getBytes(UTF_8)
      val b = new ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.writeShort(rb.length)
      d.write(rb)
      d.writeByte(0)                 // familyLength 0, no family/qualifier
      d.writeLong(Long.MaxValue)     // LATEST_TIMESTAMP
      d.writeByte(PutType)
      b.toByteArray
    }

    // data blocks
    var prevData = -1L
    val index = Seq.newBuilder[(Long, Int, Array[Byte])] // (offset, onDiskWithHeader, firstKey)
    var firstDataOffset = -1L
    var lastDataOffset = -1L
    cells.grouped(blockRows).foreach { group =>
      val payload = new ByteArrayOutputStream()
      val d = new DataOutputStream(payload)
      group.foreach { case (row, value) =>
        val kb = keyBytesOf(row)
        d.writeInt(kb.length)
        d.writeInt(value.length)
        d.write(kb)
        d.write(value)
      }
      val data = payload.toByteArray
      val offset = out.size().toLong
      if (firstDataOffset < 0) firstDataOffset = offset
      lastDataOffset = offset
      out.write(blockHeader(DataBlockMagic, data.length, prevData))
      out.write(data)
      prevData = offset
      index += ((offset, HeaderSize + data.length, keyBytesOf(group.head._1)))
    }
    val entries = index.result()

    // load-on-open: root data index
    val loadOnOpenOffset = out.size().toLong
    val idxPayload = {
      val b = new ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      entries.foreach { case (off, onDisk, firstKey) =>
        d.writeLong(off)
        d.writeInt(onDisk)
        writeHadoopVLong(d, firstKey.length.toLong)
        d.write(firstKey)
      }
      b.toByteArray
    }
    out.write(blockHeader(RootIndexMagic, idxPayload.length, -1L))
    out.write(idxPayload)

    // empty META root index: real readers walk the load-on-open
    // section sequentially and expect a second ROOT_INDEX block even
    // at metaIndexCount = 0
    out.write(blockHeader(RootIndexMagic, 0, -1L))

    // file info
    val fileInfoOffset = out.size().toLong
    val fiPayload = {
      val msg = new ByteArrayOutputStream()
      fileInfo.toSeq.sortBy(_._1).foreach { case (k, v) =>
        val pair = new ByteArrayOutputStream()
        pbBytesField(pair, 1, k.getBytes(UTF_8))
        pbBytesField(pair, 2, v)
        pbBytesField(msg, 1, pair.toByteArray)
      }
      val b = new ByteArrayOutputStream()
      b.write(PbMagic)
      writeVarint(b, msg.size().toLong)
      msg.writeTo(b)
      b.toByteArray
    }
    out.write(blockHeader(FileInfoMagic, fiPayload.length, -1L))
    out.write(fiPayload)

    // trailer
    val proto = new ByteArrayOutputStream()
    pbVarintField(proto, 1, fileInfoOffset)
    pbVarintField(proto, 2, loadOnOpenOffset)
    pbVarintField(proto, 3, idxPayload.length.toLong)
    pbVarintField(proto, 4, out.size().toLong)
    pbVarintField(proto, 5, entries.size.toLong)
    pbVarintField(proto, 6, 0L) // metaIndexCount
    pbVarintField(proto, 7, cells.size.toLong)
    pbVarintField(proto, 8, 1L) // numDataIndexLevels
    pbVarintField(proto, 9, firstDataOffset)
    pbVarintField(proto, 10, lastDataOffset)
    pbBytesField(proto, 11,
      "org.apache.hadoop.hbase.CellComparatorImpl".getBytes(UTF_8))
    pbVarintField(proto, 12, CompressionNone.toLong)
    val trailer = new ByteArrayOutputStream()
    trailer.write(TrailerMagic)
    trailer.write(PbMagic)
    writeVarint(trailer, proto.size().toLong)
    proto.writeTo(trailer)
    while (trailer.size() < TrailerSize - 4) trailer.write(0)
    val td = new DataOutputStream(trailer)
    td.writeInt(MajorVersion) // (minor 0 << 24) | major
    require(trailer.size() == TrailerSize, "trailer sizing bug")
    trailer.writeTo(out)

    val fs = path.getFileSystem(conf)
    val os = fs.create(path, true)
    try out.writeTo(os) finally os.close()
  }
}
