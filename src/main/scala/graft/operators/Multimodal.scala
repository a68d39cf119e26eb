package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed per-partition in batches.
  *
  * The Spark side is real — schema, partitioning, batch-shaped
  * per-partition processing, feature columns. The codec itself is a
  * STUB (this container ships no image/audio libs): `decodeStub`
  * derives deterministic pseudo-features from the bytes, exactly
  * where a JNI/FFI decoder (libjpeg, ffmpeg) would plug in. The
  * plumbing — one decoder init per partition, streaming iteration,
  * no per-row setup cost — is the part that matters at 100 TB.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      modality: String, // image | audio | video
      content: Array[Byte],
      source: String,
      n_bytes: Long)

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int,       // stub-decoded "dimensions"
      height: Int,
      n_frames: Int,    // video frame-sample count; 1 otherwise
      byte_entropy: Double,
      feature: Array[Float]) // stub 8-dim content embedding

  /** Manufacture a media table from the documents table: payload =
    * UTF-8 bytes of the text (a deterministic opaque blob), modality
    * assigned round-robin. Stands in for `binary` columns read from
    * parquet/object storage.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")), (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      col("source"),
      length(col("text")).cast("long").as("n_bytes"))
      .as[MediaRecord]
  }

  /** Batch decode: one "decoder" per partition, rows streamed through
    * it. Replace the body of `decodeOne` with the real codec.
    */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // >>> real impl: init decoder/codec context ONCE here <<<
      it.map(decodeOne)
    }
  }

  /** Deterministic stand-in for codec output: dimensions, frame
    * count, entropy and an 8-dim feature vector derived only from the
    * payload bytes — stable across runs/engines for testing.
    */
  private[operators] def decodeOne(m: MediaRecord): MediaFeatures = {
    val bytes = m.content
    val hist = new Array[Int](256)
    var i = 0
    while (i < bytes.length) { hist(bytes(i) & 0xff) += 1; i += 1 }
    val n = math.max(bytes.length, 1).toDouble
    var entropy = 0.0
    var j = 0
    while (j < 256) {
      if (hist(j) > 0) { val p = hist(j) / n; entropy -= p * math.log(p) / math.log(2) }
      j += 1
    }
    val h = graft.functions.GraftHash.fnv1a64(bytes)
    val width = 64 + (math.abs(h) % 1024).toInt
    val height = 64 + (math.abs(h >>> 17) % 1024).toInt
    val frames = if (m.modality == "video") 1 + (math.abs(h >>> 31) % 32).toInt else 1
    val feature = Array.tabulate(8) { d =>
      val hd = graft.functions.GraftHash.fnv1a64(bytes ++ Array(d.toByte))
      (hd.toDouble / Long.MaxValue.toDouble).toFloat
    }
    MediaFeatures(m.media_id, m.modality, bytes.length.toLong, width, height, frames, entropy, feature)
  }

  /** Chunk-level payload dedup over the media corpus — the
    * content-addressed-store answer to "how much of these 100 TB of
    * media bytes are actually new?": each payload is cut by
    * content-defined chunking ([[graft.functions.GraftHash.cdcChunks]]
    * — boundaries decided by a local w-byte window hash, so an
    * appended footer or re-muxed header reshuffles NO interior chunk),
    * chunks are identified by their FNV-1a64, and per modality the
    * table reports how many chunk-bytes a dedup store would actually
    * keep. Unlike the exact whole-payload dedup (row 23) a single
    * changed byte no longer makes the other 99% of the payload unique.
    *
    * One shuffle: explode to (modality, hash, len) and hash-aggregate
    * on the chunk key WITH map-side combine (duplicate chunks collapse
    * before the exchange — the common case, which is the point), then
    * a second tiny aggregate to per-modality stats:
    * (modality, n_chunks, n_distinct_chunks, total_bytes,
    *  stored_bytes, dedup_bp = ⌊10⁴·stored/total⌋). Distinctness is
    * per (hash, len) pair so the arithmetic is exact even under a
    * (vanishing) 64-bit collision across different lengths.
    */
  def chunkStoreStats(media: DataFrame, w: Int = 16, div: Int = 32): DataFrame = {
    val chunks = media
      .select(col("modality"),
        explode(graft.functions.HashFunctions.cdcChunks(col("content"), w, div)).as("c"))
      .select(col("modality"), col("c.hash").as("hash"), col("c.len").as("len"))
    chunks
      .groupBy(col("modality"), col("hash"), col("len"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("modality"))
      .agg(
        sum(col("n")).as("n_chunks"),
        count(lit(1)).as("n_distinct_chunks"),
        sum(col("len").cast("long") * col("n")).as("total_bytes"),
        sum(col("len").cast("long")).as("stored_bytes"))
      .withColumn("dedup_bp",
        expr("CAST(stored_bytes * 10000 DIV total_bytes AS BIGINT)"))
  }

  /** Frame sampling stub for video: expand each video row into
    * `n_frames` (media_id, frame_idx) rows — the shuffle/shape of a
    * real frame extractor.
    */
  def sampleFrames(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .filter(col("modality") === "video")
      .select(col("media_id"), explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))

  /** Resize stage stub: cap decoded dimensions to a bounding box
    * preserving aspect ratio — the per-partition batch shape of a real
    * resampler (one resizer context per partition, rows streamed). The
    * arithmetic is the real letterbox math; only the pixel work is
    * stubbed out with the rest of the codec.
    */
  def resizeStub(features: Dataset[MediaFeatures], maxW: Int, maxH: Int): Dataset[MediaFeatures] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.mapPartitions { it =>
      // >>> real impl: init resampler context ONCE here <<<
      it.map { f =>
        if (f.width <= maxW && f.height <= maxH) f
        else {
          val scale = math.min(maxW.toDouble / f.width, maxH.toDouble / f.height)
          f.copy(
            width = math.max(1, math.round(f.width * scale).toInt),
            height = math.max(1, math.round(f.height * scale).toInt))
        }
      }
    }
  }
}
