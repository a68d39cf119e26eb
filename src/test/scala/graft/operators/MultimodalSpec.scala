package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media plumbing: schema, deterministic stub features, batch decode") {
    val docs = graft.sources.TableLoader.table(spark, sfDir, "documents").limit(50)
    val media = Multimodal.mediaFromDocuments(docs)
    val feats = Multimodal.decodeStub(media).collect()
    assert(feats.length == 50)
    assert(feats.forall(f => Set("image", "audio", "video")(f.modality)))
    assert(feats.forall(f => f.width >= 64 && f.height >= 64))
    assert(feats.forall(f => f.feature.length == 8))
    assert(feats.forall(f => f.byte_entropy >= 0.0 && f.byte_entropy <= 8.0))
    assert(feats.filter(_.modality != "video").forall(_.n_frames == 1))
    // determinism: a second run produces identical features
    val again = Multimodal.decodeStub(media).collect()
    assert(feats.map(f => (f.media_id, f.width, f.byte_entropy)).toSet ==
      again.map(f => (f.media_id, f.width, f.byte_entropy)).toSet)
  }

  test("phash64: locality — a small payload perturbation flips few bits; planted near-dups pair up") {
    // 144-byte payload: 2 bytes per block in the 8x9 grid. Block b's
    // mean is v(b); alternate low/high across columns so every
    // adjacent comparison is decisive (margin 40 >> the 1-byte bump).
    def payload(v: Int => Int): Array[Byte] =
      Array.tabulate(144)(i => v(i / 2).toByte)
    val base = payload(b => if (b % 2 == 0) 40 else 80)
    val a = base.clone()
    val b = base.clone()
    b(10) = (b(10) + 3).toByte // tiny bump: both block-10 bytes stay far from the margin
    val c = payload(bl => if (bl % 2 == 0) 80 else 40) // inverted pattern: far away
    val ha = graft.functions.GraftHash.phash64(a)
    val hb = graft.functions.GraftHash.phash64(b)
    val hc = graft.functions.GraftHash.phash64(c)
    assert(ha == hb, "sub-margin perturbation must not flip any comparison bit")
    assert(java.lang.Long.bitCount(ha ^ hc) > 30, "inverted pattern must be far in Hamming space")
    // a real near-dup: bump block 10's bytes PAST block 9/11 margins →
    // flips exactly the two comparisons block 10 participates in
    val d = base.clone()
    d(20) = 100.toByte; d(21) = 100.toByte // block 10 mean 40 -> 100 (row 1, col 1)
    val hd = graft.functions.GraftHash.phash64(d)
    val flipped = java.lang.Long.bitCount(ha ^ hd)
    assert(flipped >= 1 && flipped <= 2, s"block bump must flip 1-2 bits, flipped $flipped")
    // the operator finds exactly the planted (a,d) near-dup pair; the
    // inverted payload pairs with nobody
    val s = spark; import s.implicits._
    val media = Seq((1L, a), (2L, d), (3L, c)).toDF("media_id", "content")
    val pairs = Dedup.phashPairs(media, "media_id", "content", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"expected only the planted pair, got $pairs")
  }

  test("single-byte-value payload has zero entropy") {
    val f = Multimodal.decodeOne(Multimodal.MediaRecord(1L, "image", Array.fill(100)('a'.toByte), "s", 100L))
    assert(f.byte_entropy == 0.0)
  }

  test("resize caps dimensions inside the box, preserves aspect ratio") {
    val docs = graft.sources.TableLoader.table(spark, sfDir, "documents").limit(40)
    val feats = Multimodal.decodeStub(Multimodal.mediaFromDocuments(docs))
    val resized = Multimodal.resizeStub(feats, 256, 256).collect()
    assert(resized.forall(f => f.width <= 256 && f.height <= 256))
    val orig = feats.collect().map(f => f.media_id -> f).toMap
    resized.filter(f => orig(f.media_id).width > 256 || orig(f.media_id).height > 256).foreach { f =>
      val o = orig(f.media_id)
      val ratioBefore = o.width.toDouble / o.height
      val ratioAfter = f.width.toDouble / f.height
      assert(math.abs(ratioBefore - ratioAfter) / ratioBefore < 0.05, s"media ${f.media_id}")
    }
  }

  test("frame sampling expands videos to n_frames rows") {
    val docs = graft.sources.TableLoader.table(spark, sfDir, "documents").limit(30)
    val feats = Multimodal.decodeStub(Multimodal.mediaFromDocuments(docs))
    val expected = feats.toDF().filter(col("modality") === "video")
      .agg(sum("n_frames")).head.getLong(0)
    assert(Multimodal.sampleFrames(feats).count() == expected)
  }

  private def chunksOf(bytes: Array[Byte], w: Int = 16, div: Int = 32): Seq[(Long, Int)] = {
    val a = graft.functions.GraftHash.cdcChunks(bytes, w, div)
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 2); (r.getLong(0), r.getInt(1))
    }
  }

  test("cdcChunks: lengths partition the payload; hashes match a brute-force reference") {
    val bytes = Array.tabulate(500)(i => ((i * 131 + 7) % 251).toByte)
    val chunks = chunksOf(bytes)
    assert(chunks.map(_._2).sum == bytes.length)
    assert(chunks.forall(_._2 > 0))
    // reference: independent boundary decisions, then FNV per slice
    val bounds = (16 until bytes.length).filter { i =>
      java.lang.Math.floorMod(
        graft.functions.GraftHash.fnv1a64(bytes.slice(i - 16, i)), 32L) == 0L
    }
    val edges = 0 +: bounds :+ bytes.length
    val ref = edges.sliding(2).collect { case Seq(lo, hi) if hi > lo =>
      (graft.functions.GraftHash.fnv1a64(bytes.slice(lo, hi)), hi - lo)
    }.toSeq
    assert(chunks == ref)
    // short and empty payloads: one whole-payload chunk / no chunks
    assert(chunksOf(bytes.take(10)) ==
      Seq((graft.functions.GraftHash.fnv1a64(bytes.take(10)), 10)))
    assert(chunksOf(Array.emptyByteArray).isEmpty)
  }

  test("cdcChunks: appended footer preserves every interior chunk (the CDC property)") {
    val orig = Array.tabulate(800)(i => ((i * 113 + 13) % 251).toByte)
    val appended = orig ++ "#footer-metadata".getBytes("UTF-8")
    val a = chunksOf(orig)
    val b = chunksOf(appended)
    // all original chunks except (at most) the tail chunk survive verbatim
    assert(b.startsWith(a.dropRight(1)),
      s"interior chunks must be byte-stable under append: $a vs $b")
    // fixed-size blocking would share nothing once lengths diverge mid-stream;
    // CDC shares everything up to the touched tail
    assert(a.size >= 3, "test payload should cut into several chunks")
  }

  test("chunkStoreStats: doubled corpus stores roughly half its bytes; totals exact") {
    val s = spark; import s.implicits._
    // ONE unique payload per modality (same-stride payloads are phase
    // shifts of one arithmetic progression, so CDC — correctly! —
    // re-aligns their chunks; distinctness is only claimed within a
    // modality group, so each group gets a single base payload).
    // Length 240 < 251 (the stride's period) means no window repeats
    // within a payload, so within-group (hash, len) keys collide ONLY
    // between the payload and its deliberate copy.
    val payloads = Seq(1L -> "image", 2L -> "audio", 3L -> "video").map { case (i, m) =>
      (i, m, Array.tabulate(240)(j => ((j * 131 + i * 7 + 11) % 251).toByte))
    }
    // every payload twice under distinct ids = the re-upload scenario
    val media = (payloads ++ payloads.map { case (i, m, b) => (i + 100L, m, b) })
      .toDF("media_id", "modality", "content")
    val out = Multimodal.chunkStoreStats(media)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    for ((m, (n, nd, tot, stored, bp)) <- out) {
      assert(n == nd * 2, s"$m: every chunk appears exactly twice")
      assert(stored * 2 == tot, s"$m: dedup store keeps exactly half the bytes")
      assert(bp == 5000L, s"$m: dedup_bp must be exactly 5000, got $bp")
    }
    val byteSum = payloads.map(_._3.length.toLong).sum * 2
    assert(out.values.map(_._3).sum == byteSum, "chunk bytes partition the corpus")
  }
}
