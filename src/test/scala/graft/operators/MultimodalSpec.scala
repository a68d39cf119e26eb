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
}
