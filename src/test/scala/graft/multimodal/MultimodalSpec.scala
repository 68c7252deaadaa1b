package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "hello world"), (1L, "audio bytes here"), (2L, "video payload data"),
    (3L, "another image")
  ).toDF("doc_id", "text")

  test("fromDocuments builds the media schema with binary payloads") {
    val m = Multimodal.fromDocuments(docs)
    assert(m.schema("payload").dataType.typeName == "binary")
    val row = m.filter(col("media_id") === 0L).rows.head
    assert(row.getString(1) == "image")
    assert(new String(row.getAs[Array[Byte]](2), "UTF-8") == "hello world")
  }

  test("extractFeatures is deterministic and batch-shaped") {
    val m = Multimodal.fromDocuments(docs)
    val f1 = Multimodal.extractFeatures(m, new Multimodal.StubDecoder(8), batchSize = 2)
    val f2 = Multimodal.extractFeatures(m, new Multimodal.StubDecoder(8), batchSize = 3)
    assert(f1.schema("features").dataType.typeName == "array")
    val a = f1.orderBy("media_id").rows.map(_.getSeq[Float](2))
    val b = f2.orderBy("media_id").rows.map(_.getSeq[Float](2))
    assert(a == b) // batch size must not change results
    assert(a.head.length == 8 && a.head.exists(_ != 0.0f))
  }

  test("ImageIoDecoder: real features for image payloads, zeros otherwise") {
    val png = Images.cellPatternPng(3L, 36, 32)
    val media = Seq(
      (1L, "image", png),
      (2L, "audio", png),                 // wrong kind: zero vector
      (3L, "image", Array[Byte](1, 2))    // undecodable: zero vector
    ).toDF("media_id", "kind", "payload")
    val out = Multimodal.extractFeatures(media, new Multimodal.ImageIoDecoder)
      .orderBy("media_id").rows.map(_.getSeq[Float](2))
    val f = Images.grayFeatures(Images.decodeGray(png).get)
    assert(out.head.length == 19)
    assert(out.head(0) == 36 * 32.0f)
    assert(out.head(1) == (f.luma_sum.toDouble / f.n_px).toFloat)
    assert(math.abs(out.head.drop(3).sum - 1.0f) < 1e-5) // hist shares
    assert(out(1).forall(_ == 0.0f) && out(2).forall(_ == 0.0f))
  }

  test("frameSample emits frames only for video rows") {
    val m = Multimodal.fromDocuments(docs)
    val frames = Multimodal.frameSample(m, everyMs = 1000L)
    val ids = frames.select("media_id").distinct().rows.map(_.getLong(0))
    assert(ids == Seq(2L)) // only doc_id % 3 == 2 is video
    assert(frames.count() > 1)
  }

  test("resizePlan preserves aspect ratio and caps the long edge") {
    val m = Multimodal.fromDocuments(docs)
    val out = Multimodal.resizePlan(m, maxDim = 512).rows
    out.foreach { r =>
      val (w, h, tw, th) = (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
      assert(tw <= 512 && th <= 512)
      if (w <= 512 && h <= 512) assert(tw == w && th == h)
      else assert(math.abs(tw.toDouble / th - w.toDouble / h) < 0.02)
    }
  }

  test("resizePlan clamps sub-pixel dims to 1, matching resizeGray") {
    // degenerate aspect ratio: 1×100 at maxDim 24 would plan width 0
    // without the clamp while execution produces 1
    val m = Seq((1L, "image", 1, 100)).toDF("media_id", "kind", "w", "h")
      .select(col("media_id"), col("kind"),
        struct(col("w").as("width_px"), col("h").as("height_px")).as("meta"))
    val r = Multimodal.resizePlan(m, maxDim = 24).rows.head
    assert(r.getInt(4) == 1 && r.getInt(5) == 24)
    val g = Images.resizeGray(Images.Gray(1, 100, Array.fill(100)(7)), 24)
    assert(g.width == r.getInt(4) && g.height == r.getInt(5))
  }
}
