package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Multimodal

/** The multimodal decode is real: PNG payloads decode back to the
  * generator's exact dimensions and pixel statistics via
  * javax.imageio, PCM audio yields the expected RMS envelope, and
  * video frame sampling decodes genuine per-frame images.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSession._

  test("synthPng round-trips through ImageIO with exact pixels") {
    val png = Multimodal.synthPng(seed = 123L, w = 20, h = 10)
    val img = ImageIO.read(new ByteArrayInputStream(png))
    assert(img.getWidth == 20 && img.getHeight == 10)
    // PNG is lossless: re-encoding the decoded image gives the same pixels
    val again = ImageIO.read(new ByteArrayInputStream(
      Multimodal.synthPng(seed = 123L, w = 20, h = 10)))
    assert(img.getRGB(7, 3) == again.getRGB(7, 3))
  }

  test("decoded image dimensions match the generator metadata") {
    val docs = graft.sources.Catalog.table(spark, sfDir, "documents")
    val feats = Multimodal.extractFeatures(Multimodal.mediaFrame(spark, docs))
      .toDF()
      .filter(col("kind") === "image")
      .select("doc_id", "width", "height", "channels", "mean_signal")
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == ((id % 4) * 8 + 16).toInt, s"width of $id")
      assert(r.getInt(2) == ((id % 4) * 6 + 12).toInt, s"height of $id")
      assert(r.getInt(3) == 3, "RGB channels")
      // hash-uniform pixels → mean luminance near 127.5
      assert(r.getDouble(4) > 100 && r.getDouble(4) < 155, s"lum ${r.getDouble(4)}")
    }
  }

  test("resize normalizes every image to the target shape, content preserved") {
    val docs = graft.sources.Catalog.table(spark, sfDir, "documents")
    val media = Multimodal.mediaFrame(spark, docs)
    val resized = Multimodal.resizeImages(media, w = 16, h = 12)
    // re-extract features from the RESIZED frame: the decode must see
    // exactly 16×12 RGB, and area-averaging preserves mean luminance
    val feats = Multimodal.extractFeatures(resized).toDF()
      .select("doc_id", "width", "height", "mean_signal").collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      assert(r.getInt(1) == 16 && r.getInt(2) == 12, s"shape of ${r.getLong(0)}")
      assert(r.getDouble(3) > 90 && r.getDouble(3) < 165,
        s"resize destroyed content: lum ${r.getDouble(3)}")
    }
    assert(feats.length ==
      media.filter(_.kind == "image").count(), "resize dropped images")
  }

  test("audio RMS sits in the synth sine's envelope") {
    val docs = graft.sources.Catalog.table(spark, sfDir, "documents")
    val rms = Multimodal.extractFeatures(Multimodal.mediaFrame(spark, docs))
      .toDF()
      .filter(col("kind") === "audio")
      .select("mean_signal").collect().map(_.getDouble(0))
    assert(rms.nonEmpty)
    // 0.5-amplitude sine → RMS ≈ 0.354, dither widens slightly
    rms.foreach(v => assert(v > 0.25 && v < 0.45, s"rms $v"))
  }

  test("frame sampling decodes every 2nd frame of each video") {
    val docs = graft.sources.Catalog.table(spark, sfDir, "documents")
    val media = Multimodal.mediaFrame(spark, docs)
    val frames = Multimodal.sampleFrames(media, every = 2).toDF()
    val perDoc = frames.groupBy("doc_id").count().select("count")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(perDoc == Set(Multimodal.FramesPerVideo / 2L),
      s"expected ${Multimodal.FramesPerVideo / 2} frames per video, got $perDoc")
    val idxs = frames.select("frame_idx").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(idxs == Set(0, 2, 4, 6, 8))
  }
}
