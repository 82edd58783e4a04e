package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column processing: media as opaque `binary` columns with
  * typed metadata, decoded in partition-sized batches.
  *
  * The decode is REAL: image payloads are PNG bytes decoded with JDK
  * `javax.imageio` (public, in every JVM — no external codec needed),
  * audio payloads are PCM16 frames analyzed directly (RMS / zero
  * crossings), video payloads are length-prefixed PNG frame sequences
  * decoded frame-by-frame. Payload bytes are synthesized
  * deterministically from doc_id (this container ships no media
  * files), so every decoded statistic is verifiable against the
  * generator's closed form — see MultimodalSpec.
  *
  * Scale shape: synthesis/decoding runs inside mapPartitions (codec
  * state initialized once per partition, the Scala analog of a
  * `mapInPandas` batch UDF); rows never leave their partition, so the
  * operator is a pure narrow transformation at any corpus size.
  */
object Multimodal {

  /** One media asset: payload + typed metadata. */
  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte],
                      width: Int, height: Int)

  /** Decoded features: real dimensions/channels from the codec, mean
    * luminance (images/video) or RMS (audio), an 8-bin feature vector.
    */
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
                           width: Int, height: Int, channels: Int,
                           mean_signal: Double, feature: Array[Float])

  /** One sampled, decoded video frame. */
  case class Frame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
                   brightness: Double)

  private def mix(seed: Long, a: Long, b: Long): Long = {
    var h = seed ^ (a * 0x9e3779b97f4a7c15L) ^ (b * 0xc2b2ae3d27d4eb4fL)
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h
  }

  /** Deterministic PNG: per-pixel RGB from a hash of (seed, x, y). */
  def synthPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (mix(seed, x, y) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic PCM16LE mono "audio": a seeded sine + hash dither. */
  def synthPcm(seed: Long, nSamples: Int): Array[Byte] = {
    val out = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val base = math.sin(2 * math.Pi * ((seed % 40) + 10) * i / 8000.0)
      val dither = ((mix(seed, i, 0) & 0xff) - 128) / 2048.0
      val v = math.max(-1.0, math.min(1.0, base * 0.5 + dither))
      val s = (v * 32767).toShort
      out(i * 2) = (s & 0xff).toByte
      out(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Deterministic "video": 4-byte frame count, then per frame a
    * 4-byte length + PNG bytes.
    */
  def synthVideo(seed: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def i32(v: Int): Unit = {
      bos.write(v >>> 24); bos.write((v >>> 16) & 0xff)
      bos.write((v >>> 8) & 0xff); bos.write(v & 0xff)
    }
    i32(nFrames)
    var f = 0
    while (f < nFrames) {
      val png = synthPng(mix(seed, f, 7), w, h)
      i32(png.length); bos.write(png)
      f += 1
    }
    bos.toByteArray
  }

  val FramesPerVideo = 10

  /** Build the multimodal frame: kind/dimensions derive from doc_id,
    * payloads are real encoded media synthesized per partition.
    */
  def mediaFrame(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = ((id % 4) * 8 + 16).toInt
        val h = ((id % 4) * 6 + 12).toInt
        (id % 3) match {
          case 0 => MediaRow(id, "image", synthPng(id, w, h), w, h)
          case 1 => MediaRow(id, "audio", synthPcm(id, 2000), 0, 0)
          case _ => MediaRow(id, "video", synthVideo(id, FramesPerVideo, w, h), w, h)
        }
      }
    }
  }

  private def lumFeature(img: BufferedImage): (Int, Int, Int, Double, Array[Float]) = {
    val w = img.getWidth; val h = img.getHeight
    val hist = new Array[Long](8)
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        sum += lum
        hist((lum * 8) / 256) += 1
        x += 1
      }
      y += 1
    }
    val n = (w * h).toDouble
    (w, h, img.getColorModel.getNumComponents, sum / n,
      hist.map(c => (c / n).toFloat))
  }

  private def decodeOne(row: MediaRow): MediaFeatures = row.kind match {
    case "image" =>
      val img = ImageIO.read(new ByteArrayInputStream(row.media))
      val (w, h, ch, mean, feat) = lumFeature(img)
      MediaFeatures(row.doc_id, row.kind, row.media.length, w, h, ch, mean, feat)
    case "audio" =>
      val b = row.media
      val n = b.length / 2
      var sq = 0.0
      var crossings = 0
      var prev = 0
      val hist = new Array[Long](8)
      var i = 0
      while (i < n) {
        val s = ((b(i * 2) & 0xff) | (b(i * 2 + 1) << 8)).toShort.toInt
        sq += s.toDouble * s
        if (i > 0 && ((s ^ prev) < 0)) crossings += 1
        hist(((s + 32768) * 8) / 65536) += 1
        prev = s
        i += 1
      }
      val rms = math.sqrt(sq / math.max(1, n)) / 32768.0
      MediaFeatures(row.doc_id, row.kind, b.length, n, 1, 1, rms,
        hist.map(c => (c.toDouble / math.max(1, n)).toFloat))
    case _ => // video: decode first frame for the summary row
      val first = frameIter(row).next()._2
      val (w, h, ch, mean, feat) = lumFeature(first)
      MediaFeatures(row.doc_id, row.kind, row.media.length, w, h, ch, mean, feat)
  }

  private def frameIter(row: MediaRow): Iterator[(Int, BufferedImage)] = {
    val b = row.media
    def i32(o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    val nFrames = i32(0)
    var off = 4
    (0 until nFrames).iterator.map { f =>
      val len = i32(off)
      val img = ImageIO.read(new ByteArrayInputStream(b, off + 4, len))
      off += 4 + len
      (f, img)
    }
  }

  /** Batch feature extraction — mapPartitions keeps the per-batch
    * shape a real codec needs (ImageIO cache config once per
    * partition, not per row) and preserves the input partitioning.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      ImageIO.setUseCache(false) // per-partition codec init
      rows.map(decodeOne)
    }
  }

  /** Image resize to a fixed (w, h) — the normalize-before-training
    * step of a vision pipeline. Decode → bilinear-ish scale (AWT
    * SCALE_AREA_AVERAGING is deterministic for a given input) →
    * re-encode PNG. Pure per-row projection over partitions: no
    * shuffle, codec state initialized once per partition, output stays
    * an opaque binary column with typed (w, h) metadata — the same
    * contract the other media ops keep.
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { row =>
        val img = ImageIO.read(new ByteArrayInputStream(row.media))
        val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try g.drawImage(
          img.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING),
          0, 0, null)
        finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        MediaRow(row.doc_id, row.kind, bos.toByteArray, w, h)
      }
    }
  }

  /** Frame sampling: explode each video into every `every`-th decoded
    * frame with per-frame brightness — frames stay data-parallel for
    * downstream per-frame models.
    */
  def sampleFrames(media: Dataset[MediaRow], every: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.flatMap { row =>
        frameIter(row).filter(_._1 % every == 0).map { case (idx, img) =>
          val (w, h, _, mean, _) = lumFeature(img)
          Frame(row.doc_id, idx, w, h, mean)
        }
      }
    }
  }
}
