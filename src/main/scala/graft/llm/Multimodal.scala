package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, processed in partition-sized batches.
  *
  * The Spark-side plumbing here is real — schema, partitioning, batch
  * iteration shape (the Scala analog of a `mapInPandas` batch UDF) —
  * while the actual codec work is a clearly-marked STUB: this
  * container has no image/audio libraries, so `decodeStub` produces
  * deterministic fake features from the bytes. Swapping in a real
  * decoder changes only the body of `decodeStub`.
  */
object Multimodal {

  /** One media asset: payload + typed metadata. */
  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte],
                      width: Int, height: Int)

  /** Extracted features (what a real decode/resize/embed would emit). */
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
                           content_hash: Long, head_hex: String,
                           feature: Array[Float])

  /** Build a multimodal frame from the documents table: the text bytes
    * stand in for an encoded payload; kind/width/height are derived
    * deterministically (fake but stable metadata).
    */
  def mediaFrame(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
      col("doc_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("media"),
      (pmod(col("doc_id"), lit(4)) * 160 + 320).cast("int").as("width"),
      (pmod(col("doc_id"), lit(4)) * 90 + 180).cast("int").as("height"))
      .as[MediaRow]
  }

  /** STUB decode: deterministic pseudo-features from the payload bytes.
    * A real implementation would decode the image/audio here (per
    * partition, batch-at-a-time — exactly this iteration shape).
    */
  private def decodeStub(row: MediaRow): MediaFeatures = {
    val bytes = row.media
    var h = 1125899906842597L // deterministic FNV-ish rolling hash
    bytes.foreach { b => h = h * 31 + (b & 0xff) }
    val feat = Array.tabulate(8) { i =>
      (((h >>> (i * 8)) & 0xff).toFloat / 255.0f) - 0.5f
    }
    MediaFeatures(
      row.doc_id, row.kind, bytes.length, h,
      bytes.take(8).map(b => f"${b & 0xff}%02x").mkString, feat)
  }

  /** Batch feature extraction: mapPartitions keeps the per-batch shape
    * a real codec needs (amortized model/codec init per partition, not
    * per row) and preserves the input partitioning.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codec/model handles would be initialized ONCE here
      rows.map(decodeStub)
    }
  }
}
