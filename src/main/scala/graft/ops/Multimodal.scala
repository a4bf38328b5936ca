package graft.ops

import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.10 / builder mandate):
  * image/audio/video travel as opaque `binary` columns with typed
  * metadata; decode / feature-extraction runs per-partition so a real
  * decoder (JNI image lib, ffmpeg pipe, …) amortizes its init across
  * a partition.
  *
  * The decode step itself is STUBBED — media codecs are not in this
  * container — with a deterministic fake (byte histogram) so the
  * Spark-side contract is fully real and testable: binary schema,
  * metadata struct, mapPartitions batch shape, fixed-size float
  * feature output, partition-count preservation.
  *
  * 100 TB notes: records flow through mapPartitions without
  * collect/driver involvement; feature vectors are fixed-size arrays
  * (columnar-friendly); a real pipeline would bound partition bytes
  * via `spark.sql.files.maxPartitionBytes` so one partition of media
  * blobs fits executor memory.
  */
object Multimodal extends OpModule {

  val FeatureDim = 8

  case class MediaRecord(doc_id: Long, media: Array[Byte], media_type: String,
      width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
      features: Array[Float])

  /** Pack the text corpus as fake media blobs + typed metadata
    * (binary payload is the UTF-8 bytes; width/height derived
    * deterministically from doc metadata). */
  def packMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("media"),
      when(col("lang").isin("en", "de"), "image/png")
        .when(col("lang") === "zh", "audio/wav")
        .otherwise("video/mp4").as("media_type"),
      (pmod(col("n_chars"), lit(64)) + 1).cast("int").as("width"),
      (pmod(col("doc_id"), lit(64)) + 1).cast("int").as("height"))

  /** Binary PPM (P6) decoder — pure JVM, no codec libraries, so the
    * image path of the pipeline is REAL end-to-end. Returns
    * (width, height, rgb bytes) or None for malformed input.
    */
  def decodePpm(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    var pos = 0
    def skipWs(): Unit = {
      var in = true
      while (in && pos < bytes.length) {
        val c = bytes(pos).toChar
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else in = false
      }
    }
    def token(): String = {
      skipWs()
      val start = pos
      while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
      new String(bytes, start, pos - start, "US-ASCII")
    }
    try {
      if (token() != "P6") return None
      val (w, h, maxv) = (token().toInt, token().toInt, token().toInt)
      if (w <= 0 || h <= 0 || maxv != 255) return None
      pos += 1 // single whitespace after maxval
      val n = w * h * 3
      if (bytes.length - pos < n) return None
      Some((w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + n)))
    } catch { case _: NumberFormatException => None }
  }

  /** Feature extraction. `image/ppm` media decodes for real (P6
    * parser above → per-channel means + dimensions); other media
    * types fall back to the STUB path — a real pipeline would invoke
    * the codec library here (unavailable in this container) — a
    * deterministic byte histogram that keeps the Spark contract fully
    * exercised: per-partition iteration, fixed-size Array[Float]
    * output, no driver round-trip.
    */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      // real decoder init (codec contexts, buffers) happens once per
      // partition here
      it.map { r =>
        val feats = new Array[Float](FeatureDim)
        val decoded = if (r.media_type == "image/ppm") decodePpm(r.media) else None
        decoded match {
          case Some((w, h, rgb)) =>
            val sums = new Array[Long](3)
            var i = 0
            while (i < rgb.length) { sums(i % 3) += rgb(i) & 0xff; i += 1 }
            val px = (w * h).toFloat
            feats(0) = sums(0) / px / 255f // mean R
            feats(1) = sums(1) / px / 255f // mean G
            feats(2) = sums(2) / px / 255f // mean B
            feats(3) = (sums(0) + sums(1) + sums(2)) / (3f * px * 255f) // brightness
            feats(4) = w.toFloat
            feats(5) = h.toFloat
            feats(6) = w.toFloat / h
            feats(7) = 1.0f // decoded-for-real marker
          case None => // STUB: normalized byte histogram
            var i = 0
            while (i < r.media.length) {
              feats((r.media(i) & 0xff) % FeatureDim) += 1.0f
              i += 1
            }
            var j = 0
            while (j < FeatureDim) {
              feats(j) = if (r.media.length == 0) 0.0f else feats(j) / r.media.length
              j += 1
            }
        }
        MediaFeatures(r.doc_id, r.media_type, r.media.length, feats)
      }
    }
  }

  def mediaPipeline(docs: DataFrame): Dataset[MediaFeatures] = {
    val spark = docs.sparkSession
    import spark.implicits._
    extractFeatures(packMedia(docs).as[MediaRecord])
  }

  override def ops: Seq[Op] = Seq(
    // no oracle: the decode stub is Spark-side only; MultimodalSpec
    // pins schema, determinism, and partition behavior
    Op("llm_multimodal_decode",
      (s, d) => mediaPipeline(Tables.documents(s, d))
        .toDF()
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          round(element_at(col("features"), 1), 6).as("f0"),
          round(element_at(col("features"), 2), 6).as("f1"))
        .orderBy("doc_id"),
      None)
  )
}
