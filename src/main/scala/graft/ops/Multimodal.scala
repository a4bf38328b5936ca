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

  /** STUB decode: a real implementation would decode `media` with an
    * image/audio library here (unavailable in this container). The
    * deterministic fake — an 8-bin byte histogram normalized by
    * length — preserves everything the Spark contract cares about:
    * per-partition iteration, fixed-size Array[Float] output, no
    * driver round-trip.
    */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      // real decoder init would happen once per partition here
      it.map { r =>
        val hist = new Array[Float](FeatureDim)
        var i = 0
        while (i < r.media.length) {
          hist((r.media(i) & 0xff) % FeatureDim) += 1.0f
          i += 1
        }
        var j = 0
        while (j < FeatureDim) {
          hist(j) = if (r.media.length == 0) 0.0f else hist(j) / r.media.length
          j += 1
        }
        MediaFeatures(r.doc_id, r.media_type, r.media.length, hist)
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
