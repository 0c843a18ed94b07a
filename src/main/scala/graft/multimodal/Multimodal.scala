package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / resize / frame-sample stages.
  *
  * The media codecs themselves are NOT in this container, so the decode
  * kernel is a clearly-marked deterministic STUB (`stubDecode`) — what is
  * real and tested is everything Spark-side: schema, batch iteration shape
  * (mapPartitions over row batches, the Scala analogue of `mapInPandas`),
  * partitioning (media rows are fat — partition count follows bytes, not
  * rows), and the metadata contract.
  */
object Multimodal {

  /** The typed media row: content plus the metadata a real pipeline keys on. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      content: Array[Byte],
      mime: String,
      width: Int,
      height: Int,
      duration_ms: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      content_hash: Long,
      // decoded-surface features (stub-derived, deterministic)
      mean_luma: Double,
      frames_sampled: Int)

  /** STUB decoder ­— stands in for an image/audio codec. Deterministic pure
    * function of the bytes: "luma" = mean byte value, "frames" = byte-length
    * buckets. A real deployment swaps this single function for JNI/FFmpeg.
    */
  def stubDecode(content: Array[Byte]): (Double, Int) = {
    if (content == null || content.isEmpty) (0.0, 0)
    else {
      var sum = 0L
      var i = 0
      while (i < content.length) { sum += (content(i) & 0xff); i += 1 }
      (sum.toDouble / content.length, 1 + content.length / 1024)
    }
  }

  /** Decode + featurize in partition-sized batches — one decoder init per
    * partition (the expensive part with real codecs), streaming rows
    * through it. This is the Scala shape of a Pandas `mapInPandas` UDF:
    * iterator-in/iterator-out, no per-row setup.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real pipeline: val codec = Codec.init() — once per partition
      rows.map { r =>
        val (luma, frames) = stubDecode(r.content)
        MediaFeatures(
          r.media_id, r.kind,
          if (r.content == null) 0L else r.content.length.toLong,
          scala.util.hashing.MurmurHash3.bytesHash(if (r.content == null) Array.empty else r.content).toLong,
          math.round(luma * 10000.0) / 10000.0,
          frames)
      }
    }
  }

  /** Deterministic synthetic media table derived from the documents table
    * (bytes = UTF-8 of text; metadata from hashes) — the test fixture for
    * the plumbing above.
    */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(xxhash64(col("doc_id")), lit(3L)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime"),
      (pmod(xxhash64(col("doc_id"), lit("w")), lit(1920L)) + 1).cast("int").as("width"),
      (pmod(xxhash64(col("doc_id"), lit("h")), lit(1080L)) + 1).cast("int").as("height"),
      (pmod(xxhash64(col("doc_id"), lit("d")), lit(600000L))).cast("int").as("duration_ms"))
      .as[MediaRow]
  }

  /** Repartition media by BYTES, not rows: with multi-MB rows the default
    * row-count-based partitioning produces wildly uneven tasks. Spark-first:
    * compute cumulative-size buckets with a running sum over a cheap
    * pre-pass and `repartitionByRange` on the bucket.
    */
  def repartitionByBytes(media: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val sized = media.withColumn("__bytes", length(col("content")).cast("long"))
    val total = sized.agg(sum("__bytes")).collect()(0).getLong(0)
    val parts = math.max(1, (total / math.max(targetBytesPerPartition, 1L)).toInt)
    sized
      .withColumn("__bucket", pmod(xxhash64(col("media_id")), lit(parts.toLong)))
      .repartitionByRange(parts, col("__bucket"))
      .drop("__bytes", "__bucket")
  }
}
