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
          luma, // raw IEEE mean — callers round for display/compare
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
      // kind keyed on doc_id % 3 (not a hash) so an independent engine can
      // re-derive it — part of the q30 cross-engine oracle contract
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3L)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime"),
      (pmod(xxhash64(col("doc_id"), lit("w")), lit(1920L)) + 1).cast("int").as("width"),
      (pmod(xxhash64(col("doc_id"), lit("h")), lit(1080L)) + 1).cast("int").as("height"),
      (pmod(xxhash64(col("doc_id"), lit("d")), lit(600000L))).cast("int").as("duration_ms"))
      .as[MediaRow]
  }

  /** Repartition media by BYTES, not rows: with multi-MB rows the default
    * row-count-based partitioning produces wildly uneven tasks.
    *
    * True cumulative-size bucketing, fully distributed: a slim pre-pass
    * sums bytes per input partition (P rows to the driver — partition
    * counts, never data), the running per-partition offsets are folded into
    * a column expression, and each row's GLOBAL cumulative byte position is
    * then offset + a per-partition running sum (window partitioned by the
    * input partition id — parallel, no global sort). Bucket =
    * cumBytes / target, so every BUCKET holds ≤ target bytes plus at most
    * one straddling row.
    *
    * Placement is EXACT — one bucket per output partition, so max task
    * bytes ≤ target + max(rowBytes) regardless of skew. Two wrong-but-
    * tempting placements: repartitionByRange samples ROWS, so under
    * byte/row skew (many tiny rows in a few buckets, few fat rows spread
    * over many) the row-weighted boundaries merge unboundedly many
    * byte-heavy buckets into one partition; plain hash-on-bucket-id throws
    * P balls into P bins (multi-bucket collisions, empty partitions).
    * Instead each bucket id is mapped to a SALT probed (with Spark's own
    * Murmur3 `hash`, the same function the hash exchange applies) to land
    * in exactly that partition — the salt table is partition-count-sized,
    * found with one tiny job, and broadcast.
    *
    * The two passes must observe the same partition layout, so the input is
    * required to be deterministic (a table scan / derived plan — true for
    * every source this engine produces). An empty input returns unchanged.
    */
  def repartitionByBytes(media: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val target = math.max(targetBytesPerPartition, 1L)
    val sized = media
      .withColumn("__bytes", coalesce(length(col("content")).cast("long"), lit(0L)))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__ord", monotonically_increasing_id())
    // slim pre-pass: bytes per input partition (content column pruned away)
    val perPid = sized.groupBy("__pid").agg(sum("__bytes").as("b"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = perPid.map(_._2).sum
    if (total == 0L) return media
    val offsets = perPid.scanLeft((0, 0L)) { case ((_, acc), (pid, b)) => (pid, acc + b) }
      .sliding(2).collect { case Array((_, off), (pid, _)) => pid -> off }.toSeq
    // P offset rows ride a broadcast join (NOT an O(P) when-chain, which
    // would blow Catalyst up at the thousands of input partitions this
    // function exists for)
    import media.sparkSession.implicits._
    val offsetsDf = offsets.toDF("__opid", "__off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("__ord")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val parts = math.max(1, (total / target).toInt + (if (total % target == 0) 0 else 1))
    // per target partition p, the smallest long whose Spark hash lands in p:
    // pmod(hash(salt), parts) is EXACTLY the exchange's placement rule, so
    // routing bucket b through salt(b) puts it alone in partition b. A
    // candidate pool of 64·parts leaves E[uncovered partitions] ≈ parts·e⁻⁶⁴;
    // the loop widens the pool in the (theoretical) uncovered case.
    var pool = 64L * parts
    var saltOf = Map.empty[Int, Long]
    while (saltOf.size < parts) {
      saltOf = media.sparkSession.range(pool)
        .select(col("id"), pmod(hash(col("id")), lit(parts)).as("p"))
        .groupBy("p").agg(min("id").as("s"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      pool *= 4
    }
    val saltDf = saltOf.toSeq.toDF("__b", "__salt")
    sized
      .join(broadcast(offsetsDf), col("__pid") === col("__opid"), "left")
      // bucket by the cumulative bytes BEFORE this row, so a fat row starts
      // in the bucket where the previous row ended (never splits). Clamped
      // to parts-1: a trailing ZERO-byte row whose preceding cumulative
      // bytes equal `total` would otherwise compute bucket == parts when
      // total divides target exactly — a bucket with no salt row, and the
      // inner salt join below would silently drop the row
      .withColumn("__cum",
        coalesce(sum("__bytes").over(w), lit(0L)) + coalesce(col("__off"), lit(0L)))
      .withColumn("__bucket",
        least((col("__cum") / target).cast("int"), lit(parts - 1)))
      .join(broadcast(saltDf), col("__bucket") === col("__b"))
      .repartition(parts, col("__salt"))
      .drop("__bytes", "__pid", "__ord", "__cum", "__bucket", "__opid", "__off", "__b", "__salt")
  }

  // --------------------------------------------------- resize / frame-sample

  /** STUB resize kernel — stands in for an image scaler. Deterministic pure
    * function: keeps every ceil(srcW/dstW)-th byte (a nearest-neighbor
    * downsample of the byte stream), so output size tracks the scale factor
    * the way a real resampler's would. Swap for JNI/libvips in production.
    */
  def stubResize(content: Array[Byte], srcW: Int, dstW: Int): Array[Byte] = {
    if (content == null || content.isEmpty || dstW >= srcW || dstW <= 0) content
    else {
      val step = math.max(1, math.ceil(srcW.toDouble / dstW).toInt)
      val out = new Array[Byte]((content.length + step - 1) / step)
      var i = 0
      var j = 0
      while (i < content.length) { out(j) = content(i); i += step; j += 1 }
      out
    }
  }

  /** Resize stage: batch-iterated like [[extractFeatures]] (one decoder/
    * scaler init per partition in a real pipeline), metadata updated to the
    * target geometry. Content stays an opaque binary column throughout.
    */
  def resize(media: Dataset[MediaRow], targetWidth: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    // a non-positive target would pass the width check below and rewrite
    // rows as width=0 with full-size content — corrupt metadata, no error
    require(targetWidth > 0, "targetWidth must be positive")
    media.mapPartitions { rows =>
      // real pipeline: val scaler = Scaler.init(targetWidth) — once per partition
      rows.map { r =>
        if (r.width <= targetWidth) r
        else r.copy(
          content = stubResize(r.content, r.width, targetWidth),
          width = targetWidth,
          height = math.max(1, (r.height.toLong * targetWidth / math.max(r.width, 1)).toInt))
      }
    }
  }

  final case class FrameRow(
      media_id: Long,
      frame_idx: Int,
      frame_ts_ms: Int,
      frame: Array[Byte])

  /** Frame sampling: one frame every `everyMs` of duration, each frame a
    * deterministic 1 KB slice of the content (the stub for a real decoder's
    * keyframe grab). Iterator-based flatMap — a 2-hour video emits its
    * frames lazily, never materializing them as one in-memory list, and fat
    * inputs should be [[repartitionByBytes]]-balanced first so frame
    * explosion stays even across tasks.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Int = 1000): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    require(everyMs > 0, "everyMs must be positive")
    media.filter(col("kind") === "video").flatMap { r =>
      val n = math.max(1, r.duration_ms / everyMs)
      val bytes = if (r.content == null) Array.empty[Byte] else r.content
      (0 until n).iterator.map { i =>
        val start = if (bytes.isEmpty) 0 else (i.toLong * bytes.length / n).toInt
        val end = math.min(bytes.length, start + 1024)
        FrameRow(r.media_id, i, i * everyMs, java.util.Arrays.copyOfRange(bytes, start, end))
      }
    }
  }
}
