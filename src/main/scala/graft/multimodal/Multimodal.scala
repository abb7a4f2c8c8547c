package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal (image/audio/video) column plumbing.
 *
 * Media payloads are opaque `binary` columns with typed metadata
 * alongside. The decode / feature-extract step runs batched per
 * partition (`mapPartitions` — the Scala analog of `mapInPandas`:
 * iterator-in/iterator-out, one decoder instance per partition, no
 * per-row setup cost). The actual codec is STUBBED with a
 * deterministic fake (this container has no image/audio libs); the
 * Spark-side plumbing — schema, batching, partition routing — is real
 * and tested, and the fake is md5-derived so an external SQL oracle
 * can verify the full distributed path.
 */
object Multimodal {

  /** Input: a media record as landed (payload + source metadata). */
  final case class MediaRecord(media_id: Long, payload: Array[Byte], media_type: String)

  /** Output: decoded/extracted features. */
  final case class DecodedMedia(
      media_id: Long,
      media_type: String,
      byte_len: Long,
      width: Long,
      height: Long,
      channels: Long,
      // which executor-side batch this row was decoded in — proves the
      // iterator batching actually ran (not checked for equality).
      format: String)

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** Portable hash64 of raw bytes: first 8 md5 hex chars, base 16. */
  def hash64Bytes(bytes: Array[Byte]): Long =
    java.lang.Long.parseLong(md5Hex(bytes).substring(0, 8), 16)

  /**
   * STUB decoder: a real implementation would call the codec here
   * (e.g. libjpeg / ffmpeg bindings) on each payload. The fake derives
   * plausible dimensions deterministically from the payload digest so
   * the pipeline is end-to-end verifiable without the native libs.
   */
  def fakeDecode(r: MediaRecord): DecodedMedia = {
    val h = hash64Bytes(r.payload)
    DecodedMedia(
      media_id = r.media_id,
      media_type = r.media_type,
      byte_len = r.payload.length.toLong,
      width = 320L + h % 1600L,
      height = 240L + (h / 7L) % 840L,
      channels = 1L + h % 3L,
      format = if (h % 2L == 0L) "rgb" else "yuv")
  }

  /**
   * Batched decode over partitions. At scale, `repartition` upstream by
   * byte-size bucket keeps decode batches balanced (video >> thumbnail).
   */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(fakeDecode))
  }

  /**
   * Frame-sample plumbing for video-shaped payloads: emit `n` sampled
   * "frames" per record (here: deterministic slices of the digest) —
   * the flatMap shape a real frame sampler would have.
   */
  final case class Frame(media_id: Long, frame_no: Long, frame_digest: String)

  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val d = md5Hex(r.payload)
      (0 until n).map(i => Frame(r.media_id, i.toLong, d.substring(i, i + 8)))
    }
  }

  /**
   * Resize plumbing: fit decoded dimensions into a square box,
   * preserving aspect ratio, in pure integer arithmetic (so any engine
   * reproduces it exactly). A real implementation would hand
   * (payload, out_width, out_height) to the codec; the metadata math —
   * the part that routes work and sizes buffers — is the Spark side.
   */
  def resizeMeta(decoded: DataFrame, box: Int): DataFrame =
    decoded
      .withColumn("out_width",
        expr(s"(width * $box) DIV GREATEST(width, height)"))
      .withColumn("out_height",
        expr(s"(height * $box) DIV GREATEST(width, height)"))

  /** Extracted feature row: 4 unit-interval features per payload. */
  final case class MediaFeatures(
      media_id: Long, f0: Double, f1: Double, f2: Double, f3: Double)

  /**
   * Batched feature extraction (mapPartitions, one "model" instance
   * per partition — the embedding-model shape). STUB features are
   * md5-lane fractions in [0,1); division by 2^32 is exact in binary,
   * so the distributed result is bit-identical to the SQL oracle.
   */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "model load" happens here (stubbed)
      it.map { r =>
        val d = md5Hex(r.payload)
        def lane(i: Int): Double =
          java.lang.Long.parseLong(d.substring(i * 8, i * 8 + 8), 16)
            .toDouble / 4294967296.0
        MediaFeatures(r.media_id, lane(0), lane(1), lane(2), lane(3))
      }
    }
  }

  /**
   * Demo pipeline over the documents table: treat the utf-8 text bytes
   * as an opaque payload, route into size buckets, batch-decode.
   */
  def decodeDocumentsAsMedia(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        encode(col("text"), "utf-8").as("payload"),
        lit("image").as("media_type"))
      .as[MediaRecord]
    decodeAll(media).toDF()
  }
}
