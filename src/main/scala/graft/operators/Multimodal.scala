package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star requirement): treat image/audio/
  * video as opaque `binary` columns with a typed metadata struct, and run
  * decode / feature-extraction / frame-sampling as batch-shaped
  * per-partition transforms.
  *
  * The actual media codecs are NOT in this environment, so the decode step
  * is a clearly marked deterministic STUB (`fakeDecode`) — what is real and
  * tested is the Spark-side plumbing: schema (binary payload + metadata
  * struct), partition-preserving batch iteration (`mapPartitions`, the
  * Scala analogue of arrow-batched pandas UDFs: one buffer reused per
  * partition, not per row), and fixed-width feature output
  * (Array[Float]) ready for the Vectors operators.
  *
  * Scale: mapPartitions keeps the decode embarrassingly parallel and
  * amortizes any per-batch model/codec init across the partition; payloads
  * never pass through the driver.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)
  case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Int,
      features: Array[Float])
  case class FrameSample(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Attach a binary payload + metadata struct to documents. The payload is
    * the UTF-8 bytes of `text` standing in for encoded media; metadata is
    * derived deterministically.
    */
  def attachPayload(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(
          when(col("doc_id") % 3 === 0, "png")
            .when(col("doc_id") % 3 === 1, "wav").otherwise("mp4").as("format"),
          (col("n_chars") % 640).cast("int").as("width"),
          (col("n_chars") % 480).cast("int").as("height"),
          (col("n_chars") * 10).cast("long").as("durationMs")).as("meta"))
      .as[MediaRow]
  }

  /** STUB decode: a real implementation would hand `payload` to an image/
    * audio codec here. This deterministic fake derives `dim` float features
    * from byte content so the downstream plumbing (schema, batching,
    * similarity search over the features) is fully exercisable and
    * reproducible. Replace the body with a codec call in production.
    */
  private[operators] def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Batch feature extraction over partitions: the per-partition iterator is
    * consumed lazily (no materialization of the whole partition) and any
    * expensive init (codec/model handle) would be created once here, before
    * the iterator mapping — the exact shape a pandas-UDF batch gets.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    // fail on the driver: dim = 0 would surface as an executor-side
    // ArithmeticException (i % 0) after task retries, dim < 0 as a
    // NegativeArraySizeException
    require(dim > 0, s"feature dim must be positive, got $dim")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handle, model weights, ...)
      rows.map { r =>
        MediaFeatures(r.doc_id, r.meta.format, r.payload.length,
          fakeDecode(r.payload, dim))
      }
    }
  }

  /** Deterministic frame sampling for "video" payloads: slice the byte
    * stream into `n` evenly spaced frames (stub for keyframe extraction);
    * one input row explodes to n output rows, still partition-local.
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int = 4): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.meta.format == "mp4").flatMap { r =>
      val len = r.payload.length
      (0 until n).iterator.map { k =>
        val from = (len.toLong * k / n).toInt
        val until = (len.toLong * (k + 1) / n).toInt
        FrameSample(r.doc_id, k, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }
}
