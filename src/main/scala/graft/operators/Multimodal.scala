package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star requirement): treat image/audio/
  * video as opaque `binary` columns with a typed metadata struct, and run
  * decode / feature-extraction / frame-sampling as batch-shaped
  * per-partition transforms.
  *
  * The DECODE itself is real for the PPM (P6) container: [[encodePpm]]
  * writes genuine binary PPM images (ASCII header + raw 8-bit RGB plane —
  * any image tool opens them) and [[decodePpm]] is a strict parser (magic,
  * comments, dims, maxval, the single-whitespace rule, exact plane length
  * — malformed input THROWS), so the x5c feature path runs header-parse →
  * pixel-walk on actual image bytes, oracle-exact end to end. Heavy
  * codecs (JPEG/WAV/MP4) are NOT in this environment; for those the
  * feature step keeps a clearly marked deterministic STUB (`fakeDecode`)
  * whose plumbing — schema (binary payload + metadata struct),
  * partition-preserving batch iteration (`mapPartitions`, the Scala
  * analogue of arrow-batched pandas UDFs: one buffer reused per
  * partition, not per row), fixed-width Array[Float] feature output ready
  * for the Vectors operators — is identical to the real decoder's and
  * fully tested.
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

  // ------------------------------------------- real PPM (P6) image codec
  /** Encode a REAL binary PPM (P6) image: ASCII header
    * `P6\n<w> <h>\n255\n` followed by the raw w·h·3-byte 8-bit RGB
    * plane (Netpbm format — any image viewer opens the result). Pixel
    * bytes cycle from the document's UTF-8 text, so the image content
    * is deterministic and a SQL oracle can reconstruct it from the
    * source row.
    */
  def encodePpm(text: String, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"encodePpm: dimensions must be positive ($w x $h)")
    val tb = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(tb.nonEmpty, "encodePpm: cannot cycle pixels from empty text")
    val header = s"P6\n$w $h\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val n = w * h * 3
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var j = 0
    while (j < n) { out(header.length + j) = tb(j % tb.length); j += 1 }
    out
  }

  /** A REAL image decoder: strict P6 parser — magic, `#` comments,
    * decimal dims, maxval 255, the spec's SINGLE whitespace before the
    * plane, and an EXACT plane length. Malformed input THROWS (the
    * repo's guard discipline): a decode pipeline that silently pads or
    * truncates a corrupt image poisons every feature downstream.
    * Returns (width, height, pixel plane).
    */
  def decodePpm(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    def die(msg: String): Nothing =
      throw new IllegalArgumentException(s"decodePpm: $msg")
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6')
      die("bad magic (not a binary PPM)")
    var pos = 2
    def skipWs(): Unit = {
      var again = true
      while (again) {
        again = false
        while (pos < payload.length &&
            Character.isWhitespace(payload(pos).toChar)) pos += 1
        if (pos < payload.length && payload(pos) == '#') {
          while (pos < payload.length && payload(pos) != '\n') pos += 1
          again = true
        }
      }
    }
    def int(what: String): Int = {
      skipWs()
      val s = pos
      while (pos < payload.length &&
          payload(pos) >= '0' && payload(pos) <= '9') pos += 1
      if (pos == s) die(s"expected $what at offset $s")
      var v = 0
      var i = s
      while (i < pos) {
        v = v * 10 + (payload(i) - '0')
        if (v < 0) die(s"$what overflows Int")
        i += 1
      }
      v
    }
    val w = int("width"); val h = int("height"); val maxval = int("maxval")
    if (w <= 0 || h <= 0) die(s"non-positive dimensions ${w}x$h")
    if (maxval != 255) die(s"unsupported maxval $maxval (8-bit only)")
    if (pos >= payload.length ||
        !Character.isWhitespace(payload(pos).toChar))
      die("missing the single whitespace after maxval")
    pos += 1 // exactly ONE whitespace, then the raw plane (the P6 spec)
    val n = w * h * 3
    if (payload.length - pos != n)
      die(s"pixel plane is ${payload.length - pos} bytes, expected $n")
    (w, h, java.util.Arrays.copyOfRange(payload, pos, pos + n))
  }

  /** Documents as REAL PPM images: deterministic small dimensions from
    * the doc id (w ∈ 4..8, h ∈ 3..5 — bounded payloads at any SF),
    * pixels from the text ([[encodePpm]]). Metadata carries the SAME
    * dims the header encodes, so the decode spec can cross-check
    * header-parsed against carried values.
    */
  def attachPpmPayload(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val w = (4 + id % 5).toInt
        val h = (3 + id % 3).toInt
        MediaRow(id, encodePpm(text, w, h), MediaMeta("ppm", w, h, 0L))
    }
  }

  case class PpmFeatures(doc_id: Long, width: Long, height: Long,
      n_px: Long, px_sum: Long, buckets: Array[Long])

  /** Feature extraction off ACTUAL DECODED PIXELS: parse each payload's
    * header, walk the pixel plane, fold pixel j into integer bucket
    * j mod dim (BIGINT sums — exact, so the whole decode → feature path
    * is oracle-checkable value-for-value, not just bounded). The parsed
    * header is cross-checked against the carried metadata — a payload
    * that decodes to different dims than its catalog row claims THROWS.
    */
  def extractPpmFeatures(media: Dataset[MediaRow],
      dim: Int = 16): Dataset[PpmFeatures] = {
    require(dim > 0, s"feature dim must be positive, got $dim")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = decodePpm(r.payload)
        if (w != r.meta.width || h != r.meta.height)
          throw new IllegalStateException(
            s"decodePpm: doc ${r.doc_id} header ${w}x$h contradicts " +
              s"catalog metadata ${r.meta.width}x${r.meta.height}")
        val sums = new Array[Long](dim)
        var j = 0
        while (j < px.length) { sums(j % dim) += px(j) & 0xff; j += 1 }
        PpmFeatures(r.doc_id, w.toLong, h.toLong, px.length.toLong,
          sums.sum, sums)
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
