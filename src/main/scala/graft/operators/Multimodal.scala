package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches. Beyond-reference surface.
  *
  * Image blobs (media_type starting `image/`) are decoded FOR REAL via the JDK's
  * `javax.imageio` (PNG/BMP/GIF/JPEG — no external libraries needed):
  * true dimensions plus mean luminance. Audio/video decode remains a
  * deliberate STUB ([[decodeStub]] — no codec libraries in this
  * environment): deterministic fake features from the bytes. Everything
  * around both — the schema contract, the typed Dataset batch shape,
  * partition-local processing with no driver involvement — is the real
  * production plumbing; swapping the stub for a JNI/FFmpeg decoder
  * changes one function.
  */
object Multimodal {

  /** One media blob. `blob` stays opaque binary end-to-end. */
  case class MediaBlob(doc_id: Long, media_type: String, blob: Array[Byte])

  /** Extracted features; deterministic given the blob. */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           width: Int, height: Int, mean_byte: Double)

  /** STUB decoder: a real implementation would parse the container header
    * and decode frames. The fake is a pure function of the bytes so tests
    * and oracles are stable: dimensions from the byte length, mean over
    * the first 64 bytes. */
  def decodeStub(b: MediaBlob): MediaFeatures = {
    val n = b.blob.length.toLong
    val head = b.blob.take(64)
    val mean = if (head.isEmpty) 0.0
               else head.map(x => (x & 0xFF).toDouble).sum / head.length
    MediaFeatures(b.doc_id, b.media_type,
      n, (64 + n % 512).toInt, (64 + (n * 31) % 512).toInt, mean)
  }

  /** REAL image decode via the JDK's ImageIO: actual width/height and
    * mean luminance (ITU-R BT.601 integer weights over all pixels).
    * Returns null features (size only) for bytes ImageIO cannot parse —
    * corrupt blobs must not kill a 100 TB job. */
  def decodeImage(b: MediaBlob): MediaFeatures = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.blob))
      catch { case _: Throwable => null }
    if (img == null)
      MediaFeatures(b.doc_id, b.media_type, b.blob.length.toLong, -1, -1, -1.0)
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          // integer luma (BT.601): deterministic, no float accumulation
          sum += (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
            114 * (rgb & 0xFF)) / 1000
          x += 1
        }
        y += 1
      }
      MediaFeatures(b.doc_id, b.media_type, b.blob.length.toLong, w, h,
        sum.toDouble / (w.toLong * h))
    }
  }

  /** Typed dispatch: real decoder where the JDK has one, stub elsewhere.
    * (Audio container METADATA also decodes for real — see
    * [[extractAudioFeatures]]; it has its own typed output.) */
  def decode(b: MediaBlob): MediaFeatures =
    if (b.media_type != null && b.media_type.startsWith("image/")) decodeImage(b)
    else decodeStub(b)

  /** Audio container metadata, decoded FOR REAL via the JDK's
    * `javax.sound.sampled` (WAV/AIFF/AU ship with the JDK). */
  case class AudioFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           sample_rate: Double, channels: Int,
                           frames: Long, duration_s: Double)

  /** Parses the audio container header: sample rate, channels, frame
    * count, duration. Unparseable bytes yield -1 markers (corrupt blobs
    * must not kill the job). */
  def decodeAudio(b: MediaBlob): AudioFeatures =
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(b.blob))
      val fmt = aff.getFormat
      val frames = aff.getFrameLength.toLong
      AudioFeatures(b.doc_id, b.media_type, b.blob.length.toLong,
        fmt.getSampleRate.toDouble, fmt.getChannels, frames,
        if (fmt.getSampleRate > 0 && frames >= 0)
          frames.toDouble / fmt.getSampleRate else -1.0)
    } catch {
      case _: Throwable =>
        AudioFeatures(b.doc_id, b.media_type, b.blob.length.toLong,
          -1.0, -1, -1L, -1.0)
    }

  /** Partition-local audio metadata extraction — same batch shape as
    * [[extractFeatures]]. */
  def extractAudioFeatures(blobs: Dataset[MediaBlob]): Dataset[AudioFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(decodeAudio))
  }

  /** Batch feature extraction: partition-local map over a typed Dataset.
    * The `mapPartitions` boundary is where a real decoder would amortize
    * per-batch setup (model load, codec init) — the Scala analog of a
    * pandas-batched UDF. */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition setup would go here (codec/model init)
      it.map(decode)
    }
  }

  /** Frame-sample stub: pretend every `stride` bytes starts a frame and
    * keep every k-th — demonstrates the explode-to-frames shape
    * (one input row → many frame rows) used by video pipelines. */
  def sampleFrames(blobs: Dataset[MediaBlob], stride: Int, everyK: Int): DataFrame = {
    val df = blobs.toDF()
    df.select(col("doc_id"), col("media_type"),
        posexplode(sequence(lit(0),
          // int division: `/` on Columns is fp division, which sequence()
          // rejects — floor back to int
          floor((length(col("blob")) - 1) / stride).cast("int"))).as(Seq("frame_idx", "offset")))
      .filter(col("frame_idx") % everyK === 0)
      .select(col("doc_id"), col("media_type"), col("frame_idx"),
        (col("offset") * stride).cast("long").as("byte_offset"))
  }

  /** Demo pipeline over `documents`: synthesize a binary blob from the
    * text (UTF-8 bytes) and run the real plumbing over it. */
  def documentBlobFeatures(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val blobs = documents
      .select(col("doc_id"), lit("text/utf-8").as("media_type"),
        encode(col("text"), "UTF-8").as("blob"))
      .as[MediaBlob]
    extractFeatures(blobs).toDF()
  }
}
