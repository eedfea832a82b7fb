package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaBlob

/** Multimodal blob plumbing tests: typed Dataset batch boundary, stub
  * decoder determinism, frame-sampling explode shape. */
class MultimodalSuite extends SparkSpec {

  private def blobs = {
    val s = spark
    import s.implicits._
    // video/audio types: the stub-decoder path (image/* decodes for real)
    Seq(
      MediaBlob(1L, "video/fake", Array.tabulate(100)(_.toByte)),
      MediaBlob(2L, "video/fake", Array.tabulate(700)(i => (i % 251).toByte)),
      MediaBlob(3L, "audio/fake", Array.emptyByteArray)).toDS()
  }

  private def pngBytes(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("image/* blobs decode FOR REAL through the JDK's ImageIO") {
    val s = spark
    import s.implicits._
    val red = pngBytes(5, 3, (_, _) => 0xFF0000)       // luma 299*255/1000 = 76
    val gray = pngBytes(4, 4, (_, _) => 0x808080)      // luma 0x80 = 128
    val ds = Seq(
      MediaBlob(1L, "image/png", red),
      MediaBlob(2L, "image/png", gray),
      MediaBlob(3L, "image/png", "not an image".getBytes("UTF-8"))).toDS()
    val f = Multimodal.extractFeatures(ds).collect().sortBy(_.doc_id)
    assert(f(0).width == 5 && f(0).height == 3 && f(0).mean_byte == 76.0)
    assert(f(1).width == 4 && f(1).height == 4 && f(1).mean_byte == 128.0)
    assert(f(2).width == -1 && f(2).height == -1)      // corrupt: flagged, not fatal
    assert(f(2).n_bytes == 12L)
  }

  test("audio/* blobs decode container metadata FOR REAL (WAV via javax.sound)") {
    val s = spark
    import s.implicits._
    def wavBytes(rate: Float, channels: Int, seconds: Double): Array[Byte] = {
      val frames = (rate * seconds).toInt
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
      val pcm = new Array[Byte](frames * 2 * channels)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val ds = Seq(
      MediaBlob(1L, "audio/wav", wavBytes(8000f, 1, 1.0)),
      MediaBlob(2L, "audio/wav", wavBytes(16000f, 2, 0.5)),
      MediaBlob(3L, "audio/wav", "not audio".getBytes("UTF-8"))).toDS()
    val f = Multimodal.extractAudioFeatures(ds).collect().sortBy(_.doc_id)
    assert(f(0).sample_rate == 8000.0 && f(0).channels == 1 && f(0).frames == 8000L)
    assert(almostEqual(f(0).duration_s, 1.0))
    assert(f(1).sample_rate == 16000.0 && f(1).channels == 2 && f(1).frames == 8000L)
    assert(almostEqual(f(1).duration_s, 0.5))
    assert(f(2).channels == -1 && f(2).frames == -1L) // corrupt: flagged
  }

  test("extractFeatures is deterministic and partition-local") {
    val f = Multimodal.extractFeatures(blobs).collect().sortBy(_.doc_id)
    assert(f.map(_.doc_id).toSeq == Seq(1L, 2L, 3L))
    assert(f(0).n_bytes == 100L)
    assert(f(0).width == (64 + 100 % 512) && f(0).height == (64 + (100L * 31) % 512).toInt)
    // mean over first 64 bytes of 0..99 = mean(0..63)
    assert(almostEqual(f(0).mean_byte, (0 until 64).sum / 64.0))
    assert(f(2).n_bytes == 0L && f(2).mean_byte == 0.0)
    // rerun gives identical features (pure function of bytes)
    val g = Multimodal.extractFeatures(blobs).collect().sortBy(_.doc_id)
    assert(f.toSeq == g.toSeq)
  }

  test("sampleFrames explodes one row per kept frame") {
    val frames = Multimodal.sampleFrames(blobs, stride = 100, everyK = 2)
    val forDoc2 = frames.filter(col("doc_id") === 2).orderBy("frame_idx").collect()
    // 700 bytes / stride 100 -> frames 0..6, keep every 2nd -> 0,2,4,6
    assert(forDoc2.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2, 4, 6))
    assert(forDoc2.map(_.getAs[Long]("byte_offset")).toSeq == Seq(0L, 200L, 400L, 600L))
  }
}
