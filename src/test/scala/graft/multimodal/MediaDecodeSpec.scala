package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.SparkSpec

/** Real codec decode via the JDK's built-in image/audio readers: test blobs
  * are GENERATED with the same JDK writers, so the round trip exercises the
  * actual PNG/JPEG/WAV byte formats — no fixtures, no external libs.
  */
class MediaDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def pngBytes(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def wavBytes(samples: Array[Short], rate: Float = 8000f): Array[Byte] = {
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("PNG decode: real dimensions and luminance layout (black left, white right)") {
    val bytes = pngBytes(64, 32)((x, _) => if (x < 32) 0x000000 else 0xffffff)
    val Some((w, h, feats)) = Multimodal.MediaDecoder.decodeImage(bytes, 64)
    assert(w == 64 && h == 32)
    // 8x8 grid: columns 0-3 over the black half -> -1; columns 4-7 -> +1
    for (row <- 0 until 8) {
      assert(feats(row * 8) < -0.95f, s"left cell row $row: ${feats(row * 8)}")
      assert(feats(row * 8 + 7) > 0.95f, s"right cell row $row: ${feats(row * 8 + 7)}")
    }
  }

  test("JPEG decode works through the same path") {
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x808080)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    val Some((w, h, feats)) = Multimodal.MediaDecoder.decodeImage(out.toByteArray, 16)
    assert(w == 16 && h == 16)
    // mid-gray everywhere: all cells near 0 (jpeg is lossy; wide tolerance)
    assert(feats.forall(f => math.abs(f) < 0.1f))
  }

  test("WAV decode: real duration and amplitude envelope (silence then tone)") {
    val silence = Array.fill[Short](4000)(0)
    val loud = Array.fill[Short](4000)(16384)
    val bytes = wavBytes(silence ++ loud) // 8000 samples at 8kHz = 1000 ms
    val Some((durationMs, feats)) = Multimodal.MediaDecoder.decodeWav(bytes, 8)
    assert(durationMs == 1000)
    // first 4 buckets silent, last 4 at |16384|/32768 = 0.5
    assert(feats.take(4).forall(_ < 0.01f))
    assert(feats.drop(4).forall(f => math.abs(f - 0.5f) < 0.01f))
  }

  test("extractMediaFeatures routes image/audio/garbage to the right decoder") {
    val png = pngBytes(8, 8)((_, _) => 0xffffff)
    val wav = wavBytes(Array.fill[Short](100)(1000))
    val junk = Array[Byte](1, 2, 3, 4)
    val df = Seq((1L, png), (2L, wav), (3L, junk)).toDF("id", "blob")
    val kinds = Multimodal.extractMediaFeatures(df, "blob", dims = 16)
      .select("id", "decode_kind").as[(Long, String)].collect().toMap
    assert(kinds == Map(1L -> "image", 2L -> "audio", 3L -> "stub"))
    // every row keeps a non-null feature vector (the stub covers junk)
    val nulls = Multimodal.extractMediaFeatures(df, "blob", dims = 16)
      .filter("features IS NULL").count()
    assert(nulls == 0)
  }

  /** A minimal-but-valid container prefix for each video format. */
  private def mp4Bytes: Array[Byte] =
    Array[Byte](0, 0, 0, 24) ++ "ftypisom".getBytes("ISO-8859-1") ++ Array.fill[Byte](12)(0)
  private def mkvBytes: Array[Byte] =
    Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte) ++ Array.fill[Byte](16)(0)
  private def aviBytes: Array[Byte] =
    "RIFF".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0) ++
      "AVI ".getBytes("ISO-8859-1") ++ Array.fill[Byte](8)(0)

  test("video containers are recognized but yield a typed unsupported status, never stub signal") {
    assert(Multimodal.MediaDecoder.videoContainer(mp4Bytes).contains("mp4"))
    assert(Multimodal.MediaDecoder.videoContainer(mkvBytes).contains("matroska"))
    assert(Multimodal.MediaDecoder.videoContainer(aviBytes).contains("avi"))
    assert(Multimodal.MediaDecoder.videoContainer(Array[Byte](1, 2, 3, 4)).isEmpty)
    val df = Seq((1L, mp4Bytes), (2L, mkvBytes), (3L, aviBytes),
      (4L, Array[Byte](9, 9, 9, 9))).toDF("id", "blob")
    val rows = Multimodal.extractMediaFeatures(df, "blob", dims = 16)
      .selectExpr("id", "decode_kind", "features IS NULL AS no_feats")
      .as[(Long, String, Boolean)].collect()
      .map { case (id, k, n) => id -> ((k, n)) }.toMap
    assert(rows(1L) == (("unsupported:mp4", true)))
    assert(rows(2L) == (("unsupported:matroska", true)))
    assert(rows(3L) == (("unsupported:avi", true)))
    // non-video junk still gets the declared stub WITH features
    assert(rows(4L)._1 == "stub" && !rows(4L)._2)
  }
}
