package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Real image decode via the JDK's ImageIO: pixel-derived features that
  * byte statistics could not produce, genuine bilinear resize, and the
  * end-to-end m_image_decode operator.
  */
class ImageDecodeSpec extends SparkSpec {

  private def solidPng(rgb: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("pixel decode is real: solid image has ZERO luma entropy") {
    // the PNG BYTES of a solid image are compressed and byte-entropic;
    // only decoding to pixels yields one luma bin and entropy 0
    val png = solidPng(0x808080, 20, 20)
    val (entropy, hist) = Multimodal.ImageIoCodec.decodeFeatures(png)
    assert(entropy == 0.0, s"pixel entropy $entropy")
    assert(hist.count(_ > 0) == 1 && hist.sum == 400L)
    val (byteEntropy, _) = Multimodal.MediaCodec.ByteStats.decodeFeatures(png)
    assert(byteEntropy > 1.0, "byte stats would NOT show zero entropy")
    // jpeg decodes through the same codec
    val img = Multimodal.decodeImage(png).get
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val (jentropy, jhist) = Multimodal.ImageIoCodec.decodeFeatures(bos.toByteArray)
    assert(jhist.sum == 400L && jentropy < 0.5) // jpeg noise stays tiny
  }

  test("bilinear resize preserves dimensions and approximate mean luma") {
    val png = Multimodal.syntheticPng(77L, 32, 24)
    val thumbBytes = Multimodal.resizePng(png, 8, 6).get
    val thumb = Multimodal.decodeImage(thumbBytes).get
    assert(thumb.getWidth == 8 && thumb.getHeight == 6)
    def meanLuma(img: java.awt.image.BufferedImage): Double = {
      var s = 0L
      (0 until img.getHeight).foreach(y => (0 until img.getWidth).foreach {
        x =>
          val rgb = img.getRGB(x, y)
          s += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
      })
      s.toDouble / (img.getWidth * img.getHeight)
    }
    val orig = meanLuma(Multimodal.decodeImage(png).get)
    val small = meanLuma(thumb)
    assert(math.abs(orig - small) < 12.0,
      s"resize skewed luma: $orig vs $small")
    // undecodable payloads degrade, not fail
    assert(Multimodal.resizePng("not an image".getBytes, 8, 6).isEmpty)
  }

  test("audio decode is real: silence has zero RMS, tones match DSP math") {
    // pure silence → all samples 0 → rms 0, zero entropy in one bin
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val silentPcm = new Array[Byte](2000)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(silentPcm), fmt, 1000L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val silent = bos.toByteArray
    val (_, _, samples) = Multimodal.decodeWavSamples(silent).get
    assert(samples.length == 1000 && samples.forall(_ == 0))
    val (entropy, hist) = Multimodal.WavCodec.decodeFeatures(silent)
    assert(entropy == 0.0 && hist(0) == 1000L)
    // a pure 440 Hz sine at amplitude A has RMS ≈ A/sqrt(2) and
    // zero-crossing rate ≈ 2f/rate — decoded values must match the math
    val rate = 8000
    val n = 4000
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val v = (math.sin(2 * math.Pi * 440 * i / rate) * 12000).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais2 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais2,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos2)
    val (r2, ch2, tone) = Multimodal.decodeWavSamples(bos2.toByteArray).get
    assert(r2 == 8000 && ch2 == 1)
    val rms = math.sqrt(tone.map(s => s.toDouble * s).sum / tone.length)
    assert(math.abs(rms - 12000 / math.sqrt(2)) < 100, s"rms $rms")
    val crossings = (1 until tone.length)
      .count(i => (tone(i) >= 0) != (tone(i - 1) >= 0))
    assert(math.abs(crossings.toDouble / n - 2.0 * 440 / rate) < 0.01)
    // undecodable audio degrades to byte stats, never fails
    assert(Multimodal.decodeWavSamples("nope".getBytes).isEmpty)
  }

  test("m_audio_decode: deterministic sample features for every asset") {
    val dir = "/root/testdata/sf0.001"
    val out = Registry.byName("m_audio_decode").fn(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("sample_rate") == 8000)
      assert(r.getAs[Int]("channels") == 1)
      assert(r.getAs[Int]("n_samples") == 2000)
      assert(r.getAs[String]("detected_format") == "wav")
      // two-tone mix at 9000+4000 amplitude: RMS in a sane band
      val rms = r.getAs[Double]("rms")
      assert(rms > 4000 && rms < 12000, s"rms $rms")
      assert(r.getAs[Int]("peak") <= 13000)
      val zc = r.getAs[Double]("zero_cross_rate")
      assert(zc > 0.0 && zc < 1.0)
    }
    val again = Registry.byName("m_audio_decode").fn(spark, dir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("m_image_decode: deterministic pixel features for every asset") {
    val dir = "/root/testdata/sf0.001"
    val out = Registry.byName("m_image_decode").fn(spark, dir).collect()
    assert(out.length == math.min(400,
      Tables.tbl(spark, dir, "documents").count()).toInt)
    out.foreach { r =>
      assert(r.getAs[Int]("width") == 32 && r.getAs[Int]("height") == 24)
      assert(r.getAs[Int]("thumb_w") == 8 && r.getAs[Int]("thumb_h") == 6)
      assert(r.getAs[Boolean]("thumb_encoded"))
      val m = r.getAs[Double]("luma_mean")
      assert(m > 0.0 && m < 255.0)
      // synthetic noise: thumbnail mean stays near the original mean
      assert(math.abs(m - r.getAs[Double]("thumb_luma_mean")) < 20.0)
      // pixel luma entropy of uniform noise is high (near 4 bits)
      assert(r.getAs[Double]("luma_entropy") > 3.0)
    }
    val again = Registry.byName("m_image_decode").fn(spark, dir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
