package graft

import graft.operators.{Multimodal, Video}
import org.apache.spark.sql.functions._

/** Real video decode, pure JDK: the RIFF/AVI container roundtrip, per-frame
  * JPEG pixel decode, the motion metric's static/moving separation, the
  * ISO-BMFF metadata parser, and the end-to-end m_video_decode operator.
  */
class VideoSpec extends SparkSpec {

  private def solidJpeg(gray: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.setRGB(x, y, (gray << 16) | (gray << 8) | gray)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("AVI roundtrip: header metadata and every frame survive exactly") {
    val frames = Seq(solidJpeg(10, 20, 12), solidJpeg(100, 20, 12),
      solidJpeg(200, 20, 12))
    val avi = Video.writeMjpegAvi(frames, width = 20, height = 12, fps = 25)
    assert(Multimodal.sniffFormat(avi) == "avi")
    val (meta, got) = Video.parseAvi(avi).get
    assert(meta.width == 20 && meta.height == 12)
    assert(meta.totalFrames == 3 && math.abs(meta.fps - 25.0) < 1e-6)
    assert(got.length == 3)
    // frame payloads are byte-identical through the container
    got.zip(frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("frames decode to PIXELS: solid-gray frames yield exact luma") {
    val avi = Video.writeMjpegAvi(
      Seq(solidJpeg(0, 16, 16), solidJpeg(255, 16, 16)), 16, 16, fps = 10)
    val (_, frames) = Video.parseAvi(avi).get
    // JPEG of a solid image decodes to that value (DC-only blocks)
    assert(Video.frameLumaMean(frames(0)).get < 2.0)
    assert(Video.frameLumaMean(frames(1)).get > 253.0)
  }

  test("motion metric separates static from moving video via decode") {
    val static = Video.syntheticAvi(7L, 24, 16, nFrames = 6, fps = 10,
      motionStep = 0)
    val moving = Video.syntheticAvi(7L, 24, 16, nFrames = 6, fps = 10,
      motionStep = 6)
    val (_, _, _, mStatic) = Video.videoFeatures(static, sampleN = 4).get
    val (metaM, sampled, lumas, mMoving) =
      Video.videoFeatures(moving, sampleN = 4).get
    // identical frames → byte-identical JPEGs → motion EXACTLY zero
    assert(mStatic == 0.0)
    assert(mMoving > 0.1)
    assert(metaM.totalFrames == 6 && sampled == 4 && lumas.length == 4)
  }

  test("frame sampling is even and bounded") {
    val avi = Video.syntheticAvi(3L, 24, 16, nFrames = 12, fps = 10,
      motionStep = 2)
    val (_, sampled, lumas, _) = Video.videoFeatures(avi, sampleN = 4).get
    assert(sampled == 4 && lumas.length == 4)
    // fewer frames than sampleN → every frame sampled
    val short = Video.syntheticAvi(3L, 24, 16, nFrames = 2, fps = 10,
      motionStep = 2)
    assert(Video.videoFeatures(short, sampleN = 4).get._2 == 2)
  }

  test("MP4 box parser: timescale, duration, track dims roundtrip") {
    val mp4 = Video.syntheticMp4(timescale = 1000, duration = 4500,
      width = 640, height = 360)
    assert(Multimodal.sniffFormat(mp4) == "mp4")
    val m = Video.parseMp4Meta(mp4).get
    assert(m.timescale == 1000 && m.duration == 4500)
    assert(m.durationSeconds == 4.5)
    assert(m.nTracks == 1 && m.width.contains(640) && m.height.contains(360))
  }

  test("corrupt and truncated payloads degrade to None, never throw") {
    assert(Video.parseAvi("not a video".getBytes).isEmpty)
    assert(Video.parseMp4Meta(Array.fill(20)(0.toByte)).isEmpty)
    val avi = Video.syntheticAvi(1L, 24, 16, 4, 10, 2)
    // truncate mid-frame: parser stops cleanly, meta still read
    val cut = java.util.Arrays.copyOfRange(avi, 0, avi.length / 2)
    Video.parseAvi(cut).foreach { case (meta, frames) =>
      assert(meta.width == 24 && frames.length < 4)
    }
    assert(Video.parseMp4Meta(avi).isEmpty) // wrong container → None
  }

  test("m_video_decode: deterministic features for every asset") {
    val df = Registry.byName("m_video_decode")
      .fn(spark, "/root/testdata/sf0.001").cache()
    val rows = df.collect()
    assert(rows.length == 200)
    val byContainer = rows.groupBy(_.getAs[String]("container"))
    assert(byContainer.keySet == Set("avi", "mp4"))
    // mp4 rows: parsed box metadata, no frame decode
    byContainer("mp4").foreach { r =>
      assert(r.getAs[Int]("width") == 320 &&
        r.getAs[Int]("height") == 240)
      assert(r.getAs[Double]("duration_s") >= 2.5)
      assert(r.isNullAt(r.fieldIndex("motion")))
    }
    // avi rows: decoded frames; odd ids move, even ids are static
    byContainer("avi").foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("n_frames") == 6 &&
        r.getAs[Int]("frames_sampled") == 4)
      assert(r.getAs[Double]("fps") == 10.0)
      val motion = r.getAs[Double]("motion")
      if (id % 2 == 1) assert(motion > 0.1, s"id $id should move")
      else assert(motion == 0.0, s"id $id should be static")
    }
    // determinism: a second run is row-for-row identical
    val again = Registry.byName("m_video_decode")
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
