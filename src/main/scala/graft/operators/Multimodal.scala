package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.4 multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in batches.
  *
  * The Spark-side plumbing is real — binary payloads, a typed metadata
  * struct, partition-preserving batched iteration via mapPartitions (the
  * Scala analogue of mapInPandas: one iterator per partition, constant
  * memory, no shuffle). Format SNIFFING (magic bytes) and header-level
  * metadata (PNG/GIF/JPEG dimensions, container detection) are real
  * byte-level parsers. IMAGE pixel decode is REAL too — the JDK's
  * javax.imageio handles PNG/JPEG/GIF/BMP with no external libraries
  * (ImageIoCodec: luma features, bilinear resize, thumbnail re-encode) —
  * as are WAV audio sample decode (WavCodec, javax.sound.sampled) and
  * AVI/MJPEG video frame decode ([[Video]]: RIFF container parse +
  * per-frame ImageIO). Only non-MJPEG video SAMPLE decode degrades to
  * the deterministic ByteStats fallback (no H.264/VP9 in the JDK); a
  * deployment registers real codecs through the same MediaCodec seam.
  */
object Multimodal {

  /** Feature row produced per asset by the batched extractor. */
  case class MediaFeatures(
      doc_id: Long,
      format: String,
      detected_format: String,
      width: Option[Long],
      height: Option[Long],
      n_bytes: Long,
      byte_entropy: Double,
      histogram: Array[Long])

  private def u8(b: Byte): Int = b & 0xff

  private def be32(p: Array[Byte], off: Int): Long =
    ((u8(p(off)).toLong << 24) | (u8(p(off + 1)) << 16) |
      (u8(p(off + 2)) << 8) | u8(p(off + 3))) & 0xffffffffL

  private def startsWith(p: Array[Byte], magic: Array[Int],
      off: Int = 0): Boolean =
    p.length >= off + magic.length &&
      magic.indices.forall(i => u8(p(off + i)) == magic(i))

  /** Magic-byte format detection — drives the per-format branch. */
  def sniffFormat(p: Array[Byte]): String =
    if (startsWith(p, Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)))
      "png"
    else if (startsWith(p, Array(0xff, 0xd8, 0xff))) "jpeg"
    else if (startsWith(p, Array('G', 'I', 'F', '8')) &&
      (p.length > 5 && (p(4) == '7' || p(4) == '9') && p(5) == 'a')) "gif"
    else if (startsWith(p, Array('R', 'I', 'F', 'F')) &&
      startsWith(p, Array('W', 'E', 'B', 'P'), off = 8)) "webp"
    else if (startsWith(p, Array('R', 'I', 'F', 'F')) &&
      startsWith(p, Array('W', 'A', 'V', 'E'), off = 8)) "wav"
    else if (startsWith(p, Array('R', 'I', 'F', 'F')) &&
      startsWith(p, Array('A', 'V', 'I', ' '), off = 8)) "avi"
    else if (p.length >= 12 &&
      startsWith(p, Array('f', 't', 'y', 'p'), off = 4)) "mp4"
    else if (startsWith(p, Array('I', 'D', '3')) ||
      (p.length >= 2 && u8(p(0)) == 0xff && (u8(p(1)) & 0xe0) == 0xe0)) "mp3"
    else if (startsWith(p, Array('%', 'P', 'D', 'F'))) "pdf"
    else "unknown"

  /** PNG IHDR: width/height are big-endian at bytes 16..23. */
  private def pngDims(p: Array[Byte]): (Option[Long], Option[Long]) =
    if (p.length >= 24) (Some(be32(p, 16)), Some(be32(p, 20)))
    else (None, None)

  /** GIF logical screen: width/height little-endian u16 at bytes 6..9. */
  private def gifDims(p: Array[Byte]): (Option[Long], Option[Long]) =
    if (p.length >= 10)
      (Some((u8(p(6)) | (u8(p(7)) << 8)).toLong),
        Some((u8(p(8)) | (u8(p(9)) << 8)).toLong))
    else (None, None)

  /** JPEG: walk the marker stream to the first SOF0/1/2 frame header;
    * height/width are big-endian u16 after the precision byte.
    */
  private def jpegDims(p: Array[Byte]): (Option[Long], Option[Long]) = {
    var i = 2
    while (i + 1 < p.length && u8(p(i)) == 0xff) {
      // JPEG permits 0xff FILL bytes between segments — skip runs of
      // them, or a fill byte reads as a marker and the walk derails
      var j = i + 1
      while (j < p.length && u8(p(j)) == 0xff) j += 1
      if (j >= p.length) return (None, None)
      val marker = u8(p(j))
      if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
        return if (j + 7 < p.length)
          (Some(((u8(p(j + 6)) << 8) | u8(p(j + 7))).toLong),
            Some(((u8(p(j + 4)) << 8) | u8(p(j + 5))).toLong))
        else (None, None)
      }
      // SOS starts entropy-coded data, EOI ends the stream: no SOF now
      if (marker == 0xda || marker == 0xd9) return (None, None)
      // standalone (length-less) markers: TEM, RSTn, SOI
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) i = j + 1
      else {
        if (j + 2 >= p.length) return (None, None)
        val len = (u8(p(j + 1)) << 8) | u8(p(j + 2))
        if (len < 2) return (None, None)
        i = j + 1 + len
      }
    }
    (None, None)
  }

  /** Content-decoder contract — the pluggable seam where real codecs go.
    * A deployment registers codec-backed implementations (JPEG/PNG pixel
    * decode, audio sample decode); this container has none, so the
    * deterministic byte-level [[MediaCodec.ByteStats]] fallback stands
    * in. Codecs are Serializable and the per-query codec set is captured
    * into the mapPartitions closure ON THE DRIVER, so registration
    * travels to executors with the plan, never via shared state.
    */
  trait MediaCodec extends Serializable {
    /** Sniffed format names this codec handles ("*" = any). */
    def formats: Set[String]
    /** (entropy-like scalar, 16-bin histogram) from decoded content. */
    def decodeFeatures(payload: Array[Byte]): (Double, Array[Long])
  }

  object MediaCodec {
    /** Deterministic byte-level fallback: 16-bin byte histogram +
      * Shannon entropy — stands in for the absent codec call; real
      * decoders plug in via [[register]], nothing else moves.
      */
    object ByteStats extends MediaCodec {
      val formats: Set[String] = Set("*")
      def decodeFeatures(p: Array[Byte]): (Double, Array[Long]) = {
        val hist = new Array[Long](16)
        p.foreach(b => hist((b & 0xff) >> 4) += 1)
        val n = p.length.toDouble.max(1.0)
        val entropy = -hist.filter(_ > 0)
          .map { c => val pr = c / n; pr * math.log(pr) / math.log(2) }.sum
        (math.rint(entropy * 10000) / 10000, hist)
      }
    }

    @volatile private var registry: Seq[MediaCodec] = Seq.empty
    def register(c: MediaCodec): Unit = synchronized { registry :+= c }
    def clear(): Unit = synchronized { registry = Seq.empty }
    /** Driver-side snapshot of registered codecs plus the defaults —
      * capture this into closures (registration order wins ties). The
      * JDK's ImageIO decodes PNG/JPEG/GIF/BMP with no external codecs,
      * so real pixel decode is on by default; ByteStats remains the
      * universal fallback.
      */
    def snapshot(): Seq[MediaCodec] =
      registry ++ Seq(ImageIoCodec, WavCodec, ByteStats)
  }

  /** REAL pixel decode via the JDK's javax.imageio (no external codec
    * libraries): features come from DECODED LUMA, not payload bytes — a
    * 16-bin luminance histogram and its entropy. Payloads ImageIO cannot
    * decode (truncated, header-only) fall back to ByteStats, so the
    * operator never fails on a corrupt asset — it degrades per-row.
    */
  object ImageIoCodec extends MediaCodec {
    val formats: Set[String] = Set("png", "jpeg", "gif", "bmp")

    def decodeFeatures(p: Array[Byte]): (Double, Array[Long]) =
      decodeImage(p) match {
        case None => MediaCodec.ByteStats.decodeFeatures(p)
        case Some(img) =>
          val hist = new Array[Long](16)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              hist(luma(img.getRGB(x, y)) >> 4) += 1
              x += 1
            }
            y += 1
          }
          val n = (img.getWidth.toLong * img.getHeight).toDouble.max(1.0)
          val entropy = -hist.filter(_ > 0)
            .map { c => val pr = c / n; pr * math.log(pr) / math.log(2) }
            .sum
          (math.rint(entropy * 10000) / 10000, hist)
      }
  }

  /** REAL audio sample decode via the JDK's javax.sound.sampled (WAV/
    * PCM — no external codec libraries): features come from DECODED
    * SAMPLES — a 16-bin histogram over normalized magnitude and its
    * entropy. Non-WAV or undecodable payloads fall back to ByteStats.
    */
  object WavCodec extends MediaCodec {
    val formats: Set[String] = Set("wav")

    def decodeFeatures(p: Array[Byte]): (Double, Array[Long]) =
      decodeWavSamples(p) match {
        case None => MediaCodec.ByteStats.decodeFeatures(p)
        case Some((_, _, samples)) =>
          val hist = new Array[Long](16)
          samples.foreach { s =>
            hist(math.min(15, (math.abs(s.toInt) * 16) / 32768)) += 1
          }
          val n = samples.length.toDouble.max(1.0)
          val entropy = -hist.filter(_ > 0)
            .map { c => val pr = c / n; pr * math.log(pr) / math.log(2) }
            .sum
          (math.rint(entropy * 10000) / 10000, hist)
      }
  }

  /** Decode a WAV payload to (sampleRate, channels, 16-bit samples);
    * None when the bytes are not decodable PCM audio.
    */
  def decodeWavSamples(p: Array[Byte])
      : Option[(Int, Int, Array[Short])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(p))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) return None
        val bytes = ais.readAllBytes()
        val out = new Array[Short](bytes.length / 2)
        var i = 0
        while (i < out.length) {
          val lo = bytes(2 * i) & 0xff
          val hi = bytes(2 * i + 1) & 0xff
          out(i) =
            (if (fmt.isBigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort
          i += 1
        }
        Some((fmt.getSampleRate.toInt, fmt.getChannels, out))
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Deterministic synthetic tone for the planted corpus: a 16-bit mono
    * PCM WAV mixing two id-derived frequencies — stable across JVMs.
    */
  def syntheticWav(id: Long, rate: Int, nSamples: Int): Array[Byte] = {
    val f1 = 200.0 + (id % 17) * 40.0
    val f2 = 1000.0 + (id % 7) * 130.0
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val t = i.toDouble / rate
      val v = (math.sin(2 * math.Pi * f1 * t) * 9000 +
        math.sin(2 * math.Pi * f2 * t) * 4000).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Rec.601 integer luma of a packed RGB pixel (0..255). */
  private[operators] def lumaOf(rgb: Int): Int = luma(rgb)

  private def luma(rgb: Int): Int =
    (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
      114 * (rgb & 0xff)) / 1000

  /** Decode an image payload to pixels; None if the bytes are not a
    * decodable image (headless-safe, pure JDK).
    */
  def decodeImage(p: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(p)))
    catch { case _: Exception => None }

  /** Bilinear resize to (w, h), re-encoded as PNG — the real thumbnail
    * path (Graphics2D, pure JDK).
    */
  def resizePng(p: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    decodeImage(p).map { img =>
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }

  /** Deterministic synthetic photo for the planted corpus: pixel (x, y)
    * of asset `id` mixes the coordinates through a xorshift of the id —
    * stable across JVMs, structured enough that resize/luma statistics
    * are non-trivial.
    */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var v = id * 6364136223846793005L + (x * 1315423911L) ^
          (y * 2654435761L)
        v ^= v >>> 33; v *= 0xff51afd7ed558ccdL; v ^= v >>> 33
        img.setRGB(x, y, (v & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def codecFor(fmt: String, codecs: Seq[MediaCodec]): MediaCodec =
    codecs.find(c => c.formats.contains(fmt) || c.formats.contains("*"))
      .getOrElse(MediaCodec.ByteStats)

  /** Per-asset extraction: sniff the real format from magic bytes, branch
    * to the format's header parser for dimensions, then run the codec's
    * content decode (ByteStats unless a real codec is registered).
    * `codecs` is deliberately NOT defaulted to `MediaCodec.snapshot()`:
    * a default would evaluate on whichever JVM runs the closure, so an
    * executor would silently see an empty registry — callers must take
    * the snapshot on the driver and pass it in.
    */
  def decode(docId: Long, declaredFormat: String, payload: Array[Byte],
      codecs: Seq[MediaCodec]): MediaFeatures = {
    val detected = sniffFormat(payload)
    val (w, h) = detected match {
      case "png" => pngDims(payload)
      case "jpeg" => jpegDims(payload)
      case "gif" => gifDims(payload)
      case _ => (None, None)
    }
    val (entropy, hist) = codecFor(detected, codecs).decodeFeatures(payload)
    MediaFeatures(docId, declaredFormat, detected, w, h,
      payload.length.toLong, entropy, hist)
  }

  /** Minimal valid PNG header (signature + IHDR) for the query's planted
    * assets — lets the sniffer and dimension parser run on REAL bytes.
    */
  def pngHeader(width: Int, height: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(24)
    b.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    b.putInt(13) // IHDR length
    b.put("IHDR".getBytes("US-ASCII"))
    b.putInt(width)
    b.putInt(height)
    b.array()
  }

  /** The full multimodal feature-extraction pipeline (shared by the
    * query and the specs, which additionally assert the entropy /
    * histogram features the SQL oracle cannot recompute):
    * 1. build the multimodal table — binary payload + typed metadata
    *    (documents stand in for media assets; payload = UTF-8 bytes,
    *    every 3rd asset gets a real PNG header so sniffing + header
    *    parsing run on genuine magic bytes);
    * 2. batched decode/extract — one iterator per partition, no
    *    shuffle; the codec set snapshots on the DRIVER and ships
    *    inside the closure.
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val png = lit(pngHeader(640, 480))
    val assets = Tables.tbl(s, dir, "documents").select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(png, encode(col("text"), "UTF-8")))
        .otherwise(encode(col("text"), "UTF-8")).as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg")
          .otherwise("webp").as("format"),
        col("n_chars").as("n_chars"),
        col("source").as("source")).as("media_meta"))
    val codecs = MediaCodec.snapshot()
    assets
      .select(col("doc_id"), col("media_meta.format").as("format"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, fmt, bytes) =>
        decode(id, fmt, bytes, codecs)
      })
      .toDF()
  }

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "m_multimodal_meta",
      (s, dir) =>
        // downstream analytics on extracted features stay relational;
        // this query exposes the header-parse surface — every column is
        // recomputable by the oracle from the generation parameters
        // (pixel-plane features are pinned by ImageDecodeSpec instead)
        multimodalFeatures(s, dir)
          .select(col("doc_id"), col("format"), col("detected_format"),
            col("width"), col("height"), col("n_bytes"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
          CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'png'
            WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
          CASE WHEN doc_id % 3 = 0 THEN 'png' ELSE 'unknown' END
            AS detected_format,
          CASE WHEN doc_id % 3 = 0 THEN CAST(640 AS BIGINT) END AS width,
          CASE WHEN doc_id % 3 = 0 THEN CAST(480 AS BIGINT) END AS height,
          CAST(strlen(text)
            + CASE WHEN doc_id % 3 = 0 THEN 24 ELSE 0 END AS BIGINT)
            AS n_bytes
        FROM documents ORDER BY doc_id""")),

    // REAL image decode / feature-extract / resize (pure JDK ImageIO —
    // no external codec libraries): a planted corpus of deterministic
    // PNGs flows through the binary-column pipeline, each asset is
    // DECODED TO PIXELS, luma statistics come from the pixels, and a
    // bilinear 8x6 thumbnail is re-encoded and re-decoded to prove the
    // resize is genuine. Batched per partition, no shuffle; rows-only
    // (pixel decode has no SQL oracle — MultimodalSpec pins values).
    GraftQuery(
      "m_image_decode",
      (s, dir) => {
        import s.implicits._
        val assets = Tables.tbl(s, dir, "documents")
          .select(col("doc_id")).limit(400)
          .as[Long]
          .mapPartitions(_.map(id =>
            (id, syntheticPng(id, 32, 24), "png")))
          .toDF("doc_id", "payload", "format")
        val codecs = MediaCodec.snapshot()
        assets.select(col("doc_id"), col("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) =>
            val img = decodeImage(bytes).getOrElse(
              throw new IllegalStateException(s"undecodable asset $id"))
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                sum += luma(img.getRGB(x, y)); x += 1
              }
              y += 1
            }
            val mean = sum.toDouble / (img.getWidth * img.getHeight)
            val (entropy, _) = codecFor("png", codecs).decodeFeatures(bytes)
            val thumbBytes = resizePng(bytes, 8, 6).get
            val thumb = decodeImage(thumbBytes).get
            var tsum = 0L
            var ty = 0
            while (ty < thumb.getHeight) {
              var tx = 0
              while (tx < thumb.getWidth) {
                tsum += luma(thumb.getRGB(tx, ty)); tx += 1
              }
              ty += 1
            }
            (id, img.getWidth, img.getHeight,
              math.rint(mean * 100) / 100, entropy,
              thumb.getWidth, thumb.getHeight,
              math.rint(tsum.toDouble / 48 * 100) / 100,
              thumbBytes.length > 0)
          })
          .toDF("doc_id", "width", "height", "luma_mean", "luma_entropy",
            "thumb_w", "thumb_h", "thumb_luma_mean", "thumb_encoded")
          .orderBy("doc_id")
      },
      None),

    // REAL audio decode (pure JDK javax.sound.sampled — PCM WAV): planted
    // deterministic tones decoded to SAMPLES, per-asset sample rate,
    // duration, RMS level, peak, and zero-crossing rate — the audio
    // analogues of the image features, from decoded content not payload
    // bytes. Batched per partition, no shuffle; rows-only
    // (MultimodalSpec/ImageDecodeSpec pin DSP ground truths).
    GraftQuery(
      "m_audio_decode",
      (s, dir) => {
        import s.implicits._
        Tables.tbl(s, dir, "documents")
          .select(col("doc_id")).limit(300)
          .as[Long]
          .mapPartitions(_.map { id =>
            val wav = syntheticWav(id, rate = 8000, nSamples = 2000)
            val (rate, channels, samples) = decodeWavSamples(wav).getOrElse(
              throw new IllegalStateException(s"undecodable audio $id"))
            var sumSq = 0.0
            var peak = 0
            var crossings = 0L
            var i = 0
            while (i < samples.length) {
              val v = samples(i).toInt
              sumSq += v.toDouble * v
              if (math.abs(v) > peak) peak = math.abs(v)
              if (i > 0 && ((v >= 0) != (samples(i - 1) >= 0))) crossings += 1
              i += 1
            }
            val rms = math.sqrt(sumSq / math.max(1, samples.length))
            (id, rate, channels, samples.length,
              math.rint(rms * 100) / 100, peak,
              math.rint(crossings.toDouble / samples.length * 10000) / 10000,
              sniffFormat(wav))
          })
          .toDF("doc_id", "sample_rate", "channels", "n_samples", "rms",
            "peak", "zero_cross_rate", "detected_format")
          .orderBy("doc_id")
      },
      None)
  )
}
