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
  * byte-level parsers; only the PIXEL/SAMPLE decode is a clearly-marked
  * deterministic stub (this container has no codecs — a real deployment
  * swaps `pixelDecodeStub` for the codec call, nothing else moves).
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
    /** Driver-side snapshot of registered codecs plus the fallback —
      * capture this into closures (registration order wins ties).
      */
    def snapshot(): Seq[MediaCodec] = registry :+ ByteStats
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

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "m_multimodal_meta",
      (s, dir) => {
        import s.implicits._
        // 1. build the multimodal table: binary payload + typed metadata
        //    (documents stand in for media assets; payload = UTF-8 bytes,
        //    every 3rd asset gets a real PNG header so sniffing + header
        //    parsing run on genuine magic bytes)
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
        // 2. batched decode/extract: one iterator per partition, no
        //    shuffle; the codec set snapshots on the DRIVER and ships
        //    inside the closure
        val codecs = MediaCodec.snapshot()
        val features = assets
          .select(col("doc_id"), col("media_meta.format").as("format"),
            col("payload"))
          .as[(Long, String, Array[Byte])]
          .mapPartitions(_.map { case (id, fmt, bytes) =>
            decode(id, fmt, bytes, codecs)
          })
          .toDF()
        // 3. downstream analytics on extracted features stay relational
        features
          .select(col("doc_id"), col("format"), col("detected_format"),
            col("width"), col("n_bytes"),
            round(col("byte_entropy"), 4).as("byte_entropy"),
            col("histogram")(0).as("hist_0"))
          .orderBy("doc_id")
      },
      None)
  )
}
