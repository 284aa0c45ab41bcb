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
  * memory, no shuffle) — while the media DECODE itself is a clearly-marked
  * deterministic stub (this container has no image/audio codecs; a real
  * deployment swaps `decodeStub` for the codec call, nothing else moves).
  */
object Multimodal {

  /** Feature row produced per asset by the batched extractor. */
  case class MediaFeatures(
      doc_id: Long,
      format: String,
      n_bytes: Long,
      byte_entropy: Double,
      histogram: Array[Long])

  /** DECODE STUB — stands in for e.g. JPEG decode + feature extraction.
    * Deterministic: byte histogram (16 bins) + Shannon entropy of the
    * payload. Real decoders plug in here; signature and batch shape are
    * the contract.
    */
  def decodeStub(docId: Long, format: String, payload: Array[Byte]): MediaFeatures = {
    val hist = new Array[Long](16)
    payload.foreach(b => hist((b & 0xff) >> 4) += 1)
    val n = payload.length.toDouble.max(1.0)
    val entropy = -hist.filter(_ > 0)
      .map { c => val p = c / n; p * math.log(p) / math.log(2) }.sum
    MediaFeatures(docId, format, payload.length.toLong,
      math.rint(entropy * 10000) / 10000, hist)
  }

  def queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "m_multimodal_meta",
      (s, dir) => {
        import s.implicits._
        // 1. build the multimodal table: binary payload + typed metadata
        //    (documents stand in for media assets; payload = UTF-8 bytes)
        val assets = Tables.tbl(s, dir, "documents").select(
          col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          struct(
            when(col("doc_id") % 3 === 0, "png")
              .when(col("doc_id") % 3 === 1, "jpeg")
              .otherwise("webp").as("format"),
            col("n_chars").as("n_chars"),
            col("source").as("source")).as("media_meta"))
        // 2. batched decode/extract: one iterator per partition, no shuffle
        val features = assets
          .select(col("doc_id"), col("media_meta.format").as("format"),
            col("payload"))
          .as[(Long, String, Array[Byte])]
          .mapPartitions(_.map { case (id, fmt, bytes) =>
            decodeStub(id, fmt, bytes)
          })
          .toDF()
        // 3. downstream analytics on extracted features stay relational
        features
          .select(col("doc_id"), col("format"), col("n_bytes"),
            round(col("byte_entropy"), 4).as("byte_entropy"),
            col("histogram")(0).as("hist_0"))
          .orderBy("doc_id")
      },
      None)
  )
}
