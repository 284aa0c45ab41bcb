package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** DELETION VECTORS: one bitmap of deleted row positions per data file,
  * stored in a shared sidecar and referenced from the manifest entry —
  * the Iceberg-v3 evolution of merge-on-read position deletes (one DV
  * supersedes all prior deletes against its data file, so a scan applies
  * at most ONE delete blob per data file instead of opening every
  * delete file ever committed).
  *
  * Spec correspondence (public Iceberg v3 spec, "Deletion Vectors" +
  * manifest fields `referenced_data_file`/`content_offset`/
  * `content_size_in_bytes`): a DV entry is a content=1 manifest entry
  * whose `path` names the sidecar and whose `dv` struct carries the
  * referenced data file and the blob's byte range; `record-count` is the
  * DV's cardinality, so metadata-only counts keep subtracting exactly.
  * The blob encoding here is graft's own (sorted delta-varint, below)
  * rather than the spec's roaring "portable" serialization — the honest
  * seam, documented at the export surface: layouts holding DVs refuse
  * `exportTable` until a maintenance pass rewrites them (compaction
  * absorbs them), exactly so no external reader ever sees a
  * graft-encoded blob it would misparse.
  *
  * Blob layout: magic "GDV1" | cardinality (8-byte big-endian) |
  * positions as unsigned LEB128 varints — first absolute, then strictly
  * positive deltas. Positions are row ordinals in the referenced file
  * (the same `_pos` the parquet position-delete form records).
  *
  * Unlike bloom sidecars (advisory — unreadable means "keep the file"),
  * a DV is CORRECTNESS-bearing: decode failures throw rather than
  * silently resurrecting deleted rows.
  */
object Dv {

  /** Manifest reference to one DV blob. `dataFile` is the referenced
    * data file in the RAW form scans observe via `_metadata.file_path`
    * (URI form), so decoded positions anti-join without normalization.
    */
  case class DvRef(dataFile: String, off: Long, len: Long)

  private val Magic = Array[Byte]('G', 'D', 'V', '1')

  def encode(sorted: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(16 + sorted.length * 2)
    out.write(Magic)
    val card = java.nio.ByteBuffer.allocate(8).putLong(sorted.length.toLong)
    out.write(card.array())
    var prev = -1L
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)
      require(v > prev, s"DV positions must be strictly increasing: $v after $prev")
      // unsigned LEB128: first value absolute, then strictly positive deltas
      var x = if (i == 0) v else v - prev
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
      prev = v
      i += 1
    }
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length >= 12 && bytes(0) == 'G' && bytes(1) == 'D' &&
      bytes(2) == 'V' && bytes(3) == '1', "bad DV blob magic")
    val card = java.nio.ByteBuffer.wrap(bytes, 4, 8).getLong
    require(card >= 0 && card <= Int.MaxValue, s"bad DV cardinality $card")
    val out = new Array[Long](card.toInt)
    var p = 12
    var prev = 0L
    var i = 0
    while (i < card) {
      var x = 0L; var shift = 0; var b = 0
      do {
        require(p < bytes.length, "truncated DV blob")
        // bound BEFORE use: Long << masks shift mod 64, so an unbounded
        // corrupt varint would silently wrap into a plausible position
        require(shift < 64, "DV varint overflows 64 bits")
        b = bytes(p) & 0xff; p += 1
        x |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      // deltas are strictly positive by construction (encode requires
      // strictly increasing positions) — a zero/negative decode is
      // corruption, not data
      require(if (i == 0) x >= 0 else x > 0,
        s"DV delta must be ${if (i == 0) ">= 0" else "> 0"}: $x")
      prev = if (i == 0) x else prev + x
      out(i) = prev
      i += 1
    }
    require(p == bytes.length, "trailing bytes after DV blob")
    out
  }

  /** Read one DV blob from its sidecar byte range. Throws on any IO or
    * format problem — deletes must never drop silently.
    */
  def read(path: String, off: Long, len: Long): Array[Long] = {
    val ch = java.nio.channels.FileChannel.open(Paths.get(path))
    try {
      val buf = java.nio.ByteBuffer.allocate(len.toInt)
      ch.position(off)
      while (buf.hasRemaining && ch.read(buf) >= 0) {}
      require(!buf.hasRemaining, s"short read of DV blob $path@$off+$len")
      decode(buf.array())
    } finally ch.close()
  }

  /** What one executor-written DV looks like to the commit path. */
  case class DvWritten(dataFile: String, sidecar: String, off: Long,
      len: Long, cardinality: Long)

  /** Write one DV per distinct `file_path` of `positions` (columns
    * `file_path: string`, `pos: long`), distributed: positions hash to
    * the partition owning their file, each partition writes ONE sidecar
    * holding its files' blobs back-to-back, and only {file, sidecar,
    * off, len, cardinality} rows return to the driver — O(affected
    * files), never O(deleted rows).
    */
  def writeAll(spark: SparkSession, positions: DataFrame,
      dir: String): Seq[DvWritten] = {
    import spark.implicits._
    Files.createDirectories(Paths.get(dir))
    positions
      .select(col("file_path").cast(StringType), col("pos").cast(LongType))
      .distinct()
      .repartition(col("file_path"))
      .sortWithinPartitions("file_path", "pos")
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val sidecar = s"$dir/part-${java.util.UUID.randomUUID}.gdv"
          val out = new java.io.BufferedOutputStream(
            Files.newOutputStream(Paths.get(sidecar)))
          var off = 0L
          val acc = scala.collection.mutable.ArrayBuffer.empty[DvWritten]
          var curFile: String = null
          val curPos = scala.collection.mutable.ArrayBuffer.empty[Long]
          def flush(): Unit = if (curFile != null) {
            val blob = encode(curPos.toArray)
            out.write(blob)
            acc += DvWritten(curFile, sidecar, off, blob.length.toLong,
              curPos.length.toLong)
            off += blob.length
            curPos.clear()
          }
          try {
            it.foreach { r =>
              val f = r.getString(0)
              if (f != curFile) { flush(); curFile = f }
              curPos += r.getLong(1)
            }
            flush()
          } finally out.close()
          acc.iterator
        }
      }.collect().toSeq
  }

  /** Decode DV entries back to a `(file_path, pos)` DataFrame —
    * distributed (each row expands on an executor), matching the parquet
    * position-delete shape so both forms share one anti-join.
    */
  def positionsDf(spark: SparkSession,
      dvs: Seq[(DvRef, String)]): DataFrame = {
    import spark.implicits._
    spark.createDataset(dvs.map { case (d, sidecar) =>
        (d.dataFile, sidecar, d.off, d.len)
      })
      .repartition(math.max(1, math.min(dvs.size,
        spark.sparkContext.defaultParallelism)))
      .flatMap { case (f, sidecar, off, len) =>
        read(sidecar, off, len).iterator.map(p => (f, p))
      }.toDF("file_path", "pos")
  }

  /** Spark SQL schema of the manifest `dv` column (distributed planning
    * and manifest-rewrite round-trips must carry it losslessly).
    */
  val sparkField: StructField = StructField("dv", StructType(Seq(
    StructField("data-file", StringType),
    StructField("off", LongType),
    StructField("len", LongType))))
}
