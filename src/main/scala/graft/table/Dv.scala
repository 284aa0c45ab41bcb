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
  *
  * Blob encoding IS the spec's `deletion-vector-v1` form: combined
  * length of magic+vector (4 bytes big-endian) | magic D1 D3 39 64 |
  * the vector as a PORTABLE 64-bit roaring bitmap ([[Roaring]]) |
  * CRC-32 of magic+vector (4 bytes big-endian). Sidecars are Puffin
  * files ([[Puffin]]), so an exported layout can reference the blobs
  * byte-for-byte and any spec-compliant v3 reader parses them.
  * Positions are row ordinals in the referenced file (the same `_pos`
  * the parquet position-delete form records).
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

  /** The spec's deletion-vector blob magic (bytes, in file order). */
  private val Magic = Array(0xd1, 0xd3, 0x39, 0x64).map(_.toByte)

  /** Puffin blob type name for deletion vectors (Iceberg v3). */
  val BlobType = "deletion-vector-v1"

  private def crc32(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32()
    c.update(bytes, off, len)
    c.getValue.toInt
  }

  def encode(sorted: Array[Long]): Array[Byte] = {
    var i = 1
    while (i < sorted.length) {
      require(sorted(i) > sorted(i - 1),
        s"DV positions must be strictly increasing: ${sorted(i)}")
      i += 1
    }
    require(sorted.isEmpty || sorted(0) >= 0, "DV positions must be >= 0")
    val vec = Roaring.serialize(sorted)
    val buf = java.nio.ByteBuffer.allocate(4 + 4 + vec.length + 4)
    buf.putInt(4 + vec.length) // big-endian combined magic+vector length
    buf.put(Magic)
    buf.put(vec)
    val crcBody = buf.array()
    buf.putInt(crc32(crcBody, 4, 4 + vec.length))
    buf.array()
  }

  def decode(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length >= 12, "DV blob too short")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val len = buf.getInt
    require(len == bytes.length - 8,
      s"DV blob length field $len != ${bytes.length - 8}")
    require(bytes(4) == Magic(0) && bytes(5) == Magic(1) &&
      bytes(6) == Magic(2) && bytes(7) == Magic(3), "bad DV blob magic")
    val storedCrc = java.nio.ByteBuffer
      .wrap(bytes, bytes.length - 4, 4).getInt
    require(storedCrc == crc32(bytes, 4, bytes.length - 8),
      "DV blob CRC mismatch")
    val out = Roaring.deserialize(bytes, 8, bytes.length - 12)
    require(out.isEmpty || out(0) >= 0, "negative DV position")
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
      // ONE shuffle: cluster by file, sort by (file, pos); duplicates —
      // a distinct() here cost a second full exchange — land adjacent
      // after the sort and are skipped in the writer loop below
      .repartition(col("file_path"))
      .sortWithinPartitions("file_path", "pos")
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          // one spec-layout Puffin sidecar per partition, one
          // deletion-vector-v1 blob per referenced data file
          val sidecar = s"$dir/part-${java.util.UUID.randomUUID}.puffin"
          val w = new Puffin.Writer(Paths.get(sidecar))
          val acc = scala.collection.mutable.ArrayBuffer.empty[DvWritten]
          var curFile: String = null
          val curPos = scala.collection.mutable.ArrayBuffer.empty[Long]
          def flush(): Unit = if (curFile != null) {
            val blob = w.add(BlobType, encode(curPos.toArray), Map(
              "referenced-data-file" -> curFile,
              "cardinality" -> curPos.length.toString))
            acc += DvWritten(curFile, sidecar, blob.offset, blob.length,
              curPos.length.toLong)
            curPos.clear()
          }
          try {
            it.foreach { r =>
              val f = r.getString(0)
              if (f != curFile) { flush(); curFile = f }
              val p = r.getLong(1)
              // sorted within file: equal positions are adjacent
              if (curPos.isEmpty || curPos.last != p) curPos += p
            }
            flush()
          } finally w.close()
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
