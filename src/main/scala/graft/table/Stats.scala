package graft.table

import graft.model.Json
import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths}
import java.util.Base64
import scala.jdk.CollectionConverters._

/** One analyzed column in a table-statistics file: NDV from a
  * datasketches HLL sketch plus exact rollups from the same pass.
  * The sketch bytes are retained so future analyses can UNION instead
  * of rescanning (mergeability is the point of the sketch).
  */
case class ColumnStatsEntry(name: String, ndv: Long, nullCount: Long,
    min: Option[String], max: Option[String],
    avgLen: Option[Long], maxLen: Option[Long],
    sketch: Option[Array[Byte]]) {
  def toJson = {
    val o = Json.obj
    o.put("name", name)
    o.put("ndv", ndv)
    o.put("null-count", nullCount)
    min.foreach(o.put("min", _))
    max.foreach(o.put("max", _))
    avgLen.foreach(o.put("avg-len", _))
    maxLen.foreach(o.put("max-len", _))
    sketch.foreach(b => o.put("sketch", Base64.getEncoder.encodeToString(b)))
    o
  }
}

object ColumnStatsEntry {
  def fromJson(n: JsonNode): ColumnStatsEntry = ColumnStatsEntry(
    n.path("name").asText,
    n.path("ndv").asLong,
    n.path("null-count").asLong,
    Option(n.get("min")).map(_.asText),
    Option(n.get("max")).map(_.asText),
    Option(n.get("avg-len")).map(_.asLong),
    Option(n.get("max-len")).map(_.asLong),
    Option(n.get("sketch")).map(s => Base64.getDecoder.decode(s.asText)))
}

/** Table-level column statistics (ANALYZE): per-column NDV sketches +
  * rollups in a puffin-style sidecar file, referenced from table
  * metadata's `statistics` list (Iceberg spec §"Table Statistics").
  *
  * Why this matters at 100 TB: join ORDER and broadcast decisions are
  * planned from estimates. Size and row count alone can't distinguish a
  * join key with 10 distinct values (explosive) from a unique key
  * (1:1); the NDV sketch gives the cost model that answer without a
  * data scan at plan time. The sketch is computed in ONE distributed
  * aggregate over the table (deletes applied, so numbers reflect what a
  * query actually reads), with O(columns × sketch-size) driver memory —
  * never O(rows).
  */
object Stats {

  /** Analyzable: top-level primitive columns (struct/array/map NDV has
    * no defined CBO meaning; binary blobs have no useful bounds).
    */
  def eligible(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType | BinaryType |
        NullType => false
    case _ => true
  }

  /** Sketch input column: int/long/string update the sketch natively;
    * every other type goes through its round-trippable string rendering
    * (injective, so NDV is preserved).
    */
  private def ndvInput(c: Column, dt: DataType): Column = dt match {
    case IntegerType | LongType | StringType => c
    case ByteType | ShortType => c.cast(LongType)
    case _ => c.cast(StringType)
  }

  /** The single-pass aggregate: one sketch + nulls + min/max (+ string
    * lengths) per column, plus the total row count. NDV sketches are
    * THETA (the Puffin-spec standard blob family), via graft's native
    * TypedImperativeAggregate.
    */
  def aggExprs(targets: Seq[StructField]): Seq[Column] =
    count(lit(1)).as("cnt") +: targets.flatMap { f =>
      val c = col(s"`${f.name}`")
      Seq(
        graft.functions.ThetaSketchAgg.agg(ndvInput(c, f.dataType))
          .as(s"hll::${f.name}"),
        count(c).as(s"nonnull::${f.name}"),
        min(c).as(s"min::${f.name}"),
        max(c).as(s"max::${f.name}")) ++
        (if (f.dataType == StringType)
          Seq(avg(length(c)).as(s"avglen::${f.name}"),
            max(length(c)).as(s"maxlen::${f.name}"))
        else Seq.empty)
    }

  /** Decode the one aggregated row into per-column entries. NDV comes
    * from the sketch estimate (exact while the sketch is in sparse
    * mode, ~1-2% relative error beyond); min/max/nulls are exact.
    */
  def entriesFromRow(row: Row, targets: Seq[StructField])
      : Seq[ColumnStatsEntry] = {
    val cnt = row.getAs[Long]("cnt")
    targets.map { f =>
      val sketch = Option(row.getAs[Array[Byte]](s"hll::${f.name}"))
      val ndv = sketch
        .map(graft.functions.ThetaSketchAgg.estimate)
        .getOrElse(0L)
      val nulls = cnt - row.getAs[Long](s"nonnull::${f.name}")
      def bound(k: String): Option[String] =
        Pruning.normalize(row.getAs[Any](s"$k::${f.name}"), f.dataType)
      val (avgLen, maxLen) =
        if (f.dataType == StringType)
          (Option(row.getAs[java.lang.Double](s"avglen::${f.name}"))
            .map(d => Math.round(d.doubleValue)),
            Option(row.getAs[java.lang.Integer](s"maxlen::${f.name}"))
              .map(_.longValue))
        else (None, None)
      ColumnStatsEntry(f.name, ndv, nulls, bound("min"), bound("max"),
        avgLen, maxLen, sketch)
    }
  }

  /** Puffin blob type for the per-column NDV sketches: the PUBLIC
    * Iceberg-standard theta family — external cost models read these.
    */
  val ThetaBlobType = "apache-datasketches-theta-v1"

  /** Graft's rollups blob (row count + per-column min/max/null/length
    * stats as JSON): an extra blob spec readers simply skip.
    */
  val RollupsBlobType = "graft-rollups-v1"

  /** Write one statistics file as a REAL Puffin container: one
    * spec-standard theta blob per sketched column (blob properties
    * carry the spec's `ndv` plus the column name) and one rollups blob.
    * Returns the spec-shaped metadata reference (path, sizes, footer
    * size, per-blob metadata).
    */
  def writeFile(dir: Path, snapshotId: Long, sequenceNumber: Long,
      rowCount: Long, entries: Seq[ColumnStatsEntry],
      fieldIds: Map[String, Int]): graft.model.StatisticsFileRef = {
    Files.createDirectories(dir)
    val p = dir.resolve(
      s"$snapshotId-${java.util.UUID.randomUUID}.stats.puffin")
    val w = new Puffin.Writer(p)
    val blobs = scala.collection.mutable.ArrayBuffer
      .empty[graft.model.BlobMetaRef]
    entries.foreach { e =>
      e.sketch.foreach { bytes =>
        w.add(ThetaBlobType, bytes,
          Map("ndv" -> e.ndv.toString, "graft.column" -> e.name),
          snapshotId, sequenceNumber,
          fields = fieldIds.get(e.name).toSeq)
        blobs += graft.model.BlobMetaRef(ThetaBlobType, snapshotId,
          sequenceNumber, fieldIds.get(e.name).toSeq,
          Map("ndv" -> e.ndv.toString))
      }
    }
    val o = Json.obj
    o.put("snapshot-id", snapshotId)
    o.put("row-count", rowCount)
    val a = o.putArray("columns")
    entries.foreach(e => a.add(e.copy(sketch = None).toJson))
    w.add(RollupsBlobType, Json.write(o).getBytes("UTF-8"), Map.empty,
      snapshotId, sequenceNumber)
    blobs += graft.model.BlobMetaRef(RollupsBlobType, snapshotId,
      sequenceNumber, Seq.empty, Map.empty)
    val footerBytes = w.close()
    graft.model.StatisticsFileRef(snapshotId, p.toString,
      Files.size(p), Some(footerBytes), Some(blobs.toSeq))
  }

  /** Read a statistics file back: (row-count, entries) — rollups from
    * the graft blob, sketch bytes re-attached from their theta blobs
    * (matched by the `graft.column` property).
    */
  def readFile(path: String): (Long, Seq[ColumnStatsEntry]) = {
    val p = Paths.get(path)
    // statistics refs registered before the Puffin conversion point at
    // plain-JSON .stats.json sidecars; those tables' columnStats must
    // keep working after upgrade, so branch on the actual file magic
    val head = {
      val ch = java.nio.channels.FileChannel.open(p)
      try {
        val buf = java.nio.ByteBuffer.allocate(4)
        while (buf.hasRemaining && ch.read(buf) >= 0) {}
        buf.array()
      } finally ch.close()
    }
    if (!head.sameElements(Puffin.Magic)) {
      val n = Json.parse(
        new String(Files.readAllBytes(p), "UTF-8"))
      return (n.path("row-count").asLong,
        n.path("columns").elements.asScala.toSeq
          .map(ColumnStatsEntry.fromJson))
    }
    val footer = Puffin.readFooter(p)
    def blobBytes(b: Puffin.Blob): Array[Byte] = {
      val ch = java.nio.channels.FileChannel.open(p)
      try {
        val buf = java.nio.ByteBuffer.allocate(b.length.toInt)
        ch.position(b.offset)
        while (buf.hasRemaining && ch.read(buf) >= 0) {}
        require(!buf.hasRemaining, s"short read of stats blob in $path")
        buf.array()
      } finally ch.close()
    }
    val roll = footer.find(_.tpe == RollupsBlobType).getOrElse(
      throw new IllegalStateException(s"no rollups blob in $path"))
    val n = Json.parse(new String(blobBytes(roll), "UTF-8"))
    val sketches = footer.filter(_.tpe == ThetaBlobType)
      .flatMap(b => b.properties.get("graft.column").map(_ -> blobBytes(b)))
      .toMap
    val entries = n.path("columns").elements.asScala.toSeq
      .map(ColumnStatsEntry.fromJson)
      .map(e => e.copy(sketch = sketches.get(e.name)))
    (n.path("row-count").asLong, entries)
  }
}
