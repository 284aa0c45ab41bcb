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

  /** hll_sketch_agg input column: int/long/string update the sketch
    * natively; every other type goes through its round-trippable string
    * rendering (injective, so NDV is preserved).
    */
  private def ndvInput(c: Column, dt: DataType): Column = dt match {
    case IntegerType | LongType | StringType => c
    case ByteType | ShortType => c.cast(LongType)
    case _ => c.cast(StringType)
  }

  /** The single-pass aggregate: one sketch + nulls + min/max (+ string
    * lengths) per column, plus the total row count.
    */
  def aggExprs(targets: Seq[StructField]): Seq[Column] =
    count(lit(1)).as("cnt") +: targets.flatMap { f =>
      val c = col(s"`${f.name}`")
      Seq(
        hll_sketch_agg(ndvInput(c, f.dataType)).as(s"hll::${f.name}"),
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
      val ndv = sketch.map(b => Math.round(
        org.apache.datasketches.hll.HllSketch.heapify(b).getEstimate))
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

  /** Write one stats file: {"snapshot-id": …, "row-count": …,
    * "columns": [...]}. Returns (path, size).
    */
  def writeFile(dir: Path, snapshotId: Long, rowCount: Long,
      entries: Seq[ColumnStatsEntry]): (String, Long) = {
    Files.createDirectories(dir)
    val o = Json.obj
    o.put("snapshot-id", snapshotId)
    o.put("row-count", rowCount)
    val a = o.putArray("columns")
    entries.foreach(e => a.add(e.toJson))
    val p = dir.resolve(
      s"$snapshotId-${java.util.UUID.randomUUID}.stats.json")
    val bytes = Json.write(o).getBytes("UTF-8")
    Files.write(p, bytes)
    (p.toString, bytes.length.toLong)
  }

  /** Read a stats file back: (row-count, entries). */
  def readFile(path: String): (Long, Seq[ColumnStatsEntry]) = {
    val n = Json.parse(
      new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))
    (n.path("row-count").asLong,
      n.path("columns").elements.asScala.toSeq.map(ColumnStatsEntry.fromJson))
  }
}
