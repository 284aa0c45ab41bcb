package graft.table

import org.apache.orc.{BooleanColumnStatistics, ColumnStatistics, DateColumnStatistics, DecimalColumnStatistics, DoubleColumnStatistics, IntegerColumnStatistics, OrcFile, StringColumnStatistics, TimestampColumnStatistics, TypeDescription}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Manifest entry for a freshly written ORC file built from its FOOTER
  * alone — the ORC twin of [[GraftTable.footerEntry]] (Iceberg Table
  * Spec: `file_format` admits ORC alongside PARQUET; the reference
  * stops at the snapshot's manifest-list location,
  * /root/reference/src/model/snapshot.rs:58-60 — per-file formats live
  * in the manifest files that list points to, a spec surface the
  * reference does not model). Same soundness contract:
  * a column with absent, type-mismatched, or untrustworthy footer
  * statistics is OMITTED from the stats map (missing stats are never
  * pruned on and never certify a stats-only aggregate); a column whose
  * BOUNDS are suppressed but whose null count is exact keeps
  * (None, None, nulls). Worst case is a file read that exact stats
  * would have skipped, never a skipped file that held matching rows.
  *
  * ORC-specific suppressions, each because the footer value is not
  * provably EXACT (manifest bounds also certify stats-only MIN/MAX
  * answers, so valid-but-inexact bounds are not good enough):
  *
  *   - timestamptz under a NON-UTC JVM: ORC 2.x timestamp statistics
  *     are micros-exact (millis + nanos ride the [[java.sql.Timestamp]]
  *     accessors), but the wall-clock↔instant mapping is only provably
  *     the identity when the writing JVM runs UTC — the entry is
  *     derived in the same session that wrote the file, so the guard
  *     is on OUR zone, and anything else suppresses. (timestamp_ntz
  *     needs no guard: Spark writes it as physical int64 micros, whose
  *     [[IntegerColumnStatistics]] are zone-free.)
  *   - float/double files containing NaN (or ±Infinity): unlike
  *     parquet, ORC does not suppress its own min/max around NaN (NaN
  *     fails every comparison, so it silently falls out of the bounds
  *     while Spark orders it GREATEST). Detected via a non-finite
  *     column sum — conservative (a legitimate ±Inf value also
  *     suppresses), never unsound.
  *   - strings longer than the writer's stats cap: ORC stores
  *     truncated lower/upper BOUNDS and nulls out the exact min/max.
  */
object OrcFooter {

  def entry(pathStr: String, conf: org.apache.hadoop.conf.Configuration,
      statFields: Seq[(String, DataType)], schemaId: Int,
      spec: graft.model.PartitionSpec): DataFileEntry = {
    // Path built through a proper URI: partition dir names carry LITERAL
    // percent signs (Hive escaping), which Path(String) would misparse
    val hPath = new org.apache.hadoop.fs.Path(
      java.net.URI.create(GraftTable.encodePath(pathStr)))
    val fs = hPath.getFileSystem(conf)
    val fileLen = fs.getFileStatus(hPath).getLen
    val reader = OrcFile.createReader(hPath,
      OrcFile.readerOptions(conf).filesystem(fs))
    try {
      val rows = reader.getNumberOfRows
      val all = reader.getStatistics // file-level, indexed by flattened id
      val root = reader.getSchema
      val stats = statFields.flatMap { case (name, dt) =>
        subtype(root, name)
          .filter(_.getId < all.length)
          .flatMap(td => colStats(all(td.getId), dt, rows))
          .map(name -> _)
      }.toMap
      DataFileEntry(pathStr, rows, DataFileEntry.PendingSnapshot, 0L,
        schemaId, GraftTable.parsePartition(pathStr, spec), stats,
        fileSize = fileLen,
        specId = Some(spec.specId), format = DataFileEntry.Orc)
    } finally reader.close()
  }

  /** Walk a dotted stat path ("a.b.c") down the file's TypeDescription
    * to the flattened column id; None when any segment is missing (e.g.
    * an identity partition column that lives in the dir name, not the
    * file) or a non-struct interposes.
    */
  private def subtype(root: TypeDescription,
      dotted: String): Option[TypeDescription] =
    dotted.split('.').foldLeft(Option(root)) { (cur, seg) =>
      cur.flatMap { t =>
        if (t.getCategory != TypeDescription.Category.STRUCT) None
        else {
          val i = t.getFieldNames.asScala.indexOf(seg)
          if (i < 0) None else Some(t.getChildren.get(i))
        }
      }
    }

  /** One column's footer statistics → ColStats, producing the exact
    * same normalized encoding the scan-based pass emits for the same
    * data (both call Pruning.normalize; OrcWriteSpec pins byte
    * equality). None = omit the column entirely; bounds of None with a
    * count = suppressed bounds, exact null count.
    */
  private def colStats(cs: ColumnStatistics, dt: DataType,
      rows: Long): Option[ColStats] =
    try {
      val nulls = rows - cs.getNumberOfValues
      def bounds(mn: Any, mx: Any) = Some(ColStats(
        Pruning.normalize(mn, dt), Pruning.normalize(mx, dt), nulls))
      def suppressed = Some(ColStats(None, None, nulls))
      if (cs.getNumberOfValues == 0L) suppressed // all-null column
      else (cs, dt) match {
        case (s: BooleanColumnStatistics, BooleanType) =>
          bounds(s.getFalseCount == 0L, s.getTrueCount > 0L)
        case (s: IntegerColumnStatistics,
            ByteType | ShortType | IntegerType | LongType) =>
          // Long renders the same digits as the narrower scan value
          bounds(s.getMinimum, s.getMaximum)
        case (s: IntegerColumnStatistics, TimestampNTZType) =>
          // Spark's ORC writer stores timestamp_ntz as int64 MICROS
          // (zone-free); normalize's micros branch renders the exact
          // encoding the scan pass produces
          bounds(s.getMinimum, s.getMaximum)
        case (s: DoubleColumnStatistics, FloatType) =>
          if (!java.lang.Double.isFinite(s.getSum)) suppressed
          else bounds(s.getMinimum.toFloat, s.getMaximum.toFloat)
        case (s: DoubleColumnStatistics, DoubleType) =>
          if (!java.lang.Double.isFinite(s.getSum)) suppressed
          else bounds(s.getMinimum, s.getMaximum)
        case (s: StringColumnStatistics, StringType) =>
          // null min/max = the writer truncated (only lower/upper
          // BOUNDS survive, which are not exact values)
          if (s.getMinimum == null || s.getMaximum == null) suppressed
          else bounds(s.getMinimum, s.getMaximum)
        case (s: DateColumnStatistics, DateType) =>
          bounds(java.time.LocalDate.ofEpochDay(s.getMinimumDayOfEpoch),
            java.time.LocalDate.ofEpochDay(s.getMaximumDayOfEpoch))
        case (s: DecimalColumnStatistics, d: DecimalType) =>
          if (s.getMinimum == null || s.getMaximum == null) suppressed
          // HiveDecimal strips trailing zeros; restore the column scale
          // so the encoding is byte-identical to the scan pass
          else bounds(s.getMinimum.bigDecimalValue.setScale(d.scale),
            s.getMaximum.bigDecimalValue.setScale(d.scale))
        case (s: TimestampColumnStatistics,
            TimestampType | TimestampNTZType) =>
          // exact micros via the UTC accessors (ORC 2.x nanos ride the
          // Timestamp), provably zone-correct only under a UTC JVM
          if (!utcJvm || s.getMinimumUTC == null || s.getMaximumUTC == null)
            suppressed
          else bounds(tsMicros(s.getMinimumUTC), tsMicros(s.getMaximumUTC))
        case _ => None // stats/type mismatch — omit, never guess
      }
    } catch { case NonFatal(_) => None } // absent stats are always sound

  private def tsMicros(t: java.sql.Timestamp): Long = Pruning.sqlTsMicros(t)

  private def utcJvm: Boolean =
    java.util.TimeZone.getDefault.toZoneId.normalized ==
      java.time.ZoneOffset.UTC
}
