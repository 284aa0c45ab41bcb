package graft.table

import graft.functions.IcebergHash
import graft.model._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.types._
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Driver-side file pruning: extracts simple conjuncts from a Catalyst
  * filter expression and evaluates them against manifest partition values
  * (transform-aware — the spec's hidden partitioning) and per-column
  * min/max stats. Strictly conservative: anything unrecognized keeps the
  * file, and the residual filter is always applied after the scan, so
  * pruning can only skip files that provably cannot match.
  *
  * At 100 TB this is THE win: the query never touches pruned files, and
  * the same may-match logic would run distributed over a Spark-read
  * manifest dataset.
  */
object Pruning {

  /** A normalized comparison: column name, op ∈ {=,<,<=,>,>=}, value in
    * the manifest's normalized string encoding.
    */
  case class Cmp(col: String, op: String, value: String)
  case class InSet(col: String, values: Seq[String])
  case class NullCmp(col: String, isNull: Boolean)
  case class Prefix(col: String, prefix: String)

  private val TsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    .withZone(ZoneOffset.UTC)

  private val LocalFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")

  private def isTs(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  /** Types whose manifest min/max strings certify an exact global
    * MIN/MAX. Float/double are excluded (NaN ordering), zoned timestamps
    * are excluded (the SQL-side decode would depend on session
    * timezone), booleans add nothing.
    */
  def statAggregable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         DateType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Decode a normalized stat string back to the external JVM value
    * (inverse of `normalize` for `statAggregable` types).
    */
  def decodeStat(s: String, dt: DataType): Any = dt match {
    case ByteType => s.toByte
    case ShortType => s.toShort
    case IntegerType => s.toInt
    case LongType => s.toLong
    case StringType => s
    case DateType => java.time.LocalDate.parse(s)
    case TimestampNTZType => LocalDateTime.parse(s, LocalFmt)
    case d: DecimalType =>
      new java.math.BigDecimal(s).setScale(d.scale)
    case other =>
      throw new IllegalArgumentException(s"not stat-aggregable: $other")
  }

  /** SQL-side equivalent of `decodeStat`, so stat extremes aggregate
    * DISTRIBUTED over the manifest dataset (normalized encodings order
    * correctly under the decoded type).
    */
  def decodeStatColumn(c: org.apache.spark.sql.Column,
      dt: DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    dt match {
      case StringType => c
      case DateType => to_date(c)
      case TimestampNTZType =>
        to_timestamp_ntz(c, lit("yyyy-MM-dd HH:mm:ss.SSSSSS"))
      case other => c.cast(other) // integral + decimal plain strings
    }
  }

  /** Normalize a collected/literal value to the manifest string encoding.
    * Covers both external (collect) and internal (Literal.eval) forms of
    * timestamps — with and without timezone (Spark 4 infers parquet
    * timestamps as TimestampNTZ).
    */
  def normalize(v: Any, dt: DataType): Option[String] = (v, dt) match {
    case (null, _) => None
    case (t: java.sql.Timestamp, _) => Some(TsFmt.format(t.toInstant))
    case (i: Instant, _) => Some(TsFmt.format(i))
    case (l: LocalDateTime, _) => Some(LocalFmt.format(l))
    case (d: java.sql.Date, _) => Some(d.toString)
    case (d: LocalDate, _) => Some(d.toString)
    case (micros: Long, t) if isTs(t) =>
      Some(TsFmt.format(Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)))
    case (days: Int, DateType) => Some(LocalDate.ofEpochDay(days.toLong).toString)
    case (s: org.apache.spark.unsafe.types.UTF8String, t) if isTs(t) =>
      Some(normTsString(s.toString))
    case (s: org.apache.spark.unsafe.types.UTF8String, _) => Some(s.toString)
    case (s: String, t) if isTs(t) => Some(normTsString(s))
    // A string value for a float/double column is a partition-dir
    // rendering (shortest repr of the FLOAT/double) — parse it at the
    // column's own precision, then exact-widen like the cases below.
    case (s: String, FloatType) =>
      try normalize(s.toFloat, FloatType)
      catch { case _: NumberFormatException => Some(s) }
    case (s: String, DoubleType) =>
      try normalize(s.toDouble, DoubleType)
      catch { case _: NumberFormatException => Some(s) }
    // Float/Double: encode the EXACT binary value as a decimal string, not
    // the shortest round-trip repr. Filters compare in double space
    // (float cols upcast), where 0.35f = 0.3499999940395355…; the shortest
    // repr "0.35" decimal-compares GREATER than that, so a file whose rows
    // genuinely match `floatCol < 0.35` could be pruned — silent row loss.
    // Exact widened strings make BigDecimal ordering ≡ double ordering on
    // both the stats-write side and the literal side (both call normalize).
    // NaN/±Infinity fall through to toString; compare's Double fallback
    // orders them (NaN greatest, matching Spark).
    case (f: Float, _) if java.lang.Float.isFinite(f) =>
      Some(new java.math.BigDecimal(f.toDouble).toPlainString)
    case (d: Double, _) if java.lang.Double.isFinite(d) =>
      Some(new java.math.BigDecimal(d).toPlainString)
    case (other, _) => Some(other.toString)
  }

  /** java.sql.Timestamp → exact epoch micros (millis floor + the nanos
    * field carries the sub-milli part). The ONE conversion shared by
    * the ORC footer bounds and the avro inline stats — they must stay
    * byte-identical to the scan pass and to each other.
    */
  private[table] def sqlTsMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Parse the normalized timestamp encoding back to epoch micros
    * (inverse of the TsFmt rendering; Avro manifest export encodes
    * timestamp bounds as micros).
    */
  private[table] def tsMicros(s: String): Long = {
    val inst = LocalDateTime.parse(s, LocalFmt).toInstant(ZoneOffset.UTC)
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  /** Pad a user-written timestamp literal ("1998-09-02" or
    * "1998-09-02 12:00:00") to the full normalized encoding.
    */
  private def normTsString(s: String): String = {
    val ldt =
      if (s.length == 10) LocalDate.parse(s).atStartOfDay
      else LocalDateTime.parse(s.replace(' ', 'T'))
    TsFmt.format(ldt.toInstant(ZoneOffset.UTC))
  }

  /** Attribute name behind an (optionally numeric-widening-cast) column
    * reference; struct-field access chains resolve to DOTTED paths
    * ("a.b.c"), matching the manifest's nested stat keys. Casts that
    * change comparison semantics (e.g. ts→date) are rejected → that
    * conjunct is skipped (conservative).
    */
  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: AttributeReference => Some(a.name)
    case g: org.apache.spark.sql.catalyst.expressions.GetStructField =>
      attrName(g.child).map(p => s"$p.${g.extractFieldName}")
    case c: org.apache.spark.sql.catalyst.expressions.Cast
        if org.apache.spark.sql.catalyst.expressions.Cast
          .canUpCast(c.child.dataType, c.dataType) => attrName(c.child)
    case _ => None
  }

  /** Data type at a (possibly dotted) stat path. */
  def fieldType(schema: StructType, path: String): Option[DataType] = {
    def walk(st: DataType, parts: List[String]): Option[DataType] =
      (st, parts) match {
        case (t, Nil) => Some(t)
        case (s: StructType, h :: rest) =>
          s.fields.find(_.name == h).flatMap(f => walk(f.dataType, rest))
        case _ => None
      }
    // prefer an exact top-level match (a column literally named "a.b")
    schema.fields.find(_.name == path).map(_.dataType)
      .orElse(walk(schema, path.split('.').toList))
  }

  /** A foldable scalar → (value, type). Analysis wraps user literals in
    * Casts (string → timestamp etc.), so evaluate foldables.
    */
  private def litVal(e: Expression): Option[(Any, DataType)] = e match {
    case l: Literal => Some((l.value, l.dataType))
    case _ if e.foldable && e.deterministic =>
      try Some((e.eval(null), e.dataType)) catch { case _: Exception => None }
    case _ => None
  }

  /** Extract prunable conjuncts from a filter Column by ANALYZING it
    * against an empty relation with the table schema — the analyzer
    * resolves attributes and coerces literals, so we walk typed Catalyst
    * comparisons. Unrecognized sub-expressions extract to nothing
    * (conservative: fewer conjuncts = fewer pruned files, never wrong).
    */
  def extract(spark: org.apache.spark.sql.SparkSession, filter: Column,
      schema: StructType): Seq[Any] =
    extractWithCompleteness(spark, filter, schema)._1

  /** Like extract, but also reports whether EVERY conjunct of the filter
    * translated into a pruning predicate. Pruning is sound either way
    * (conservative); metadata-only shortcuts like countRows' mustMatch
    * are only valid when the translation is COMPLETE.
    */
  def extractWithCompleteness(spark: org.apache.spark.sql.SparkSession,
      filter: Column, schema: StructType): (Seq[Any], Boolean) = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val analyzed =
      try empty.filter(filter).queryExecution.analyzed
      catch { case _: Exception => return (Seq.empty, false) }
    val cond = analyzed.collectFirst { case f: LFilter => f.condition }
      .getOrElse(return (Seq.empty, false))

    def cmp(a: Expression, op: String, v: Expression): Seq[Any] = for {
      name <- attrName(a).toSeq
      (value, dt) <- litVal(v).toSeq
      s <- normalize(value, dt).toSeq
    } yield Cmp(name, op, s)

    def walk(e: Expression): Seq[Any] = e match {
      case And(l, r) => walk(l) ++ walk(r)
      case EqualTo(a, v) if attrName(a).isDefined => cmp(a, "=", v)
      case EqualTo(v, a) if attrName(a).isDefined => cmp(a, "=", v)
      case GreaterThan(a, v) if attrName(a).isDefined => cmp(a, ">", v)
      case GreaterThan(v, a) if attrName(a).isDefined => cmp(a, "<", v)
      case GreaterThanOrEqual(a, v) if attrName(a).isDefined => cmp(a, ">=", v)
      case GreaterThanOrEqual(v, a) if attrName(a).isDefined => cmp(a, "<=", v)
      case LessThan(a, v) if attrName(a).isDefined => cmp(a, "<", v)
      case LessThan(v, a) if attrName(a).isDefined => cmp(a, ">", v)
      case LessThanOrEqual(a, v) if attrName(a).isDefined => cmp(a, "<=", v)
      case LessThanOrEqual(v, a) if attrName(a).isDefined => cmp(a, ">=", v)
      case In(a, vs) if attrName(a).isDefined =>
        val name = attrName(a).get
        val vals = vs.map(v => litVal(v).flatMap { case (x, dt) => normalize(x, dt) })
        if (vals.nonEmpty && vals.forall(_.isDefined))
          Seq(InSet(name, vals.flatten))
        else Seq.empty
      case org.apache.spark.sql.catalyst.expressions.IsNull(a)
          if attrName(a).isDefined =>
        Seq(NullCmp(attrName(a).get, isNull = true))
      case org.apache.spark.sql.catalyst.expressions.IsNotNull(a)
          if attrName(a).isDefined =>
        Seq(NullCmp(attrName(a).get, isNull = false))
      case org.apache.spark.sql.catalyst.expressions.StartsWith(a, v)
          if attrName(a).isDefined =>
        litVal(v) match {
          // ASCII-only: char truncation == byte truncation, so the
          // min/max prefix bound below is sound; otherwise skip
          case Some((p: org.apache.spark.unsafe.types.UTF8String, _))
              if p.toString.forall(_ < 128) =>
            Seq(Prefix(attrName(a).get, p.toString))
          case _ => Seq.empty
        }
      case _ => Seq.empty
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val preds = walk(cond)
    val complete = conjuncts(cond).forall(c => walk(c).nonEmpty)
    (preds, complete)
  }

  /** Type-aware ordering on the normalized string encoding. NaN/Infinity
    * stats fall back to Double ordering (NaN greatest, matching Spark);
    * strings compare in UTF-8 byte order (Spark's collation — UTF-16
    * compareTo disagrees for supplementary characters).
    */
  def compare(a: String, b: String, dt: DataType): Int = dt match {
    case _: NumericType =>
      try new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
      catch { case _: NumberFormatException =>
        java.lang.Double.compare(a.toDouble, b.toDouble)
      }
    case _ => utf8Compare(a, b) // ISO dates/padded timestamps are ASCII
  }

  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Could any row in the file match every extracted conjunct? */
  def mayMatch(entry: DataFileEntry, preds: Seq[Any], schema: StructType,
      spec: PartitionSpec, specSchema: SchemaV2): Boolean = {
    preds.forall {
      case Cmp(colName, op, value) =>
        statsMayMatch(entry, colName, op, value, schema) &&
          partitionMayMatch(entry, colName, op, value, schema, spec, specSchema)
      case InSet(colName, values) =>
        values.exists(v => statsMayMatch(entry, colName, "=", v, schema) &&
          partitionMayMatch(entry, colName, "=", v, schema, spec, specSchema))
      case NullCmp(colName, true) =>
        entry.stats.get(colName).forall(_.nulls > 0L)
      case NullCmp(colName, false) =>
        entry.stats.get(colName).forall(_.nulls < entry.recordCount)
      case Prefix(colName, p) => entry.stats.get(colName) match {
        // a row with prefix p lies in [p, succ(p)); truncating byte-
        // ordered bounds to |p| is monotone, so matching files satisfy
        // min.take ≤ p ≤ max.take (ASCII-guarded at extraction)
        case Some(ColStats(Some(mn), Some(mx), _)) =>
          utf8Compare(mn.take(p.length), p) <= 0 &&
            utf8Compare(mx.take(p.length), p) >= 0
        case _ => true
      }
      case _ => true
    }
  }

  private def statsMayMatch(entry: DataFileEntry, colName: String, op: String,
      value: String, schema: StructType): Boolean = {
    val dt = fieldType(schema, colName)
      .getOrElse(return true)
    entry.stats.get(colName) match {
      case Some(ColStats(Some(mn), Some(mx), _)) => op match {
        case "=" => compare(mn, value, dt) <= 0 && compare(mx, value, dt) >= 0
        case "<" => compare(mn, value, dt) < 0
        case "<=" => compare(mn, value, dt) <= 0
        case ">" => compare(mx, value, dt) > 0
        case ">=" => compare(mx, value, dt) >= 0
        case _ => true
      }
      case _ => true // no stats (or all-null file) → conservative keep
    }
  }

  /** Does EVERY row of the file satisfy the conjunct? (The dual of
    * mayMatch, used for metadata-only counts: fully-matching files
    * contribute their record count without being read.) Strictly
    * conservative the other way — uncertain means "not fully".
    */
  def mustMatch(entry: DataFileEntry, preds: Seq[Any],
      schema: StructType): Boolean =
    preds.forall {
      case Cmp(colName, op, value) =>
        val dt = fieldType(schema, colName)
          .getOrElse(return false)
        entry.stats.get(colName) match {
          case Some(ColStats(Some(mn), Some(mx), nulls)) if nulls == 0L =>
            op match {
              case "=" => compare(mn, value, dt) == 0 && compare(mx, value, dt) == 0
              case "<" => compare(mx, value, dt) < 0
              case "<=" => compare(mx, value, dt) <= 0
              case ">" => compare(mn, value, dt) > 0
              case ">=" => compare(mn, value, dt) >= 0
              case _ => false
            }
          case _ => false // missing stats or nulls present → must scan
        }
      case NullCmp(colName, true) =>
        entry.stats.get(colName).exists(_.nulls == entry.recordCount)
      case NullCmp(colName, false) =>
        entry.stats.get(colName).exists(_.nulls == 0L)
      case Prefix(colName, p) =>
        entry.stats.get(colName).exists(s => s.nulls == 0L &&
          s.min.exists(_.startsWith(p)) && s.max.exists(_.startsWith(p)))
      case _ => false // InSet and unknowns → must scan
    }

  /** Transform-aware partition pruning: identity compares directly;
    * year/month/day/hour compare ordinals with boundary-conservative
    * ranges; bucket/truncate prune equality only.
    */
  private def partitionMayMatch(entry: DataFileEntry, colName: String,
      op: String, value: String, schema: StructType, spec: PartitionSpec,
      specSchema: SchemaV2): Boolean = {
    val dt = fieldType(schema, colName)
      .getOrElse(return true)
    spec.fields.forall { pf =>
      val sourceName = specSchema.fieldById(pf.sourceId).map(_.name)
      if (!sourceName.contains(colName)) true
      else entry.partition.get(pf.name) match {
        case None | Some(None) => true // no value recorded → keep
        case Some(Some(pv0)) => pf.transform match {
          case TIdentity =>
            // partition-dir strings are Spark's rendering (e.g. a
            // timestamp without its trailing fraction); re-normalize to
            // the manifest encoding before comparing
            val pv =
              try normalize(pv0, dt).getOrElse(pv0)
              catch { case _: Exception => return true } // unparseable → keep
            op match {
              case "=" => compare(pv, value, dt) == 0
              case "<" => compare(pv, value, dt) < 0
              case "<=" => compare(pv, value, dt) <= 0
              case ">" => compare(pv, value, dt) > 0
              case ">=" => compare(pv, value, dt) >= 0
              case _ => true
            }
          case TYear | TMonth | TDay | THour =>
            calendarOrdinal(value, pf.transform) match {
              case None => true
              case Some(ord) =>
                val p = pv0.toLong
                op match {
                  case "=" => p == ord
                  case "<" | "<=" => p <= ord // partial buckets at boundary
                  case ">" | ">=" => p >= ord
                  case _ => true
                }
            }
          case TBucket(n) if op == "=" =>
            bucketOf(value, dt, n).forall(_ == pv0.toInt)
          case TTruncate(w) if op == "=" => dt match {
            case IntegerType | LongType | ShortType | ByteType =>
              val v = new java.math.BigDecimal(value).longValueExact()
              pv0.toLong == v - (((v % w) + w) % w)
            case StringType => pv0 == value.take(w)
            case _ => true
          }
          case _ => true
        }
      }
    }
  }

  /** The same may-match logic as a Column PREDICATE over a manifest
    * DataFrame (columns: `partition: map<string,string>`, `stats:
    * map<string,struct<min,max,nulls>>`) — the distributed planning path:
    * at 100 TB the manifest is itself a dataset and pruning runs as a
    * Spark filter instead of a driver loop. Conservative exactly like
    * mayMatch: anything missing/unrecognized keeps the file.
    */
  def mayMatchColumn(preds: Seq[Any], schema: StructType,
      spec: PartitionSpec, specSchema: SchemaV2): Column = {
    import org.apache.spark.sql.functions._

    def cmpCol(a: Column, op: String, value: String, dt: DataType): Column =
      statCmp(a, op, value, dt, onNull = true)

    def one(colName: String, op: String, value: String): Column = {
      val dt = fieldType(schema, colName)
        .getOrElse(return lit(true))
      val st = col("stats")(colName)
      val statsOk = when(st.isNull || st("min").isNull || st("max").isNull,
        lit(true)).otherwise(op match {
        case "=" => cmpCol(st("min"), "<=", value, dt) &&
          cmpCol(st("max"), ">=", value, dt)
        case "<" => cmpCol(st("min"), "<", value, dt)
        case "<=" => cmpCol(st("min"), "<=", value, dt)
        case ">" => cmpCol(st("max"), ">", value, dt)
        case ">=" => cmpCol(st("max"), ">=", value, dt)
        case _ => lit(true)
      })
      val partOk = spec.fields.map { pf =>
        val sourceName = specSchema.fieldById(pf.sourceId).map(_.name)
        if (!sourceName.contains(colName)) lit(true)
        else {
          val pv = col("partition")(pf.name)
          val base = pf.transform match {
            case TIdentity if isTs(dt) || dt == DateType =>
              lit(true) // dir-string rendering differs; stats still prune
            case TIdentity => cmpCol(pv, op, value, dt)
            case TYear | TMonth | TDay | THour =>
              calendarOrdinal(value, pf.transform) match {
                case None => lit(true)
                case Some(ord) => op match {
                  case "=" => pv.cast("long") === ord
                  case "<" | "<=" => pv.cast("long") <= ord
                  case ">" | ">=" => pv.cast("long") >= ord
                  case _ => lit(true)
                }
              }
            case TBucket(n) if op == "=" =>
              bucketOf(value, dt, n).map(b => pv.cast("int") === b)
                .getOrElse(lit(true))
            case _ => lit(true)
          }
          when(pv.isNull, lit(true)).otherwise(base)
        }
      }.foldLeft(lit(true))(_ && _)
      statsOk && partOk
    }

    preds.map {
      case Cmp(c, op, v) => one(c, op, v)
      case InSet(c, vs) => vs.map(v => one(c, "=", v))
        .foldLeft(lit(false))(_ || _)
      case NullCmp(c, isNull) =>
        val st = col("stats")(c)
        when(st.isNull, lit(true)).otherwise(
          if (isNull) st("nulls") > 0L
          else st("nulls") < col("record-count"))
      case Prefix(c, p) =>
        val st = col("stats")(c)
        when(st.isNull || st("min").isNull || st("max").isNull, lit(true))
          .otherwise(substring(st("min"), 1, p.length) <= p &&
            substring(st("max"), 1, p.length) >= p)
      case _ => lit(true)
    }.foldLeft(lit(true))(_ && _)
  }

  /** Stat-string comparison as a Column: exact, type-appropriate casts —
    * integrals through Decimal(38,0) (exact for any long), floats/
    * doubles through double (stats are round-tripped doubles; FLOAT
    * strings parse at float precision then widen so comparison happens
    * in the filter's double space), decimals at their own scale. A
    * failed cast yields `onNull` — true on the may-match side (keep the
    * file, conservative) and false on the must-match side (scan it,
    * conservative).
    */
  private def statCmp(a: Column, op: String, value: String, dt: DataType,
      onNull: Boolean): Column = {
    import org.apache.spark.sql.functions._
    val (l, r) = dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        (a.cast(DecimalType(38, 0)),
          lit(new java.math.BigDecimal(value)).cast(DecimalType(38, 0)))
      case FloatType =>
        (a.cast("float").cast("double"), lit(value.toDouble))
      case DoubleType =>
        (a.cast("double"), lit(value.toDouble))
      case d: DecimalType =>
        (a.cast(DecimalType(38, math.min(d.scale, 37))),
          lit(new java.math.BigDecimal(value))
            .cast(DecimalType(38, math.min(d.scale, 37))))
      case _ => (a, lit(value))
    }
    val c = op match {
      case "=" => l === r
      case "<" => l < r
      case "<=" => l <= r
      case ">" => l > r
      case ">=" => l >= r
    }
    coalesce(c, lit(onNull))
  }

  /** Column form of [[mustMatch]] over manifest rows: TRUE only when the
    * file's stats PROVE every row matches every conjunct (no nulls, full
    * range inside the predicate). Strictly conservative toward false —
    * missing stats, untranslatable columns, or failed casts mean "must
    * scan", exactly like the driver path.
    */
  def mustMatchColumn(preds: Seq[Any], schema: StructType): Column = {
    import org.apache.spark.sql.functions._
    def one(colName: String, op: String, value: String): Column = {
      val dt = fieldType(schema, colName)
        .getOrElse(return lit(false))
      val st = col("stats")(colName)
      when(st.isNull || st("min").isNull || st("max").isNull ||
          st("nulls") =!= 0L, lit(false))
        .otherwise(op match {
          case "=" => statCmp(st("min"), "=", value, dt, onNull = false) &&
            statCmp(st("max"), "=", value, dt, onNull = false)
          case "<" => statCmp(st("max"), "<", value, dt, onNull = false)
          case "<=" => statCmp(st("max"), "<=", value, dt, onNull = false)
          case ">" => statCmp(st("min"), ">", value, dt, onNull = false)
          case ">=" => statCmp(st("min"), ">=", value, dt, onNull = false)
          case _ => lit(false)
        })
    }
    preds.map {
      case Cmp(c, op, v) => one(c, op, v)
      case NullCmp(c, true) =>
        val st = col("stats")(c)
        coalesce(st("nulls") === col("record-count"), lit(false))
      case NullCmp(c, false) =>
        val st = col("stats")(c)
        coalesce(st("nulls") === 0L, lit(false))
      case Prefix(c, p) =>
        val st = col("stats")(c)
        coalesce(st("nulls") === 0L &&
          substring(st("min"), 1, p.length) === p &&
          substring(st("max"), 1, p.length) === p, lit(false))
      case _ => lit(false) // InSet and unknowns → must scan
    }.foldLeft(lit(true))(_ && _)
  }

  /** Ordinal of a normalized literal under a calendar transform. */
  def calendarOrdinal(value: String, t: Transform): Option[Long] = {
    val ldt =
      try {
        if (value.length == 10) LocalDate.parse(value).atStartOfDay
        else LocalDateTime.parse(value.replace(' ', 'T'))
      } catch { case _: Exception => return None }
    t match {
      case TYear => Some(ldt.getYear.toLong - 1970L)
      case TMonth => Some((ldt.getYear - 1970L) * 12L + ldt.getMonthValue - 1L)
      case TDay => Some(ldt.toLocalDate.toEpochDay)
      case THour => Some(ldt.toEpochSecond(ZoneOffset.UTC) / 3600L)
      case _ => None
    }
  }

  private def bucketOf(value: String, dt: DataType, n: Int): Option[Int] =
    dt match {
      case IntegerType | LongType | ShortType | ByteType =>
        Some(IcebergHash.bucketLong(
          new java.math.BigDecimal(value).longValueExact(), n))
      case StringType =>
        Some(IcebergHash.bucketBytes(value.getBytes("UTF-8"), n))
      case _ => None
    }
}
