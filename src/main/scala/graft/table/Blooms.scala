package graft.table

import graft.table.Pruning.{Cmp, InSet}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter
import java.nio.file.{Files, Paths}

/** Per-file BLOOM FILTER file skipping for point lookups.
  *
  * Min/max stats prune range predicates well, but an equality lookup on a
  * high-cardinality UNSORTED column (`id = 123456`) matches every file's
  * [min, max] envelope — at 100 TB that is a million-task scan for one
  * row. A per-file bloom filter answers "is this value definitely absent?"
  * and prunes the plan down to the handful of may-contain files.
  *
  * Design (puffin-style sidecars, not in-manifest bytes):
  *   - Write: opt in per table via the `graft.bloom.columns` property.
  *     The SAME single distributed stats pass that computes min/max also
  *     builds one bloom per (file, column) — Spark's codegen'd
  *     BloomFilterAggregate over xxhash64, zero extra scans. Executors
  *     write the bloom bytes to a SIDECAR file next to the manifest shard
  *     and the manifest entry records only {path, offset, length} — O(1)
  *     manifest growth, the manifest stays a cheap JSON dataset.
  *   - Prune: equality/IN conjuncts test the bloom AFTER min/max — on the
  *     driver below the planning threshold, as an executor-side predicate
  *     over the manifest dataset above it (each row reads only its own
  *     few-KB bloom range). Missing blooms keep the file (conservative);
  *     a bloom can have false positives, never false negatives, so
  *     skipping is exact.
  *   - Applies uniformly wherever may-match pruning runs: scans, counts,
  *     and mutation planning (a definitely-absent key means the file
  *     cannot be affected by the DELETE/MERGE either).
  *
  * Hash contract: both sides hash with XxHash64(seed 42) over the SAME
  * Spark type — integral columns cast to LONG, strings as-is — so the
  * write-side aggregate and the prune-side literal agree bit-for-bit.
  * Only integral and string columns are bloom-eligible (the point-lookup
  * types; float equality is a smell and timestamps prune by range).
  */
object Blooms {

  /** Comma-separated column names to build blooms for. */
  val ColumnsProp = "graft.bloom.columns"
  /** Expected distinct items per file (sizing; default 200k). */
  val ItemsProp = "graft.bloom.items"
  /** Target false-positive rate (default 0.03). */
  val FppProp = "graft.bloom.fpp"

  /** Sidecar location for one entry's blooms: byte ranges per column. */
  case class BloomRef(path: String, cols: Map[String, (Long, Long)])

  def eligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  /** Configured + eligible bloom columns of a schema (dotted struct
    * paths allowed, matching stat paths).
    */
  def bloomColumns(properties: Map[String, String],
      sparkSchema: StructType): Seq[(String, DataType)] =
    properties.get(ColumnsProp).toSeq
      .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))
      .flatMap(name => Pruning.fieldType(sparkSchema, name)
        .filter(eligible).map(name -> _))

  def sizing(properties: Map[String, String]): (Long, Long) = {
    val items = properties.get(ItemsProp).map(_.toLong).getOrElse(200000L)
    val fpp = properties.get(FppProp).map(_.toDouble).getOrElse(0.03)
    (items, BloomFilter.optimalNumOfBits(items, fpp))
  }

  /** Write-side hash column: xxhash64 over the canonical type. */
  def hashColumn(name: String, dt: DataType): Column = dt match {
    case StringType => xxhash64(col(name))
    case _ => xxhash64(col(name).cast(LongType))
  }

  /** Prune-side hash of a NORMALIZED literal string — the same XxHash64
    * expression over the same canonical type as [[hashColumn]]. None when
    * the literal does not parse at the column's type (no bloom pruning —
    * conservative).
    */
  def hashLiteral(value: String, dt: DataType): Option[Long] =
    try {
      val lit = dt match {
        case StringType => Literal.create(value, StringType)
        case _ => Literal(new java.math.BigDecimal(value).longValueExact())
      }
      Some(new XxHash64(Seq(lit)).eval(null).asInstanceOf[Long])
    } catch { case _: Exception => None }

  /** One bloom-testable conjunct: the file may match only if ANY of the
    * hashes might be contained in the column's bloom.
    */
  case class BloomPred(col: String, anyOf: Seq[Long])

  /** Bloom-testable conjuncts of extracted pruning predicates: equality
    * and IN over eligible columns. Everything else tests nothing.
    */
  def bloomPreds(preds: Seq[Any], sparkSchema: StructType): Seq[BloomPred] =
    preds.flatMap {
      case Cmp(c, "=", v) =>
        for {
          dt <- Pruning.fieldType(sparkSchema, c).filter(eligible)
          h <- hashLiteral(v, dt)
        } yield BloomPred(c, Seq(h))
      case InSet(c, vs) =>
        Pruning.fieldType(sparkSchema, c).filter(eligible).flatMap { dt =>
          val hs = vs.map(hashLiteral(_, dt))
          // every IN value must hash, or the pred under-approximates the
          // set and could prune a matching file
          if (hs.nonEmpty && hs.forall(_.isDefined)) Some(BloomPred(c, hs.flatten))
          else None
        }
      case _ => None
    }

  /** Read one bloom from its sidecar byte range. None on any IO/format
    * problem — the file is kept (conservative).
    */
  def readBloom(path: String, off: Long, len: Long): Option[BloomFilter] =
    try {
      val ch = java.nio.channels.FileChannel.open(Paths.get(path))
      try {
        val buf = java.nio.ByteBuffer.allocate(len.toInt)
        ch.position(off)
        while (buf.hasRemaining && ch.read(buf) >= 0) {}
        if (buf.hasRemaining) None
        else Some(BloomFilter.readFrom(buf.array()))
      } finally ch.close()
    } catch { case _: Exception => None }

  /** Driver-side test: does the entry's bloom set admit every conjunct?
    * Missing sidecar/column/unreadable bloom → true (keep).
    */
  def entryMayMatch(e: DataFileEntry, bPreds: Seq[BloomPred]): Boolean =
    bPreds.forall { p =>
      (for {
        ref <- e.bloom
        (off, len) <- ref.cols.get(p.col)
        bloom <- readBloom(ref.path, off, len)
      } yield p.anyOf.exists(bloom.mightContainLong)).getOrElse(true)
    }

  /** The same test as a predicate over the manifest DataFrame (columns:
    * `bloom: struct<path, cols: map<string, struct<off, len>>>`) — the
    * distributed planning path. Each executor row reads only its own
    * bloom byte range; rows without a bloom pass. The probe is a
    * [[BloomProbe.mayMatch]] StaticInvoke (hashes ship as an array
    * literal), so the manifest-planning stage stays inside
    * WholeStageCodegen instead of breaking fusion on a ScalaUDF.
    */
  def mayMatchColumn(bPreds: Seq[BloomPred]): Column =
    bPreds.map { p =>
      val range = col("bloom")("cols")(p.col)
      val test = org.apache.spark.sql.graft.Bridge.column(
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          BloomProbe.getClass, BooleanType, "mayMatch",
          Seq(col("bloom")("path"), range("off"), range("len"),
            lit(p.anyOf.toArray))
            .map(org.apache.spark.sql.graft.Bridge.expression),
          inputTypes =
            Seq(StringType, LongType, LongType, ArrayType(LongType)),
          propagateNull = true, returnNullable = false))
      when(col("bloom").isNull || range.isNull, lit(true))
        .otherwise(test)
    }.foldLeft(lit(true))(_ && _)

  /** Spark SQL schema of the manifest `bloom` column. */
  val sparkField: StructField = StructField("bloom", StructType(Seq(
    StructField("path", StringType),
    StructField("cols", MapType(StringType, StructType(Seq(
      StructField("off", LongType),
      StructField("len", LongType))))))))
}

/** Static holder for the bloom-probe StaticInvoke target: a top-level
  * object gets a static forwarder that generated code calls directly
  * (the same pattern as GraftTable's PathCodec).
  */
object BloomProbe {
  /** Does the sidecar bloom at (path, off, len) admit ANY of `hashes`?
    * Unreadable/missing bloom → true (keep — conservative, exactly like
    * [[Blooms.entryMayMatch]]).
    */
  def mayMatch(path: org.apache.spark.unsafe.types.UTF8String,
      off: Long, len: Long,
      hashes: org.apache.spark.sql.catalyst.util.ArrayData): Boolean =
    Blooms.readBloom(path.toString, off, len).forall { b =>
      (0 until hashes.numElements())
        .exists(i => b.mightContainLong(hashes.getLong(i)))
    }
}
