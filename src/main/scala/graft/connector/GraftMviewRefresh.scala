package graft.connector

import graft.table.GraftTable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Incremental materialized-view refresh (the scale path for
  * `refresh_mview`): instead of recomputing the stored SQL over the FULL
  * base — O(base) every refresh, a petabyte re-scan for an aggregate MV
  * over a petabyte table — apply the base's row-level changelog since the
  * last refresh's sequence watermark and merge per-key aggregate deltas.
  * Per refresh that scans O(delta) base rows and O(MV) state rows; the
  * base is never re-read.
  *
  * Incrementable definitions: `SELECT <group/agg exprs> FROM <one graft
  * table> [WHERE pred] GROUP BY <exprs>` with COUNT / SUM / non-decimal
  * AVG aggregates (no DISTINCT, no FILTER clauses). The decomposed
  * per-group state (count, sum, avg = sum+count pairs, plus a liveness
  * row count so fully-deleted groups drop out) lives in a versioned
  * parquet sidecar under `<mv>/mvstate/v{N}`; `mvstate/refresh.json`
  * records base location + sequence watermark + the MV-table and
  * state versions the last refresh committed.
  *
  * Crash safety / out-of-band writes: the marker is written LAST
  * (atomic rename). A crash mid-refresh — or anyone writing the MV
  * table directly — leaves the marker's recorded MV snapshot stale, the
  * next refresh detects the mismatch and falls back to a full recompute
  * that re-bootstraps the state. `ALTER VIEW ... SET TBLPROPERTIES
  * ('graft.mview.refresh'='full')` opts a view out entirely.
  *
  * MIN/MAX are additionally maintainable on APPEND-ONLY deltas (they
  * are monotone under inserts); a delta carrying delete rows falls back
  * to a full recompute for such definitions. Anything else
  * non-incrementable (joins, distinct aggregates, window functions,
  * ...) always takes the proven full recompute, as does a changelog
  * range with expired base snapshots inside it (copy-on-write commits
  * are expressible — the changelog derives their net changes — so CoW
  * DML no longer forces a full recompute).
  */
private[graft] object GraftMviewRefresh {

  /** View property forcing full recompute on every refresh. */
  val RefreshModeProp = "graft.mview.refresh"

  case class IncrementalSpec(
      baseLocation: String,
      filter: Option[Expression],
      groupExprs: Seq[Expression],
      resultExprs: Seq[NamedExpression],
      aggs: Seq[AggregateExpression]) {
    /** MIN/MAX are monotone under INSERTS only: an incremental refresh
      * may use them on append-only deltas but must fall back to a full
      * recompute the moment a delta carries deletes (a deleted extremum
      * cannot be un-taken from the running state).
      */
    def hasMinMax: Boolean = aggs.exists(_.aggregateFunction match {
      case _: Min | _: Max => true
      case _ => false
    })
  }

  case class RefreshResult(snapshotId: Long, rowCount: Long,
      mode: String, deltaRows: Long)

  // ------------------------------------------------ spec extraction ----

  /** Recognize an incrementally-maintainable aggregate over one graft
    * table in the ANALYZED plan of the stored SQL; None = full path.
    */
  def extract(analyzed: LogicalPlan): Option[IncrementalSpec] = {
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => strip(c)
      case p => p
    }
    strip(analyzed) match {
      case a: Aggregate =>
        val (filterOpt, rel) = strip(a.child) match {
          case f: Filter => (Some(f.condition), strip(f.child))
          case other => (None, other)
        }
        val baseLoc = rel match {
          case r: DataSourceV2Relation => r.table match {
            case g: GraftSparkTable => Some(g.location)
            case _ => None
          }
          case _ => None
        }
        def aggOk(ae: AggregateExpression): Boolean =
          !ae.isDistinct && ae.filter.isEmpty &&
            (ae.aggregateFunction match {
              case c: Count => c.children.forall(_.deterministic)
              case s: Sum => s.child.deterministic
              // decimal AVG has bespoke precision/scale division rules a
              // sum/count replay would not reproduce bit-exactly
              case av: Average => av.child.deterministic &&
                !av.child.dataType.isInstanceOf[DecimalType]
              // append-only-incrementable; deltas with deletes force a
              // full recompute (checked at refresh time)
              case mn: Min => mn.child.deterministic
              case mx: Max => mx.child.deterministic
              case _ => false
            })
        def coveredByGroup(e: Expression): Boolean =
          a.groupingExpressions.exists(_.semanticEquals(e))
        // every output leaf must be an allowed aggregate or part of a
        // grouping expression — a stray attribute or subquery means the
        // projection cannot be replayed from the state
        def validate(e: Expression): Boolean = e match {
          case ae: AggregateExpression => aggOk(ae)
          case e if coveredByGroup(e) => true
          case _: AttributeReference => false
          case _: PlanExpression[_] => false
          case e => e.deterministic && e.children.forall(validate)
        }
        val resultsOk = a.aggregateExpressions.forall {
          case Alias(child, _) => validate(child)
          case e => validate(e)
        }
        val groupsOk = a.groupingExpressions.forall(g =>
          g.deterministic && !g.exists(_.isInstanceOf[PlanExpression[_]]))
        val filterOk = filterOpt.forall(f =>
          f.deterministic && !f.exists(_.isInstanceOf[PlanExpression[_]]))
        baseLoc match {
          case Some(loc) if resultsOk && groupsOk && filterOk &&
              a.groupingExpressions.nonEmpty =>
            val aggs = a.aggregateExpressions
              .flatMap(_.collect { case ae: AggregateExpression => ae })
              .foldLeft(Vector.empty[AggregateExpression])((acc, ae) =>
                if (acc.exists(_.semanticEquals(ae))) acc else acc :+ ae)
            Some(IncrementalSpec(loc, filterOpt, a.groupingExpressions,
              a.aggregateExpressions, aggs))
          case _ => None
        }
      case _ => None
    }
  }

  /** Rebind analyzed attribute references by NAME so the expression can
    * re-resolve against the changelog / state DataFrames.
    */
  private def byName(e: Expression): Expression = e.transformUp {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }
  private def colOf(e: Expression): Column = Bridge.column(byName(e))

  /** One persisted state column and how two states of it merge:
    * additive (counts/sums), or extremum (least/greatest for MIN/MAX).
    */
  private case class StateCol(name: String, op: String)

  private def stateCols(spec: IncrementalSpec): Seq[StateCol] =
    spec.aggs.zipWithIndex.flatMap { case (ae, i) =>
      ae.aggregateFunction match {
        case _: Count => Seq(StateCol(s"a${i}_cnt", "add"))
        // SUM carries a non-null count too: deleting a group's last
        // non-null value must take the sum back to NULL, which the
        // running sum alone cannot express (it lands on 0, not NULL)
        case _: Sum => Seq(StateCol(s"a${i}_sum", "add"),
          StateCol(s"a${i}_cnt", "add"))
        case _: Average => Seq(StateCol(s"a${i}_sum", "add"),
          StateCol(s"a${i}_cnt", "add"))
        case _: Min => Seq(StateCol(s"a${i}_min", "min"))
        case _: Max => Seq(StateCol(s"a${i}_max", "max"))
      }
    } :+ StateCol("__rows", "add")

  /** Per-group decomposed state from a signed change feed (`insert`
    * rows +1, `delete` rows −1). A plain base scan tagged all-insert
    * reuses this for the bootstrap, so full and incremental states are
    * computed by the SAME expressions.
    */
  private def states(changes: DataFrame, spec: IncrementalSpec)
      : DataFrame = {
    val filtered = spec.filter
      .map(f => changes.filter(colOf(f))).getOrElse(changes)
    val del = col("_change_type") === "delete"
    val sign = when(del, lit(-1L)).otherwise(lit(1L))
    val keys = spec.groupExprs.zipWithIndex.map { case (g, i) =>
      colOf(g).as(s"k$i") }
    val cols = spec.aggs.zipWithIndex.flatMap { case (ae, i) =>
      ae.aggregateFunction match {
        case c: Count =>
          // COUNT(*) parses as Count(1): all-foldable children count
          // every row; otherwise rows where every argument is non-null
          val cond =
            if (c.children.forall(_.foldable)) lit(true)
            else c.children.map(ch => colOf(ch).isNotNull)
              .reduce(_ && _)
          Seq(sum(when(cond, sign).otherwise(lit(0L))).as(s"a${i}_cnt"))
        case s: Sum =>
          val x = colOf(s.child)
          // negate instead of multiply: -x preserves decimal scale
          Seq(sum(when(del, -x).otherwise(x)).as(s"a${i}_sum"),
            sum(when(x.isNotNull, sign).otherwise(lit(0L)))
              .as(s"a${i}_cnt"))
        case av: Average =>
          // Spark's Average accumulates non-decimal inputs as double
          val x = colOf(av.child).cast(DoubleType)
          Seq(sum(when(del, -x).otherwise(x)).as(s"a${i}_sum"),
            sum(when(x.isNotNull, sign).otherwise(lit(0L)))
              .as(s"a${i}_cnt"))
        // sign-free: the refresh only routes append-only deltas here
        // (hasMinMax + delete rows -> full recompute)
        case mn: Min => Seq(min(colOf(mn.child)).as(s"a${i}_min"))
        case mx: Max => Seq(max(colOf(mx.child)).as(s"a${i}_max"))
      }
    } :+ sum(sign).as("__rows")
    filtered.groupBy(keys: _*).agg(cols.head, cols.tail: _*)
  }

  /** Merge old state with a delta state: per-key sums add (null-aware:
    * both-null stays null — an all-null SUM group), groups whose live
    * row count hits zero drop out.
    */
  private def merge(old: DataFrame, delta: DataFrame,
      spec: IncrementalSpec): DataFrame = {
    val keys = spec.groupExprs.indices.map(i => s"k$i")
    val o = old.alias("o"); val d = delta.alias("d")
    val cond = keys.map(k => col(s"o.$k") <=> col(s"d.$k"))
      .reduce(_ && _)
    val keyCols = keys.map(k =>
      coalesce(col(s"o.$k"), col(s"d.$k")).as(k))
    val merged = stateCols(spec).map { sc =>
      val (o2, d2) = (col(s"o.${sc.name}"), col(s"d.${sc.name}"))
      (sc.op match {
        // null-aware: both-null stays null, one-sided carries through
        case "add" => coalesce(o2 + d2, o2, d2)
        case "min" => least(o2, d2) // least/greatest skip nulls
        case "max" => greatest(o2, d2)
      }).as(sc.name)
    }
    o.join(d, cond, "full_outer")
      .select((keyCols ++ merged): _*)
      .filter(col("__rows") > 0)
  }

  /** Replay the view's output projection over the merged state: each
    * aggregate node becomes its state column (AVG = guarded sum/count
    * division), each grouping expression its key column; the surrounding
    * expression tree (casts, rounding, arithmetic) evaluates unchanged.
    */
  private def finals(state: DataFrame, spec: IncrementalSpec)
      : DataFrame = {
    def finalOf(ae: AggregateExpression, i: Int): Expression =
      ae.aggregateFunction match {
        case _: Count => UnresolvedAttribute.quoted(s"a${i}_cnt")
        case _: Sum =>
          // NULL when no non-null values remain (float cancellation can
          // leave the running sum at 0.0 after the last delete)
          If(EqualTo(UnresolvedAttribute.quoted(s"a${i}_cnt"),
              Literal(0L)),
            Literal(null, ae.dataType),
            Cast(UnresolvedAttribute.quoted(s"a${i}_sum"), ae.dataType))
        case _: Average =>
          val cnt = UnresolvedAttribute.quoted(s"a${i}_cnt")
          val sm = UnresolvedAttribute.quoted(s"a${i}_sum")
          // float cancellation can leave sum=0.0 with cnt=0: guard the
          // division (ANSI mode errors on /0; AVG of no rows is NULL)
          If(EqualTo(cnt, Literal(0L)), Literal(null, ae.dataType),
            Cast(Divide(sm, Cast(cnt, DoubleType)), ae.dataType))
        case _: Min =>
          Cast(UnresolvedAttribute.quoted(s"a${i}_min"), ae.dataType)
        case _: Max =>
          Cast(UnresolvedAttribute.quoted(s"a${i}_max"), ae.dataType)
      }
    def subst(e: Expression): Expression = e match {
      case ae: AggregateExpression =>
        finalOf(ae, spec.aggs.indexWhere(_.semanticEquals(ae)))
      case g if spec.groupExprs.exists(_.semanticEquals(g)) =>
        UnresolvedAttribute.quoted(
          s"k${spec.groupExprs.indexWhere(_.semanticEquals(g))}")
      case other => other.mapChildren(subst)
    }
    val cols = spec.resultExprs.map { ne =>
      val core = ne match { case Alias(c, _) => c; case e => e }
      Bridge.column(subst(core)).as(ne.name)
    }
    state.select(cols: _*)
  }

  // ------------------------------------------------ sidecar storage ----

  private def mvstateDir(mvDir: Path): Path = mvDir.resolve("mvstate")
  private def stateDir(mvDir: Path, v: Int): Path =
    mvstateDir(mvDir).resolve(s"v$v")

  private case class Marker(base: String, watermark: Long,
      mvSnapshot: Long, stateVersion: Int)

  private def markerPath(mvDir: Path): Path =
    mvstateDir(mvDir).resolve("refresh.json")

  private def loadMarker(mvDir: Path): Option[Marker] = {
    val p = markerPath(mvDir)
    if (!Files.isRegularFile(p)) return None
    scala.util.Try {
      val o = graft.model.Json.parse(Files.readString(p))
      Marker(o.path("base").asText(), o.path("watermark").asLong(),
        o.path("mv-snapshot").asLong(), o.path("state-version").asInt())
    }.toOption
  }

  /** Written LAST, atomically — the refresh's commit point for the
    * incremental bookkeeping (the MV table itself already committed).
    */
  private def writeMarker(mvDir: Path, m: Marker): Unit = {
    val dir = mvstateDir(mvDir)
    Files.createDirectories(dir)
    val o = graft.model.Json.obj
    o.put("base", m.base)
    o.put("watermark", m.watermark)
    o.put("mv-snapshot", m.mvSnapshot)
    o.put("state-version", m.stateVersion)
    val tmp = dir.resolve(s".refresh.json.tmp-${
      java.util.UUID.randomUUID.toString.take(8)}")
    Files.writeString(tmp, graft.model.Json.write(o),
      StandardOpenOption.CREATE_NEW)
    Files.move(tmp, markerPath(mvDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def nextStateVersion(mvDir: Path): Int = {
    val dir = mvstateDir(mvDir)
    if (!Files.isDirectory(dir)) return 1
    val ls = Files.list(dir)
    try ls.iterator.asScala.flatMap(p =>
      p.getFileName.toString.stripPrefix("v").toIntOption)
      .foldLeft(0)(math.max) + 1
    finally ls.close()
  }

  private def dropStateVersionsBelow(mvDir: Path, keep: Int): Unit = {
    val dir = mvstateDir(mvDir)
    if (!Files.isDirectory(dir)) return
    val ls = Files.list(dir)
    val old =
      try ls.iterator.asScala.filter(p =>
        p.getFileName.toString.stripPrefix("v").toIntOption
          .exists(_ < keep)).toList
      finally ls.close()
    old.foreach { d =>
      val w = Files.walk(d)
      try w.sorted(java.util.Comparator.reverseOrder())
        .iterator.asScala.foreach(Files.deleteIfExists(_))
      finally w.close()
    }
  }

  // ------------------------------------------------------- refresh ----

  /** Refresh the materialized view backing `t` from its analyzed stored
    * query: incremental when the definition, the recorded watermark, and
    * the base's changelog all allow it; full recompute otherwise. Also
    * the CREATE-time initial population (empty MV table, no marker —
    * lands on the bootstrap path and seeds the state in the same base
    * scan).
    */
  def refresh(spark: SparkSession, t: GraftTable, analyzedDf: DataFrame)
      : RefreshResult = {
    val mvDir = java.nio.file.Paths.get(t.location)
    val wantFull = GraftViews.load(mvDir)
      .exists(_.current.properties.get(RefreshModeProp).contains("full"))
    val spec =
      if (wantFull) None
      else extract(analyzedDf.queryExecution.analyzed)

    spec match {
      case None =>
        // non-incrementable: recompute, and drop any stale sidecar so a
        // later definition change back to incrementable re-bootstraps
        // engine-level overwrite THROUGH the handle's commit io (the
        // same one-commit shape the DSv2 overwrite sink produces) — in
        // REST mode the refresh commits stay behind the protocol
        t.overwriteWhere(lit(true), analyzedDf)
        val w = mvstateDir(mvDir)
        if (Files.isDirectory(w)) {
          val walk = Files.walk(w)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .iterator.asScala.foreach(Files.deleteIfExists(_))
          finally walk.close()
        }
        RefreshResult(t.metadata.currentSnapshotId.getOrElse(-1L),
          t.countRows(), "full", -1L)

      case Some(sp) =>
        val baseT = GraftTable.load(spark, sp.baseLocation)
        val toSnap = baseT.metadata.currentSnapshotId
        val toSeq = toSnap.flatMap(id =>
          baseT.metadata.snapshotById(id).map(_.sequenceNumber))
          .getOrElse(0L)

        def full(): RefreshResult = {
          val pinned = baseT.scan(asOf = toSnap)
            .withColumn("_change_type", lit("insert"))
          commitFromStates(spark, t, mvDir, sp, states(pinned, sp),
            toSeq, mode = "full", deltaRows = -1L)
        }

        loadMarker(mvDir) match {
          case Some(m) if m.base == sp.baseLocation &&
              t.metadata.currentSnapshotId.contains(m.mvSnapshot) &&
              Files.isDirectory(stateDir(mvDir, m.stateVersion)) =>
            if (m.watermark == toSeq)
              RefreshResult(m.mvSnapshot, t.countRows(), "noop", 0L)
            else scala.util.Try(
                baseT.changesBySeq(m.watermark, toSnap.get)) match {
              case scala.util.Success(delta) =>
                val d = delta.persist()
                try {
                  // MIN/MAX cannot be maintained under deletes: a delta
                  // carrying delete rows (MoR deletes, row-delta
                  // updates) forces the full path for such definitions
                  if (sp.hasMinMax && !d.filter(
                      col("_change_type") === "delete").isEmpty)
                    return full()
                  val n = d.count()
                  val merged = merge(
                    spark.read.parquet(
                      stateDir(mvDir, m.stateVersion).toString),
                    states(d, sp), sp)
                  commitFromStates(spark, t, mvDir, sp, merged, toSeq,
                    mode = "incremental", deltaRows = n)
                } finally d.unpersist()
              // the changelog refuses the range — expired base
              // snapshots inside (watermark, toSeq] make the delta
              // unrecoverable (changesBySeq walks the ancestry and
              // throws on a gap; a CoW commit additionally needs its
              // parent retained) — the only safe answer is a full
              // recompute
              case scala.util.Failure(_) => full()
            }
          case _ => full()
        }
    }
  }

  /** Persist the new state version, rebuild the MV rows FROM the
    * persisted state (so table and sidecar can never disagree), commit
    * the table, then the marker (the bookkeeping commit point).
    */
  private def commitFromStates(spark: SparkSession, t: GraftTable,
      mvDir: Path, sp: IncrementalSpec, newStates: DataFrame,
      toSeq: Long, mode: String, deltaRows: Long): RefreshResult = {
    val v = nextStateVersion(mvDir)
    newStates.write.parquet(stateDir(mvDir, v).toString)
    val persisted = spark.read.parquet(stateDir(mvDir, v).toString)
    t.overwriteWhere(lit(true), finals(persisted, sp))
    val snap = t.metadata.currentSnapshotId.getOrElse(-1L)
    writeMarker(mvDir, Marker(sp.baseLocation, toSeq, snap, v))
    dropStateVersionsBelow(mvDir, v)
    RefreshResult(snap, t.countRows(), mode, deltaRows)
  }
}
