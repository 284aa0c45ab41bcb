package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One engine capability: a Spark query plus (when SQL-expressible) an
  * equivalent DuckDB oracle over the same parquet tables.
  *
  * Conventions that keep the driver's hash-compare stable:
  *   - every computed column aliased identically on both sides;
  *   - double aggregates computed exactly (decimal sum) then cast to
  *     double and round(x, 4) on both sides;
  *   - results totally ordered by explicit keys on both sides.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[GraftQuery] =
    operators.Relational.queries ++
      functions.TransformQueries.queries ++
      table.IcebergQueries.queries ++
      connector.ConnectorQueries.queries ++
      operators.TextOps.queries ++
      operators.Dedup.queries ++
      operators.Curation.queries ++
      operators.Retrieval.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      operators.Video.queries ++
      streaming.StreamingQueries.queries

  lazy val byName: Map[String, GraftQuery] = {
    val qs = all
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs.map(q => q.name -> q).toMap
  }
}

/** Shared helpers for reading driver-generated test tables. */
object Tables {
  /** Inferred schema per source path, memoized with the files'
    * fingerprint: parquet schema inference launches a one-task Spark
    * job per read, and every registry key re-infers the same immutable
    * testdata schemas — ~150 jobs per bench run whose answer never
    * changes. The fingerprint (path|size|mtime per leaf) invalidates on
    * any regeneration; only the SCHEMA is memoized, never data.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, (String, org.apache.spark.sql.types.StructType)]()

  private def readCached(spark: SparkSession, path: String): DataFrame = {
    // keyed by PATH with the fingerprint in the VALUE: a regeneration
    // replaces the entry instead of accumulating stale (path, oldFp)
    // keys, and a fingerprint failure bypasses the cache entirely (the
    // old fallback inserted a fresh UUID-keyed entry per call — an
    // unbounded, never-evicted map)
    val fpOpt =
      try Some(Staging.fingerprint(Staging.parquetLeaves(path)))
      catch { case _: Exception => None }
    fpOpt match {
      case None => spark.read.parquet(path)
      case Some(fp) =>
        val hit = schemaCache.get(path)
        val schema =
          if (hit != null && hit._1 == fp) hit._2
          else {
            val s = spark.read.parquet(path).schema
            schemaCache.put(path, (fp, s))
            s
          }
        spark.read.schema(schema).parquet(path)
    }
  }

  def tbl(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") normalizeTs(rawEvents(spark, s"$dir/$name.parquet"))
    else readCached(spark, s"$dir/$name.parquet")
  }

  /** Read an events file whatever its physical ts encoding. nanosAsLong
    * only affects TIMESTAMP(NANOS) columns (which Spark otherwise refuses
    * to read at all), so setting it unconditionally is safe — a
    * micros-typed file is untouched and still loads as a timestamp.
    */
  def rawEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    readCached(spark, path)
  }

  /** Normalize a `ts` column to session-tz TimestampType whatever
    * physical encoding the data generator chose — the encoding has
    * changed across testdata generations, so NOTHING may assume one:
    *   - int64 nanos-as-long (legacy TIMESTAMP(NANOS) via nanosAsLong):
    *     integer div to micros — ns-epoch values overflow double;
    *   - timestamp[us] without tz (loads as TIMESTAMP_NTZ): cast — the
    *     session tz is pinned UTC everywhere, so the wall clock is
    *     preserved exactly as the DuckDB oracle reads it;
    *   - an already-tz'd timestamp: pass through.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
}

/** Root for transient artifacts that query code builds at run time
  * (staged stream feeds, demo warehouses, demo tables). Derived from the
  * JVM temp dir — query code must carry no checkout-absolute paths, so
  * the library behaves the same from any deployment. Overridable via
  * GRAFT_STAGING_DIR / -Dgraft.staging.dir for harnesses that want the
  * artifacts somewhere inspectable.
  */
object Staging {
  lazy val root: java.nio.file.Path = {
    val base = sys.env.get("GRAFT_STAGING_DIR")
      .orElse(sys.props.get("graft.staging.dir"))
      .getOrElse(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    // scoped per (user, working dir): freshDir reclaims prior runs' dirs
    // by name prefix, so an UNscoped shared /tmp root would let one
    // checkout's run delete another's live tables (and a second user
    // couldn't create the dir at all)
    val scope = s"${sys.props.getOrElse("user.name", "u")}-" +
      Integer.toHexString(sys.props.getOrElse("user.dir", "/").hashCode)
    val p = java.nio.file.Paths.get(base, s"graft-staging-$scope")
    java.nio.file.Files.createDirectories(p)
    p
  }

  /** Identity of a set of source files: path|size|mtime per leaf (mtime
    * at full resolution — a same-size regeneration within the same
    * millisecond tick must still invalidate). Shared by the staged-feed
    * cache and [[cachedBuild]].
    */
  def fingerprint(leaves: Seq[java.nio.file.Path]): String = {
    import java.nio.file.Files
    leaves.map { p =>
      val t = Files.getLastModifiedTime(p).toInstant
      s"$p|${Files.size(p)}|${t.getEpochSecond}.${t.getNano}"
    }.mkString("\n")
  }

  /** Parquet leaf files of a testdata table path (a single
    * `name.parquet` FILE, or a directory of part files), sorted — the
    * fingerprint domain for caches keyed on that table.
    */
  def parquetLeaves(path: String): Seq[java.nio.file.Path] = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val p = Paths.get(path)
    if (Files.isDirectory(p)) {
      val ls = Files.list(p)
      try ls.iterator.asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .toList.sortBy(_.getFileName.toString)
      finally ls.close()
    } else Seq(p)
  }

  private[graft] def wipe(dir: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    if (Files.isDirectory(dir)) {
      val w = Files.walk(dir)
      try w.sorted(java.util.Comparator.reverseOrder())
        .iterator.asScala.foreach(Files.deleteIfExists(_))
      finally w.close()
    }
  }

  /** A demo artifact built from source files, cached ACROSS processes:
    * reused while `recipe` (a version tag for the build code) and the
    * sources' [[fingerprint]] both match, wiped and rebuilt otherwise —
    * the staged-feed pattern generalized to whole demo tables whose
    * CONSTRUCTION dominated their bench keys. The `_BUILD` marker is
    * written LAST, so a crash mid-build leaves no marker and the next
    * call rebuilds; the construction machinery itself stays covered by
    * the keys that build fresh every run (partitioned writes, MoR/eq
    * deletes, compaction).
    */
  /** Per-name in-process mutex: JDK file locks are held per-JVM, so two
    * THREADS of one JVM reaching for the same artifact would get
    * OverlappingFileLockException from the OS lock instead of waiting —
    * they serialize here first.
    */
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** cachedBuild MISSES since the last drain. The bench stamps these
    * per key as `cold_cache` in bench_detail.json so a reader can
    * separate cache-cold setup (first run on a machine, or a recipe
    * bump) from code-slow without a repro run — the driver's r19 pass
    * spent ~100 s rebuilding staged caches cold and the signal was
    * only recoverable by re-running.
    */
  private val missedBuilds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Names whose artifact was REBUILT since the last drain (cold), in
    * sorted order; clears the record.
    */
  private[graft] def drainColdBuilds(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val out = missedBuilds.asScala.toSeq.sorted
    out.foreach(missedBuilds.remove)
    out
  }

  /** When set, [[cachedBuild]] ignores a matching marker and rebuilds.
    * The bench prepass flips this on while it force-rebuilds every
    * staged demo artifact OUTSIDE the timed region (r20 verdict #3: a
    * cross-process cache hit inside a timed key hides construction
    * cost) — so every bench invocation computes every artifact from
    * the parquet inputs, with the build seconds reported per name.
    */
  @volatile private[graft] var forceRebuild = false

  /** Names already force-rebuilt in this process: several keys share
    * one artifact (e.g. the SQL-DML base table), and the prepass must
    * rebuild each NAME once, not once per sharing key.
    */
  private val forced =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Build seconds per artifact name since the last drain (misses
    * only); cleared by [[drainBuildSeconds]].
    */
  private val buildSecs =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  private[graft] def drainBuildSeconds(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    val out = buildSecs.asScala.toMap
    out.keys.foreach(buildSecs.remove)
    out
  }

  def cachedBuild(name: String, recipe: String,
      sources: Seq[java.nio.file.Path])(
      build: java.nio.file.Path => Unit): java.nio.file.Path =
    buildLocks.computeIfAbsent(name, _ => new Object).synchronized {
      import java.nio.file.Files
      val dir = root.resolve("demo-cache").resolve(name)
      val marker = dir.resolve("_BUILD")
      val want = recipe + "\n" + fingerprint(sources)
      // cross-process exclusion: even the CHECK takes the OS file lock
      // (sibling of the cache dir, so wipe never deletes it) — a
      // marker-matched fast path outside the lock could hand back a
      // directory another process is concurrently wiping for a
      // different fingerprint. The loser re-checks under the lock and
      // reuses the winner's build.
      Files.createDirectories(dir.getParent)
      val lockPath = dir.getParent.resolve(s".$name.lock")
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try {
          val markerOk = Files.isRegularFile(marker) && scala.util.Try(
            Files.readString(marker)).toOption.contains(want)
          val mustForce = forceRebuild && forced.add(name)
          if (markerOk && !mustForce) return dir
          missedBuilds.add(name)
          forced.add(name) // a cold rebuild satisfies a later force pass
          wipe(dir)
          Files.createDirectories(dir)
          val t0 = System.nanoTime()
          build(dir)
          buildSecs.merge(name, (System.nanoTime() - t0) / 1e9,
            (a, b) => a + b)
          Files.writeString(marker, want)
          dir
        } finally lock.release()
      } finally ch.close()
    }

  /** A fresh unique directory under `root/group`, reclaiming any prior
    * runs' directories for the same (group, name) first — bench/verify
    * reruns must not accumulate dead table trees.
    */
  def freshDir(group: String, name: String): String = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    val g = root.resolve(group)
    if (Files.isDirectory(g)) {
      val ls = Files.list(g)
      val dirs =
        try ls.iterator.asScala
          .filter(_.getFileName.toString.startsWith(s"$name-")).toSeq
        finally ls.close()
      dirs.foreach { d =>
        val w = Files.walk(d)
        try w.sorted(java.util.Comparator.reverseOrder())
          .iterator.asScala.foreach(Files.deleteIfExists(_))
        finally w.close()
      }
    }
    Files.createDirectories(g)
    g.resolve(
      s"$name-${java.util.UUID.randomUUID.toString.take(8)}").toString
  }
}

/** Oracle-stability helpers (see GraftQuery conventions). */
object Help {
  /** Exact decimal type used on BOTH sides before summing doubles, so the
    * aggregate is order-independent (FP addition is not associative; a
    * shuffle-order change must not flip the last rounded digit).
    */
  val Dec: DecimalType = DecimalType(28, 8)

  /** Order-independent sum of a double expression, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Canonical 4-decimal rounding applied to every derived double. */
  def r4(c: Column): Column = round(c, 4)

  /** DuckDB-side equivalent of r4(dsum(expr)). */
  def sqlDsum(expr: String): String =
    s"round(CAST(SUM(CAST(($expr) AS DECIMAL(28,8))) AS DOUBLE), 4)"

  /** DuckDB-side exact average: exact sum / count, then round. */
  def sqlDavg(expr: String): String =
    s"round(CAST(SUM(CAST(($expr) AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*), 4)"

  /** GATE-ONLY total order: the driver's hash-compare needs deterministic
    * row order, so score-emitting operators sort their full output here.
    * A production caller DROPS this sort — the operator's real output is
    * unordered (map-only), and a full-corpus global sort would be the
    * only shuffle in the plan at 100 TB.
    */
  def sortForGate(df: org.apache.spark.sql.DataFrame,
      cols: Column*): org.apache.spark.sql.DataFrame = df.orderBy(cols: _*)
}
