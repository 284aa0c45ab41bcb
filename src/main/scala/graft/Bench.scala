package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Failures are recorded per-query (`ok` flags) so a
  * broken query can never masquerade as a fast one (round-1 advice).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions",
        "graft.connector.GraftSparkSessionExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one UNTIMED warmup pass: JVM/codegen/parquet-footer warmup used to
    // land on whichever query sorted first alphabetically (~6.5s of the
    // first entry's reported time was startup, not the query)
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup FAILED: ${e.getMessage}") }
    // ... and one UNTIMED micro-batch: the streaming machinery (state
    // store providers, streaming codegen, checkpoint IO) otherwise cold-
    // starts inside whichever s_* key runs first (~8s of its first pass
    // was engine warmup, not the pipeline)
    try {
      import org.apache.spark.sql.functions.{col, count, lit, window}
      val tmp = java.nio.file.Files.createTempDirectory("bench-warm")
      spark.range(8).selectExpr("timestamp_micros(id * 1000000) as ts")
        .coalesce(1).write.parquet(s"$tmp/in")
      val q = spark.readStream
        .schema("ts timestamp").parquet(s"$tmp/in")
        .withWatermark("ts", "1 second")
        .groupBy(window(col("ts"), "1 second")).agg(count(lit(1)))
        .writeStream.format("noop")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] stream warmup FAILED: ${e.getMessage}") }
    // ... and first-touch EVERY base table (bytes through the OS page
    // cache): the r15 driver run flagged q03/q04/q05 — the first keys to
    // lean on customer/orders/part — while q01's warmup touches only
    // lineitem. A cold first read of the other tables must land in the
    // warmup, not inside whichever key reads them first.
    try {
      val dir = new java.io.File(sfDir)
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        // a table may be a single FILE or a DIRECTORY of part files
        // (Staging.parquetLeaves handles both — GenScale output is
        // directory-shaped)
        .flatMap(f => Staging.parquetLeaves(f.getPath))
        .foreach { p =>
          val in = java.nio.file.Files.newInputStream(p)
          val buf = new Array[Byte](1 << 20)
          try { while (in.read(buf) >= 0) () } finally in.close()
        }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] table warmup FAILED: ${e.getMessage}") }
    // ... and one UNTIMED broadcast-join pass: q01 exercises scan+agg
    // codegen but not BroadcastExchange (thread pool, relation build) —
    // q05 touches that machinery plus four base tables.
    try SparkEntry.queries("q05_multi_join")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable =>
      System.err.println(s"[bench] join warmup FAILED: ${e.getMessage}") }

    // optional subset run (comma-separated keys or key prefixes via
    // SPARK_GRAFT_BENCH_KEYS, e.g. "q,d_dedup") — used for cross-scale
    // headline comparisons where the full write/read integration demos
    // would only measure table construction
    val keyFilter: Option[Seq[String]] = sys.env.get("SPARK_GRAFT_BENCH_KEYS")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    def selected(name: String): Boolean =
      keyFilter.forall(_.exists(k => name == k || name.startsWith(k)))
    // a run at a non-default core count measures SCALING; it must not
    // fold into the 32c floors or displace the committed detail baseline
    val ratchetRun = BenchGate.isRatchetRun(keyFilter.nonEmpty, cpus)

    // STAGED PREPASS (r20 verdict #3): every cross-process demo artifact
    // (Staging.cachedBuild) is FORCE-REBUILT here, outside the timed
    // region, so (a) each bench invocation computes every artifact from
    // the parquet inputs — no cross-run reuse affects any number this
    // run prints — and (b) the per-artifact build seconds go out in
    // `staged_build`. One key per artifact triggers the build; keys
    // sharing an artifact (the SQL-DML base) are covered by the trigger
    // key. Any cachedBuild miss DURING the timed loop still lands in
    // `cold_cache` — a non-empty map means this list is incomplete.
    val stagedTriggers = Seq(
      "ice_import_external", "ice_merge_mor", "ice_partitions_meta",
      "ice_rest_catalog", "ice_row_lineage", "ice_sql_delete",
      "ice_sql_merge", "s_dedup_minhash_stream", "s_stream_join",
      "s_stream_outer_join")
    Staging.forceRebuild = true
    try stagedTriggers.filter(k => selected(k) &&
        SparkEntry.queries.contains(k)).foreach { k =>
      try SparkEntry.queries(k)(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] staged prepass $k FAILED: " +
          e.getMessage) }
    } finally Staging.forceRebuild = false
    val stagedBuild = Staging.drainBuildSeconds()
    spark.catalog.clearCache()
    // setup-vs-read split (round-14 verdict #3): calling fn() eagerly
    // runs any table CONSTRUCTION a demo key does (appends, merges,
    // stream drains); executing the returned lazy plan is the READ the
    // key actually claims to measure. Both go out: `queries` carries the
    // total (comparable to every prior committed run), `setup` the
    // construction share for keys where it is material.
    // ---- baselines load EARLY: the deferred-flag audit below needs
    // them before the main loop runs ----
    def loadTimes(path: String, field: String): Map[String, Double] =
      try {
        val n = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(java.nio.file.Files.readString(
            java.nio.file.Paths.get(path)))
        // only a same-scale-factor run is a baseline -- a cross-sf
        // comparison would flag every fixed-overhead query
        if (Option(n.get("sf")).map(_.asText()).contains(sfDir)) {
          val out = scala.collection.mutable.Map.empty[String, Double]
          Option(n.get(field)).foreach(_.fields().forEachRemaining(e =>
            out += e.getKey -> e.getValue.asDouble()))
          out.toMap
        } else Map.empty
      } catch { case _: Exception => Map.empty }
    val prev =
      if (ratchetRun) loadTimes("/root/repo/bench_detail.json", "queries")
      else Map.empty[String, Double]
    // best-ever floors are kept PER scale factor under "bySf" -- a full
    // run at another sf must not clobber this sf's floors (that would
    // silently reopen the ratchet blindspot for the next run here).
    // Legacy single-sf files still load.
    def loadBest(): (Map[String, Double], Map[String, String]) =
      try {
        val n = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(java.nio.file.Files.readString(
            java.nio.file.Paths.get("/root/repo/bench_best.json")))
        val others = scala.collection.mutable.Map.empty[String, String]
        var mine = Map.empty[String, Double]
        Option(n.get("bySf")) match {
          case Some(by) =>
            by.fields().forEachRemaining { e =>
              if (e.getKey == sfDir) {
                val out = scala.collection.mutable.Map.empty[String, Double]
                e.getValue.fields().forEachRemaining(q =>
                  out += q.getKey -> q.getValue.asDouble())
                mine = out.toMap
              } else others += e.getKey -> e.getValue.toString
            }
          case None => // legacy shape
            if (Option(n.get("sf")).map(_.asText()).contains(sfDir))
              mine = loadTimes("/root/repo/bench_best.json", "queries")
            else Option(n.get("sf")).map(_.asText()).foreach { s =>
              Option(n.get("queries")).foreach(q => others += s -> q.toString)
            }
        }
        (mine, others.toMap)
      } catch { case _: Exception => (Map.empty, Map.empty) }
    val (bestEver, otherSfBest) =
      if (ratchetRun) loadBest()
      else (Map.empty[String, Double], Map.empty[String, String])
    val base = BenchGate.baseline(prev, bestEver)
    // keys whose flag LAST run was excused by panel drift -- persisted in
    // bench_detail.json as "deferred" for exactly this audit
    val prevDeferred: Seq[String] =
      try {
        val n = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(java.nio.file.Files.readString(
            java.nio.file.Paths.get("/root/repo/bench_detail.json")))
        if (Option(n.get("sf")).map(_.asText()).contains(sfDir))
          Option(n.get("deferred")).map { arr =>
            val b = Seq.newBuilder[String]
            arr.elements().forEachRemaining(e => b += e.asText())
            b.result()
          }.getOrElse(Seq.empty)
        else Seq.empty
      } catch { case _: Exception => Seq.empty }

    def timeKeyOnce(k: String): Option[Double] = {
      val t0 = System.nanoTime()
      // a FAILED attempt must not count: its fast-error elapsed time
      // would masquerade as a healthy re-run and dismiss the flag
      val r =
        try { SparkEntry.queries(k)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      spark.catalog.clearCache()
      r
    }

    // DEFERRED-FLAG AUDIT (the panel can only excuse; this keeps the
    // excuse honest): re-confirm last run's panel-excused flags FIRST,
    // at this run's quietest moment -- right after warmup, before ~60
    // heavyweight demo keys load the box. A small panel re-times
    // alongside so external load at this moment still excuses; on a
    // genuinely quiet run a regression that hid in last run's noisy
    // window is caught here.
    val deferredConfirmed = scala.collection.mutable.Map.empty[String, Double]
    if (ratchetRun) {
      val audit = prevDeferred.filter(k =>
        SparkEntry.queries.contains(k) && base.get(k).exists(_ > 0.05))
      if (audit.nonEmpty) {
        val panelPool = base.toSeq
          .filter { case (k, v) => v >= 0.5 && !audit.contains(k) &&
            SparkEntry.queries.contains(k) }
          .sortBy(-_._2).take(3).map(_._1)
        audit.foreach { k =>
          val pr = panelPool.flatMap(p => timeKeyOnce(p).map(_ / base(p)))
          val pd = BenchGate.drift(pr)
          timeKeyOnce(k).foreach { t =>
            if (BenchGate.confirmed(t, base(k), pd))
              deferredConfirmed(k) = t / base(k)
          }
        }
      }
    }

    val setupSec = scala.collection.mutable.Map.empty[String, Double]
    // per-key cold-cache marker (r19 verdict #7): which Staging
    // artifacts were REBUILT during this key's run — a cold rebuild can
    // dominate a demo key's setup (~100 s across the r19 driver pass)
    // and without the marker reads as code-slow
    val coldCache = scala.collection.mutable.Map.empty[String, Seq[String]]
    Staging.drainColdBuilds() // scope to the main loop (warmup misses)
    val results = SparkEntry.queries.toSeq.filter(q => selected(q._1))
      .sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        // noop sink executes the FULL plan (count() would let Catalyst
        // prune projections/sorts and understate map-heavy queries)
        try {
          val df = fn(spark, sfDir)
          setupSec(name) = (System.nanoTime() - t0) / 1e9
          df.write.format("noop").mode("overwrite").save(); true
        }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      val cold = Staging.drainColdBuilds()
      if (cold.nonEmpty) coldCache(name) = cold
      spark.catalog.clearCache() // release per-query persisted subtrees
      (name, dt, ok)
    }
    // per-query regression gate (logic in BenchGate, spec-tested with a
    // planted slowdown): baseline per key = min(last committed run,
    // best-ever across runs) at the same scale factor — comparing only
    // against the last committed run let an intra-round slowdown become
    // the next round's baseline (round-14 verdict #1).

    val (drift, candidates) = BenchGate.candidates(results, base)
    // a first-pass flag on a shared machine is usually scheduler /
    // trigger jitter or concurrent load (the driver's post-close bench
    // shares the box with oracle/judge processes), not a plan change:
    // re-time each candidate up to twice more and keep the BEST run,
    // and re-time a small PANEL of stable keys at the same moment — if
    // the panel is slow too, the environment is loaded right now and
    // the flag is excused (BenchGate.confirmed). Raw first-pass times
    // still go out in `queries` (so committed baselines stay
    // comparable); re-timed values go out in `robust`, the panel's
    // measured drift in `panel_drift`.
    val panelKeys = BenchGate.panel(results, base, candidates.map(_._1).toSet)
    def timeKey(k: String): Option[Double] = timeKeyOnce(k)
    // settle before confirming: ~60 table-mutation keys ran before the
    // q* family — let accumulated garbage collect OUTSIDE the re-times
    if (candidates.nonEmpty) System.gc()
    val robust = scala.collection.mutable.Map.empty[String, Double]
    val panelNow = scala.collection.mutable.Map.empty[String, Double]
    candidates.foreach { case (k, _) =>
      var best = results.find(_._1 == k).get._2
      var pd = drift // until the panel is measured alongside a re-time
      var attempts = 0
      while (attempts < 2 && BenchGate.confirmed(best, base(k), pd)) {
        val pr = panelKeys.flatMap(p => timeKey(p).map(_ / base(p)))
        if (pr.nonEmpty) pd = BenchGate.drift(pr)
        timeKey(k).foreach(t => best = math.min(best, t))
        attempts += 1
      }
      robust(k) = best
      panelNow(k) = pd
    }
    val gateRegressions = candidates
      .map { case (k, _) => k -> robust(k) / base(k) }
      .filter { case (k, _) =>
        BenchGate.confirmed(robust(k), base(k), panelNow(k)) }
    // a deferred key caught by the quiet-moment audit counts as a
    // regression even if THIS run's in-flow gate excused it again
    val regressions = (gateRegressions.toMap ++ deferredConfirmed.toMap
      .map { case (k, r) =>
        k -> math.max(r, gateRegressions.toMap.getOrElse(k, 0.0)) })
      .toSeq.sortBy(-_._2)
    // next run's audit list: flags excused ONLY by panel drift this run
    val nextDeferred = BenchGate.deferredFlags(candidates.map(_._1),
      robust.toMap, base, panelNow.toMap)
      .filterNot(regressions.map(_._1).toSet)

    // 3-decimal timings keep the line compact (the driver records a
    // bounded tail of stdout; a shorter line survives it intact)
    val qs = results.map { case (k, v, _) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val oks = results.map { case (k, _, ok) => s""""$k":$ok""" }
      .mkString("{", ",", "}")
    val regs = regressions.map { case (k, r) => f""""$k":$r%.2f""" }
      .mkString("{", ",", "}")
    val rob = robust.toSeq.sortBy(_._1)
      .map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val pnl = panelNow.toSeq.sortBy(_._1)
      .map { case (k, v) => f""""$k":$v%.2f""" }
      .mkString("{", ",", "}")
    // construction share, only where material (≥0.1 s) to keep the one
    // JSON line inside the driver's recorded stdout tail
    val setup = setupSec.toSeq.filter(_._2 >= 0.1).sortBy(_._1)
      .map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val nFailed = results.count(!_._3)
    val defs = nextDeferred.map(k => "\"" + k + "\"")
      .mkString("[", ",", "]")
    val colds = coldCache.toSeq.sortBy(_._1)
      .map { case (k, names) =>
        s""""$k":${names.map("\"" + _ + "\"").mkString("[", ",", "]")}""" }
      .mkString("{", ",", "}")
    val builds = stagedBuild.toSeq.sortBy(_._1)
      .map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"ok":$oks,"failed":$nFailed,"drift":$drift%.3f,"regressions":$regs,"robust":$rob,"panel_drift":$pnl,"deferred":$defs,"setup":$setup,"cold_cache":$colds,"staged_build":$builds,"cpus":$cpus,"sf":"$sfDir"}"""
    println(line)
    // the full line also lands in the repo, so per-query timings survive
    // any stdout-tail truncation and stay diffable across rounds. Subset
    // runs and non-default-core runs default to separate files so they
    // never displace the driver's full-run regression baseline.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      BenchGate.defaultOutPath(keyFilter.nonEmpty, cpus))
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), line + "\n")
    catch { case _: Exception => () }
    // maintain the best-ever floor the regression gate ratchets against
    // (full runs only — a subset run's drift profile would skew it).
    // RAW times fold in (damped by MaxRatchetPerRun): the old
    // drift-normalized fold-in divided by a median that is itself
    // measured against ratcheted floors and therefore systematically
    // >1, so ~half the keys landed "below floor" every normal run and
    // ground the floors 15%/run toward unachievable times — the damping
    // alone is the outlier defense.
    if (ratchetRun) {
      val nb = BenchGate.nextBest(bestEver,
        results,
        robust.toMap)
      val bq = nb.toSeq.sortBy(_._1)
        .map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
      // re-emit other scale factors' floors untouched
      val all = (otherSfBest + (sfDir -> bq)).toSeq.sortBy(_._1)
        .map { case (s, q) => s""""$s":$q""" }.mkString("{", ",", "}")
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/root/repo/bench_best.json"),
        s"""{"bySf":$all}""" + "\n")
      catch { case _: Exception => () }
    }
    // COMPACT summary as the LAST stdout line (r20 verdict #1): the
    // driver records a bounded (~2000-char) stdout tail and parses JSON
    // from it — the full 125-key line above is ~8 KB and its start never
    // survived, so PERF ran blind for 20 rounds. The per-key maps cannot
    // fit (key names alone exceed the tail), so they live in the detail
    // file; this line carries the totals and always parses.
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","failed":$nFailed,"drift":$drift%.3f,"n_queries":${results.size},"cpus":$cpus,"detail":"$outPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
