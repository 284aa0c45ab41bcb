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

    // optional subset run (comma-separated keys or key prefixes via
    // SPARK_GRAFT_BENCH_KEYS, e.g. "q,d_dedup") — used for cross-scale
    // headline comparisons where the full write/read integration demos
    // would only measure table construction
    val keyFilter: Option[Seq[String]] = sys.env.get("SPARK_GRAFT_BENCH_KEYS")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    def selected(name: String): Boolean =
      keyFilter.forall(_.exists(k => name == k || name.startsWith(k)))
    // setup-vs-read split (round-14 verdict #3): calling fn() eagerly
    // runs any table CONSTRUCTION a demo key does (appends, merges,
    // stream drains); executing the returned lazy plan is the READ the
    // key actually claims to measure. Both go out: `queries` carries the
    // total (comparable to every prior committed run), `setup` the
    // construction share for keys where it is material.
    val setupSec = scala.collection.mutable.Map.empty[String, Double]
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
      spark.catalog.clearCache() // release per-query persisted subtrees
      (name, dt, ok)
    }
    // per-query regression gate (logic in BenchGate, spec-tested with a
    // planted slowdown): baseline per key = min(last committed run,
    // best-ever across runs) at the same scale factor — comparing only
    // against the last committed run let an intra-round slowdown become
    // the next round's baseline (round-14 verdict #1).
    def loadTimes(path: String, field: String): Map[String, Double] =
      try {
        val n = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(java.nio.file.Files.readString(
            java.nio.file.Paths.get(path)))
        // only a same-scale-factor run is a baseline — a cross-sf
        // comparison would flag every fixed-overhead query
        if (Option(n.get("sf")).map(_.asText()).contains(sfDir)) {
          val out = scala.collection.mutable.Map.empty[String, Double]
          Option(n.get(field)).foreach(_.fields().forEachRemaining(e =>
            out += e.getKey -> e.getValue.asDouble()))
          out.toMap
        } else Map.empty
      } catch { case _: Exception => Map.empty }
    val prev = loadTimes("/root/repo/bench_detail.json", "queries")
    // best-ever floors are kept PER scale factor under "bySf" — a full
    // run at another sf must not clobber this sf's floors (that would
    // silently reopen the ratchet blindspot for the next run here).
    // Legacy single-sf files ({"queries":…,"sf":…}) still load.
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
    val (bestEver, otherSfBest) = loadBest()
    val base = BenchGate.baseline(prev, bestEver)
    val (drift, candidates) = BenchGate.candidates(results, base)
    // a first-pass flag on a shared machine is usually scheduler /
    // trigger jitter (sub-3s queries especially), not a plan change:
    // re-time each candidate up to twice more and keep the BEST run —
    // only a query slow in EVERY attempt is a real regression. Raw
    // first-pass times still go out in `queries` (so committed
    // baselines stay comparable); the re-timed values go out in
    // `robust` so both are visible.
    val robust = scala.collection.mutable.Map.empty[String, Double]
    candidates.foreach { case (k, _) =>
      var best = results.find(_._1 == k).get._2
      var attempts = 0
      while (attempts < 2 && best / (base(k) * drift) > 1.5) {
        val t0 = System.nanoTime()
        // a FAILED attempt must not count: its fast-error elapsed time
        // would masquerade as a healthy re-run and dismiss the flag
        val ok =
          try { SparkEntry.queries(k)(spark, sfDir)
            .write.format("noop").mode("overwrite").save(); true }
          catch { case _: Throwable => false }
        if (ok) best = math.min(best, (System.nanoTime() - t0) / 1e9)
        spark.catalog.clearCache()
        attempts += 1
      }
      robust(k) = best
    }
    val regressions = candidates
      .map { case (k, _) => k -> robust(k) / base(k) }
      .filter { case (_, r) => r / drift > 1.5 }
      .sortBy(-_._2)

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
    // construction share, only where material (≥0.1 s) to keep the one
    // JSON line inside the driver's recorded stdout tail
    val setup = setupSec.toSeq.filter(_._2 >= 0.1).sortBy(_._1)
      .map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val nFailed = results.count(!_._3)
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"ok":$oks,"failed":$nFailed,"drift":$drift%.3f,"regressions":$regs,"robust":$rob,"setup":$setup,"sf":"$sfDir"}"""
    println(line)
    // the full line also lands in the repo, so per-query timings survive
    // any stdout-tail truncation and stay diffable across rounds. Subset
    // runs default to a separate file so they never displace the driver's
    // full-run regression baseline.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (keyFilter.isEmpty) "/root/repo/bench_detail.json"
      else "/root/repo/bench_subset.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), line + "\n")
    catch { case _: Exception => () }
    // maintain the best-ever floor the regression gate ratchets against
    // (full runs only — a subset run's drift profile would skew it).
    // Drift-NORMALIZED before folding in: on a slow machine-day every
    // raw time is inflated ~uniformly, and best-ever must track plan
    // quality, not the luckiest scheduler day in history either — so a
    // new floor is accepted only as measured (never scaled DOWN by
    // drift<1, which would compound across runs).
    if (keyFilter.isEmpty) {
      val norm = math.max(drift, 1.0)
      val nb = BenchGate.nextBest(bestEver,
        results.map { case (k, v, ok) => (k, v / norm, ok) },
        robust.map { case (k, v) => k -> v / norm }.toMap)
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
    spark.stop()
  }
}
