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

    // optional subset run (comma-separated keys or key prefixes via
    // SPARK_GRAFT_BENCH_KEYS, e.g. "q,d_dedup") — used for cross-scale
    // headline comparisons where the full write/read integration demos
    // would only measure table construction
    val keyFilter: Option[Seq[String]] = sys.env.get("SPARK_GRAFT_BENCH_KEYS")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    def selected(name: String): Boolean =
      keyFilter.forall(_.exists(k => name == k || name.startsWith(k)))
    val results = SparkEntry.queries.toSeq.filter(q => selected(q._1))
      .sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        // noop sink executes the FULL plan (count() would let Catalyst
        // prune projections/sorts and understate map-heavy queries)
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // release per-query persisted subtrees
      (name, dt, ok)
    }
    // per-query regression gate against the previous committed run:
    // environmental drift on a shared machine is near-UNIFORM across
    // queries, so the median slowdown estimates it; a query whose
    // slowdown exceeds 1.5x the median is a PLAN regression, not noise —
    // measured, not guessed.
    val prevPath = java.nio.file.Paths.get("/root/repo/bench_detail.json")
    val prev: Map[String, Double] =
      try {
        val n = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(java.nio.file.Files.readString(prevPath))
        // only a same-scale-factor run is a baseline — a cross-sf
        // comparison would flag every fixed-overhead query
        if (Option(n.get("sf")).map(_.asText()).contains(sfDir)) {
          val out = scala.collection.mutable.Map.empty[String, Double]
          Option(n.get("queries")).foreach(_.fields().forEachRemaining(e =>
            out += e.getKey -> e.getValue.asDouble()))
          out.toMap
        } else Map.empty
      } catch { case _: Exception => Map.empty }
    val ratios = results.collect { case (k, v, true)
      if prev.get(k).exists(_ > 0.05) => k -> v / prev(k) }
    // sub-second queries flicker 2x run-to-run on a shared machine —
    // only flag regressions where at least one side exceeds a second
    def overFloor(k: String): Boolean =
      results.exists(r => r._1 == k && r._2 >= 1.0) || prev(k) >= 1.0
    val drift =
      if (ratios.isEmpty) 1.0
      else ratios.map(_._2).sorted.apply(ratios.size / 2)
    // a first-pass flag on a shared machine is usually scheduler /
    // trigger jitter (sub-3s queries especially), not a plan change:
    // re-time each candidate up to twice more and keep the BEST run —
    // only a query slow in EVERY attempt is a real regression. Raw
    // first-pass times still go out in `queries` (so committed
    // baselines stay comparable); the re-timed values go out in
    // `robust` so both are visible.
    val candidates = ratios
      .filter { case (k, r) => r / drift > 1.5 && overFloor(k) }
    val robust = scala.collection.mutable.Map.empty[String, Double]
    candidates.foreach { case (k, _) =>
      var best = results.find(_._1 == k).get._2
      var attempts = 0
      while (attempts < 2 && best / (prev(k) * drift) > 1.5) {
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
      .map { case (k, _) => k -> robust(k) / prev(k) }
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
    val total = results.map(_._2).sum
    val nFailed = results.count(!_._3)
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"ok":$oks,"failed":$nFailed,"drift":$drift%.3f,"regressions":$regs,"robust":$rob,"sf":"$sfDir"}"""
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
    spark.stop()
  }
}
