package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate, exercised with planted slowdowns — in
  * particular the round-14 blindspot: a slowdown that made it into the
  * last committed run must STILL be flagged, because the baseline also
  * remembers the best-ever time.
  */
class BenchGateSpec extends AnyFunSuite {

  private def run(times: (String, Double)*): Seq[(String, Double, Boolean)] =
    times.map { case (k, v) => (k, v, true) }

  test("planted slowdown in the current run is flagged") {
    val prev = Map("a" -> 2.0, "b" -> 3.0, "c" -> 1.5)
    val base = BenchGate.baseline(prev, Map.empty)
    val (drift, flagged) =
      BenchGate.candidates(run("a" -> 2.1, "b" -> 3.1, "c" -> 4.5), base)
    assert(math.abs(drift - 1.05) < 0.05)
    assert(flagged.map(_._1) == Seq("c"))
  }

  test("blindspot closed: slowdown baked into last-committed still flags") {
    // round-14 scenario: c slowed 3x and was committed; the next run
    // matches the committed (slow) time. Against prev alone the ratio is
    // 1.0 — invisible. Best-ever remembers the fast run, so it flags.
    val prevWithBakedSlowdown = Map("a" -> 2.0, "b" -> 3.0, "c" -> 4.5)
    val bestEver = Map("a" -> 2.0, "b" -> 3.0, "c" -> 1.5)
    val current = run("a" -> 2.0, "b" -> 3.0, "c" -> 4.5)

    val (_, withoutBest) = BenchGate.candidates(current,
      BenchGate.baseline(prevWithBakedSlowdown, Map.empty))
    assert(withoutBest.isEmpty, "old gate misses the baked-in slowdown")

    val (_, withBest) = BenchGate.candidates(current,
      BenchGate.baseline(prevWithBakedSlowdown, bestEver))
    assert(withBest.map(_._1) == Seq("c"), "ratcheted gate flags it")
  }

  test("uniform environmental drift is not flagged") {
    val base = BenchGate.baseline(Map("a" -> 2.0, "b" -> 3.0, "c" -> 1.5),
      Map.empty)
    val (drift, flagged) =
      BenchGate.candidates(run("a" -> 2.6, "b" -> 3.9, "c" -> 1.95), base)
    assert(math.abs(drift - 1.3) < 1e-9)
    assert(flagged.isEmpty)
  }

  test("sub-second flicker is below the flag floor") {
    val base = BenchGate.baseline(
      Map("a" -> 0.2, "b" -> 3.0, "c" -> 2.0), Map.empty)
    // a doubled 0.2s query stays unflagged; both sides under a second
    val (_, flagged) =
      BenchGate.candidates(run("a" -> 0.45, "b" -> 3.0, "c" -> 2.0), base)
    assert(flagged.isEmpty)
  }

  test("failed queries never participate") {
    val base = BenchGate.baseline(Map("a" -> 2.0, "b" -> 2.0), Map.empty)
    val results = Seq(("a", 9.0, false), ("b", 2.0, true))
    val (_, flagged) = BenchGate.candidates(results, base)
    assert(flagged.isEmpty)
  }

  test("nextBest folds in only ok runs, preferring robust re-times") {
    val best = Map("a" -> 2.0, "b" -> 3.0)
    val results = Seq(("a", 1.8, true), ("b", 9.0, false), ("c", 4.0, true))
    val nb = BenchGate.nextBest(best, results, Map("c" -> 3.2))
    // a: within the per-run ratchet cap → taken as measured; b: failed
    // run never lowers the floor; c: new key seeds from its robust time
    assert(nb == Map("a" -> 1.8, "b" -> 3.0, "c" -> 3.2))
  }

  test("a one-off lucky run only moves the floor 15%, never flags later") {
    val best = Map("a" -> 2.0)
    // lucky 35%-fast outlier: floor dampens to 0.85 * 2.0 = 1.7
    val nb = BenchGate.nextBest(best, Seq(("a", 1.3, true)), Map.empty)
    assert(nb == Map("a" -> 1.7))
    // a NORMAL run against the damped floor stays under the flag bar
    val (_, flagged) = BenchGate.candidates(Seq(("a", 2.0, true)),
      BenchGate.baseline(Map("a" -> 2.0), nb))
    assert(flagged.isEmpty)
    // while a SUSTAINED genuine improvement converges geometrically
    val nb2 = BenchGate.nextBest(nb, Seq(("a", 1.3, true)), Map.empty)
    val nb3 = BenchGate.nextBest(nb2, Seq(("a", 1.3, true)), Map.empty)
    assert(math.abs(nb2("a") - 1.7 * 0.85) < 1e-9)
    assert(math.abs(nb3("a") - 1.3) < 1e-9)
  }

  test("environment noise at re-time is excused by a slow panel") {
    // r15 driver-run scenario: the candidate re-times 3x over its floor,
    // but the panel measured at the same moment is also 3x slow — the
    // box is loaded (concurrent oracle/judge processes), not a plan
    // regression
    assert(!BenchGate.confirmed(bestSec = 4.5, baseSec = 1.5,
      panelDrift = 3.0))
  }

  test("a real code regression is confirmed against a healthy panel") {
    assert(BenchGate.confirmed(bestSec = 4.5, baseSec = 1.5,
      panelDrift = 1.0))
    // and stays confirmed under mild load — 3x over floor vs 1.3 drift
    assert(BenchGate.confirmed(bestSec = 4.5, baseSec = 1.5,
      panelDrift = 1.3))
  }

  test("a momentarily fast panel never manufactures a regression") {
    // 1.4x over floor with the panel at 0.7 would normalize to 2.0 —
    // the 1.0 floor keeps sub-1.5x raw ratios unflagged (the panel can
    // only excuse, never accuse)
    assert(!BenchGate.confirmed(bestSec = 2.1, baseSec = 1.5,
      panelDrift = 0.7))
  }

  test("panel picks stable keys nearest the median, excluding flagged") {
    val results = run("a" -> 2.0, "b" -> 3.3, "c" -> 4.5, "d" -> 0.1,
      "e" -> 2.2)
    val base = Map("a" -> 2.0, "b" -> 3.0, "c" -> 1.5, "d" -> 0.09,
      "e" -> 2.0)
    // c is the flagged candidate; d's baseline is too small to re-time
    // reliably — the panel is the remaining stable keys
    assert(BenchGate.panel(results, base, Set("c")).toSet ==
      Set("a", "b", "e"))
    // at most n keys, nearest the median ratio first (ties by key)
    assert(BenchGate.panel(results, base, Set("c"), n = 1) == Seq("b"))
  }

  test("end-to-end: planted machine load flags nothing, planted code" +
      " regression still flags") {
    val base = BenchGate.baseline(
      Map("a" -> 2.0, "b" -> 3.0, "c" -> 1.5, "e" -> 2.0), Map.empty)
    // whole machine 3x slow mid-run: candidates() may flag c if the
    // load arrived after the median was set, but the panel measured at
    // re-time excuses it
    val (_, flaggedEnv) = BenchGate.candidates(
      run("a" -> 2.1, "b" -> 3.1, "c" -> 4.5, "e" -> 2.1), base)
    assert(flaggedEnv.map(_._1) == Seq("c"))
    assert(!BenchGate.confirmed(4.5, base("c"), panelDrift = 3.0))
    // same flag with a healthy panel → a genuine regression
    assert(BenchGate.confirmed(4.5, base("c"), panelDrift = 1.05))
  }

  test("baseline takes the min of committed and best-ever per key") {
    val b = BenchGate.baseline(Map("a" -> 2.0, "b" -> 1.0),
      Map("a" -> 1.5, "c" -> 5.0))
    assert(b == Map("a" -> 1.5, "b" -> 1.0, "c" -> 5.0))
  }

  test("a panel-excused planted regression is deferred and caught on " +
      "the next quiet run") {
    val base = Map("slow" -> 2.0, "fine" -> 2.0)
    // run 1: "slow" genuinely regressed 2x, but the machine was loaded —
    // the panel measured 2.1x drift at the same moment, so the in-flow
    // gate excuses it (the panel can only excuse)...
    val robust = Map("slow" -> 4.0, "fine" -> 2.1)
    val panelDrift = Map("slow" -> 2.1)
    assert(!BenchGate.confirmed(robust("slow"), base("slow"),
      panelDrift("slow")), "loaded run must excuse")
    // ...but the excuse is recorded: the flag would confirm on a quiet
    // machine, so it lands in the deferred audit list
    val deferred = BenchGate.deferredFlags(Seq("slow"), robust, base,
      panelDrift)
    assert(deferred == Seq("slow"))
    // run 2 (quiet): the audit re-times the key first thing; the
    // regression is still there and the quiet panel (drift 1.0) cannot
    // excuse it — caught
    assert(BenchGate.confirmed(3.9, base("slow"), 1.0))
    // a flag that would NOT confirm even on a quiet machine (pure noise)
    // is never deferred
    assert(BenchGate.deferredFlags(Seq("fine"),
      Map("fine" -> 2.2), base, Map("fine" -> 1.8)).isEmpty)
  }

  test("cold-cache marker: a cachedBuild miss is drained once, a hit " +
      "never records (r19 verdict #7: bench stamps cold_cache per key)") {
    val src = java.nio.file.Files.createTempFile("cold-src", ".bin")
    java.nio.file.Files.write(src, Array[Byte](1, 2, 3))
    val name = s"benchgate-cold-${java.util.UUID.randomUUID.toString.take(8)}"
    Staging.drainColdBuilds() // isolate from other suites in this JVM
    // miss: nothing cached under a fresh name -> build runs, miss recorded
    var built = 0
    Staging.cachedBuild(name, "r1", Seq(src)) { _ => built += 1 }
    assert(built == 1)
    assert(Staging.drainColdBuilds().contains(name))
    // drain cleared the record
    assert(!Staging.drainColdBuilds().contains(name))
    // hit: same recipe + fingerprint -> no rebuild, no cold record
    Staging.cachedBuild(name, "r1", Seq(src)) { _ => built += 1 }
    assert(built == 1)
    assert(!Staging.drainColdBuilds().contains(name))
    // recipe bump -> rebuild, cold again
    Staging.cachedBuild(name, "r2", Seq(src)) { _ => built += 1 }
    assert(built == 2)
    assert(Staging.drainColdBuilds().contains(name))
  }

  test("low-core and subset runs never touch the default-core baseline " +
      "(r20 verdict #5/#10: a c8 leg overwrote the 32c detail floors)") {
    // full run at the default core count: the only ratchet-eligible shape
    assert(BenchGate.isRatchetRun(subsetRun = false, cpus = "32"))
    assert(BenchGate.defaultOutPath(subsetRun = false, cpus = "32")
      == "/root/repo/bench_detail.json")
    // a low-core scaling leg routes to a side file and never ratchets
    assert(!BenchGate.isRatchetRun(subsetRun = false, cpus = "8"))
    assert(BenchGate.defaultOutPath(subsetRun = false, cpus = "8")
      == "/root/repo/bench_detail_c8.json")
    // subset runs keep their own side file whatever the core count
    assert(!BenchGate.isRatchetRun(subsetRun = true, cpus = "32"))
    assert(BenchGate.defaultOutPath(subsetRun = true, cpus = "32")
      == "/root/repo/bench_subset.json")
    assert(!BenchGate.isRatchetRun(subsetRun = true, cpus = "8"))
  }

  test("forced prepass rebuild: each artifact rebuilds once per process " +
      "and build seconds are recorded (r20 verdict #3)") {
    val src = java.nio.file.Files.createTempFile("force-src", ".bin")
    java.nio.file.Files.write(src, Array[Byte](7, 8, 9))
    val name = s"benchgate-force-${java.util.UUID.randomUUID.toString.take(8)}"
    Staging.drainBuildSeconds()
    var built = 0
    // cold build under force: builds, records seconds, marks forced
    Staging.forceRebuild = true
    try {
      Staging.cachedBuild(name, "r1", Seq(src)) { _ => built += 1 }
      assert(built == 1)
      // second forced call with a MATCHING marker: already forced this
      // process -> fast path, no double rebuild (several keys share one
      // artifact)
      Staging.cachedBuild(name, "r1", Seq(src)) { _ => built += 1 }
      assert(built == 1)
    } finally Staging.forceRebuild = false
    val secs = Staging.drainBuildSeconds()
    assert(secs.contains(name), s"build seconds recorded: $secs")
    assert(secs(name) >= 0.0)
    // drained: a second drain is empty for this name
    assert(!Staging.drainBuildSeconds().contains(name))
    // force off + marker match -> plain cache hit
    Staging.cachedBuild(name, "r1", Seq(src)) { _ => built += 1 }
    assert(built == 1)
  }
}
