package graft

/** The bench regression gate as pure functions, so a spec can plant a
  * slowdown and prove the gate fires (round-14 verdict: the old gate
  * compared only against the builder's LAST COMMITTED run, so a slowdown
  * committed at round close silently became the next round's baseline —
  * s_window_agg and s_stream_table_sink drifted ~1.6× that way).
  *
  * The fix: each key's baseline is the BEST of (last committed,
  * best-ever-recorded) at the same scale factor. Best-ever is maintained
  * by [[Bench]] in bench_best.json as the element-wise minimum across
  * runs, so an intra-round slowdown keeps being flagged until it is
  * actually fixed (or the best file is deliberately reset with a
  * justification).
  *
  * Floor-reset policy: the floor is per-key per-WORKLOAD. A commit that
  * intentionally makes a key do more work (e.g. round 14 adding the
  * attribution CALL inside ice_partitions_meta) must reset that key's
  * bench_best.json entry to the new workload's time in the same commit,
  * stating why — otherwise the gate correctly keeps flagging the key
  * against a floor that no longer measures the same computation.
  */
object BenchGate {

  /** Per-key baseline: min of the last committed time and the best-ever
    * time; keys present in either map get a baseline.
    */
  def baseline(prev: Map[String, Double],
      best: Map[String, Double]): Map[String, Double] =
    (prev.keySet ++ best.keySet).iterator.map { k =>
      k -> math.min(prev.getOrElse(k, Double.MaxValue),
        best.getOrElse(k, Double.MaxValue))
    }.toMap

  /** Environmental drift on a shared machine is near-uniform across
    * queries, so the median slowdown vs baseline estimates it; a query
    * whose slowdown exceeds 1.5× the median is a PLAN regression, not
    * noise.
    */
  def drift(ratios: Seq[Double]): Double =
    if (ratios.isEmpty) 1.0 else ratios.sorted.apply(ratios.size / 2)

  /** Keys whose slowdown vs baseline exceeds 1.5× the median drift.
    * Sub-second queries flicker 2× run-to-run on a shared machine, so a
    * flag requires at least one side of the comparison over a second;
    * baselines under 50 ms are too noisy to ratio at all.
    */
  def candidates(results: Seq[(String, Double, Boolean)],
      base: Map[String, Double]): (Double, Seq[(String, Double)]) = {
    val ratios = results.collect { case (k, v, true)
      if base.get(k).exists(_ > 0.05) => k -> v / base(k) }
    val d = drift(ratios.map(_._2))
    def overFloor(k: String): Boolean =
      results.exists(r => r._1 == k && r._2 >= 1.0) || base(k) >= 1.0
    (d, ratios.filter { case (k, r) => r / d > 1.5 && overFloor(k) })
  }

  /** Stable panel for instantaneous-drift confirmation. The r15 driver
    * run flagged three join keys 3–4.5× on code whose committed run (and
    * plans) were clean: the driver benches on a box that concurrently
    * runs oracle/judge processes, and a single global drift factor
    * measured over the whole pass cannot see load that arrives mid-run.
    * The fix: when a key is re-timed to confirm a flag, a small panel of
    * non-flagged keys is re-timed AT THE SAME MOMENT; if the panel is
    * slow too, it is machine load, not a code regression. Panel = keys
    * nearest the median first-pass ratio (they tracked the environment,
    * not an outlier) with baselines big enough to time reliably.
    */
  def panel(results: Seq[(String, Double, Boolean)],
      base: Map[String, Double], exclude: Set[String],
      n: Int = 3): Seq[String] = {
    val stable = results.collect { case (k, v, true)
      if !exclude.contains(k) && base.get(k).exists(_ >= 0.2) =>
        k -> v / base(k) }
    if (stable.isEmpty) Seq.empty
    else {
      val med = drift(stable.map(_._2))
      stable.sortBy { case (k, r) => (math.abs(r - med), k) }
        .take(n).map(_._1)
    }
  }

  /** A flagged key is CONFIRMED as a code regression only if its best
    * re-time exceeds 1.5× baseline after normalizing by the drift the
    * panel showed at the same moment. The panel drift is floored at 1.0:
    * a momentarily FAST panel must never manufacture a regression out of
    * a sub-1.5× raw ratio — the panel can only excuse, never accuse.
    */
  def confirmed(bestSec: Double, baseSec: Double,
      panelDrift: Double): Boolean =
    bestSec / (baseSec * math.max(panelDrift, 1.0)) > 1.5

  /** Flags excused ONLY by panel drift: the key's robust re-time would
    * confirm against its floor under a quiet machine (panel drift 1.0)
    * but the measured panel drift absorbed it. These are audit-DEFERRED:
    * the next run re-confirms them first, at its quietest moment, so a
    * real regression that landed during a noisy window cannot ride the
    * excuse forever (the panel can only excuse — this is the follow-up
    * that keeps the excuse honest).
    */
  def deferredFlags(candidates: Seq[String],
      robust: Map[String, Double], base: Map[String, Double],
      panelDrift: Map[String, Double]): Seq[String] =
    candidates.filter { k =>
      !confirmed(robust(k), base(k), panelDrift.getOrElse(k, 1.0)) &&
        confirmed(robust(k), base(k), 1.0)
    }.sorted

  /** The bench's default core count; runs at any other count measure
    * SCALING, not the committed baseline, and must not touch it.
    */
  val DefaultCpus = "32"

  /** Only a full run at the default core count may fold into the
    * regression-gate floors and the committed detail baseline (r20
    * verdict #5/#10: the driver's 8-core leg overwrote
    * bench_detail.json, folding c8 raw times into the 32c same-sf
    * floors).
    */
  def isRatchetRun(subsetRun: Boolean, cpus: String): Boolean =
    !subsetRun && cpus == DefaultCpus

  /** Default output file for this run's detail line: subset runs and
    * non-default-core runs land in side files so they never displace
    * the driver's full-run baseline.
    */
  def defaultOutPath(subsetRun: Boolean, cpus: String): String =
    if (subsetRun) "/root/repo/bench_subset.json"
    else if (cpus == DefaultCpus) "/root/repo/bench_detail.json"
    else s"/root/repo/bench_detail_c$cpus.json"

  /** Per-run cap on how far one run may lower a key's floor: a single
    * lucky scheduler day must not set a floor that every normal run then
    * "regresses" against. A genuinely faster plan still converges
    * geometrically (15%/run); a one-off 30% outlier only moves the floor
    * 15%, keeping normal runs' ratio ≈1.18 — under the 1.5× flag bar.
    */
  val MaxRatchetPerRun = 0.85

  /** Next best-ever map: element-wise min of the previous best and this
    * run's successful times (robust re-times preferred — a scheduler
    * hiccup must not inflate the floor, and only an ok run may lower it),
    * damped to [[MaxRatchetPerRun]] of the previous floor per run.
    */
  def nextBest(best: Map[String, Double],
      results: Seq[(String, Double, Boolean)],
      robust: Map[String, Double]): Map[String, Double] = {
    val now = results.collect { case (k, v, true) =>
      k -> math.min(v, robust.getOrElse(k, v)) }.toMap
    (best.keySet ++ now.keySet).iterator.map { k =>
      val old = best.get(k)
      val cand = now.get(k)
      val next = (old, cand) match {
        case (Some(o), Some(c)) =>
          math.min(o, math.max(c, o * MaxRatchetPerRun))
        case (Some(o), None) => o
        case (None, Some(c)) => c
        case (None, None) => Double.MaxValue // unreachable by keyset
      }
      k -> next
    }.toMap
  }
}
