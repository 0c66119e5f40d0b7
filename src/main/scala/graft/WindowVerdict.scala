package graft

/** The bench window classifier, extracted PURE so specs can replay
  * recorded window meters (VERDICT r16 #2: the classifier lived inline
  * in Bench.main and its uniform-contamination blind spot shipped
  * untested — BENCH_r16's three windows each burned 45–68% of wall
  * clock in GC pause yet were recorded `clean_window_count: 3`, because
  * the internal-stall verdict only fired on a >=35% throughput drop vs
  * the BEST window; when every window is equally contaminated, nothing
  * drops vs anything).
  *
  * Tiers, evaluated per window:
  *  1. external meters (neighbor CPU, iowait, disk busy, run delay) —
  *     absolute thresholds (HostLoad);
  *  2. achieved-cores drop vs the round's best — relative (a saturated
  *     closed loop that got fewer cores was starved by something);
  *  3. ABSOLUTE internal evidence (new, r17): a GC-pause share or a
  *     JIT-compile core count over its floor names the window suspect
  *     with its cause EVEN WHEN every other window is equally bad —
  *     the evidence is in the window itself, no reference needed;
  *  4. relative internal evidence: a >=internalDropFrac throughput drop
  *     vs the best absolutely-clean window explained by a named slow
  *     request.
  * An unexplained slow window still counts toward the headline —
  * evidence or it counts. The run-level verdict `internalSuspect` is
  * true when fewer than the target window count came out fully clean:
  * the headline then rests on windows carrying disqualifying evidence
  * and must not be read as a clean measurement.
  */
object WindowVerdict {

  // external-contamination thresholds (HostLoad meters; ledger:
  // VERDICT r13 #1, r14 #1 — healthy windows read near zero on all)
  val extLoadThresholdCores = 2.0
  val ioWaitThresholdCores = 2.0
  val diskBusyThresholdFrac = 0.5
  val achievedDropFrac = 0.35
  val runDelayThresholdCores = 8.0
  // hypervisor steal (r20: ~2 stolen cores halved window rps while
  // every other external meter read clean; healthy windows read ~0)
  val stealThresholdCores = 1.0
  // internal-stall floors (r15/r16 ledger: healthy windows run ~1.5 s
  // GC in 40 s = 4% and <0.5 compile cores once warm; the r16 driver
  // contamination read 45–68% GC and 0.7–2.9 compile cores)
  val internalDropFrac = 0.35
  val gcStallFracMin = 0.15
  val jitStallCoresMin = 2.0
  val slowReqThresholdMs = 5000.0

  /** One window's meters — everything the verdict functions read. */
  final case class Meters(
      rps: Double, elapsedSec: Double,
      externalCores: Double, ioWaitCores: Double, diskBusy: Double,
      achievedCores: Double, runDelayCores: Double,
      gcPauseMs: Long, jitCompileMs: Long,
      slowest: Option[(String, Double)],
      stealCores: Double = -1.0) // -1 = meter unavailable

  def gcFrac(w: Meters): Double = w.gcPauseMs / math.max(1.0, w.elapsedSec * 1000.0)

  def jitCores(w: Meters): Double =
    if (w.jitCompileMs < 0) 0.0 else w.jitCompileMs / math.max(1.0, w.elapsedSec * 1000.0)

  /** Absolute external meters only (disk-busy / run-delay -1 = meter
    * unavailable on this host: must not auto-flag).
    */
  def metersClean(w: Meters): Boolean =
    w.externalCores <= extLoadThresholdCores &&
      w.ioWaitCores <= ioWaitThresholdCores &&
      (w.diskBusy < 0 || w.diskBusy <= diskBusyThresholdFrac) &&
      (w.runDelayCores < 0 || w.runDelayCores <= runDelayThresholdCores) &&
      (w.stealCores < 0 || w.stealCores <= stealThresholdCores)

  /** External verdict: absolute meters plus the relative achieved-cores
    * drop vs the round's best (`maxAchieved` <= 0 = unavailable).
    */
  def externallyClean(w: Meters, maxAchieved: Double): Boolean =
    metersClean(w) && (w.achievedCores < 0 || maxAchieved <= 0 ||
      w.achievedCores >= (1.0 - achievedDropFrac) * maxAchieved)

  /** Tier 3: evidence carried by the window ITSELF — named regardless
    * of how the other windows look (closes the r16 blind spot).
    */
  def absoluteInternalCause(w: Meters): Option[String] = {
    val g = gcFrac(w); val j = jitCores(w)
    if (g >= gcStallFracMin) Some(f"gc_pause_${g * 100}%.0f_pct")
    else if (j >= jitStallCoresMin) Some(f"jit_compile_$j%.1f_cores")
    else None
  }

  /** Full internal verdict: the absolute tier first, then the relative
    * slow-request tier against `bestCleanRps` (the best rps among
    * windows that are externally clean AND carry no absolute internal
    * evidence; <=0 = no reference available). Externally-suspect
    * windows return None — they are already flagged by tier 1/2 and a
    * second label would mis-attribute the cause.
    */
  def internalCause(w: Meters, bestCleanRps: Double, maxAchieved: Double): Option[String] = {
    if (!externallyClean(w, maxAchieved)) return None
    absoluteInternalCause(w).orElse {
      if (bestCleanRps <= 0 || w.rps >= (1.0 - internalDropFrac) * bestCleanRps) None
      else w.slowest.collect {
        case (name, ms) if ms >= slowReqThresholdMs => f"slow_query_${name}_$ms%.0f_ms"
      }
    }
  }

  /** A window the headline may rest on without a flag. */
  def fullyClean(w: Meters, bestCleanRps: Double, maxAchieved: Double): Boolean =
    externallyClean(w, maxAchieved) && internalCause(w, bestCleanRps, maxAchieved).isEmpty

  /** Round-level verdicts over all measured windows. */
  final case class RunVerdict(
      cleanIdx: Seq[Int], // indices of fully-clean windows
      internalCauses: Seq[Option[String]], // per window, null = none
      externalLoadSuspect: Boolean, // no window even externally clean
      internalSuspect: Boolean) // fewer than target fully-clean windows

  def judge(windows: Seq[Meters], targetCleanCount: Int): RunVerdict = {
    val maxAchieved =
      if (windows.isEmpty) -1.0 else windows.map(_.achievedCores).max
    // reference for the relative internal tier: best window that is
    // externally clean AND absolutely internally clean (a GC-crushed
    // "best" must not be the reference other windows are judged by)
    val refWindows = windows.filter(w =>
      externallyClean(w, maxAchieved) && absoluteInternalCause(w).isEmpty)
    val bestCleanRps = if (refWindows.isEmpty) -1.0 else refWindows.map(_.rps).max
    val causes = windows.map(internalCause(_, bestCleanRps, maxAchieved))
    val clean = windows.zipWithIndex.collect {
      case (w, i) if fullyClean(w, bestCleanRps, maxAchieved) => i
    }
    RunVerdict(
      cleanIdx = clean,
      internalCauses = causes,
      externalLoadSuspect = !windows.exists(externallyClean(_, maxAchieved)),
      internalSuspect = clean.size < targetCleanCount)
  }
}
