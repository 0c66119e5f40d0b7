package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replays RECORDED bench window meters through the extracted
  * classifier (VERDICT r16 #2): the uniform-contamination blind spot
  * let BENCH_r16 record `clean_window_count: 3` for a run whose every
  * window burned 45–68% of wall clock in GC pause. The absolute tier
  * must flag all three windows and the run, without breaking the
  * healthy-run and one-bad-window verdicts that already worked.
  */
class WindowVerdictSpec extends AnyFunSuite {
  import WindowVerdict._

  private def win(rps: Double, gcMs: Long, jitMs: Long,
      elapsed: Double = 40.3, ext: Double = 0.05, iow: Double = 0.01,
      disk: Double = 0.001, ach: Double = 29.0, rdl: Double = 0.5,
      slowest: Option[(String, Double)] = None, steal: Double = -1.0): Meters =
    Meters(rps, elapsed, ext, iow, disk, ach, rdl, gcMs, jitMs, slowest, steal)

  test("hypervisor steal over the threshold flags a window externally (r20 fifth lens)") {
    // the r20 signature: every other external meter clean, ~2 stolen
    // cores, window rps halved — the old classifier passed it clean
    val stolen = win(6.75, 1284, 6479, steal = 2.1)
    assert(!metersClean(stolen), "2.1 stolen cores must not read clean")
    val healthy = win(19.2, 743, 16444, steal = 0.02)
    assert(metersClean(healthy))
    val meterless = win(19.2, 743, 16444) // steal = -1: unavailable, never auto-flags
    assert(metersClean(meterless))
    val v = judge(Seq(stolen, healthy, healthy), targetCleanCount = 3)
    assert(v.cleanIdx == Seq(1, 2))
    assert(v.internalSuspect)
  }

  test("BENCH_r16 driver windows: uniformly GC-crushed run flags all three and the run") {
    // the exact driver-run figures from BENCH_r16 / VERDICT r16: GC
    // pause [27127, 24267, 17875] ms and JIT [117324, 37450, 26971] ms
    // over ~40 s windows of 4.9–5.9 req/s; every external meter clean.
    // r16's relative-only classifier passed ALL THREE as clean.
    val windows = Seq(
      win(4.92, 27127, 117324, slowest = Some(("q4_order_priority", 11483.7))),
      win(5.40, 24267, 37450, slowest = Some(("q4_order_priority", 10612.2))),
      win(5.75, 17875, 26971, slowest = Some(("q8_market_share", 9571.9))))
    windows.zipWithIndex.foreach { case (w, i) =>
      val cause = absoluteInternalCause(w)
      assert(cause.isDefined, s"window ${i + 1} carried 44-67% GC share yet got no absolute cause")
      assert(cause.get.startsWith("gc_pause_"), s"window ${i + 1}: $cause")
    }
    val v = judge(windows, targetCleanCount = 3)
    assert(v.cleanIdx.isEmpty, "no GC-crushed window may count as clean")
    assert(v.internalCauses.forall(_.isDefined))
    assert(v.internalSuspect, "the run-level flag is the whole point of the absolute tier")
    assert(!v.externalLoadSuspect, "the contamination was internal, not neighbor load")
  }

  test("builder r16 windows: a healthy run stays clean end to end") {
    // builder same-code run: GC [1566, 1378, 1513] ms (~3.8%), JIT
    // well under a compile core, 18.9-20.8 req/s
    val windows = Seq(
      win(18.9, 1566, 2800), win(20.2, 1378, 900), win(20.8, 1513, 400))
    val v = judge(windows, targetCleanCount = 3)
    assert(v.cleanIdx == Seq(0, 1, 2))
    assert(v.internalCauses.forall(_.isEmpty))
    assert(!v.internalSuspect && !v.externalLoadSuspect)
  }

  test("r15 mode: one slow window among good ones is named by the relative tier") {
    // BENCH_r15's failure shape: windows of 10.0 and 4.5 req/s, the
    // slow one at full achieved cores with a single 9 s request and
    // GC/JIT under the absolute floors
    val windows = Seq(
      win(10.0, 1500, 800),
      win(4.5, 2000, 1000, slowest = Some(("q21_late_suppliers", 9000.0))),
      win(9.8, 1400, 600))
    val v = judge(windows, targetCleanCount = 3)
    assert(v.internalCauses(1).exists(_.startsWith("slow_query_q21_late_suppliers")))
    assert(v.cleanIdx == Seq(0, 2))
    assert(v.internalSuspect, "2 of 3 clean => the run must say so")
  }

  test("jit-only contamination is named as jit_compile") {
    // 3 compile cores across the window, GC fine — the window-1 ramp
    // signature when warmup was insufficient
    val w = win(6.0, 1200, 121000)
    assert(absoluteInternalCause(w).exists(_.startsWith("jit_compile_")))
  }

  test("externally-suspect windows keep their external verdict (no internal double label)") {
    val w = win(3.0, 27000, 90000, ext = 7.5) // neighbor storm AND GC
    val v = judge(Seq(w, win(10.0, 1500, 800)), targetCleanCount = 2)
    assert(v.internalCauses(0).isEmpty, "tier 1/2 already owns this window")
    assert(v.cleanIdx == Seq(1))
  }

  test("absolute tier fires exactly at the documented floors") {
    // 40 s window: gc floor = 0.15 * 40300 ms = 6045 ms; jit floor =
    // 2.0 cores = 80600 ms
    assert(absoluteInternalCause(win(8.0, 6045, 0)).isDefined)
    assert(absoluteInternalCause(win(8.0, 6044, 0)).isEmpty)
    assert(absoluteInternalCause(win(8.0, 0, 80600)).isDefined)
    assert(absoluteInternalCause(win(8.0, 0, 80599)).isEmpty)
    assert(absoluteInternalCause(win(8.0, 0, -1)).isEmpty, "-1 = meter unavailable")
  }

  test("unexplained slow window still counts toward the headline (evidence or it counts)") {
    // 50% drop, every meter clean, no slow request past threshold
    val windows = Seq(win(10.0, 1500, 800), win(5.0, 1600, 900), win(9.9, 1500, 700))
    val v = judge(windows, targetCleanCount = 3)
    assert(v.internalCauses(1).isEmpty)
    assert(v.cleanIdx == Seq(0, 1, 2), "no named evidence => window stands")
    assert(!v.internalSuspect)
  }

  test("relative tier references the best ABSOLUTELY-clean window, not a GC-crushed max") {
    // fastest window is itself GC-crushed; the 7.0 window must be
    // judged against the 6.8 clean one (no drop), not the 12.0
    val windows = Seq(win(12.0, 25000, 0), win(7.0, 1500, 800, slowest = Some(("q9", 9000.0))),
      win(6.8, 1400, 700))
    val v = judge(windows, targetCleanCount = 3)
    assert(v.internalCauses(0).exists(_.startsWith("gc_pause_")))
    assert(v.internalCauses(1).isEmpty, "7.0 vs best-clean 6.8 is no drop at all")
    assert(v.cleanIdx == Seq(1, 2))
  }

  test("psi parser: some/full totals out of /proc/pressure text") {
    val text = "some avg10=0.00 avg60=1.23 avg300=0.00 total=354469121\n" +
      "full avg10=0.00 avg60=0.00 avg300=0.00 total=48706467\n"
    assert(HostLoad.parsePsi(text) == (354469121L, 48706467L))
    val cpuOnly = "some avg10=0.00 avg60=0.00 avg300=0.00 total=51410981\n"
    assert(HostLoad.parsePsi(cpuOnly) == (51410981L, -1L))
    assert(HostLoad.parsePsi("") == (-1L, -1L))
    assert(HostLoad.psiStallMs(354469121L, 354479121L) == 10L)
    assert(HostLoad.psiStallMs(-1L, 100L) == -1L)
    assert(HostLoad.psiStallMs(100L, 50L) == 0L, "counter regression clamps")
  }

  test("live samples do not throw and carry sane shapes on this host") {
    val p = HostLoad.psiSample()
    // this worker has PSI: totals are cumulative, so two samples are ordered
    val p2 = HostLoad.psiSample()
    if (p.memSomeUs >= 0) assert(p2.memSomeUs >= p.memSomeUs)
    val cg = HostLoad.cgroupSample()
    // v1 hierarchy here: usage is a positive byte count when available
    if (cg.memUsageBytes >= 0) assert(cg.memUsageBytes > 0)
    val lim = HostLoad.cgroupMemLimitBytes()
    assert(lim == -1L || lim > 0)
  }
}
