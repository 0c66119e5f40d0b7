package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's external-load defense must itself be trustworthy: the
  * /proc stat parse and the window delta math are pinned here (the
  * graded throughput number now depends on them — VERDICT r13 #1).
  */
class HostLoadSpec extends AnyFunSuite {

  test("parseStatJiffies reads utime+stime past a hostile comm field") {
    // man proc(5): pid (comm) state ppid pgrp session tty tpgid flags
    // minflt cminflt majflt cmajflt utime stime ...
    val tail = "S 1 2 3 4 5 6 7 8 9 10" // state + 10 fields before utime
    assert(HostLoad.parseStatJiffies(s"42 (java) $tail 111 222 0 0 20")
      .contains(333L))
    // comm may embed spaces AND parentheses — fields come after the LAST ')'
    assert(HostLoad.parseStatJiffies(s"42 (my (weird) proc) $tail 7 13 0 0")
      .contains(20L))
    assert(HostLoad.parseStatJiffies("garbage with no paren").isEmpty)
    assert(HostLoad.parseStatJiffies("42 (short) S 1 2").isEmpty)
    assert(HostLoad.parseStatJiffies(s"42 (x) $tail notanum 5 0 0").isEmpty)
  }

  test("externalCores: common pids only, regressions clamp, fresh/vanished pids dropped") {
    val before = Map(1L -> 1000L, 2L -> 500L, 3L -> 9999L)
    val after = Map(1L -> 1400L, 2L -> 450L, 4L -> 800L)
    // pid 1: +400 jiffies; pid 2 regressed (reuse) -> 0; pid 3 vanished;
    // pid 4 fresh (no baseline) -> dropped. 400 jiffies / (4 s * 100 Hz)
    assert(HostLoad.externalCores(before, after, 4.0) == 1.0)
    assert(HostLoad.externalCores(before, before, 10.0) == 0.0)
    assert(HostLoad.externalCores(before, after, 0.0) == 0.0, "degenerate window guards")
  }

  test("parseStatIowait reads the summary cpu line's 5th value") {
    val stat = "cpu  100 0 50 9000 777 0 3 8 0 0\ncpu0 25 0 12 2250 194 0 1 2 0 0\n"
    assert(HostLoad.parseStatIowait(stat) == 777L)
    assert(HostLoad.parseStatIowait("intr 12345") == 0L, "missing cpu line -> 0")
    assert(HostLoad.parseStatIowait("cpu 1 2") == 0L, "truncated line -> 0")
  }

  test("parseDiskstatsIoTicks sums whole devices (loop/zram included), not partitions") {
    val ds = Seq(
      " 254 0 vda 100 0 800 50 200 0 1600 90 0 1234 140",
      " 254 1 vda1 90 0 700 45 190 0 1500 85 0 1111 130", // partition: skip
      // ADVICE r14: loop/zram ARE whole devices on container hosts —
      // the old 'contains p' partition test could never match loop
      "   7 0 loop0 5 0 40 1 0 0 0 0 0 99 1", // loop: count
      "   7 1 loop0p1 4 0 30 1 0 0 0 0 0 88 1", // loop partition: skip
      " 252 0 zram0 6 0 48 1 0 0 0 0 0 44 1", // zram: count
      " 259 0 nvme0n1 10 0 80 2 5 0 40 1 0 456 3", // whole nvme: count
      " 259 1 nvme0n1p1 9 0 70 2 4 0 30 1 0 400 3", // nvme partition: skip
      "   8 0 sdb 1 0 8 0 0 0 0 0 0 10 0", // whole sd: count
      "   8 1 sdb1 1 0 8 0 0 0 0 0 0 9 0", // sd partition: skip
      " 253 0 dm-0 3 0 24 1 2 0 16 1 0 77 2", // device-mapper: count
      "   9 0 md0 2 0 16 0 1 0 8 0 0 33 1", // mdraid: count
      "   9 1 md0p1 1 0 8 0 0 0 0 0 0 20 0", // md partition: skip
      " 179 0 mmcblk0 4 0 32 1 1 0 8 0 0 11 1", // mmc whole: count
      " 179 1 mmcblk0p1 3 0 24 1 0 0 0 0 0 9 0" // mmc partition: skip
    ).mkString("\n")
    assert(HostLoad.parseDiskstatsIoTicks(ds) ==
      1234L + 99L + 44L + 456L + 10L + 77L + 33L + 11L)
  }

  test("no recognizable whole device -> -1 (meter unavailable, never 'clean by zero')") {
    val ds = " 200 0 weirddev0 1 0 8 0 0 0 0 0 0 500 0"
    assert(HostLoad.parseDiskstatsIoTicks(ds) == -1L)
    val b = HostLoad.IoSample(iowaitJiffies = 0, ioTicksMs = -1L)
    val a = HostLoad.IoSample(iowaitJiffies = 100, ioTicksMs = -1L)
    assert(HostLoad.diskBusyFrac(b, a, 4.0) == -1.0, "unavailable propagates, not 0%")
  }

  test("ioWaitCores and diskBusyFrac window deltas") {
    val b = HostLoad.IoSample(iowaitJiffies = 1000, ioTicksMs = 5000)
    val a = HostLoad.IoSample(iowaitJiffies = 1000 + 400, ioTicksMs = 5000 + 2000)
    // 400 jiffies over 4 s * 100 Hz = 1 core's worth of iowait
    assert(HostLoad.ioWaitCores(b, a, 4.0) == 1.0)
    // 2000 ms of device busy over a 4 s window = 50%
    assert(HostLoad.diskBusyFrac(b, a, 4.0) == 0.5)
    assert(HostLoad.ioWaitCores(a, b, 4.0) == 0.0, "counter regression clamps")
    assert(HostLoad.diskBusyFrac(b, a, 0.0) == 0.0, "degenerate window guards")
  }

  test("self metering: achieved cores and run delay off live /proc/self") {
    val s0 = HostLoad.selfSample()
    assert(s0.cpuSec > 0, "this JVM has burned CPU")
    assert(s0.runDelayNs >= 0, "schedstat readable")
    // burn ~0.2 s of CPU on a few threads, then re-sample
    val t0 = System.nanoTime()
    val threads = (1 to 4).map { _ =>
      val t = new Thread(() => {
        var x = 0L
        while (System.nanoTime() - t0 < 200000000L) x += 1
      })
      t.start(); t
    }
    threads.foreach(_.join())
    val elapsed = (System.nanoTime() - t0) / 1e9
    val s1 = HostLoad.selfSample()
    val ach = HostLoad.achievedCores(s0, s1, elapsed)
    assert(ach > 0.5, s"4 spinning threads must achieve >0.5 cores, got $ach")
    assert(HostLoad.runDelayCores(s0, s1, elapsed) >= 0.0)
    // unavailable meters answer -1, degenerate windows guard
    assert(HostLoad.achievedCores(HostLoad.SelfSample(-1, 0), s1, 1.0) == -1.0)
    assert(HostLoad.runDelayCores(HostLoad.SelfSample(0, -1), s1, 1.0) == -1.0)
    assert(HostLoad.achievedCores(s0, s1, 0.0) == -1.0)
  }

  test("steal metering: live /proc/stat counter, deltas, unavailability sentinel") {
    val s0 = HostLoad.stealJiffies()
    assert(s0 >= -1L)
    if (s0 >= 0) {
      val s1 = HostLoad.stealJiffies()
      assert(s1 >= s0, "steal counter is cumulative")
      // a 10 s window with a 100-jiffy delta is 0.1 cores at USER_HZ=100
      assert(math.abs(HostLoad.stealCores(1000L, 1100L, 10.0) - 0.1) < 1e-9)
    }
    assert(HostLoad.stealCores(-1L, 100L, 1.0) == -1.0)
    assert(HostLoad.stealCores(100L, -1L, 1.0) == -1.0)
    assert(HostLoad.stealCores(100L, 200L, 0.0) == -1.0)
    assert(HostLoad.stealCores(200L, 100L, 1.0) == 0.0, "counter regression clamps to zero")
  }

  test("live io sampling parses this host's real /proc files") {
    val s = HostLoad.ioSample()
    assert(s.iowaitJiffies >= 0L)
    // -1 is the valid "no recognizable whole device" sentinel — exactly
    // the hosts it exists for must not fail this suite
    assert(s.ioTicksMs >= -1L)
  }

  test("live sampling: excludes self, deltas are non-negative and sane") {
    val self = ProcessHandle.current().pid()
    val s0 = HostLoad.sample()
    assert(!s0.contains(self), "own JVM must never count as external load")
    assert(s0.nonEmpty, "a Linux host always has neighbor processes")
    val cores = HostLoad.externalCores(s0, HostLoad.sample(), 0.5)
    assert(cores >= 0.0 && cores <= Runtime.getRuntime.availableProcessors() * 4.0,
      s"implausible external core estimate: $cores")
  }
}
