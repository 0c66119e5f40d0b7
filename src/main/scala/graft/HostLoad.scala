package graft

/** Neighbor-CPU metering for the benchmark's external-load defense
  * (VERDICT r13 #1): how many CPU cores did processes OUTSIDE this JVM
  * burn during a measurement window?
  *
  * Loadavg (the obvious signal, and what the round-13 postmortem had to
  * lean on) is a 1-minute EWMA — it lags a 40 s window badly and mixes
  * this process's own work into the number. Direct accounting instead:
  * sample `utime+stime` jiffies from `/proc/<pid>/stat` for every pid
  * except our own, twice, and diff. Pids present in only one sample are
  * dropped (a vanished pid's total is unknowable, a fresh pid has no
  * baseline) — short-lived neighbors undercount slightly, which biases
  * toward "clean", the conservative direction for flagging.
  */
object HostLoad {

  /** Linux USER_HZ — the /proc/stat jiffy unit is fixed at 100/s for
    * userspace-visible counters regardless of the kernel tick.
    */
  val UserHz = 100.0

  /** One sample: pid → cumulative CPU jiffies (utime+stime), excluding
    * `selfPid` (default: this JVM).
    */
  def sample(selfPid: Long = ProcessHandle.current().pid()): Map[Long, Long] = {
    val pids = Option(new java.io.File("/proc").listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.forall(_.isDigit)).map(_.getName.toLong)
    pids.filter(_ != selfPid).flatMap { pid =>
      try {
        val stat = java.nio.file.Files.readString(java.nio.file.Paths.get(s"/proc/$pid/stat"))
        parseStatJiffies(stat).map(pid -> _)
      } catch { case _: Throwable => None } // pid exited mid-scan
    }.toMap
  }

  /** utime+stime out of one /proc/<pid>/stat line. The comm field can
    * contain spaces and parentheses, so fields are taken AFTER the LAST
    * ')': state is token 0, utime/stime are tokens 11/12 (man proc(5)
    * fields 14/15).
    */
  private[graft] def parseStatJiffies(stat: String): Option[Long] = {
    val close = stat.lastIndexOf(')')
    if (close < 0 || close + 2 >= stat.length) return None
    val rest = stat.substring(close + 2).split(" ")
    if (rest.length < 13) return None
    try Some(rest(11).toLong + rest(12).toLong)
    catch { case _: NumberFormatException => None }
  }

  /** Average neighbor cores burned between two samples over `elapsedSec`.
    * Only pids present in both samples count; counter regressions (pid
    * reuse) clamp to zero rather than subtracting.
    */
  def externalCores(before: Map[Long, Long], after: Map[Long, Long],
      elapsedSec: Double): Double = {
    if (elapsedSec <= 0) return 0.0
    val jiffies = after.iterator.map { case (pid, v) =>
      before.get(pid) match {
        case Some(b) if v >= b => v - b
        case _ => 0L
      }
    }.sum
    jiffies / (elapsedSec * UserHz)
  }

  /** System-wide IO pressure counters — the SECOND contamination mode.
    * Neighbor-CPU metering missed a real collapse (round 14: a window
    * read 1.08 req/s with external CPU at 0.07 cores, yet loadavg ~10
    * against ~2.7 cores of own-JVM CPU — i.e. ~7 threads parked in
    * uninterruptible IO wait, the signature of device throttling /
    * writeback storms rather than CPU contention). Direct counters:
    * the aggregate `iowait` jiffies from `/proc/stat` and the summed
    * `io_ticks` (field 13, ms the device was busy) of physical block
    * devices from `/proc/diskstats`.
    */
  final case class IoSample(iowaitJiffies: Long, ioTicksMs: Long)

  def ioSample(): IoSample = IoSample(
    iowaitJiffies =
      try parseStatIowait(java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/stat")))
      catch { case _: Throwable => 0L },
    ioTicksMs =
      try parseDiskstatsIoTicks(java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/diskstats")))
      catch { case _: Throwable => -1L }) // unreadable = unavailable, not "0% busy"

  /** Aggregate iowait jiffies (5th value on the summary `cpu` line). */
  private[graft] def parseStatIowait(stat: String): Long =
    stat.linesIterator.find(_.startsWith("cpu ")).flatMap { line =>
      val f = line.trim.split("\\s+")
      if (f.length > 5) f(5).toLongOption else None
    }.getOrElse(0L)

  /** Whole-device name shapes, partitions excluded so they are not
    * double-counted against their parent: plain disks (vda/sdb/xvdc),
    * digit-suffixed families (nvme0n1, mmcblk0, rbd0, md0, dm-0), and
    * the container-host families loop/zram (ADVICE r14: the previous
    * 'contains p' partition test could never match loop — the prefix
    * itself contains a p — so loop-backed hosts read disk-busy 0 and IO
    * contamination passed as clean).
    */
  private val wholeDeviceRe =
    "^(?:(?:vd|sd|xvd)[a-z]+|nvme\\d+n\\d+|mmcblk\\d+|rbd\\d+|md\\d+|dm-\\d+|loop\\d+|zram\\d+)$".r

  /** Summed io_ticks (ms in flight) of whole block devices, or -1 when
    * NO whole device matched (unknown device naming: the meter is
    * UNAVAILABLE and must not read as "0% busy = clean" — the caller
    * falls back to iowait-only IO flagging). Stacked devices (dm- over
    * sd) CAN both tick for one IO; that over-counts busy time, which
    * biases toward flagging a window suspect — the safe direction for a
    * grading defense.
    */
  private[graft] def parseDiskstatsIoTicks(diskstats: String): Long = {
    var matched = false
    var sum = 0L
    diskstats.linesIterator.foreach { line =>
      val f = line.trim.split("\\s+")
      if (f.length >= 13 && wholeDeviceRe.matches(f(2)))
        f(12).toLongOption.foreach { v => matched = true; sum += v }
    }
    if (matched) sum else -1L
  }

  /** Average cores' worth of threads parked in IO wait over the window. */
  def ioWaitCores(before: IoSample, after: IoSample, elapsedSec: Double): Double =
    if (elapsedSec <= 0) 0.0
    else math.max(0L, after.iowaitJiffies - before.iowaitJiffies) / (elapsedSec * UserHz)

  /** Fraction of the window the block devices were busy (can exceed 1.0
    * with multiple devices); -1 when the device meter is unavailable
    * (no recognizable whole device — callers fall back to iowait-only).
    */
  def diskBusyFrac(before: IoSample, after: IoSample, elapsedSec: Double): Double =
    if (before.ioTicksMs < 0 || after.ioTicksMs < 0) -1.0
    else if (elapsedSec <= 0) 0.0
    else math.max(0L, after.ioTicksMs - before.ioTicksMs) / (elapsedSec * 1000.0)

  /** Own-JVM self metering — the THIRD contamination mode (VERDICT r14
    * #1: a window collapsed to 3.34 req/s while neighbor CPU, iowait,
    * and disk busy all read clean — whatever starved the JVM lived
    * outside the pid namespace: neighbor VMs, hypervisor steal, cgroup
    * throttling). Two in-namespace meters that see it regardless of the
    * cause:
    *  - achieved cores: this process's utime+stime delta / elapsed — a
    *    saturated closed-loop bench whose achieved cores collapse below
    *    the round's best was starved, full stop;
    *  - run delay: /proc/self/task/<tid>/schedstat field 2, time spent
    *    runnable-but-NOT-running, summed over live threads — the
    *    steal/throttle signature (the thread wanted the CPU and the
    *    host gave it to someone else).
    */
  final case class SelfSample(cpuSec: Double, runDelayNs: Long)

  def selfSample(): SelfSample = {
    val cpu =
      try parseStatJiffies(java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/self/stat")))
        .map(_ / UserHz).getOrElse(-1.0)
      catch { case _: Throwable => -1.0 }
    val rd =
      try {
        Option(new java.io.File("/proc/self/task").listFiles()).getOrElse(Array.empty)
          .map { t =>
            try {
              val f = java.nio.file.Files.readString(t.toPath.resolve("schedstat")).trim.split("\\s+")
              if (f.length >= 2) f(1).toLong else 0L
            } catch { case _: Throwable => 0L } // thread exited mid-scan
          }.sum
      } catch { case _: Throwable => -1L }
    SelfSample(cpu, rd)
  }

  /** Average cores this JVM actually burned over the window (-1 when
    * the meter is unavailable).
    */
  def achievedCores(before: SelfSample, after: SelfSample, elapsedSec: Double): Double =
    if (before.cpuSec < 0 || after.cpuSec < 0 || elapsedSec <= 0) -1.0
    else math.max(0.0, after.cpuSec - before.cpuSec) / elapsedSec

  /** Average cores' worth of this JVM's threads held runnable-but-not-
    * running over the window (-1 when unavailable). Threads that exit
    * mid-window take their accumulated delay with them, so the delta is
    * clamped at zero — an undercount, which only ever UNDER-flags.
    */
  def runDelayCores(before: SelfSample, after: SelfSample, elapsedSec: Double): Double =
    if (before.runDelayNs < 0 || after.runDelayNs < 0 || elapsedSec <= 0) -1.0
    else math.max(0L, after.runDelayNs - before.runDelayNs) / (elapsedSec * 1e9)
}
