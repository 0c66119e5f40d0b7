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
      catch { case _: Throwable => 0L })

  /** Aggregate iowait jiffies (5th value on the summary `cpu` line). */
  private[graft] def parseStatIowait(stat: String): Long =
    stat.linesIterator.find(_.startsWith("cpu ")).flatMap { line =>
      val f = line.trim.split("\\s+")
      if (f.length > 5) f(5).toLongOption else None
    }.getOrElse(0L)

  /** Summed io_ticks (ms in flight) of whole block devices, partitions
    * excluded so they are not double-counted against their parent.
    * Covers the plain-disk families (vd/sd/xvd: whole iff no trailing
    * digit) and the digit-suffixed families (nvme/mmcblk/rbd/md/dm-:
    * whole iff no 'p' partition infix — none of those prefixes contains
    * a 'p' of its own). Stacked devices (dm- over sd) CAN both tick for
    * one IO; that over-counts busy time, which biases toward flagging a
    * window suspect — the safe direction for a grading defense.
    */
  private[graft] def parseDiskstatsIoTicks(diskstats: String): Long =
    diskstats.linesIterator.flatMap { line =>
      val f = line.trim.split("\\s+")
      if (f.length < 13) None
      else {
        val name = f(2)
        val whole =
          if (name.startsWith("nvme") || name.startsWith("mmcblk") ||
            name.startsWith("rbd") || name.startsWith("md") || name.startsWith("dm-"))
            !name.contains('p')
          else (name.startsWith("vd") || name.startsWith("sd") ||
            name.startsWith("xvd")) && !name.last.isDigit
        if (whole) f(12).toLongOption else None
      }
    }.sum

  /** Average cores' worth of threads parked in IO wait over the window. */
  def ioWaitCores(before: IoSample, after: IoSample, elapsedSec: Double): Double =
    if (elapsedSec <= 0) 0.0
    else math.max(0L, after.iowaitJiffies - before.iowaitJiffies) / (elapsedSec * UserHz)

  /** Fraction of the window the block devices were busy (can exceed 1.0
    * with multiple devices).
    */
  def diskBusyFrac(before: IoSample, after: IoSample, elapsedSec: Double): Double =
    if (elapsedSec <= 0) 0.0
    else math.max(0L, after.ioTicksMs - before.ioTicksMs) / (elapsedSec * 1000.0)
}
