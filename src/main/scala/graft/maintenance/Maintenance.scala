package graft.maintenance

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap

import graft.sources.MutableTable

/** Background checkpoint maintenance — the reimplementation of the
  * reference's DuckLake checkpointing (swanlake-core/src/maintenance/
  * mod.rs:24-223): per-table checkpoint interval (24 h default), a
  * cross-instance advisory lock so only one process compacts a table at
  * a time (maintenance/lock.rs uses a Postgres advisory lock; here an
  * OS file lock on the table directory fills the same role for
  * file-hosted tables — a real deployment swaps in the JDBC advisory
  * lock), and a completed-checkpoint registry standing in for the
  * `ducklake_checkpoints` table (mod.rs:242-254).
  *
  * `tick()` is the loop body the server schedules (swanlake-server/src/
  * main.rs:42-52 runs cleanup every 5 min); tests drive it directly
  * with a synthetic clock.
  */
final class Maintenance(intervalMillis: Long = 24L * 3600 * 1000) {

  final case class Registered(table: MutableTable, targetFiles: Int)

  private val tables = new ConcurrentHashMap[String, Registered]()
  private val lastCheckpoint = new ConcurrentHashMap[String, Long]()

  def register(name: String, table: MutableTable, targetFiles: Int = 8): Unit =
    tables.put(name, Registered(table, targetFiles))

  /** Dropped tables leave the sweep (Server re-syncs from the live
    * catalog each tick, so registration follows table lifecycle).
    */
  def unregister(name: String): Unit = {
    tables.remove(name)
    lastCheckpoint.remove(name)
    checkpoints.remove(name)
  }

  def registered: Seq[String] = {
    import scala.jdk.CollectionConverters._
    tables.keySet.asScala.toSeq.sorted
  }

  // true per-table counters (r19 review: the old containsKey probe
  // reported existence, never exceeding 1 — a caller asserting "N
  // sweeps ran" got a false pass for N=1), the ducklake_checkpoints
  // registry row count analogue
  private val checkpoints = new ConcurrentHashMap[String, java.lang.Long]()

  def checkpointCount(name: String): Long = checkpoints.getOrDefault(name, 0L)

  def lastCheckpointAt(name: String): Option[Long] = Option(lastCheckpoint.get(name))

  /** One maintenance sweep: checkpoint every registered table whose
    * interval has elapsed, each under the advisory lock. Returns the
    * names checkpointed this tick.
    *
    * Per-table FAULT ISOLATION (r19 review): one table's checkpoint
    * failure (dropped directory racing the Server's registration sync,
    * a transient IO error) must not abort the sweep and starve every
    * table later in iteration order — persistently so if the failure
    * repeats each tick. A failed table is skipped this tick (stderr
    * notes it) and retried on the next; lastCheckpoint is only advanced
    * on success.
    */
  def tick(nowMillis: Long = System.currentTimeMillis()): Seq[String] = {
    val done = Seq.newBuilder[String]
    tables.forEach { (name, reg) =>
      val last = lastCheckpoint.getOrDefault(name, 0L)
      if (nowMillis - last >= intervalMillis) {
        try {
          withAdvisoryLock(reg.table.root) {
            reg.table.checkpoint(reg.targetFiles)
            lastCheckpoint.put(name, nowMillis)
            checkpoints.merge(name, 1L, (a, b) => a + b)
            done += name
          }
        } catch {
          // NonFatal only (r19 advice): an OutOfMemoryError/LinkageError
          // must propagate, not be downgraded to a stderr line while the
          // sweep keeps running in a possibly corrupt JVM
          case scala.util.control.NonFatal(t) =>
            System.err.println(s"[maintenance] checkpoint of $name failed " +
              s"(retried next tick): ${t.getMessage}")
        }
      }
    }
    done.result()
  }

  /** Cross-process advisory lock on the table directory (lock.rs
    * analogue). Non-blocking: if another holder exists, this tick skips
    * the table — the same "someone else is checkpointing" semantics as
    * the reference's `pg_try_advisory_lock`. Same-JVM contention throws
    * OverlappingFileLockException instead of returning null (r19
    * review: the skip mapping lived only in the SPEC's catch block, so
    * two Maintenance instances over one table root — or a manual tick
    * racing the scheduler — crashed the sweep); both shapes now map to
    * the documented skip.
    */
  def withAdvisoryLock[T](tableRoot: Path)(f: => T): Option[T] = {
    val lockFile = tableRoot.resolve("_maintenance.lock")
    val ch = FileChannel.open(lockFile,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val lock =
        try ch.tryLock()
        catch { case _: java.nio.channels.OverlappingFileLockException => null }
      if (lock == null) None
      else try Some(f) finally lock.release()
    } finally ch.close()
  }
}
