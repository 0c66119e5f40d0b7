package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

/** Session registry keyed by peer id — the reference's
  * `SessionRegistry` (swanlake-core/src/session/registry.rs:53-243):
  * get-or-create with a max-session cap (default 100, config.rs:49-70),
  * idle timeout (default 900 s), and a cleanup sweep the server runs every
  * 5 minutes (swanlake-server/src/main.rs:42-52).
  *
  * Each session wraps `root.newSession()`: isolated temp views and SQL
  * conf over one shared SparkContext — the Spark analogue of one
  * in-memory DuckDB per session over a shared lake (engine/factory.rs:72-93).
  *
  * Creation is TOCTOU-safe via `computeIfAbsent` (the reference fixed the
  * same race at registry.rs:192-207).
  */
final class SessionRegistry(
    root: SparkSession,
    val maxSessions: Int = 100,
    val idleTimeoutMillis: Long = 900L * 1000,
    val catalog: Option[graft.sources.MutableCatalog] = None) {

  private val sessions = new ConcurrentHashMap[String, Session]()
  private val created = new AtomicLong()

  final class TooManySessionsException
    extends IllegalStateException(s"session limit reached ($maxSessions)")

  /** Get the peer's session, creating it if absent. Throws when at the cap
    * (registry.rs:57,73 semaphore).
    */
  // serializes CREATION only (the hot lookup path stays lock-free): the
  // cap check inside computeIfAbsent alone is racy — lambdas for
  // distinct keys run under different ConcurrentHashMap bin locks, so a
  // burst of new peers could all observe size() < max and overshoot the
  // cap (review catch; the reference holds a semaphore, registry.rs:57)
  private val createLock = new Object

  def getOrCreate(peerId: String): Session = {
    var s = sessions.get(peerId)
    if (s == null) createLock.synchronized {
      s = sessions.computeIfAbsent(peerId, { id =>
        if (sessions.size() >= maxSessions) throw new TooManySessionsException
        created.incrementAndGet()
        new Session(id, root.newSession(), catalog)
      })
    }
    s.touch()
    s
  }

  def get(peerId: String): Option[Session] = Option(sessions.get(peerId))

  /** Remove the peer's session, first rolling back any open transaction:
    * without this, tables created inside an uncommitted txn stay
    * registered in the shared catalog forever and staged manifests leak
    * (only an explicit ROLLBACK would have dropped them).
    */
  def remove(peerId: String): Unit =
    Option(sessions.remove(peerId)).foreach(discard)

  private def discard(s: Session): Unit =
    try { if (s.inTransaction) s.rollback() }
    catch { case _: Throwable => () } // eviction must never fail

  def size: Int = sessions.size()

  def totalCreated: Long = created.get()

  /** Point-in-time registry stats for the status page — the reference's
    * `SessionRegistrySnapshot` (registry.rs:36-42): live count, caps, and
    * idle-age aggregates over the current session set.
    */
  def snapshot(nowMillis: Long = System.currentTimeMillis()): SessionRegistry.Snapshot = {
    var n = 0
    var oldest = 0L
    var sumIdle = 0L
    sessions.forEach { (_, s) =>
      val idle = math.max(0L, nowMillis - s.lastAccessMillis)
      n += 1
      sumIdle += idle
      if (idle > oldest) oldest = idle
    }
    SessionRegistry.Snapshot(
      totalSessions = n,
      maxSessions = maxSessions,
      sessionTimeoutSeconds = idleTimeoutMillis / 1000,
      oldestIdleMs = oldest,
      averageIdleMs = if (n == 0) 0L else sumIdle / n)
  }

  /** Drop sessions idle longer than the timeout (registry.rs
    * `cleanup_idle_sessions`); returns how many were removed.
    *
    * Sessions with an OPEN TRANSACTION get a 4x grace period (review
    * catch): evicting one rolls its staged writes back, and the
    * client's next COMMIT would land on a FRESH session where
    * commit-without-begin is the reference's tolerated no-op — the
    * rolled-back writes would be acknowledged as committed. A paused
    * transaction is alive client state, not idleness; only a truly
    * abandoned one (4x the timeout) is reclaimed.
    */
  def cleanupIdle(nowMillis: Long = System.currentTimeMillis()): Int = {
    var removed = 0
    sessions.forEach { (id, s) =>
      val bar = if (s.inTransaction) idleTimeoutMillis * 4 else idleTimeoutMillis
      if (nowMillis - s.lastAccessMillis > bar)
        if (sessions.remove(id, s)) { discard(s); removed += 1 }
    }
    removed
  }
}

object SessionRegistry {
  final case class Snapshot(
      totalSessions: Int,
      maxSessions: Int,
      sessionTimeoutSeconds: Long,
      oldestIdleMs: Long,
      averageIdleMs: Long)
}
