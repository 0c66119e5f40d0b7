package graft

class SessionRegistrySpec extends SparkTestBase {

  test("get-or-create returns the same session per peer (registry.rs:53-243)") {
    val reg = new SessionRegistry(spark)
    val a = reg.getOrCreate("10.0.0.1")
    val b = reg.getOrCreate("10.0.0.1")
    assert(a eq b)
    assert(reg.size == 1)
    assert(reg.getOrCreate("10.0.0.2") ne a)
    assert(reg.size == 2)
  }

  test("sessions are isolated: temp views do not leak across sessions (factory.rs:72-93)") {
    val reg = new SessionRegistry(spark)
    val a = reg.getOrCreate("pa")
    val b = reg.getOrCreate("pb")
    a.sql("CREATE OR REPLACE TEMP VIEW iso_check AS SELECT 1 AS x")
    assert(a.sql("SELECT * FROM iso_check").count() == 1)
    intercept[Exception](b.sql("SELECT * FROM iso_check").count())
  }

  test("max-session cap enforced (config.rs:49-70, registry.rs:57)") {
    val reg = new SessionRegistry(spark, maxSessions = 2)
    reg.getOrCreate("p1"); reg.getOrCreate("p2")
    intercept[IllegalStateException](reg.getOrCreate("p3"))
    // existing peers still resolve at the cap
    assert(reg.getOrCreate("p1").id == "p1")
  }

  test("idle cleanup removes only timed-out sessions (cleanup_idle_sessions)") {
    val reg = new SessionRegistry(spark, idleTimeoutMillis = 1000)
    val a = reg.getOrCreate("idle")
    reg.getOrCreate("fresh")
    a.lastAccessMillis = System.currentTimeMillis() - 5000
    val removed = reg.cleanupIdle()
    assert(removed == 1)
    assert(reg.get("idle").isEmpty)
    assert(reg.get("fresh").isDefined)
  }

  test("concurrent creation for one peer yields one session (TOCTOU, registry.rs:192-207)") {
    val reg = new SessionRegistry(spark)
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results = Await.result(
      Future.sequence((1 to 16).map(_ => Future(reg.getOrCreate("race")))), 30.seconds)
    pool.shutdown()
    assert(results.forall(_ eq results.head))
    assert(reg.size == 1)
    assert(reg.totalCreated == 1)
  }

  test("a concurrent burst of DISTINCT new peers never overshoots the cap (r18 review)") {
    // the cap check inside computeIfAbsent alone is racy across bin
    // locks — creation now serializes on createLock
    val reg = new SessionRegistry(spark, maxSessions = 4)
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(16)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results = Await.result(
      Future.sequence((1 to 16).map(i => Future(
        try { reg.getOrCreate(s"burst-$i"); 1 } catch { case _: IllegalStateException => 0 }))),
      30.seconds)
    pool.shutdown()
    assert(reg.size == 4, s"registry overshot the cap: ${reg.size}")
    assert(results.sum == 4, s"exactly cap-many creations succeed: ${results.sum}")
  }

  test("idle cleanup gives an OPEN TRANSACTION a 4x grace period (r18 review)") {
    // evicting a merely-paused txn rolls its staged writes back while a
    // later COMMIT on the recreated session no-ops with success — the
    // writes would be acknowledged but gone
    val reg = new SessionRegistry(spark, idleTimeoutMillis = 1000)
    val t = reg.getOrCreate("txn"); t.begin()
    val plain = reg.getOrCreate("plain")
    val now = System.currentTimeMillis()
    t.lastAccessMillis = now - 2500     // past 1x, inside 4x
    plain.lastAccessMillis = now - 2500
    assert(reg.cleanupIdle(now) == 1, "only the plain session evicts")
    assert(reg.get("txn").isDefined && reg.get("plain").isEmpty)
    t.lastAccessMillis = now - 5000     // past 4x: genuinely abandoned
    assert(reg.cleanupIdle(now) == 1)
    assert(reg.get("txn").isEmpty, "an abandoned transaction is still reclaimed")
  }
}
