package graft.flight

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Client + pool over the in-proc producer — the loopback equivalent of
  * the reference's pool integration suite (swanlake-client/tests): every
  * pooled call crosses the ticket + Arrow IPC boundary.
  */
class ClientPoolSpec extends SparkTestBase {
  import ClientPool._

  private def newPool(config: PoolConfig = PoolConfig()) =
    new FlightSqlPool(new FlightSqlProducer(new SessionRegistry(spark)), config)

  test("config validation rejects invalid sizes (pool.rs:34-46)") {
    intercept[IllegalArgumentException](PoolConfig(maxSize = 0).validate())
    intercept[IllegalArgumentException](PoolConfig(minIdle = 3, maxSize = 2).validate())
    val d = PoolConfig()
    assert(d.maxSize >= 4 && d.maxSize <= 16)
    d.validate()
  }

  test("client connect health-checks and query decodes the IPC stream (client.rs:122-134)") {
    val producer = new FlightSqlProducer(new SessionRegistry(spark))
    val c = FlightSqlClient.connect(producer)
    val r = c.query("SELECT 1 AS x, 'a' AS s")
    assert(r.totalRows == 1 && r.rows.head.getInt(0) == 1 && r.rows.head.getString(1) == "a")
    assert(r.schema.fieldNames.sameElements(Array("x", "s")))
    c.disconnect()
    assert(producer.registry.get(c.peer).isEmpty)
  }

  test("sequential pooled queries reuse one connection (pool.rs idle stack)") {
    val pool = newPool(PoolConfig(minIdle = 0, maxSize = 4))
    (1 to 5).foreach { i =>
      val r = pool.query(s"SELECT $i AS v")
      assert(r.rows.head.getInt(0) == i)
    }
    assert(pool.totalConnections == 1, "sequential load must not grow the pool")
    assert(pool.idleConnections == 1)
  }

  test("acquire blocks at the cap and times out; release unblocks (pool.rs:142-194)") {
    val pool = newPool(PoolConfig(minIdle = 0, maxSize = 1, acquireTimeoutMs = 200))
    val held = pool.acquire()
    val t0 = System.currentTimeMillis()
    intercept[IllegalStateException](pool.acquire())
    assert(System.currentTimeMillis() - t0 >= 190, "second acquire must wait for the timeout")
    // a released connection satisfies a waiting acquire
    val pool2 = newPool(PoolConfig(minIdle = 0, maxSize = 1, acquireTimeoutMs = 5000))
    val first = pool2.acquire()
    val ex = Executors.newSingleThreadExecutor()
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(ex)
    val waiter = Future(pool2.acquire())
    Thread.sleep(100)
    pool2.release(first)
    val got = Await.result(waiter, 5.seconds)
    assert(got eq first, "waiter receives the released connection, not a new one")
    ex.shutdown()
    pool.release(held)
  }

  test("idle TTL evicts stale connections and tears down their sessions (pool_shared evict_idle)") {
    val pool = newPool(PoolConfig(minIdle = 2, maxSize = 4, idleTtlMs = 1))
    assert(pool.totalConnections == 2)
    Thread.sleep(10)
    // next acquire sweeps the stale idles, then creates fresh
    val c = pool.acquire()
    assert(pool.totalConnections == 1, "both warm connections were stale; one fresh created")
    pool.release(c)
  }

  test("query error on a healthy connection propagates and keeps the connection (pool.rs:447-462)") {
    val pool = newPool(PoolConfig(minIdle = 0, maxSize = 2))
    intercept[Throwable](pool.query("SELECT definitely broken FROM"))
    assert(pool.totalConnections == 1, "healthy connection returns to the pool after a bad query")
    assert(pool.query("SELECT 2 AS v").rows.head.getInt(0) == 2)
    assert(pool.totalConnections == 1)
  }

  test("parameterized pooled query rides the prepared-statement RPCs (client.rs:154-156)") {
    val pool = newPool(PoolConfig(minIdle = 0))
    Engine.registerAll(spark, sfDir)
    val r = pool.queryWithParams(
      s"SELECT n_name FROM parquet.`$sfDir/nation.parquet` WHERE n_nationkey = ? ORDER BY n_name",
      Row(2L), StructType(Seq(StructField("p1", LongType))))
    assert(r.totalRows == 1 && r.rows.head.getString(0).nonEmpty)
  }

  test("session handle is stateful and exclusive; close returns it (pool.rs SessionHandle:281-326)") {
    val pool = newPool(PoolConfig(minIdle = 0, maxSize = 2))
    val s = pool.acquireSession()
    try {
      s.update("CREATE OR REPLACE TEMP VIEW pool_sess_v AS SELECT 42 AS v")
      assert(s.query("SELECT v FROM pool_sess_v").rows.head.getInt(0) == 42)
      // a different pooled connection (fresh peer session) cannot see it
      intercept[Throwable](pool.query("SELECT v FROM pool_sess_v",
        QueryOptions(retryOnFailure = Some(false))))
      // transactions flow through the action surface
      val txn = s.beginTransaction()
      assert(txn.nonEmpty)
      s.commit(txn)
    } finally s.close()
    assert(pool.idleConnections >= 1, "closed session returns its connection")
  }

  test("a session closed with an OPEN transaction rolls back before pooling (r19 review)") {
    val cat = graft.sources.MutableCatalog(spark)
    cat.create("fl_txn_leak_t", StructType(Seq(
      StructField("id", LongType), StructField("v", LongType))))
    val producer = new FlightSqlProducer(new SessionRegistry(spark, catalog = Some(cat)))
    val pool = new FlightSqlPool(producer, PoolConfig(minIdle = 0, maxSize = 1))
    val s = pool.acquireSession()
    s.beginTransaction()
    s.update("INSERT INTO fl_txn_leak_t VALUES (1, 1)")
    s.close() // begin-without-end: release must roll the txn back
    // the SAME connection (maxSize = 1) serves the next borrower: it
    // must be in autocommit (no inherited open txn) and the staged
    // insert must be gone
    val c = pool.acquire()
    assert(!producer.registry.getOrCreate(c.peer).inTransaction,
      "pooled connection inherited an open transaction")
    pool.release(c)
    val n = pool.query("SELECT COUNT(*) AS c FROM fl_txn_leak_t").rows.head.getLong(0)
    assert(n == 0, s"staged insert from the abandoned txn leaked: $n rows")
    // and an autocommit write on the recycled connection works normally
    pool.update("INSERT INTO fl_txn_leak_t VALUES (2, 2)")
    assert(pool.query("SELECT COUNT(*) AS c FROM fl_txn_leak_t").rows.head.getLong(0) == 1)
    cat.drop("fl_txn_leak_t")
  }

  test("a pooled update(BEGIN) cannot leak an open txn into the idle stack (r19 review)") {
    val pool = newPool(PoolConfig(minIdle = 0, maxSize = 1))
    pool.update("BEGIN") // returns the connection with release()
    val c = pool.acquire()
    assert(!c.producer.registry.getOrCreate(c.peer).inTransaction,
      "update(BEGIN) left the pooled connection inside a transaction")
    pool.release(c)
  }

  test("release() of a connection whose session was reaped does not re-create it (r19 review)") {
    val producer = new FlightSqlProducer(new SessionRegistry(spark))
    val pool = new FlightSqlPool(producer, PoolConfig(minIdle = 0, maxSize = 2))
    val c = pool.acquire()
    producer.registry.remove(c.peer) // the idle-reap sweep's effect
    pool.release(c)
    assert(producer.registry.get(c.peer).isEmpty,
      "release must probe with get, not getOrCreate — no session re-created as a side effect")
    assert(pool.idleConnections == 1, "the connection itself still returns to the pool")
  }

  test("a failed connect healthcheck releases the handshake session (r19 review)") {
    val producer = new FlightSqlProducer(new SessionRegistry(spark))
    intercept[IllegalArgumentException](
      FlightSqlClient.connect(producer, peer = "hc-fail-peer",
        healthcheckSql = "SELECT * FROM no_such_table_hc"))
    assert(producer.registry.get("hc-fail-peer").isEmpty,
      "failed connect must not leak its registry session")
  }

  test("concurrent pooled clients mutate and read the shared micro-lake consistently") {
    val cat = graft.sources.MutableCatalog(spark)
    cat.create("fl_conc_t", StructType(Seq(
      StructField("id", LongType), StructField("v", LongType))))
    val producer = new FlightSqlProducer(new SessionRegistry(spark, catalog = Some(cat)))
    val pool = new FlightSqlPool(producer, PoolConfig(minIdle = 0, maxSize = 4))
    val writers = 6
    val perWriter = 3
    val ex = Executors.newFixedThreadPool(writers)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(ex)
    val work = (0 until writers).map { w =>
      Future {
        (0 until perWriter).foreach { i =>
          pool.update(s"INSERT INTO fl_conc_t VALUES (${w * 100 + i}, $w)")
          pool.query("SELECT COUNT(*) AS c FROM fl_conc_t") // interleaved reads
        }
      }
    }
    Await.result(Future.sequence(work), 3.minutes)
    ex.shutdown()
    val n = pool.query("SELECT COUNT(*) AS c FROM fl_conc_t").rows.head.getLong(0)
    assert(n == writers * perWriter,
      s"all ${writers}x$perWriter concurrent inserts must survive, saw $n")
    cat.drop("fl_conc_t")
  }

  test("concurrent pooled queries stay within the cap (pool.rs total accounting)") {
    val pool = newPool(PoolConfig(minIdle = 0, maxSize = 3, acquireTimeoutMs = 30000))
    val ex = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(ex)
    val results = Await.result(
      Future.sequence((1 to 16).map(i => Future(pool.query(s"SELECT $i AS v").rows.head.getInt(0)))),
      2.minutes)
    ex.shutdown()
    assert(results.sorted == (1 to 16).toList)
    assert(pool.totalConnections <= 3, s"pool grew past the cap: ${pool.totalConnections}")
  }
}
