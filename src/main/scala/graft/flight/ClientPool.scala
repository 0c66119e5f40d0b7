package graft.flight

import java.util.UUID
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.graft.ArrowWire
import org.apache.spark.sql.types.StructType

/** Client + connection pool over the Flight SQL producer — the
  * reference's `swanlake-client` (client.rs:29-173, pool.rs:95-490)
  * re-expressed over the in-proc facade: a "connection" is a pooled
  * server session (one peer id on the SessionRegistry), checked out
  * under a lock + condition variable, health-checked on error return,
  * and evicted after an idle TTL. The gRPC adapter swaps
  * `FlightSqlProducer` calls for wire RPCs without touching pool
  * semantics.
  *
  * Every result crosses the producer's byte boundary (tickets in,
  * Arrow IPC out) — the client decodes IPC streams exactly as the
  * reference's ADBC layer decodes record batches, so pooled queries
  * exercise the full wire path.
  */
object ClientPool {

  /** Decoded result set (client.rs QueryResult:45-98). */
  final case class QueryResult(schema: StructType, rows: Array[Row]) {
    def totalRows: Int = rows.length
    def isEmpty: Boolean = rows.isEmpty
  }

  /** Update/DDL outcome (client.rs UpdateResult:104-107). */
  final case class UpdateResult(rowsAffected: Long)

  /** Pool knobs (pool.rs PoolConfig:22-66). Defaults mirror the
    * reference: max = 2x cores clamped to [4, 16], one warm idle
    * connection, 30 s acquire timeout, 5 min idle TTL.
    */
  final case class PoolConfig(
      minIdle: Int = 1,
      maxSize: Int = PoolConfig.defaultMaxSize,
      acquireTimeoutMs: Long = 30000,
      idleTtlMs: Long = 300000,
      healthcheckSql: String = "SELECT 1",
      retryOnFailure: Boolean = true) {
    def validate(): Unit = {
      require(maxSize > 0, "PoolConfig.maxSize must be greater than 0")
      require(minIdle <= maxSize, s"PoolConfig.minIdle ($minIdle) exceeds maxSize ($maxSize)")
    }
  }

  object PoolConfig {
    def defaultMaxSize: Int =
      math.min(16, math.max(4, Runtime.getRuntime.availableProcessors() * 2))
  }

  /** Per-call overrides (pool.rs QueryOptions:70-93). */
  final case class QueryOptions(retryOnFailure: Option[Boolean] = None)
}

/** What a SQL shell needs from a connection — implemented by the
  * in-proc [[FlightSqlClient]] and by the remote HTTP client
  * (graft.HttpSqlClient over the SQL gateway), so graft.Cli drives
  * either transport through one interface.
  */
trait SqlConnection {
  def query(sql: String): ClientPool.QueryResult
  def update(sql: String): ClientPool.UpdateResult
  def disconnect(): Unit
}

/** One logical connection: a peer session on the producer
  * (client.rs FlightSQLClient). `connect` health-checks like the
  * reference's constructor (client.rs:122-128).
  */
final class FlightSqlClient private (val producer: FlightSqlProducer, val peer: String)
    extends SqlConnection {
  import ClientPool._

  private def spark = producer.registry.getOrCreate(peer).spark

  /** Execute a query over the full ticket + IPC path. */
  def query(sql: String): QueryResult = {
    val info = producer.getFlightInfoStatement(peer, sql)
    val df = ArrowWire.fromIpcStream(spark, producer.doGet(peer, info.ticket))
    QueryResult(df.schema, df.collect())
  }

  /** Alias of `query` — the server accepts commands via ExecuteQuery
    * (client.rs:140-142).
    */
  def execute(sql: String): QueryResult = query(sql)

  def update(sql: String): UpdateResult =
    UpdateResult(producer.doPutStatementUpdate(peer, sql))

  /** Parameterized query via the prepared-statement RPC sequence:
    * create, bind a one-row Arrow batch, execute, close
    * (client.rs query_with_param / prepared.rs).
    */
  def queryWithParams(sql: String, params: Row, paramSchema: StructType): QueryResult = {
    val prep = producer.createPreparedStatement(peer, sql)
    try {
      val paramsDf = spark.createDataFrame(java.util.List.of(params), paramSchema)
      producer.doPutPreparedStatementQuery(peer, prep.handle, ArrowWire.toIpcStream(paramsDf))
      val info = producer.getFlightInfoPreparedStatement(peer, prep.handle)
      val df = ArrowWire.fromIpcStream(spark, producer.doGet(peer, info.ticket))
      QueryResult(df.schema, df.collect())
    } finally producer.closePreparedStatement(peer, prep.handle)
  }

  /** Multi-row parameterized update via the prepared DoPut path
    * (internal execute_update_with_batch, exercised by
    * integration_async_pool.rs:72-92): the whole parameter batch rides
    * as ONE Arrow IPC stream, so resolvable INSERTs hit the server's
    * appender fast path.
    */
  def updateWithBatch(sql: String, rows: Seq[Row], schema: StructType): UpdateResult = {
    val prep = producer.createPreparedStatement(peer, sql)
    try {
      import scala.jdk.CollectionConverters._
      val df = spark.createDataFrame(rows.asJava, schema)
      UpdateResult(producer.doPutPreparedStatementUpdate(peer, prep.handle,
        ArrowWire.toIpcStream(df)))
    } finally producer.closePreparedStatement(peer, prep.handle)
  }

  def healthcheck(sql: String): Boolean =
    sql.trim.isEmpty || (try { query(sql); true } catch { case _: Throwable => false })

  /** Tear down the server session (the reference drops the TCP conn). */
  def disconnect(): Unit = producer.registry.remove(peer)
}

object FlightSqlClient {
  def connect(producer: FlightSqlProducer, peer: String = s"client-${UUID.randomUUID()}",
      healthcheckSql: String = "SELECT 1"): FlightSqlClient = {
    producer.handshake(peer, 1L)
    val c = new FlightSqlClient(producer, peer)
    if (!c.healthcheck(healthcheckSql)) {
      // don't leak the handshake's server session (r19 review: the
      // registry is capped, but each failed connect held a seat until
      // idle eviction)
      try producer.registry.remove(peer) catch { case _: Throwable => () }
      throw new IllegalArgumentException(
        s"requirement failed: connect healthcheck failed for $peer")
    }
    c
  }
}

/** Synchronous connection pool (pool.rs FlightSQLPool:360-490 +
  * PoolInner:95-235): idle stack under one lock, condition-variable
  * waits with a deadline, TTL eviction on every acquire/release, and
  * the retry-once-on-unhealthy-connection loop for pooled queries.
  */
final class FlightSqlPool(producer: FlightSqlProducer,
    val config: ClientPool.PoolConfig = ClientPool.PoolConfig()) {
  import ClientPool._

  config.validate()

  private final class Idle(val client: FlightSqlClient, var lastUsedMs: Long)

  private val lock = new Object
  private val idle = mutable.ArrayBuffer.empty[Idle]
  private val total = new AtomicInteger()
  private val seq = new AtomicLong()

  // warm the pool to minIdle (pool.rs:117-133)
  locally {
    val warm = (0 until config.minIdle).map(_ => newClient())
    lock.synchronized {
      warm.foreach { c =>
        total.incrementAndGet()
        idle += new Idle(c, System.currentTimeMillis())
      }
    }
  }

  // connection creation is NOT gated on the configured healthcheck —
  // the reference's pool calls driver.new_connection directly
  // (pool.rs:138-139) and only the client constructor probes with the
  // fixed "SELECT 1" (client.rs:122-128); the configured healthcheck
  // runs solely on error-return (release_connection:196-215)
  private def newClient(): FlightSqlClient =
    FlightSqlClient.connect(producer,
      peer = s"pool-${seq.incrementAndGet()}-${UUID.randomUUID().toString.take(8)}")

  def totalConnections: Int = total.get()
  def idleConnections: Int = lock.synchronized(idle.size)

  private def evictIdleLocked(now: Long): Unit = {
    val (stale, fresh) = idle.partition(i => now - i.lastUsedMs > config.idleTtlMs)
    if (stale.nonEmpty) {
      idle.clear(); idle ++= fresh
      stale.foreach { i => i.client.disconnect(); total.decrementAndGet() }
    }
  }

  /** Check out a connection, creating below the cap, else waiting until
    * the deadline (pool.rs acquire_connection:142-194). No early returns
    * inside the synchronized block: `return` there compiles to a
    * NonLocalReturnControl throwable that a `catch Throwable` would
    * swallow.
    */
  def acquire(): FlightSqlClient = {
    val deadline = System.currentTimeMillis() + config.acquireTimeoutMs
    while (true) {
      var mustCreate = false
      // the lock covers only the COUNT reservation and idle-list pop;
      // connection creation runs OUTSIDE it (review catch: newClient's
      // constructor healthcheck plans and executes a real query, and
      // holding the monitor through it serialized every acquire AND
      // release behind connection creation exactly under burst load —
      // the reservation keeps the count/create pairing safe instead)
      val fromIdle: FlightSqlClient = lock.synchronized {
        evictIdleLocked(System.currentTimeMillis())
        if (idle.nonEmpty) idle.remove(idle.size - 1).client
        else if (total.get() < config.maxSize) {
          total.incrementAndGet(); mustCreate = true; null
        } else {
          val remaining = deadline - System.currentTimeMillis()
          if (remaining <= 0) throw new IllegalStateException(
            s"timed out waiting for pool connection (maxSize=${config.maxSize}, " +
              s"acquireTimeoutMs=${config.acquireTimeoutMs})")
          lock.wait(remaining)
          null // woke: re-check idle/cap on the next loop pass
        }
      }
      if (fromIdle != null) return fromIdle
      if (mustCreate)
        return try newClient()
        catch {
          case t: Throwable =>
            // release the reservation AND wake a waiter that may now
            // be allowed to create in our place
            total.decrementAndGet()
            lock.synchronized(lock.notify())
            throw t
        }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Return a connection; after an error it must pass the healthcheck
    * or be dropped (pool.rs release_connection:196-215).
    *
    * State hygiene (r19 review): a connection returned with an OPEN
    * transaction must not leak it into the pool — the next borrower
    * would stage its DML into a transaction nobody will ever commit
    * (an exclusive [[PooledSession]] that began-but-never-ended, or a
    * pooled `update("BEGIN")`). Roll it back here, the reference's
    * SessionHandle-drop semantics; a failed rollback marks the
    * connection suspect so the healthcheck-or-drop path decides.
    */
  def release(client: FlightSqlClient, hadError: Boolean = false): Unit = {
    var suspect = hadError
    // probe with get, NOT getOrCreate (r19 review): a reaped session
    // must not be re-created just to read a flag — and at the registry
    // cap getOrCreate THROWS, which would falsely mark a healthy
    // connection suspect. A missing session trivially has no open
    // transaction. rollback() clears the txn state even when the
    // catalog's staged cleanup throws (Session.rollback's try/finally),
    // so a throw here means a cleanup failure on an already-ended txn —
    // flag it and let the healthcheck-or-drop path decide.
    client.producer.registry.get(client.peer).foreach { s =>
      if (s.inTransaction) {
        try s.rollback() catch { case _: Throwable => suspect = true }
      }
    }
    if (suspect && !client.healthcheck(config.healthcheckSql)) {
      client.disconnect()
      total.decrementAndGet()
      lock.synchronized(lock.notify())
      return
    }
    lock.synchronized {
      evictIdleLocked(System.currentTimeMillis())
      idle += new Idle(client, System.currentTimeMillis())
      lock.notify()
    }
  }

  /** Run `f` on a pooled connection, returning it on completion and
    * marking it suspect on error (the RAII PooledConnection analogue,
    * pool.rs:241-278).
    */
  def withConnection[T](f: FlightSqlClient => T): T = {
    val c = acquire()
    var hadError = false
    try f(c)
    catch { case t: Throwable => hadError = true; throw t }
    finally release(c, hadError)
  }

  /** Pooled query with the retry-once-on-dead-connection loop
    * (pool.rs query_with_param_and_options:425-465): a first failure
    * health-checks the connection; only an UNHEALTHY connection is
    * replaced and the query retried — a healthy connection means the
    * query itself is bad, which propagates.
    */
  def query(sql: String, opts: QueryOptions = QueryOptions()): QueryResult = {
    val retryEnabled = opts.retryOnFailure.getOrElse(config.retryOnFailure)
    var pooled = acquire()
    var attempt = 0
    var out: QueryResult = null
    while (out == null) {
      attempt += 1
      try {
        out = pooled.query(sql)
        release(pooled)
      } catch {
        case t: Throwable =>
          if (retryEnabled && attempt == 1 && !pooled.healthcheck(config.healthcheckSql)) {
            pooled.disconnect()
            total.decrementAndGet()
            lock.synchronized(lock.notify())
            pooled = acquire()
          } else {
            release(pooled, hadError = true)
            throw t
          }
      }
    }
    out
  }

  def execute(sql: String): QueryResult = query(sql)

  def update(sql: String): UpdateResult = withConnection(_.update(sql))

  def queryWithParams(sql: String, params: Row, paramSchema: StructType): QueryResult =
    withConnection(_.queryWithParams(sql, params, paramSchema))

  def updateWithBatch(sql: String, rows: Seq[Row], schema: StructType): UpdateResult =
    withConnection(_.updateWithBatch(sql, rows, schema))

  /** Exclusive session for stateful workflows — transactions, temp
    * views, session-lifetime prepared statements (pool.rs
    * SessionHandle:281-326). Close to return the connection.
    */
  def acquireSession(): PooledSession = new PooledSession(this, acquire())
}

/** Exclusive checked-out session (pool.rs SessionHandle). */
final class PooledSession(pool: FlightSqlPool, client: FlightSqlClient) extends AutoCloseable {
  import ClientPool._

  private var hadError = false
  private var closed = false

  private def guard[T](f: => T): T =
    try f catch { case t: Throwable => hadError = true; throw t }

  def query(sql: String): QueryResult = guard(client.query(sql))
  def update(sql: String): UpdateResult = guard(client.update(sql))
  def queryWithParams(sql: String, params: Row, paramSchema: StructType): QueryResult =
    guard(client.queryWithParams(sql, params, paramSchema))

  def beginTransaction(): Array[Byte] = guard(client.producer.beginTransaction(client.peer))
  def commit(txnId: Array[Byte]): Unit = guard(client.producer.endTransaction(client.peer, txnId, commit = true))
  def rollback(txnId: Array[Byte]): Unit = guard(client.producer.endTransaction(client.peer, txnId, commit = false))

  /** The underlying client, for RPCs not wrapped here (client.rs
    * connection()).
    */
  def connection: FlightSqlClient = client

  override def close(): Unit = if (!closed) { closed = true; pool.release(client, hadError) }
}
