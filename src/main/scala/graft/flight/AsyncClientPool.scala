package graft.flight

import scala.concurrent.{blocking, ExecutionContext, Future}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Asynchronous connection pool — the reference's `AsyncFlightSQLPool`
  * (swanlake-client/src/async_pool.rs) re-expressed with Scala
  * `Future`s over the in-proc facade.
  *
  * Architecture mirrors the reference's layering: the async pool does
  * NOT duplicate the pool state machine — async_pool.rs shares
  * `PoolState`/`evict_idle` with the sync pool via pool_shared.rs and
  * adds a scheduling layer (tokio semaphore + spawn_blocking). Here the
  * shared state machine IS [[FlightSqlPool]] (idle stack, cap,
  * deadline-bounded acquire, TTL eviction, healthcheck-on-error-return,
  * retry-once-on-unhealthy), and the async layer runs every blocking
  * section on the `ExecutionContext` under a `blocking` marker — the
  * JVM analogue of `tokio::task::spawn_blocking`
  * (async_pool.rs:60-66,171-199).
  *
  * Semantics preserved from the reference:
  *  - acquire waits at most `acquireTimeoutMs` and fails with the
  *    "timed out waiting for pool connection" message
  *    (async_pool.rs:68-87);
  *  - connection creation is not gated on the configured healthcheck
  *    (async_pool.rs:60-66) — that runs only when a connection returns
  *    from an errored call;
  *  - an errored connection is health-checked and dropped if unhealthy;
  *    pooled `query` retries ONCE on a fresh connection only when the
  *    old one was unhealthy (pool.rs:425-465, shared path);
  *  - `acquireSession` hands out an exclusive session for stateful
  *    workflows — transactions, temp views (AsyncSessionHandle,
  *    async_pool.rs:228-268).
  */
final class AsyncFlightSqlPool(producer: FlightSqlProducer,
    val config: ClientPool.PoolConfig = ClientPool.PoolConfig())(
    implicit ec: ExecutionContext) {
  import ClientPool._

  private val inner = new FlightSqlPool(producer, config)

  def totalConnections: Int = inner.totalConnections
  def idleConnections: Int = inner.idleConnections

  /** Check out a connection asynchronously; the deadline wait runs on a
    * blocking-marked pool thread (async_pool.rs acquire_connection).
    */
  def acquire(): Future[FlightSqlClient] = Future(blocking(inner.acquire()))

  /** Run `f` on a pooled connection — the RAII `AsyncPooledConnection`
    * analogue: release on success, healthcheck-or-drop on error
    * (async_pool.rs:149-226).
    */
  def withConnection[T](f: FlightSqlClient => T): Future[T] =
    acquire().map { c =>
      var hadError = false
      try blocking(f(c))
      catch { case t: Throwable => hadError = true; throw t }
      finally inner.release(c, hadError)
    }

  /** Pooled query with the retry-once-on-dead-connection loop
    * (async_pool.rs query → shared pool.rs:425-465 semantics).
    */
  def query(sql: String, opts: QueryOptions = QueryOptions()): Future[QueryResult] =
    Future(blocking(inner.query(sql, opts)))

  /** Alias of `query` (client.rs execute). */
  def execute(sql: String): Future[QueryResult] = query(sql)

  def update(sql: String): Future[UpdateResult] =
    Future(blocking(inner.update(sql)))

  def queryWithParams(sql: String, params: Row, paramSchema: StructType): Future[QueryResult] =
    Future(blocking(inner.queryWithParams(sql, params, paramSchema)))

  /** Multi-row parameterized update — the reference's
    * `update_with_record_batch` (async_pool.rs:311-323): the whole
    * batch DoPuts in one IPC stream, hitting the server's appender
    * fast path for resolvable INSERTs.
    */
  def updateWithBatch(sql: String, rows: Seq[Row], schema: StructType): Future[UpdateResult] =
    Future(blocking(inner.updateWithBatch(sql, rows, schema)))

  /** Exclusive async session (AsyncSessionHandle, async_pool.rs:228-268). */
  def acquireSession(): Future[AsyncPooledSession] =
    acquire().map(c => new AsyncPooledSession(inner, c))
}

/** Async wrapper over an exclusively checked-out session — every call
  * runs on the execution context under a blocking marker
  * (AsyncSessionHandle, async_pool.rs:228-268).
  */
final class AsyncPooledSession private[flight] (pool: FlightSqlPool,
    client: FlightSqlClient)(implicit ec: ExecutionContext) extends AutoCloseable {
  import ClientPool._

  private val session = new PooledSession(pool, client)

  def query(sql: String): Future[QueryResult] = Future(blocking(session.query(sql)))
  def update(sql: String): Future[UpdateResult] = Future(blocking(session.update(sql)))
  def queryWithParams(sql: String, params: Row, paramSchema: StructType): Future[QueryResult] =
    Future(blocking(session.queryWithParams(sql, params, paramSchema)))

  def beginTransaction(): Future[Array[Byte]] = Future(blocking(session.beginTransaction()))
  def commit(txnId: Array[Byte]): Future[Unit] = Future(blocking(session.commit(txnId)))
  def rollback(txnId: Array[Byte]): Future[Unit] = Future(blocking(session.rollback(txnId)))

  def connection: FlightSqlClient = session.connection

  override def close(): Unit = session.close()
}
