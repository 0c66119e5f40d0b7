package graft.flight

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Async pool over the in-proc producer — mirrors the reference's
  * async-pool integration suite
  * (swanlake-client/tests/integration_async_pool.rs) case for case,
  * minus the gRPC endpoint.
  */
class AsyncClientPoolSpec extends SparkTestBase {
  import ClientPool._

  private val ex = Executors.newFixedThreadPool(8)
  private implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(ex)

  override def afterAll(): Unit = {
    ex.shutdown()
    super.afterAll()
  }

  private def newPool(config: PoolConfig = PoolConfig()) =
    new AsyncFlightSqlPool(new FlightSqlProducer(new SessionRegistry(spark)), config)

  test("concurrent queries + stateful session + param query (integration_async_pool_usage)") {
    val pool = newPool()
    // two queries in flight concurrently (tokio::try_join!)
    val (q1, q2) = Await.result(
      pool.query("SELECT 1").zip(pool.query("SELECT 2")), 2.minutes)
    assert(q1.totalRows == 1 && q2.totalRows == 1)

    // session: begin, DDL, probe, commit
    val session = Await.result(pool.acquireSession(), 2.minutes)
    try {
      val txn = Await.result(session.beginTransaction(), 2.minutes)
      Await.result(session.update(
        "CREATE OR REPLACE TEMP VIEW async_tmp AS SELECT 1 AS id"), 2.minutes)
      val probe = Await.result(session.query("SELECT 1 AS one"), 2.minutes)
      assert(probe.totalRows == 1)
      Await.result(session.commit(txn), 2.minutes)
    } finally session.close()

    val param = Await.result(pool.queryWithParams("SELECT ? AS val",
      Row(5), StructType(Seq(StructField("1", IntegerType)))), 2.minutes)
    assert(param.totalRows == 1 && param.rows.head.getInt(0) == 5)
  }

  test("multi-row parameter batch appends every row (integration_async_pool_multi_row_params)") {
    val pool = newPool()
    spark.sql("DROP TABLE IF EXISTS async_mr_t")
    Await.result(pool.update("CREATE TABLE async_mr_t (val INTEGER) USING parquet"), 2.minutes)
    val upd = Await.result(pool.updateWithBatch(
      "INSERT INTO async_mr_t VALUES (?)",
      Seq(Row(4), Row(5), Row(6)),
      StructType(Seq(StructField("1", IntegerType)))), 2.minutes)
    assert(upd.rowsAffected == 3L, s"appender must report 3 rows, got ${upd.rowsAffected}")
    val count = Await.result(pool.query("SELECT COUNT(*) AS c FROM async_mr_t"), 2.minutes)
    assert(count.rows.head.getLong(0) == 3L)
    Await.result(pool.update("DROP TABLE async_mr_t"), 2.minutes)
  }

  test("error propagation through query and update futures (usage_examples_cover_async_apis)") {
    val pool = newPool(PoolConfig(minIdle = 0, maxSize = 4, idleTtlMs = 1))
    assert(Await.result(pool.execute("SELECT 10"), 2.minutes).totalRows == 1)
    val opts = QueryOptions(retryOnFailure = Some(false))
    assert(Await.result(pool.query("SELECT 11", opts), 2.minutes).totalRows == 1)
    val p = Await.result(pool.queryWithParams("SELECT ? + 1 AS val",
      Row(10), StructType(Seq(StructField("1", IntegerType)))), 2.minutes)
    assert(p.rows.head.getInt(0) == 11)
    // errors surface as failed futures, not hangs
    intercept[Throwable](Await.result(
      pool.query("SELECT * FROM __missing_async_usage_table__", opts), 2.minutes))
    intercept[Throwable](Await.result(
      pool.update("INSERT INTO __missing_async_usage_table__ VALUES (1)"), 2.minutes))
    // and the pool still serves healthy work afterwards
    assert(Await.result(pool.query("SELECT 12"), 2.minutes).totalRows == 1)
  }

  test("acquire times out when exhausted (integration_async_pool_acquire_timeout_when_exhausted)") {
    val pool = newPool(PoolConfig(minIdle = 0, maxSize = 1, acquireTimeoutMs = 20))
    val held = Await.result(pool.acquireSession(), 2.minutes)
    val t0 = System.currentTimeMillis()
    val err = intercept[IllegalStateException](
      Await.result(pool.acquireSession(), 2.minutes))
    assert(err.getMessage.contains("timed out waiting for pool connection"))
    assert(System.currentTimeMillis() - t0 >= 20)
    held.close()
  }

  test("retry path drops unhealthy connections (integration_async_pool_retry_path)") {
    // broken healthcheck SQL: any errored connection is judged unhealthy
    // and dropped; creation is NOT healthcheck-gated (pool.rs:138-139)
    val pool = newPool(PoolConfig(minIdle = 0, maxSize = 1, acquireTimeoutMs = 500,
      healthcheckSql = "SELECT * FROM __missing_async_healthcheck_table__"))
    val err = intercept[Throwable](Await.result(
      pool.query("SELECT * FROM __missing_async_retry_query_table__"), 2.minutes))
    assert(err.getMessage.contains("__missing_async_retry_query_table__") ||
      err.getMessage.toLowerCase.contains("table"))
    assert(pool.totalConnections == 0,
      "both the errored and the retry connection must have been dropped")
    val healthy = Await.result(pool.query("SELECT 1 AS ok"), 2.minutes)
    assert(healthy.totalRows == 1)
  }
}
