package graft

import java.net.{HttpURLConnection, URL}

import scala.io.Source

/** The boot assembly (main.rs:17-126 minus the gRPC bind): every
  * component wired from one config, the status page live over HTTP,
  * queries served through the assembled Flight SQL facade, idle
  * cleanup reachable through the running registry, clean teardown.
  */
class ServerSpec extends SparkTestBase {

  test("boot assembles config-driven components, serves status + queries, shuts down") {
    val cfg = ServerConfig.load(Map(
      "SWANLAKE_MAX_SESSIONS" -> "5",
      "SWANLAKE_SESSION_TIMEOUT_SECONDS" -> "1",
      "SWANLAKE_STATUS_HOST" -> "127.0.0.1",
      "SWANLAKE_STATUS_PORT" -> "0", // ephemeral
      "SWANLAKE_STATUS_PATH_PREFIX" -> "/admin",
      "SWANLAKE_DUCKDB_THREADS" -> "4"))
    val running = Server.boot(cfg, sharedSpark = Some(spark))
    try {
      assert(running.registry.maxSessions == 5)
      assert(running.status.isDefined, "status server must start when enabled")

      // the status page answers over real HTTP under the configured prefix
      val port = running.status.get.boundPort
      val conn = new URL(s"http://127.0.0.1:$port/admin/status.json")
        .openConnection().asInstanceOf[HttpURLConnection]
      val body = Source.fromInputStream(conn.getInputStream).mkString
      assert(conn.getResponseCode == 200 && body.contains("\"sessions\""))

      // a query served through the assembled facade's client path
      val client = graft.flight.FlightSqlClient.connect(running.producer)
      val r = client.query("SELECT 21 * 2 AS answer")
      assert(r.rows.head.getInt(0) == 42)

      // idle cleanup is reachable on the running registry (1 s timeout)
      Thread.sleep(1200)
      assert(running.registry.cleanupIdle() >= 1, "the client session went idle")
    } finally running.shutdown()
    // teardown stopped the HTTP listener
    val dead = new URL(s"http://127.0.0.1:${running.status.get.boundPort}/healthz")
    intercept[Exception] {
      val c = dead.openConnection().asInstanceOf[HttpURLConnection]
      c.setConnectTimeout(500)
      c.getResponseCode
    }
  }
}
