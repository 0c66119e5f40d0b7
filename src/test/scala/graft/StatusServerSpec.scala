package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

class StatusServerSpec extends SparkTestBase {

  private def get(port: Int, path: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val resp = client.send(
      HttpRequest.newBuilder(new URI(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("prefix normalization matches the reference (status.rs:88-95)") {
    assert(StatusServer.normalizePrefix("") == "")
    assert(StatusServer.normalizePrefix("/") == "")
    assert(StatusServer.normalizePrefix("status") == "/status")
    assert(StatusServer.normalizePrefix("/status/") == "/status")
  }

  test("disabled start is a no-op returning None (status.rs:30-32)") {
    val m = new Metrics()
    val reg = new SessionRegistry(spark)
    assert(StatusServer.start(m, reg, enabled = false).isEmpty)
  }

  test("healthz, status page, and status.json served end-to-end (status.rs:43-47)") {
    val m = new Metrics(slowQueryThresholdMillis = 1)
    val reg = new SessionRegistry(spark, maxSessions = 7, idleTimeoutMillis = 600000)
    reg.getOrCreate("peer-a")
    m.record("SELECT 1", millis = 12, rowCount = 3)
    m.record("SELECT slow", millis = 50) // over the 1 ms slow threshold
    m.recordError("SELECT boom", "bad \"quote\" and\nnewline")
    val srv = StatusServer.start(m, reg, pathPrefix = "/admin").get
    try {
      val (hc, hb) = get(srv.boundPort, "/healthz")
      assert(hc == 200 && hb == "OK")

      val (pc, pb) = get(srv.boundPort, "/admin/")
      assert(pc == 200 && pb.contains("<html"))

      val (jc, jb) = get(srv.boundPort, "/admin/status.json")
      assert(jc == 200)
      // payload shape: StatusPayload (status.rs:18-23) + snapshots
      assert(jb.contains("\"generated_at_ms\""))
      assert(jb.contains("\"uptime_ms\""))
      assert(jb.contains("\"totals\":{\"queries\":2,\"errors\":1"))
      assert(jb.contains("\"total_sessions\":1"))
      assert(jb.contains("\"max_sessions\":7"))
      assert(jb.contains("\"session_timeout_seconds\":600"))
      assert(jb.contains("\"sql\":\"SELECT slow\""))
      // control characters escape cleanly in error messages
      assert(jb.contains("bad \\\"quote\\\" and\\nnewline"))

      val (nc, _) = get(srv.boundPort, "/admin/nope")
      assert(nc == 404)
    } finally srv.stop()
  }

  test("registry snapshot aggregates idle ages (registry.rs:36-42)") {
    val reg = new SessionRegistry(spark, maxSessions = 5, idleTimeoutMillis = 900000)
    val now = System.currentTimeMillis()
    val a = reg.getOrCreate("s1"); a.lastAccessMillis = now - 4000
    val b = reg.getOrCreate("s2"); b.lastAccessMillis = now - 2000
    val snap = reg.snapshot(now)
    assert(snap.totalSessions == 2)
    assert(snap.maxSessions == 5)
    assert(snap.sessionTimeoutSeconds == 900)
    assert(snap.oldestIdleMs == 4000)
    assert(snap.averageIdleMs == 3000)
  }
}
