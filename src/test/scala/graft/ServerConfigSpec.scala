package graft

import org.scalatest.funsuite.AnyFunSuite

/** ServerConfig::load() contract (swanlake-core/src/config.rs:14-113,
  * CONFIGURATION.md): defaults, SWANLAKE_* override precedence, parse
  * failures loud, zero-interval validation, session-id keying.
  */
class ServerConfigSpec extends AnyFunSuite {

  test("defaults match the reference's built-ins (config.rs:49-71)") {
    val c = ServerConfig.load(Map.empty)
    assert(c.host == "0.0.0.0" && c.port == 4214)
    assert(c.maxSessions == 100 && c.sessionTimeoutSeconds == 900L)
    assert(c.sessionIdMode == ServerConfig.PeerAddr)
    assert(c.logFormat == "compact")
    assert(c.statusEnabled && c.statusHost == "0.0.0.0" && c.statusPort == 4215)
    assert(c.statusPathPrefix.isEmpty)
    assert(c.metricsSlowQueryThresholdMs == 5000L && c.metricsHistorySize == 200)
    assert(c.checkpointIntervalHours.contains(24L) && c.checkpointPollSeconds.contains(300L))
    assert(c.ducklakeInitSql.isEmpty && c.duckdbThreads.isEmpty)
  }

  test("environment overrides defaults; empty values fall back") {
    val c = ServerConfig.load(Map(
      "SWANLAKE_PORT" -> "5000",
      "SWANLAKE_MAX_SESSIONS" -> "7",
      "SWANLAKE_SESSION_ID_MODE" -> "peer_ip",
      "SWANLAKE_STATUS_ENABLED" -> "FALSE",
      "SWANLAKE_STATUS_PATH_PREFIX" -> "/admin",
      "SWANLAKE_DUCKDB_THREADS" -> "8",
      "SWANLAKE_HOST" -> "")) // empty -> default, like an unset var
    assert(c.port == 5000 && c.maxSessions == 7)
    assert(c.sessionIdMode == ServerConfig.PeerIp)
    assert(!c.statusEnabled && c.statusPathPrefix == "/admin")
    assert(c.duckdbThreads.contains(8))
    assert(c.host == "0.0.0.0")
  }

  test("malformed values fail load() loudly, not silently") {
    intercept[IllegalArgumentException] {
      ServerConfig.load(Map("SWANLAKE_PORT" -> "not-a-port"))
    }
    intercept[IllegalArgumentException] {
      ServerConfig.load(Map("SWANLAKE_STATUS_ENABLED" -> "yes"))
    }
    intercept[IllegalArgumentException] {
      ServerConfig.load(Map("SWANLAKE_SESSION_ID_MODE" -> "hostname"))
    }
  }

  test("zero checkpoint intervals are rejected (config.rs:100-112)") {
    intercept[IllegalArgumentException] {
      ServerConfig.load(Map("SWANLAKE_CHECKPOINT_INTERVAL_HOURS" -> "0"))
    }
    intercept[IllegalArgumentException] {
      ServerConfig.load(Map("SWANLAKE_CHECKPOINT_POLL_SECONDS" -> "0"))
    }
    intercept[IllegalArgumentException] {
      ServerConfig.load(Map("SWANLAKE_LOG_FORMAT" -> "xml"))
    }
  }

  test("session keying: peer_addr keeps the port, peer_ip strips it") {
    val addr = ServerConfig.load(Map.empty)
    assert(addr.sessionKey("10.0.0.5:50312") == "10.0.0.5:50312")
    val ip = ServerConfig.load(Map("SWANLAKE_SESSION_ID_MODE" -> "peer_ip"))
    assert(ip.sessionKey("10.0.0.5:50312") == "10.0.0.5")
    assert(ip.sessionKey("no-port-form") == "no-port-form")
    // IPv6: bracketed forms unwrap to the host; a bare address has no
    // port — its last hextet must survive
    assert(ip.sessionKey("[fe80::1]:50312") == "fe80::1")
    assert(ip.sessionKey("[fe80::1]") == "fe80::1")
    assert(ip.sessionKey("fe80::1") == "fe80::1")
    assert(ip.sessionKey("2001:db8::8a2e:370:7334") == "2001:db8::8a2e:370:7334")
    assert(addr.sessionKey("[fe80::1]:50312") == "[fe80::1]:50312")
  }

  test("factories wire each option into its consumer") {
    val c = ServerConfig.load(Map(
      "SWANLAKE_METRICS_SLOW_QUERY_THRESHOLD_MS" -> "1234",
      "SWANLAKE_METRICS_HISTORY_SIZE" -> "11",
      "SWANLAKE_STATUS_ENABLED" -> "false"))
    val m = c.newMetrics()
    assert(m.slowQueryThresholdMillis == 1234L && m.ringCapacity == 11)
    // disabled status server starts nothing, mirroring the early return
    assert(c.startStatus(m, null).isEmpty)
  }
}
