package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.Row

/** SQL-over-HTTP query transport — the socket clients connect to while
  * the Arrow Flight gRPC bind stays jar-blocked (STATUS.md). Stands
  * where the reference's tonic `FlightServiceServer` listens
  * (swanlake-server/src/main.rs:16-126): same host/port config, same
  * per-peer session keying, same engine underneath — a different wire.
  *
  *   - `POST {prefix}/sql` — body is the SQL text. Responses:
  *       `Accept: application/vnd.apache.arrow.stream` → the SAME Arrow
  *       IPC stream bytes a Flight DoGet would carry (ArrowWire);
  *       anything else → `{"columns": [...], "rows": [[...]], "row_count"}`.
  *   - Session affinity: `X-Graft-Session: <key>` pins a session
  *     explicitly (BEGIN/COMMIT across requests); otherwise the peer
  *     address is keyed through the configured `SWANLAKE_SESSION_ID_MODE`,
  *     exactly like the Flight facade.
  *   - Errors map through [[ErrorMapping]] to HTTP statuses:
  *     InvalidArgument→400, NotFound→404, AlreadyExists/FailedPrecondition→409,
  *     ResourceExhausted→429, Internal→500, as `{"error", "status"}`.
  *
  * Metrics are recorded per request (the reference's service layer does
  * the same around each RPC). Dispatch runs on a small thread pool —
  * queries are long compared to status traffic, and the engine's
  * session registry is already concurrent.
  */
final class SqlGateway private (
    server: HttpServer,
    pool: java.util.concurrent.ExecutorService) {

  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = { server.stop(0); pool.shutdown() }
}

object SqlGateway {

  val arrowContentType = "application/vnd.apache.arrow.stream"

  def start(
      registry: SessionRegistry,
      metrics: Metrics,
      sessionKey: String => String,
      host: String = "127.0.0.1",
      port: Int = 0,
      pathPrefix: String = ""): SqlGateway = {
    val prefix = StatusServer.normalizePrefix(pathPrefix)
    val server = HttpServer.create(new InetSocketAddress(host, port), 0)
    server.createContext(s"$prefix/sql", (ex: HttpExchange) => handle(ex, registry, metrics, sessionKey))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8, r => {
      val t = new Thread(r, "graft-sql-gateway"); t.setDaemon(true); t
    })
    server.setExecutor(pool)
    server.start()
    new SqlGateway(server, pool)
  }

  private def handle(ex: HttpExchange, registry: SessionRegistry,
      metrics: Metrics, sessionKey: String => String): Unit = {
    if (ex.getRequestMethod != "POST") {
      respond(ex, 405, "application/json",
        """{"error":"POST a SQL string to this endpoint","status":"INVALID_ARGUMENT"}"""
          .getBytes(StandardCharsets.UTF_8))
      return
    }
    val sql = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8).trim
    val peer = Option(ex.getRequestHeaders.getFirst("X-Graft-Session"))
      .filter(_.nonEmpty)
      .getOrElse(sessionKey(ex.getRemoteAddress.toString.stripPrefix("/")))
    val wantArrow = Option(ex.getRequestHeaders.getFirst("Accept"))
      .exists(_.contains(arrowContentType))
    val t0 = System.nanoTime()
    // once the chunked 200 status line is on the wire, an error can no
    // longer change the HTTP status — it surfaces as a truncated IPC
    // stream (exactly what a Flight client sees when a DoGet stream
    // dies mid-flight); the catch below must not try to re-respond
    var headersSent = false
    try {
      val df = registry.getOrCreate(peer).sql(sql)
      if (wantArrow) {
        // STREAMED wire (SURVEY §6, VERDICT r13 #3): Arrow IPC frames go
        // out with chunked transfer as the prepared stream pulls result
        // partitions — server memory is bounded by one wave + one batch,
        // never the whole result. prepareIpcStream forces planning AND
        // the first wave BEFORE the status line, so analysis errors and
        // most runtime failures (missing file, ANSI cast, div-by-zero)
        // still map to HTTP statuses instead of a broken 200 body.
        val write = org.apache.spark.sql.graft.ArrowWire.prepareIpcStream(df)
        ex.getResponseHeaders.set("Content-Type", arrowContentType)
        ex.sendResponseHeaders(200, 0) // length 0 = chunked transfer
        headersSent = true
        val os = ex.getResponseBody
        try write(os)
        finally os.close()
        // IPC stream length is not a row count; record rows from the
        // collected frame only on the JSON path — Arrow clients read
        // the count from the stream itself
        metrics.record(sql, (System.nanoTime() - t0) / 1000000)
      } else {
        val rows = df.collect()
        metrics.record(sql, (System.nanoTime() - t0) / 1000000, rows.length.toLong)
        respond(ex, 200, "application/json",
          jsonResult(df.schema.fieldNames, rows).getBytes(StandardCharsets.UTF_8))
      }
    } catch {
      case t: Throwable if headersSent =>
        // mid-stream failure after the 200 went out: the body ends
        // WITHOUT the Arrow end-of-stream marker (the writer seals only
        // complete streams), which ArrowWire.readIpc rejects — the
        // missing seal IS the error signal; just record and close
        metrics.recordError(sql, Option(t.getMessage).getOrElse(t.getClass.getName))
        ex.close()
      case t: Throwable =>
        metrics.recordError(sql, Option(t.getMessage).getOrElse(t.getClass.getName))
        val status = ErrorMapping.classify(t)
        val http = status match {
          case ErrorMapping.InvalidArgument    => 400
          case ErrorMapping.NotFound           => 404
          case ErrorMapping.AlreadyExists      => 409
          case ErrorMapping.FailedPrecondition => 409
          case ErrorMapping.ResourceExhausted  => 429
          case _                               => 500
        }
        // gRPC-style status names (INVALID_ARGUMENT …): what a Flight
        // client would see for the same ErrorMapping classification
        val name = status.getClass.getSimpleName.stripSuffix("$")
          .replaceAll("([a-z])([A-Z])", "$1_$2").toUpperCase
        respond(ex, http, "application/json",
          s"""{"error":${jstr(Option(t.getMessage).getOrElse(t.toString))},"status":${jstr(name)}}"""
            .getBytes(StandardCharsets.UTF_8))
    }
  }

  private def respond(ex: HttpExchange, code: Int, ctype: String, body: Array[Byte]): Unit = {
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(code, if (body.isEmpty) -1L else body.length.toLong)
    val os = ex.getResponseBody
    try os.write(body) finally os.close()
  }

  // --- hand-rolled JSON result writer (the StatusServer house style:
  // no web framework on the executor classpath) ---

  private def jsonResult(columns: Array[String], rows: Array[Row]): String = {
    val sb = new StringBuilder(256)
    sb.append("{\"columns\":[")
    sb.append(columns.map(jstr).mkString(","))
    sb.append("],\"rows\":[")
    var first = true
    rows.foreach { r =>
      if (!first) sb.append(','); first = false
      sb.append('[')
      var i = 0
      while (i < r.length) {
        if (i > 0) sb.append(',')
        sb.append(jval(r.get(i)))
        i += 1
      }
      sb.append(']')
    }
    sb.append("],\"row_count\":").append(rows.length).append('}')
    sb.toString
  }

  private def jval(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Float =>
      if (n.isNaN || n.isInfinite) jstr(n.toString) else n.toString
    case n: Double =>
      if (n.isNaN || n.isInfinite) jstr(n.toString) else n.toString
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.underlying.toPlainString
    case b: Array[Byte] => jstr(java.util.Base64.getEncoder.encodeToString(b))
    case s: collection.Seq[_] => s.map(jval).mkString("[", ",", "]")
    case m: collection.Map[_, _] =>
      m.map { case (k, mv) => s"${jstr(String.valueOf(k))}:${jval(mv)}" }
        .mkString("{", ",", "}")
    case r: Row =>
      r.toSeq.zipWithIndex.map { case (fv, i) =>
        val name = if (r.schema != null) r.schema.fieldNames(i) else s"_$i"
        s"${jstr(name)}:${jval(fv)}"
      }.mkString("{", ",", "}")
    case other => jstr(other.toString) // dates, timestamps, strings, intervals
  }

  private[graft] def jstr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
}
