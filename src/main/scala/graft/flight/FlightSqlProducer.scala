package graft.flight

import java.nio.charset.StandardCharsets

import graft._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.ArrowWire

/** Flight SQL producer facade — the reference's `FlightSqlService`
  * handler layer (swanlake-core/src/service/handlers/mod.rs:29-323)
  * re-expressed transport-agnostically: every RPC is a method over
  * bytes (tickets in, Arrow IPC streams out), so a gRPC layer — absent
  * here because no arrow-flight/tonic jars ship in the offline build —
  * is a thin framing adapter: each tonic handler unwraps its prost
  * command and delegates 1:1 to the method of the same name.
  *
  * Deviation, documented: the reference's metadata tickets wrap prost
  * `Command*` messages in a protobuf `Any` (metadata.rs); this facade
  * namespaces them into the statement ticket's handle field
  * (`meta:<kind>[:<arg>]`) so the offline build needs no protobuf Any.
  * The adapter translates ticket payloads at the framing boundary.
  *
  * Scale note: `doGet` returns one materialized IPC byte array because
  * the in-proc consumer is the test harness; the underlying writer
  * (`ArrowWire.writeIpcStream`) is incremental — the SQL gateway wires
  * the SAME frames to chunked HTTP transfer, bounding server memory by
  * one partition + one batch, and a gRPC adapter would emit them as
  * individual FlightData messages the same way.
  */
final class FlightSqlProducer(
    val registry: SessionRegistry,
    val metrics: Option[Metrics] = None,
    sessionKey: String => String = identity) {

  /** A wire error: Flight status code (ErrorMapping, mod.rs:153-325)
    * plus message — what the gRPC adapter turns into `tonic::Status`.
    */
  final case class FlightStatusException(code: Int, message: String)
    extends RuntimeException(message)

  final case class Endpoint(ticket: Array[Byte])

  /** GetFlightInfo answer: IPC-encoded result schema + one endpoint
    * whose ticket DoGet accepts (statement.rs:74-92).
    */
  final case class Info(schemaIpc: Array[Byte], endpoints: Seq[Endpoint]) {
    def ticket: Array[Byte] = endpoints.head.ticket
  }

  private def wrap[A](f: => A): A =
    try f catch {
      case fs: FlightStatusException => throw fs
      case t: Throwable =>
        throw FlightStatusException(ErrorMapping.classify(t).code,
          Option(t.getMessage).getOrElse(t.getClass.getSimpleName))
    }

  // SWANLAKE_SESSION_ID_MODE keying (ServerConfig.sessionKey): peer_ip
  // collapses a host's connections onto one session; default identity
  private def session(peer: String): Session = wrap(registry.getOrCreate(sessionKey(peer)))

  /** Time + record an execution through the metrics rings when wired
    * (main.rs:55-63 hands the service its Metrics; the reference
    * records per-RPC latency/errors the same way).
    */
  private def measured[A](label: String)(f: => A): A = metrics match {
    case Some(m) => m.timed(label)(f)
    case None => f
  }

  private def schemaIpcOf(df: DataFrame): Array[Byte] =
    ArrowWire.toIpcStream(df.limit(0))

  // === handshake (mod.rs:33-58) ============================================
  /** No-auth handshake: echo the client's protocol version, empty
    * payload; materializes the peer's session as a side effect.
    */
  def handshake(peer: String, protocolVersion: Long): (Long, Array[Byte]) = {
    session(peer)
    (protocolVersion, Array.empty[Byte])
  }

  // === ad-hoc statements (statement.rs:24-162) =============================
  /** Plan a statement: schema for queries, empty schema for commands;
    * ticket is an EPHEMERAL statement ticket carrying the SQL.
    */
  def getFlightInfoStatement(peer: String, sql: String): Info = wrap {
    val s = session(peer)
    val clean = SqlShim.stripSelectLocks(sql)
    val multi = SqlShim.statementCount(clean) > 1
    var returnsRows = SqlShim.isQuery(clean)
    val schema: Option[DataFrame] =
      if (!multi && returnsRows) {
        s.ensureCatalogViews() // micro-lake tables resolve in this session
        // metadata views must exist BEFORE the eager analyze (review
        // catch: Session.sql registers them, but GetFlightInfo precedes
        // any DoGet on a fresh session — an info-schema query failed
        // here with TABLE_OR_VIEW_NOT_FOUND while executing fine later)
        if (InfoSchema.referencesInfoSchema(clean)) InfoSchema.register(s.spark)
        val df = s.spark.sql(InfoSchema.rewriteInfoSchema(SqlShim.rewritePragma(clean)))
        returnsRows = true
        Some(df)
      } else None
    val ticket = TicketCodec.encode(TicketCodec.ephemeral(clean, returnsRows))
    Info(schema.map(schemaIpcOf).getOrElse(Array.empty), Seq(Endpoint(ticket)))
  }

  /** Execute a ticket: prepared handle → session lookup; else fallback
    * SQL; queries stream IPC, commands execute and return an empty
    * stream (statement.rs:97-162 — ExecuteQuery callers issuing DDL
    * must not fail).
    */
  def doGet(peer: String, ticketBytes: Array[Byte]): Array[Byte] = wrap {
    val t =
      try TicketCodec.decode(ticketBytes)
      catch { case e: TicketCodec.MalformedTicketException =>
        throw FlightStatusException(ErrorMapping.InvalidArgument.code, e.msg) }
    val handleStr = new String(t.handle, StandardCharsets.UTF_8)
    if (handleStr.startsWith("meta:")) doGetMetadata(peer, handleStr)
    else {
      val s = session(peer)
      // metrics label: statement text, not an opaque handle — the
      // slow-query/error rings are read by humans
      val label = t.fallbackSql
        .orElse(if (t.handle.nonEmpty) s.getPrepared(handleStr).map(_.sql) else None)
        .getOrElse(handleStr)
      measured(label) {
        val df =
          if (t.handle.nonEmpty) s.executePrepared(handleStr)
          else t.fallbackSql match {
            case Some(sql) => s.sql(sql)
            case None => throw FlightStatusException(
              ErrorMapping.InvalidArgument.code, "ticket has neither handle nor SQL")
          }
        if (t.returnsRowsFlag) ArrowWire.toIpcStream(df)
        else { df.collect(); ArrowWire.toIpcStream(df.limit(0)) }
      }
    }
  }

  /** DoPut of a command statement: execute, answer affected-row count
    * (statement.rs do_put_statement_update).
    */
  def doPutStatementUpdate(peer: String, sql: String): Long = wrap {
    measured(sql) {
    val s = session(peer)
    val df = s.sql(sql)
    if (df.columns.contains("num_affected_rows"))
      df.collect().headOption.map(_.getLong(0)).getOrElse(0L)
    else { df.collect(); 0L }
    }
  }

  // === prepared statements (prepared.rs) ===================================
  final case class PreparedInfo(handle: Array[Byte], datasetSchemaIpc: Array[Byte],
      parameterSchemaIpc: Array[Byte])

  def createPreparedStatement(peer: String, sql: String): PreparedInfo = wrap {
    val s = session(peer)
    val p = s.createPrepared(sql)
    val dsSchema = p.schema.map(sc => schemaIpcOf(s.spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), sc)))
      .getOrElse(Array.empty[Byte])
    val paramSchema =
      if (p.paramSchema.isEmpty) Array.empty[Byte]
      else schemaIpcOf(s.spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), p.paramSchema))
    PreparedInfo(p.handle.getBytes(StandardCharsets.UTF_8), dsSchema, paramSchema)
  }

  def getFlightInfoPreparedStatement(peer: String, handle: Array[Byte]): Info = wrap {
    val s = session(peer)
    val handleStr = new String(handle, StandardCharsets.UTF_8)
    val p = s.getPrepared(handleStr).getOrElse(throw FlightStatusException(
      ErrorMapping.NotFound.code, s"unknown prepared statement handle: $handleStr"))
    val schemaIpc = p.schema.map(sc => schemaIpcOf(s.spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), sc)))
      .getOrElse(Array.empty[Byte])
    Info(schemaIpc, Seq(Endpoint(TicketCodec.encode(
      TicketCodec.prepared(p.handle.getBytes(StandardCharsets.UTF_8))))))
  }

  /** Bind positional parameters carried as a one-row Arrow record batch
    * (prepared.rs do_put_prepared_statement_query; A10 param-set
    * extraction).
    */
  def doPutPreparedStatementQuery(peer: String, handle: Array[Byte],
      paramsIpc: Array[Byte]): Unit = wrap {
    val s = session(peer)
    val handleStr = new String(handle, StandardCharsets.UTF_8)
    if (s.getPrepared(handleStr).isEmpty)
      throw FlightStatusException(ErrorMapping.NotFound.code,
        s"unknown prepared statement handle: $handleStr")
    if (paramsIpc.nonEmpty) {
      val rows = ArrowWire.fromIpcStream(s.spark, paramsIpc).collect()
      rows.headOption.foreach(r => s.bindParams(handleStr, r.toSeq))
    }
  }

  /** DoPut of a prepared update (prepared.rs:420-545): a resolvable
    * plain INSERT routes the WHOLE parameter batch through the appender
    * (reshape + align + append — the reference's bulk-ingest fast
    * path); anything else executes once per parameter set, summing
    * affected rows (execute.rs:16-32). An empty batch executes the
    * statement once with NULL-bound params (prepared.rs:436-452).
    */
  def doPutPreparedStatementUpdate(peer: String, handle: Array[Byte],
      paramsIpc: Array[Byte]): Long = wrap {
    val s = session(peer)
    val handleStr = new String(handle, StandardCharsets.UTF_8)
    val p = s.getPrepared(handleStr).getOrElse(throw FlightStatusException(
      ErrorMapping.NotFound.code, s"unknown prepared statement handle: $handleStr"))
    measured(p.sql) {

    def affectedOf(df: DataFrame): Long =
      if (df.columns.contains("num_affected_rows"))
        df.collect().headOption.map(_.getLong(0)).getOrElse(0L)
      else { df.collect(); 0L }

    // appender eligibility: plain single-statement INSERT of a
    // pure-placeholder VALUES list whose target table resolves in this
    // session (prepared.rs:429-441; the pure-params restriction is a
    // documented tightening — see SqlShim.insertSourceIsPureParams)
    val appendTarget = SqlShim.parseInsert(p.sql)
      .filter(_ => SqlShim.insertSourceIsPureParams(p.sql))
      .flatMap { case (parts, cols) =>
        // sync micro-lake views first: a fresh peer whose FIRST call is
        // this DoPut would otherwise fail the resolve below and silently
        // degrade to the per-row bind/execute loop
        s.ensureCatalogViews()
        val qualified = SqlShim.quoteQualified(parts)
        scala.util.Try(s.spark.table(qualified)).toOption.map(_ => (parts, qualified, cols))
      }

    if (paramsIpc.isEmpty) affectedOf(s.executePrepared(handleStr))
    else appendTarget match {
      case Some((parts, qualified, cols)) =>
        val batch = ArrowWire.fromIpcStream(s.spark, paramsIpc)
        // a micro-lake-managed table appends through its MutableTable
        // (temp views can't take insertInto); saved tables through the
        // catalog appender. Only a BARE table name may resolve to the
        // micro-lake: a qualified `db.t` resolved `db.t` above, and
        // routing it by its last part would append the batch to an
        // unrelated managed table that happens to be named `t`.
        val viaCatalog =
          if (parts.size == 1) s.catalog.flatMap(_.insertBatch(parts.last, batch, cols, s.txn))
          else None
        val n = viaCatalog.getOrElse(
          graft.sources.BatchAlign.appendParamBatch(s.spark, qualified, batch, cols))
        if (p.ephemeral) s.closePrepared(p.handle)
        n
      case None =>
        val rows = ArrowWire.fromIpcStream(s.spark, paramsIpc).collect()
        if (rows.isEmpty) affectedOf(s.executePrepared(handleStr))
        else {
          // executePrepared auto-closes ephemeral handles after one run,
          // which would orphan rows 2..n; the facade only creates durable
          // handles — enforce the invariant rather than assume it
          require(!p.ephemeral,
            "multi-row DoPut requires a durable prepared statement handle")
          rows.iterator.map { r =>
            s.bindParams(handleStr, r.toSeq)
            affectedOf(s.executePrepared(handleStr))
          }.sum
        }
    }
    }
  }

  def closePreparedStatement(peer: String, handle: Array[Byte]): Unit = wrap {
    session(peer).closePrepared(new String(handle, StandardCharsets.UTF_8))
  }

  // === metadata RPCs (metadata.rs) =========================================
  private def metaTicket(kind: String): Array[Byte] =
    TicketCodec.encode(TicketCodec.Ticket(
      kind = TicketCodec.KindEphemeral,
      handle = s"meta:$kind".getBytes(StandardCharsets.UTF_8),
      returnsRows = Some(true)))

  private def metaDf(peer: String, kind: String): DataFrame = {
    val s = session(peer)
    s.ensureCatalogViews() // micro-lake tables list in this session's metadata
    val spark = s.spark
    kind match {
      case "catalogs"    => InfoSchema.catalogs(spark)
      case "schemas"     => InfoSchema.schemata(spark)
      case "tables"      => InfoSchema.tables(spark)
      case "tables_schema" => InfoSchema.tablesWithSchema(spark)
      case "table_types" => InfoSchema.tableTypes(spark)
      case "primary_keys"    => InfoSchema.primaryKeys(spark)
      case "exported_keys"   => InfoSchema.exportedKeys(spark)
      case "imported_keys"   => InfoSchema.importedKeys(spark)
      case "cross_reference" => InfoSchema.crossReference(spark)
      case "sql_info"        => sqlInfoDf(spark)
      case other => throw FlightStatusException(
        ErrorMapping.InvalidArgument.code, s"unknown metadata ticket: $other")
    }
  }

  private def doGetMetadata(peer: String, handleStr: String): Array[Byte] =
    ArrowWire.toIpcStream(metaDf(peer, handleStr.stripPrefix("meta:")))

  private def metaInfo(peer: String, kind: String): Info =
    Info(schemaIpcOf(metaDf(peer, kind)), Seq(Endpoint(metaTicket(kind))))

  def getFlightInfoCatalogs(peer: String): Info = wrap(metaInfo(peer, "catalogs"))
  def getFlightInfoDbSchemas(peer: String): Info = wrap(metaInfo(peer, "schemas"))
  /** `includeSchema` adds the per-table Arrow-IPC schema column
    * (metadata.rs:223-270 include_schema).
    */
  def getFlightInfoTables(peer: String, includeSchema: Boolean = false): Info =
    wrap(metaInfo(peer, if (includeSchema) "tables_schema" else "tables"))
  def getFlightInfoTableTypes(peer: String): Info = wrap(metaInfo(peer, "table_types"))
  def getFlightInfoPrimaryKeys(peer: String): Info = wrap(metaInfo(peer, "primary_keys"))
  def getFlightInfoExportedKeys(peer: String): Info = wrap(metaInfo(peer, "exported_keys"))
  def getFlightInfoImportedKeys(peer: String): Info = wrap(metaInfo(peer, "imported_keys"))
  def getFlightInfoCrossReference(peer: String): Info = wrap(metaInfo(peer, "cross_reference"))
  def getFlightInfoSqlInfo(peer: String): Info = wrap(metaInfo(peer, "sql_info"))

  /** GetSqlInfo rows: (info id, stringified value) — the static
    * capability map (sql_info.rs:20-36). The gRPC adapter re-encodes
    * values into the spec's dense union; the id->value contract and
    * ordering live here.
    */
  private def sqlInfoDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    SqlInfo.values.toSeq.sortBy(_._1)
      .map { case (k, v) => (k, v.toString) }
      .toDF("info_name", "value")
  }

  // === transactions (transaction.rs) =======================================
  def beginTransaction(peer: String): Array[Byte] = wrap {
    val s = session(peer)
    s.begin()
    // the handle is the PER-TRANSACTION token, not the session id
    // (review catch: with the session id, a stale handle from a reaped
    // or retried transaction committed whatever txn the session
    // currently held — acknowledging writes the caller never issued)
    s.currentTxnToken.getOrElse(s.id).getBytes(StandardCharsets.UTF_8)
  }

  def endTransaction(peer: String, transactionId: Array[Byte], commit: Boolean): Unit = wrap {
    val s = session(peer)
    val handed = new String(transactionId, StandardCharsets.UTF_8)
    // an empty id keeps the lenient SQL-level COMMIT semantics; a
    // NON-empty id must name the session's CURRENT transaction
    if (handed.nonEmpty && !s.currentTxnToken.contains(handed))
      throw new IllegalArgumentException(
        s"unknown or stale transaction id: $handed " +
          "(the transaction it names is no longer this session's open transaction)")
    if (commit) s.commit() else s.rollback()
  }
}
