package graft.flight

import java.nio.charset.StandardCharsets

import graft._
import org.apache.spark.sql.graft.ArrowWire

/** End-to-end scenarios through the Flight SQL producer facade — the
  * in-proc loopback equivalent of the reference's runner driving the
  * gRPC server (tests/runner/src/scenarios/mod.rs): every byte that
  * would cross the wire (tickets, Arrow IPC) does so here, minus the
  * gRPC framing.
  */
class FlightScenarioSpec extends SparkTestBase {

  private def newProducer() =
    new FlightSqlProducer(new SessionRegistry(spark))

  private def rowsOf(ipc: Array[Byte]) =
    ArrowWire.fromIpcStream(spark, ipc).collect()

  test("handshake echoes protocol version with empty payload (mod.rs:33-58)") {
    val p = newProducer()
    val (ver, payload) = p.handshake("peer-h", 7L)
    assert(ver == 7L && payload.isEmpty)
    assert(p.registry.get("peer-h").isDefined, "handshake materializes the session")
  }

  test("ad-hoc query: GetFlightInfo plans schema, DoGet streams rows (statement.rs)") {
    val p = newProducer()
    Engine.registerAll(spark, sfDir)
    p.registry.getOrCreate("peer-q") // session shares the root catalog? use root views
    val info = p.getFlightInfoStatement("peer-q",
      s"SELECT n_nationkey, n_name FROM parquet.`$sfDir/nation.parquet` ORDER BY n_nationkey")
    assert(info.schemaIpc.nonEmpty, "query FlightInfo carries a planned schema")
    val ticket = TicketCodec.decode(info.ticket)
    assert(ticket.isEphemeral && ticket.returnsRowsFlag && ticket.version == TicketCodec.CurrentVersion)
    val rows = rowsOf(p.doGet("peer-q", info.ticket))
    assert(rows.length == 25 && rows.head.getString(1).nonEmpty)
  }

  test("commands flow through DoGet with an empty stream (statement.rs:97-162)") {
    val p = newProducer()
    val info = p.getFlightInfoStatement("peer-c", "DROP TABLE IF EXISTS flight_cmd_t")
    assert(info.schemaIpc.isEmpty, "command FlightInfo has the empty schema")
    assert(!TicketCodec.decode(info.ticket).returnsRowsFlag)
    assert(rowsOf(p.doGet("peer-c", info.ticket)).isEmpty)
  }

  test("prepared statement lifecycle: create, bind Arrow params, execute, close (prepared.rs)") {
    val p = newProducer()
    val prep = p.createPreparedStatement("peer-p",
      s"SELECT n_name FROM parquet.`$sfDir/nation.parquet` WHERE n_nationkey = ? ORDER BY n_name")
    assert(prep.handle.nonEmpty)
    // params ride as a one-row Arrow record batch (A10)
    val paramsDf = {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      spark.createDataFrame(java.util.List.of(Row(2L)),
        StructType(Seq(StructField("p1", LongType))))
    }
    p.doPutPreparedStatementQuery("peer-p", prep.handle, ArrowWire.toIpcStream(paramsDf))
    val info = p.getFlightInfoPreparedStatement("peer-p", prep.handle)
    val t = TicketCodec.decode(info.ticket)
    assert(t.isPrepared && t.handle.sameElements(prep.handle))
    val rows = rowsOf(p.doGet("peer-p", info.ticket))
    assert(rows.length == 1)
    p.closePreparedStatement("peer-p", prep.handle)
    intercept[FlightSqlProducer#FlightStatusException] {
      p.getFlightInfoPreparedStatement("peer-p", prep.handle)
    }
  }

  test("interval parameters round-trip the prepared wire path (parameter_types.rs:172-229)") {
    val p = newProducer()
    // echo columns exercise the interval WIRE round-trip in both
    // directions (param batch in, result stream out); the arithmetic
    // columns pin the binding SEMANTICS engine-side
    val prep = p.createPreparedStatement("peer-iv",
      "SELECT CAST(TIMESTAMP'2024-01-01 00:00:00' + ? AS STRING) AS plus_dt, " +
        "CAST(DATE'2024-03-31' + ? AS STRING) AS plus_ym, ? AS echo_dt, ? AS echo_ym")
    val paramsDf = spark.sql(
      "SELECT INTERVAL '1 02:03:04' DAY TO SECOND AS p1, INTERVAL '1-2' YEAR TO MONTH AS p2, " +
        "INTERVAL '0 00:00:05' DAY TO SECOND AS p3, INTERVAL '0-7' YEAR TO MONTH AS p4")
    // the param batch itself carries Arrow Duration + IntervalYear vectors
    // (TypeBridge.scala:60,89-90 mappings)
    p.doPutPreparedStatementQuery("peer-iv", prep.handle, ArrowWire.toIpcStream(paramsDf))
    val info = p.getFlightInfoPreparedStatement("peer-iv", prep.handle)
    val rows = rowsOf(p.doGet("peer-iv", info.ticket))
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "2024-01-02 02:03:04", "day-time interval bound into timestamp math")
    assert(r.getString(1) == "2025-05-31", "year-month interval bound into date math")
    assert(r.getAs[java.time.Duration]("echo_dt") == java.time.Duration.ofSeconds(5),
      "day-time interval survives param-batch ingest and result-stream encode")
    assert(r.getAs[java.time.Period]("echo_ym") == java.time.Period.ofMonths(7),
      "year-month interval survives param-batch ingest and result-stream encode")
    // metadata direction: both interval kinds report the reference's type name
    import org.apache.spark.sql.types.{DayTimeIntervalType, YearMonthIntervalType}
    assert(TypeBridge.toDuckName(DayTimeIntervalType()) == "INTERVAL")
    assert(TypeBridge.toDuckName(YearMonthIntervalType()) == "INTERVAL")
    assert(TypeBridge.toSpark("INTERVAL") == DayTimeIntervalType())
  }

  test("prepared update via DoPut answers affected rows (prepared.rs update path)") {
    val p = newProducer()
    val s = p.registry.getOrCreate("peer-u")
    s.spark.sql("DROP TABLE IF EXISTS flight_upd_t")
    s.spark.sql("CREATE TABLE flight_upd_t (id INT, v STRING) USING parquet")
    val prep = p.createPreparedStatement("peer-u", "INSERT INTO flight_upd_t VALUES (?, ?)")
    val paramsDf = {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      spark.createDataFrame(java.util.List.of(Row(1, "x")),
        StructType(Seq(StructField("p1", IntegerType), StructField("p2", StringType))))
    }
    val n = p.doPutPreparedStatementUpdate("peer-u", prep.handle, ArrowWire.toIpcStream(paramsDf))
    // Spark SQL INSERT reports no change count (num_affected_rows is a
    // v2-DML-only column) -> 0; the write itself must have landed
    assert(n >= 0L)
    assert(s.spark.sql("SELECT COUNT(*) FROM flight_upd_t").head.getLong(0) == 1)
    s.spark.sql("DROP TABLE flight_upd_t")
  }

  test("multi-row DoPut INSERT routes the whole batch through the appender (prepared.rs:429-515)") {
    val p = newProducer()
    val s = p.registry.getOrCreate("peer-mr")
    s.spark.sql("DROP TABLE IF EXISTS flight_mr_t")
    s.spark.sql("CREATE TABLE flight_mr_t (id INT, v STRING) USING parquet")
    val prep = p.createPreparedStatement("peer-mr", "INSERT INTO flight_mr_t VALUES (?, ?)")
    // three parameter sets with positional field names, as ADBC drivers send them
    val batch = {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      spark.createDataFrame(java.util.List.of(Row(1, "a"), Row(2, "b"), Row(3, "c")),
        StructType(Seq(StructField("1", IntegerType), StructField("2", StringType))))
    }
    val n = p.doPutPreparedStatementUpdate("peer-mr", prep.handle, ArrowWire.toIpcStream(batch))
    assert(n == 3L, s"appender must report 3 appended rows, got $n")
    val got = s.spark.sql("SELECT id, v FROM flight_mr_t ORDER BY id").collect()
    assert(got.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")), "all three parameter rows must land with values")
    s.spark.sql("DROP TABLE flight_mr_t")
  }

  test("Go-driver one-row positional batch reshapes to N rows; explicit column list aligns (batch.rs:52-115,180-259)") {
    val p = newProducer()
    val s = p.registry.getOrCreate("peer-go")
    s.spark.sql("DROP TABLE IF EXISTS flight_go_t")
    s.spark.sql("CREATE TABLE flight_go_t (id INT, v STRING, extra DOUBLE) USING parquet")
    val prep = p.createPreparedStatement("peer-go",
      "INSERT INTO flight_go_t (v, id) VALUES (?, ?)")
    // VALUES (?,?),(?,?),(?,?) shipped as ONE row of 6 positional columns
    val batch = {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      spark.createDataFrame(java.util.List.of(Row("a", 1, "b", 2, "c", 3)),
        StructType(Seq(
          StructField("1", StringType), StructField("2", IntegerType),
          StructField("3", StringType), StructField("4", IntegerType),
          StructField("5", StringType), StructField("6", IntegerType))))
    }
    val n = p.doPutPreparedStatementUpdate("peer-go", prep.handle, ArrowWire.toIpcStream(batch))
    assert(n == 3L, s"reshaped batch must append 3 rows, got $n")
    val got = s.spark.sql("SELECT id, v, extra FROM flight_go_t ORDER BY id").collect()
    assert(got.map(r => (r.getInt(0), r.getString(1), r.isNullAt(2))).toSeq ==
      Seq((1, "a", true), (2, "b", true), (3, "c", true)),
      "column list (v, id) must reorder and extra must NULL-fill")
    s.spark.sql("DROP TABLE flight_go_t")
  }

  test("non-appender prepared update executes once per parameter set (execute.rs:16-32)") {
    val p = newProducer()
    val s = p.registry.getOrCreate("peer-lp")
    s.spark.sql("DROP TABLE IF EXISTS flight_lp_t")
    s.spark.sql("CREATE TABLE flight_lp_t (id INT, v STRING) USING parquet")
    // VALUES with a source expression is NOT appender-eligible (raw
    // batch append would drop the upper()) → parameter-set loop
    val prep = p.createPreparedStatement("peer-lp",
      "INSERT INTO flight_lp_t VALUES (?, upper(?))")
    val batch = {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      spark.createDataFrame(java.util.List.of(Row(1, "one"), Row(2, "two")),
        StructType(Seq(StructField("1", IntegerType), StructField("2", StringType))))
    }
    p.doPutPreparedStatementUpdate("peer-lp", prep.handle, ArrowWire.toIpcStream(batch))
    val got = s.spark.sql("SELECT id, v FROM flight_lp_t ORDER BY id").collect()
    assert(got.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "ONE"), (2, "TWO")),
      "both parameter sets must execute through the statement, applying upper()")
    s.spark.sql("DROP TABLE flight_lp_t")
  }

  test("YCSB mix over the facade: catalog-backed sessions serve INSERT/UPDATE/DELETE/SELECT (ycsb-flight-sql.xml)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val cat = graft.sources.MutableCatalog(spark)
    cat.create("fl_usertable", StructType(Seq(
      StructField("ycsb_key", LongType), StructField("field1", StringType))),
      primaryKey = Some("ycsb_key"))
    val p = new FlightSqlProducer(new SessionRegistry(spark, catalog = Some(cat)))
    val peer = "peer-ycsb"
    // multi-row DoPut INSERT lands through the MutableTable appender
    val prep = p.createPreparedStatement(peer, "INSERT INTO fl_usertable VALUES (?, ?)")
    val batch = spark.createDataFrame(
      java.util.List.of(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")),
      StructType(Seq(StructField("1", LongType), StructField("2", StringType))))
    assert(p.doPutPreparedStatementUpdate(peer, prep.handle, ArrowWire.toIpcStream(batch)) == 3L)
    // parameterized UPDATE routes through the catalog and reports its count
    val upd = p.createPreparedStatement(peer,
      "UPDATE fl_usertable SET field1 = ? WHERE ycsb_key = ?")
    val updBatch = spark.createDataFrame(java.util.List.of(Row("updated", 2L)),
      StructType(Seq(StructField("1", StringType), StructField("2", LongType))))
    assert(p.doPutPreparedStatementUpdate(peer, upd.handle, ArrowWire.toIpcStream(updBatch)) == 1L)
    // ad-hoc DELETE via DoPut statement update
    assert(p.doPutStatementUpdate(peer, "DELETE FROM fl_usertable WHERE ycsb_key = 3") == 1L)
    // reads from a DIFFERENT peer session see the shared lake state
    val info = p.getFlightInfoStatement("peer-ycsb2",
      "SELECT ycsb_key, field1 FROM fl_usertable ORDER BY ycsb_key")
    val rows = rowsOf(p.doGet("peer-ycsb2", info.ticket))
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "updated")))
    // managed tables are visible in a FRESH session's GetTables
    // (metadata_visibility.test — DuckLake tables list in metadata)
    val tables = rowsOf(p.doGet("peer-ycsb3", p.getFlightInfoTables("peer-ycsb3").ticket))
    assert(tables.exists(_.getString(2) == "fl_usertable"),
      "micro-lake table must appear in metadata for a fresh session")
    cat.drop("fl_usertable")
  }

  test("qualified DoPut INSERT never routes to a same-named micro-lake table") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val cat = graft.sources.MutableCatalog(spark)
    val managed = cat.create("flq_t", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    val p = new FlightSqlProducer(new SessionRegistry(spark, catalog = Some(cat)))
    val s = p.registry.getOrCreate("peer-qn")
    s.spark.sql("DROP TABLE IF EXISTS default.flq_t")
    s.spark.sql("CREATE TABLE default.flq_t (id BIGINT, v STRING) USING parquet")
    // the INSERT names the SAVED table with a qualifier; routing the
    // batch by the bare last part would append to the managed table
    val prep = p.createPreparedStatement("peer-qn", "INSERT INTO default.flq_t VALUES (?, ?)")
    val batch = spark.createDataFrame(java.util.List.of(Row(1L, "x"), Row(2L, "y")),
      StructType(Seq(StructField("1", LongType), StructField("2", StringType))))
    p.doPutPreparedStatementUpdate("peer-qn", prep.handle, ArrowWire.toIpcStream(batch))
    assert(managed.df.count() == 0L,
      "micro-lake table of the same bare name must stay untouched")
    assert(s.spark.sql("SELECT COUNT(*) FROM default.flq_t").head.getLong(0) == 2L,
      "the batch must land in the qualified saved table")
    s.spark.sql("DROP TABLE default.flq_t")
    cat.drop("flq_t")
  }

  test("a fresh peer's FIRST call hits the micro-lake appender, not the per-row loop") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val cat = graft.sources.MutableCatalog(spark)
    val managed = cat.create("flf_t", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    val p = new FlightSqlProducer(new SessionRegistry(spark, catalog = Some(cat)))
    // no prior statement for this peer: the eligibility resolve must
    // sync catalog views itself instead of silently degrading
    val prep = p.createPreparedStatement("peer-fresh", "INSERT INTO flf_t VALUES (?, ?)")
    val batch = spark.createDataFrame(
      java.util.List.of(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")),
      StructType(Seq(StructField("1", LongType), StructField("2", StringType))))
    val v0 = managed.currentVersion
    assert(p.doPutPreparedStatementUpdate("peer-fresh", prep.handle,
      ArrowWire.toIpcStream(batch)) == 3L)
    // the appender commits the whole batch as ONE table version; the
    // bind/execute loop would commit once per row (the marker ADVICE r7
    // asked for — row counts alone cannot tell the paths apart)
    assert(managed.currentVersion == v0 + 1,
      s"expected one appender commit, saw ${managed.currentVersion - v0}")
    cat.drop("flf_t")
  }

  test("transactions over the facade roll back micro-lake writes (transaction.rs + SURVEY §7.4)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val cat = graft.sources.MutableCatalog(spark)
    cat.create("fl_txn_t", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    val p = new FlightSqlProducer(new SessionRegistry(spark, catalog = Some(cat)))
    val peer = "peer-txn2"
    p.doPutStatementUpdate(peer, "INSERT INTO fl_txn_t VALUES (1, 'committed')")
    val txn = p.beginTransaction(peer)
    p.doPutStatementUpdate(peer, "INSERT INTO fl_txn_t VALUES (2, 'doomed')")
    p.doPutStatementUpdate(peer, "UPDATE fl_txn_t SET v = 'mutated' WHERE id = 1")
    p.endTransaction(peer, txn, commit = false)
    // rollback restored the BEGIN snapshot: insert gone, update undone
    val info = p.getFlightInfoStatement(peer, "SELECT id, v FROM fl_txn_t ORDER BY id")
    val rows = rowsOf(p.doGet(peer, info.ticket))
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "committed")))
    // parameterized prepared SELECT over the managed table
    val prep = p.createPreparedStatement(peer, "SELECT v FROM fl_txn_t WHERE id = ?")
    val paramsDf = spark.createDataFrame(java.util.List.of(Row(1L)),
      StructType(Seq(StructField("1", LongType))))
    p.doPutPreparedStatementQuery(peer, prep.handle, ArrowWire.toIpcStream(paramsDf))
    val got = rowsOf(p.doGet(peer, p.getFlightInfoPreparedStatement(peer, prep.handle).ticket))
    assert(got.length == 1 && got.head.getString(0) == "committed")
    cat.drop("fl_txn_t")
  }

  test("metadata RPCs serve catalogs/schemas/tables/table-types/keys/sql-info (metadata.rs)") {
    val p = newProducer()
    val peer = "peer-m"
    val cats = rowsOf(p.doGet(peer, p.getFlightInfoCatalogs(peer).ticket))
    assert(cats.map(_.getString(0)).contains("spark_catalog"))
    val types = rowsOf(p.doGet(peer, p.getFlightInfoTableTypes(peer).ticket))
    assert(types.map(_.getString(0)).toSet == Set("TABLE", "VIEW"))
    assert(rowsOf(p.doGet(peer, p.getFlightInfoPrimaryKeys(peer).ticket)).isEmpty)
    assert(rowsOf(p.doGet(peer, p.getFlightInfoImportedKeys(peer).ticket)).isEmpty)
    val sqlInfo = rowsOf(p.doGet(peer, p.getFlightInfoSqlInfo(peer).ticket))
    assert(sqlInfo.exists(r => r.getInt(0) == SqlInfo.FLIGHT_SQL_SERVER_NAME))
    // a table registered in the peer's session shows up via GetTables
    p.registry.getOrCreate(peer).spark.range(1).createOrReplaceTempView("flight_meta_v")
    val tables = rowsOf(p.doGet(peer, p.getFlightInfoTables(peer).ticket))
    assert(tables.exists(_.getString(2) == "flight_meta_v"))
  }

  test("errors map to Flight status codes (mod.rs:153-325 / ErrorMapping)") {
    val p = newProducer()
    val bad = intercept[FlightSqlProducer#FlightStatusException] {
      p.getFlightInfoStatement("peer-e", "SELECT definitely broken FROM")
    }
    assert(bad.code == ErrorMapping.InvalidArgument.code)
    val missing = intercept[FlightSqlProducer#FlightStatusException] {
      p.doGet("peer-e", TicketCodec.encode(
        TicketCodec.prepared("nope".getBytes(StandardCharsets.UTF_8))))
    }
    assert(missing.code == ErrorMapping.NotFound.code)
    val garbage = intercept[FlightSqlProducer#FlightStatusException] {
      p.doGet("peer-e", Array[Byte](0x1A, 0x7F))
    }
    assert(garbage.code == ErrorMapping.InvalidArgument.code)
  }

  test("transactions begin/commit/rollback through the action surface (transaction.rs)") {
    val p = newProducer()
    val txn = p.beginTransaction("peer-t")
    assert(txn.nonEmpty)
    assert(p.registry.getOrCreate("peer-t").inTransaction)
    p.endTransaction("peer-t", txn, commit = true)
    assert(!p.registry.getOrCreate("peer-t").inTransaction)
  }
}
