package graft

import org.apache.spark.sql.graft.ArrowWire
import org.scalatest.funsuite.AnyFunSuite

class TicketCodecSpec extends AnyFunSuite {
  import TicketCodec._

  test("round-trips all fields (ticket.rs:40-59 layout)") {
    val t = Ticket(version = 2, kind = KindEphemeral, handle = Array[Byte](1, 2, 3),
      fallbackSql = Some("SELECT 1"), returnsRows = Some(true))
    assert(decode(encode(t)) == t)
  }

  test("wire fixture: bytes prost emits for a reference ticket decode identically (ticket.rs:40-62)") {
    // TicketStatementPayload { version: 2, kind: Ephemeral=2,
    //   fallback_sql: Some("SELECT 1"), returns_rows: Some(true) }
    // prost: 08 02 | 10 02 | 22 08 "SELECT 1" | 28 01
    val prostBytes = Array[Byte](0x08, 0x02, 0x10, 0x02, 0x22, 0x08) ++
      "SELECT 1".getBytes("UTF-8") ++ Array[Byte](0x28, 0x01)
    val t = decode(prostBytes)
    assert(t.version == CurrentVersion && t.isEphemeral &&
      t.fallbackSql.contains("SELECT 1") && t.returnsRowsFlag)
    assert(encode(t).sameElements(prostBytes), "encode must emit prost's exact bytes")
  }

  test("absent returns_rows defaults to TRUE; optional false is still encoded (ticket.rs:106-108)") {
    assert(decode(encode(Ticket(kind = KindPrepared, handle = Array[Byte](9)))).returnsRowsFlag)
    val cmd = decode(encode(Ticket(kind = KindEphemeral, returnsRows = Some(false))))
    assert(cmd.returnsRows.contains(false) && !cmd.returnsRowsFlag)
  }

  test("length-overflow varint in a bytes field is rejected, not wrapped") {
    // field 3 (bytes) with a 2^32-scale length that would wrap negative as Int
    val evil = Array[Byte](0x1A, 0x90.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x10, 0x01)
    intercept[MalformedTicketException](decode(evil))
  }

  test("default fields are omitted on the wire and restored on decode (proto3)") {
    val t = Ticket(version = 2)
    val bytes = encode(t)
    assert(bytes.length == 2, "only the version field should be encoded")
    assert(decode(bytes) == t)
  }

  test("empty input decodes to all defaults") {
    assert(decode(Array.empty) == Ticket(version = 0))
  }

  test("unknown fields are skipped (forward compatibility)") {
    val base = encode(Ticket(version = 1, fallbackSql = Some("SELECT 2")))
    // append unknown field 9 (varint) and field 10 (bytes)
    val extra = Array[Byte]((9 << 3).toByte, 42, ((10 << 3) | 2).toByte, 2, 7, 7)
    assert(decode(base ++ extra) == Ticket(version = 1, fallbackSql = Some("SELECT 2")))
  }

  test("truncated tickets raise MalformedTicketException (ticket.rs decode errors)") {
    val good = encode(Ticket(version = 1, fallbackSql = Some("SELECT 1")))
    intercept[MalformedTicketException](decode(good.dropRight(3)))
    intercept[MalformedTicketException](decode(Array[Byte](0x80.toByte)))
  }

  test("multi-byte varints (large handles) survive") {
    val t = Ticket(version = 300, handle = Array.fill(200)(0x5A.toByte))
    assert(decode(encode(t)) == t)
  }
}

/** Cross-thread probe for the streaming-wire spec: tasks bump
  * `partitionsDone` (local mode — same JVM), the recording sink logs the
  * count seen at each wire write.
  */
object ArrowStreamProbe {
  val partitionsDone = new java.util.concurrent.atomic.AtomicInteger()
  val writeEvents = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
}

class ArrowWireSpec extends SparkTestBase {

  test("toIpcStream/fromIpcStream round-trips a query result (execute.rs wire path)") {
    val df = Engine.table(spark, sfDir, "nation")
      .selectExpr("n_nationkey", "n_name")
      .orderBy("n_nationkey")
    val bytes = ArrowWire.toIpcStream(df)
    assert(bytes.length > 100)
    val back = ArrowWire.fromIpcStream(spark, bytes)
    assert(back.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name"))
    assert(back.orderBy("n_nationkey").collect().toSeq == df.collect().toSeq)
  }

  test("large results split into 2048-row batches (DuckDB vector parity, SURVEY §4.2)") {
    val df = Engine.table(spark, sfDir, "lineitem").select("l_orderkey").limit(5000)
    val bytes = ArrowWire.toIpcStream(df)
    val back = ArrowWire.fromIpcStream(spark, bytes)
    assert(back.count() == 5000)
  }

  test("writeIpcStream is incremental: wire bytes go out before the last partition computes (r13 #3)") {
    import spark.implicits._
    ArrowStreamProbe.partitionsDone.set(0)
    ArrowStreamProbe.writeEvents.clear()
    val nParts = 8
    val df = spark.range(0, 20000, 1, nParts).mapPartitions { it =>
      val rows = it.toArray // partition fully computed HERE, in the task
      ArrowStreamProbe.partitionsDone.incrementAndGet()
      rows.iterator
    }.toDF("v")
    val sink = new java.io.OutputStream {
      private def mark(): Unit = ArrowStreamProbe.writeEvents.add(ArrowStreamProbe.partitionsDone.get())
      override def write(b: Int): Unit = mark()
      override def write(b: Array[Byte], off: Int, len: Int): Unit = mark()
    }
    // wave of 2 over 8 partitions: batches must hit the wire between
    // waves, while later partitions are still uncomputed
    val batches = ArrowWire.writeIpcStream(df, sink, wavePartitions = 2)
    assert(batches >= 9, s"20000 rows at 2048/batch must frame >=9 batches, got $batches")
    val events = {
      import scala.jdk.CollectionConverters._
      ArrowStreamProbe.writeEvents.asScala.toVector
    }
    assert(events.head <= 2,
      "the schema message must hit the wire after at most the FIRST wave " +
        s"(priming) is computed; saw ${events.head} partitions done")
    assert(events.exists(v => v > 0 && v < nParts),
      "record batches must stream out WHILE partitions are still being computed " +
        s"(saw write events at partition counts ${events.distinct})")
  }

  test("readIpc rejects a stream missing its end-of-stream seal (mid-stream server failure)") {
    val df = spark.sql("SELECT id AS v FROM range(5000)")
    val bytes = ArrowWire.toIpcStream(df)
    // sanity: the complete stream decodes
    assert(ArrowWire.readIpc(bytes)._2.length == 5000)
    // strip the 8-byte EOS marker: exactly what a gateway mid-stream
    // failure leaves behind (chunked body terminates cleanly, no seal)
    val truncated = bytes.dropRight(8)
    val e = intercept[java.io.IOException](ArrowWire.readIpc(truncated))
    assert(e.getMessage.contains("truncated"), e.getMessage)
    // a harder cut (mid-batch) must also be rejected
    intercept[java.io.IOException](ArrowWire.readIpc(bytes.take(bytes.length / 2)))
  }

  test("a top-level LIMIT rides executeTake on the wire, not a full waved scan") {
    val counter = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = spark.sql("SELECT id FROM range(0, 1000000, 1, 16) LIMIT 10")
      val out = new java.io.ByteArrayOutputStream()
      val batches = ArrowWire.writeIpcStream(df, out, wavePartitions = 2)
      // listener events are async; give the bus a beat to drain
      Thread.sleep(500)
      assert(batches == 1L)
      assert(ArrowWire.readIpc(out.toByteArray)._2.length == 10)
      // the waved path over 16 partitions at wave 2 would launch 8 jobs;
      // executeTake stops after enough partitions (a couple of jobs max)
      assert(counter.get() <= 3,
        s"LIMIT 10 over 16 partitions launched ${counter.get()} jobs - waved full scan?")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("ingest direction feeds BatchAlign (A7/A10 DoPut path)") {
    import org.apache.spark.sql.types._
    val df = spark.sql("SELECT CAST(7 AS INT) AS id, 'x' AS name")
    val bytes = ArrowWire.toIpcStream(df)
    val target = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("missing", DoubleType)))
    val aligned = sources.BatchAlign.alignToSchema(ArrowWire.fromIpcStream(spark, bytes), target)
    assert(aligned.head == org.apache.spark.sql.Row(7L, "x", null))
  }
}

class MetricsSpec extends AnyFunSuite {

  test("timed records totals, latency, and in-flight gauge (metrics.rs:14-201)") {
    val m = new Metrics()
    assert(m.timed("SELECT 1") { assert(m.inFlight == 1); 42 } == 42)
    assert(m.inFlight == 0)
    assert(m.queries == 1)
    assert(m.latencySummary("p50") >= 0.0)
  }

  test("errors land in the bounded error ring") {
    val m = new Metrics(ringCapacity = 3)
    (1 to 5).foreach { i =>
      intercept[RuntimeException](m.timed(s"BAD $i")(throw new RuntimeException(s"boom $i")))
    }
    assert(m.errors == 5)
    assert(m.recentErrors.size == 3)
    assert(m.recentErrors.last.message == "boom 5")
  }

  test("slow queries (>= threshold) land in the slow ring") {
    val m = new Metrics(slowQueryThresholdMillis = 1)
    m.record("SELECT slow", millis = 10)
    m.record("SELECT fast", millis = 0)
    assert(m.slowQueries.map(_.sql) == Seq("SELECT slow"))
  }

  test("latency percentiles are ordered and bounded by the window") {
    val m = new Metrics(windowSize = 100)
    (1 to 100).foreach(i => m.record("q", millis = i))
    val l = m.latencySummary
    assert(l("p50") <= l("p95") && l("p95") <= l("p99"))
    assert(l("p99") >= 99.0)
    assert(m.statusLine.contains("queries=100"))
  }
}

class SqlInfoSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("SqlInfo constants mirror the reference (sql_info.rs:20-36)") {
    assert(SqlInfo.values(SqlInfo.FLIGHT_SQL_SERVER_READ_ONLY) == false)
    // the spec id for server transaction support is 8 (FlightSql.proto
    // 0-9 server block; r20 wire review — it was advertised at a
    // nonexistent 514, invisible to any ADBC client)
    assert(SqlInfo.FLIGHT_SQL_SERVER_TRANSACTION == 8)
    assert(SqlInfo.values(SqlInfo.FLIGHT_SQL_SERVER_TRANSACTION) == 1)
    // all four reference-advertised infos are present
    assert(SqlInfo.values(SqlInfo.SQL_TRANSACTIONS_SUPPORTED) == true)
    assert(SqlInfo.values(SqlInfo.SQL_DEFAULT_TRANSACTION_ISOLATION) ==
      SqlInfo.serializableIsolation)
    assert(SqlInfo.values(SqlInfo.SQL_SUPPORTED_TRANSACTIONS_ISOLATION_LEVELS) == 0x1e)
    assert(SqlInfo.isolationMask == 0x1e)
    assert(SqlInfo.values(SqlInfo.SQL_IDENTIFIER_QUOTE_CHAR) == "\"")
  }
}
