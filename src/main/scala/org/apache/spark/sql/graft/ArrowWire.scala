package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.channels.Channels

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.{ArrowStreamReader, WriteChannel}
import org.apache.arrow.vector.ipc.message.MessageSerializer
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.util.ArrowUtils

/** Arrow wire conversion — the result-set encoding the reference streams
  * (swanlake-core/src/service/execute.rs:205-240 encodes query results as
  * Arrow `FlightData`; batches originate at engine/connection.rs:21-26).
  *
  * The gRPC Flight transport itself is out of scope in this offline build
  * (no arrow-flight jars ship with Spark), but the payload layer — result
  * rows as a complete Arrow IPC stream, and the reverse direction for the
  * ingest path (A7/A10: client-sent Arrow batches → DataFrame) — runs on
  * Spark's own `ArrowConverters`, so a Flight server is a thin framing
  * layer over these bytes.
  *
  * Wire layout produced: schema message, N framed record-batch messages
  * (each ≤ `maxRecordsPerBatch` rows — default 2048, DuckDB's vector
  * size, SURVEY §4.2 wire parity), end-of-stream marker. Spark's batch
  * iterator emits fully-framed IPC messages, so assembly is pure
  * concatenation — no per-value re-encoding.
  *
  * Scale note: `writeIpcStream` is the driver-side wire boundary (the
  * same place the reference's server sits); rows are pulled partition
  * by partition and framed batch by batch straight onto the output, so
  * a large result never materializes as one allocation on the wire path.
  */
object ArrowWire {

  val defaultBatchRows = 2048

  /** Result partitions fetched per driver round-trip on the wire path.
    * The tradeoff: `toLocalIterator`-style one-at-a-time fetching is
    * maximally memory-safe but runs partitions SEQUENTIALLY, one job
    * each — an 80-partition table turned a point read into 80 serial
    * jobs (~1.3 s measured, round-14 YCSB diagnosis). One wave = one
    * job over `wavePartitions` partitions computed in PARALLEL, so any
    * result at or under the wave size costs exactly one collect-shaped
    * job, while bigger results stay bounded at wave-size partitions of
    * driver memory (at cluster file sizing, 16 x ~128 MB ≈ 2 GB —
    * a driver-sized buffer, not a result-sized one).
    */
  val defaultWavePartitions = 16

  /** Write a DataFrame's result to `out` as an Arrow IPC stream,
    * INCREMENTALLY: rows are fetched a WAVE of partitions at a time
    * (see [[defaultWavePartitions]]), framed into
    * ≤`maxRecordsPerBatch`-row record-batch messages, and each message
    * is written as soon as it is full. Server memory on the wire path
    * is bounded by one wave + one batch — a 100 TB-scale DoGet never
    * buffers the whole result on the driver (SURVEY §6 streamed-results
    * requirement; VERDICT r13 #3). The schema message goes out after at
    * most the first wave (see [[prepareIpcStream]] priming), so the
    * first wire byte still precedes the last batch by construction.
    * Returns the number of record-batch messages written.
    */
  def writeIpcStream(df: DataFrame, out: java.io.OutputStream,
      maxRecordsPerBatch: Int = defaultBatchRows,
      wavePartitions: Int = defaultWavePartitions): Long =
    prepareIpcStream(df, maxRecordsPerBatch, wavePartitions)(out)

  /** Two-phase form of [[writeIpcStream]] for wire servers: the CALL
    * forces physical planning AND computes the first wave, so the
    * runtime failures a query usually has (missing file, ANSI cast,
    * division by zero) surface while the HTTP status line can still say
    * 4xx/5xx; the returned closure streams schema + batches + the
    * END-OF-STREAM marker to an OutputStream. The EOS marker is written
    * only when every batch went out — a mid-stream failure leaves the
    * stream without it, which [[readIpc]] rejects, so a partial result
    * can never be mistaken for a complete one.
    */
  def prepareIpcStream(df: DataFrame,
      maxRecordsPerBatch: Int = defaultBatchRows,
      wavePartitions: Int = defaultWavePartitions): java.io.OutputStream => Long = {
    val spark = df.sparkSession
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val schema = df.schema
    val rows = wavedRowIterator(df, wavePartitions)
    rows.hasNext // prime: runs the first wave (and AQE stage materialization) NOW
    out => {
      val batches = ArrowConverters.toBatchIterator(
        rows, schema, maxRecordsPerBatch.toLong, tz, true, false, TaskContext.get())
      // the batch iterator owns a VectorSchemaRoot + child allocator it
      // releases only on exhaustion (or via a TaskContext listener that
      // does not exist on this driver thread) — a client disconnect
      // mid-write would otherwise leak Arrow direct memory per aborted
      // download (review catch); it is AutoCloseable, so close on ANY
      // early exit
      try {
        val ch = new WriteChannel(Channels.newChannel(out))
        MessageSerializer.serialize(ch, ArrowUtils.toArrowSchema(schema, tz, true, false))
        var n = 0L
        batches.foreach { b => ch.write(b); n += 1 }
        // end-of-stream: continuation token + zero length — the
        // completeness seal (only reached when every batch is out)
        ch.writeIntLittleEndian(MessageSerializer.IPC_CONTINUATION_TOKEN)
        ch.writeIntLittleEndian(0)
        n
      } finally batches match {
        case c: AutoCloseable => try c.close() catch { case _: Throwable => () }
        case _ => ()
      }
    }
  }

  /** Lazily iterate a plan's result rows, one wave of partitions per
    * job (each wave's partitions compute in parallel; rows are copied
    * off the unsafe buffers before crossing jobs). A top-level LIMIT
    * plan instead rides `executeCollect` — Spark's executeTake path
    * stops after enough partitions, where `doExecute` on a collect-limit
    * plan would locally limit EVERY partition and add a one-partition
    * shuffle (a full scan per point LIMIT query).
    */
  private def wavedRowIterator(df: DataFrame,
      wavePartitions: Int): Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    val topLimited = df.queryExecution.optimizedPlan match {
      case _: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => true
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalLimit => true
      // already-local results (the prepared point-read fast path answers
      // a LocalRelation): executeCollect is driver-local — launching a
      // parallelize job to re-fetch rows the driver already holds would
      // dominate a point read's latency
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      // SHOW/DESCRIBE/DDL answers: CommandResult already holds its rows
      // on the driver — doExecute would parallelize them into a
      // one-round-trip Spark job per metadata query (review catch; same
      // rationale as the LocalRelation arm above)
      case _: org.apache.spark.sql.catalyst.plans.logical.CommandResult => true
      case _ => false
    }
    if (topLimited) return df.queryExecution.executedPlan.executeCollect().iterator
    val rdd = df.queryExecution.executedPlan.execute().map(_.copy())
    val n = rdd.getNumPartitions
    if (n == 0) Iterator.empty
    else {
      val sc = df.sparkSession.sparkContext
      (0 until n).grouped(math.max(1, wavePartitions)).iterator.flatMap { ps =>
        sc.runJob(rdd, (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => it.toArray, ps)
          .iterator.flatten
      }
    }
  }

  /** Prepared EXTERNAL-ROW stream for non-Arrow wire paths (the
    * gateway's JSON body, VERDICT r14 #3: its df.collect() buffered the
    * whole result — an OOM at 100× scale): same contract as
    * [[prepareIpcStream]] — the CALL forces planning and the first wave
    * so errors surface while the status line can still say 4xx/5xx; the
    * returned iterator then pulls one wave of partitions at a time, so
    * caller memory is bounded by a wave, never the result.
    */
  def prepareRowStream(df: DataFrame,
      wavePartitions: Int = defaultWavePartitions)
      : (org.apache.spark.sql.types.StructType, Iterator[Row]) = {
    val schema = df.schema
    val internal = wavedRowIterator(df, wavePartitions)
    internal.hasNext // prime: first wave + AQE stage materialization NOW
    val deserializer = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(schema)
      .resolveAndBind().createDeserializer()
    (schema, internal.map(deserializer(_)))
  }

  /** Encode a DataFrame's result as a complete Arrow IPC stream (the
    * buffered form — in-proc consumers and tests; the gateway streams
    * via [[writeIpcStream]] instead).
    */
  def toIpcStream(df: DataFrame, maxRecordsPerBatch: Int = defaultBatchRows): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeIpcStream(df, out, maxRecordsPerBatch)
    out.toByteArray
  }

  /** Decode an Arrow IPC stream into a local DataFrame (the ingest
    * direction: DoPut batches → rows for alignment + append, A7/A10).
    */
  def fromIpcStream(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val (schema, rows) = readIpc(bytes)
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Session-free decode: schema + rows straight off the stream — what
    * a REMOTE client (graft.HttpSqlClient over the SQL gateway) uses,
    * where no SparkSession exists on the client side.
    */
  def readIpc(bytes: Array[Byte]): (org.apache.spark.sql.types.StructType, Array[Row]) = {
    // completeness check FIRST: our writer always seals a finished
    // stream with the 8-byte EOS marker (continuation token + zero
    // length). ArrowStreamReader accepts bare EOF at a message boundary
    // as end-of-stream, which would silently pass off a server-side
    // mid-stream failure (the chunked HTTP body terminates cleanly) as
    // a complete, shorter result.
    val n = bytes.length
    val hasEos = n >= 8 &&
      bytes(n - 8) == -1 && bytes(n - 7) == -1 && bytes(n - 6) == -1 && bytes(n - 5) == -1 &&
      bytes(n - 4) == 0 && bytes(n - 3) == 0 && bytes(n - 2) == 0 && bytes(n - 1) == 0
    if (!hasEos)
      throw new java.io.IOException(
        s"truncated Arrow IPC stream ($n bytes, no end-of-stream marker): " +
          "the server failed mid-stream; treat the result as an error, not data")
    val allocator = new RootAllocator(Long.MaxValue)
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val sparkSchema = ArrowUtils.fromArrowSchema(root.getSchema)
      val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
      while (reader.loadNextBatch()) {
        val cols = root.getFieldVectors.asScala
        for (r <- 0 until root.getRowCount)
          rows += Row.fromSeq(cols.zipWithIndex.map { case (v, i) =>
            fromArrow(v.getObject(r), sparkSchema(i).dataType)
          }.toSeq)
      }
      (sparkSchema, rows.toArray)
    } finally { reader.close(); allocator.close() }
  }

  /** Arrow getObject → the external JVM type the declared Spark field
    * expects (review catch: Text alone was converted, so timestamp/date
    * vectors decoded to raw Long/Integer that violated the schema —
    * row.getTimestamp threw, and the DoPut ingest path could never bind
    * a timestamp/date parameter column). Scalars only: the wire carries
    * the engine's flat result/param batches; nested types stay the
    * documented out-of-scope of this codec.
    */
  private def fromArrow(v: Any, dt: org.apache.spark.sql.types.DataType): Any = (v, dt) match {
    case (null, _) => null
    case (t: org.apache.arrow.vector.util.Text, _) => t.toString
    case (l: java.lang.Long, org.apache.spark.sql.types.TimestampType) =>
      // TZ-bearing micro vector: epoch micros
      val seconds = Math.floorDiv(l.longValue(), 1000000L)
      val micros = Math.floorMod(l.longValue(), 1000000L)
      val ts = new java.sql.Timestamp(seconds * 1000L)
      ts.setNanos((micros * 1000L).toInt)
      ts
    case (ldt: java.time.LocalDateTime, org.apache.spark.sql.types.TimestampType) =>
      java.sql.Timestamp.valueOf(ldt) // TZ-less micro vector
    case (i: java.lang.Integer, org.apache.spark.sql.types.DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (other, _) => other
  }
}
