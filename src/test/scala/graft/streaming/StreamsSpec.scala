package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamsSpec extends SparkTestBase {

  import Streams._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")
  private def tsAt(hour: Int, minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 $hour%02d:$minute%02d:00")

  test("fileIngest streams landed parquet files into the sink exactly once (A7)") {
    val base = Files.createTempDirectory("graft_stream")
    val src = base.resolve("src").toString
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    val events = graft.Engine.table(spark, sfDir, "events").limit(100)
    events.write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val q1 = Streams.fileIngest(spark, src, sink, ckpt, schema)
    q1.awaitTermination(60000)
    assert(spark.read.parquet(sink).count() == 100)
    // second AvailableNow run sees no new files -> no duplicates
    val q2 = Streams.fileIngest(spark, src, sink, ckpt, schema)
    q2.awaitTermination(60000)
    assert(spark.read.parquet(sink).count() == 100)
  }

  test("hourlyCounts emits finalized windows after the watermark passes") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.hourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Event(1, tsAt(10, 5), 1, "view", 1.0),
        Event(2, tsAt(10, 20), 2, "view", 2.0),
        Event(3, tsAt(10, 40), 1, "purchase", 3.0))
      q.processAllAvailable()
      // watermark still inside the 10:00 window -> nothing finalized
      assert(spark.table("hourly_out").count() == 0)
      // event at 12:00 pushes watermark to 11:30 -> 10:00 window finalizes
      mem.addData(Event(4, tsAt(12, 0), 3, "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_out").collect()
      assert(rows.map(_.getString(1)).toSet == Set("view", "purchase"))
      val view = rows.find(_.getString(1) == "view").get
      assert(view.getLong(2) == 2)
      assert(view.getDouble(3) == 3.0)
    } finally q.stop()
  }

  test("hourlyCounts over real events matches the batch aggregation (stream-batch parity)") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions.{count, lit, sum, window}
    implicit val sqlCtx = spark.sqlContext
    // real corpus rows, time-ordered so the watermark never drops any
    val real = graft.Engine.table(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(_.ts.getTime).take(500).toSeq
    val mem = MemoryStream[Event]
    val q = Streams.hourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("parity_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val (a, b) = real.splitAt(250) // two micro-batches, state carries over
      mem.addData(a: _*)
      q.processAllAvailable()
      mem.addData(b: _*)
      q.processAllAvailable()
      // a sentinel far past max(ts) pushes the watermark over every real window
      val maxTs = real.map(_.ts.getTime).max
      mem.addData(Event(-1L, new Timestamp(maxTs + 48L * 3600 * 1000), 0L, "sentinel", 0.0))
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = (r.getTimestamp(0), r.getString(1))
      val streamed = spark.table("parity_out")
        .filter($"event_type" =!= "sentinel").collect()
        .map(r => key(r) -> ((r.getLong(2), r.getDouble(3)))).toMap
      val batch = real.toDF()
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
        .select($"window.start", $"event_type", $"n", $"sum_value").collect()
        .map(r => key(r) -> ((r.getLong(2), r.getDouble(3)))).toMap
      assert(streamed.keySet == batch.keySet,
        "every finalized (window, type) cell matches the batch group set")
      for ((k, (n, sv)) <- streamed) {
        assert(n == batch(k)._1, s"count parity at $k")
        // incremental state merge may reorder the double sum: ulp tolerance
        assert(math.abs(sv - batch(k)._2) < 1e-6, s"sum parity at $k")
      }
    } finally q.stop()
  }

  test("upsertStream: per-batch atomic upsert keyed on the PK, no driver key collect") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_upsert").resolve("t").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    val table = graft.sources.MutableTable.create(spark, dir, schema, Some("event_id"))
    val ckpt = Files.createTempDirectory("graft_upsert_ckpt").toString
    val mem = MemoryStream[(Long, Double)]
    val q = Streams.upsertStream(
      mem.toDF().toDF("event_id", "value"), table, "event_id", ckpt)
    try {
      mem.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      assert(table.df.count() == 2)
      // second batch re-keys 2 and adds 3: upsert, not append
      mem.addData((2L, 20.0), (3L, 3.0))
      q.processAllAvailable()
      val rows = table.df.orderBy("event_id").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
      assert(rows.find(_.getLong(0) == 2L).get.getDouble(1) == 20.0)
    } finally q.stop()
  }

  test("sessionize closes a session when the gap times out, splits on in-batch gaps") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 10 min apart (one session), then a 50-min gap
      // inside the same batch -> first session closes in-batch
      mem.addData(
        Event(1, ts(0), 1, "view", 1.0),
        Event(2, ts(10), 1, "view", 1.0),
        Event(3, Timestamp.valueOf("2026-01-01 11:00:00"), 1, "view", 1.0))
      q.processAllAvailable()
      val inBatch = spark.table("sessions_out").as[SessionOut].collect()
      assert(inBatch.length == 1)
      assert(inBatch.head.n_events == 2)
      assert(inBatch.head.session_start == ts(0) && inBatch.head.session_end == ts(10))
      // advance watermark far past the open session's gap -> timeout emits it
      mem.addData(Event(9, Timestamp.valueOf("2026-01-01 14:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(10, Timestamp.valueOf("2026-01-01 16:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      val all = spark.table("sessions_out").as[SessionOut].collect()
      assert(all.exists(s => s.user_id == 1 && s.n_events == 1 &&
        s.session_start == Timestamp.valueOf("2026-01-01 11:00:00")))
    } finally q.stop()
  }

  test("sessionize: a late-but-in-watermark event lowers session_start (batch parity)") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 opens a session at 10:10; user 2's event at the
      // same time sets the global watermark to 10:00
      mem.addData(Event(1, ts(10), 1, "view", 1.0), Event(2, ts(10), 2, "view", 1.0))
      q.processAllAvailable()
      // batch 2: user 1's out-of-order event at 10:05 — ABOVE the 10:00
      // watermark, within the gap of the open session. The session's
      // true start is now 10:05 (the batch w2 query would say so); the
      // old merge kept 10:10.
      mem.addData(Event(3, ts(5), 1, "view", 1.0))
      q.processAllAvailable()
      // push the watermark far forward so the session times out
      mem.addData(Event(9, Timestamp.valueOf("2026-01-01 15:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(10, Timestamp.valueOf("2026-01-01 17:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      val s1 = spark.table("sessions_late").as[SessionOut].collect()
        .filter(_.user_id == 1)
      assert(s1.length == 1, s1.mkString(","))
      assert(s1.head.session_start == ts(5), s"start ${s1.head.session_start}")
      assert(s1.head.session_end == ts(10) && s1.head.n_events == 2)
    } finally q.stop()
  }

  case class Doc(doc_id: Long, ts: Timestamp, source: String, text: String)

  test("qualityRoute verdicts match the batch txt6 mask (stream-batch parity)") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val real = graft.Engine.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text").limit(50).collect()
      .map(r => Doc(r.getLong(0), ts(0), r.getString(1), r.getString(2))).toSeq
    val mem = MemoryStream[Doc]
    val q = Streams.qualityRoute(mem.toDF())
      .writeStream.format("memory").queryName("route_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(real: _*)
      q.processAllAvailable()
      val streamed = spark.table("route_out")
        .select("doc_id", "drop_reasons").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batch = graft.operators.TextAnalysis.docQualityFilter(spark, sfDir)
        .select("doc_id", "drop_reasons").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(streamed.size == 50)
      streamed.foreach { case (id, mask) => assert(batch(id) == mask, s"doc $id") }
    } finally q.stop()
  }

  test("sourceQualityRates finalizes per-source windows after the watermark") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good = "the quick brown fox jumps over the lazy dog and that is all for now"
    val mem = MemoryStream[Doc]
    val q = Streams.sourceQualityRates(mem.toDF())
      .writeStream.format("memory").queryName("rates_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Doc(1, ts(1), "srcA", good),
        Doc(2, ts(2), "srcA", "x"), // too short + no stopwords -> dropped
        Doc(3, ts(3), "srcB", good))
      q.processAllAvailable()
      assert(spark.table("rates_out").count() == 0) // window still open
      mem.addData(Doc(4, tsAt(11, 0), "srcB", good)) // watermark passes 10:10
      q.processAllAvailable()
      val rows = spark.table("rates_out").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(rows.contains(("srcA", 2L, 1L)), rows.toString)
      assert(rows.contains(("srcB", 1L, 1L)))
    } finally q.stop()
  }

  test("trendingTokens: sliding windows double-count each token, stopwords dropped, late data ignored") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = Streams.trendingTokens(mem.toDF())
      .writeStream.format("memory").queryName("trend_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // 10:07 -> windows [10:00,10:10) and [10:05,10:15)
      mem.addData(Doc(1, ts(7), "srcA", "spark spark rocks the house"))
      q.processAllAvailable()
      assert(spark.table("trend_out").count() == 0, "windows still open")
      // jump the watermark far ahead: both windows finalize
      mem.addData(Doc(2, tsAt(11, 0), "srcA", "later noise"))
      q.processAllAvailable()
      val rows = spark.table("trend_out").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      val sparkRows = rows.filter(_._2 == "spark")
      // SLIDING: the same token mass lands in exactly two windows
      assert(sparkRows.length == 2, sparkRows.toString)
      assert(sparkRows.forall(_._3 == 2L), "both windows count spark twice")
      assert(sparkRows.map(_._1).toSet == Set(
        Timestamp.valueOf("2026-01-01 10:00:00"),
        Timestamp.valueOf("2026-01-01 10:05:00")))
      // stopwords ('the') never reach the count
      assert(!rows.exists(_._2 == "the"))
      // a straggler behind the watermark is dropped, not re-opened
      mem.addData(Doc(3, ts(8), "srcA", "spark straggler"))
      q.processAllAvailable()
      val after = spark.table("trend_out").collect()
        .filter(r => r.getString(1) == "spark").map(_.getLong(2)).toSeq
      assert(after.sorted == Seq(2L, 2L), "late token must not change closed windows")
    } finally q.stop()
  }

  test("clickAttribution joins purchases to in-window clicks and drops stale ones") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = Streams.clickAttribution(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: clicks at 10:00 and 10:10; purchase at 10:15 -> both attribute.
      // user 2: click at 10:00, purchase at 10:45 -> outside 30 min, no match.
      // user 3: purchase with no click -> inner join drops it.
      clicks.addData(
        Event(101, tsAt(10, 0), 1, "click", 0.0),
        Event(102, tsAt(10, 10), 1, "click", 0.0),
        Event(103, tsAt(10, 0), 2, "click", 0.0))
      purchases.addData(
        Event(201, tsAt(10, 15), 1, "purchase", 9.0),
        Event(202, tsAt(10, 45), 2, "purchase", 5.0),
        Event(203, tsAt(10, 20), 3, "purchase", 7.0))
      q.processAllAvailable()
      val rows = spark.table("attr_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
      assert(rows == Set((1L, 201L, 101L), (1L, 201L, 102L)), rows.toString)
    } finally q.stop()
  }

  test("clickAttributionOuter: organic purchases emit with null clicks once provably unmatched") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = Streams.clickAttributionOuter(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attr_outer_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1 attributes; user 3's purchase has NO click — the outer
      // join must emit it with null click columns, but only after the
      // click watermark passes its lookback window
      clicks.addData(Event(101, tsAt(10, 0), 1, "click", 0.0))
      purchases.addData(
        Event(201, tsAt(10, 15), 1, "purchase", 9.0),
        Event(203, tsAt(10, 20), 3, "purchase", 7.0))
      q.processAllAvailable()
      // advance both watermarks far past the windows so the unmatched
      // purchase becomes provably final
      clicks.addData(Event(199, tsAt(12, 0), 9, "click", 0.0))
      purchases.addData(Event(299, tsAt(12, 0), 9, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("attr_outer_out").collect()
        .map(r => (r.getLong(1), if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
      assert(rows(201L) == 101L, "in-window click attributes")
      assert(rows.contains(203L) && rows(203L) == -1L,
        s"the organic purchase must emit with a null click: $rows")
    } finally q.stop()
  }

  test("lastTouchStream: ONE ev19-consistent row per purchase — latest click wins, ties by id") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = Streams.lastTouchStream(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("lt_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: clicks at 10:00 / 10:10 / 10:10 (ids 101, 102, 103) —
      // the pair stream emits THREE candidates for purchase 201, but the
      // reduced surface must emit ONE row: latest ts (10:10), tie broken
      // to the HIGHER id (103). user 3: organic purchase -> null / -1.
      clicks.addData(
        Event(101, tsAt(10, 0), 1, "click", 0.0),
        Event(102, tsAt(10, 10), 1, "click", 0.0),
        Event(103, tsAt(10, 10), 1, "click", 0.0))
      purchases.addData(
        Event(201, tsAt(10, 15), 1, "purchase", 9.0),
        Event(203, tsAt(10, 20), 3, "purchase", 7.0))
      q.processAllAvailable()
      // advance both watermarks so the join windows AND the downstream
      // aggregation windows finalize
      clicks.addData(Event(199, tsAt(13, 0), 9, "click", 0.0))
      purchases.addData(Event(299, tsAt(13, 0), 9, "purchase", 1.0))
      q.processAllAvailable()
      clicks.addData(Event(198, tsAt(15, 0), 9, "click", 0.0))
      purchases.addData(Event(298, tsAt(15, 0), 9, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("lt_out").collect()
        .map(r => r.getLong(0) ->
          ((if (r.isNullAt(4)) -1L else r.getLong(4)), r.getLong(5))).toMap
      assert(rows.contains(201L) && rows.contains(203L), s"both purchases emit: $rows")
      assert(spark.table("lt_out").collect()
        .count(r => r.getLong(0) == 201L) == 1, "exactly ONE row per purchase")
      assert(rows(201L)._1 == 103L, s"latest click, tie to higher id: $rows")
      assert(rows(201L)._2 == 5L * 60 * 1000000, "gap = 5 min in micros")
      assert(rows(203L) == (-1L, -1L), s"organic purchase: null id, -1 gap: $rows")
    } finally q.stop()
  }

  test("enrichEvents: stream-static lookup join keeps all facts and broadcasts the dim") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val mem = MemoryStream[Event]
    val q = Streams.enrichEvents(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Event(1, ts(1), 1, "view", 1.0),
        Event(2, ts(2), 2, "click", 2.0),
        Event(3, ts(3), 99, "view", 3.0)) // no dim row -> sentinel
      q.processAllAvailable()
      val rows = spark.table("enrich_out").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("segment"))).toMap
      assert(rows == Map(1L -> "gold", 2L -> "silver", 3L -> "unknown"),
        "left enrichment must keep unmatched facts with the sentinel")
    } finally q.stop()
  }
}
