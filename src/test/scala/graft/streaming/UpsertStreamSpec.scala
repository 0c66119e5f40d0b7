package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import graft.sources.MutableTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

class UpsertStreamSpec extends SparkTestBase {

  import Streams._

  test("upsertStream keeps one PK-checked row per key across micro-batches (A7 + §7.4)") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_upsert")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val table = MutableTable.create(spark, base.resolve("t").toString, schema, Some("event_id"))
    val mem = MemoryStream[Event]
    val q = Streams.upsertStream(mem.toDF(), table, "event_id", base.resolve("ckpt").toString)
    try {
      def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
      mem.addData(Event(1, ts(0), 1, "view", 1.0), Event(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      assert(table.df.count() == 2)
      // second batch updates key 1 and inserts key 3
      mem.addData(Event(1, ts(5), 1, "view", 99.0), Event(3, ts(6), 2, "view", 3.0))
      q.processAllAvailable()
      val byId = table.df.collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
      assert(byId == Map(1L -> 99.0, 2L -> 2.0, 3L -> 3.0))
    } finally q.stop()
  }

  test("upsertStream: atomic one-version commit per batch, deterministic in-batch pick") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_upsert2")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val table = MutableTable.create(spark, base.resolve("t").toString, schema, Some("event_id"))
    val mem = MemoryStream[Event]
    // latest-wins by event time — the documented orderBy contract
    val q = Streams.upsertStream(mem.toDF(), table, "event_id",
      base.resolve("ckpt").toString, orderBy = Seq("ts"))
    try {
      def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
      val v0 = table.currentVersion
      // one batch, two rows for pk=1: the LATER ts must win — and the
      // delete+insert must publish as ONE version (the old
      // delete-then-insert pair published two, exposing a keys-absent
      // state to concurrent readers)
      mem.addData(Event(1, ts(0), 1, "view", 1.0), Event(1, ts(9), 1, "view", 7.0))
      q.processAllAvailable()
      assert(table.currentVersion == v0 + 1,
        s"upsert batch must commit exactly one version (was $v0, now ${table.currentVersion})")
      val rows = table.df.collect()
      assert(rows.length == 1)
      assert(rows.head.getDouble(4) == 7.0, "the later-ts row wins the in-batch pick")
      // an updating batch also commits exactly one version
      val v1 = table.currentVersion
      mem.addData(Event(1, ts(20), 1, "view", 5.0))
      q.processAllAvailable()
      assert(table.currentVersion == v1 + 1)
      assert(table.df.collect().head.getDouble(4) == 5.0)
    } finally q.stop()
  }

  test("upsertKeys: rejects NULL and duplicate keys; key must be the PK") {
    val sparkS = spark
    import sparkS.implicits._
    val base = Files.createTempDirectory("graft_upsert3")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val table = MutableTable.create(spark, base.resolve("t").toString, schema, Some("k"))
    table.insert(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    // happy path: replaces one, inserts one, single version
    val v0 = table.currentVersion
    val (del, ins) = table.upsertKeys(Seq((2L, "b2"), (3L, "c")).toDF("k", "v"), "k")
    assert((del, ins) == ((1L, 2L)))
    assert(table.currentVersion == v0 + 1)
    assert(table.df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    val dup = intercept[RuntimeException] {
      table.upsertKeys(Seq((5L, "x"), (5L, "y")).toDF("k", "v"), "k")
    }
    assert(dup.getMessage.contains("duplicate key"))
    val nullRow = spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row(null, "x")), schema)
    val nul = intercept[IllegalArgumentException] { table.upsertKeys(nullRow, "k") }
    assert(nul.getMessage.contains("NULL key"))
    intercept[IllegalArgumentException] {
      table.upsertKeys(Seq((9L, "x")).toDF("k", "v"), "v") // not the PK
    }
    // the failed attempts never published a version
    assert(table.currentVersion == v0 + 1)
  }
}
