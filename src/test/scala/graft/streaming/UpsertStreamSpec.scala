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
}
