package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingDedupSpec extends SparkTestBase {

  import Streams._

  test("streamingDedup drops duplicate keys within the watermark horizon") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.streamingDedup(mem.toDF(), Seq("event_id"), horizon = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 09:$m%02d:00")
      mem.addData(
        Event(1, ts(0), 1, "view", 1.0),
        Event(1, ts(1), 1, "view", 1.0), // dup within horizon -> dropped
        Event(2, ts(2), 1, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(3), 1, "view", 1.0)) // still within horizon -> dropped
      q.processAllAvailable()
      val ids = spark.table("dedup_out").as[Event].collect().map(_.event_id).sorted.toSeq
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }
}
