package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase
import graft.functions.UuidFunctions
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkTestBase {

  test("asofJoin picks the latest right row at-or-before each left time") {
    import spark.implicits._
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val left = Seq((1L, ts(5)), (1L, ts(20)), (2L, ts(10)), (3L, ts(10)))
      .toDF("k", "t")
    val right = Seq((1L, ts(0), "a"), (1L, ts(5), "b"), (1L, ts(15), "c"), (2L, ts(11), "late"))
      .toDF("k", "t", "v")
    val out = AsOf.asofJoin(left, right, "k", "t", Seq("v"))
      .orderBy("k", "t").collect()
    // k=1 @10:05 -> "b" (exact at-or-before), @10:20 -> "c"
    assert(out(0).getString(2) == "b")
    assert(out(1).getString(2) == "c")
    // k=2 @10:10: only right row is later -> null
    assert(out(2).isNullAt(2))
    // k=3: no right rows at all -> null
    assert(out(3).isNullAt(2))
  }

  test("asofJoin forward picks the earliest right at-or-after, carrying its timestamp") {
    import spark.implicits._
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val left = Seq((1L, ts(5)), (1L, ts(16)), (2L, ts(10)), (3L, ts(10)))
      .toDF("k", "t")
    val right = Seq((1L, ts(5), "same"), (1L, ts(15), "c"), (2L, ts(9), "early"))
      .toDF("k", "t", "v")
    val out = AsOf.asofJoin(left, right, "k", "t", Seq("v"),
      forward = true, carryRightTimeAs = Some("rt"))
      .orderBy("k", "t").collect()
    // k=1 @10:05 -> the SAME-instant right row (at-or-after includes ties)
    assert(out(0).getString(2) == "same" && out(0).getTimestamp(3) == ts(5))
    // k=1 @10:16 -> nothing at-or-after
    assert(out(1).isNullAt(2) && out(1).isNullAt(3))
    // k=2 @10:10: the only right row is EARLIER -> null
    assert(out(2).isNullAt(2))
    // k=3: no right rows at all -> null
    assert(out(3).isNullAt(2))
  }

  test("rangeJoin: integer bucket ids keep far-future (year-9999) pairs joined") {
    import spark.implicits._
    // past ~2^51 us the old double bucket chain could floor a pair into
    // non-overlapping buckets; exercise the [t-3600, t] lookback at the
    // extreme timestamp range plus a boundary-exact pair
    val far = Timestamp.valueOf("9999-12-31 23:00:00")
    val farM30 = Timestamp.valueOf("9999-12-31 22:30:00")
    val farM60 = Timestamp.valueOf("9999-12-31 22:00:00")
    val farM61 = Timestamp.valueOf("9999-12-31 21:59:00")
    val left = Seq((1L, far)).toDF("k", "t")
    val right = Seq((1L, farM30, "in30"), (1L, farM60, "edge60"), (1L, farM61, "out61"))
      .toDF("k", "t", "v")
    // left.t in [right.t + 0, right.t + 3600] == right within the hour
    // BEFORE the left row (eventRangeHour's lookback shape)
    val out = AsOf.rangeJoin(left, right, "k", "t", 0L, 3600L, Seq("v"))
      .select(col("v")).collect().map(_.getString(0)).sorted.toSeq
    assert(out == Seq("edge60", "in30"), s"got $out")
  }

  test("ev4 returns one row per view event with monotone state per user") {
    val rows = AsOf.eventAsofPurchase(spark, sfDir).collect()
    val nViews = graft.Engine.table(spark, sfDir, "events")
      .filter(col("event_type") === "view").count()
    assert(rows.length == nViews)
  }

  test("ev7 funnel stages are prefix-consistent and strictly ordered in time") {
    val rows = Relational.eventFunnel(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stage = r.getInt(1)
      val v = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val c = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val p = if (r.isNullAt(4)) None else Some(r.getLong(4))
      // stage counts exactly the non-null prefix: no click without a view, etc.
      assert(stage == Seq(v, c, p).count(_.isDefined))
      assert(c.isEmpty || v.isDefined)
      assert(p.isEmpty || c.isDefined)
      // the sequence constraint is strict in event time
      for (tv <- v; tc <- c) assert(tc > tv)
      for (tc <- c; tp <- p) assert(tp > tc)
    }
  }

  test("uuid canonical text round-trips through binary (table_schema_test.test value)") {
    val u = "550e8400-e29b-41d4-a716-446655440000"
    val row = spark.sql(s"SELECT '$u' AS t")
      .select(UuidFunctions.uuidCanonical(UuidFunctions.uuidToBinary(col("t"))).as("rt"),
        length(UuidFunctions.uuidToBinary(col("t"))).as("n"))
      .head
    assert(row.getString(0) == u)
    assert(row.getInt(1) == 16)
  }
}
