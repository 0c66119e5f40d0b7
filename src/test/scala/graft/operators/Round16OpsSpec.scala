package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

/** Hand fixtures for the round-16 operators: tok8 (context-length
  * truncation loss), smp5 (deterministic per-source reservoir), ev24
  * (longest consecutive-day streaks), fd2 (candidate-key profiling).
  * Each pins exact values computed by hand — the DuckDB oracle is the
  * third anchor, checked by the driver gate.
  */
class Round16OpsSpec extends SparkTestBase {

  test("tok8: hand-computed truncation loss at one context length") {
    import spark.implicits._
    // token counts 2 and 5; ctx 3 -> 1 of 2 docs truncated, 2 of 7
    // tokens lost
    val dir = java.nio.file.Files.createTempDirectory("tok8").toString
    Seq((1L, "a b"), (2L, "a b c d e"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.truncationLoss(spark, dir, lens = Seq(3)).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getInt(0) == 3 && r.getLong(1) == 2L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 0.5)
    assert(r.getLong(4) == 7L && r.getLong(5) == 2L)
    assert(r.getDouble(6) == 2.0 / 7.0)
  }

  test("tok8: a context length past every doc loses nothing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tok8z").toString
    Seq((1L, "a b"), (2L, "a b c"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.truncationLoss(spark, dir, lens = Seq(100)).collect().head
    assert(r.getLong(2) == 0L && r.getLong(5) == 0L && r.getDouble(6) == 0.0)
  }

  test("smp5: deterministic reservoir — size, membership, and the md5 rank checked independently") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("smp5").toString
    val docs = (1L to 9L).map(i => (if (i <= 7) "A" else "B", i, "t"))
    docs.toDF("source", "doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.reservoirSample(spark, dir, k = 2).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // source A has 7 docs -> 2 sampled; B has 2 -> both
    assert(out.count(_._1 == "A") == 2 && out.count(_._1 == "B") == 2)
    assert(out.map(_._2).forall(rk => rk == 1 || rk == 2))
    // independent rank check: java MessageDigest MD5, the operator's
    // exact coin (first 8 hex chars of md5("smp5#<id>") as a fraction)
    def frac(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"smp5#$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val expectA = (1L to 7L).sortBy(id => (frac(id), id)).take(2)
    assert(out.filter(_._1 == "A").sortBy(_._2).map(_._3).toSeq == expectA,
      s"A sample must be the 2 smallest md5 ranks: got ${out.mkString(";")}")
    // re-running yields the identical sample (determinism)
    val again = TextAnalysis.reservoirSample(spark, dir, k = 2).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(again.toSeq == out.toSeq)
  }

  test("ev24: gaps-and-islands streaks by hand") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ev24").toString
    def ts(day: Int, h: Int = 1): Timestamp =
      new Timestamp((day.toLong * 86400 + h * 3600) * 1000)
    // u1 days {0,1,2,5,6} -> max streak 3; u2 {0} -> 1; u3 {10,11} -> 2;
    // u4 {1,3,5} -> 1. Two events the same day must not double-count.
    val ev = Seq(
      (1L, ts(0)), (2L, ts(1)), (3L, ts(2)), (4L, ts(5)), (5L, ts(6)),
      (6L, ts(0, 5)), // u1 duplicate day 0, different hour
      (7L, ts(0))).map { case (id, t) => (id, t, 1L, "click", 1.0, "{}") } ++
      Seq((8L, ts(0), 2L, "click", 1.0, "{}")) ++
      Seq((9L, ts(10), 3L, "click", 1.0, "{}"), (10L, ts(11), 3L, "click", 1.0, "{}")) ++
      Seq((11L, ts(1), 4L, "click", 1.0, "{}"), (12L, ts(3), 4L, "click", 1.0, "{}"),
        (13L, ts(5), 4L, "click", 1.0, "{}"))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val rows = Analytics.activityStreaks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows == Map(1L -> 2L, 2L -> 1L, 3L -> 1L),
      s"streak distribution: got $rows") // 1 day: u2,u4; 2 days: u3; 3 days: u1
  }

  test("ts8: hand-computed Theil-Sen slope (median of pairwise slopes)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ts8").toString
    def ts(day: Int): Timestamp = new Timestamp((day.toLong * 86400 + 3600) * 1000)
    // daily totals 1.0 / 3.0 / 4.0 -> slopes (0,1)=2.0, (0,2)=1.5,
    // (1,2)=1.0 -> sorted [1.0, 1.5, 2.0], median (rn=2) = 1.5
    Seq(
      (1L, ts(0), 1L, "click", 1.0, "{}"),
      (2L, ts(1), 1L, "click", 2.0, "{}"), (3L, ts(1), 2L, "click", 1.0, "{}"),
      (4L, ts(2), 1L, "click", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val r = Analytics.theilSenTrend(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 3L && r.head.getLong(1) == 3L)
    assert(r.head.getDouble(2) == 1.5, s"got ${r.head.getDouble(2)}")
  }

  test("ts8: a NULL-ts event drops out instead of minting epoch day 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ts8n").toString
    def ts(day: Int): Timestamp = new Timestamp((day.toLong * 86400 + 3600) * 1000)
    // same fixture as the hand-computed case, at days 10..12 (so a
    // phantom epoch-day-0 group would CHANGE every slope), plus one
    // NULL-ts event — the oracle's NULL day never satisfies a.x < b.x,
    // so both engines must keep n_days=3 and slope=1.5
    Seq(
      (1L, ts(10), 1L, "click", 1.0, "{}"),
      (2L, ts(11), 1L, "click", 2.0, "{}"), (3L, ts(11), 2L, "click", 1.0, "{}"),
      (4L, ts(12), 1L, "click", 4.0, "{}"),
      (5L, null.asInstanceOf[Timestamp], 1L, "click", 99.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val r = Analytics.theilSenTrend(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 3L && r.head.getLong(1) == 3L)
    assert(r.head.getDouble(2) == 1.5, s"got ${r.head.getDouble(2)}")
  }

  test("ts8: an outlier day cannot move the slope (robustness property)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ts8r").toString
    def ts(day: Int): Timestamp = new Timestamp((day.toLong * 86400 + 3600) * 1000)
    // days 0..6 perfectly linear (value = day + 1) except day 3 spikes to
    // 1000: most pairwise slopes stay 1.0, so the median does too
    val ev = (0 until 7).map { d =>
      val v = if (d == 3) 1000.0 else d + 1.0
      ((d + 1).toLong, ts(d), 1L, "click", v, "{}")
    }
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val r = Analytics.theilSenTrend(spark, dir).collect().head
    assert(r.getLong(1) == 21L) // C(7,2)
    assert(r.getDouble(2) == 1.0, s"outlier moved the Theil-Sen slope: ${r.getDouble(2)}")
  }

  test("cal2: bins agree with cal1; per-bin Brier dominates its reliability term (Jensen)") {
    val dir = sfDir
    val cal2 = Analytics.brierDecomposition(spark, dir).collect()
    assert(cal2.nonEmpty)
    val cal1 = Analytics.marginCalibration(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    cal2.foreach { r =>
      val (bin, n, meanP, posRate, brier, rel) =
        (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      // same bin grid, same population, same labels as cal1
      assert(cal1(bin) == ((n, (posRate * n).round)), s"bin $bin diverged from cal1")
      assert(meanP >= 0.0 && meanP <= 1.0 && brier >= 0.0 && brier <= 1.0)
      // E[(p-y)^2] >= (E[p-y])^2 — micros rounding bounds the slack
      assert(brier + 1e-6 >= rel, s"bin $bin: brier $brier < reliability $rel")
    }
  }

  test("fd2: candidate keys and uniqueness ratios by hand") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fd2").toString
    Seq(
      (1L, 1L, "O", 10.0, Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
      (2L, 1L, "O", 10.0, Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
      (3L, 2L, "F", 20.0, Timestamp.valueOf("2024-01-02 00:00:00"), "1-URGENT"),
      (4L, 2L, "F", 30.0, Timestamp.valueOf("2024-01-02 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val rows = Warehouse.candidateKeys(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getDouble(4))))
      .toMap
    assert(rows("o_orderkey") == ((4L, 4L, true, 1.0)))
    assert(rows("o_custkey") == ((2L, 4L, false, 0.5)))
    assert(rows("o_orderstatus") == ((2L, 4L, false, 0.5)))
    assert(rows("o_totalprice") == ((3L, 4L, false, 0.75)))
    assert(rows("o_orderdate") == ((2L, 4L, false, 0.5)))
    assert(rows("o_orderpriority") == ((1L, 4L, false, 0.25)))
    // output is one row per profiled column, sorted
    assert(rows.size == 6)
  }
}
