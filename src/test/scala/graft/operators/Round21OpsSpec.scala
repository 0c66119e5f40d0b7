package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand fixtures for the round-21 operators: stat4 (grouped weighted
  * median over distinct price levels), ev31 (pre-first-purchase
  * activity), ts14 (spectral entropy of the ts11 periodogram), txt19
  * (corpus character-bigram entropy). Each pins exact values computed
  * by hand or by an INDEPENDENT in-spec implementation; the DuckDB
  * oracle is the third anchor, checked by the driver gate.
  */
class Round21OpsSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def mic(x: Double): Double = // Exact.dsum's micros rounding
    (if (x >= 0) math.floor(x * 1e6 + 0.5) else math.ceil(x * 1e6 - 0.5)) / 1e6

  private def tsOf(sec: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  // === stat4 ===============================================================

  test("stat4: weighted median picks the lowest price level reaching half the weight") {
    import spark.implicits._
    val dir = tmp("stat4")
    // flag A: prices 10 (w 1), 20 (w 2), 30 (w 1) -> tot 4; cum at 10 is
    // 1 (2*1 < 4), at 20 is 3 (6 >= 4) -> median 20. The 20-weight
    // arrives as TWO rows (1.5 + 0.5) so the per-level pre-aggregation
    // is exercised. flag B: a single level -> median is that level.
    val rows = Seq(
      ("A", 10.0, 1.0), ("A", 20.0, 1.5), ("A", 20.0, 0.5), ("A", 30.0, 1.0),
      ("B", 5.0, 10.0))
    rows.toDF("l_returnflag", "l_extendedprice", "l_quantity")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val r = Analytics.weightedMedian(spark, dir).collect()
    assert(r.length == 2)
    val byFlag = r.map(x => x.getString(0) -> x).toMap
    assert(byFlag("A").getDouble(1) == 20.0 && byFlag("A").getDouble(2) == 4.0)
    assert(byFlag("B").getDouble(1) == 5.0 && byFlag("B").getDouble(2) == 10.0)
  }

  test("stat4: even split takes the LOWER level (cum*2 == tot boundary)") {
    import spark.implicits._
    val dir = tmp("stat4b")
    // weights 2,2: cum at 10 is 2, 2*2 >= 4 -> the boundary level wins
    Seq(("A", 10.0, 2.0), ("A", 20.0, 2.0))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val r = Analytics.weightedMedian(spark, dir).collect()
    assert(r.length == 1 && r(0).getDouble(1) == 10.0)
  }

  // === ev31 ================================================================

  test("ev31: counts strictly-before events and first-event gap; non-converters drop") {
    import spark.implicits._
    val dir = tmp("ev31")
    // user 1: view@100, purchase@200, view@300 -> 1 before, gap 100 s
    // user 2: views only -> excluded
    // user 3: purchase first -> 0 before, gap 0
    // user 4: view@250, purchase@300, purchase@400 -> first purchase 300,
    //         1 before, gap 50 s; the @300 purchase itself is NOT "before"
    val rows = Seq(
      (1L, "view", 100L), (1L, "purchase", 200L), (1L, "view", 300L),
      (2L, "view", 10L), (2L, "view", 20L),
      (3L, "purchase", 50L),
      (4L, "view", 250L), (4L, "purchase", 300L), (4L, "purchase", 400L))
    rows.map { case (u, t, sec) => (u, t, tsOf(sec)) }
      .toDF("user_id", "event_type", "ts")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val r = Analytics.prepurchaseActivity(spark, dir).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L))
    val byU = r.map(x => x.getLong(0) -> x).toMap
    assert(byU(1L).getLong(1) == 1L && byU(1L).getLong(2) == 100000000L)
    assert(byU(3L).getLong(1) == 0L && byU(3L).getLong(2) == 0L)
    assert(byU(4L).getLong(1) == 1L && byU(4L).getLong(2) == 50000000L)
  }

  // === ts14 ================================================================

  test("ts14: entropy matches an independent recompute over ts11's rounded powers") {
    import spark.implicits._
    val dir = tmp("ts14")
    def tsOfDay(d: Int): java.sql.Timestamp =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(d.toLong * 86400))
    // the ts11 fixture signal: period-4 dominant, others leak smaller
    val v = Seq(110.0, 100.0, 90.0, 100.0, 110.0, 100.0, 90.0, 100.0)
    v.zipWithIndex.map { case (p, d) => (d.toLong, tsOfDay(d), p) }
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    // independent recompute: take the (spec-pinned) ts11 powers, build
    // p_i over the exact decimal total, micros-round each entropy term
    val powers = Analytics.periodogram(spark, dir).collect()
      .map(r => r.getDouble(4)).toSeq
    val totU = powers.map(p => math.round(p * 1e4)).sum
    val tot = totU.toDouble / 1e4
    val expected = mic(powers.filter(_ > 0.0).map { p =>
      val pr = p / tot
      mic(-pr * math.log(pr) / math.log(2.0))
    }.sum)
    val r = Analytics.spectralEntropy(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 13L)
    assert(r(0).getLong(1) == powers.count(_ > 0.0).toLong)
    assert(r(0).getDouble(2) == tot, s"total_power ${r(0).getDouble(2)} vs $tot")
    val h = r(0).getDouble(3)
    assert(math.abs(h - expected) < 1e-9, s"entropy $h vs recompute $expected")
    assert(h >= 0.0 && h <= math.log(13.0) / math.log(2.0) + 1e-9,
      "entropy bounded by log2(grid size)")
  }

  // === txt19 ===============================================================

  test("txt19: hand-computed bigram distribution of 'ab ab'; degenerate docs add nothing") {
    import spark.implicits._
    val dir = tmp("txt19")
    // "AB  ab" normalizes to "ab ab": bigrams ab, "b ", " a", ab ->
    // counts {ab:2, "b ":1, " a":1}, H = 1.5 bits exactly.
    // A 1-char doc and a NULL doc contribute no bigrams.
    Seq((1L, "AB  ab"), (2L, "x"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.charBigramEntropy(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 4L, s"n_bigrams ${r(0).getLong(0)}")
    assert(r(0).getLong(1) == 3L)
    assert(r(0).getDouble(2) == 1.5, s"entropy ${r(0).getDouble(2)}")
  }
}
