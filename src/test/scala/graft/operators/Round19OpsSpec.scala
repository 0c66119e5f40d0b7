package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand fixtures for the round-19 operators: priv3 (t-closeness EMD
  * audit), corr4 (Kendall τ_b of the daily series), drift2 (month-over-
  * month PSI), ev26 (per-user event-type entropy), plus the dd19 df-cap
  * audit fixture legs living in DedupSpec. Each pins exact values
  * computed by hand or by an INDEPENDENT implementation inside the spec
  * (textbook formulas, brute-force pair loops) — the DuckDB oracle is
  * the third anchor, checked by the driver gate.
  */
class Round19OpsSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rnd9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
  private def mic(x: Double): Double = // Exact.dsum's micros rounding
    (if (x >= 0) math.floor(x * 1e6 + 0.5) else math.ceil(x * 1e6 - 0.5)) / 1e6

  private def dateOf(s: String): java.sql.Date = java.sql.Date.valueOf(s)
  private def tsOfDay(d: Int): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(d.toLong * 86400))

  // === priv3 ===============================================================

  /** orders/customer/nation fixture: ONE nation + segment + year, so a
    * single QI group whose distribution IS the global one.
    */
  private def privFixture(prios: Seq[(String, Int)],
      secondGroup: Option[Seq[(String, Int)]] = None): String = {
    import spark.implicits._
    val dir = tmp("priv3")
    Seq((0L, "A", 0L)).toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.parquet(s"$dir/nation.parquet")
    Seq((1L, 0L, "SEG"), (2L, 0L, "SG2")).toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    val g1 = prios.flatMap { case (p, n) => Seq.fill(n)((1L, p)) }
    val g2 = secondGroup.toSeq.flatten.flatMap { case (p, n) => Seq.fill(n)((2L, p)) }
    (g1 ++ g2).zipWithIndex
      .map { case ((ck, p), i) => (i.toLong, ck, p, dateOf("1995-06-01"), 100.0) }
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    dir
  }

  test("priv3: a lone QI group matches the global distribution — t = 0") {
    val r = Analytics.tClosenessAudit(spark, privFixture(
      Seq("1-URGENT" -> 3, "3-MEDIUM" -> 5, "5-LOW" -> 2))).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 1L && r(0).getLong(1) == 10L) // n_groups, n_rows
    assert(r(0).getDouble(2) == 0.0, s"t was ${r(0).getDouble(2)}")
    assert(r(0).getLong(3) == 0L && r(0).getLong(4) == 0L)
  }

  test("priv3: hand-computed ordered EMD for a two-group skew") {
    // group SEG: 4x URGENT; group SG2: 4x LOW. Global: p(URGENT)=0.5,
    // p(LOW)=0.5, m=2. For SEG: diffs (1-0.5, 0-0.5) -> cums (0.5, 0.0)
    // -> EMD = (0.5+0.0)/(2-1) = 0.5; symmetric for SG2.
    val r = Analytics.tClosenessAudit(spark, privFixture(
      Seq("1-URGENT" -> 4), secondGroup = Some(Seq("5-LOW" -> 4)))).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 2L && r(0).getLong(1) == 8L)
    assert(r(0).getDouble(2) == 0.5, s"t was ${r(0).getDouble(2)}")
    assert(r(0).getLong(3) == 2L, "both groups exceed t=0.2")
    assert(r(0).getLong(4) == 8L)
    assert(r(0).getDouble(5) == 1.0)
  }

  // === corr4 ===============================================================

  private def runKendall(xs: Seq[Double], ys: Seq[Double]): org.apache.spark.sql.Row = {
    import spark.implicits._
    val dir = tmp("corr4")
    xs.zipWithIndex.map { case (v, d) => (tsOfDay(d), v) }.toDF("ts", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    // testdata's o_orderdate is timestamp[us]; the fixture matches
    ys.zipWithIndex.map { case (v, d) => (d.toLong, tsOfDay(d), v) }
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val rows = Analytics.kendallDaily(spark, dir).collect()
    assert(rows.length == 1)
    rows.head
  }

  test("corr4: perfect concordance reads tau = 1, discordance -1") {
    val up = runKendall(Seq(1.0, 2.0, 3.0, 4.0), Seq(10.0, 20.0, 30.0, 40.0))
    assert(up.getLong(0) == 4L && up.getLong(1) == 6L) // n, S = C(4,2)
    assert(up.getDouble(4) == 1.0)
    val down = runKendall(Seq(1.0, 2.0, 3.0), Seq(9.0, 8.0, 7.0))
    assert(down.getLong(1) == -3L && down.getDouble(4) == -1.0)
  }

  test("corr4: ties enter tau_b's denominator, not S") {
    // x = (1,1,2), y = (5,6,7): pairs (1,2): x tie -> 0; (1,3): +1;
    // (2,3): +1 => S = 2. tie_pairs_x = 1, tie_pairs_y = 0.
    // tau_b = 2 / sqrt((3-1)*3) = 2/sqrt(6) doubled form:
    // 2*2 / sqrt((6-2)*(6-0)) = 4/sqrt(24) = 0.816496...
    val r = runKendall(Seq(1.0, 1.0, 2.0), Seq(5.0, 6.0, 7.0))
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 1L && r.getLong(3) == 0L)
    assert(r.getDouble(4) == rnd9(4.0 / math.sqrt(24.0)), s"tau ${r.getDouble(4)}")
  }

  test("corr4: all-tied series has NULL tau (zero denominator)") {
    val r = runKendall(Seq(2.0, 2.0, 2.0), Seq(1.0, 2.0, 3.0))
    assert(r.getLong(1) == 0L)
    assert(r.isNullAt(4), "d1 = 0 must yield NULL, not NaN/Inf")
  }

  test("corr4 registry siting: per-month tau_b over (daily count, daily revenue)") {
    import spark.implicits._
    val dir = tmp("corr4m")
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    // Jan 1995 daily series: day1 (1 order, 10.0), day2 (2 orders, 15.0),
    // day3 (2 orders, 20.0) -> x=(1,2,2), y=(10,15,20): pairs (1,2) +1,
    // (1,3) +1, (2,3) x-tie -> S=2, tie_x=1, tie_y=0,
    // tau = 2*2/sqrt((6-2)*6) = 4/sqrt(24). Mar 1995: one day -> no
    // pairs, d1=0 -> NULL tau (the 1-day-month left-join leg).
    Seq(
      (1L, ts("1995-01-01T00:00:00Z"), 10.0),
      (2L, ts("1995-01-02T00:00:00Z"), 5.0),
      (3L, ts("1995-01-02T01:00:00Z"), 10.0),
      (4L, ts("1995-01-03T00:00:00Z"), 8.0),
      (5L, ts("1995-01-03T02:00:00Z"), 12.0),
      (6L, ts("1995-03-10T00:00:00Z"), 50.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val out = Analytics.kendallMonthly(spark, dir).collect()
    assert(out.length == 2, s"two months expected: ${out.toSeq}")
    val jan = out(0); val mar = out(1)
    assert(jan.getLong(0) == 1995L * 12) // Jan 1995 month index
    assert((jan.getLong(1), jan.getLong(2), jan.getLong(3), jan.getLong(4)) ==
      (3L, 2L, 1L, 0L), s"jan: $jan")
    assert(jan.getDouble(5) == rnd9(4.0 / math.sqrt(24.0)), s"tau ${jan.getDouble(5)}")
    assert(mar.getLong(0) == 1995L * 12 + 2 && mar.getLong(1) == 1L)
    assert(mar.getLong(2) == 0L && mar.isNullAt(5), s"1-day month: $mar")
  }

  test("corr4: randomized brute-force equivalence (fixed seed)") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 5).foreach { _ =>
      val n = 2 + rnd.nextInt(9)
      // coarse grid forces ties; money-scale values keep micros exact
      val xs = Seq.fill(n)((rnd.nextInt(4) + 1) * 0.25)
      val ys = Seq.fill(n)((rnd.nextInt(4) + 1) * 0.5)
      val r = runKendall(xs, ys)
      // independent O(n^2) implementation
      var s = 0L
      for (i <- 0 until n; j <- i + 1 until n)
        s += math.signum(xs(j).compare(xs(i))).toLong *
          math.signum(ys(j).compare(ys(i))).toLong
      val tx2 = xs.groupBy(identity).values.map(g => g.size.toLong * (g.size - 1)).sum
      val ty2 = ys.groupBy(identity).values.map(g => g.size.toLong * (g.size - 1)).sum
      val n2 = n.toLong * (n - 1)
      assert(r.getLong(1) == s, s"S mismatch on $xs / $ys")
      assert(r.getLong(2) == tx2 / 2 && r.getLong(3) == ty2 / 2)
      if (n2 - tx2 > 0 && n2 - ty2 > 0)
        assert(r.getDouble(4) ==
          rnd9(s.toDouble * 2.0 / math.sqrt((n2 - tx2).toDouble * (n2 - ty2).toDouble)))
      else assert(r.isNullAt(4))
    }
  }

  // === drift2 ==============================================================

  private def runPsi(monthOrders: Map[String, Seq[Double]]): Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val dir = tmp("drift2")
    monthOrders.toSeq.flatMap { case (ym, prices) => prices.map(ym -> _) }
      .zipWithIndex
      .map { case ((ym, p), i) => (i.toLong, dateOf(s"$ym-15"), p) }
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    Analytics.psiMonthly(spark, dir).collect().toSeq
  }

  test("drift2: identical adjacent months read PSI = 0; a gap month breaks the chain") {
    val rows = runPsi(Map(
      "1995-01" -> Seq(10000.0, 70000.0), // buckets 0 and 1
      "1995-02" -> Seq(10000.0, 70000.0),
      "1995-04" -> Seq(10000.0, 70000.0))) // March missing: no Apr row
    assert(rows.length == 1, s"only Feb compares: $rows")
    val feb = rows.head
    assert(feb.getLong(1) == 2L) // n_orders
    assert(feb.getDouble(2) == 0.0 && !feb.getBoolean(3))
  }

  test("drift2: hand-computed PSI for a full bucket shift") {
    // Jan: 4 orders in bucket 0; Feb: 4 orders in bucket 9 (>= 540000).
    // Smoothed p_b = (c+1)/14: Feb p0 = 1/14, p9 = 5/14; Jan q0 = 5/14,
    // q9 = 1/14; other 8 buckets p = q = 1/14 -> zero terms.
    // PSI = 2 * (4/14) * ln(5) with each term micros-rounded pre-sum.
    val rows = runPsi(Map(
      "1995-01" -> Seq.fill(4)(10000.0),
      "1995-02" -> Seq.fill(4)(580000.0)))
    assert(rows.length == 1)
    val term = mic((5.0 / 14 - 1.0 / 14) * math.log(5.0)) // symmetric +/- pair
    val expected = mic(term) + mic(term)
    assert(rows.head.getDouble(2) == expected, s"psi ${rows.head.getDouble(2)} vs $expected")
    assert(rows.head.getBoolean(3), "a full shift must alert (psi > 0.2)")
  }

  // === ev27 ================================================================

  private def runKm(events: Seq[(Long, Int, String)]): Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val dir = tmp("ev27")
    events.zipWithIndex
      .map { case ((u, d, t), i) => (i.toLong, u, t, tsOfDay(d), 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    Analytics.kaplanMeier(spark, dir).collect().toSeq
  }

  test("ev27: hand-computed survival with censoring; censor-only days emit no step") {
    // u1: entry day0, purchase day2 (dur 2). u2: entry day0, never
    // purchases, horizon day4 (dur 4, censored). u3: entry day1,
    // purchase day1 (dur 0).
    val rows = runKm(Seq(
      (1L, 0, "view"), (1L, 2, "purchase"),
      (2L, 0, "view"), (2L, 4, "view"),
      (3L, 1, "view"), (3L, 1, "purchase")))
    assert(rows.map(_.getLong(0)) == Seq(0L, 2L), "event days only (censor day 4 is no step)")
    val r0 = rows(0); val r2 = rows(1)
    assert((r0.getLong(1), r0.getLong(2), r0.getLong(3)) == (3L, 1L, 0L))
    assert(r0.getDouble(4) == rnd9(1.0 * (1.0 - 1.0 / 3.0)))
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3)) == (2L, 1L, 0L))
    assert(r2.getDouble(4) == rnd9(1.0 * (1.0 - 1.0 / 3.0) * (1.0 - 1.0 / 2.0)))
  }

  test("ev27: same-day events precede censoring (both stay in the risk set)") {
    // u1: purchase at dur 1; u2: censored at dur 1 (horizon day1);
    // u3: purchase at dur 0. Day-1 risk set must include BOTH u1 and u2.
    val rows = runKm(Seq(
      (1L, 0, "view"), (1L, 1, "purchase"),
      (2L, 0, "view"),
      (3L, 0, "purchase")))
    assert(rows.map(_.getLong(0)) == Seq(0L, 1L))
    val r1 = rows(1)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == (2L, 1L, 1L),
      s"risk set 2 with 1 event + 1 same-day censor: $r1")
    assert(r1.getDouble(4) == rnd9((1.0 - 1.0 / 3.0) * (1.0 - 1.0 / 2.0)))
  }

  // === ts10 ================================================================

  test("ts10: calendar lags skip gap days; hand-computed MASE") {
    import spark.implicits._
    val dir = tmp("ts10")
    // days 0..7 revenue 100+d, then a GAP at day 8, then day 9 at 200:
    // lag-1 pairs = days 1..7 (day 9's calendar predecessor is missing),
    // each |e| = 1 -> mae1 = 1. lag-7 pairs = day 7 (vs day 0, |e| = 7)
    // and day 9 (vs day 2, |e| = 98) -> mae7 = 105/2 = 52.5.
    val days = (0 to 7).map(d => (d, 100.0 + d)) :+ ((9, 200.0))
    days.zipWithIndex.map { case ((d, v), i) => (i.toLong, tsOfDay(d), v) }
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val r = Analytics.seasonalNaiveMase(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 7L && r(0).getLong(1) == 2L, s"pair counts: ${r(0)}")
    assert(r(0).getDouble(2) == 1.0 && r(0).getDouble(3) == 52.5)
    assert(r(0).getDouble(4) == rnd9(52.5))
  }

  test("ts10: a flat series has zero lag-1 MAE — MASE is NULL, not Inf") {
    import spark.implicits._
    val dir = tmp("ts10f")
    (0 to 9).map(d => (d.toLong, tsOfDay(d), 50.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val r = Analytics.seasonalNaiveMase(spark, dir).collect()(0)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
    assert(r.isNullAt(4), "0/0 MASE must be NULL on both engines")
  }

  // === imp2 ================================================================

  test("imp2: estimators match an independent md5-coin recomputation") {
    import spark.implicits._
    val dir = tmp("imp2")
    val n = 200
    (1 to n).map(k => (k.toLong, tsOfDay(k % 30), 10.0 * k))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    // order k carries (k % 4 + 1) lineitems
    (1 to n).flatMap(k => (0 until (k % 4 + 1)).map(j => (k.toLong, j.toLong)))
      .toDF("l_orderkey", "l_linenumber")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    // independent coin (exp5 discipline): MessageDigest md5 hex head
    def frac(key: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"imp2#$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val sampled = (1 to n).filter(k => frac(k.toLong) < 0.2)
    assert(sampled.nonEmpty, "fixture must sample some orders")
    val ySample = sampled.map(k => 10.0 * k).sum
    val xSample = sampled.map(k => k % 4 + 1).sum
    val xTotal = (1 to n).map(k => k % 4 + 1).sum
    val yTrue = (1 to n).map(k => 10.0 * k).sum
    val r = Analytics.ratioEstimate(spark, dir).collect()(0)
    assert(r.getLong(0) == sampled.size && r.getLong(1) == n.toLong)
    assert(r.getLong(2) == xTotal.toLong)
    assert(math.abs(r.getDouble(4) - ySample / 0.2) < 1e-6, s"HT ${r.getDouble(4)}")
    assert(math.abs(r.getDouble(5) - ySample / xSample * xTotal) < 1e-6,
      s"ratio ${r.getDouble(5)}")
    assert(r.getDouble(6) == rnd9(math.abs(ySample / 0.2 - yTrue) / yTrue))
  }

  // === dd20 ================================================================

  test("dd20: token-reordered docs score 1.0; repetition enters via multiset min/max") {
    import spark.implicits._
    val dir = tmp("dd20")
    Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"), // reorder: bag-identical
      (3L, "alpha alpha beta"),
      (4L, "alpha beta beta"), // min alpha 1 + beta 1 = 2; max = 3+3-2 = 4
      (5L, "zq1 zq2 zq3 zq4 zq5")) // disjoint: no pair
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = Dedup.weightedJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(rows((1L, 2L)) == (4L, 4L, 4L, 1.0), s"reordered pair: ${rows.get((1L, 2L))}")
    assert(rows((3L, 4L)) == (2L, 3L, 3L, 0.5), s"repeated pair: ${rows.get((3L, 4L))}")
    assert(!rows.keySet.exists(p => p._1 == 5L || p._2 == 5L), "disjoint doc pairs nothing")
  }

  // === lm4 =================================================================

  private def runGt(texts: Seq[String]): Map[Long, (Long, Option[Double], Double)] = {
    import spark.implicits._
    val dir = tmp("lm4")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    TextAnalysis.goodTuring(spark, dir).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getDouble(3)))).toMap
  }

  test("lm4: hand frequency-of-frequencies, adjusted counts, unseen mass") {
    // counts: a:3 b:2 c:1 -> N_1=N_2=N_3=1, total mass 6
    val gt = runGt(Seq("a a a b b c"))
    assert(gt.keySet == Set(1L, 2L, 3L))
    assert(gt(1L) == (1L, Some(2.0), rnd9(1.0 / 6)), s"r=1: ${gt(1L)}")
    assert(gt(2L) == (1L, Some(3.0), rnd9(2.0 / 6)))
    assert(gt(3L) == (1L, None, rnd9(3.0 / 6)), "top class has no N_{r+1}")
  }

  test("lm4: a gap in the count classes yields NULL r* (the SGT fitted-line regime)") {
    // counts: a:3 b:1 -> classes {1, 3}; r=1 has no ADJACENT r=2 class
    val gt = runGt(Seq("a a a b"))
    assert(gt.keySet == Set(1L, 3L))
    assert(gt(1L)._2.isEmpty, "N_2 = 0 must not borrow N_3")
  }

  // === fd4 =================================================================

  test("fd4: g3 counts exactly the minimum rows to remove") {
    import spark.implicits._
    val dir = tmp("fd4")
    // orders: o_orderkey unique (g3=0 for key->status);
    // o_custkey->o_orderpriority: cust 1 has [H,H,H,L] (remove 1),
    // cust 2 has [M,M] (clean) -> g3 = 1/6
    Seq((1L, 1L, "O", "H"), (2L, 1L, "O", "H"), (3L, 1L, "F", "H"),
      (4L, 1L, "F", "L"), (5L, 2L, "O", "M"), (6L, 2L, "F", "M"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    // customer: c_nationkey->c_mktsegment: nation 0 [A,A,B] (remove 1),
    // nation 1 [C] -> g3 = 1/4
    Seq((1L, 0L, "A"), (2L, 0L, "A"), (3L, 0L, "B"), (4L, 1L, "C"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .coalesce(1).write.parquet(s"$dir/customer.parquet")
    Seq((0L, "X", 0L), (1L, "Y", 1L)).toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.parquet(s"$dir/nation.parquet")
    val g3 = Warehouse.approxFdG3(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1.0 else r.getDouble(5)))).toMap
    assert(g3(("orders", "o_orderkey")) == (6L, 0L, 0.0))
    assert(g3(("orders", "o_custkey")) == (6L, 1L, 1.0 / 6.0), s"${g3(("orders", "o_custkey"))}")
    assert(g3(("customer", "c_custkey")) == (4L, 0L, 0.0))
    assert(g3(("customer", "c_nationkey")) == (4L, 1L, 0.25))
    assert(g3(("nation", "n_nationkey")) == (2L, 0L, 0.0))
  }

  // === bs2 =================================================================

  test("bs2: identical purchase values give zero jackknife variance; mean is exact") {
    import spark.implicits._
    val dir = tmp("bs2")
    // 30 users, one purchase of 12.5 each: every leave-one-out mean is
    // 12.5 regardless of the md5 bucketing -> var 0, se 0
    (1 to 30).map(u => (u.toLong, u.toLong, "purchase", tsOfDay(u % 5), 12.5))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val r = Analytics.jackknifeVariance(spark, dir).collect()(0)
    assert(r.getLong(0) >= 2L && r.getLong(1) == 30L)
    assert(r.getDouble(2) == 12.5 && r.getDouble(3) == 12.5)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
  }

  test("bs2: a single bucket cannot estimate variance — NULL, not 0/0") {
    import spark.implicits._
    val dir = tmp("bs2one")
    Seq((1L, 7L, "purchase", tsOfDay(0), 99.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val r = Analytics.jackknifeVariance(spark, dir).collect()(0)
    assert(r.getLong(0) == 1L)
    assert(r.isNullAt(4) && r.isNullAt(5), s"k=1 must yield NULL var/se: $r")
  }

  // === ev26 ================================================================

  test("ev26: uniform two-type user reads ln 2; single-type user reads 0") {
    import spark.implicits._
    val dir = tmp("ev26")
    (Seq.fill(3)((1L, "view")) ++ Seq.fill(3)((1L, "purchase")) ++
      Seq.fill(5)((2L, "view")))
      .zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t, tsOfDay(i), 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val rows = Analytics.typeEntropy(spark, dir).collect()
    assert(rows.length == 2)
    val byUser = rows.map(r => r.getLong(0) -> r).toMap
    assert(byUser(1L).getLong(1) == 6L && byUser(1L).getLong(2) == 2L)
    // two micros-rounded terms of 0.5*ln2 each
    assert(byUser(1L).getDouble(3) == mic(0.5 * math.log(2.0)) * 2)
    assert(byUser(2L).getLong(2) == 1L && byUser(2L).getDouble(3) == 0.0)
  }
}
