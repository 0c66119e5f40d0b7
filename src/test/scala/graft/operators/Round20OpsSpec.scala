package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand fixtures for the round-20 operators: corr3's orders re-siting
  * (Spearman over overlapping series), ts11 (fixed-grid periodogram),
  * dq4 (Cramér's V with the zero-cell grid), exp6 (Cohen's d /
  * Hedges g), imp3 (post-stratified estimator), ev28 (conditional
  * entropy of the behavior chain), smp6 (hash-interval systematic
  * sample). Each pins exact values computed by hand or by an
  * INDEPENDENT implementation inside the spec; the DuckDB oracle is
  * the third anchor, checked by the driver gate.
  */
class Round20OpsSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rnd9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
  private def mic(x: Double): Double = // Exact.dsum's micros rounding
    (if (x >= 0) math.floor(x * 1e6 + 0.5) else math.ceil(x * 1e6 - 0.5)) / 1e6

  private def tsOfDay(d: Int): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(d.toLong * 86400))

  /** The repo's md5 coin, recomputed independently (imp2 discipline). */
  private def frac(s: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }

  // === corr3 (orders registry siting) ======================================

  test("corr3 orders siting: hand-ranked Spearman with count ties") {
    import spark.implicits._
    val dir = tmp("corr3o")
    // daily (count, revenue): d0 (1, 10), d1 (2, 15), d2 (2, 5), d3 (3, 3)
    // doubled ranks x = (2,5,5,8), y = (6,8,4,2) -> rho = -48/sqrt(5760)
    val orders = Seq(
      (1L, 0, 10.0), (2L, 1, 5.0), (3L, 1, 10.0), (4L, 2, 3.0), (5L, 2, 2.0),
      (6L, 3, 1.0), (7L, 3, 1.0), (8L, 3, 1.0))
    orders.map { case (k, d, p) => (k, tsOfDay(d), p) }
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val r = Analytics.spearmanOrders(spark, dir).collect()
    assert(r.length == 1 && r(0).getLong(0) == 4L)
    assert(r(0).getDouble(1) == rnd9(-48.0 / math.sqrt(5760.0)),
      s"rho ${r(0).getDouble(1)}")
  }

  test("corr3 orders siting: constant count series reads NULL, not NaN") {
    import spark.implicits._
    val dir = tmp("corr3c")
    // one order per day -> x constant -> zero x-variance -> NULL
    (0 to 4).map(d => (d.toLong, tsOfDay(d), 10.0 * (d + 1)))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val r = Analytics.spearmanOrders(spark, dir).collect()(0)
    assert(r.getLong(0) == 5L && r.isNullAt(1))
  }

  // === ts11 ================================================================

  test("ts11: a pure period-4 signal puts all power at p = 4") {
    import spark.implicits._
    val dir = tmp("ts11")
    // daily revenue (110,100,90,100) x2 -> centered (10,0,-10,0) x2:
    // at p=4 c = 40, s = 0 (micros-rounded libm residue), I = 1600/8 = 200;
    // at p=2 the +10/-10 terms cancel -> I = 0
    val v = Seq(110.0, 100.0, 90.0, 100.0, 110.0, 100.0, 90.0, 100.0)
    v.zipWithIndex.map { case (p, d) => (d.toLong, tsOfDay(d), p) }
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val rows = Analytics.periodogram(spark, dir).collect()
    assert(rows.length == 13 && rows.map(_.getLong(0)).toSeq == (2L to 14L))
    val byP = rows.map(r => r.getLong(0) -> r).toMap
    assert(byP(4L).getLong(1) == 8L)
    assert(byP(4L).getDouble(4) == 200.0, s"p=4 power ${byP(4L).getDouble(4)}")
    assert(byP(2L).getDouble(4) == 0.0, s"p=2 power ${byP(2L).getDouble(4)}")
    assert(rows.maxBy(_.getDouble(4)).getLong(0) == 4L, "p=4 must dominate the grid")
  }

  test("ts11: a constant series has zero power everywhere") {
    import spark.implicits._
    val dir = tmp("ts11c")
    (0 to 9).map(d => (d.toLong, tsOfDay(d), 50.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val rows = Analytics.periodogram(spark, dir).collect()
    assert(rows.forall(_.getDouble(4) == 0.0), "centered constant = all-zero terms")
  }

  // === dq4 =================================================================

  private def runCramers(rows: Seq[(String, String)]): org.apache.spark.sql.Row = {
    import spark.implicits._
    val dir = tmp("dq4")
    rows.zipWithIndex.map { case ((p, st), i) => (i.toLong, p, st, tsOfDay(0), 100.0) }
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val out = Analytics.cramersV(spark, dir).collect()
    assert(out.length == 1)
    out.head
  }

  test("dq4: perfect 2x2 association reads V = 1 (zero cells INCLUDED in chi2)") {
    // A->X x3, B->Y x3: chi2 = 4 * 1.5 = 6 = n*(min-1) -> V = 1.
    // Without the zero-fill (the classic observed-cells-only bug) chi2
    // would read 3 and V ~ 0.707.
    val r = runCramers(Seq.fill(3)(("A", "X")) ++ Seq.fill(3)(("B", "Y")))
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (6L, 2L, 2L))
    assert(r.getDouble(3) == 6.0, s"chi2 ${r.getDouble(3)}")
    assert(r.getDouble(4) == 1.0, s"V ${r.getDouble(4)}")
  }

  test("dq4: exact independence reads V = 0; constant field reads NULL") {
    // A:(1 X, 2 Y), B:(2 X, 4 Y) -> every cell matches expectation
    val r = runCramers(
      Seq(("A", "X")) ++ Seq.fill(2)(("A", "Y")) ++
        Seq.fill(2)(("B", "X")) ++ Seq.fill(4)(("B", "Y")))
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
    val c = runCramers(Seq.fill(4)(("A", "X")) ++ Seq.fill(2)(("A", "Y")))
    assert(c.getLong(1) == 1L && c.isNullAt(4), "one-level field: V undefined")
  }

  // === exp6 ================================================================

  test("exp6: d and g match an independent md5-arm recomputation") {
    import spark.implicits._
    val dir = tmp("exp6")
    val n = 40
    // one purchase per user, value 10 + u
    (1 to n).map(u => (u.toLong, u.toLong, "purchase", tsOfDay(u % 7), 10.0 + u))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val (as, bs) = (1 to n).map(u => (u, 10.0 + u))
      .partition { case (u, _) => frac(s"exp1#$u") < 0.5 }
    assert(as.size >= 2 && bs.size >= 2, "fixture needs both arms populated")
    val na = as.size.toDouble; val nb = bs.size.toDouble
    val ma = as.map(_._2).sum / na; val mb = bs.map(_._2).sum / nb
    val ssa = as.map(_._2).map(x => x * x).sum - as.map(_._2).sum * as.map(_._2).sum / na
    val ssb = bs.map(_._2).map(x => x * x).sum - bs.map(_._2).sum * bs.map(_._2).sum / nb
    val sp2 = (ssa + ssb) / (na + nb - 2.0)
    val d = (ma - mb) / math.sqrt(sp2)
    val g = d * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0))
    val r = Analytics.effectSize(spark, dir).collect()(0)
    assert(r.getLong(0) == as.size.toLong && r.getLong(1) == bs.size.toLong)
    assert(math.abs(r.getDouble(2) - (ma - mb)) < 1e-6, s"mean_diff ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(4) - rnd9(d)) < 2e-9, s"d ${r.getDouble(4)} vs $d")
    assert(math.abs(r.getDouble(5) - rnd9(g)) < 2e-9, s"g ${r.getDouble(5)} vs $g")
  }

  test("exp6: zero pooled variance reads NULL, not Inf") {
    import spark.implicits._
    val dir = tmp("exp6z")
    (1 to 10).map(u => (u.toLong, u.toLong, "purchase", tsOfDay(0), 5.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val r = Analytics.effectSize(spark, dir).collect()(0)
    assert(r.isNullAt(4) && r.isNullAt(5), s"sp2 = 0 must yield NULL d/g: $r")
  }

  // === imp3 ================================================================

  test("imp3: post-stratified estimate matches an independent recomputation") {
    import spark.implicits._
    val dir = tmp("imp3")
    val n = 100
    val prio = Vector("1-URGENT", "2-HIGH", "3-MEDIUM")
    (1 to n).map(k => (k.toLong, prio(k % 3), tsOfDay(k % 30), 10.0 * k))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val rows = (1 to n).map(k => (prio(k % 3), 10.0 * k, frac(s"imp2#$k") < 0.2))
    val yTrue = rows.map(_._2).sum
    val byH = rows.groupBy(_._1)
    val yPost = byH.values.map { g =>
      val s = g.filter(_._3)
      if (s.isEmpty) 0.0 else mic(g.size.toDouble * s.map(_._2).sum / s.size)
    }.sum
    val nEmpty = byH.values.count(_.forall(!_._3))
    val r = Analytics.postStratified(spark, dir).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == nEmpty.toLong)
    assert(r.getLong(2) == n.toLong && r.getLong(3) == rows.count(_._3).toLong)
    assert(math.abs(r.getDouble(4) - yTrue) < 1e-6)
    assert(math.abs(r.getDouble(6) - yPost) < 1e-5, s"y_post ${r.getDouble(6)} vs $yPost")
    assert(r.getDouble(7) == rnd9(math.abs(yPost - yTrue) / yTrue))
  }

  // === ev28 ================================================================

  test("ev28: hand-computed conditional entropies and shares") {
    import spark.implicits._
    val dir = tmp("ev28")
    // u1: v -> p -> v (transitions v->p, p->v); u2: v -> v.
    // From v: {p:1, v:1} -> H = 2 * mic(0.5*ln 2); from p: {v:1} -> H = 0.
    Seq((1L, 1L, "view", 0), (2L, 1L, "purchase", 1), (3L, 1L, "view", 2),
      (4L, 2L, "view", 0), (5L, 2L, "view", 1))
      .map { case (e, u, t, d) => (e, u, t, tsOfDay(d), 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val rows = Analytics.entropyRate(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("purchase", "view"))
    val p = rows(0); val v = rows(1)
    assert(p.getLong(1) == 1L && p.getDouble(3) == 0.0)
    assert(p.getDouble(2) == rnd9(1.0 / 3.0))
    assert(v.getLong(1) == 2L && v.getDouble(2) == rnd9(2.0 / 3.0))
    assert(v.getDouble(3) == 2 * mic(0.5 * math.log(2.0)), s"H(.|view) ${v.getDouble(3)}")
  }

  // === lm5 =================================================================

  test("lm5: seen bigrams score MLE, unseen back off to alpha * unigram") {
    import spark.implicits._
    val dir = tmp("lm5")
    Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    // unigrams a:3 b:1 c:1 (N=5); pairs (a,a),(a,b),(a,c) with ctx(a)=3
    val rows = TextAnalysis.stupidBackoff(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3), r.getDouble(4)))).toMap
    assert(rows.size == 9, s"3x3 grid expected: ${rows.keySet}")
    assert(rows(("a", "a")) == (1L, false, rnd9(1.0 / 3)))
    assert(rows(("a", "b")) == (1L, false, rnd9(1.0 / 3)))
    assert(rows(("b", "a")) == (0L, true, rnd9(0.4 * 3.0 / 5)), s"${rows(("b", "a"))}")
    assert(rows(("c", "b")) == (0L, true, rnd9(0.4 * 1.0 / 5)))
  }

  // === txt18 ===============================================================

  test("txt18: burstiness cf/df and the Poisson-expected df ratio by hand") {
    import spark.implicits._
    val dir = tmp("txt18")
    Seq((1L, "x x x y"), (2L, "x y"), (3L, "z")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    def pois(df: Long, cf: Long) = {
      val e = 3.0 * (1.0 - math.exp(-cf.toDouble / 3.0))
      math.floor(df.toDouble / e * 1e6 + 0.5) / 1e6 // dround 6
    }
    val rows = TextAnalysis.termBurstiness(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
    assert(rows.map(_._1).toSeq == Seq("x", "y", "z"), "cf-desc order")
    val byT = rows.toMap
    assert(byT("x") == (4L, 2L, 2.0, pois(2, 4)), s"x: ${byT("x")}")
    assert(byT("y") == (2L, 2L, 1.0, pois(2, 2)))
    assert(byT("z") == (1L, 1L, 1.0, pois(1, 1)))
  }

  // === ev29 ================================================================

  test("ev29: periodic user reads B = -1; hand two-gap case; 1-gap user reads NULL") {
    import spark.implicits._
    val dir = tmp("ev29")
    def at(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val events =
      (0 to 3).map(d => (d.toLong, 1L, "view", at(d.toLong * 86400), 1.0)) ++ // equal gaps
        Seq((10L, 2L, "view", at(0), 1.0), (11L, 2L, "view", at(1), 1.0),
          (12L, 2L, "view", at(4), 1.0)) ++ // gaps 1s, 3s
        Seq((20L, 3L, "view", at(7), 1.0), (21L, 3L, "view", at(9), 1.0)) // one gap
    events.toDF("event_id", "user_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val rows = Analytics.userBurstiness(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(1) == 3L && rows(1L).getDouble(3) == -1.0,
      s"periodic must read -1: ${rows(1L)}")
    assert(rows(1L).getDouble(2) == 86400.0)
    // gaps (1e6, 3e6) us: mu=2e6, sigma=1e6 -> B = -1/3
    assert(rows(2L).getLong(1) == 2L)
    assert(rows(2L).getDouble(3) == rnd9(-1.0 / 3.0), s"${rows(2L)}")
    assert(rows(3L).getLong(1) == 1L && rows(3L).isNullAt(3), "one gap: NULL B")
  }

  // === cl2 =================================================================

  test("cl2: hand 1-D clusters; singleton label excluded and counted") {
    import spark.implicits._
    val dir = tmp("cl2")
    Seq(
      (0L, Array(0.0f), 0), (1L, Array(1.0f), 0),
      (2L, Array(10.0f), 1), (3L, Array(11.0f), 1),
      (4L, Array(100.0f), 2))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.silhouette(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // label 0: s(0) = (10.5-1)/10.5, s(1) = (9.5-1)/9.5; davg micros-rounds each
    val s0 = mic(9.5 / 10.5); val s1 = mic(8.5 / 9.5)
    val expected = rnd9((s0 + s1) / 2)
    assert(rows(0L).getLong(1) == 2L && rows(0L).getLong(2) == 2L)
    assert(rows(0L).getDouble(3) == expected, s"label0 ${rows(0L).getDouble(3)} vs $expected")
    assert(rows(1L).getDouble(3) == expected, "symmetric geometry")
    assert(rows(2L).getLong(1) == 1L && rows(2L).getLong(2) == 0L && rows(2L).isNullAt(3),
      s"singleton label: ${rows(2L)}")
  }

  // === ts12 / ts13 =========================================================

  /** The impl's unit-rounded ACF moment, recomputed independently. */
  private def acfT(vs: Seq[Double], l: Int): Long = {
    val m = vs.sum / vs.length
    (l until vs.length).map { i =>
      val p = (vs(i) - m) * (vs(i - l) - m)
      (if (p >= 0) math.floor(p + 0.5) else math.ceil(p - 0.5)).toLong
    }.sum
  }

  private def writeDaily(dir: String, vs: Seq[Double]): Unit = {
    import spark.implicits._
    vs.zipWithIndex.map { case (v, d) => (d.toLong, tsOfDay(d), v) }
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
  }

  test("ts12: Durbin-Levinson pacf matches the textbook recursion on a hand series") {
    val dir = tmp("ts12")
    val vs = Seq(10.0, 20.0, 30.0, 40.0, 50.0, 60.0) // integer dev products
    writeDaily(dir, vs)
    val t0 = acfT(vs, 0).toDouble
    val r1 = acfT(vs, 1) / t0; val r2 = acfT(vs, 2) / t0; val r3 = acfT(vs, 3) / t0
    val p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val p21 = r1 * (1.0 - p22)
    val p33 = (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2)
    val rows = Analytics.pacf(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(0).getLong(1) == 6L)
    assert(rows(0).getDouble(2) == rnd9(r1), s"p11 ${rows(0).getDouble(2)} vs ${rnd9(r1)}")
    assert(rows(1).getDouble(2) == rnd9(p22), s"p22 ${rows(1).getDouble(2)} vs ${rnd9(p22)}")
    assert(rows(2).getDouble(2) == rnd9(p33), s"p33 ${rows(2).getDouble(2)} vs ${rnd9(p33)}")
  }

  test("ts12: a constant series reads NULL pacf at every lag (t0 = 0)") {
    val dir = tmp("ts12c")
    writeDaily(dir, Seq.fill(6)(42.0))
    val rows = Analytics.pacf(spark, dir).collect()
    assert(rows.length == 3 && rows.forall(_.isNullAt(2)), s"${rows.toSeq}")
  }

  test("ts13: Ljung-Box Q matches the hand formula; short/constant series read NULL") {
    val dir = tmp("ts13")
    val vs = (1 to 10).map(_ * 10.0)
    writeDaily(dir, vs)
    val t0 = acfT(vs, 0).toDouble
    val n = vs.length.toDouble
    val q = n * (n + 2.0) *
      (1 to 7).map(k => { val r = acfT(vs, k) / t0; r * r / (n - k) }).sum
    val row = Analytics.ljungBox(spark, dir).collect()(0)
    assert(row.getLong(0) == 10L && row.getLong(1) == 7L)
    assert(math.abs(row.getDouble(2) - q) < 1e-5, s"Q ${row.getDouble(2)} vs $q")
    assert(row.getBoolean(3) == (q > 14.067140449340169))
    // n <= 7: NULL, not a bogus statistic
    val short = tmp("ts13s")
    writeDaily(short, Seq(1.0, 2.0, 3.0))
    val sr = Analytics.ljungBox(spark, short).collect()(0)
    assert(sr.isNullAt(2) && sr.isNullAt(3), s"short series: $sr")
  }

  // === smp6 ================================================================

  test("smp6: kept set equals the independent hash-interval recomputation") {
    import spark.implicits._
    val dir = tmp("smp6")
    val n = 200
    (1 to n).map(k => (k.toLong, s"doc text $k"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val expected = (1 to n).map { k =>
      k.toLong -> math.floor(frac(s"smp6#$k") * 10000).toLong
    }.filter(_._2 % 7 == 0)
    assert(expected.nonEmpty, "fixture must keep some docs")
    val got = Analytics.systematicSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected.sortBy(_._1), s"kept ${got.size} vs ${expected.size}")
  }
}
