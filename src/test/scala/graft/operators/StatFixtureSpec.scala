package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Value-level HAND FIXTURES for the statistical readouts (VERDICT r11
  * task 1 — the q11/exp4 failure class): a mirrored DuckDB oracle cannot
  * catch a constant-factor or construction error both sides share, so
  * each test here writes a tiny corpus whose statistic is computed BY
  * HAND in the comments and asserts the operator reproduces it. exp4's
  * z fixture (AnalyticsSpec) is the template; these cover the rest of
  * the priority list: exp1, exp2, exp3, smp4, bs1, ts3, ts5, ts6,
  * drift1, ndcg1. (auc1 and ts4 carry independent recomputations in
  * AnalyticsSpec; dp1 pins its exact mechanism identity.)
  */
class StatFixtureSpec extends SparkTestBase {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("statfix").toFile.getPath

  /** The repo's deterministic md5 coin, replicated ONLY to pick user ids
    * for a target arm — the statistic itself is never derived from this.
    */
  private def coin(salt: String, uid: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt#$uid".getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16).toDouble / 4294967296.0
  }

  private def writeEvents(dir: String, rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (id, ts, uid, et, v) => (id, ts, uid, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def writeOrders(dir: String, rows: Seq[(Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (k, d, v) => (k, 1L, Timestamp.valueOf(d + " 00:00:00"), v) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
  }

  test("exp1: conversion rates and value-per-user on a hand-built cohort") {
    // Arm A: a1 converts (purchase 1 h after first event, value 10),
    //        a2 does NOT (purchase 25 h later, value 7 still counts).
    // Arm B: b1 converts (purchase IS the first event, gap 0), value 5.
    // Hand: A -> n 2, converted 1, rate 0.5, value/user (10+7)/2 = 8.5;
    //       B -> n 1, converted 1, rate 1.0, value/user 5.0.
    val Seq(a1, a2) = (1L to 400L).filter(coin("exp1", _) < 0.5).take(2)
    val b1 = (1L to 400L).find(coin("exp1", _) >= 0.5).get
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plusH(h: Int) = Timestamp.valueOf(s"2024-01-0${1 + h / 24} ${"%02d".format(h % 24)}:00:00")
    val dir = freshDir()
    writeEvents(dir, Seq(
      (1L, t0, a1, "view", 0.0), (2L, plusH(1), a1, "purchase", 10.0),
      (3L, t0, a2, "view", 0.0), (4L, plusH(25), a2, "purchase", 7.0),
      (5L, t0, b1, "purchase", 5.0)))
    val rows = Analytics.abTestReadout(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("A").getLong(1) == 2L && rows("A").getLong(2) == 1L)
    assert(rows("A").getDouble(3) == 0.5)
    assert(math.abs(rows("A").getDouble(4) - 8.5) < 1e-9)
    assert(rows("B").getLong(1) == 1L && rows("B").getLong(2) == 1L)
    assert(rows("B").getDouble(3) == 1.0)
    assert(math.abs(rows("B").getDouble(4) - 5.0) < 1e-9)
  }

  test("exp2: theta and adjusted means on a hand-built covariate (post = 2*pre)") {
    // Users (pre, post): a1 (1,2), a2 (5,10) in arm A; b1 (3,6) in B.
    // post = 2*pre everywhere -> cov(pre,post) = 2*var(pre) -> theta = 2
    // exactly. muPre = 3; mean_pre(A) = 3 -> adjusted(A) = mean_post(A)
    // = 6; mean_pre(B) = 3 -> adjusted(B) = 6. A halved (or doubled)
    // theta would leave adjusted means at 6 only by accident of this
    // symmetry, so ALSO pin theta itself.
    val Seq(a1, a2) = (1L to 400L).filter(coin("exp1", _) < 0.5).take(2)
    val b1 = (1L to 400L).find(coin("exp1", _) >= 0.5).get
    val pre = Timestamp.valueOf("2024-01-10 00:00:00")  // before 2024-01-16
    val post = Timestamp.valueOf("2024-01-20 00:00:00") // after
    val dir = freshDir()
    writeEvents(dir, Seq(
      (1L, pre, a1, "purchase", 1.0), (2L, post, a1, "purchase", 2.0),
      (3L, pre, a2, "purchase", 5.0), (4L, post, a2, "purchase", 10.0),
      (5L, pre, b1, "purchase", 3.0), (6L, post, b1, "purchase", 6.0)))
    val rows = Analytics.cupedReadout(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(math.abs(rows("A").getAs[Double]("theta") - 2.0) < 1e-9,
      s"theta must be exactly 2, got ${rows("A").getAs[Double]("theta")}")
    assert(math.abs(rows("A").getAs[Double]("mean_post") - 6.0) < 1e-9)
    assert(math.abs(rows("A").getAs[Double]("mean_adjusted") - 6.0) < 1e-9)
    assert(math.abs(rows("B").getAs[Double]("mean_adjusted") - 6.0) < 1e-9)
  }

  test("exp3: DiD = 3 on a hand-built 2x2 (treat 1->5, control 2->3)") {
    // Two treat users each: pre purchase 1.0, post purchase 5.0.
    // Two control users each: pre 2.0, post 3.0.
    // Cell means: t_pre 1, t_post 5, c_pre 2, c_post 3.
    // DiD = (5 - 1) - (3 - 2) = 3.
    val Seq(t1, t2) = (1L to 400L).filter(coin("did", _) < 0.5).take(2)
    val Seq(c1, c2) = (1L to 400L).filter(coin("did", _) >= 0.5).take(2)
    val pre = Timestamp.valueOf("2024-01-10 00:00:00")  // before didSplit
    val post = Timestamp.valueOf("2024-01-20 00:00:00")
    val dir = freshDir()
    writeEvents(dir, Seq(
      (1L, pre, t1, "purchase", 1.0), (2L, post, t1, "purchase", 5.0),
      (3L, pre, t2, "purchase", 1.0), (4L, post, t2, "purchase", 5.0),
      (5L, pre, c1, "purchase", 2.0), (6L, post, c1, "purchase", 3.0),
      (7L, pre, c2, "purchase", 2.0), (8L, post, c2, "purchase", 3.0)))
    val r = Analytics.diffInDiff(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_t_pre") == 2 && r.getAs[Long]("n_c_post") == 2)
    assert(math.abs(r.getAs[Double]("v_t_pre") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("v_t_post") - 5.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("v_c_pre") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("v_c_post") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("did") - 3.0) < 1e-9,
      s"DiD must be 3, got ${r.getAs[Double]("did")}")
  }

  test("smp4: Neyman allocation on two hand-computed strata (880/120)") {
    // Stratum AAA: balances {0, 6, 12} -> micros s1 = 18e6,
    //   s2 = 180e12, d = 3*180e12 - 324e12 = 216e12,
    //   w = sqrt(216)*1e6 = 14,696,938.4567;
    //   sigma = sqrt(216e12)/3/1e6 = 4.898979 (6 dp).
    // Stratum BBB: balances {1, 3} -> s1 = 4e6, s2 = 10e12,
    //   d = 20e12 - 16e12 = 4e12, w = 2e6; sigma = 2e6/2/1e6 = 1.0.
    // alloc_real: AAA 1000*w1/(w1+w2) = 880.2175..., BBB 119.7825...
    // floors 880 + 119 = 999, spare 1 goes to the larger remainder
    // (BBB) -> n_alloc = AAA 880, BBB 120. A mis-scaled weight (e.g.
    // variance instead of N*sigma) shifts these integers decisively.
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, 1, 0.0), (2L, 1, 6.0), (3L, 1, 12.0), (4L, 2, 1.0), (5L, 2, 3.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1, "AAA"), (2, "BBB")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val rows = Analytics.neymanAllocation(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("AAA").getAs[Long]("n_h") == 3 && rows("BBB").getAs[Long]("n_h") == 2)
    assert(rows("AAA").getAs[Double]("sigma") == 4.898979, "sigma = sqrt(216)/3 to 6 dp")
    assert(rows("BBB").getAs[Double]("sigma") == 1.0)
    assert(rows("AAA").getAs[Long]("n_alloc") == 880L,
      s"AAA must get 880, got ${rows("AAA").getAs[Long]("n_alloc")}")
    assert(rows("BBB").getAs[Long]("n_alloc") == 120L)
  }

  test("priv1: k-anonymity of a hand-built table is 2 with one violating group") {
    // QI = (nation, segment, balance-thousand-bucket): 6 customers in
    // (AAA, S1, bucket 0) and 2 in (AAA, S2, bucket 0) -> k = 2, one
    // group below 5 carrying 2 of 8 rows
    import spark.implicits._
    val dir = freshDir()
    val rows = (1L to 6L).map(i => (i, 1, 100.0 * i, "S1")) ++
      Seq((7L, 1, 10.0, "S2"), (8L, 1, 20.0, "S2"))
    rows.toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1, "AAA")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val r = Analytics.kAnonymityAudit(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_rows") == 8L && r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("k_anonymity") == 2L)
    assert(r.getAs[Long]("groups_below_k") == 1L && r.getAs[Long]("rows_below_k") == 2L)
    assert(r.getAs[Double]("reident_risk_share") == 0.25)
  }

  test("priv2: l-diversity of a hand-built release is 1 with one disclosing group") {
    // QI = (nation, segment, order year): (AAA,S1,2024) has 3 orders
    // with 3 distinct priorities -> l_div 3; (AAA,S2,2024) has 2 orders
    // both 1-URGENT -> l_div 1 (full disclosure). Dataset l = 1, one
    // group below l=3 carrying 2 of 5 rows -> risk share 0.4.
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, 1, "S1"), (2L, 1, "S2"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1, "AAA")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val d = java.sql.Date.valueOf("2024-03-01")
    Seq(
      (10L, 1L, d, "1-URGENT"), (11L, 1L, d, "2-HIGH"), (12L, 1L, d, "3-MEDIUM"),
      (13L, 2L, d, "1-URGENT"), (14L, 2L, d, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Analytics.lDiversityAudit(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_rows") == 5L && r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("l_diversity") == 1L)
    assert(r.getAs[Long]("groups_below_l") == 1L && r.getAs[Long]("rows_below_l") == 2L)
    assert(r.getAs[Double]("disclosure_risk_share") == 0.4)
  }

  test("smp4: zero-variance corpus fails loudly instead of NaN-degrading to 0 allocations") {
    // every stratum is a constant balance -> N*S2 - S1^2 = 0 in all
    // strata -> total_w = 0; the old code divided through and the NaN
    // floor/cast silently produced 0 allocations that missed the budget
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, 1, 5.0), (2L, 1, 5.0), (3L, 2, 7.0), (4L, 2, 7.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1, "AAA"), (2, "BBB")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val e = intercept[Exception] {
      Analytics.neymanAllocation(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("total stratum weight is zero")),
      s"expected the loud zero-variance error, got: ${e.getMessage}")
  }

  test("bs1: bootstrap of a constant corpus is exactly degenerate (SE 0, band = mean)") {
    // 20 orders all 5.0: every replica's weighted mean is exactly 5.0
    // whatever its Poisson weights (weighted mean of a constant), so
    // point_mean = 5, boot SE = 0, and both band edges sit at 5. Any
    // additive contamination or normalization slip in the replica means
    // breaks this exactly; P(a replica draws all-zero weights) = e^-20.
    val dir = freshDir()
    writeOrders(dir, (1L to 20L).map(k => (k, "2024-01-01", 5.0)))
    val r = Analytics.poissonBootstrap(spark, dir).collect()(0)
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Double]("point_mean") == 5.0)
    assert(r.getAs[Double]("boot_se") == 0.0, s"SE must be 0, got ${r.getAs[Double]("boot_se")}")
    assert(r.getAs[Double]("ci_lo") == 5.0 && r.getAs[Double]("ci_hi") == 5.0)
  }

  test("ts3: autocorrelation of the alternating series 1,3,1,3 (-0.75, 0.5, -0.25)") {
    // Daily revenue 1,3,1,3 -> mean 2, deviations -1,+1,-1,+1, t0 = 4.
    // lag 1: (+1)(-1)+(-1)(+1)+(+1)(-1) = -3 -> acf -0.75
    // lag 2: (-1)(-1)+(+1)(+1)          = +2 -> acf  0.5
    // lag 3: (+1)(-1)                   = -1 -> acf -0.25
    // lags 4..14 have no overlapping days -> NULL.
    val dir = freshDir()
    writeOrders(dir, Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 3.0),
      (3L, "2024-01-03", 1.0), (4L, "2024-01-04", 3.0)))
    val rows = Analytics.revenueAutocorr(spark, dir).collect()
    assert(rows.length == 14)
    val byLag = rows.map(r => r.getInt(0) -> r).toMap
    assert(byLag(1).getDouble(1) == -0.75, s"lag1 ${byLag(1).getDouble(1)}")
    assert(byLag(2).getDouble(1) == 0.5)
    assert(byLag(3).getDouble(1) == -0.25)
    (4 to 14).foreach(l => assert(byLag(l).isNullAt(1), s"lag $l must be NULL"))
  }

  test("ts5: truncated alpha=1/2 EWMA of (1, 2) is (1, 5/3)") {
    // Day 1: only weight 2^15 on 1.0 -> ewma 1.0 exactly.
    // Day 2: (2*2^15 + 1*2^14) / (2^15 + 2^14) = 81920/49152 = 5/3 —
    // the boundary-normalized truncated EWMA by hand.
    val dir = freshDir()
    writeOrders(dir, Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0)))
    val rows = Analytics.revenueEwma(spark, dir).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("ewma") == 1.0)
    assert(math.abs(rows(1).getAs[Double]("ewma") - 5.0 / 3.0) < 1e-12,
      s"day-2 EWMA must be 5/3, got ${rows(1).getAs[Double]("ewma")}")
  }

  test("ts6: a constant series decomposes to (trend = c, seasonal 0, residual 0, no outliers)") {
    val dir = freshDir()
    writeOrders(dir, (1 to 14).map(d => (d.toLong, f"2024-01-$d%02d", 7.0)))
    val rows = Analytics.stlResiduals(spark, dir).collect()
    assert(rows.length == 14)
    rows.foreach { r =>
      assert(r.getAs[Double]("revenue") == 7.0)
      assert(math.abs(r.getAs[Double]("trend") - 7.0) < 1e-9)
      assert(math.abs(r.getAs[Double]("seasonal")) < 1e-9)
      assert(math.abs(r.getAs[Double]("residual")) < 1e-9)
      assert(r.getAs[Int]("is_outlier") == 0)
    }
  }

  test("drift1: hand-computed smoothed KL for two 3-token sources") {
    // s1 = "a a b", s2 = "a b b". Realized vocab V = 2; global a:3 b:3,
    // g_n = 6 -> q(a) = q(b) = (3+1)/(6+2) = 1/2.
    // s1: p(a) = (2+1)/(3+2) = 3/5, p(b) = 2/5.
    // KL(s1) = 0.6*ln(1.2) + 0.4*ln(0.8) = 0.0201355136 (s2 symmetric).
    import spark.implicits._
    val dir = freshDir()
    Seq((1L, "a a b", "en", "s1"), (2L, "a b b", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.sourceDrift(spark, dir).collect()
    assert(rows.length == 2)
    val expected = 0.6 * math.log(1.2) + 0.4 * math.log(0.8)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vocab_tokens") == 3L)
      assert(math.abs(r.getAs[Double]("kl_divergence") - expected) < 2e-6,
        s"${r.getString(0)}: KL ${r.getAs[Double]("kl_divergence")} != $expected")
    }
  }

  test("ndcg1: hand-computed NDCG for a rigged ranking (rel pattern 1,0,1,0)") {
    // Query v0 (label 1) against v1..v4; cosines order v1 > v2 > v3 > v4
    // by construction, rel = (1,0,1,0). DCG = C(1) + C(3); label 1 has
    // 3 members -> n_ideal = 2 -> ideal = C(1) + C(2).
    // Analytically: (1 + 1/log2(4)) / (1 + 1/log2(3)) = 1.5/1.63093 =
    // 0.9197217... — a discount-table error (wrong base, off-by-one
    // rank) moves this far beyond the tolerance.
    import spark.implicits._
    val dir = freshDir()
    Seq(
      (0L, Seq(1.0, 0.0),  1),
      (1L, Seq(1.0, 0.01), 1),
      (2L, Seq(1.0, 0.1),  2),
      (3L, Seq(1.0, 0.2),  1),
      (4L, Seq(0.0, 1.0),  2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Analytics.labelRetrievalNdcg(spark, dir).collect()
    val q0 = rows.find(_.getLong(0) == 0L).get
    assert(q0.getAs[Long]("rel_at_k") == 2L)
    val expected = (1.0 + 0.5) / (1.0 + math.log(2.0) / math.log(3.0))
    assert(math.abs(q0.getAs[Double]("ndcg") - expected) < 1e-9,
      s"q0 NDCG ${q0.getAs[Double]("ndcg")} != $expected")
  }
}
