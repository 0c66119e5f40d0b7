package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Invariants for the analytics-family additions (bsk1 co-purchase
  * pairs, exp1 A/B readout, ts2 daily seasonality, stat3 exact moments,
  * ev20 session conversion, qf2 quality battery, dd11 prefix dedup).
  * Value-level correctness is hash-checked against the DuckDB oracle by
  * the driver gate; these pin the structural properties the oracle
  * compare can't express.
  */
class AnalyticsSpec extends SparkTestBase {

  test("ts5: EWMA starts at the series, stays inside the window envelope, deterministic") {
    val r = Analytics.revenueEwma(spark, sfDir).collect()
    assert(r.nonEmpty)
    // first observation: ewma == revenue (only one weight present)
    val first = r.head
    assert(math.abs(first.getAs[Double]("ewma") - first.getAs[Double]("revenue")) < 1e-9)
    // ewma is a convex combination of the trailing window
    val revs = r.map(_.getAs[Double]("revenue"))
    r.zipWithIndex.foreach { case (row, idx) =>
      val w = revs.slice(math.max(0, idx - Analytics.ewmaLags), idx + 1)
      val e = row.getAs[Double]("ewma")
      assert(e >= w.min - 1e-6 && e <= w.max + 1e-6,
        s"ewma $e escapes its window [${w.min}, ${w.max}] at $idx")
    }
    assert(r.toSeq == Analytics.revenueEwma(spark, sfDir).collect().toSeq)
  }

  test("ts6: decomposition reassembles and outliers respect the 3-sigma gate") {
    val r = Analytics.stlResiduals(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val recon = row.getAs[Double]("trend") + row.getAs[Double]("seasonal") +
        row.getAs[Double]("residual")
      // decomposition identity: revenue = trend + seasonal + residual
      // (up to the micros rounding of the detrended intermediate)
      assert(math.abs(recon - row.getAs[Double]("revenue")) < 1e-5,
        s"decomposition must reassemble at ${row.getAs[java.sql.Date]("day")}")
    }
    val n = r.length
    val nOut = r.count(_.getAs[Int]("is_outlier") == 1)
    assert(nOut < n / 10, "3-sigma flags must be rare")
  }

  test("ev22: risk set is monotone non-increasing and conversions never exceed it") {
    val r = Analytics.conversionHazard(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_converted") <= row.getAs[Long]("n_at_risk"))
      val h = row.getAs[Double]("hazard")
      assert(h >= 0.0 && h <= 1.0)
    }
    val risks = r.map(_.getAs[Long]("n_at_risk")).toSeq
    assert(risks.zip(risks.tail).forall { case (a, b) => b <= a },
      "users leave the risk set by converting or censoring, never re-enter")
  }

  test("ev23: cohort sizes anchor offset 0, retention in (0,1], monotone risk-free") {
    val rows = Analytics.retentionCohorts(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[Long]("cohort_wk"))
    byCohort.foreach { case (_, rs) =>
      val r0 = rs.find(_.getAs[Int]("week_offset") == 0)
      assert(r0.isDefined, "every cohort is active in its signup week")
      val size = r0.get.getAs[Long]("cohort_size")
      assert(r0.get.getAs[Long]("n_active") == size,
        "offset 0 defines the cohort size")
      rs.foreach { r =>
        assert(r.getAs[Long]("cohort_size") == size, "size constant within cohort")
        val n = r.getAs[Long]("n_active")
        assert(n >= 1 && n <= size, "active never exceeds the cohort")
        assert(r.getAs[Double]("retention") == n.toDouble / size)
      }
    }
  }

  test("smp4: allocation hits the budget exactly and follows N*sigma ordering") {
    val rows = Analytics.neymanAllocation(spark, sfDir).collect()
    assert(rows.length == 25)
    assert(rows.map(_.getAs[Long]("n_alloc")).sum == Analytics.neymanBudget,
      "largest-remainder must land exactly on the budget")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_alloc") >= 0L)
      assert(r.getAs[Double]("sigma") >= 0.0)
    }
    // monotone in the weight N_h * sigma_h up to the +/-1 rounding step
    val w = rows.map(r => (r.getAs[Long]("n_h") * r.getAs[Double]("sigma"),
      r.getAs[Long]("n_alloc")))
    w.sortBy(_._1).sliding(2).foreach {
      case Array((w1, a1), (w2, a2)) if w2 > w1 * 1.001 =>
        assert(a2 >= a1 - 1, "a clearly heavier stratum cannot get fewer samples")
      case _ =>
    }
  }

  test("ndcg1: scores in [0,1], perfect-prefix queries hit exactly 1") {
    val rows = Analytics.labelRetrievalNdcg(spark, sfDir).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val ndcg = r.getAs[Double]("ndcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-12, s"ndcg $ndcg out of range")
      val rel = r.getAs[Long]("rel_at_k")
      if (rel == 0) assert(ndcg == 0.0)
      // all 20 slots relevant -> DCG equals the full ideal prefix -> exactly 1
      if (rel == 20) assert(ndcg == 1.0, "a fully-relevant page must score exactly 1")
    }
  }

  test("mrr1: reciprocal ranks are exact rationals consistent with first_rel_rank") {
    val r = Analytics.labelRetrievalMrr(spark, sfDir).collect()
    assert(r.length == 50)
    r.foreach { row =>
      val frr = row.getAs[Int]("first_rel_rank")
      val rr = row.getAs[Double]("rr")
      if (frr == 0) assert(rr == 0.0)
      else {
        assert(frr >= 1 && frr <= 20)
        assert(rr == 232792560L / frr / 232792560.0, s"rr must be exactly 1/$frr")
      }
    }
  }

  test("exp4: rank-sum identities (total 2x-rank mass, U bounds)") {
    val row = Analytics.rankSumTest(spark, sfDir).collect()(0)
    val nT = row.getAs[Long]("n_t"); val nC = row.getAs[Long]("n_c")
    val u2 = row.getAs[Long]("u2_stat")
    assert(nT > 0 && nC > 0)
    // 0 <= U <= n_t * n_c
    assert(u2 >= 0 && u2 <= 2 * nT * nC, s"2U=$u2 outside [0, ${2 * nT * nC}]")
    val z = row.getAs[Double]("z_approx")
    assert(math.abs(z) < 10, "arms from a fair coin should not diverge wildly")
  }

  test("exp4: z pinned on a hand-computed sample (treat {2,3} vs control {1})") {
    // Mann-Whitney by hand: ranks 1,2,3; treatment holds {2,3} so
    // R_t = 5, rank2 mass = 10, u2 = 10 - nT(nT+1) = 4 (U = 2),
    // E[u2] = nT*nC = 2, sd(u2) = sqrt(nT*nC*(N+1)/3) = sqrt(8/3),
    // z = 2 / sqrt(8/3) = 1.2247... — this pins the scaling a /2
    // regression (which the mirrored oracle could not catch) halves.
    def coin(uid: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"exp4#$uid".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16).toDouble / 4294967296.0
    }
    val treatIds = (1L to 200L).filter(coin(_) < 0.5).take(2)
    val controlId = (1L to 200L).find(coin(_) >= 0.5).get
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = Seq(
      (1L, ts0, treatIds(0), "purchase", 2.0, "{}"),
      (2L, ts0, treatIds(1), "purchase", 3.0, "{}"),
      (3L, ts0, controlId, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("exp4fix").toFile.getPath
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = Analytics.rankSumTest(spark, dir).collect()(0)
    assert(row.getAs[Long]("n_t") == 2L && row.getAs[Long]("n_c") == 1L)
    assert(row.getAs[Long]("u2_stat") == 4L)
    val zExpected = 2.0 / math.sqrt(8.0 / 3.0)
    assert(math.abs(row.getAs[Double]("z_approx") - zExpected) < 1e-12,
      s"z must be $zExpected (not its half)")
  }

  test("skw2: profile internally consistent (p50 <= p99 <= max, ratio >= 1)") {
    val row = Analytics.keySkewProfile(spark, sfDir).collect()(0)
    assert(row.getAs[Double]("p50_size") <= row.getAs[Double]("p99_size"))
    assert(row.getAs[Double]("p99_size") <= row.getAs[Long]("max_size").toDouble)
    assert(row.getAs[Double]("skew_ratio") >= 1.0,
      "max/avg is at least 1 by definition")
  }

  test("dp1: noise is bounded, deterministic, and dp_count never goes negative") {
    val a = Analytics.dpCounts(spark, sfDir).collect()
    val b = Analytics.dpCounts(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq, "md5-seeded noise must be reproducible")
    a.foreach { row =>
      val noise = row.getAs[Long]("noise")
      assert(math.abs(noise) <= Analytics.dpMaxNoise)
      assert(row.getAs[Long]("dp_count") >= 0)
      assert(row.getAs[Long]("dp_count") ==
        math.max(row.getAs[Long]("true_count") + noise, 0L))
    }
    // the mechanism must actually perturb something on a 25-group release
    assert(a.exists(_.getAs[Long]("noise") != 0L))
    // a secret salt changes the draw — the deterministic default is
    // visibly the test-only mode, not the release path
    val salted = Analytics.dpCounts(spark, sfDir, Some("s3cret")).collect()
    assert(salted.map(_.getAs[Long]("noise")).toSeq !=
      a.map(_.getAs[Long]("noise")).toSeq)
  }

  test("fh1: hashed features conserve event mass (3 features per event)") {
    val r = Analytics.featureHashing(spark, sfDir).cache()
    val nEvents = graft.Engine.table(spark, sfDir, "events").count()
    assert(r.agg(sum(col("value"))).collect()(0).getLong(0) == 3 * nEvents,
      "every event contributes exactly three features, collisions included")
    assert(r.filter(col("feature_idx") < 0 || col("feature_idx") >= Analytics.fhDims).isEmpty)
    r.unpersist()
  }

  test("cal1: bins partition the corpus and rates stay in [0,1]") {
    val r = Analytics.marginCalibration(spark, sfDir).collect()
    val nDocs = graft.Engine.table(spark, sfDir, "documents").count()
    assert(r.map(_.getAs[Long]("n_docs")).sum == nDocs)
    r.foreach { row =>
      val rate = row.getAs[Double]("pos_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(row.getAs[Long]("n_pos") <= row.getAs[Long]("n_docs"))
      // the bin's mean margin must sit at or above its lower bound
      // (upper bound only holds for non-clamped bins)
      val lo = row.getAs[Double]("bin_lo")
      val bin = row.getAs[Int]("bin")
      if (bin > 0) assert(row.getAs[Double]("mean_margin") >= lo - 1e-6)
    }
  }

  test("fair1: groups partition the corpus and parity gaps sum to ~zero weighted") {
    val r = Analytics.groupParity(spark, sfDir).collect()
    val nDocs = graft.Engine.table(spark, sfDir, "documents").count()
    assert(r.map(_.getAs[Long]("n")).sum == nDocs)
    r.foreach { row =>
      Seq("agreement", "clf_rate", "label_rate").foreach { c =>
        val v = row.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c out of range")
      }
    }
    // weighted parity gaps cancel by construction
    val weighted = r.map(row => row.getAs[Double]("parity_gap") * row.getAs[Long]("n")).sum
    assert(math.abs(weighted) < 1e-6)
  }

  test("bs1: bootstrap band contains the point mean and SE is positive") {
    val row = Analytics.poissonBootstrap(spark, sfDir).collect()(0)
    val mean = row.getAs[Double]("point_mean")
    assert(row.getAs[Long]("n") ==
      graft.Engine.table(spark, sfDir, "orders").count())
    assert(row.getAs[Double]("boot_se") > 0)
    assert(row.getAs[Double]("ci_lo") <= mean && mean <= row.getAs[Double]("ci_hi"),
      "the 95% bootstrap band should cover the point estimate")
    // resampling noise scales like sigma/sqrt(n): SE must be far below the mean
    assert(row.getAs[Double]("boot_se") < mean / 10)
  }

  test("exp3: four cells, positive populations, DiD identity holds") {
    val row = Analytics.diffInDiff(spark, sfDir).collect()(0)
    Seq("t_pre", "t_post", "c_pre", "c_post").foreach { c =>
      assert(row.getAs[Long](s"n_$c") > 0, s"cell $c must be populated")
    }
    val did = (row.getAs[Double]("v_t_post") - row.getAs[Double]("v_t_pre")) -
      (row.getAs[Double]("v_c_post") - row.getAs[Double]("v_c_pre"))
    assert(row.getAs[Double]("did") == did, "did column must equal the cell identity")
  }

  test("bsk1: pairs are canonically ordered and bounded by the pair-support union bound") {
    val pairs = Analytics.copurchasePairs(spark, sfDir).cache()
    assert(pairs.filter(col("brand_a") >= col("brand_b")).isEmpty, "a < b canonical order")
    // a pair's support can't exceed the total order count
    val nOrders = graft.Engine.table(spark, sfDir, "orders").count()
    assert(pairs.filter(col("n_orders") > nOrders).isEmpty)
    assert(pairs.count() <= 20)
    pairs.unpersist()
  }

  test("exp1: arms partition the user population and rates are consistent") {
    val arms = Analytics.abTestReadout(spark, sfDir).cache()
    val users = graft.Engine.table(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    assert(arms.agg(sum(col("n_users"))).collect()(0).getLong(0) == users)
    assert(arms.filter(col("n_converted") > col("n_users")).isEmpty)
    assert(arms.filter(col("conv_rate") < 0.0 || col("conv_rate") > 1.0).isEmpty)
    arms.unpersist()
  }

  test("exp1: arm assignment is the deterministic md5 coin (stable across runs)") {
    val a = Analytics.abTestReadout(spark, sfDir).collect().toSeq
    val b = Analytics.abTestReadout(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  test("ts2: one row per observed day, ma7 bounds, dow factor averages to ~1") {
    val daily = Analytics.dailySeasonality(spark, sfDir).cache()
    val days = graft.Engine.table(spark, sfDir, "orders")
      .select(to_date(col("o_orderdate"))).distinct().count()
    assert(daily.count() == days)
    // the 7-day trailing MA includes the day itself
    assert(daily.filter(col("ma7") < col("revenue")).isEmpty)
    assert(daily.filter(col("dow_idx") < 0 || col("dow_idx") > 6).isEmpty)
    // seasonal factors are positive and hover around 1
    assert(daily.filter(col("dow_factor") <= 0.0).isEmpty)
    val meanF = daily.select(col("dow_idx"), col("dow_factor")).distinct()
      .agg(avg(col("dow_factor"))).collect()(0).getDouble(0)
    assert(math.abs(meanF - 1.0) < 0.2, s"mean dow factor $meanF")
    daily.unpersist()
  }

  test("stat3: moments match Spark's builtin population statistics") {
    val m = Analytics.groupedMoments(spark, sfDir).cache()
    val ref = graft.Engine.table(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(var_pop(col("l_quantity")).as("v"), skewness(col("l_quantity")).as("sk"),
        kurtosis(col("l_quantity")).as("ku"))
    val joined = m.join(ref, "l_returnflag").collect()
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("variance") - r.getAs[Double]("v")) < 1e-6)
      assert(math.abs(r.getAs[Double]("skewness") - r.getAs[Double]("sk")) < 1e-6)
      assert(math.abs(r.getAs[Double]("kurtosis") - r.getAs[Double]("ku")) < 1e-6)
    }
    m.unpersist()
  }

  test("ev20: session inventory reconciles with the event count") {
    val buckets = Analytics.sessionConversion(spark, sfDir).cache()
    assert(buckets.filter(col("n_converted") > col("n_sessions")).isEmpty)
    assert(buckets.filter(col("conv_rate") < 0.0 || col("conv_rate") > 1.0).isEmpty)
    // sessions cover every event exactly once: bucket minimum sizes give
    // a lower bound; the exact reconstruction is cheap at spec scale
    val nSessions = buckets.agg(sum(col("n_sessions"))).collect()(0).getLong(0)
    val nUsers = graft.Engine.table(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    assert(nSessions >= nUsers, "every user has at least one session")
    buckets.unpersist()
  }

  test("qf2: keep is exactly the conjunction of the rule columns") {
    val q = Analytics.gopherRules(spark, sfDir).cache()
    val bad = q.filter(
      col("keep") =!= (col("r_wordcount") && col("r_mean_len") && col("r_distinct") &&
        col("r_stopwords") && col("r_max_len")))
    assert(bad.isEmpty)
    // one row per document, integer rules only — no NaN/null anywhere
    val docs = graft.Engine.table(spark, sfDir, "documents").count()
    assert(q.count() == docs)
    assert(q.filter(col("keep").isNull).isEmpty)
    q.unpersist()
  }

  test("bsk2: confidences in (0,1], lift consistent with the pair/marginal counts") {
    val rules = Analytics.associationRules(spark, sfDir).cache()
    assert(rules.filter(col("conf_a_to_b") <= 0.0 || col("conf_a_to_b") > 1.0).isEmpty)
    assert(rules.filter(col("conf_b_to_a") <= 0.0 || col("conf_b_to_a") > 1.0).isEmpty)
    assert(rules.filter(col("lift") <= 0.0).isEmpty)
    assert(rules.filter(col("brand_a") >= col("brand_b")).isEmpty)
    rules.unpersist()
  }

  test("grow1: growth reconstructs the revenue series within each nation") {
    val g = Analytics.momGrowth(spark, sfDir).cache()
    // rev_t == rev_{t-1} * (1 + growth_t) wherever growth is non-null
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_name")).orderBy(col("month"))
    val check = g.withColumn("prev", lag(col("revenue"), 1).over(w))
      .filter(col("mom_growth").isNotNull)
      .withColumn("recon", col("prev") * (lit(1.0) + col("mom_growth")))
      .filter(abs(col("recon") - col("revenue")) > lit(1e-6) * abs(col("revenue")))
    assert(check.isEmpty)
    g.unpersist()
  }

  test("top2: exactly k rows per nation, ranked by descending revenue") {
    val tp = Analytics.nationTopParts(spark, sfDir, k = 3).cache()
    val perNation = tp.groupBy(col("n_name")).agg(count(lit(1)).as("c"),
      max(col("rank")).as("mr"))
    assert(perNation.filter(col("c") =!= 3 || col("mr") =!= 3).isEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_name")).orderBy(col("rank"))
    assert(tp.withColumn("prev_rev", lag(col("revenue"), 1).over(w))
      .filter(col("prev_rev") < col("revenue")).isEmpty, "revenue non-increasing with rank")
    tp.unpersist()
  }

  test("clv1: deciles partition all purchasing customers with ordered spend bands") {
    val d = Analytics.customerDeciles(spark, sfDir).cache()
    val customers = graft.Engine.table(spark, sfDir, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(d.agg(sum(col("n_customers"))).collect()(0).getLong(0) == customers)
    assert(d.count() == 10)
    // decile 0 is the top spenders: min_cents of decile k >= max_cents of decile k+1
    val rows = d.orderBy(col("decile")).collect()
    rows.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi.getAs[Long]("min_cents") >= lo.getAs[Long]("max_cents"),
        s"decile ${hi.getAs[Int]("decile")} overlaps ${lo.getAs[Int]("decile")}")
    }
    d.unpersist()
  }

  test("clv1: distributed bucket-offset rank equals the flat window rank") {
    // reference: single-window ntile formula computed directly
    val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
    val spend = graft.Engine.table(spark, sfDir, "orders")
      .select(col("o_custkey"), cents.as("c"))
      .groupBy(col("o_custkey")).agg(sum(col("c")).as("sp"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("sp").desc, col("o_custkey"))
    val n = spend.count()
    val ref = spend.withColumn("rank", row_number().over(w))
      .withColumn("decile", (((col("rank") - 1) * 10) / n).cast("int"))
      .groupBy(col("decile")).agg(count(lit(1)).as("n_customers"))
      .orderBy(col("decile")).collect().map(r => (r.getInt(0), r.getLong(1)))
    val got = Analytics.customerDeciles(spark, sfDir)
      .select(col("decile"), col("n_customers"))
      .orderBy(col("decile")).collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq == ref.toSeq)
  }

  test("src1: pair inventory is canonical and jaccard bounded by containment") {
    val ov = Analytics.crossSourceOverlap(spark, sfDir).cache()
    assert(ov.filter(col("source_a") >= col("source_b")).isEmpty)
    assert(ov.filter(col("n_shared") > col("n_a") || col("n_shared") > col("n_b")).isEmpty)
    assert(ov.filter(col("jaccard") < 0.0 || col("jaccard") > 1.0).isEmpty)
    ov.unpersist()
  }

  test("txt16: character classes reconcile and ratios are exact") {
    val e = Analytics.encodingQa(spark, sfDir).cache()
    assert(e.filter(col("n_ascii") + col("n_cjk") > col("n_chars")).isEmpty,
      "disjoint classes can't exceed the total")
    assert(e.filter(col("non_ascii_ratio") < 0.0 || col("non_ascii_ratio") > 1.0).isEmpty)
    assert(e.filter(col("has_replacement")).isEmpty, "synthetic corpus is clean")
    // CJK characters are a subset of the non-ASCII count
    assert(e.filter(col("n_cjk") > col("n_chars") - col("n_ascii")).isEmpty)
    e.unpersist()
  }

  test("cooc1: pair counts reconcile with the corpus window-pair total") {
    val pairs = Analytics.skipgramPairs(spark, sfDir, k = 1000000).cache()
    // every doc with n >= 3 tokens contributes (n-1) + (n-2) pairs
    val expected = graft.Engine.table(spark, sfDir, "documents")
      .select(size(TextAnalysis.tokens(col("text"))).as("n"))
      .filter(col("n") >= 3)
      .agg(sum((col("n") - 1) + (col("n") - 2))).collect()(0).getLong(0)
    assert(pairs.agg(sum(col("n"))).collect()(0).getLong(0) == expected)
    // canonical order inside the pair key
    assert(pairs.filter(split(col("pair"), "\\|")(0) > split(col("pair"), "\\|")(1)).isEmpty)
    pairs.unpersist()
  }

  test("neg1: negatives differ in label from the anchor, at most 3 per anchor") {
    val neg = Analytics.negativeSampling(spark, sfDir).cache()
    val emb = graft.Engine.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"))
    val joined = neg.join(emb.withColumnRenamed("label", "a_label"), "vec_id")
    assert(joined.filter(col("neg_label") === col("a_label")).isEmpty)
    assert(neg.groupBy(col("vec_id")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 3).isEmpty)
    assert(neg.filter(col("rank") < 1 || col("rank") > 3).isEmpty)
    neg.unpersist()
  }

  test("fld1: folds cover every document and are roughly balanced per language") {
    val f = Analytics.kfoldSplit(spark, sfDir).cache()
    val docs = graft.Engine.table(spark, sfDir, "documents").count()
    assert(f.count() == docs)
    assert(f.filter(col("fold") < 0 || col("fold") > 4).isEmpty)
    // per-language: every stratum of reasonable size sees multiple folds
    val spread = f.groupBy(col("lang")).agg(countDistinct(col("fold")).as("k"),
      count(lit(1)).as("n"))
    assert(spread.filter(col("n") >= 20 && col("k") < 3).isEmpty)
    f.unpersist()
  }

  test("gini1: coefficients in [0,1) and equal-spend corpus gives ~0") {
    val g = Analytics.revenueGini(spark, sfDir).cache()
    assert(g.filter(col("gini") < 0.0 || col("gini") >= 1.0).isEmpty)
    // hand-check one nation against the direct formula on collected data
    val first = g.orderBy(col("n_name")).collect()(0)
    val name = first.getAs[String]("n_name")
    val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
    val spend = graft.Engine.table(spark, sfDir, "orders")
      .select(col("o_custkey"), cents.as("c"))
      .groupBy(col("o_custkey")).agg(sum(col("c")).as("sp"))
      .join(graft.Engine.table(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(graft.Engine.table(spark, sfDir, "nation")
        .select(col("n_nationkey"), col("n_name")), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === name)
      .select(col("sp")).collect().map(_.getLong(0)).sorted
    val n = spend.length.toDouble
    val s = spend.map(BigInt(_)).sum.toDouble
    val rx = spend.zipWithIndex.map { case (x, i) => (i + 1).toDouble * x.toDouble }.sum
    val expected = (2.0 * rx) / (n * s) - (n + 1.0) / n
    assert(math.abs(first.getAs[Double]("gini") - expected) < 1e-9)
    g.unpersist()
  }

  test("cc1: components are closed under the edge set and canonically labeled") {
    val comp = Analytics.knnComponents(spark, sfDir).cache()
    // every edge joins two nodes of the same component
    val edges = Similarity.mutualKnn(spark, sfDir)
      .select(col("a"), col("b"))
    val ca = comp.select(col("vec_id").as("a"), col("component").as("comp_a"))
    val cb = comp.select(col("vec_id").as("b"), col("component").as("comp_b"))
    assert(edges.join(ca, "a").join(cb, "b")
      .filter(col("comp_a") =!= col("comp_b")).isEmpty)
    // the label IS the minimum member id
    val minMember = comp.groupBy(col("component")).agg(min(col("vec_id")).as("mn"))
    assert(minMember.filter(col("component") =!= col("mn")).isEmpty)
    // sizes agree with membership
    val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("c"))
    assert(comp.join(sizes, "component").filter(col("comp_size") =!= col("c")).isEmpty)
    comp.unpersist()
  }

  test("kmv1: sketch is exact below k and lands near the true count above it") {
    val kmv = Analytics.kmvDistinct(spark, sfDir, k = 64).cache()
    assert(kmv.filter(col("n_exact") < 64 && col("kmv_estimate") =!= col("n_exact")
      .cast("double")).isEmpty, "below k the sketch degenerates to the exact count")
    // KMV with k=64 has ~12.5% relative sd; 4 sigma is a safe invariant bound
    assert(kmv.filter(abs(col("rel_error")) > 0.5).isEmpty)
    kmv.unpersist()
  }

  test("ts3: fourteen lags, every coefficient in [-1, 1]") {
    val acf = Analytics.revenueAutocorr(spark, sfDir).cache()
    assert(acf.count() == 14)
    assert(acf.filter(col("acf") < -1.0 || col("acf") > 1.0).isEmpty)
    assert(acf.select(col("lag")).collect().map(_.getInt(0)).toSeq == (1 to 14))
    acf.unpersist()
  }

  test("ev21: exactly one survivor per observed (user, day), and it is the last") {
    val latest = Analytics.latestPerKey(spark, sfDir).cache()
    val ev = graft.Engine.table(spark, sfDir, "events")
    val keys = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct().count()
    assert(latest.count() == keys)
    assert(latest.groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).isEmpty)
    // the survivor's ts is the group max
    val maxTs = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(max(col("ts")).as("mx"))
    val joined = latest.join(ev.select(col("event_id"), col("ts")), "event_id")
      .join(maxTs, Seq("user_id", "day"))
    assert(joined.filter(col("ts") =!= col("mx")).isEmpty)
    latest.unpersist()
  }

  test("rec1: classes partition the full-outer key space") {
    val rec = Analytics.orderReconcile(spark, sfDir).cache()
    val orders = graft.Engine.table(spark, sfDir, "orders").count()
    val lineOrders = graft.Engine.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey")).distinct().count()
    val byStatus = rec.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val both = byStatus.getOrElse("both", 0L)
    assert(both + byStatus.getOrElse("order_only", 0L) == orders)
    assert(both + byStatus.getOrElse("lines_only", 0L) == lineOrders)
    rec.unpersist()
  }

  test("exp2: theta is arm-independent and adjustment preserves the weighted mean") {
    val rows = Analytics.cupedReadout(spark, sfDir).collect()
    assert(rows.length == 2)
    val thetas = rows.map(_.getAs[Double]("theta")).distinct
    assert(thetas.length == 1, "theta is a corpus constant")
    val wRaw = rows.map(r => r.getAs[Long]("n_users") * r.getAs[Double]("mean_post")).sum
    val wAdj = rows.map(r => r.getAs[Long]("n_users") * r.getAs[Double]("mean_adjusted")).sum
    assert(math.abs(wRaw - wAdj) < 1e-6 * math.abs(wRaw),
      "CUPED re-centers around the global pre mean, so the weighted post mean is invariant")
  }

  test("auc1: matches a direct driver-side tie-corrected computation") {
    val row = Analytics.classifierAuc(spark, sfDir).collect()(0)
    val docs = graft.Engine.table(spark, sfDir, "documents").count()
    assert(row.getAs[Long]("n_pos") + row.getAs[Long]("n_neg") == docs)
    // recompute exactly from collected (score, label) pairs
    val scored = TextAnalysis.qualityMargin(spark, sfDir)
      .select(col("doc_id"), col("quality_margin"))
      .join(TextAnalysis.docQualityFilter(spark, sfDir).select(col("doc_id"), col("keep")),
        "doc_id")
      .collect().map(r => (r.getAs[Double]("quality_margin"), r.getAs[Boolean]("keep")))
    val byScore = scored.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, g) => (g.count(_._2).toLong, g.count(!_._2).toLong) }
    var negBelow = 0L; var auc2 = BigInt(0)
    byScore.foreach { case (np, nn) =>
      auc2 += BigInt(np) * (2 * negBelow + nn); negBelow += nn
    }
    val p = row.getAs[Long]("n_pos").toDouble
    val n = row.getAs[Long]("n_neg").toDouble
    val expected = auc2.toDouble / (2.0 * (p * n))
    assert(math.abs(row.getAs[Double]("auc") - expected) < 1e-12)
    assert(row.getAs[Double]("auc") > 0.5, "the margin must beat a coin flip on its own rule labels")
  }

  test("map1: AP bounded, one row per query, deterministic") {
    val ap = Analytics.labelRetrievalAp(spark, sfDir).cache()
    val nQ = graft.Engine.table(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 50).count()
    assert(ap.count() == nQ)
    assert(ap.filter(col("ap") < 0.0 || col("ap") > 1.0).isEmpty)
    assert(ap.filter(col("rel_at_k") > 20).isEmpty)
    val again = Analytics.labelRetrievalAp(spark, sfDir).collect().toSeq
    assert(ap.collect().toSeq == again)
    ap.unpersist()
  }

  test("imp1: HT estimate reconciles with a direct weighted recomputation") {
    val ht = Analytics.htEstimate(spark, sfDir).cache()
    // unweighted truth reconciles with txt1-style token totals
    val truth = graft.Engine.table(spark, sfDir, "documents")
      .select(col("lang"), size(TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("lang")).agg(sum(col("nt")).as("tt"))
    assert(ht.join(truth, "lang").filter(col("true_tokens") =!= col("tt")).isEmpty)
    assert(ht.filter(col("n_kept") > col("n_docs")).isEmpty)
    // the HT estimator is unbiased; on this corpus it should land within 50%
    assert(ht.filter(abs(col("rel_error")) > 0.5).isEmpty)
    ht.unpersist()
  }

  test("conf1: cells partition the corpus and recall shares sum to one per class") {
    val cm = Analytics.langIdConfusion(spark, sfDir).cache()
    val docs = graft.Engine.table(spark, sfDir, "documents").count()
    assert(cm.agg(sum(col("n"))).collect()(0).getLong(0) == docs)
    val shares = cm.groupBy(col("lang")).agg(sum(col("recall_share")).as("s"))
    assert(shares.filter(abs(col("s") - 1.0) > 1e-9).isEmpty)
    cm.unpersist()
  }

  test("ts4: the changepoint maximizes |CUSUM| among all prefix days") {
    val cp = Analytics.cusumChangepoint(spark, sfDir).collect()(0)
    val daily = graft.Engine.table(spark, sfDir, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        Exact.micros(col("o_totalprice")).as("m"))
      .groupBy(col("day")).agg(sum(col("m")).as("rev_m"))
      .orderBy(col("day")).collect().map(r => (r.getDate(0), BigInt(r.getLong(1))))
    val n = daily.length
    val total = daily.map(_._2).sum
    var cum = BigInt(0); var best = BigInt(-1); var bestDay: java.sql.Date = null
    daily.zipWithIndex.foreach { case ((d, m), i) =>
      cum += m
      val sn = (BigInt(n) * cum - BigInt(i + 1) * total).abs
      if (sn > best) { best = sn; bestDay = d }
    }
    assert(cp.getAs[java.sql.Date]("changepoint_day") == bestDay)
    assert(cp.getAs[Long]("n_days") == n)
  }

  test("dd11: keepers are real group minima and never listed as drops") {
    val d = Dedup.prefixDedup(spark, sfDir).cache()
    assert(d.filter(col("doc_id") <= col("keep_id")).isEmpty, "drop id > keeper id")
    assert(d.filter(col("group_size") < 2).isEmpty)
    // a keeper never appears in the drop column
    val keeperIds = d.select(col("keep_id")).distinct().collect().map(_.getLong(0)).toSet
    val dropIds = d.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(keeperIds.intersect(dropIds).isEmpty)
    d.unpersist()
  }
}
