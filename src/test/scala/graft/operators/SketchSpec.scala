package graft.operators

import graft.{Engine, SparkTestBase}
import org.apache.spark.sql.functions._

/** Approximate-sketch validation (SURVEY §2.B flags approx_count_distinct
  * as available-if-needed): HLL distinct counts and approximate
  * percentiles must land within their documented error bounds of the
  * exact answers, and be deterministic — the property that makes them
  * safe replacements for exact shuffles at 100 TB.
  */
class SketchSpec extends SparkTestBase {

  test("approx_count_distinct within 5% of exact, deterministic") {
    val l = Engine.table(spark, sfDir, "lineitem")
    val exact = l.agg(countDistinct(col("l_partkey"))).head.getLong(0)
    val approx1 = l.agg(approx_count_distinct(col("l_partkey"), 0.02)).head.getLong(0)
    val approx2 = l.agg(approx_count_distinct(col("l_partkey"), 0.02)).head.getLong(0)
    assert(approx1 == approx2, "HLL must be deterministic")
    assert(math.abs(approx1 - exact).toDouble / exact < 0.05,
      s"approx=$approx1 exact=$exact")
  }

  test("approx_percentile brackets the exact percentile") {
    val l = Engine.table(spark, sfDir, "lineitem")
    val exact = l.selectExpr("percentile(l_extendedprice, 0.5)").head.getDouble(0)
    val approx = l.selectExpr("approx_percentile(l_extendedprice, 0.5, 1000)").head.getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }

  test("HLL group-by sketch merges match single-pass counts per group") {
    val l = Engine.table(spark, sfDir, "lineitem")
    val perFlag = l.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("a"),
        countDistinct(col("l_orderkey")).as("e"))
      .collect()
    perFlag.foreach { r =>
      val (a, e) = (r.getLong(1), r.getLong(2))
      assert(math.abs(a - e).toDouble / e < 0.05, s"flag=${r.getString(0)} approx=$a exact=$e")
    }
  }
}
