package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Storage-layout levers for the 100 TB deployment (builder prompt:
  * "broadcast small dims, repartition/bucketing for co-located joins"):
  * partition pruning must reach the file listing, and bucketed tables
  * must join without a shuffle. Pinned as tests so the layout story is
  * verified behavior, not a claim.
  */
class StorageLayoutSpec extends SparkTestBase {

  test("partitioned writes prune partitions at the scan (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Engine.table(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").parquet(s"$dir/orders_part")
    val scan = spark.read.parquet(s"$dir/orders_part")
      .filter(col("o_year") === 1996)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan)
    // pruned scan must produce only the 1996 rows
    val expected = Engine.table(spark, sfDir, "orders")
      .filter(year(col("o_orderdate")) === 1996).count()
    assert(scan.count() == expected)
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Engine.table(spark, sfDir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    Engine.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      // disable broadcast so the join itself must pick a strategy
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        joined.collect()
        // descends into materialized QueryStageExec wrappers — they are
        // leaves post-collect, so a plain-children walk reads ZERO
        // shuffles and this assertion would pass vacuously (the
        // countShuffles lesson from PlanQualitySpec)
        def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
          case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => shuffles(q.plan)
          case s: ShuffleExchangeExec => 1 + s.children.map(shuffles).sum
          case other => other.children.map(shuffles).sum
        }
        val joinShuffles = {
          // the final groupBy shuffles once; the bucketed join itself must not
          val total = shuffles(joined.queryExecution.executedPlan)
          total
        }
        assert(joinShuffles <= 1,
          s"bucketed join must not shuffle its inputs (saw $joinShuffles exchanges):\n" +
            joined.queryExecution.executedPlan)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
