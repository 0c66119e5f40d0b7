package graft.operators

import graft.Engine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Par.BoundedOrder

/** Skew-mitigation utilities for 100 TB joins (builder-prompt "skewed
  * keys → salting or AQE skew-join"; SURVEY §2.B notes AQE handles skew
  * for the TPC-H shapes).
  *
  * AQE's skew-join split covers sort-merge joins it can observe; salting
  * is the explicit fallback when one side has pathological hot keys
  * (e.g. a null-heavy foreign key, a celebrity user_id) or when the
  * engine must pre-partition for repeated joins. `saltedJoin` implements
  * the standard scheme: the skewed (large) side scatters each key across
  * `buckets` salts; the small side replicates each row to every salt.
  * Result rows are identical to the unsalted join — only the shuffle
  * distribution changes (verified in SkewSpec).
  */
object Skew {

  /** Equi-join `large` ⋈ `small` on `key`, salting the large side into
    * `buckets` sub-keys. Use when `key`'s distribution is hot enough
    * that one reducer would own a partition-sized slice.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    require(buckets > 1, "salting needs at least 2 buckets")
    // right/full outer would surface each unmatched replicated row
    // `buckets` times — those shapes need the mirrored construction
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins, got $joinType")
    // scatter: content hash + a per-partition row counter. Content alone
    // fails exactly on salting's target workload — byte-identical
    // duplicate rows of a hot key (a frame projected to just the join
    // key) all hash to ONE bucket and the hot slice never spreads. The
    // row counter spreads duplicates round-robin; it is nondeterministic
    // across retries, which is SAFE here because the join result is
    // bucket-invariant (every salt meets a full small-side replica) —
    // only the shuffle distribution moves, never a row's join partners.
    val salted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col).toIndexedSeq: _*))
        + monotonically_increasing_id(), lit(buckets.toLong)))
    // replicate: small side joins every salt value
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<bigint>")))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Top-N hottest values of `key` with their frequencies — the
    * diagnostic that decides between AQE (mild skew) and salting
    * (pathological).
    */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)

  /** skw1: per-nation revenue through the salted join — the query a
    * deployment runs when l_suppkey goes hot (one mega-supplier). The
    * output is IDENTICAL to the unsalted join + GROUP BY (the oracle
    * below), which is the whole point of salting: only the shuffle
    * distribution changes. Revenue rides the Exact micros contract, so
    * the sum is order-independent across any salt assignment.
    */
  def saltedRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = Engine.table(s, dir, "lineitem")
      .select(col("l_suppkey").as("s_suppkey"), col("l_extendedprice"), col("l_discount"))
    val sup = Engine.table(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    saltedJoin(l, sup, "s_suppkey", buckets = 8)
      .groupBy(col("s_nationkey"))
      .agg(
        Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderedSmall(col("s_nationkey"))
  }

  val saltedRevenueSql: String =
    s"""SELECT s_nationkey,
       |  ${Exact.sqlDsum("l_extendedprice*(1-l_discount)")} AS revenue,
       |  CAST(COUNT(*) AS BIGINT) AS n_items
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skw1_salted_revenue" -> saltedRevenue _)

  val oracles: Map[String, String] = Map(
    "skw1_salted_revenue" -> saltedRevenueSql)
}
