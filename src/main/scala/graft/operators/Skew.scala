package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    // scatter: deterministic salt from the row content spreads hot keys
    val salted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col).toIndexedSeq: _*)), lit(buckets)))
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
}
