package graft.operators

import graft.SparkTestBase

/** Smoke-level shape checks for the relational battery on sf0.001 (full
  * value-level verification runs through Verify + the DuckDB oracle —
  * see tools/check_oracle.py and .claude/skills/verify).
  */
class TpchSpec extends SparkTestBase {

  test("q1 returns the six flag/status groups with positive aggregates") {
    val rows = Tpch.q1(spark, sfDir).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 0))
    assert(rows.forall(_.getAs[Long]("count_order") > 0))
  }

  test("q3 top-k is bounded and sorted by revenue desc") {
    val rows = Tpch.q3(spark, sfDir).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted.reverse))
  }

  test("q6 returns a single positive revenue") {
    val r = Tpch.q6(spark, sfDir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("revenue") > 0)
  }

  test("every battery query executes at sf0.001 and declares a sorted output") {
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.limit(1).collect() // forces analysis + execution of the plan head
    }
  }
}
