package graft.operators

import graft.SparkTestBase

/** The parallelism guards: fan-out must fire only for scans narrower
  * than the shuffle width (the tiny-bench-input case) and be the
  * identity otherwise — at real scale it must never add a shuffle.
  */
class ParSpec extends SparkTestBase {

  test("fanOut widens a single-partition frame to the shuffle width") {
    val width = spark.sessionState.conf.numShufflePartitions
    val narrow = spark.range(1000).toDF("id").coalesce(1)
    assert(narrow.rdd.getNumPartitions == 1)
    assert(Par.fanOut(narrow).rdd.getNumPartitions == width)
  }

  test("fanOut is the identity once a frame has enough partitions") {
    val width = spark.sessionState.conf.numShufflePartitions
    val wide = spark.range(1000).toDF("id").repartition(width)
    assert(Par.fanOut(wide) eq wide, "no new plan node for an already-wide frame")
    val halfway = spark.range(1000).toDF("id").repartition(math.max(1, width / 2))
    assert(Par.fanOut(halfway) eq halfway,
      "at >= half the width the shuffle is not worth its cost")
  }

  test("shuffleWidth reads the session conf") {
    assert(Par.shuffleWidth(spark.range(1).toDF("id")) ==
      spark.sessionState.conf.numShufflePartitions)
  }
}
