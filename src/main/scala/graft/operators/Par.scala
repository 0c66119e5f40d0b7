package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism guards shared by the operator families.
  *
  * Both exist because AQE sizes post-shuffle partitions by INPUT
  * bytes: a few-MB band index coalesces to one task that then
  * generates millions of candidate pairs serially (measured 3.5x on
  * dd5), and a single-split bench file serializes per-row-expensive
  * map work (md5 sketches, regex tokenization) on one core.
  */
object Par {

  /** The session's configured shuffle width — used to PIN exchanges
    * whose output explodes (band/inverted-index self-joins), keeping
    * `spark.sql.shuffle.partitions` the single scale knob a deployment
    * already tunes.
    */
  def shuffleWidth(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Fan a tiny scan out to the shuffle width before heavy per-row map
    * work. A real deployment's scan already has more splits than the
    * threshold, making this the identity — no extra shuffle at scale.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = shuffleWidth(df)
    if (df.rdd.getNumPartitions * 2 >= target) df else df.repartition(target)
  }

  /** fanOut to the MACHINE width (defaultParallelism), not the shuffle
    * width: the shuffle width is cores/4 so four concurrent terminals
    * saturate the pool, but a CPU-bound hash/codec map stage in a
    * single-query context (bs1's 8 md5 + 32 hex parses per row) leaves
    * 3/4 of the machine idle at cores/4 tasks. Same identity-at-scale
    * guard as fanOut — a real deployment's scan already has more
    * splits, and local follow-up exchanges re-narrow to shuffle width.
    */
  def fanOutWide(df: DataFrame): DataFrame = {
    val target = math.max(shuffleWidth(df),
      df.sparkSession.sparkContext.defaultParallelism)
    if (df.rdd.getNumPartitions * 2 >= target) df else df.repartition(target)
  }

  /** Width for a PINNED exchange whose downstream stage is CPU-bound in
    * a single-query context (dd5's candidate fan-out + pair dedup):
    * max(shuffle width, machine width) — the keyed sibling of
    * [[fanOutWide]]. At cluster scale shuffle.partitions dominates the
    * max and this is exactly the shuffleWidth pin; in local mode it
    * stops a fan-out stage from running at cores/4 tasks on a
    * cores-wide machine.
    */
  def wideWidth(df: DataFrame): Int =
    math.max(shuffleWidth(df), df.sparkSession.sparkContext.defaultParallelism)

  /** Bounded-domain result ordering: results whose cardinality is fixed
    * by the query's value domain (a few hundred rows at ANY scale
    * factor) sort in one task instead of paying a rangepartitioning
    * exchange — a whole AQE stage spent ordering a handful of rows
    * (~0.07 s each at sf0.1; the q16 ledger in STATUS.md). Never used
    * where output cardinality grows with data volume.
    */
  implicit class BoundedOrder(private val df: DataFrame) {
    def orderedSmall(keys: Column*): DataFrame =
      df.coalesce(1).sortWithinPartitions(keys: _*)
  }
}
