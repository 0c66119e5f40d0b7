package graft

/** Warm-time one registry query N times — the single-query companion
  * to Explain (plan shape) and Probe (full-mix methodology) for A/B
  * work on one operator. Usage:
  * runMain graft.TimeOne <name> [reps] — prints per-rep seconds.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.newSession("graft-timeone", Engine.defaultCores)
    spark.sparkContext.setLogLevel("ERROR")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).collect()
      println(f"TIME rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
