package graft

/** Warm-time one registry query N times — the single-query companion
  * to Explain (plan shape) and Probe (full-mix methodology) for A/B
  * work on one operator. Usage:
  * runMain graft.TimeOne <name> [reps] [mode] — prints per-rep seconds.
  * mode: rebuild (default) reconstructs the DataFrame per rep;
  * reanalyzed/reoptimized prepare once and re-execute via PlanReuse —
  * the exact path Bench's serial phase measures.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val mode = args.drop(2).headOption.getOrElse("rebuild")
    require(Set("rebuild", "reanalyzed", "reoptimized")(mode),
      s"unknown mode '$mode' (rebuild | reanalyzed | reoptimized)")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.newSession("graft-timeone", Engine.defaultCores)
    spark.sparkContext.setLogLevel("ERROR")
    val prepared =
      if (mode == "rebuild") null else SparkEntry.queries(name)(spark, sfDir)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      mode match {
        case "rebuild"     => SparkEntry.queries(name)(spark, sfDir).collect()
        case "reanalyzed"  => org.apache.spark.sql.graft.PlanReuse.reanalyzed(spark, prepared).collect()
        case "reoptimized" => org.apache.spark.sql.graft.PlanReuse.reoptimized(spark, prepared).collect()
      }
      println(f"TIME rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
