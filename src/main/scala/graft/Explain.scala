package graft

/** Plan inspector: prints the formatted physical plan of named registry
  * queries (all of them with no args) — the per-round plan-audit loop
  * (`.explain` until it's the plan you'd WANT at 100 TB) without
  * writing a scratch main each time.
  *
  * Usage: runMain graft.Explain [sfDir] [name1,name2,...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).headOption.map(_.split(",").map(_.trim).toSet)
    val spark = Engine.newSession("graft-explain", 8)
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (n, fn) =>
        println(s"===== $n =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"[explain] failed: ${e.getMessage}") }
      }
  }
}
