package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Queries execute through the noop sink so the full plan runs
  * (count() would let Catalyst prune aggregates). One warm-up query
  * amortizes session/codegen startup the way the reference's long-lived
  * sessions do (BASELINE.md "long-lived SparkSession" lever).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Engine.defaultCores
    val spark = Engine.newSession("graft-bench", cpus)

    def execute(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up: JVM/codegen/parquet-footer caches (not reported)
    execute("q6_forecast_revenue")

    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> execute(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
