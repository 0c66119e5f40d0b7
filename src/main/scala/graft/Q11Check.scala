package graft
import org.apache.spark.sql.SparkSession
object Q11Check {
  def main(args: Array[String]): Unit = {
    val noAqe = args.contains("noaqe")
    val spark = Engine.newSession("q11check", 8,
      if (noAqe) Map("spark.sql.adaptive.enabled" -> "false") else Map.empty)
    spark.sparkContext.setLogLevel("ERROR")
    val df = operators.Advanced.q11(spark, "/root/testdata/sf0.1")
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    println("REUSED=" + s.linesIterator.count(_.contains("ReusedExchange")))
    val fin = s.indexOf("== Initial Plan ==") match { case -1 => s; case i => s.substring(0, i) }
    println("SCANS=" + fin.linesIterator.count(_.contains("Scan parquet")))
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      operators.Advanced.q11(spark, "/root/testdata/sf0.1").collect()
      println(f"TIME rep$i ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
