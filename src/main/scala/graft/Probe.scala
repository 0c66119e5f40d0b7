package graft

/** Perf probe: replicates Bench's methodology (warmup pass, measured pass,
  * 30 s 4-terminal throughput window) with SparkSession conf overrides from
  * program args ("k=v k=v"), so config candidates A/B against the exact
  * setup the driver measures. Prints one PROBE line per phase.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val overrides = args.filter(_.contains("=")).map { a =>
      val Array(k, v) = a.split("=", 2); k -> v
    }.toMap
    val windows = args.find(_.startsWith("windows:")).map(_.drop(8).toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.newSession("graft-probe", Engine.defaultCores, overrides)

    val names = SparkEntry.queries.keys.toSeq.sorted
    def seqPass(): Double = {
      val t0 = System.nanoTime()
      names.foreach(n => SparkEntry.queries(n)(spark, sfDir).collect())
      (System.nanoTime() - t0) / 1e9
    }
    println(f"PROBE warmup ${seqPass()}%.2f s")
    println(f"PROBE measured ${seqPass()}%.2f s")

    val mix = names.filter(_.matches("q\\d+_.*")).toArray
    def window(secs: Int): Double = {
      val windowNanos = secs.toLong * 1000 * 1000 * 1000
      val completed = new java.util.concurrent.atomic.AtomicLong()
      val t0 = System.nanoTime()
      val threads = (0 until 4).map { t =>
        val cs = spark.newSession()
        val prepared = mix.map(n => n -> SparkEntry.queries(n)(cs, sfDir)).toMap
        val th = new Thread(() => {
          var i = t
          while (System.nanoTime() - t0 < windowNanos) {
            try {
              org.apache.spark.sql.graft.PlanReuse.reanalyzed(cs, prepared(mix(i % mix.length))).collect()
              completed.incrementAndGet()
            } catch { case e: Throwable => println("PROBE ERR " + e.getMessage.take(120)) }
            i += 1
          }
        }); th.start(); th
      }
      threads.foreach(_.join())
      completed.get() / ((System.nanoTime() - t0) / 1e9)
    }
    (1 to windows).foreach(w => println(f"PROBE window$w ${window(30)}%.3f rps"))
    spark.stop()
  }
}
