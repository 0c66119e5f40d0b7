package graft

import org.apache.spark.sql.SparkSession

/** Throughput-tuning lab: runs ONLY Bench's concurrent TPC-H window under
  * a comma-separated flag list, so config levers can be A/B-measured in
  * minutes instead of full bench runs.
  *
  *   sbt "runMain graft.BenchLab cacheDims,noAqe"
  *
  * Flags: cacheDims (persist region/nation/customer/supplier/part),
  * cacheAll (persist every test table), noAqe (terminals disable AQE),
  * reopt (reuse optimized instead of analyzed plans), spN — e.g. sp4,
  * sp8, sp16 — (terminals use N shuffle partitions), serial (skip the throughput window; instead
  * time each TPC-H query warm, min of 3 runs, under the flag set —
  * isolates the per-query latency floor). Window via LAB_WINDOW seconds
  * (default 20).
  */
object BenchLab {
  // deterministic pick (sorted) and overflow-safe parse; one spN flag
  // is the expected usage
  private def spWidth(flags: Set[String]): Option[Int] =
    flags.filter(_.matches("sp\\d+")).toSeq.sorted
      .flatMap(f => f.drop(2).toIntOption).headOption

  def main(args: Array[String]): Unit = {
    val flags = args.headOption.getOrElse("").split(",").map(_.trim).filter(_.nonEmpty).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val windowSec = sys.env.getOrElse("LAB_WINDOW", "20").toInt
    val spark = Engine.newSession("graft-lab", Engine.defaultCores)

    if (flags("serial")) {
      val cs = spark.newSession()
      if (flags("noAqe")) cs.conf.set("spark.sql.adaptive.enabled", "false")
      spWidth(flags).foreach(n => cs.conf.set("spark.sql.shuffle.partitions", n.toString))
      val mixS = SparkEntry.queries.keys.filter(_.matches("q\\d+_.*")).toSeq.sorted
      val out = mixS.map { n =>
        val df = SparkEntry.queries(n)(cs, sfDir)
        org.apache.spark.sql.graft.PlanReuse.reanalyzed(cs, df).collect() // warm
        val best = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          org.apache.spark.sql.graft.PlanReuse.reanalyzed(cs, df).collect()
          (System.nanoTime() - t0) / 1e9
        }.min
        f"$n%s=$best%.2f"
      }
      println(s"[lab-serial] flags=${flags.toSeq.sorted.mkString("+")} " + out.mkString(" "))
      spark.stop()
      return
    }

    val dims = Seq("region", "nation", "customer", "supplier", "part")
    val toCache =
      if (flags("cacheAll")) Engine.tableNames
      else if (flags("cacheDims")) dims
      else Seq.empty
    toCache.foreach { n => Engine.table(spark, sfDir, n).cache().count() }

    val mix = SparkEntry.queries.keys.filter(_.matches("q\\d+_.*")).toArray.sorted
    val terminals = 4
    val windowNanos = windowSec * 1000L * 1000 * 1000
    val completed = new java.util.concurrent.atomic.AtomicLong()
    val sessions = (0 until terminals).map { _ =>
      val cs = spark.newSession()
      if (flags("noAqe")) cs.conf.set("spark.sql.adaptive.enabled", "false")
      spWidth(flags).foreach(n => cs.conf.set("spark.sql.shuffle.partitions", n.toString))
      cs
    }
    val preparedPer = sessions.map { cs =>
      mix.map(n => n -> SparkEntry.queries(n)(cs, sfDir)).toMap
    }
    def rerun(cs: SparkSession, df: org.apache.spark.sql.DataFrame) =
      if (flags("reopt")) org.apache.spark.sql.graft.PlanReuse.reoptimized(cs, df)
      else org.apache.spark.sql.graft.PlanReuse.reanalyzed(cs, df)

    // warmup: one full mix pass per terminal, concurrently (two with the
    // warm2 flag — closer to BenchBase's 30 s warmup on a cold JVM)
    val warmPasses = if (flags("warm2")) 2 else 1
    val warm = sessions.zip(preparedPer).map { case (cs, prepared) =>
      val th = new Thread(() => (1 to warmPasses).foreach(_ =>
        mix.foreach(n => rerun(cs, prepared(n)).collect())))
      th.start(); th
    }
    warm.foreach(_.join())

    val t0 = System.nanoTime()
    val threads = (0 until terminals).map { t =>
      val cs = sessions(t); val prepared = preparedPer(t)
      val th = new Thread(() => {
        var i = t
        while (System.nanoTime() - t0 < windowNanos) {
          try {
            rerun(cs, prepared(mix(i % mix.length))).collect()
            completed.incrementAndGet()
          } catch { case _: Throwable => }
          i += 1
        }
      })
      th.start(); th
    }
    threads.foreach(_.join())
    val elapsed = (System.nanoTime() - t0) / 1e9
    println(f"[lab] flags=${flags.toSeq.sorted.mkString("+")}%s rps=${completed.get() / elapsed}%.3f requests=${completed.get()}%d window=$elapsed%.1f")
    spark.stop()
  }
}
