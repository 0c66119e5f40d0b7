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
  * sp8, sp16 — (terminals use N shuffle partitions), noFair (FIFO
  * scheduling control arm), noOffheap (on-heap execution-memory control
  * arm — FAIR and off-heap are Engine defaults, so the A/B arms are the
  * disables), serial (skip the throughput window; instead
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
    // context-level CONTROL-ARM levers (must land before SparkContext
    // init). Engine.newSession defaults both FAIR scheduling and 16g
    // off-heap execution memory ON, so the A/B arms here are the
    // DISABLE flags (a review pass caught the inverse spelling: an
    // "enable" flag over an already-on default compares a config to
    // itself and prints a bogus ~0 delta):
    // noFair    — FIFO task scheduling (the pre-FAIR convoy behavior)
    // noOffheap — Tungsten execution memory back on the Java heap
    val ctxConf =
      (if (flags("noFair")) Map("spark.scheduler.mode" -> "FIFO")
       else Map.empty[String, String]) ++
      (if (flags("noOffheap")) Map("spark.memory.offHeap.enabled" -> "false")
       else Map.empty[String, String])
    val spark = Engine.newSession("graft-lab", Engine.defaultCores, extraConf = ctxConf)

    if (flags("ycsb")) {
      // the Bench YCSB phase alone — for iterating on the DML/point-read
      // latency path without paying the 4-terminal + serial phases
      println("[lab-ycsb] " + Bench.runYcsb(spark))
      spark.stop()
      return
    }

    if (flags("pointread")) {
      // anatomy of the YCSB point read: engine-side prepared execution
      // vs the full HTTP+Arrow path, with per-rep Spark job counts —
      // the lab for VERDICT r15's read-latency target
      import org.apache.spark.sql.types._
      val catalog = graft.sources.MutableCatalog(spark)
      val registry = new SessionRegistry(spark, catalog = Some(catalog))
      val gw = SqlGateway.start(registry, new Metrics(), identity)
      val schema = StructType(
        StructField("ycsb_key", LongType) +:
          (1 to 10).map(i => StructField(s"field$i", StringType)))
      val t = catalog.create("usertable", schema, primaryKey = Some("ycsb_key"))
      (0 until 20).foreach { i =>
        val b = spark.range(i * 50L, i * 50L + 50).selectExpr(
          ("id AS ycsb_key" +: (1 to 10).map(f => s"concat('v', id, '_', $f) AS field$f")): _*)
        t.insert(b)
      }
      println(s"[lab-pointread] files=${t.fileCount}")
      val jobs = new java.util.concurrent.atomic.AtomicLong()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
      val sess = registry.getOrCreate("probe")
      val p = sess.createPrepared("SELECT * FROM usertable WHERE ycsb_key = ?")
      (1 to 10).foreach(i => sess.executePrepared(p.handle, Seq(i.toLong)).collect())
      val j0 = jobs.get()
      var analyzeMs = 0.0; var collectMs = 0.0
      val engineTimes = (1 to 20).map { i =>
        val t0 = System.nanoTime()
        val df = sess.executePrepared(p.handle, Seq((i * 37 % 1000).toLong))
        val t1 = System.nanoTime()
        df.collect()
        val t2 = System.nanoTime()
        analyzeMs += (t1 - t0) / 1e6; collectMs += (t2 - t1) / 1e6
        (t2 - t0) / 1e6
      }
      Thread.sleep(300)
      val engineJobs = (jobs.get() - j0) / 20.0
      println(f"[lab-pointread] engine split: analyze=${analyzeMs / 20}%.1f collect=${collectMs / 20}%.1f ms")
      // codegen-cache sensitivity: a FIXED key re-executes identical
      // generated source (Janino cache hit); random keys regenerate if
      // literals are inlined into the source
      val fixedKey = (1 to 20).map { _ =>
        val t0 = System.nanoTime()
        sess.executePrepared(p.handle, Seq(123L)).collect()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"[lab-pointread] engine FIXED key avg=${fixedKey.sum / 20}%.1f ms")
      // floor: a bare 1-file scan+filter+collect on a fresh plan
      val one = t.df.inputFiles.head
      val floorTimes = (1 to 10).map { i =>
        val t0 = System.nanoTime()
        spark.read.schema(schema).parquet(one)
          .filter(org.apache.spark.sql.functions.col("ycsb_key") === (i * 7 % 50).toLong).collect()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"[lab-pointread] raw 1-file scan floor avg=${floorTimes.sum / 10}%.1f ms")
      // decompose the floor: bare job launch, reused-plan collect, fresh-plan collect
      val bare = (1 to 10).map { _ =>
        val t0 = System.nanoTime(); spark.range(1).collect(); (System.nanoTime() - t0) / 1e6
      }
      println(f"[lab-pointread] range(1).collect avg=${bare.sum / 10}%.1f ms")
      val fixedDf = spark.read.schema(schema).parquet(one)
        .filter(org.apache.spark.sql.functions.col("ycsb_key") === 7L)
      fixedDf.collect()
      val reuse = (1 to 10).map { _ =>
        val t0 = System.nanoTime(); fixedDf.collect(); (System.nanoTime() - t0) / 1e6
      }
      println(f"[lab-pointread] same-plan re-collect avg=${reuse.sum / 10}%.1f ms")
      val noFilter = (1 to 10).map { _ =>
        val t0 = System.nanoTime()
        spark.read.schema(schema).parquet(one).collect()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"[lab-pointread] fresh no-filter scan avg=${noFilter.sum / 10}%.1f ms")
      val client = new HttpSqlClient(s"http://127.0.0.1:${gw.boundPort}")
      val h = client.prepare("SELECT * FROM usertable WHERE ycsb_key = ?")
      (1 to 10).foreach(i => client.executeQuery(h, Seq(i.toLong)))
      val httpTimes = (1 to 20).map { i =>
        val t0 = System.nanoTime()
        client.executeQuery(h, Seq((i * 41 % 1000).toLong))
        (System.nanoTime() - t0) / 1e6
      }
      def stats(xs: Seq[Double]) = f"avg=${xs.sum / xs.size}%.1f min=${xs.min}%.1f max=${xs.max}%.1f"
      println(f"[lab-pointread] engine ${stats(engineTimes)} jobs/exec=$engineJobs%.1f")
      println(s"[lab-pointread] http   ${stats(httpTimes)}")
      gw.stop(); spark.stop()
      return
    }

    if (flags("dml")) {
      // DML latency anatomy without HTTP: route() straight into the
      // micro-lake, plus the footer-stats read cost in isolation
      import org.apache.spark.sql.types._
      val catalog = graft.sources.MutableCatalog(spark)
      val schema = StructType(
        StructField("ycsb_key", LongType) +:
          (1 to 10).map(i => StructField(s"field$i", StringType)))
      val t = catalog.create("usertable", schema, primaryKey = Some("ycsb_key"))
      (0 until 10).foreach { i =>
        val b = spark.range(i * 100L, i * 100L + 100).selectExpr(
          ("id AS ycsb_key" +: (1 to 10).map(f => s"concat('v', id, '_', $f) AS field$f")): _*)
        t.insert(b)
      }
      val one = t.dataFilePath(t.candidateFilesFor(
        t.currentVersion, "ycsb_key",
        org.apache.spark.sql.catalyst.expressions.Literal(5L)).head)
      val footer = (1 to 20).map { _ =>
        val t0 = System.nanoTime()
        graft.sources.FileStats.fromFooter(java.nio.file.Paths.get(one))
        (System.nanoTime() - t0) / 1e6
      }
      println(f"[lab-dml] fromFooter avg=${footer.sum / 20}%.2f ms")
      val jobs = new java.util.concurrent.atomic.AtomicLong()
      val stages = new java.util.concurrent.atomic.AtomicLong()
      val tasks = new java.util.concurrent.atomic.AtomicLong()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          stages.addAndGet(e.stageInfos.size)
          tasks.addAndGet(e.stageInfos.map(_.numTasks).sum)
        }
      })
      def timeOp(label: String, sqls: Int => String, reps: Int = 12): Unit = {
        val (j0, s0, k0) = (jobs.get(), stages.get(), tasks.get())
        val ts = (1 to reps).map { i =>
          val t0 = System.nanoTime()
          catalog.route(sqls(i))
          (System.nanoTime() - t0) / 1e6
        }
        Thread.sleep(200)
        println(f"[lab-dml] $label avg=${ts.sum / reps}%.1f min=${ts.min}%.1f max=${ts.max}%.1f " +
          f"jobs/op=${(jobs.get() - j0).toDouble / reps}%.1f stages/op=${(stages.get() - s0).toDouble / reps}%.1f " +
          f"tasks/op=${(tasks.get() - k0).toDouble / reps}%.1f")
      }
      timeOp("update", i => s"UPDATE usertable SET field1 = 'u$i' WHERE ycsb_key = ${i * 31 % 1000}")
      timeOp("delete", i => s"DELETE FROM usertable WHERE ycsb_key = ${900 + i}")
      timeOp("insert", i => s"INSERT INTO usertable VALUES (${2000 + i}, ${(1 to 10).map(f => s"'x${i}_$f'").mkString(",")})")
      spark.stop()
      return
    }

    if (flags("q16floor")) {
      // VERDICT r18 #1: decompose one prepared q16 re-execution — the
      // plan is A/B-exhausted, so find where the per-execution floor
      // lives: optimizer re-run? AQE re-planning? job/stage scheduling?
      import org.apache.spark.sql.graft.PlanReuse
      val cs = spark.newSession()
      val jobs = new java.util.concurrent.atomic.AtomicLong()
      val stages = new java.util.concurrent.atomic.AtomicLong()
      val tasks = new java.util.concurrent.atomic.AtomicLong()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          { jobs.incrementAndGet(); () }
        override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
          { stages.incrementAndGet(); () }
        override def onTaskStart(e: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
          { tasks.incrementAndGet(); () }
      })
      val name = sys.env.getOrElse("LAB_QUERY", "q16_supplier_cnt")
      val df = SparkEntry.queries(name)(cs, sfDir)
      (1 to 7).foreach(_ => PlanReuse.reanalyzed(cs, df).collect()) // settle JIT/codegen
      def measure(label: String, mk: () => org.apache.spark.sql.DataFrame, reps: Int = 15): Double = {
        (1 to 3).foreach(_ => mk().collect())
        Thread.sleep(200)
        val j0 = jobs.get(); val s0 = stages.get(); val k0 = tasks.get()
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); mk().collect(); (System.nanoTime() - t0) / 1e6
        }.sorted
        Thread.sleep(300)
        println(f"[lab-q16] $label%-24s med=${times(reps / 2)}%6.1f ms  min=${times.head}%6.1f  " +
          f"jobs/x=${(jobs.get() - j0).toDouble / reps}%4.1f  stages/x=${(stages.get() - s0).toDouble / reps}%4.1f  " +
          f"tasks/x=${(tasks.get() - k0).toDouble / reps}%5.1f")
        times(reps / 2)
      }
      // plan-time alone (no execution): optimizer + strategies + preps
      def planMs(mk: () => org.apache.spark.sql.DataFrame, reps: Int = 15): Double = {
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); PlanReuse.forcePlanned(mk()); (System.nanoTime() - t0) / 1e6
        }.sorted
        times(reps / 2)
      }
      measure("reanalyzed+aqe", () => PlanReuse.reanalyzed(cs, df))
      println(f"[lab-q16] plan-only (reanalyzed)    med=${planMs(() => PlanReuse.reanalyzed(cs, df))}%6.1f ms")
      val opt = PlanReuse.optimizedPlan(df)
      measure("reoptimized+aqe", () => PlanReuse.execute(cs, opt))
      println(f"[lab-q16] plan-only (reoptimized)   med=${planMs(() => PlanReuse.execute(cs, opt))}%6.1f ms")
      cs.conf.set("spark.sql.adaptive.enabled", "false")
      measure("reanalyzed+noaqe", () => PlanReuse.reanalyzed(cs, df))
      measure("reoptimized+noaqe", () => PlanReuse.execute(cs, opt))
      cs.conf.set("spark.sql.adaptive.enabled", "true")
      // scheduling floor on this session, for reference
      val bare = (1 to 15).map { _ =>
        val t0 = System.nanoTime(); cs.range(32).repartition(2).count(); (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"[lab-q16] 1-shuffle scheduling floor med=${bare(7)}%6.1f ms")
      spark.stop()
      return
    }

    if (flags("gwtpch")) {
      // VERDICT r19 #1 done-criterion + #7: drive TPC-H-class prepared
      // statements THROUGH the HTTP gateway (the served path: /prepare
      // once, /exec N — Session.runPrepared's plan cache + pin underneath)
      // and ledger per-execution latency against the same SQL re-executed
      // in-process. The delta IS the gateway+Arrow wire overhead; the
      // cache-hit counters prove the served path skips re-planning.
      val registry = new SessionRegistry(spark)
      val gw = SqlGateway.start(registry, new Metrics(), identity)
      val port = gw.boundPort
      def tbl(n: String) = s"parquet.`$sfDir/$n.parquet`"
      val qs: Seq[(String, String)] = Seq(
        "q6_class" ->
          s"""SELECT SUM(l_extendedprice * l_discount) AS revenue
             |FROM ${tbl("lineitem")}
             |WHERE l_shipdate >= TIMESTAMP '1994-01-01'
             |  AND l_shipdate < TIMESTAMP '1995-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
        "q16_class" ->
          // the repo's q16 shape (TESTDATA.md has no partsupp — supplier
          // sets come from lineitem like operators/Tpch.q16)
          s"""SELECT p_brand, p_type, p_size,
             |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
             |FROM ${tbl("lineitem")} JOIN ${tbl("part")} ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
             |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM ${tbl("supplier")}
             |                        WHERE s_acctbal < 0)
             |GROUP BY p_brand, p_type, p_size
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
        "q18_class" ->
          s"""SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
             |FROM ${tbl("customer")} JOIN ${tbl("orders")} ON c_custkey = o_custkey
             |JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
             |      FROM ${tbl("lineitem")} GROUP BY l_orderkey
             |      HAVING SUM(l_quantity) > 120) big ON o_orderkey = big.l_orderkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)
      val client = new HttpSqlClient(s"http://127.0.0.1:$port")
      val reps = sys.env.getOrElse("LAB_REPS", "15").toInt
      println(f"[lab-gw] ${"query"}%-10s  gw_med_ms  gw_min  inproc_med  inproc_min  " +
        "cache_hits  overhead_med")
      qs.foreach { case (name, sqlText) =>
        val handle = client.prepare(sqlText)
        (1 to 5).foreach(_ => client.executeQuery(handle, Seq.empty)) // warm + populate cache
        val gwTs = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          client.executeQuery(handle, Seq.empty)
          (System.nanoTime() - t0) / 1e6
        }.sorted
        // in-process twin: the same SQL re-executed through a Session on
        // the same engine (plan cache + pin, no HTTP/Arrow wire)
        val s = registry.get(client.sessionKey).get
        val inTs = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          s.executePrepared(handle, Seq.empty).collect()
          (System.nanoTime() - t0) / 1e6
        }.sorted
        val hits = s.planCacheHits.get()
        println(f"[lab-gw] $name%-10s  ${gwTs(reps / 2)}%8.1f  ${gwTs.head}%7.1f  " +
          f"${inTs(reps / 2)}%9.1f  ${inTs.head}%9.1f  $hits%10d  " +
          f"${gwTs(reps / 2) - inTs(reps / 2)}%8.1f")
      }
      gw.stop()
      spark.stop()
      return
    }

    if (flags("pinpolicy")) {
      // VERDICT r19 #2 ledger: per-TPC-H-query A/B of prepared
      // re-execution under AQE kept vs pinned off, against the shared
      // PreparedPlans.pinnable decision — validates that the per-plan
      // policy picks the faster regime for each query (and quantifies
      // the residual where it deliberately keeps AQE for scale safety).
      import org.apache.spark.sql.graft.{PlanReuse, PreparedPlans}
      val cs = spark.newSession()
      // LAB_QUERIES=txt5_rolling_hash,... widens the arm to any registry
      // query (r20: txt5's regression turned out to be regime-shaped)
      val names = sys.env.get("LAB_QUERIES")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(SparkEntry.queries.keys.filter(_.matches("q\\d+_.*")).toSeq.sorted)
      val reps = sys.env.getOrElse("LAB_REPS", "9").toInt
      println(f"[lab-pin] ${"query"}%-24s prior     calib     aqe_med  noaqe_med  jobs_on/off  verdict")
      var agree = 0; var total = 0
      names.foreach { n =>
        val df = SparkEntry.queries(n)(cs, sfDir)
        val prior = !PreparedPlans.pinnable(PlanReuse.optimizedPlan(df))
        (1 to 4).foreach(_ => PlanReuse.reanalyzed(cs, df).collect()) // settle codegen
        val (keepAqe, _, _) = PreparedPlans.calibrate(cs, PreparedPlans.analyzedPlan(df), reps = 2)
        var jobsOn = 0L; var jobsOff = 0L
        def med(aqe: Boolean): Double = {
          cs.conf.set("spark.sql.adaptive.enabled", aqe.toString)
          try {
            (1 to 2).foreach(_ => PlanReuse.reanalyzed(cs, df).collect())
            val j0 = cs.sparkContext.statusTracker.getJobIdsForGroup(null).length
            val ts = (1 to reps).map { _ =>
              val t0 = System.nanoTime()
              PlanReuse.reanalyzed(cs, df).collect()
              (System.nanoTime() - t0) / 1e6
            }.sorted
            val dj = (cs.sparkContext.statusTracker.getJobIdsForGroup(null).length - j0) / reps
            if (aqe) jobsOn = dj else jobsOff = dj
            ts(reps / 2)
          } finally cs.conf.set("spark.sql.adaptive.enabled", "true")
        }
        val on = med(true); val off = med(false)
        val fasterIsChosen = if (keepAqe) on <= off * 1.05 else off <= on * 1.05
        total += 1; if (fasterIsChosen) agree += 1
        def lbl(k: Boolean) = if (k) "keep-aqe" else "pin-off "
        println(f"[lab-pin] $n%-24s ${lbl(prior)}  ${lbl(keepAqe)}  $on%7.1f    $off%7.1f  $jobsOn%4d/$jobsOff%-4d  " +
          (if (fasterIsChosen) "OK" else f"CALIB-SLOWER by ${math.abs(on - off)}%.0f ms"))
      }
      println(s"[lab-pin] policy picked the faster regime (within 5%) for $agree/$total")
      spark.stop()
      return
    }

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

    // GC metering for the lab window (VERDICT r17 #1a: the G1-vs-Parallel
    // A/B must be re-runnable at the driver's heap size with pause
    // attribution in the output, not just rps)
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(b => math.max(0L, b.getCollectionTime)).sum
    }
    def gcN(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(b => math.max(0L, b.getCollectionCount)).sum
    }
    val gcNames = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getName).mkString("/")
    }
    val heap = java.lang.management.ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
    val (gc0, gn0) = (gcMs(), gcN())
    val lat = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val t0 = System.nanoTime()
    val threads = (0 until terminals).map { t =>
      val cs = sessions(t); val prepared = preparedPer(t)
      val th = new Thread(() => {
        var i = t
        while (System.nanoTime() - t0 < windowNanos) {
          val r0 = System.nanoTime()
          try {
            rerun(cs, prepared(mix(i % mix.length))).collect()
            completed.incrementAndGet()
            lat.add((System.nanoTime() - r0) / 1e6)
          } catch { case _: Throwable => }
          i += 1
        }
      })
      th.start(); th
    }
    threads.foreach(_.join())
    val elapsed = (System.nanoTime() - t0) / 1e9
    val gcD = gcMs() - gc0
    val lats = { import scala.jdk.CollectionConverters._; lat.asScala.toArray.sorted }
    def pct(p: Double): Double =
      if (lats.isEmpty) -1.0
      else lats(math.min(lats.length - 1, math.max(0, math.ceil(p * lats.length).toInt - 1)))
    println(f"[lab] flags=${flags.toSeq.sorted.mkString("+")}%s rps=${completed.get() / elapsed}%.3f " +
      f"requests=${completed.get()}%d window=$elapsed%.1f " +
      f"gc=$gcD%d ms (${100.0 * gcD / 1000.0 / elapsed}%.0f%% of wall, ${gcN() - gn0}%d collections, $gcNames) " +
      f"heap_max=${heap.getMax >> 20}%d MB p50=${pct(0.5)}%.0f p99=${pct(0.99)}%.0f ms")
    spark.stop()
  }
}
