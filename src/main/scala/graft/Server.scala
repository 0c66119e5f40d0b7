package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.flight.FlightSqlProducer

/** The server boot sequence — the reference's `main.rs:17-126` minus the
  * gRPC bind (jar-blocked in-sandbox; the facade stands where tonic's
  * FlightServiceServer would). Order mirrors the reference exactly:
  * load config → boot the engine (thread override + init SQL) → spawn
  * checkpoint maintenance → create the session registry → spawn the
  * 5-minute idle-session cleanup → metrics → Flight SQL service →
  * status server → block until SIGINT/SIGTERM, then shut everything
  * down in reverse.
  *
  * `Server.boot` returns the running assembly so tests (and an eventual
  * gRPC adapter) drive it in-process; `Server.main` adds the signal
  * wait the reference's tokio::select! performs.
  */
object Server {

  final case class Running(
      config: ServerConfig,
      spark: org.apache.spark.sql.SparkSession,
      registry: SessionRegistry,
      metrics: Metrics,
      producer: FlightSqlProducer,
      maint: graft.maintenance.Maintenance,
      status: Option[StatusServer],
      gateway: Option[SqlGateway],
      ownsSpark: Boolean,
      catalog: Option[sources.MutableCatalog]) {

    private[Server] val scheduler = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-server-timers"); t.setDaemon(true); t
    }

    /** main.rs:42-52 — idle sessions reaped every 5 minutes; the
      * maintenance tick shares the timer (CheckpointService's poll).
      */
    // a throwing execution would silently cancel the periodic task
    // (ScheduledThreadPoolExecutor semantics) — the reference's loops
    // keep running across failed sweeps, so swallow-and-log per tick;
    // fatals (OOM etc.) still propagate and take the timer down
    private def safely(label: String)(f: => Unit): Runnable = () =>
      try f catch {
        case scala.util.control.NonFatal(t) =>
          System.err.println(
            s"[graft-server] $label failed: ${t.getClass.getSimpleName}: ${t.getMessage}")
      }

    /** Registration follows the LIVE catalog: tables created after boot
      * join the sweep, dropped tables leave it — a boot-time snapshot
      * would sweep stale directories and miss new tables.
      */
    private[graft] def syncCheckpointRegistrations(): Unit = catalog.foreach { c =>
      val wanted = config.checkpointDatabases
        .map(_.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet)
      val live = c.names.filter(n => wanted.forall(_.contains(n))).toSet
      maint.registered.filterNot(live).foreach(maint.unregister)
      live.foreach(n => c.get(n).foreach(t => maint.register(n, t)))
    }

    private[Server] def startTimers(cleanupPeriodSeconds: Long = 300L): Unit = {
      scheduler.scheduleAtFixedRate(
        // commit roll-forward shares the sweep: a durable commit record
        // whose inline recovery failed (transient IO mid-publish) now
        // heals on the next tick instead of waiting for a restart —
        // the listing is one directory stat when no record is pending
        safely("idle-session cleanup") {
          registry.cleanupIdle()
          catalog.foreach(_.recoverPendingCommits())
        },
        cleanupPeriodSeconds, cleanupPeriodSeconds, TimeUnit.SECONDS)
      config.checkpointPollSeconds.foreach(poll =>
        scheduler.scheduleAtFixedRate(
          safely("checkpoint tick") { syncCheckpointRegistrations(); maint.tick() },
          poll, poll, TimeUnit.SECONDS))
    }

    /** Reverse-order teardown (main.rs's graceful shutdown). A borrowed
      * session (in-proc embedding, tests) is left running.
      */
    def shutdown(): Unit = {
      scheduler.shutdownNow()
      gateway.foreach(_.stop())
      status.foreach(_.stop())
      if (ownsSpark) spark.stop()
    }
  }

  /** Assemble and start every component from the configuration. Pass
    * `sharedSpark` to embed the server over an existing session (the
    * in-proc analog of the reference's EngineFactory reuse); shutdown
    * then leaves that session alone. `catalog` is the micro-lake the
    * sessions mutate and the checkpoint timer sweeps —
    * SWANLAKE_CHECKPOINT_DATABASES (comma-separated) scopes the sweep
    * to those tables, unset sweeps every catalog table. If a later
    * boot step throws, an owned session is stopped before rethrowing
    * so a retrying embedder cannot leak SparkSessions.
    */
  def boot(config: ServerConfig = ServerConfig.load(),
      sharedSpark: Option[org.apache.spark.sql.SparkSession] = None,
      catalog: Option[sources.MutableCatalog] = None): Running = {
    // misconfiguration fails loudly even for hand-built configs (load()
    // already validated env-sourced ones)
    config.validate()
    // a listed checkpoint name with no catalog table is warned once at
    // boot — it may name a table created later, so it is not an error
    for (c <- catalog; listed <- config.checkpointDatabases.toSeq;
         n <- listed.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty)
         if c.get(n).isEmpty)
      System.err.println(s"[graft-server] SWANLAKE_CHECKPOINT_DATABASES: no table '$n' yet")
    val spark = sharedSpark.getOrElse(config.newRootSession("graft-server"))
    var status: Option[StatusServer] = None
    var gateway: Option[SqlGateway] = None
    var running: Option[Running] = None
    try {
      val maint = config.newMaintenance()
      val registry = config.newRegistry(spark, catalog)
      val metrics = config.newMetrics()
      val producer = new FlightSqlProducer(registry, Some(metrics), config.sessionKey)
      status = config.startStatus(metrics, registry)
      // the query transport: SQL-over-HTTP on the reference's data port
      // (host/port config), standing where the jar-blocked gRPC bind
      // would listen — see SqlGateway
      gateway = Some(SqlGateway.start(registry, metrics, config.sessionKey,
        config.host, config.port))
      val r = Running(config, spark, registry, metrics, producer, maint, status,
        gateway, sharedSpark.isEmpty, catalog)
      running = Some(r)
      r.syncCheckpointRegistrations()
      r.startTimers()
      r
    } catch {
      case t: Throwable =>
        // release EVERYTHING acquired so a retrying embedder starts clean
        running match {
          case Some(r) => r.shutdown()
          case None =>
            gateway.foreach(_.stop())
            status.foreach(_.stop())
            if (sharedSpark.isEmpty) spark.stop()
        }
        throw t
    }
  }

  def main(args: Array[String]): Unit = {
    val running = boot()
    val port = running.status.map(_.boundPort)
    println(s"graft server up: sessions<=${running.config.maxSessions}, " +
      s"sql=${running.config.host}:${running.gateway.map(_.boundPort).getOrElse(-1)} " +
      s"status=${port.map(p => s"${running.config.statusHost}:$p").getOrElse("disabled")} " +
      "(POST /sql; Flight SQL service is in-process — gRPC framing requires arrow-flight jars)")
    // block until SIGINT/SIGTERM — the reference's tokio::select! wait
    val done = new CountDownLatch(1)
    sys.addShutdownHook {
      running.shutdown()
      done.countDown()
      println("server shutdown complete")
    }
    done.await()
  }
}
