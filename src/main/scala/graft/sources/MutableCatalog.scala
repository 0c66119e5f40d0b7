package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit}
import org.apache.spark.sql.types.StructType

/** SQL front for mutable tables: routes the DML the reference accepts
  * over Flight SQL — `INSERT`, `UPDATE … SET … WHERE`, `DELETE FROM …
  * WHERE` (exercised by scenarios/prepared_statements.rs:47-238 and the
  * YCSB workload mix, tests/benchbase/ycsb-flight-sql.xml:24) — onto the
  * copy-on-write [[MutableTable]] layer, since Spark SQL itself cannot
  * mutate parquet v1 tables (SURVEY §7.4).
  *
  * Every managed table is also registered as a temp view of its current
  * snapshot, so reads are plain Spark SQL; the view refreshes after each
  * mutation (snapshot isolation: a running query keeps scanning the file
  * list it planned against).
  */
final class MutableCatalog(spark: SparkSession, root: Path) {

  // concurrent server sessions share ONE catalog: reads (get/route/
  // syncViews) race creates/drops from other peers, so the registry is
  // a lock-free concurrent map — per-table mutation ordering is already
  // serialized inside MutableTable
  private val tables = scala.collection.concurrent.TrieMap.empty[String, MutableTable]

  def create(name: String, schema: StructType, primaryKey: Option[String] = None): MutableTable = {
    val t = MutableTable.create(spark, root.resolve(name).toString, schema, primaryKey)
    tables(name.toLowerCase) = t
    refresh(name)
    t
  }

  def get(name: String): Option[MutableTable] = tables.get(name.toLowerCase)

  def names: Seq[String] = tables.keys.toSeq.sorted

  def drop(name: String): Unit = {
    tables.remove(name.toLowerCase)
    viewVersions.remove(name.toLowerCase)
    spark.catalog.dropTempView(name)
  }

  // === transactions (SURVEY §7.4 session-buffered commit points) ===========
  // BEGIN snapshots every managed table's version; ROLLBACK restores each
  // mutated table to its snapshot (roll-forward commit) and drops tables
  // created inside the transaction. The semantics are the reference's
  // LENIENT contract (session/mod.rs:613-686): single-writer rollback
  // capability, not cross-session serializable isolation — a concurrent
  // writer's commits inside the window are rolled back with ours, exactly
  // the caveat the survey accepts.
  private var txnSnapshot: Option[Map[String, Long]] = None

  def inTransaction: Boolean = synchronized(txnSnapshot.isDefined)

  def begin(): Unit = synchronized {
    txnSnapshot = Some(tables.map { case (n, t) => n -> t.currentVersion }.toMap)
  }

  /** Per-statement writes are already durable (pointer swaps); COMMIT
    * just discards the rollback point (transaction.rs:68-93 tolerance:
    * commit without BEGIN is a no-op).
    */
  def commit(): Unit = synchronized { txnSnapshot = None }

  /** Restore every table to its BEGIN version; without an active
    * transaction this is the tolerated no-op.
    */
  def rollback(): Unit = synchronized {
    txnSnapshot.foreach { snap =>
      tables.keys.toSeq.filterNot(snap.contains).foreach(drop)
      snap.foreach { case (n, v) =>
        tables.get(n).foreach { t =>
          if (t.currentVersion != v) { t.restore(v); refresh(n) }
        }
      }
    }
    txnSnapshot = None
  }

  // Per-table view versions, bumped on every snapshot refresh, plus a
  // per-session record of the last version each session registered:
  // sessions call syncViews on every non-routed statement, so it must
  // re-register only CHANGED views and touch no lock when nothing
  // changed — the previous catalog-wide synchronized re-registration of
  // every table was an O(tables) serialization point shared by all
  // sessions.
  private val viewVersions = scala.collection.concurrent.TrieMap.empty[String, Long]
  private val versionClock = new java.util.concurrent.atomic.AtomicLong()
  private val syncedBySession = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, mutable.Map[String, Long]]())

  private def refresh(name: String): Unit = {
    tables(name.toLowerCase).df.createOrReplaceTempView(name)
    viewVersions(name.toLowerCase) = versionClock.incrementAndGet()
  }

  /** Register each managed table's current snapshot as a temp view in
    * `target`'s OWN view namespace. Each server session wraps
    * `newSession()` (isolated temp views), so shared-lake visibility —
    * the reference's per-session DuckDB connections over one DuckLake
    * catalog (engine/factory.rs:72-93) — needs the snapshot re-exposed
    * per session; the plan transplant is the same analyzed-plan rebind
    * the prepared path uses. Views whose table version the session has
    * already registered are skipped, so the steady-state call is a
    * version compare per table.
    */
  def syncViews(target: SparkSession): Unit = {
    if (tables.isEmpty) return
    // lookup-or-insert under ONE lock on the map: a racing get-then-put
    // would let two threads install distinct 'seen' maps for the same
    // session and silently lose recorded versions
    val seen = syncedBySession.synchronized {
      var m = syncedBySession.get(target)
      if (m == null) {
        m = mutable.Map.empty[String, Long]
        syncedBySession.put(target, m)
      }
      m
    }
    tables.foreach { case (name, t) =>
      val v = viewVersions.getOrElse(name, 0L)
      if (!seen.synchronized(seen.get(name).contains(v))) {
        org.apache.spark.sql.graft.PlanReuse.reanalyzed(target, t.df)
          .createOrReplaceTempView(name)
        seen.synchronized(seen(name) = v)
      }
    }
  }

  /** Arrow-ingest appender over a managed table — the micro-lake side
    * of the reference's `insert_with_appender`
    * (engine/connection.rs:163-196): shape the DoPut parameter batch to
    * the table schema and append. None when the table isn't managed
    * (caller falls through to the saved-table appender).
    */
  def insertBatch(name: String, batch: DataFrame,
      explicitCols: Option[Seq[String]] = None): Option[Long] =
    get(name).map { t =>
      val n = t.insert(BatchAlign.shapeParamBatch(spark, batch, t.schema, explicitCols))
      refresh(name)
      n
    }

  private val insertRe =
    "(?is)^\\s*INSERT\\s+INTO\\s+([A-Za-z_][\\w]*)\\s*(\\([^)]*\\))?\\s*VALUES\\s*(.+?);?\\s*$".r
  private val updateRe =
    "(?is)^\\s*UPDATE\\s+([A-Za-z_][\\w]*)\\s+SET\\s+(.+?)(?:\\s+WHERE\\s+(.+?))?;?\\s*$".r
  private val deleteRe =
    "(?is)^\\s*DELETE\\s+FROM\\s+([A-Za-z_][\\w]*)(?:\\s+WHERE\\s+(.+?))?;?\\s*$".r

  /** Route a DML statement against a managed table. Returns the affected
    * row count, or None when the statement doesn't target a managed
    * table (caller falls through to plain `spark.sql`).
    */
  def route(sql: String): Option[Long] = sql match {
    case insertRe(table, colsOpt, values) =>
      get(table).map { t =>
        val batch = spark.sql(s"SELECT * FROM (VALUES $values)")
        val explicit = Option(colsOpt).map(_.stripPrefix("(").stripSuffix(")")
          .split(",").map(_.trim).toSeq)
        // name the incoming columns after the target list (or table
        // prefix) so alignment matches the appender path (A8)
        val named = explicit match {
          case Some(cols) => batch.toDF(cols: _*)
          case None => batch.toDF(t.schema.fieldNames.take(batch.schema.length).toIndexedSeq: _*)
        }
        val n = t.insert(BatchAlign.alignToSchema(named, t.schema, explicit))
        refresh(table)
        n
      }
    case updateRe(table, setClause, whereOpt) =>
      get(table).map { t =>
        val assignments = splitAssignments(setClause).map { case (k, v) => k -> expr(v) }.toMap
        val cond = Option(whereOpt).map(expr).getOrElse(lit(true))
        val n = t.update(cond, assignments)
        refresh(table)
        n
      }
    case deleteRe(table, whereOpt) =>
      get(table).map { t =>
        val cond = Option(whereOpt).map(expr).getOrElse(lit(true))
        val n = t.delete(cond)
        refresh(table)
        n
      }
    case _ => None
  }

  /** Split `a = 1, b = 'x,y'` on top-level commas (quote-aware). */
  private def splitAssignments(s: String): Seq[(String, String)] = {
    val parts = mutable.Buffer.empty[String]
    var depth = 0; var inStr = false; var start = 0
    for (i <- s.indices) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => parts += s.substring(start, i); start = i + 1
        case _ =>
      }
    }
    parts += s.substring(start)
    parts.toSeq.map { a =>
      val eq = a.indexOf('=')
      require(eq > 0, s"malformed assignment: $a")
      (a.substring(0, eq).trim.stripPrefix("`").stripSuffix("`"), a.substring(eq + 1).trim)
    }
  }
}

object MutableCatalog {
  def apply(spark: SparkSession): MutableCatalog =
    new MutableCatalog(spark, Files.createTempDirectory("graft_mcat"))
}
