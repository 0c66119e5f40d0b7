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

  def create(name: String, schema: StructType, primaryKey: Option[String] = None,
      txn: Option[CatalogTxn] = None): MutableTable = {
    val t = MutableTable.create(spark, root.resolve(name).toString, schema, primaryKey)
    tables(name.toLowerCase) = t
    refresh(name)
    // DDL is immediately visible (the reference's DuckDB behaves the same
    // for cross-connection catalog changes); the txn records the creation
    // so ROLLBACK can drop it
    txn.foreach(_.created += name)
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
  // A transaction is a PER-SESSION staging area (A22, the reference's
  // BEGIN…COMMIT atomicity via DuckDB, session/mod.rs:613-686): each DML
  // inside the txn builds a new STAGED manifest on top of the session's
  // previous staged version (read-your-writes within the session) while
  // the table's published `_version` pointer — what every other session's
  // views resolve — never moves. COMMIT publishes each staged table with
  // one atomic pointer swap per table under the catalog lock; ROLLBACK
  // discards the staged map (the staged manifests linger unreferenced,
  // same as restore()'s rolled-back interval) and drops tables created
  // inside the txn. Remaining leniency, documented: concurrent writers
  // to the SAME table race last-pointer-swap-wins (the reference's
  // single-writer assumption), and a multi-table commit is atomic per
  // table, not across tables.
  def beginTxn(): CatalogTxn = new CatalogTxn

  /** Publish every staged table version — one pointer swap per table —
    * then retire the txn. Committing an empty or already-closed txn is
    * the tolerated no-op (transaction.rs:68-93).
    */
  def commitTxn(txn: CatalogTxn): Unit = synchronized {
    txn.staged.foreach { case (n, v) =>
      tables.get(n).foreach { t => t.publish(v); refresh(n) }
    }
    txn.staged.clear(); txn.created.clear()
  }

  /** Discard all staged writes and drop tables created inside the txn;
    * without any staged state this is the tolerated no-op.
    */
  def rollbackTxn(txn: CatalogTxn): Unit = synchronized {
    txn.created.foreach(drop)
    txn.staged.clear(); txn.created.clear()
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
  def syncViews(target: SparkSession, txn: Option[CatalogTxn] = None): Unit = {
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
      // a table this txn has staged resolves to ITS OWN staged snapshot
      // (read-your-writes); everyone else sees the published snapshot.
      // The seen-marker spaces must not collide: published registrations
      // record the positive viewVersions clock tick, staged ones the
      // NEGATIVE staged version — so leaving/entering/advancing a txn
      // always re-registers, and after commit the bumped clock replaces
      // the staged marker.
      val stagedV = txn.flatMap(_.staged.get(name))
      val marker = stagedV.map(v => -(v + 1)).getOrElse(viewVersions.getOrElse(name, 0L))
      if (!seen.synchronized(seen.get(name).contains(marker))) {
        val snapshot = stagedV.map(t.asOf).getOrElse(t.df)
        org.apache.spark.sql.graft.PlanReuse.reanalyzed(target, snapshot)
          .createOrReplaceTempView(name)
        seen.synchronized(seen(name) = marker)
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
      explicitCols: Option[Seq[String]] = None,
      txn: Option[CatalogTxn] = None): Option[Long] =
    get(name).map { t =>
      val shaped = BatchAlign.shapeParamBatch(spark, batch, t.schema, explicitCols)
      txn match {
        case Some(x) =>
          val bv = x.staged.getOrElse(name.toLowerCase, t.currentVersion)
          val (v, n) = t.stageInsert(bv, shaped)
          x.staged(name.toLowerCase) = v
          n
        case None =>
          val n = t.insert(shaped)
          refresh(name)
          n
      }
    }

  private val insertRe =
    "(?is)^\\s*INSERT\\s+INTO\\s+([A-Za-z_][\\w]*)\\s*(\\([^)]*\\))?\\s*VALUES\\s*(.+?);?\\s*$".r
  private val updateRe =
    "(?is)^\\s*UPDATE\\s+([A-Za-z_][\\w]*)\\s+SET\\s+(.+?)(?:\\s+WHERE\\s+(.+?))?;?\\s*$".r
  private val deleteRe =
    "(?is)^\\s*DELETE\\s+FROM\\s+([A-Za-z_][\\w]*)(?:\\s+WHERE\\s+(.+?))?;?\\s*$".r

  /** Route a DML statement against a managed table. Returns the affected
    * row count, or None when the statement doesn't target a managed
    * table (caller falls through to plain `spark.sql`). With an active
    * `txn`, the mutation is STAGED: it builds on the txn's previous
    * staged version of the table (or the published version on first
    * touch) and records the new staged version in the txn instead of
    * publishing — invisible to every other session until `commitTxn`.
    */
  def route(sql: String, txn: Option[CatalogTxn] = None): Option[Long] = {
    // Within-txn mutations chain off the session's own staged version
    // (snapshot taken on first touch). NON-txn mutations go through the
    // table's atomic mutators — read-stage-publish under ONE writeLock
    // hold, so concurrent autocommit writers never lose an update.
    def base(name: String, t: MutableTable): Long =
      txn.flatMap(_.staged.get(name.toLowerCase)).getOrElse(t.currentVersion)
    def record(name: String, x: CatalogTxn, staged: (Long, Long)): Long = {
      x.staged(name.toLowerCase) = staged._1; staged._2
    }
    sql match {
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
          val aligned = BatchAlign.alignToSchema(named, t.schema, explicit)
          txn match {
            case Some(x) => record(table, x, t.stageInsert(base(table, t), aligned))
            case None    => val n = t.insert(aligned); refresh(table); n
          }
        }
      case updateRe(table, setClause, whereOpt) =>
        get(table).map { t =>
          val assignments = splitAssignments(setClause).map { case (k, v) => k -> expr(v) }.toMap
          val cond = Option(whereOpt).map(expr).getOrElse(lit(true))
          txn match {
            case Some(x) => record(table, x, t.stageUpdate(base(table, t), cond, assignments))
            case None    => val n = t.update(cond, assignments); refresh(table); n
          }
        }
      case deleteRe(table, whereOpt) =>
        get(table).map { t =>
          val cond = Option(whereOpt).map(expr).getOrElse(lit(true))
          txn match {
            case Some(x) => record(table, x, t.stageDelete(base(table, t), cond))
            case None    => val n = t.delete(cond); refresh(table); n
          }
        }
      case _ => None
    }
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

/** One session's open transaction: the staged (unpublished) version of
  * each table it has mutated, lowercase-keyed like the catalog registry,
  * plus the tables it created (dropped again on rollback). Owned by
  * exactly one [[graft.Session]] at a time — per-session, not
  * catalog-global, so concurrent sessions' transactions never collide.
  */
final class CatalogTxn private[sources] {
  private[sources] val staged = scala.collection.mutable.Map.empty[String, Long]
  private[sources] val created = scala.collection.mutable.Set.empty[String]
  /** Tables this txn has staged writes for (visible for specs/diagnostics). */
  def stagedTables: Set[String] = staged.keySet.toSet
}
