package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Snapshot-versioned mutable parquet table — the Spark re-expression of
  * what DuckLake gives the reference (SURVEY §7.4): ACID-ish
  * UPDATE/DELETE/PK-errors over immutable parquet files.
  *
  * Layout (a micro-lake: snapshot id + file list, exactly the shape the
  * survey prescribes):
  * {{{
  *   root/data/part-<uuid>.parquet     immutable data files
  *   root/manifest-<v>.json            file list + schema for version v
  *   root/_version                     current version pointer (atomic swap)
  * }}}
  *
  * - INSERT appends new files and a new manifest — old files untouched.
  * - DELETE/UPDATE are file-level copy-on-write: only files that contain
  *   matching rows are rewritten (located via `input_file_name`), the
  *   rest carry over by reference. At 100 TB with partition-pruned
  *   predicates this rewrites only the touched partitions, the same
  *   mechanics as DuckLake/Iceberg/Delta CoW.
  * - PRIMARY KEY duplicate inserts raise `DuplicateKeyException`
  *   (tests/sql/error_status.test contract; Spark itself enforces no
  *   keys, so this is the engine-level anti-join check from SURVEY §2.B).
  * - `checkpoint()` compacts the file set (maintenance/mod.rs:24-223 —
  *   `CHECKPOINT` ≈ compaction job; the reference's cross-instance
  *   Postgres advisory lock becomes a single-writer assumption here).
  * - Old manifests remain readable: `asOf(v)` is snapshot time travel.
  *
  * Commit protocol: write manifest-v, then atomically swap `_version`.
  * Readers resolve the pointer once and read an immutable file list, so
  * a concurrent commit never yields a torn read.
  */
final class MutableTable private (
    val spark: SparkSession,
    val root: Path,
    val schema: StructType,
    val primaryKey: Option[String]) {

  final class DuplicateKeyException(msg: String) extends RuntimeException(msg)

  private def dataDir: Path = root.resolve("data")
  private def versionFile: Path = root.resolve("_version")

  /** Normalized absolute data-dir path — the [[StatsRegistry]] key the
    * optimizer's scan-prune rule resolves a relation's files against.
    */
  def dataDirKey: String = dataDir.toAbsolutePath.normalize.toString

  def currentVersion: Long = new String(Files.readAllBytes(versionFile)).trim.toLong

  // In-process writer serialization: concurrent server sessions share
  // one MutableTable instance per name, and every mutator is a
  // read-version -> stage -> commit(v+1) sequence -- without a lock two
  // writers both commit v+1 and one update is lost. Cross-PROCESS
  // writes remain the documented single-writer assumption (the
  // reference's Postgres advisory lock, maintenance/mod.rs).
  private val writeLock = new Object

  // Isolated session for the INTERNAL DML frames (discovery aggregate,
  // PK check, rewrite): AQE's shuffle-stage materialization costs one
  // extra JOB per aggregate, which on the point-DML path is pure
  // latency — these aggregates move a handful of rows over ≤4
  // partitions, exactly the case runtime re-planning cannot help.
  // Caller-provided DataFrames keep their own session (and AQE).
  private lazy val dmlSession: SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    // committer algorithm v2 skips the final output-directory rename
    // pass: its non-atomicity caveat does not apply here because a
    // staged write's VISIBILITY is governed by the manifest pointer
    // swap, never by the output directory — adoption moves the part
    // files out regardless
    // UNPREFIXED key: SessionState.newHadoopConf copies session-conf
    // entries into the per-query Hadoop conf verbatim (no spark.hadoop.
    // prefix stripping at the session layer — review-verified against
    // the 4.1.2 bytecode), so the prefixed spelling never reaches
    // FileOutputCommitter
    s.conf.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    s
  }

  private def manifestPath(v: Long): Path = root.resolve(s"manifest-$v.json")

  // fd-leak-safe directory listing — ONE definition in the companion
  // (r19 review: MutableCatalog.recoverPendingCommits re-implemented
  // the stream-closing boilerplate inline)
  private def listDir(p: Path): Seq[Path] = MutableTable.listDir(p)

  private def readManifest(v: Long): Seq[String] = {
    val txt = new String(Files.readAllBytes(manifestPath(v)))
    // minimal JSON: {"files": ["a.parquet", ...], "stats": [...]} — the
    // files array is the FIRST bracket pair (names contain no brackets)
    val open = txt.indexOf('[')
    val body = txt.substring(open + 1, txt.indexOf(']', open)).trim
    if (body.isEmpty) Seq.empty
    else body.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
  }

  // Per-file column stats, keyed by data-file name. A data file is
  // immutable once adopted, so its stats are too: entries accumulate
  // from footers read at stage time and from manifests read back after
  // a restart — any manifest mentioning a file carries the same stats.
  private val fileStats =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, ColStats]]

  /** Stats for one live data file (empty when unknown — e.g. a manifest
    * written before stats existed). Used by the catalog-style pruning
    * here and by the optimizer's scan-prune rule via [[StatsRegistry]].
    */
  def statsFor(fileName: String): Map[String, ColStats] =
    fileStats.getOrElse(fileName, Map.empty)

  /** Load the published snapshot's persisted stats (idempotent; the
    * optimizer's scan-prune rule calls this before consulting
    * [[statsFor]] — a table `load()`ed after a restart has stats only
    * on disk until someone reads them).
    */
  def ensureStatsLoaded(): Unit = loadStats(currentVersion)

  private val statsLoadedVersions =
    scala.collection.concurrent.TrieMap.empty[Long, Unit]

  /** Merge manifest `v`'s persisted stats into the in-memory map (cheap
    * and once per version; called by readers about to prune against v).
    */
  private def loadStats(v: Long): Unit = {
    if (statsLoadedVersions.putIfAbsent(v, ()).isDefined) return
    val txt = new String(Files.readAllBytes(manifestPath(v)))
    val idx = txt.indexOf("\"stats\"")
    if (idx < 0) return
    val open = txt.indexOf('[', idx)
    if (open < 0) return
    val body = txt.substring(open + 1, txt.indexOf(']', open)).trim
    if (body.isEmpty) return
    body.split(",").toSeq
      .flatMap(raw => FileStats.decodeEntry(raw.trim.stripPrefix("\"").stripSuffix("\"")))
      .groupBy(_._1)
      .foreach { case (file, entries) =>
        // a manifest always carries a file's complete column set, and a
        // file's stats never change — first writer wins is exact
        fileStats.putIfAbsent(file, entries.map(e => e._2 -> e._3).toMap)
      }
  }

  private def writeManifest(v: Long, files: Seq[String]): Unit = {
    val fs = files.map(f => "\"" + f + "\"").mkString("[", ", ", "]")
    val statEntries = FileStats.encodeEntries(
      files.iterator.flatMap(f => fileStats.get(f).map(f -> _)).toMap)
    val st = statEntries.map(e => "\"" + e + "\"").mkString("[", ", ", "]")
    Files.write(manifestPath(v), s"""{"files": $fs, "stats": $st}""".getBytes)
  }

  private def commit(newVersion: Long, files: Seq[String]): Unit = {
    writeManifest(newVersion, files)
    publish(newVersion)
  }

  /** commit/writeManifest with orphan cleanup (r19 review): a publish
    * that fails AFTER its manifest landed — or a torn manifest write —
    * must not leave manifest-nv on disk, where it would (a) pin data
    * files the caller's cleanup is about to delete as "live" against
    * vacuum and (b) let restore(nv)/asOf(nv) commit a version whose
    * reads throw. The unpublished manifest is safe to delete: no
    * pointer references it.
    */
  private def commitOrClean(nv: Long, files: Seq[String], publishNow: Boolean): Unit =
    try { if (publishNow) commit(nv, files) else writeManifest(nv, files) }
    catch { case e: Throwable => Files.deleteIfExists(manifestPath(nv)); throw e }

  /** Atomically swing the version pointer to an already-written manifest
    * — the §7.4 commit point. Used directly by the catalog's transaction
    * commit: every staged manifest becomes visible with ONE pointer swap
    * per table.
    */
  def publish(version: Long): Unit = writeLock.synchronized {
    require(Files.exists(manifestPath(version)), s"unknown version $version")
    val tmp = root.resolve(s"_version.tmp.${UUID.randomUUID()}")
    Files.write(tmp, version.toString.getBytes)
    Files.move(tmp, versionFile, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  // Version allocator: staged (transactional) manifests are written
  // WITHOUT moving the pointer, so `currentVersion + 1` can collide with
  // a staged number — allocation tracks the max manifest ever written
  // instead (lazily initialized from disk so load() of an existing table
  // works). Callers hold writeLock.
  private var maxVersionCache: Long = -1L
  private def allocVersion(): Long = {
    if (maxVersionCache < 0) {
      val onDisk = listDir(root).iterator
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("manifest-") && n.endsWith(".json"))
        .map(_.stripPrefix("manifest-").stripSuffix(".json").toLong)
        .foldLeft(-1L)(math.max)
      maxVersionCache = math.max(onDisk, scala.util.Try(currentVersion).getOrElse(-1L))
    }
    maxVersionCache += 1
    maxVersionCache
  }

  /** Roll the table forward to a NEW version whose contents are those of
    * `version` — the rollback primitive (SURVEY §7.4 "committed
    * atomically via the catalog pointer swap"). Roll-FORWARD, not
    * pointer rewind: version numbers stay monotonic, every manifest
    * written stays immutable, and `asOf` time travel over the rolled-back
    * interval keeps working. Requires the target manifest's files to
    * still exist (i.e. no intervening `vacuum`).
    */
  def restore(version: Long): Long = writeLock.synchronized {
    require(Files.exists(manifestPath(version)), s"unknown version $version")
    val v = currentVersion
    if (version == v) v
    else {
      loadStats(version) // restored files keep their persisted stats
      val nv = allocVersion()
      commit(nv, readManifest(version))
      nv
    }
  }

  /** Current table contents (empty-schema DataFrame when no files). */
  def df: DataFrame = asOf(currentVersion)

  /** Snapshot read of any retained version. */
  def asOf(version: Long): DataFrame = {
    val files = readManifest(version).map(f => dataDir.resolve(f).toString)
    if (files.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
  }

  /** Move the part files of a staged spark write into data/, returning
    * their new (unique) names.
    */
  private def adoptStaged(staged: Path): Seq[String] = {
    val parts = listDir(staged)
      .filter(p => p.getFileName.toString.startsWith("part-") && p.toString.endsWith(".parquet"))
    parts.map { p =>
      val name = s"part-${UUID.randomUUID()}.parquet"
      val dest = dataDir.resolve(name)
      Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE)
      // column bounds off the footer the writer just produced — pure
      // metadata read, no job; persisted with the next manifest so a
      // restarted process prunes without re-reading footers
      try fileStats(name) = FileStats.fromFooter(dest)
      catch { case _: Exception => () } // statless file: never pruned, still correct
      name
    }
  }

  /** Write a batch into a staged directory with LAKE-WRITER FILE SIZING:
    * one file per ~32 MB of plan-estimated data (micro-lake scale; a
    * cluster writer targets 128-512 MB the same way), never more files
    * than source partitions. Without this every DML batch landed one
    * file PER SOURCE TASK — a 100-row VALUES insert wrote 8 files, ten
    * loads made an 80-file usertable, and every subsequent scan paid 80
    * tasks (round-14 YCSB latency diagnosis). `exactFiles` (checkpoint/
    * compaction) bypasses the estimate.
    */
  private def stageWrite(data: DataFrame, exactFiles: Option[Int] = None,
      knownBytes: Option[Long] = None): Seq[String] = {
    val staged = root.resolve(s"stage-${UUID.randomUUID()}")
    val aligned = BatchAlign.alignToSchema(data, schema)
    val out = exactFiles match {
      case Some(n) => aligned.repartition(n)
      case None =>
        // callers that rewrite EXISTING files pass their summed on-disk
        // size (an fstat per file) — plan-estimated stats would run a
        // whole optimizer pass just to size the output
        val bytes = knownBytes.map(BigInt(_))
          .getOrElse(aligned.queryExecution.optimizedPlan.stats.sizeInBytes)
        val target = ((bytes / (32L << 20)) + 1).min(BigInt(10000)).max(BigInt(1)).toInt
        // coalesce never RAISES the partition count, so no probe needed
        // — touching `aligned.rdd` here would finalize the adaptive plan
        // and execute every shuffle stage once, doubling shuffle-bearing
        // DML (the write below re-executes; no exchange reuse across
        // executions)
        aligned.coalesce(target)
    }
    out.write.parquet(staged.toString)
    val names = adoptStaged(staged)
    val walk = Files.walk(staged)
    try walk.sorted(java.util.Comparator.reverseOrder()).forEach(p => Files.deleteIfExists(p))
    finally walk.close()
    names
  }

  /** Append rows; enforces the primary key when declared — duplicates in
    * the batch or against existing rows error, nothing is committed.
    */
  def insert(data: DataFrame): Long = writeLock.synchronized {
    val (v, n) = insertCore(currentVersion, data, publishNow = true)
    n
  }

  /** Transactional variant: append on top of `base` into a new STAGED
    * manifest — written to disk but not published, so no other reader
    * sees it until [[publish]]. Returns (stagedVersion, rowCount).
    */
  def stageInsert(base: Long, data: DataFrame): (Long, Long) = writeLock.synchronized {
    insertCore(base, data, publishNow = false)
  }

  private def insertCore(base: Long, data: DataFrame, publishNow: Boolean): (Long, Long) = {
    // WRITE FIRST, then validate off the staged files' own footer stats
    // (round-15 restructure). The previous shape semi-joined the batch
    // against the WHOLE table per insert — a full-table scan per append,
    // which at 100 TB is the difference between an append and a table
    // pass. Staged-first instead: the just-written files carry pk
    // bounds, so the clash check prunes the table side to bound-
    // OVERLAPPING files — for monotone keys (the append-only common
    // case) that set is EMPTY and no table byte is read. The staged
    // files are unreferenced by any manifest until the commit below, so
    // a failed check just deletes them (vacuum would reclaim them after
    // a crash anyway).
    // carried-over files' persisted stats must survive into the new
    // manifest even right after a restart (writeManifest persists only
    // what the in-memory map holds — review finding, round 15)
    loadStats(base)
    val ti0 = System.nanoTime()
    val newFiles = stageWrite(data)
    val ti1 = System.nanoTime()
    try {
      primaryKey.foreach(pk => pkCheck(base, newFiles, pk))
      if (graft.Engine.dmlTrace)
        System.err.println(f"[dml-trace] insert write=${(ti1 - ti0) / 1e6}%.0f pkcheck=${(System.nanoTime() - ti1) / 1e6}%.0f ms")
      // row count straight off the footers — no counting job
      val n = newFiles.map(f =>
        statsFor(f).values.headOption.map(_.rows).getOrElse(-1L)) match {
        case rs if rs.nonEmpty && rs.forall(_ >= 0) => rs.sum
        case _ =>
          if (newFiles.isEmpty) 0L
          else dmlSession.read.schema(schema)
            .parquet(newFiles.map(f => dataDir.resolve(f).toString): _*).count()
      }
      val nv = allocVersion()
      commitOrClean(nv, readManifest(base) ++ newFiles, publishNow)
      (nv, n)
    } catch {
      case e: Throwable =>
        newFiles.foreach { f =>
          fileStats.remove(f)
          Files.deleteIfExists(dataDir.resolve(f))
        }
        throw e
    }
  }

  /** Driver-side small-batch INSERT (VERDICT r15 #3): rows already
    * aligned+coerced to the schema land via one parquet-mr write — no
    * Spark job, no planning. The pk in-batch check runs over the
    * in-memory rows (same canonicalization as the planned path); the
    * clash-vs-table check rides the staged file's own footer bounds and
    * only falls to the planned aggregate when bounds actually overlap.
    * None = schema unsupported (caller falls back); DuplicateKeyException
    * propagates like the planned path's.
    */
  def insertRowsDirect(rows: Seq[Array[Any]]): Option[Long] = writeLock.synchronized {
    // row cap (review finding, round 16): a bulk literal batch past the
    // driver bound belongs to the planned path — parallel write, 32 MB
    // file sizing — not a single-threaded one-file parquet-mr write
    if (!DriverDml.supported(schema) || rows.isEmpty ||
      rows.size > driverRewriteMaxRows) return None
    val base = currentVersion
    loadStats(base)
    // in-batch duplicate check, in memory — canonicalize signed zeros
    // exactly like pkCheckDriverSide so both fast paths match the
    // planned path's grouping semantics
    primaryKey.foreach { pk =>
      val pi = schema.fieldIndex(pk)
      val seen = new java.util.HashSet[Any]()
      var nullSeen = false
      rows.foreach { r =>
        val v = r(pi) match {
          case d: Double => d + 0.0d
          case f: Float => f + 0.0f
          case other => other
        }
        if (v == null) {
          if (nullSeen) throw new DuplicateKeyException(s"duplicate key in batch: $pk=null")
          nullSeen = true
        } else if (!seen.add(v))
          throw new DuplicateKeyException(s"duplicate key in batch: $pk=$v")
      }
    }
    val name = s"part-${UUID.randomUUID()}.parquet"
    val dest = dataDir.resolve(name)
    try {
      DriverDml.writeRows(dest, schema, rows)
      fileStats(name) = FileStats.fromFooter(dest)
    } catch {
      case _: Exception => // codec hiccup: clean up, planned path decides
        fileStats.remove(name); Files.deleteIfExists(dest)
        return None
    }
    try {
      primaryKey.foreach { pk =>
        // bounds overlap vs the table: the in-batch check is done, so an
        // empty candidate set finishes the enforcement; any overlap (or
        // unusable bounds — e.g. a NULL pk in the batch) takes the same
        // planned aggregate the staged-file path uses
        val nb = statsFor(name).get(pk)
        val boundsKnown = nb.exists(s => s.min.isDefined && s.max.isDefined && s.nulls == 0)
        val overlap =
          if (!boundsKnown) true
          else readManifest(base).exists { f =>
            statsFor(f).get(pk) match {
              case Some(s) if s.min.isDefined && s.max.isDefined =>
                FileStats.compare(s.kind, nb.get.min.get, s.max.get) <= 0 &&
                  FileStats.compare(s.kind, nb.get.max.get, s.min.get) >= 0
              case _ => true
            }
          }
        if (overlap) pkCheck(base, Seq(name), pk)
      }
      val (manifest, compactFile) = compactSmallDriverSide(readManifest(base) :+ name)
      try commit(allocVersion(), manifest)
      catch {
        case e: Throwable => // failed commit never referenced the merge
          compactFile.foreach { cf =>
            fileStats.remove(cf); Files.deleteIfExists(dataDir.resolve(cf))
          }
          throw e
      }
      Some(rows.size.toLong)
    } catch {
      case e: Throwable =>
        fileStats.remove(name)
        Files.deleteIfExists(dest)
        throw e
    }
  }

  /** Driver-side copy-on-write UPDATE/DELETE (VERDICT r15 #3): when the
    * stats-pruned candidate set is small, every column type is codec-
    * supported, the predicate micro-resolves, and (for UPDATE) every
    * assignment folds to a literal — discovery, rewrite, and commit all
    * run in-process: read candidates via parquet-mr, evaluate the BOUND
    * predicate per row (Spark's own expression eval, so semantics are
    * Catalyst's — three-valued logic included), write the replacement
    * file, swap the manifest. ~15 ms where the planned path pays ~200 ms
    * of job/planning overhead for the same handful of rows. None = any
    * gate failed; the caller runs the planned path.
    */
  // fast-path hit counter (observability for specs and probes: proves a
  // statement actually took the in-process rewrite, not the planned path)
  private[sources] val driverRewriteHits = new java.util.concurrent.atomic.AtomicLong()

  private def driverRewrite(base: Long, cond: Column,
      set: Option[Map[String, Column]], publishNow: Boolean): Option[(Long, Long)] = {
    val r = driverRewriteImpl(base, cond, set, publishNow)
    if (r.isDefined) driverRewriteHits.incrementAndGet()
    r
  }

  private def driverRewriteImpl(base: Long, cond: Column,
      set: Option[Map[String, Column]], publishNow: Boolean): Option[(Long, Long)] = {
    if (!DriverDml.supported(schema)) return None
    val all = readManifest(base)
    if (all.isEmpty) return Some((base, 0L))
    loadStats(base)
    val resolved = (try quickResolve(org.apache.spark.sql.graft.bridge.unresolvedExpression(cond))
      catch { case _: Exception => None }).getOrElse(return None)
    val bound = DriverDml.bind(resolved, schema).getOrElse(return None)
    // fold SET assignments before any IO (UPDATE only)
    val utc = DriverDml.utcSession(spark) // once per statement, not per SET column
    val assignments: Option[Seq[(Int, Any)]] = set.map { m =>
      m.toSeq.map { case (k, c) =>
        val i = schema.fieldIndex(k)
        val e = try org.apache.spark.sql.graft.bridge.unresolvedExpression(c)
          catch { case _: Exception => return None }
        i -> DriverDml.foldAssignment(e, schema.fields(i).dataType, utc).getOrElse(return None)
      }
    }
    val candidates = all.filter(f => FileStats.mayMatch(statsFor(f), resolved))
    if (candidates.isEmpty) return Some((base, 0L))
    val candRows = candidates.map(f => statsFor(f).values.headOption.map(_.rows).getOrElse(-1L))
    if (candRows.exists(_ < 0) || candRows.sum > driverRewriteMaxRows) return None
    val t0 = System.nanoTime()
    var matched = 0L
    val outRows = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
    val affected = scala.collection.mutable.ArrayBuffer.empty[String]
    candidates.foreach { f =>
      val rows = DriverDml.readRows(dataDir.resolve(f), schema).getOrElse(return None)
      var fileMatches = 0L
      val fileOut = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
      rows.foreach { r =>
        val hit = bound.eval(DriverDml.toInternal(r)) == true
        if (hit) fileMatches += 1
        assignments match {
          case Some(as) => // UPDATE keeps every row, transformed when hit
            if (hit) { val nr = r.clone(); as.foreach { case (i, v) => nr(i) = v }; fileOut += nr }
            else fileOut += r
          case None => if (!hit) fileOut += r // DELETE keeps non-matching rows
        }
      }
      if (fileMatches > 0) { matched += fileMatches; affected += f; outRows ++= fileOut }
    }
    if (affected.isEmpty) return Some((base, 0L))
    val replacement =
      if (outRows.isEmpty) Seq.empty
      else {
        val name = s"part-${UUID.randomUUID()}.parquet"
        val dest = dataDir.resolve(name)
        try {
          DriverDml.writeRows(dest, schema, outRows.toSeq)
          fileStats(name) = FileStats.fromFooter(dest)
        } catch {
          case _: Exception =>
            fileStats.remove(name); Files.deleteIfExists(dest)
            return None
        }
        Seq(name)
      }
    val nv = allocVersion()
    val files = all.filterNot(affected.contains) ++ replacement
    if (publishNow) commit(nv, files) else writeManifest(nv, files)
    if (graft.Engine.dmlTrace)
      System.err.println(f"[dml-trace] driver-rewrite files=${affected.size} rows=${outRows.size} ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    Some((nv, matched))
  }

  // Above this many candidate rows the driver rewrite declines: beyond
  // it the distributed rewrite's parallelism beats the in-process pass
  // (and driver memory stays bounded). A point DML against a YCSB-shaped
  // table touches a few thousand rows; cluster-sized files take the
  // planned path by construction.
  private val driverRewriteMaxRows = 50000L

  // Small-file micro-compaction, piggybacked on the driver-side insert
  // commit: a point-insert workload writes one tiny file per statement,
  // and an uncompacted tail degrades every later scan (the classic lake
  // small-file problem — table services in Iceberg/Delta exist for it;
  // the reference's maintenance loop checkpoints the same way,
  // maintenance/mod.rs:24-223). Once `compactTriggerFiles` live files
  // are each under `compactSmallRows`, they merge into ONE file inside
  // the same manifest commit — ~15 ms driver-side every 16 inserts
  // instead of an unbounded scan-latency slide. Old manifests still
  // reference the originals (time travel intact; vacuum reclaims).
  private val compactTriggerFiles = 16
  private val compactSmallRows = 5000L

  // Returns the (possibly compacted) manifest plus the name of the
  // freshly written merge file, if any — the caller owns its cleanup
  // when the commit that would have referenced it fails (ADVICE r16:
  // the insert catch otherwise leaked the file + its fileStats entry).
  private def compactSmallDriverSide(files: Seq[String]): (Seq[String], Option[String]) = {
    if (!DriverDml.supported(schema)) return (files, None)
    val withRows = files.map(f => f -> statsFor(f).values.headOption.map(_.rows).getOrElse(-1L))
    val small = withRows.filter { case (_, r) => r >= 0 && r <= compactSmallRows }
    if (small.size < compactTriggerFiles) return (files, None)
    if (small.map(_._2).sum > driverRewriteMaxRows) return (files, None)
    val t0 = System.nanoTime()
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
    small.foreach { case (f, _) =>
      DriverDml.readRows(dataDir.resolve(f), schema) match {
        case Some(rs) => rows ++= rs
        case None => return (files, None) // unreadable driver-side: keep as-is
      }
    }
    val name = s"part-${UUID.randomUUID()}.parquet"
    val dest = dataDir.resolve(name)
    try {
      DriverDml.writeRows(dest, schema, rows.toSeq)
      fileStats(name) = FileStats.fromFooter(dest)
    } catch {
      case _: Exception =>
        fileStats.remove(name); Files.deleteIfExists(dest)
        return (files, None)
    }
    if (graft.Engine.dmlTrace)
      System.err.println(f"[dml-trace] micro-compact ${small.size} files, ${rows.size} rows, ${(System.nanoTime() - t0) / 1e6}%.0f ms")
    val smallSet = small.map(_._1).toSet
    (files.filterNot(smallSet) :+ name, Some(name))
  }

  /** Primary-key enforcement over the STAGED (not yet committed) files:
    * in-batch duplicates and clashes against version `base`, in one
    * aggregate over staged ∪ bound-overlapping table files. The table
    * side is already unique, so any key with total count > 1 involving
    * a staged row is a violation; staged-count > 1 distinguishes the
    * in-batch message (checked first, like the pre-write shape did).
    */
  /** `oldOverride`: the table-side file set to clash-check against —
    * defaults to the base manifest (INSERT), while an UPDATE that
    * assigns the pk passes the manifest MINUS the rewritten files (the
    * base set would false-clash every unchanged key against its own
    * pre-image; r19 review).
    */
  private def pkCheck(base: Long, newFiles: Seq[String], pk: String,
      oldOverride: Option[Seq[String]] = None): Unit = {
    if (newFiles.isEmpty) return
    loadStats(base)
    val newBounds = newFiles.map(f => statsFor(f).get(pk))
    // bounds usable only when every staged file has them and none holds
    // a NULL pk (min/max ignore nulls, so a null clash would slip the
    // overlap test — degenerate data falls back to the full check)
    val boundsKnown = newBounds.forall(_.exists(s =>
      s.min.isDefined && s.max.isDefined && s.nulls == 0))
    val old = oldOverride.getOrElse(readManifest(base))
    val oldCandidates =
      if (!boundsKnown) old
      else old.filter { f =>
        statsFor(f).get(pk) match {
          case Some(s) if s.min.isDefined && s.max.isDefined =>
            newBounds.flatten.exists(nb =>
              FileStats.compare(s.kind, nb.min.get, s.max.get) <= 0 &&
                FileStats.compare(s.kind, nb.max.get, s.min.get) >= 0)
          case _ => true // stat-less table file: must be checked
        }
      }
    // append-only common case (no bound overlap): only in-batch dups are
    // possible, and a SMALL staged batch checks driver-side off the
    // files just written — one bounded column read instead of a planned
    // Spark job (~130 ms of a ~280 ms insert measured). Bigger batches
    // and overlap cases take the distributed aggregate below.
    if (oldCandidates.isEmpty && boundsKnown) {
      val stagedRows = newFiles.map(f =>
        statsFor(f).values.headOption.map(_.rows).getOrElse(Long.MaxValue)).sum
      if (stagedRows <= 100000 && pkCheckDriverSide(newFiles, pk)) return
    }
    val newDf = dmlSession.read.schema(schema)
      .parquet(newFiles.map(f => dataDir.resolve(f).toString): _*)
      .select(col(pk), lit(1L).as("__new"))
    val unioned =
      if (oldCandidates.isEmpty) newDf
      else newDf.unionAll(dmlSession.read.schema(schema)
        .parquet(oldCandidates.map(f => dataDir.resolve(f).toString): _*)
        .select(col(pk), lit(0L).as("__new")))
    // NULL keys: SQL joins never match NULLs, and the pre-aggregate
    // clash check (left_semi) inherited that — a staged NULL pk beside
    // an existing NULL row is NOT a clash; only two STAGED nulls are an
    // in-batch duplicate (groupBy groups nulls, so filter explicitly)
    val bad = unioned.groupBy(col(pk))
      .agg(count(lit(1)).as("__c"), sum(col("__new")).as("__n"))
      .filter(col("__c") > 1 && col("__n") >= 1 && (col(pk).isNotNull || col("__n") > 1))
      .limit(1)
      .select(col(pk).cast("string"), (col("__n") > 1).as("__inBatch"))
      .collect().headOption
    bad.foreach { r =>
      if (r.getBoolean(1))
        throw new DuplicateKeyException(s"duplicate key in batch: $pk=${r.getString(0)}")
      else
        throw new DuplicateKeyException(s"duplicate key violates primary key: $pk=${r.getString(0)}")
    }
  }

  /** Manifest-stats candidate pruning: the files of version `base` whose
    * column bounds ADMIT a row matching `cond` (VERDICT r14 #4 — the
    * DuckLake-catalog behavior: a point predicate at 100 TB must not pay
    * a footer-and-scan pass over every live file). Conservative by
    * construction: a file is dropped only when its bounds PROVE no match.
    */
  private[sources] def candidateFiles(base: Long, cond: Column): Seq[String] = {
    val files = readManifest(base)
    if (files.isEmpty) return files
    loadStats(base)
    resolveCondFast(cond) match {
      case Some(c) => files.filter(f => FileStats.mayMatch(statsFor(f), c))
      case None => files
    }
  }

  /** MICRO-RESOLVER for the common DML predicate shapes (conjunctions /
    * disjunctions of comparisons between a column and a literal, null
    * tests): binds attributes straight off the table schema and applies
    * the one coercion the analyzer would (up-cast the LITERAL to the
    * column type), in microseconds instead of the analyzer's ~20-30 ms —
    * which a prepared DML workload pays per execution because the router
    * re-parses the WHERE text each time. Anything else answers None and
    * takes the full empty-frame analysis; the output is checked
    * `.resolved`, so a shape this resolver mishandles falls back rather
    * than mis-evaluates.
    */
  private def quickResolve(
      raw: org.apache.spark.sql.catalyst.expressions.Expression):
      Option[org.apache.spark.sql.catalyst.expressions.Expression] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions._
    def attr(n: String): Option[AttributeReference] =
      schema.fields.find(_.name.equalsIgnoreCase(n))
        .map(f => AttributeReference(f.name, f.dataType, f.nullable)())
    // literal up-cast ONLY between numeric types: canUpCast alone also
    // admits AtomicType -> String, which would turn `stringCol = 42`
    // into STRING equality while Spark's analyzer coerces it to a
    // numeric comparison — silent wrong answers. Anything non-numeric
    // or narrowing falls back to the real analyzer.
    def upcastable(from: org.apache.spark.sql.types.DataType,
        to: org.apache.spark.sql.types.DataType): Boolean =
      from.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
        to.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
        Cast.canUpCast(from, to)
    def coerce(l: Expression, r: Expression): Option[(Expression, Expression)] =
      if (l.dataType == r.dataType) Some((l, r))
      else (l, r) match {
        case (a: AttributeReference, lit: Literal) if upcastable(lit.dataType, a.dataType) =>
          Some((a, Literal(Cast(lit, a.dataType).eval(null), a.dataType)))
        case (lit: Literal, a: AttributeReference) if upcastable(lit.dataType, a.dataType) =>
          Some((Literal(Cast(lit, a.dataType).eval(null), a.dataType), a))
        case _ => None
      }
    def lift(x: Expression): Option[Expression] = x match {
      case u: UnresolvedAttribute if u.nameParts.size == 1 => attr(u.nameParts.head)
      case l: Literal => Some(l)
      case And(a, b) => for { p <- lift(a); q <- lift(b) } yield And(p, q)
      case Or(a, b) => for { p <- lift(a); q <- lift(b) } yield Or(p, q)
      case Not(c) => lift(c).map(Not(_))
      case IsNull(c) => lift(c).map(IsNull(_))
      case IsNotNull(c) => lift(c).map(IsNotNull(_))
      case b: BinaryComparison =>
        for {
          p <- lift(b.left); q <- lift(b.right)
          pq <- coerce(p, q)
        } yield b.withNewChildren(Seq(pq._1, pq._2))
      // IN-lists of literals against one column — the batch point-delete
      // shape: each element coerces to the column type exactly like a
      // binary comparison's literal side
      case In(v, list) =>
        lift(v) match {
          case Some(a: AttributeReference) =>
            val lits = list.map { e =>
              lift(e) match {
                case Some(l: Literal) => coerce(a, l).map(_._2)
                case _ => None
              }
            }
            if (lits.exists(_.isEmpty)) None else Some(In(a, lits.map(_.get)))
          case _ => None
        }
      case _ => None
    }
    lift(raw).filter(_.resolved)
  }

  private def resolveCondFast(cond: Column):
      Option[org.apache.spark.sql.catalyst.expressions.Expression] =
    (try quickResolve(org.apache.spark.sql.graft.bridge.unresolvedExpression(cond))
     catch { case _: Exception => None })
      .orElse(resolveCond(cond))

  /** Resolve a predicate Column to a catalyst tree by ANALYZING a
    * filter over a schema-only empty relation (no job, no file listing
    * — the real snapshot read would pay a directory listing just to
    * resolve names): Spark 4 columns are lazy ColumnNode wrappers until
    * analysis, and resolution also validates the predicate against the
    * schema. None when analysis fails (exotic predicates — subqueries
    * over session-private views, etc): pruning and the discovery fast
    * path are OPTIMIZATIONS, so failure here must fall back to the
    * planned path, never fail the statement early.
    */
  private def resolveCond(cond: Column):
      Option[org.apache.spark.sql.catalyst.expressions.Expression] =
    try {
      spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
        .filter(cond).queryExecution.analyzed.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
        }
    } catch { case _: Exception => None }

  /** Analysis-free candidate pruning for the prepared point-read fast
    * path: files of `version` whose bounds admit `col = lit`. Pure
    * driver-side stats math — no Spark plan is built, so it is cheap
    * enough to run per prepared execution.
    */
  def candidateFilesFor(version: Long, colName: String,
      lit: org.apache.spark.sql.catalyst.expressions.Literal): Seq[String] =
    candidateFilesExpr(version, org.apache.spark.sql.catalyst.expressions.EqualTo(
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(colName), lit))

  /** Analysis-free pruning against an already-built catalyst tree (the
    * prepared fast paths construct Eq/range predicates directly).
    */
  def candidateFilesExpr(version: Long,
      cond: org.apache.spark.sql.catalyst.expressions.Expression): Seq[String] = {
    val files = readManifest(version)
    if (files.isEmpty) return files
    loadStats(version)
    files.filter(f => FileStats.mayMatch(statsFor(f), cond))
  }

  /** Absolute path of a live data file (for direct candidate reads). */
  def dataFilePath(name: String): String = dataDir.resolve(name).toString

  /** Files (by name) containing at least one row matching `cond` in
    * version `base`, PLUS the total match count — one scan answers both
    * (the match count rides the same per-file aggregate), so a DML
    * statement pays a single discovery job instead of a
    * find-files-then-recount pair. The scan covers only the
    * stats-pruned CANDIDATE set, and for resolvable predicates it runs
    * PLAN-FREE over a cached candidate scan ([[fastAffected]]) — the
    * per-statement analyzer/optimizer/codegen pipeline was most of a
    * point DML's discovery latency. The fully-planned aggregate remains
    * the fallback for anything unusual.
    */
  private def affectedStats(base: Long, cond: Column): (Seq[String], Long) = {
    val files = readManifest(base)
    if (files.isEmpty) return (Seq.empty, 0L)
    loadStats(base)
    // resolve ONCE; pruning and the plan-free discovery share the tree
    val resolved = resolveCondFast(cond)
    val candidates = resolved match {
      case Some(c) => files.filter(f => FileStats.mayMatch(statsFor(f), c))
      case None => files
    }
    if (candidates.isEmpty) return (Seq.empty, 0L)
    resolved.flatMap(c => fastAffected(candidates, c)).getOrElse {
      val perFile = dmlSession.read.schema(schema).parquet(candidates.map(f => dataDir.resolve(f).toString): _*)
        .filter(cond)
        .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
        .collect()
      val hit = perFile.map(_.getString(0)).toSet
      val matches = perFile.map(_.getLong(1)).sum
      (candidates.filter(f => hit.exists(h => h.endsWith("/" + f) || h.endsWith(f))), matches)
    }
  }

  // Discovery scans cached PER (file, referenced columns) — the finest
  // valid granularity: files are immutable, so a per-file scan stays
  // valid forever, and a DML that rewrote ONE file only forces planning
  // for that file's replacement — every other candidate in every later
  // statement is already compiled (a candidate-SET key missed whenever
  // the set changed, even when the targeted file had not). Entries are
  // plans, not data.
  private val discoveryScans =
    new graft.LruCache[(String, Seq[String]), org.apache.spark.sql.graft.PointReadExec.CachedScan](64)

  /** Plan-free DML discovery: bind the resolved predicate to the UNION
    * of the candidates' cached per-file scans and run ONE per-file
    * counting job — no analyzer, no optimizer, no codegen per statement
    * once a file's scan is compiled. None for predicates the fast path
    * must not touch (unresolvable, non-deterministic, subqueries),
    * which keep the fully-planned fallback.
    */
  private def fastAffected(candidates: Seq[String],
      resolved: org.apache.spark.sql.catalyst.expressions.Expression): Option[(Seq[String], Long)] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, PlanExpression}
    if (!resolved.deterministic) return None
    if (resolved.exists(_.isInstanceOf[PlanExpression[_]])) return None
    // attributes are Unevaluable until bound below — exclude only OTHER
    // unevaluable nodes (window specs, unresolved leftovers)
    if (resolved.exists(e =>
        e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Unevaluable] &&
        !e.isInstanceOf[AttributeReference]))
      return None
    val refNames = resolved.collect { case a: AttributeReference => a.name }.distinct.sorted
    val tScan0 = System.nanoTime()
    var misses = 0
    val scans = candidates.map { f =>
      discoveryScans.getOrElseUpdate((f, refNames)) {
        misses += 1
        val df = dmlSession.read.schema(schema).parquet(dataDir.resolve(f).toString)
          .select(refNames.map(col) :+ input_file_name().as("__file"): _*)
        org.apache.spark.sql.graft.PointReadExec.prepareScan(df)
      }
    }
    if (graft.Engine.dmlTrace)
      System.err.println(f"[dml-trace] fastAffected scans=${candidates.size} misses=$misses build=${(System.nanoTime() - tScan0) / 1e6}%.0f ms")
    // per-file scans of one schema share the output SHAPE (names, types,
    // ordinals); binding is ordinal-based, so the union is sound
    val output = scans.head.output
    val bound = resolved.transform {
      case a: AttributeReference =>
        val i = output.indexWhere(_.name.equalsIgnoreCase(a.name))
        if (i < 0) return None // scan shape drifted: fall back
        BoundReference(i, a.dataType, a.nullable)
    }
    val unioned = org.apache.spark.sql.graft.PointReadExec.CachedScan(
      spark.sparkContext.union(scans.map(_.rdd)), output)
    val counts = org.apache.spark.sql.graft.PointReadExec.matchCountsByFile(
      spark, unioned, bound, output.length - 1)
    val affected = candidates.filter(f =>
      counts.keysIterator.exists(h => h.endsWith("/" + f) || h.endsWith(f)))
    Some((affected, counts.valuesIterator.sum))
  }

  /** Summed on-disk bytes of live data files (one fstat each) — the
    * rewrite paths' file-sizing input.
    */
  private def bytesOf(files: Seq[String]): Long =
    files.map { f =>
      try java.nio.file.Files.size(dataDir.resolve(f)) catch { case _: Exception => 0L }
    }.sum

  /** Driver-side in-batch duplicate check over SMALL staged files
    * (bounded by the caller; the distributed aggregate remains the path
    * beyond the bound or when table overlap exists): reads only the pk
    * column via parquet-mr and errors on the first repeat — the same
    * verdict the Spark aggregate produces, one in-process read instead
    * of a planned job. Returns false when the file cannot be read this
    * way (the caller falls back; never weakens the check).
    */
  private def pkCheckDriverSide(newFiles: Seq[String], pk: String): Boolean = {
    import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
    import org.apache.parquet.hadoop.example.GroupReadSupport
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val seen = new java.util.HashSet[Any]()
    var nullSeen = false
    try {
      // project the read to the pk column (taken off the first file's
      // own footer schema, so physical types match exactly): without
      // the requested-schema conf the example reader decodes EVERY
      // column of the staged rows
      val conf = new org.apache.hadoop.conf.Configuration()
      val firstPath = new org.apache.hadoop.fs.Path(dataDir.resolve(newFiles.head).toUri)
      val fileSchema = {
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(firstPath, conf))
        try r.getFooter.getFileMetaData.getSchema finally r.close()
      }
      val projection = new org.apache.parquet.schema.MessageType(
        fileSchema.getName, fileSchema.getType(fileSchema.getFieldIndex(pk)))
      conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
      newFiles.foreach { f =>
        val reader = ParquetReader
          .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(dataDir.resolve(f).toUri))
          .withConf(conf)
          .build()
        try {
          var g = reader.read()
          while (g != null) {
            val idx = g.getType.getFieldIndex(pk)
            val v: Any =
              if (g.getFieldRepetitionCount(idx) == 0) null
              else g.getType.getType(idx).asPrimitiveType().getPrimitiveTypeName match {
                case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64 => g.getLong(idx, 0)
                case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32 => g.getInteger(idx, 0)
                case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.BINARY => g.getBinary(idx, 0).toStringUsingUTF8
                // +0.0 collapses -0.0 so boxed-HashSet equality matches Spark's
                // grouping-key semantics (NormalizeFloatingNumbers) on the planned path
                case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.DOUBLE => g.getDouble(idx, 0) + 0.0d
                case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.FLOAT => g.getFloat(idx, 0) + 0.0f
                case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.BOOLEAN => g.getBoolean(idx, 0)
                case _ => return false // unsupported pk physical type: planned path
              }
            if (v == null) {
              if (nullSeen) throw new DuplicateKeyException(s"duplicate key in batch: $pk=null")
              nullSeen = true
            } else if (!seen.add(v))
              throw new DuplicateKeyException(s"duplicate key in batch: $pk=$v")
            g = reader.read()
          }
        } finally reader.close()
      }
      true
    } catch {
      case e: DuplicateKeyException => throw e
      case _: Exception => false // unreadable via the example API: planned path decides
    }
  }

  /** Copy-on-write DELETE: rewrite only files containing matches; returns
    * the number of rows deleted.
    */
  def delete(cond: Column): Long = writeLock.synchronized {
    deleteCore(currentVersion, cond, publishNow = true)._2
  }

  /** Transactional variant of [[delete]]: staged, unpublished. */
  def stageDelete(base: Long, cond: Column): (Long, Long) = writeLock.synchronized {
    deleteCore(base, cond, publishNow = false)
  }

  private def deleteCore(base: Long, cond: Column, publishNow: Boolean): (Long, Long) = {
    driverRewrite(base, cond, None, publishNow).foreach(return _)
    val all = readManifest(base)
    val (affected, deleted) = affectedStats(base, cond)
    if (affected.isEmpty) return (base, 0L)
    val affectedDf = dmlSession.read.schema(schema)
      .parquet(affected.map(f => dataDir.resolve(f).toString): _*)
    // survivors are rows where cond is FALSE **or NULL** — filter(!cond)
    // alone drops NULL-predicate rows from the rewritten file (data loss;
    // SQL three-valued logic: DELETE removes only WHERE-true rows)
    val survivors = affectedDf.filter(!coalesce(cond, lit(false)))
    // survivor count from manifest stats: affected-file rows minus the
    // deleted count — saves the isEmpty probe job (and the whole rewrite
    // when a file is deleted outright); unknown rows fall back to probing
    val affectedRows = affected.map(f => statsFor(f).values.headOption.map(_.rows).getOrElse(-1L))
    val anySurvivors =
      if (affectedRows.forall(_ >= 0)) affectedRows.sum - deleted > 0
      else !survivors.isEmpty
    val replacement =
      if (!anySurvivors) Seq.empty
      else stageWrite(survivors, knownBytes = Some(bytesOf(affected)))
    val nv = allocVersion()
    val files = all.filterNot(affected.contains) ++ replacement
    commitOrClean(nv, files, publishNow)
    (nv, deleted)
  }

  /** Copy-on-write DELETE by key set: rows whose `keyCol` appears in
    * `keys` are removed via a distributed anti-join — nothing about the
    * key set ever reaches the driver (the isin-predicate form collects
    * keys and caps out at driver memory; this is the upsert path's
    * at-scale shape). Only files containing a matching key are
    * rewritten; the only collect is over FILE NAMES, bounded by the
    * manifest size.
    */
  def deleteKeys(keys: DataFrame, keyCol: String): Long = writeLock.synchronized {
    require(schema.fieldNames.contains(keyCol), s"unknown column: $keyCol")
    val v = currentVersion
    loadStats(v) // keep carried-over stats in the manifest we are about to write
    val (files, deleted, changed, staged) = deleteKeysCore(v, keys, keyCol)
    try { if (changed) commit(allocVersion(), files) }
    catch { case e: Throwable => dropStaged(staged); throw e }
    deleted
  }

  /** Atomic UPSERT by primary key: the batch's keys are deleted and its
    * rows inserted in ONE version commit — a reader never observes the
    * keys-absent intermediate state a delete-then-insert pair publishes,
    * and a crash anywhere before the commit leaves the previous version
    * intact (the streaming-sink shape). The key must be the table's
    * primary key (or the table unkeyed): the delete removes every
    * matching table row, so PK uniqueness after the combined commit
    * follows from the batch's own per-key uniqueness — enforced here
    * with one small aggregate. NULL keys are rejected (they can never
    * match a table row, so "upsert by NULL" has no meaning). Returns
    * (deletedRows, insertedRows).
    */
  def upsertKeys(rows: DataFrame, keyCol: String): (Long, Long) = writeLock.synchronized {
    require(schema.fieldNames.contains(keyCol), s"unknown column: $keyCol")
    require(primaryKey.forall(_ == keyCol),
      s"upsertKeys requires the key to be the table's primary key (pk=$primaryKey, key=$keyCol)")
    val base = currentVersion
    loadStats(base)
    val batch = rows.select(schema.fieldNames.toSeq.map(col): _*)
    if (!batch.filter(col(keyCol).isNull).isEmpty)
      throw new IllegalArgumentException(s"NULL key in upsert batch: $keyCol")
    if (!batch.groupBy(col(keyCol)).agg(count(lit(1)).as("n")).filter(col("n") > 1).isEmpty)
      throw new DuplicateKeyException(s"duplicate key in upsert batch: $keyCol")
    val (survivors, deleted, _, replStaged) = deleteKeysCore(base, batch, keyCol)
    // from here, BOTH staged sets (the delete's survivor replacements and
    // the fresh insert files) must die together on any failure: the old
    // cleanup deleted only newFiles, orphaning replStaged on disk with
    // stale fileStats entries whenever stageWrite or commit threw
    val newFiles = try stageWrite(batch)
      catch { case e: Throwable => dropStaged(replStaged); throw e }
    try {
      val inserted = newFiles.map(f =>
        statsFor(f).values.headOption.map(_.rows).getOrElse(-1L)) match {
        case rs if rs.nonEmpty && rs.forall(_ >= 0) => rs.sum
        case _ if newFiles.isEmpty => 0L
        case _ => dmlSession.read.schema(schema)
          .parquet(newFiles.map(f => dataDir.resolve(f).toString): _*).count()
      }
      commit(allocVersion(), survivors ++ newFiles)
      (deleted, inserted)
    } catch {
      case e: Throwable =>
        dropStaged(replStaged ++ newFiles)
        throw e
    }
  }

  /** Remove staged-but-never-committed files and their stats entries —
    * failure cleanup shared by the staged-write paths. Never throws (a
    * cleanup failure must not mask the original error).
    */
  private def dropStaged(files: Seq[String]): Unit =
    files.foreach { f =>
      fileStats.remove(f)
      try Files.deleteIfExists(dataDir.resolve(f))
      catch { case _: Throwable => }
    }

  /** Core of [[deleteKeys]]: computes the post-delete file list WITHOUT
    * committing, so [[upsertKeys]] can fold the delete and its insert
    * into one atomic version. Returns (files, deletedRows, changed,
    * stagedReplacements) — the caller owns cleanup of the staged
    * survivor-replacement files if its commit never happens.
    */
  private def deleteKeysCore(base: Long, keys: DataFrame,
      keyCol: String): (Seq[String], Long, Boolean, Seq[String]) = {
    val all = readManifest(base)
    if (all.isEmpty) return (all, 0L, false, Nil)
    val keySet = keys.select(col(keyCol)).distinct()
    // STATS PRUNING on the key batch's own bounds (the insert clash
    // check's trick, upsert-side): one tiny min/max job over the key
    // frame turns "scan every live file per batch" into "scan the
    // bound-overlapping files" — at 100 TB an upsert touches its key
    // range, not the table. NULL keys never join, so bounds ignoring
    // them is exact; an unbounded batch (all-null or empty bounds)
    // keeps every file.
    val kb = keySet.agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi")).head()
    val candidates =
      if (kb.isNullAt(0) || kb.isNullAt(1)) all
      else {
        import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        import org.apache.spark.sql.catalyst.expressions.{And, GreaterThanOrEqual, LessThanOrEqual, Literal}
        val dt = schema(schema.fieldIndex(keyCol)).dataType
        try {
          val attr = UnresolvedAttribute(keyCol)
          val overlap = And(
            GreaterThanOrEqual(attr, Literal.create(kb.get(0), dt)),
            LessThanOrEqual(attr, Literal.create(kb.get(1), dt)))
          all.filter(f => FileStats.mayMatch(statsFor(f), overlap))
        } catch { case _: Exception => all } // pruning never fails the statement
      }
    if (candidates.isEmpty) return (all, 0L, false, Nil)
    // file name must attach AT THE SCAN (input_file_name() evaluated
    // after the join runs outside the file-read task and yields "")
    val fileDf = dmlSession.read.schema(schema).parquet(candidates.map(f => dataDir.resolve(f).toString): _*)
      .select(col(keyCol), input_file_name().as("__f"))
    // one discovery job: per-file match counts give both the affected
    // file set and the deleted-row total (keySet is distinct, so the
    // semi-join hits each matching row exactly once)
    val perFile = fileDf.join(keySet, Seq(keyCol), "left_semi")
      .groupBy(col("__f")).agg(count(lit(1)).as("n"))
      .collect()
    val hit = perFile.map(_.getString(0)).toSet
    val deleted = perFile.map(_.getLong(1)).sum
    val affected = all.filter(f => hit.exists(h => h.endsWith("/" + f) || h.endsWith(f)))
    if (affected.isEmpty) return (all, 0L, false, Nil)
    val affectedDf = dmlSession.read.schema(schema)
      .parquet(affected.map(f => dataDir.resolve(f).toString): _*)
    val survivors = affectedDf.join(keySet, Seq(keyCol), "left_anti")
      .select(schema.fieldNames.toSeq.map(col): _*)
    val replacement = if (survivors.isEmpty) Seq.empty else stageWrite(survivors)
    (all.filterNot(affected.contains) ++ replacement, deleted, true, replacement)
  }

  /** Copy-on-write UPDATE: SET col -> expression for rows matching `cond`;
    * returns the number of rows updated.
    */
  def update(cond: Column, set: Map[String, Column]): Long = writeLock.synchronized {
    updateCore(currentVersion, cond, set, publishNow = true)._2
  }

  /** Transactional variant of [[update]]: staged, unpublished. */
  def stageUpdate(base: Long, cond: Column, set: Map[String, Column]): (Long, Long) =
    writeLock.synchronized { updateCore(base, cond, set, publishNow = false) }

  private def updateCore(base: Long, cond: Column, set: Map[String, Column],
      publishNow: Boolean): (Long, Long) = {
    require(set.nonEmpty, "UPDATE requires at least one assignment")
    set.keys.foreach(k => require(schema.fieldNames.contains(k), s"unknown column: $k"))
    // a PK-ASSIGNING update must re-validate uniqueness (r19 review:
    // both rewrite paths persisted duplicate PKs — UPDATE t SET k = 5
    // WHERE k = 6 silently committed two k=5 rows); the driver rewrite
    // has no check, so those updates take the planned path below
    val touchesPk = primaryKey.exists(set.contains)
    if (!touchesPk) driverRewrite(base, cond, Some(set), publishNow).foreach(return _)
    val t0 = System.nanoTime()
    val all = readManifest(base)
    val (affected, updated) = affectedStats(base, cond)
    val t1 = System.nanoTime()
    if (affected.isEmpty) return (base, 0L)
    val affectedDf = dmlSession.read.schema(schema)
      .parquet(affected.map(f => dataDir.resolve(f).toString): _*)
    val rewritten = affectedDf.select(schema.fieldNames.toSeq.map { name =>
      set.get(name) match {
        case Some(e) => when(cond, e.cast(schema(name).dataType)).otherwise(col(name)).as(name)
        case None    => col(name)
      }
    }: _*)
    val replacement = stageWrite(rewritten, knownBytes = Some(bytesOf(affected)))
    val untouched = all.filterNot(affected.contains)
    // pk-assigning update: the rewritten files must be unique in-batch
    // AND against the untouched files (NOT the base manifest, whose
    // affected files hold every unchanged key's pre-image)
    if (touchesPk) primaryKey.foreach { pk =>
      try pkCheck(base, replacement, pk, oldOverride = Some(untouched))
      catch {
        case e: Throwable =>
          replacement.foreach { f =>
            fileStats.remove(f); Files.deleteIfExists(dataDir.resolve(f))
          }
          throw e
      }
    }
    val t2 = System.nanoTime()
    val nv = allocVersion()
    val files = untouched ++ replacement
    commitOrClean(nv, files, publishNow)
    if (graft.Engine.dmlTrace)
      System.err.println(f"[dml-trace] update discovery=${(t1 - t0) / 1e6}%.0f rewrite=${(t2 - t1) / 1e6}%.0f commit=${(System.nanoTime() - t2) / 1e6}%.0f ms")
    (nv, updated)
  }

  /** CHECKPOINT ≈ compaction (A26): coalesce the live file set into
    * `targetFiles` files; data unchanged, old versions still readable.
    */
  def checkpoint(targetFiles: Int = 1): Long = writeLock.synchronized {
    val v = currentVersion
    val files = readManifest(v)
    if (files.size <= targetFiles) return v
    val compacted = stageWrite(df, exactFiles = Some(targetFiles))
    commit(allocVersion(), compacted)
    currentVersion
  }

  def fileCount: Int = readManifest(currentVersion).size

  private[sources] def hasManifest(v: Long): Boolean = Files.exists(manifestPath(v))

  /** Run `f` holding this table's writer monitor — the catalog's
    * multi-table commit acquires every staged table's lock (in sorted
    * name order) so its validate-then-swap cannot race an autocommit
    * writer, whose own read-stage-publish holds the same monitor.
    * Reentrant: publish() inside f re-enters fine.
    */
  private[sources] def withWriteLock[T](f: => T): T = writeLock.synchronized(f)

  /** Delete a STAGED (never-published) manifest so the data files it
    * references stop counting as live for [[vacuum]] — the rollback
    * cleanup path. Refuses to touch the published version; deleting an
    * already-absent manifest is the tolerated no-op (commit retires
    * intermediates that rollback may also see).
    */
  private[sources] def discardStaged(v: Long): Unit = writeLock.synchronized {
    // silently skip the published version: cleanup must never throw
    // (e.g. a drop+recreate raced the rollback into a version collision)
    if (v != currentVersion) Files.deleteIfExists(manifestPath(v))
  }

  /** Drop data files no longer referenced by ANY retained manifest
    * (vacuum; the reference's checkpoint cleanup).
    */
  def vacuum(): Int = writeLock.synchronized {
    val live = mutable.Set.empty[String]
    listDir(root)
      .filter(_.getFileName.toString.startsWith("manifest-"))
      .foreach { m =>
        val v = m.getFileName.toString.stripPrefix("manifest-").stripSuffix(".json").toLong
        live ++= readManifest(v)
      }
    var removed = 0
    listDir(dataDir).foreach { p =>
      if (!live.contains(p.getFileName.toString)) { Files.delete(p); removed += 1 }
    }
    removed
  }

  // LAST in the class body: registering earlier would publish a
  // partially-constructed instance to the process-global registry — a
  // concurrent optimizer pass could then touch not-yet-initialized
  // fields (review finding, round 15). NOTE create() registers before
  // `_version` exists on disk; StatsPruneRule guards with a catch-all
  // for exactly that window.
  StatsRegistry.register(this)
}

object MutableTable {

  /** Files.list with the stream CLOSED: the returned java Stream holds
    * an open DirectoryStream until close(), so iterating it bare leaks
    * one fd per call until finalization.
    */
  private[sources] def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val st = java.nio.file.Files.list(p)
    try st.iterator().asScala.toSeq finally st.close()
  }

  /** Create an empty table at `path` (errors if one exists). */
  def create(spark: SparkSession, path: String, schema: StructType,
      primaryKey: Option[String] = None): MutableTable = {
    val root = Paths.get(path)
    require(!Files.exists(root.resolve("_version")), s"table already exists at $path")
    Files.createDirectories(root.resolve("data"))
    Files.write(root.resolve("schema.json"), schema.json.getBytes)
    primaryKey.foreach(pk => Files.write(root.resolve("pk"), pk.getBytes))
    val t = new MutableTable(spark, root, schema, primaryKey)
    t.writeManifest(0, Seq.empty)
    Files.write(root.resolve("_version"), "0".getBytes)
    t
  }

  /** Open an existing table. */
  def load(spark: SparkSession, path: String): MutableTable = {
    val root = Paths.get(path)
    val schema = DataType.fromJson(new String(Files.readAllBytes(root.resolve("schema.json"))))
      .asInstanceOf[StructType]
    val pk = if (Files.exists(root.resolve("pk")))
      Some(new String(Files.readAllBytes(root.resolve("pk")))) else None
    new MutableTable(spark, root, schema, pk)
  }
}
