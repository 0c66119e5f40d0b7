package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MutableTableSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def mkTable(pk: Option[String] = Some("id")) = {
    val dir = Files.createTempDirectory("graft_mt").resolve("t").toString
    MutableTable.create(spark, dir, schema, pk)
  }

  private def rows(data: (Long, String, Double)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(d => Row(d._1, d._2, d._3)), 1), schema)

  test("insert appends and bumps the version") {
    val t = mkTable()
    assert(t.currentVersion == 0 && t.df.count() == 0)
    assert(t.insert(rows((1L, "a", 1.0), (2L, "b", 2.0))) == 2)
    assert(t.currentVersion == 1)
    assert(t.df.count() == 2)
    t.insert(rows((3L, "c", 3.0)))
    assert(t.df.count() == 3)
  }

  test("duplicate primary key errors, nothing committed (error_status.test)") {
    val t = mkTable()
    t.insert(rows((1L, "a", 1.0)))
    val v = t.currentVersion
    intercept[RuntimeException](t.insert(rows((1L, "dup", 9.9))))
    intercept[RuntimeException](t.insert(rows((5L, "x", 1.0), (5L, "y", 2.0))))
    assert(t.currentVersion == v)
    assert(t.df.count() == 1)
  }

  test("no primary key -> duplicates allowed") {
    val t = mkTable(pk = None)
    t.insert(rows((1L, "a", 1.0)))
    t.insert(rows((1L, "a", 1.0)))
    assert(t.df.count() == 2)
  }

  test("delete is file-level copy-on-write: untouched files carry over") {
    val t = mkTable()
    t.insert(rows((1L, "a", 1.0), (2L, "b", 2.0)))  // file A
    t.insert(rows((3L, "c", 3.0), (4L, "d", 4.0)))  // file B
    assert(t.fileCount == 2)
    assert(t.delete(col("id") === 3L) == 1)
    assert(t.df.count() == 3)
    assert(t.df.filter(col("id") === 3L).count() == 0)
    // file A (ids 1,2) must not have been rewritten: still 2 files, one of
    // which is the original
    assert(t.fileCount == 2)
  }

  test("deleteKeys removes matching keys via anti-join and leaves untouched files alone") {
    val t = mkTable()
    t.insert(rows((1L, "a", 1.0), (2L, "b", 2.0)))  // file A
    t.insert(rows((3L, "c", 3.0), (4L, "d", 4.0)))  // file B
    val keys = rows((3L, "x", 0.0), (9L, "y", 0.0)).select(col("id"))
    assert(t.deleteKeys(keys, "id") == 1)
    assert(t.df.orderBy(col("id")).collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    assert(t.fileCount == 2, "file A (no matching keys) must not be rewritten")
  }

  test("delete keeps rows whose predicate is NULL (data-loss regression, ADVICE r2 high)") {
    val t = mkTable()
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, "a", 1.0), Row(2L, null, 2.0), Row(3L, "b", 3.0)), 1), schema)
    t.insert(withNull)
    // cond is NULL for id=2 (name IS NULL): three-valued logic — DELETE
    // removes only WHERE-true rows, so id=2 must survive the rewrite
    assert(t.delete(col("name") === "a") == 1)
    assert(t.df.orderBy(col("id")).collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("delete removing a whole file shrinks the manifest") {
    val t = mkTable()
    t.insert(rows((1L, "a", 1.0)))
    t.insert(rows((2L, "b", 2.0)))
    t.delete(col("id") === 1L)
    assert(t.fileCount == 1)
    assert(t.df.collect().toSeq == Seq(Row(2L, "b", 2.0)))
  }

  test("update rewrites matching rows only (copy-on-write)") {
    val t = mkTable()
    t.insert(rows((1L, "a", 1.0), (2L, "b", 2.0)))
    val n = t.update(col("id") === 2L, Map("score" -> lit(20.0), "name" -> lit("B")))
    assert(n == 1)
    val got = t.df.orderBy("id").collect().toSeq
    assert(got == Seq(Row(1L, "a", 1.0), Row(2L, "B", 20.0)))
  }

  test("update with predicate matching nothing is a no-op version-wise") {
    val t = mkTable()
    t.insert(rows((1L, "a", 1.0)))
    val v = t.currentVersion
    assert(t.update(col("id") === 99L, Map("score" -> lit(0.0))) == 0)
    assert(t.currentVersion == v)
  }

  test("UPDATE assigning the primary key re-validates uniqueness (r19 review)") {
    val t = mkTable()
    t.insert(rows((5L, "a", 1.0), (6L, "b", 2.0)))
    val v = t.currentVersion
    // both the driver-rewrite-eligible literal form and the planned form
    // must refuse to mint a duplicate PK
    intercept[RuntimeException](t.update(col("id") === 6L, Map("id" -> lit(5L))))
    assert(t.currentVersion == v, "nothing committed after the refused update")
    assert(t.df.filter(col("id") === 5L).count() == 1)
    // a pk-assigning update to a FREE key value succeeds
    assert(t.update(col("id") === 6L, Map("id" -> lit(7L))) == 1L)
    assert(t.df.filter(col("id") === 7L).count() == 1)
    assert(t.df.count() == 2)
    // an in-batch clash: two rows rewritten onto the same new key
    t.insert(rows((8L, "c", 3.0)))
    intercept[RuntimeException](t.update(col("id").isin(5L, 7L), Map("id" -> lit(9L))))
    assert(t.df.count() == 3)
  }

  test("catalog UPDATE/INSERT parsing survives literals with WHERE/commas/escapes and backticks (r19 review)") {
    val cat = MutableCatalog(spark)
    cat.create("parse_t", StructType(Seq(
      StructField("k", LongType), StructField("s", StringType), StructField("n", LongType))))
    // backticked explicit column list with an expression forces the
    // PLANNED insert path: values must land, not an all-NULL row
    assert(cat.route("INSERT INTO parse_t (`k`, `s`, `n`) VALUES (1, upper('x'), 1 + 1)")
      .contains(1L))
    val r0 = spark.table("parse_t").collect()
    assert(r0.length == 1 && r0(0).getLong(0) == 1L && r0(0).getString(1) == "X"
      && r0(0).getLong(2) == 2L, s"backticked planned insert corrupted: ${r0.toSeq}")
    // a string literal containing ' where ' must not split the SET tail
    assert(cat.route("UPDATE parse_t SET s = 'a where b' WHERE k = 1").contains(1L))
    assert(spark.table("parse_t").collect()(0).getString(1) == "a where b")
    // commas and doubled-quote escapes inside literals must not split
    // assignments
    assert(cat.route("UPDATE parse_t SET s = 'it''s, fine', n = 9 WHERE k = 1").contains(1L))
    val r1 = spark.table("parse_t").collect()(0)
    assert(r1.getString(1) == "it's, fine" && r1.getLong(2) == 9L, s"$r1")
    // WHERE immediately followed by '(' is a valid boundary (r19 advice)
    assert(cat.route("UPDATE parse_t SET n = 3 WHERE(k = 1)").contains(1L))
    assert(spark.table("parse_t").collect()(0).getLong(2) == 3L)
    cat.drop("parse_t")
  }

  test("backtick-quoted identifiers containing ' where '/commas parse (r19 advice)") {
    val cat = MutableCatalog(spark)
    cat.create("bt_t", StructType(Seq(
      StructField("k", LongType), StructField("a where b", LongType),
      StructField("c, d", StringType))))
    assert(cat.route("INSERT INTO bt_t (`k`, `a where b`, `c, d`) VALUES (1, 2, 'x')")
      .contains(1L))
    // the SET tail's backticked identifier contains ' where ': the
    // splitter must find the REAL top-level WHERE after it
    assert(cat.route("UPDATE bt_t SET `a where b` = 5 WHERE k = 1").contains(1L))
    val r = spark.table("bt_t").collect()(0)
    assert(r.getLong(1) == 5L && r.getString(2) == "x", s"$r")
    cat.drop("bt_t")
  }

  test("drop defers directory reclaim while a live txn has staged DML (r19 advice)") {
    val cat = MutableCatalog(spark)
    val t = cat.create("defer_t", schema, primaryKey = Some("id"))
    t.insert(rows((1L, "a", 1.0)))
    val txn = cat.beginTxn()
    assert(cat.route("DELETE FROM defer_t WHERE id = 1", Some(txn)).contains(1L))
    cat.drop("defer_t")
    assert(cat.get("defer_t").isEmpty, "drop must deregister immediately")
    assert(Files.exists(t.root),
      "staged txn's files must survive the drop until the txn finishes")
    // finishing the txn is a tolerated no-op for the dropped table
    cat.rollbackTxn(txn)
    // with no staged holder, a fresh drop cycle reclaims eagerly
    val t2 = cat.create("defer_e", schema)
    cat.drop("defer_e")
    assert(!Files.exists(t2.root), "unstaged drop still reclaims the directory")
  }

  test("drop reclaims the table directory so the name is reusable (r19 review)") {
    val cat = MutableCatalog(spark)
    val t1 = cat.create("reuse_t", schema, primaryKey = Some("id"))
    t1.insert(rows((1L, "a", 1.0)))
    cat.drop("reuse_t")
    // re-creating the dropped name must work and start empty
    val t2 = cat.create("reuse_t", schema, primaryKey = Some("id"))
    assert(t2.df.count() == 0)
    t2.insert(rows((2L, "b", 2.0))) // direct table insert: no view refresh
    assert(t2.df.count() == 1)
    cat.drop("reuse_t")
    // the rollback-of-created-table path rides the same reclaim
    val txn = cat.beginTxn()
    cat.create("reuse_t", schema, txn = Some(txn))
    cat.rollbackTxn(txn)
    val t3 = cat.create("reuse_t", schema)
    assert(t3.df.count() == 0)
    cat.drop("reuse_t")
  }

  test("snapshot time travel: asOf reads historic versions") {
    val t = mkTable()
    t.insert(rows((1L, "a", 1.0)))
    val v1 = t.currentVersion
    t.insert(rows((2L, "b", 2.0)))
    t.delete(col("id") === 1L)
    assert(t.asOf(v1).collect().toSeq == Seq(Row(1L, "a", 1.0)))
    assert(t.df.collect().toSeq == Seq(Row(2L, "b", 2.0)))
  }

  test("checkpoint compacts files without changing data (A26)") {
    val t = mkTable()
    (1 to 5).foreach(i => t.insert(rows((i.toLong, s"r$i", i.toDouble))))
    assert(t.fileCount == 5)
    t.checkpoint(targetFiles = 1)
    assert(t.fileCount == 1)
    assert(t.df.count() == 5)
    assert(t.df.agg(sum("score")).head.getDouble(0) == 15.0)
  }

  test("load reopens a table with schema and pk intact") {
    val t = mkTable()
    t.insert(rows((1L, "a", 1.0)))
    val re = MutableTable.load(spark, t.root.toString)
    assert(re.schema == schema)
    assert(re.primaryKey.contains("id"))
    assert(re.df.count() == 1)
    intercept[RuntimeException](re.insert(rows((1L, "dup", 0.0))))
  }

  test("DML job accounting: a point UPDATE stays within its fused job budget") {
    // the round-14 YCSB latency work fused affected-file discovery with
    // the match count into ONE per-file aggregate scan, leaving
    // discovery(+count) + write per UPDATE/DELETE; under AQE the
    // discovery aggregate's shuffle stage materializes as its own job,
    // so the ceiling is 3 — the pre-fusion path (separate find-files
    // collect, then a recount) cost one more aggregate action. INSERT's
    // tagged-union pre-check is pinned by behavior specs instead: its
    // AQE stage-job count varies with exchange reuse across runs.
    val t = mkTable()
    t.insert(rows((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    val counter = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      counter.set(0)
      assert(t.update(col("id") === 2L, Map("name" -> lit("B"))) == 1L)
      Thread.sleep(300) // listener bus is async
      val updateJobs = counter.get()
      assert(updateJobs <= 3, s"point UPDATE must run <=3 jobs (discovery+count, write), ran $updateJobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("vacuum removes files unreferenced by any manifest") {
    val t = mkTable()
    t.insert(rows((1L, "a", 1.0)))
    t.update(col("id") === 1L, Map("score" -> lit(2.0)))
    // the pre-update file is still referenced by manifest v1 -> not removable
    assert(t.vacuum() == 0)
  }

  test("restore rolls forward to a past version's contents, history intact") {
    val t = mkTable()
    t.insert(rows((1L, "a", 1.0)))           // v1
    t.insert(rows((2L, "b", 2.0)))           // v2
    t.delete(col("id") === 1L)               // v3
    val nv = t.restore(1)                    // v4 == v1 contents
    assert(nv == 4 && t.currentVersion == 4)
    assert(t.df.collect().map(_.getLong(0)).toSet == Set(1L))
    // the rolled-back interval still time-travels
    assert(t.asOf(3).collect().map(_.getLong(0)).toSet == Set(2L))
    assert(t.restore(4) == 4, "restore to the current version is a no-op")
    intercept[IllegalArgumentException](t.restore(99))
  }

  test("catalog transaction: staged writes are invisible until commit, gone after rollback (SURVEY 7.4)") {
    val cat = MutableCatalog(spark)
    val a = cat.create("txn_a", schema, Some("id"))
    // seed through the catalog so the root-session view tracks it
    cat.route("INSERT INTO txn_a VALUES (1, 'a', 1.0)")
    val txn = cat.beginTxn()
    assert(cat.route("INSERT INTO txn_a VALUES (2, 'b', 2.0)", Some(txn)).contains(1L))
    assert(cat.route("DELETE FROM txn_a WHERE id = 1", Some(txn)).contains(1L),
      "within-txn DML sees the txn's own earlier staged writes")
    cat.create("txn_new", schema, None, Some(txn)).insert(rows((9L, "z", 9.0)))
    // ISOLATION: the published table is untouched while the txn is open
    assert(a.df.collect().map(_.getLong(0)).toSet == Set(1L),
      "staged writes are invisible to published readers before commit")
    cat.rollbackTxn(txn)
    assert(a.df.collect().map(_.getLong(0)).toSet == Set(1L),
      "rollback leaves the published contents untouched")
    assert(cat.get("txn_new").isEmpty, "tables created inside the txn are dropped")
    // the view still serves the published snapshot
    assert(spark.sql("SELECT COUNT(*) FROM txn_a").head.getLong(0) == 1L)
    cat.drop("txn_a")
  }

  test("catalog transaction: commit publishes atomically; stray commit/rollback are no-ops") {
    val cat = MutableCatalog(spark)
    val t = cat.create("txn_c", schema, Some("id"))
    cat.commitTxn(cat.beginTxn()); cat.rollbackTxn(cat.beginTxn()) // empty: tolerated no-ops
    val txn = cat.beginTxn()
    cat.route("INSERT INTO txn_c VALUES (1, 'a', 1.0)", Some(txn))
    assert(t.df.count() == 0, "uncommitted write invisible")
    cat.commitTxn(txn)
    assert(t.df.count() == 1, "commit publishes transactional writes")
    cat.rollbackTxn(txn)
    assert(t.df.count() == 1, "rollback after commit is a no-op")
    cat.drop("txn_c")
  }

  test("concurrent transactions: isolated while open; the second commit conflicts") {
    // Flipped from the pre-r13 last-pointer-swap-wins leniency: two open
    // txns stage divergent chains off the same base invisibly to each
    // other; the FIRST commit wins and the second ABORTS with a conflict
    // instead of silently erasing the committed row — the reference's
    // DuckDB-backed transactions raise the same way.
    val cat = MutableCatalog(spark)
    val t = cat.create("txn_cc", schema, Some("id"))
    cat.route("INSERT INTO txn_cc VALUES (1, 'base', 1.0)")
    val t1 = cat.beginTxn(); val t2 = cat.beginTxn()
    cat.route("INSERT INTO txn_cc VALUES (2, 'from_t1', 2.0)", Some(t1))
    cat.route("INSERT INTO txn_cc VALUES (3, 'from_t2', 3.0)", Some(t2))
    assert(t.df.count() == 1, "both staged chains invisible while open")
    cat.commitTxn(t1)
    assert(t.df.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    val e = intercept[Exception](cat.commitTxn(t2))
    assert(e.getMessage.contains("conflict"))
    assert(t.df.collect().map(_.getLong(0)).toSet == Set(1L, 2L),
      "the first committed write survives; the conflicted chain is discarded")
    cat.drop("txn_cc")
  }

  test("syncViews re-registers a session's view only when the table version changed") {
    val cat = MutableCatalog(spark)
    val t = cat.create("sv_t", schema, Some("id"))
    t.insert(rows((1L, "a", 1.0)))
    val sess = spark.newSession()
    cat.syncViews(sess)
    assert(sess.sql("SELECT COUNT(*) FROM sv_t").head.getLong(0) == 1L)
    // plant a decoy view: an unchanged table version must NOT be
    // re-registered (the per-statement sync call would otherwise be an
    // O(tables) re-analysis under the catalog lock)
    sess.range(42).toDF("id").createOrReplaceTempView("sv_t")
    cat.syncViews(sess)
    assert(sess.sql("SELECT COUNT(*) FROM sv_t").head.getLong(0) == 42L,
      "unchanged version must skip re-registration")
    // a mutation bumps the version and the next sync replaces the decoy
    cat.route("INSERT INTO sv_t VALUES (2, 'b', 2.0)")
    cat.syncViews(sess)
    assert(sess.sql("SELECT COUNT(*) FROM sv_t").head.getLong(0) == 2L,
      "changed version must re-register the snapshot view")
    cat.drop("sv_t")
  }

  test("concurrent syncViews across sessions race a writer safely and converge") {
    val cat = MutableCatalog(spark)
    val t = cat.create("svc_t", schema, Some("id"))
    t.insert(rows((1L, "a", 1.0)))
    val sessions = (0 until 6).map(_ => spark.newSession())
    val fail = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val readers = sessions.map { cs =>
      val th = new Thread(() =>
        try (1 to 15).foreach { _ => cat.syncViews(cs); cs.sql("SELECT COUNT(*) FROM svc_t").collect() }
        catch { case e: Throwable => fail.compareAndSet(null, e) })
      th.start(); th
    }
    val writer = new Thread(() =>
      try (2 to 6).foreach(i => cat.route(s"INSERT INTO svc_t VALUES ($i, 'x', 1.0)"))
      catch { case e: Throwable => fail.compareAndSet(null, e) })
    writer.start()
    (readers :+ writer).foreach(_.join())
    assert(fail.get() == null, s"concurrent sync/read/write raised: ${fail.get()}")
    // after the dust settles every session converges on the final snapshot
    sessions.foreach { cs =>
      cat.syncViews(cs)
      assert(cs.sql("SELECT COUNT(*) FROM svc_t").head.getLong(0) == 6L)
    }
    cat.drop("svc_t")
  }

  test("concurrent in-process writers serialize: no lost updates") {
    val t = mkTable(pk = None)
    val writers = 8
    val threads = (0 until writers).map { w =>
      val th = new Thread(() => t.insert(rows((w.toLong, s"w$w", w.toDouble))))
      th.start(); th
    }
    threads.foreach(_.join())
    // every writer's commit must survive: version advanced once per
    // insert and all rows are present (an unserialized read-version ->
    // commit(v+1) race drops whole batches)
    assert(t.currentVersion == writers.toLong,
      s"expected $writers commits, saw version ${t.currentVersion}")
    assert(t.df.count() == writers.toLong)
  }
}
