package graft

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The prepared key-read fast path (Session.pointReadFast): PK-equality
  * and BETWEEN range shapes execute from a cached physical scan with a
  * re-bound literal — these legs pin that its answers are IDENTICAL to
  * the native SQL path across values, DML churn, projections, ORDER BY
  * directions, and transactions (read-your-writes), and that unusual
  * shapes fall back rather than change semantics.
  */
class FastReadSpec extends SparkTestBase {

  private def freshSession(): (Session, sources.MutableCatalog) = {
    val catalog = sources.MutableCatalog(spark)
    (new Session("fastread", spark.newSession(), Some(catalog)), catalog)
  }

  private def load(catalog: sources.MutableCatalog, name: String): Unit = {
    import org.apache.spark.sql.functions._
    val t = catalog.create(name, StructType(Seq(
      StructField("k", LongType), StructField("s", StringType),
      StructField("v", LongType))), primaryKey = Some("k"))
    (0 until 5).foreach { i =>
      t.insert(spark.range(i * 100L, i * 100L + 100)
        .select(col("id").as("k"), concat(lit("s"), col("id")).as("s"), (col("id") * 7).as("v")))
    }
  }

  test("point read: fast path answers match the native path across values and DML") {
    val (sess, catalog) = freshSession()
    load(catalog, "fr_pt")
    val p = sess.createPrepared("SELECT * FROM fr_pt WHERE k = ?")
    def read(k: Long) = sess.executePrepared(p.handle, Seq(k)).collect()
    val r = read(250L)
    assert(r.length == 1 && r(0).getString(1) == "s250" && r(0).getLong(2) == 1750L)
    // different value through the SAME handle (re-bound literal, cached scan)
    assert(read(42L)(0).getString(1) == "s42")
    assert(read(9999L).isEmpty, "missing key answers zero rows")
    // DML invalidates by candidate-set change, not staleness
    sess.sql("UPDATE fr_pt SET s = 'changed' WHERE k = 250")
    assert(read(250L)(0).getString(1) == "changed")
    sess.sql("DELETE FROM fr_pt WHERE k = 42")
    assert(read(42L).isEmpty, "deleted key must disappear from the fast path")
    // projection subset (key not selected) keeps the declared columns
    val p2 = sess.createPrepared("SELECT s FROM fr_pt WHERE k = ?")
    val r2 = sess.executePrepared(p2.handle, Seq(300L)).collect()
    assert(r2(0).length == 1 && r2(0).getString(0) == "s300")
    catalog.drop("fr_pt")
  }

  test("range read: BETWEEN with ORDER BY matches the native path, both directions") {
    val (sess, catalog) = freshSession()
    load(catalog, "fr_rng")
    val asc = sess.createPrepared("SELECT k, s FROM fr_rng WHERE k BETWEEN ? AND ? ORDER BY k")
    val got = sess.executePrepared(asc.handle, Seq(95L, 205L)).collect()
    assert(got.map(_.getLong(0)).toSeq == (95L to 205L), s"got ${got.length} rows")
    assert(got.head.getString(1) == "s95" && got.last.getString(1) == "s205")
    val desc = sess.createPrepared(
      "SELECT k FROM fr_rng WHERE k BETWEEN ? AND ? ORDER BY k DESC")
    val gotDesc = sess.executePrepared(desc.handle, Seq(480L, 520L)).collect()
    assert(gotDesc.map(_.getLong(0)).toSeq == (499L to 480L by -1),
      "the table tops out at 499; DESC order must hold")
    // empty range and inverted bounds answer zero rows (native semantics)
    assert(sess.executePrepared(asc.handle, Seq(1000L, 2000L)).collect().isEmpty)
    assert(sess.executePrepared(asc.handle, Seq(10L, 5L)).collect().isEmpty)
    catalog.drop("fr_rng")
  }

  test("IN-list read: batch key lookup matches the native path, missing keys skipped") {
    val (sess, catalog) = freshSession()
    load(catalog, "fr_in")
    val p = sess.createPrepared("SELECT k, s FROM fr_in WHERE k IN (?, ?, ?)")
    def read(ks: Seq[Any]) = sess.executePrepared(p.handle, ks).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(read(Seq(5L, 250L, 499L)).toSeq ==
      Seq((5L, "s5"), (250L, "s250"), (499L, "s499")))
    // missing + duplicate keys: each matching ROW answers once
    assert(read(Seq(42L, 42L, 9999L)).toSeq == Seq((42L, "s42")))
    // DML visibility through the same handle
    sess.sql("DELETE FROM fr_in WHERE k = 250")
    assert(read(Seq(5L, 250L, 499L)).toSeq == Seq((5L, "s5"), (499L, "s499")))
    // a NULL param falls back to the native path (same empty-match answer)
    assert(read(Seq(5L, null, 9999L)).toSeq == Seq((5L, "s5")))
    catalog.drop("fr_in")
  }

  test("excess positional params are ignored like the native binder (review r16)") {
    val (sess, catalog) = freshSession()
    load(catalog, "fr_xs")
    // the native binder consumes exactly the placeholder count and
    // ignores extras; the fast path once handed the WHOLE param list to
    // the executor — equality with two params hit the two-literal
    // BETWEEN branch and silently became a range read
    val pEq = sess.createPrepared("SELECT k, s FROM fr_xs WHERE k = ?")
    val r = sess.executePrepared(pEq.handle, Seq(5L, 250L)).collect()
    assert(r.length == 1 && r(0).getLong(0) == 5L,
      s"equality with an extra param must stay an equality: got ${r.length} rows")
    val pRng = sess.createPrepared("SELECT k FROM fr_xs WHERE k BETWEEN ? AND ?")
    assert(sess.executePrepared(pRng.handle, Seq(10L, 12L, 99L)).collect().length == 3)
    catalog.drop("fr_xs")
  }

  test("ORDER BY a non-key column falls back to the native path (same results)") {
    val (sess, catalog) = freshSession()
    load(catalog, "fr_fb")
    val p = sess.createPrepared("SELECT k, v FROM fr_fb WHERE k BETWEEN ? AND ? ORDER BY v DESC")
    assert(p.pointRead.isEmpty, "non-key ORDER BY must not be detected as a fast shape")
    val got = sess.executePrepared(p.handle, Seq(10L, 13L)).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(13L, 12L, 11L, 10L)) // v = 7k is monotone
    catalog.drop("fr_fb")
  }

  test("concurrent fast-path reads racing autocommit DML always see a consistent snapshot") {
    val (readerSess, catalog) = freshSession()
    val writerSess = new Session("fastread-writer", spark.newSession(), Some(catalog))
    load(catalog, "fr_race")
    val p = readerSess.createPrepared("SELECT s FROM fr_race WHERE k = ?")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writer = new Thread(() => {
      try (1 to 25).foreach { i =>
        writerSess.sql(s"UPDATE fr_race SET s = 'v$i' WHERE k = 250")
      } catch { case e: Throwable => errors.add(s"writer: ${e.getMessage}") }
      finally stop.set(true)
    })
    val readers = (0 until 3).map { t =>
      new Thread(() => {
        var i = 0
        try while (!stop.get() || i == 0) {
          // the contended key: exactly one row, value from the update
          // lineage — never missing, duplicated, or torn
          val hot = readerSess.executePrepared(p.handle, Seq(250L)).collect()
          if (hot.length != 1) errors.add(s"t$t: got ${hot.length} rows for the hot key")
          else {
            val v = hot(0).getString(0)
            if (v != "s250" && !v.matches("v\\d+")) errors.add(s"t$t: torn value '$v'")
          }
          // an uncontended key in the SAME table (whose file the writer
          // keeps replacing around it) must stay byte-identical
          val cold = readerSess.executePrepared(p.handle, Seq((200L + t * 7))).collect()
          if (cold.length != 1 || cold(0).getString(0) != s"s${200 + t * 7}")
            errors.add(s"t$t: cold key corrupted: ${cold.mkString(",")}")
          i += 1
        } catch { case e: Throwable => errors.add(s"t$t: ${e.getMessage}") }
      })
    }
    (readers :+ writer).foreach(_.start())
    (readers :+ writer).foreach(_.join())
    assert(errors.isEmpty, s"fast path raced DML into: ${errors.peek()}")
    // after the dust settles the final value is the last update
    assert(readerSess.executePrepared(p.handle, Seq(250L)).collect()(0).getString(0) == "v25")
    catalog.drop("fr_race")
  }

  test("read-your-writes: a transaction's staged rows are visible to the fast path") {
    val (sess, catalog) = freshSession()
    load(catalog, "fr_txn")
    val p = sess.createPrepared("SELECT s FROM fr_txn WHERE k = ?")
    sess.sql("BEGIN")
    sess.sql("UPDATE fr_txn SET s = 'staged' WHERE k = 7")
    assert(sess.executePrepared(p.handle, Seq(7L)).collect()(0).getString(0) == "staged",
      "inside the txn the staged snapshot must win")
    sess.sql("ROLLBACK")
    assert(sess.executePrepared(p.handle, Seq(7L)).collect()(0).getString(0) == "s7",
      "after rollback the published snapshot is back")
    catalog.drop("fr_txn")
  }
}
