package graft

class SessionSpec extends SparkTestBase {

  private def newSession(id: String = "s1") = new Session(id, spark.newSession())

  test("schemaForQuery caches by trimmed SQL (session/mod.rs:84-131)") {
    val s = newSession()
    val a = s.schemaForQuery("SELECT 1 AS x")
    val b = s.schemaForQuery("  SELECT 1 AS x  ")
    assert(a == b)
    assert(s.schemaCacheSize == 1)
  }

  test("schema cache is LRU-bounded at 128") {
    val s = newSession()
    (0 until 140).foreach(i => s.schemaForQuery(s"SELECT $i AS x"))
    assert(s.schemaCacheSize == 128)
  }

  test("DDL invalidates the schema cache (session/mod.rs:423-433)") {
    val s = newSession()
    s.schemaForQuery("SELECT 1 AS x")
    assert(s.schemaCacheSize == 1)
    s.sql("CREATE OR REPLACE TEMP VIEW t_inval AS SELECT 2 AS y")
    assert(s.schemaCacheSize == 0)
  }

  test("a leading comment does not defeat schema-cache invalidation (r18 review)") {
    val s = newSession()
    s.schemaForQuery("SELECT 1 AS x")
    assert(s.schemaCacheSize == 1)
    // the old raw startsWith saw "/*" and kept the stale cache while the
    // DDL executed (statement routing was already comment-aware)
    s.sql("/* migration */ CREATE OR REPLACE TEMP VIEW t_inval2 AS SELECT 2 AS y")
    assert(s.schemaCacheSize == 0, "commented DDL must clear the cache")
  }

  test("the prepared registry is bounded; eviction and close release the handle (r18 review)") {
    val s = newSession()
    val first = s.createPrepared("SELECT 1 AS a").handle
    (1 to 1024).foreach(i => s.createPrepared(s"SELECT $i AS v"))
    assert(s.preparedCount == 1024, s"cap: ${s.preparedCount}")
    assert(s.getPrepared(first).isEmpty, "the oldest handle evicts past the cap")
  }

  test("DROP clears the table's synced view in EVERY session (r18 review)") {
    val cat = sources.MutableCatalog(spark)
    val t = cat.create("drop_vis_t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))))
    t.insert(spark.range(3).toDF("id"))
    val a = new Session("dv-a", spark.newSession(), Some(cat))
    val b = new Session("dv-b", spark.newSession(), Some(cat))
    assert(a.sql("SELECT COUNT(*) FROM drop_vis_t").collect()(0).getLong(0) == 3L)
    assert(b.sql("SELECT COUNT(*) FROM drop_vis_t").collect()(0).getLong(0) == 3L)
    cat.drop("drop_vis_t")
    // previously b's temp view survived and kept reading the dead
    // snapshot; now both sessions get TABLE_OR_VIEW_NOT_FOUND
    intercept[Exception](a.sql("SELECT COUNT(*) FROM drop_vis_t").collect())
    intercept[Exception](b.sql("SELECT COUNT(*) FROM drop_vis_t").collect())
  }

  test("prepared statement lifecycle: create, execute, close (session/mod.rs:465-609)") {
    val s = newSession()
    val p = s.createPrepared("SELECT 41 + 1 AS answer")
    assert(p.schema.exists(_.fieldNames.sameElements(Array("answer"))))
    assert(s.executePrepared(p.handle).head.getInt(0) == 42)
    s.closePrepared(p.handle)
    assert(s.preparedCount == 0)
    intercept[NoSuchElementException](s.executePrepared(p.handle))
  }

  test("empty handle falls back to last-created statement (prepared.rs:44-60)") {
    val s = newSession()
    s.createPrepared("SELECT 1 AS a")
    val p2 = s.createPrepared("SELECT 2 AS b")
    assert(s.getPrepared("").map(_.handle).contains(p2.handle))
    assert(s.executePrepared("").head.getInt(0) == 2)
  }

  test("parameter binding substitutes positional ? as literals (A2)") {
    val s = newSession()
    val p = s.createPrepared("SELECT ? + 1 AS n, ? AS t")
    s.bindParams(p.handle, Seq(41, "x'y"))
    val row = s.executePrepared(p.handle).head
    assert(row.getInt(0) == 42)
    assert(row.getString(1) == "x'y")
  }

  test("missing params bind NULL (connection.rs:286-292)") {
    val s = newSession()
    val p = s.createPrepared("SELECT CAST(? AS INT) AS a")
    val row = s.executePrepared(p.handle).head
    assert(row.isNullAt(0))
  }

  test("ephemeral statements close eagerly after execute (execute.rs:64-73)") {
    val s = newSession()
    val p = s.createPrepared("SELECT 7 AS x", ephemeral = true)
    s.executePrepared(p.handle)
    assert(s.preparedCount == 0)
  }

  test("transactions are lenient: commit/rollback without begin are no-ops (transaction.rs:68-93)") {
    val s = newSession()
    s.commit(); s.rollback() // must not throw
    s.begin()
    assert(s.inTransaction)
    s.commit()
    assert(!s.inTransaction)
  }

  test("SqlParams escapes and skips placeholders inside literals/comments") {
    assert(SqlParams.bind("SELECT '?' , ?", Seq(1)) == "SELECT '?' , 1")
    assert(SqlParams.bind("SELECT ? -- ? comment\n, ?", Seq("a", "b")) ==
      "SELECT 'a' -- ? comment\n, 'b'")
    assert(SqlParams.literal(null) == "NULL")
    assert(SqlParams.literal("O'Brien") == "'O''Brien'")
    assert(SqlParams.literal(Array[Byte](0x0A, 0x7F)) == "X'0A7F'")
    assert(SqlParams.literal(true) == "TRUE")
    assert(SqlParams.literal(java.time.LocalDate.of(2026, 1, 2)) == "DATE '2026-01-02'")
    intercept[IllegalArgumentException](SqlParams.literal(new Object))
  }

  test("SqlParams escapes backslashes (injection regression, ADVICE r2 high)") {
    assert(SqlParams.literal("a\\") == "'a\\\\'")
    // end-to-end through Spark's parser: trailing backslash round-trips
    assert(spark.sql("SELECT " + SqlParams.literal("payload\\") + " AS s")
      .head.getString(0) == "payload\\")
    // a quote-smuggling attempt stays one literal, verbatim
    val evil = "x\\' OR '1'='1"
    assert(spark.sql("SELECT " + SqlParams.literal(evil) + " AS s")
      .head.getString(0) == evil)
    // scanner: a ? following a backslash-escaped quote is still inside
    // the string literal, so only the bare ? binds
    assert(SqlParams.bind("SELECT 'a\\'? not me', ?", Seq(7)) == "SELECT 'a\\'? not me', 7")
  }

  test("catalog-backed session: ROLLBACK discards staged writes, COMMIT publishes (A22, SURVEY 7.4)") {
    import org.apache.spark.sql.types._
    val cat = graft.sources.MutableCatalog(spark)
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val t = cat.create("sess_txn_t", schema, Some("id"))
    cat.route("INSERT INTO sess_txn_t VALUES (1, 'a')")
    val s = new Session("txn-sess", spark.newSession(), Some(cat))
    s.begin()
    assert(s.inTransaction)
    s.sql("INSERT INTO sess_txn_t VALUES (2, 'b')")
    assert(t.df.count() == 1, "staged write invisible outside the txn")
    assert(s.sql("SELECT COUNT(*) FROM sess_txn_t").head.getLong(0) == 2L,
      "the txn session reads its own staged write")
    s.rollback()
    assert(!s.inTransaction)
    assert(t.df.count() == 1, "session rollback discarded the staged write")
    assert(s.sql("SELECT COUNT(*) FROM sess_txn_t").head.getLong(0) == 1L,
      "after rollback the session reads the published snapshot again")
    s.begin()
    s.sql("INSERT INTO sess_txn_t VALUES (3, 'c')")
    s.commit()
    assert(t.df.count() == 2, "session commit published the write")
    cat.drop("sess_txn_t")
  }
}
