package graft

import graft.sources.MutableCatalog
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Ports of the reference's end-to-end runner scenarios
  * (tests/runner/src/scenarios/mod.rs:13-21) against the engine layers —
  * each test cites the scenario it reproduces.
  */
class ScenarioSpec extends SparkTestBase {

  private val usersSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("balance", DoubleType)))

  // === execute_query_commands.rs: DDL/DML through the single SQL entry ====
  test("DDL and DML flow through Engine.sql (execute_query_commands.rs)") {
    Engine.sql(spark, "DROP TABLE IF EXISTS eqc_t")
    Engine.sql(spark, "CREATE TABLE eqc_t (id INT, v STRING) USING parquet")
    Engine.sql(spark, "INSERT INTO eqc_t VALUES (1, 'a'), (2, 'b')")
    val rows = Engine.sql(spark, "SELECT * FROM eqc_t ORDER BY id").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
    Engine.sql(spark, "DROP TABLE eqc_t")
  }

  // === prepared_statements.rs:47-238: UPDATE/DELETE with parameters =======
  test("parameterized UPDATE and DELETE via prepared statements + mutable catalog") {
    val cat = MutableCatalog(spark)
    cat.create("ps_users", usersSchema, primaryKey = Some("id"))
    assert(cat.route("INSERT INTO ps_users VALUES (1, 'ann', 10.0), (2, 'bob', 20.0)").contains(2))
    // bind params as literals (the reference's engine-side Value binding),
    // then route the bound DML
    val update = SqlParams.bind("UPDATE ps_users SET balance = ? WHERE id = ?", Seq(99.5, 1L))
    assert(cat.route(update).contains(1))
    assert(spark.sql("SELECT balance FROM ps_users WHERE id = 1").head.getDouble(0) == 99.5)
    val delete = SqlParams.bind("DELETE FROM ps_users WHERE id = ?", Seq(2L))
    assert(cat.route(delete).contains(1))
    assert(spark.sql("SELECT COUNT(*) FROM ps_users").head.getLong(0) == 1)
  }

  // === prepared_statements.rs: param-mismatch + missing-param handling ====
  test("extra params are ignored, missing params bind NULL (prepared.rs)") {
    val s = new Session("scn", spark)
    val p = s.createPrepared("SELECT CAST(? AS INT) AS a, CAST(? AS STRING) AS b")
    s.bindParams(p.handle, Seq(1, "x", "extra-ignored"))
    val r1 = s.executePrepared(p.handle).head
    assert(r1.getInt(0) == 1 && r1.getString(1) == "x")
    val r2 = s.executePrepared(p.handle).head // no params pending -> NULLs
    assert(r2.isNullAt(0) && r2.isNullAt(1))
  }

  // === appender_insert.rs: bulk append with partial columns + casts =======
  test("appender-style bulk insert aligns partial/reordered batches (appender_insert.rs)") {
    val cat = MutableCatalog(spark)
    cat.create("app_t", usersSchema)
    // reordered + partial column list, types needing casts
    assert(cat.route("INSERT INTO app_t (name, id) VALUES ('zoe', 7)").contains(1))
    val row = spark.sql("SELECT id, name, balance FROM app_t").head
    assert(row == Row(7L, "zoe", null))
  }

  // === parameter_types.rs:84-229: temporal/typed param round-trips ========
  test("typed parameter round-trips: date, timestamp, decimal, binary (parameter_types.rs)") {
    val s = new Session("types", spark)
    val p = s.createPrepared(
      "SELECT CAST(? AS DATE) AS d, CAST(? AS TIMESTAMP) AS ts, CAST(? AS DECIMAL(20,0)) AS dec, ? AS b")
    s.bindParams(p.handle, Seq(
      java.time.LocalDate.of(2024, 2, 29),
      java.sql.Timestamp.valueOf("2024-02-29 12:34:56"),
      new java.math.BigDecimal("18446744073709551615"),
      Array[Byte](1, 2, 3)))
    val r = s.executePrepared(p.handle).head
    val d = r.get(r.fieldIndex("d")) match {
      case ld: java.time.LocalDate => ld
      case sd: java.sql.Date       => sd.toLocalDate
    }
    assert(d == java.time.LocalDate.of(2024, 2, 29))
    assert(r.getAs[java.math.BigDecimal]("dec").toString == "18446744073709551615")
    assert(r.getAs[Array[Byte]]("b").toSeq == Seq[Byte](1, 2, 3))
  }

  // === transaction_recovery.rs:120: cross-session visibility ==============
  test("a new session sees committed (post-abort) state (transaction_recovery.rs)") {
    val cat = MutableCatalog(spark)
    cat.create("txn_t", usersSchema)
    val s1 = new Session("txn1", spark)
    s1.begin()
    cat.route("INSERT INTO txn_t VALUES (1, 'committed', 0.0)")
    s1.commit()
    s1.rollback() // no-op after commit — tolerated (transaction.rs:68-93)
    val s2 = new Session("txn2", spark)
    assert(spark.sql("SELECT name FROM txn_t").head.getString(0) == "committed")
  }

  // === error paths: unknown handle, unroutable DML ========================
  test("unknown prepared handles error; non-managed DML falls through (service/mod.rs:153-325)") {
    val s = new Session("err", spark)
    intercept[NoSuchElementException](s.executePrepared("nope"))
    val cat = MutableCatalog(spark)
    assert(cat.route("UPDATE not_managed SET x = 1").isEmpty)
    assert(cat.route("SELECT 1").isEmpty)
  }
}
