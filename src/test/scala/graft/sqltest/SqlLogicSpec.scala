package graft.sqltest

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

/** Runs the reference's 8 sqllogictest corpora (the .test files under
  * tests/sql) verbatim against the Spark engine through the
  * dialect-compat executor — the §5 "port decision" from SURVEY.md.
  */
class SqlLogicSpec extends SparkTestBase {

  private val corpus = Paths.get("/root/reference/tests/sql")

  private val files = Seq(
    "ducklake_basic.test",
    "error_status.test",
    "metadata_visibility.test",
    "partial_insert.test",
    "quoted_identifiers.test",
    "sql_injection_identifiers.test",
    "table_schema_test.test",
    "timestamp.test")

  files.foreach { f =>
    test(s"reference corpus: $f") {
      assume(Files.exists(corpus.resolve(f)), s"reference corpus missing: $f")
      val testDir = Files.createTempDirectory(s"slt_${f.stripSuffix(".test")}")
      // DuckDB coerces string literals into date/timestamp/binary columns
      // on INSERT; ANSI store assignment forbids that, so the compat
      // session mirrors DuckDB's permissive coercion.
      val session = spark.newSession()
      session.conf.set("spark.sql.storeAssignmentPolicy", "LEGACY")
      val exec = new SqlLogicExec(session, testDir)
      exec.runFile(corpus.resolve(f))
    }
  }

  test("parser handles all directive forms") {
    val parsed = SqlLogicParser.parse(
      """# comment
        |require ducklake
        |
        |statement ok
        |CREATE TABLE t (i INT);
        |
        |statement error
        |BROKEN SQL
        |
        |query II
        |SELECT * FROM t
        |----
        |1	2
        |
        |query error
        |SELECT * FROM missing
        |----
        |""".stripMargin)
    assert(parsed.length == 4)
    assert(parsed.collect { case s: SqlLogicParser.Statement => s }.map(_.expectError) == Seq(false, true))
    val q = parsed.collect { case q: SqlLogicParser.Query => q }
    assert(q.head.expected == Seq("1\t2"))
    assert(q(1).expectError)
  }
}
