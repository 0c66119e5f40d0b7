package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.flight.{FlightSqlClient, FlightSqlProducer}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The CLI shell's command set, driven through scripted stdin over the
  * in-proc client — the loop/display contract of the reference CLI
  * (swanlake-client/src/bin/cli.rs:68-257).
  */
class CliSpec extends SparkTestBase {

  private def newShell() = {
    val producer = new FlightSqlProducer(new SessionRegistry(spark))
    val client = FlightSqlClient.connect(producer)
    val outBuf = new ByteArrayOutputStream()
    val errBuf = new ByteArrayOutputStream()
    val shell = new Shell(client,
      new PrintStream(outBuf, true, "UTF-8"), new PrintStream(errBuf, true, "UTF-8"))
    (shell, outBuf, errBuf)
  }

  private def run(shell: Shell, script: String): Unit =
    shell.runInteractive(new BufferedReader(new StringReader(script)))

  private def s(buf: ByteArrayOutputStream) = new String(buf.toByteArray, StandardCharsets.UTF_8)

  test("query renders a box table with headers, row count and timing (cli.rs:150-171)") {
    val (shell, out, _) = newShell()
    run(shell, "SELECT 1 AS a, 'x' AS b UNION ALL SELECT 2, 'y' ORDER BY a\nexit\n")
    val o = s(out)
    assert(o.contains("graft> "), "prompt printed")
    assert(o.contains("╭") && o.contains("╰") && o.contains("┼"), "box table borders")
    assert(o.contains("│ a │ b │"), "header row")
    assert(o.contains("│ 1 │ x │") && o.contains("│ 2 │ y │"), "data rows")
    assert(o.matches("(?s).*2 rows in \\d+\\.\\d{3}s.*"), "row count + timing line")
    assert(o.contains("Goodbye!"))
  }

  test("empty result prints the no-rows marker, singular row count unpluralized") {
    val (shell, out, _) = newShell()
    run(shell, "SELECT 1 AS a WHERE 1 = 0\nSELECT 1 AS a\nexit\n")
    val o = s(out)
    assert(o.contains("(No rows returned)"))
    assert(o.matches("(?s).*\\b1 row in \\d+\\.\\d{3}s.*"), "1 row, not 1 rows")
  }

  test("DML reports rows affected; DDL reports success (cli.rs:172-187)") {
    val (shell, out, _) = newShell()
    spark.sql("DROP TABLE IF EXISTS cli_t")
    run(shell,
      "CREATE TABLE cli_t (id INT, v STRING) USING parquet\n" +
        "INSERT INTO cli_t VALUES (1, 'a'), (2, 'b')\n" +
        "SELECT COUNT(*) AS n FROM cli_t\nquit\n")
    val o = s(out)
    assert(o.contains("Query executed successfully"), "DDL has no affected count")
    assert(o.contains("rows affected"), "INSERT reports affected rows")
    assert(o.contains("│ 2 │"), "the inserted rows are visible")
    spark.sql("DROP TABLE cli_t")
  }

  test("comment-prefixed DML still reports its affected-row count") {
    val (shell, out, _) = newShell()
    spark.sql("DROP TABLE IF EXISTS cli_c")
    run(shell,
      "CREATE TABLE cli_c (id INT) USING parquet\n" +
        "/* retry */ INSERT INTO cli_c VALUES (1)\n" +
        "/* and */ /* chained */ INSERT INTO cli_c VALUES (2)\nexit\n")
    val o = s(out)
    // the DML branch classifies on the comment-stripped keyword, so
    // neither statement falls through to the bare success line
    assert("rows? affected".r.findAllIn(o).length == 2,
      s"both comment-prefixed DML statements must report counts:\n$o")
    spark.sql("DROP TABLE cli_c")
  }

  test("a failing statement prints an error and the loop continues (cli.rs:113-118)") {
    val (shell, out, err) = newShell()
    run(shell, "SELECT definitely broken FROM\nSELECT 7 AS k\nexit\n")
    assert(s(err).contains("Error: "), "error goes to stderr")
    assert(s(out).contains("│ 7 │"), "the next statement still executes")
  }

  test("EOF exits cleanly; blank lines are skipped; history file appends entries") {
    val (shell, out, _) = newShell()
    val hist = Files.createTempFile("graft_hist", "")
    shell.runInteractive(
      new BufferedReader(new StringReader("\n   \nSELECT 1 AS a\n")), Some(hist))
    val o = s(out)
    assert(o.contains("Goodbye!"), "EOF (no exit command) still says goodbye")
    val lines = Files.readAllLines(hist)
    assert(lines.size == 1 && lines.get(0) == "SELECT 1 AS a",
      "only non-blank statements reach the history file")
    Files.delete(hist)
  }

  test("cell formatting: NULL empty, binary hex, arrays and structs bracketed") {
    assert(Shell.formatValue(null) == "")
    assert(Shell.formatValue(Array[Byte](0x0a,
      0xff.toByte)) == "0aff")
    assert(Shell.formatValue(Seq(1, 2, 3)) == "[1, 2, 3]")
    assert(Shell.formatValue(Row(1, "x")) == "{1, x}")
    val schema = StructType(Seq(StructField("c", StringType)))
    val wide = Shell.renderTable(schema, Array(Row("x" * 200)))
    assert(wide.linesIterator.forall(_.length <= 70), "cells truncate at the width cap")
    assert(wide.contains("…"), "truncation marker")
  }
}
