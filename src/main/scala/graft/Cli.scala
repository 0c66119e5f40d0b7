package graft

import java.io.{BufferedReader, InputStreamReader, PrintStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import graft.flight.{FlightSqlClient, FlightSqlProducer}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Interactive SQL shell over the in-proc Flight SQL client — the
  * reference CLI (swanlake-client/src/bin/cli.rs:1-271) re-expressed
  * on the facade: the same loop (prompt, exit/quit, per-statement
  * error recovery, `~/.graft_history`), the same result surfaces
  * (unicode box table, `N rows in X.XXXs` / `N rows affected` timing
  * lines) and the same one-shot `-q` mode. Deviations, documented:
  * line editing (rustyline) and the gRPC endpoint flag need jars the
  * offline build doesn't ship, so input is plain stdin and the
  * "server" is the in-proc producer; `--data <dir>` registers the
  * parquet test tables the way a remote server would already have
  * its lake attached.
  *
  *   sbt "runMain graft.Cli --data /root/testdata/sf0.01 -q 'SELECT 1'"
  */
object Cli {
  def main(args: Array[String]): Unit = {
    var dataDir: Option[String] = None
    var oneShot: Option[String] = None
    var url: Option[String] = None
    var debug = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-d" | "--data" if i + 1 < args.length  => dataDir = Some(args(i + 1)); i += 2
        case "-q" | "--query" if i + 1 < args.length => oneShot = Some(args(i + 1)); i += 2
        case "-u" | "--url" if i + 1 < args.length   => url = Some(args(i + 1)); i += 2
        case "--debug" => debug = true; i += 1
        case other =>
          System.err.println(s"unknown argument: $other"); sys.exit(2)
      }
    }
    // REMOTE mode (--url http://host:port): the shell drives a running
    // server's SQL gateway over the network — no SparkSession in this
    // JVM at all (Arrow results decode session-free), the reference's
    // actual client/server split
    url match {
      case Some(u) =>
        val out = new PrintStream(new java.io.FileOutputStream(java.io.FileDescriptor.out),
          true, "UTF-8")
        val errOut = new PrintStream(new java.io.FileOutputStream(java.io.FileDescriptor.err),
          true, "UTF-8")
        if (dataDir.isDefined)
          errOut.println("--data is ignored with --url (the server owns its lake)")
        out.println(s"Connecting to $u ...")
        val client = new HttpSqlClient(u)
        val shell = new Shell(client, out, errOut, debug)
        var failed = false
        // release the server-side session on exit (r19 review: the
        // reference's client drop closes the TCP conn; without the
        // disconnect the gateway session lingered until idle eviction)
        try {
          oneShot match {
            case Some(sql) =>
              try shell.executeAndDisplay(sql)
              catch { case t: Throwable => shell.displayError(t); failed = true }
            case None =>
              out.println("Connected successfully!\n")
              val hist = Paths.get(sys.props.getOrElse("user.home", "."), ".graft_history")
              shell.runInteractive(new BufferedReader(new InputStreamReader(System.in)), Some(hist))
          }
        } finally {
          try client.disconnect() catch { case _: Throwable => () }
        }
        if (failed) sys.exit(1)
        return
      case None => ()
    }
    val spark = Engine.newSession("graft-cli", Engine.defaultCores)
    val producer = new FlightSqlProducer(new SessionRegistry(spark))
    // UTF-8 regardless of platform charset: the box table is unicode
    val out = new PrintStream(new java.io.FileOutputStream(java.io.FileDescriptor.out),
      true, "UTF-8")
    val errOut = new PrintStream(new java.io.FileOutputStream(java.io.FileDescriptor.err),
      true, "UTF-8")
    out.println("Connecting to in-process graft engine...")
    var failed = false
    // connect + --data registration happen inside the try: a bad data
    // dir must render through the shell's error contract and still
    // stop the session, same as a failing one-shot statement
    try {
      val client = FlightSqlClient.connect(producer)
      val shell = new Shell(client, out, errOut, debug)
      // table views go into the CLIENT's peer session — server sessions
      // isolate temp views, so registering on the root session would
      // leave bare names unresolvable over the wire
      try dataDir.foreach(d =>
        Engine.registerAll(producer.registry.getOrCreate(client.peer).spark, d))
      catch { case t: Throwable => shell.displayError(t); failed = true }
      if (!failed) {
        out.println("Connected successfully!\n")
        oneShot match {
          case Some(sql) =>
            // one-shot errors use the shell's display contract, not a raw
            // stack trace, and must still release the session below
            try shell.executeAndDisplay(sql)
            catch { case t: Throwable => shell.displayError(t); failed = true }
          case None =>
            val hist = Paths.get(sys.props.getOrElse("user.home", "."), ".graft_history")
            shell.runInteractive(new BufferedReader(new InputStreamReader(System.in)), Some(hist))
        }
      }
    } finally spark.stop()
    if (failed) sys.exit(1)
  }
}

/** The shell's testable core: reads statements, classifies them the
  * way the reference does (cli.rs is_query_statement), renders query
  * results as a box table, and never lets one bad statement kill the
  * loop (cli.rs:113-118).
  */
final class Shell(client: graft.flight.SqlConnection, out: PrintStream, err: PrintStream,
    debug: Boolean = false) {

  def runInteractive(in: BufferedReader, historyFile: Option[Path] = None): Unit = {
    out.println("graft interactive SQL shell")
    out.println("Type your SQL and press Enter. Type 'exit' or 'quit' to exit.")
    out.println()
    val history = mutable.Buffer.empty[String]
    var done = false
    while (!done) {
      out.print("graft> ")
      out.flush()
      val line = in.readLine()
      if (line == null) { out.println("Goodbye!"); done = true } // EOF (cli.rs:131-134)
      else {
        val q = line.trim
        if (q.nonEmpty) {
          history += q
          if (q.equalsIgnoreCase("exit") || q.equalsIgnoreCase("quit")) {
            out.println("Goodbye!")
            done = true
          } else {
            try executeAndDisplay(q)
            catch { case t: Throwable => displayError(t) }
            out.println()
          }
        }
      }
    }
    // append this session's statements, as the reference saves readline
    // history on exit (cli.rs:142-146)
    historyFile.foreach { p =>
      try Files.write(p, history.asJava, StandardCharsets.UTF_8,
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
      catch { case _: Throwable => () }
    }
  }

  /** Execute one statement and print its result surface + timing
    * (cli.rs execute_and_display:150-190).
    */
  def executeAndDisplay(sql: String): Unit = {
    val t0 = System.nanoTime()
    if (SqlShim.isQuery(sql)) {
      val r = client.query(sql)
      val secs = (System.nanoTime() - t0) / 1e9
      if (r.isEmpty) out.println("(No rows returned)")
      else out.println(Shell.renderTable(r.schema, r.rows))
      out.println(f"${r.totalRows}%d row${plural(r.totalRows)}%s in $secs%.3fs")
    } else {
      val u = client.update(sql)
      val secs = (System.nanoTime() - t0) / 1e9
      // the reference's update() surfaces a count only for DML; DDL
      // answers None -> "Query executed successfully" (cli.rs:176-184);
      // keyword is comment-aware, matching the isQuery classification
      val upper = SqlShim.leadingKeyword(sql)
      if (upper == "INSERT" || upper == "UPDATE" || upper == "DELETE")
        out.println(s"${u.rowsAffected} row${plural(u.rowsAffected)} affected")
      else out.println("Query executed successfully")
      out.println(f"$secs%.3fs")
    }
  }

  /** The one error-display contract shared by the interactive loop and
    * one-shot mode (cli.rs:113-118).
    */
  def displayError(t: Throwable): Unit = {
    err.println(s"Error: ${Option(t.getMessage).getOrElse(t.toString)}")
    if (debug) t.printStackTrace(err)
  }

  private def plural(n: Long): String = if (n == 1L) "" else "s"
}

object Shell {

  private val MaxCellWidth = 60

  /** Render rows as the unicode round-cornered box table the reference
    * prints via comfy-table (cli.rs display_results:217-257): header
    * row, one line per row, dynamic column widths capped at
    * [[MaxCellWidth]] with `…` truncation.
    */
  def renderTable(schema: StructType, rows: Array[Row]): String = {
    val headers = schema.fieldNames
    val cells = rows.map(r => Array.tabulate(headers.length)(i => formatValue(r.get(i))))
    val widths = headers.indices.map { i =>
      val w = (headers(i).length +: cells.map(_(i).length).toSeq).max
      math.min(MaxCellWidth, w)
    }
    def fit(s: String, w: Int): String =
      if (s.length <= w) s + " " * (w - s.length) else s.take(w - 1) + "…"
    def border(l: String, m: String, r: String): String =
      widths.map(w => "─" * (w + 2)).mkString(l, m, r)
    val sb = new StringBuilder
    sb ++= border("╭", "┬", "╮") += '\n'
    sb ++= headers.indices.map(i => fit(headers(i), widths(i)))
      .mkString("│ ", " │ ", " │") += '\n'
    sb ++= border("├", "┼", "┤") += '\n'
    cells.foreach { row =>
      sb ++= row.indices.map(i => fit(row(i), widths(i))).mkString("│ ", " │ ", " │") += '\n'
    }
    sb ++= border("╰", "┴", "╯")
    sb.toString
  }

  /** One cell's text: NULL renders empty (arrow's array_value_to_string
    * contract), binary as hex, nested arrays/structs in bracket form.
    */
  def formatValue(v: Any): String = v match {
    case null => ""
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case a: Array[_] => a.map(formatValue).mkString("[", ", ", "]")
    case s: scala.collection.Seq[_] => s.map(formatValue).mkString("[", ", ", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${formatValue(k)}: ${formatValue(x)}" }.mkString("{", ", ", "}")
    case r: Row => r.toSeq.map(formatValue).mkString("{", ", ", "}")
    case other => other.toString
  }
}
