ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "swanlakespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// forward sbt's stdin to the forked JVM so graft.Cli's REPL can read it
run / connectInput := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// GC defaults are HEAP-AWARE (r18 A/B ledger; 40 s lab window,
// 4-terminal TPC-H mix at sf0.1, this machine). ParallelGC wins small
// heaps (8g: 13.7 vs G1's 11.3 req/s at 3% GC wall share; 16g: 15.2 vs
// 14.3 at 2%), but with an UNBOUNDED young gen its scavenge pauses
// scale with the heap: 23% of wall at 32g, and at ~80g it collapses to
// 4.0 req/s / 54% GC / p99 22.8 s — exactly the BENCH_r17 driver
// pathology (that host runs an ~80 GB heap). The root cause is young-gen
// SIZE, not the collector: Parallel with the young gen capped at 3g
// reads 12.2 req/s / 6% GC / p99 1.0 s at 80g (2g: 14.2 / 10%; 6g:
// 12.6 / 15% — 3g is the margin point vs the bench's 15% internal-stall
// bar), beating G1 at the same heap (9.4 req/s — its ~1% pause share
// costs ~10% mutator throughput in write barriers). Default: Parallel
// everywhere, young capped at 3g above 16g heaps. SPARK_DRIVER_GC /
// SPARK_DRIVER_YOUNG override both choices.
def graftMemMb(s: String): Long = {
  val t = s.trim.toLowerCase
  val num = t.takeWhile(c => c.isDigit || c == '.')
  val mult = t.drop(num.length) match {
    case "g" | "gb" => 1024L
    case "t" | "tb" => 1024L * 1024
    case "k" | "kb" => 0L // sub-MB: floor to 0 (forces the small-heap default)
    case _          => 1L // bare number or m/mb
  }
  // build definition compiles under Scala 2.12: no toDoubleOption there
  val n = try { if (num.isEmpty) 8192.0 else num.toDouble } catch { case _: NumberFormatException => 8192.0 }
  (n * mult).toLong
}
javaOptions ++= {
  val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
  val gc = sys.env.getOrElse("SPARK_DRIVER_GC", "Parallel")
  val young = sys.env.get("SPARK_DRIVER_YOUNG")
    .orElse(if (gc == "Parallel" && graftMemMb(mem) > 16384L) Some("3g") else None)
  jdk17AddOpens ++ Seq(
    "-Dspark.ui.enabled=false",
    "-Dspark.sql.session.timeZone=UTC",
    s"-Xmx$mem",
    s"-XX:+Use${gc}GC",
  ) ++ young.map(y => s"-Xmn$y").toSeq
}

