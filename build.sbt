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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Parallel (throughput) GC beats the JDK-17 G1 default on the
  // 4-terminal bench window: paired A/B runs read 6.37/7.66 vs
  // 5.69/7.15 req/s (+9% mean). A 16g heap REGRESSES G1 (4.3/3.2) —
  // keep 8g unless overridden. Re-run r17 under the 235-query registry
  // + status-store retention caps: Parallel/8g 17.4, G1/8g 15.2,
  // Parallel/16g 16.1, G1/16g 13.6 req/s — the choice stands.
  s"-XX:+Use${sys.env.getOrElse("SPARK_DRIVER_GC", "Parallel")}GC",
)

