ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hierospark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// per-test durations in the report (-oD) — the evidence trail for keeping
// the suite inside the driver's verification budget
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
run / fork := true
// The driver parses the bench/verify mains' stdout with per-line JSON
// reads. sbt's default LoggedOutput wraps every forked-process line in
// an "[info] " prefix (and logs its stderr as "[error] " to stdout),
// which broke the parse two rounds running (PERF r19/r20 `parsed: null`).
// StdoutOutput inherits the real stdout/stderr instead: the forked
// main's println lines reach the driver byte-for-byte, and its stderr
// diagnostics stay on stderr.
outputStrategy := Some(StdoutOutput)
// ... and sbt's own trailing "[success] Total time: ..." line lands on
// stdout AFTER the bench's final JSON line, so a last-line parser reads
// sbt noise instead of the bench output. rc still signals success.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// forward sbt's stdin to the forked JVM (graft.Repl reads commands from it)
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
  // local[32] runs all executor threads in this one JVM — size the heap
  // for 32 concurrent tasks (machine has 128 GiB; 8g caused GC thrash
  // and 4x run-to-run swings on the heavier queries)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
