ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "uchr_scetlspark"
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
// r8 postmortem: BENCH_r08.json was parsed:null for the third round even
// though Bench's compact {"metric":"total"} line was complete inside the
// captured tail — sbt's run logger prefixed every stdout line with
// "[info] " and appended "[success] Total time: …" as the true last line,
// so a driver that json-parses whole lines failed on both. Two fixes:
//  1. StdoutOutput passes the forked process's stdout/stderr straight
//     through, undecorated (no "[info] " prefix).
//  2. showSuccess=false suppresses the "[success]" epilogue so Bench's
//     final println really is the last line of the stream.
// Belt-and-braces, Bench also mirrors the compact total line to stderr
// as its very last action. tools/bench_tail_check.sh asserts the raw
// combined stream of a real `sbt "runMain graft.Bench"` ends in a line
// that json-parses to metric=="total".
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not by another setting, so
// the lintUnused pass can't see the usage (tools/bench_tail_check.sh
// proves it works: no [success] line in the raw stream).
Global / excludeLintKeys += showSuccess
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
)
