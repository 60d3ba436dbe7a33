ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "betfairdatabasespark"
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
// Pass the forked JVM's stdout straight through: the driver parses Bench's
// one-line JSON from stdout, and sbt's default LoggedOutput would prefix it
// with "[info] ", breaking the parse.
run / outputStrategy := Some(StdoutOutput)
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
  // local[32] runs 32 concurrent tasks in one JVM: an 8g heap intermittently
  // hit multi-second full-GC stalls mid-query (observed as a 17s outlier on
  // an otherwise-1s query); 24g on the 128 GiB box keeps timings stable
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // pin the INITIAL heap to the max and pre-touch it: the round-17
  // variance study measured CV 8.6% across five same-code bench runs
  // with total time tracking GC time (the slowest run carried 2.1x the
  // GC of the fastest) — G1's adaptive heap sizing grows the heap from
  // a small -Xms under load, and WHERE each run's growth/ergonomics
  // decisions land is the run-to-run noise. A fixed, pre-touched heap
  // removes the resizing dimension entirely (study: scripts/variance;
  // pinned re-run: scripts/variance_pinned; PLANS.md round-17)
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
)
