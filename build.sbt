ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "decisiontreeanalyticsspark"
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
// The bench driver tail-parses stdout for Bench's one-line metric JSON.
// Three things normally land AFTER or AROUND that line and break a
// last-line parse; disable all of them:
//  - forked-process output is re-logged with an "[info] " prefix unless
//    the output strategy is raw stdout passthrough;
//  - "[success] Total time: ..." is printed after the task;
//  - the timing suffix on that line.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / showTiming := false
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
// Pre-commit and pre-touch the baseline heap: with the default lazy
// -Xms, heap growth (commit + page faults) lands inside whichever
// queries allocate hardest first — the r5 driver-harness bench showed
// a median per-query ratio of 1.01 vs a local same-HEAD run but 4x+
// outliers concentrated in exactly the alloc-heavy queries, the
// signature of first-touch stalls under host memory pressure, not of
// plan regressions. Pre-touching moves that cost to JVM startup
// (untimed). Capped at 8g so a huge SPARK_DRIVER_MEM doesn't spend
// minutes pre-touching pages the run never needs.
val graftDriverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
val graftXms = "^([0-9]+)[gG]$".r.findFirstMatchIn(graftDriverMem) match {
  case Some(m) if m.group(1).toInt >= 8 => "8g"
  case _ => graftDriverMem
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Pin the JVM default too: java.sql.Timestamp literals in specs and
  // window-start rendering go through user.timezone, not the session
  // conf — on a non-UTC host they would shift cross-day groupings.
  "-Duser.timezone=UTC",
  s"-Xmx$graftDriverMem",
  s"-Xms$graftXms",
  "-XX:+AlwaysPreTouch",
)
