ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bifrostspark"
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
// Pass the forked program's stdout through verbatim (no "[info] " line
// prefix) — the bench/verify harness parses a JSON line from stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[32] is one JVM acting as driver AND 32 executors: a 100+-query
  // run accumulates broadcasts/shuffle blocks faster than the
  // ContextCleaner's GC-triggered reclaim under a small heap, and the
  // session degrades into GC thrash mid-run. 16g on this 128 GiB box is
  // ~the per-executor memory a real cluster would give the same work.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // This host stalls the whole JVM for tens of seconds on lazy heap-page
  // allocation (observed: jstack attach timeouts while the machine is 93%
  // idle). Pre-touching the fixed-size heap at startup moves that cost to
  // JVM boot; concurrent explicit GC keeps Bench's per-query cleaner
  // drain from becoming a stop-the-world full collection.
  "-XX:+AlwaysPreTouch",
  "-XX:+ExplicitGCInvokesConcurrent",
)
