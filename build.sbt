ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vinumspark"
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
// The per-round driver parses the LAST stdout line of `sbt runMain
// graft.Bench` as JSON. Two sbt default behaviors break that: forked-run
// stdout is re-logged with an "[info] " prefix, and sbt appends a
// "[success] Total time: ..." trailer after the run. Route forked output
// straight through (no prefix) and suppress the success banner so the
// bench's bare JSON line is genuinely the last thing on stdout.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // Whole-stage-codegen class cache (STATIC conf, so it must be set
  // before the first SparkSession). The default (100 entries) thrashes
  // on this plan-diverse workload: 420 distinct queries generate a few
  // thousand codegen units, so by the time a bench pass revisits a
  // query its generated classes have been evicted and Janino recompiles
  // them (tens of ms per unit, driver-side, serial). The value is
  // workload-sized, not host-sized: any driver running this suite —
  // local[8] or a 1000-executor cluster — wants the cache to hold one
  // suite's worth of fragments. Parameterised for A/B measurement.
  "-Dspark.sql.codegen.cache.maxEntries=" +
    sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8000"),
)
