ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "benchmarkspark"
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
// Forked-run output goes RAW to sbt's stdout instead of through the sbt
// logger: the driver parses the bench's one-line JSON records from stdout,
// and the default LoggedOutput prefixes every child line with "[info] ",
// which defeats line-level JSON parsing (PERF parsed:null since r14 —
// r17 verdict #2). Program stdout is the data channel; sbt's own [info]
// build lines are unaffected.
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
  // Whole-stage-codegen class cache (STATIC conf, so it must be set before
  // the session exists — a -D reaches every entry point). The default LRU
  // holds 100 generated classes; this suite compiles ~1000+ distinct
  // codegen units per sweep (262 queries x several stages), so at the
  // default EVERY trial re-runs janino on every stage — pure fixed-cost
  // driver work (r17 verdict #9's ~0.25 s/key tail). Scale-neutral: the
  // cache is per-JVM compilation state, not data- or core-count-dependent.
  s"-Dspark.sql.codegen.cache.maxEntries=${sys.env.getOrElse("SPARK_CODEGEN_CACHE", "5000")}",
  // local[32] runs the whole executor fleet in this one JVM: 32 concurrent
  // tasks × multi-MB aggregation maps need real heap, and 8g was measured
  // spilling (and GC-stalling neighbor queries) on the 13M-pair x68
  // aggregate. The test/driver box has 128 GiB; 16g is still conservative.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
