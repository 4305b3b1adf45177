ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "networkitspark"
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
// Pass the forked process's stdout through unprefixed — Bench/Verify emit
// machine-read JSON lines and sbt's logger would prepend "[info] ".
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
  // Bench/ScalingBench create ~20 fresh SparkSessions per JVM; each
  // session's whole-stage-codegen classes stay in the code cache, and once
  // the default 240 MB fills, the JIT stops compiling — measured as a
  // monotone 10-25% per-rep slowdown across ScalingBench reps. 1g removes
  // the cliff for every forked runMain (incl. the driver's bench run).
  "-XX:ReservedCodeCacheSize=1g",
  // 24g on the 128 GiB box: at 8g a local[32] PageRank over ~10M edges is
  // GC-bound (32 task threads × shuffle buffers + MEMORY_AND_DISK caches
  // churn the old gen); measured headroom removes that stall class.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// Tests run small fixtures on few cores — they don't need the bench box's
// 24g/1g defaults, and inheriting them hard-codes a 128 GiB machine into
// `sbt test` (strict-overcommit hosts could fail to fork). Override via
// SPARK_TEST_MEM when a spec genuinely needs more.
Test / javaOptions := jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  "-XX:ReservedCodeCacheSize=512m",
  s"-Xmx${sys.env.getOrElse("SPARK_TEST_MEM", "10g")}",
)
