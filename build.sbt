ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "market_analyze_data_stream_processingspark"
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
// Forked `run` output normally routes through sbt's logger, which prefixes
// every line with "[info] " — that breaks any consumer parsing Bench's
// final JSON line from the process output. StdoutOutput passes the forked
// JVM's stdout/stderr through verbatim.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 193 registry queries × whole-stage codegen fills the default 240 MB
  // JIT code cache; once it overflows, the JVM flushes compiled methods
  // and the Bench/Verify tail re-JITs inside timed regions — measured as
  // broad 2-3× elevation of late-suite queries with unchanged plans.
  // 512m was sized at 166 queries (r6); the r8 driver bench showed the
  // same late-suite signature again at 193 queries + new native
  // expressions, so the reserve is doubled and Bench now reports the
  // pools' peak usage in its detail line (code_cache_peak_mb) so the
  // headroom is measured, not guessed.
  "-XX:ReservedCodeCacheSize=1g",
)
