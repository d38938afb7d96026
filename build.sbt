ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parquetcompactorspark"
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
  // local[32] puts all 32 task threads in this one heap; 8g is enough
  // for any single query at sf0.1 but accumulates GC pressure across a
  // 69-query bench suite (suite timings ran 3-9x standalone ones).
  // The bench box has 128 GiB; size like an executor, not a driver.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
  // 111 queries x 3 passes of whole-stage codegen compile thousands of
  // generated classes; the default 240 MB JIT code cache fills mid-suite
  // and the JVM silently disables compilation — late/heavy queries then
  // run interpreted, 10-50x slower in-suite than in a fresh JVM (the
  // round-9 dedup_clusters 76s-in-suite vs 3.6s-isolated signature).
  // Size the cache for the suite and let flushing evict cold methods.
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+UseCodeCacheFlushing",
)
// The forked bench JVM's stdout must reach the driver's capture window as
// bare lines; sbt's default logger prefixes every line with "[info] ",
// which defeats the driver's JSON parse of the bench aggregate line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
