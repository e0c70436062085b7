ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "adtspark"
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
// The driver parses the LAST stdout line of `sbt -batch "runMain
// graft.Bench"` as JSON. Two things used to break that: the forked
// program's stdout was routed through sbt's logger (prefixing every
// line with "[info] "), and sbt printed "[success] Total time: …"
// AFTER the program's final line. StdoutOutput passes program output
// through verbatim; showSuccess drops the trailing banner, so the
// bench's compact JSON line is genuinely last and unprefixed.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys ++= Set(showSuccess, run / outputStrategy)
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
  // local[32] runs the driver+executors in one JVM; 8g old-gen fills up
  // over a 100-query bench session (the late-alphabet queries showed
  // 2-20x GC-pressure noise three driver rounds running). The box has
  // 128 GiB; give the single JVM a real executor-sized heap.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
  // ~100 queries × whole-stage-codegen classes approach the default
  // 240m JIT code cache; when it fills, HotSpot silently stops
  // compiling and late queries run interpreted.
  "-XX:ReservedCodeCacheSize=512m",
)
