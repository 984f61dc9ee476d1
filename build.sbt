ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "elt_gluepipelinespark"
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
// Forked `run`/`runMain` output goes RAW to this process's stdout/stderr —
// no "[info] "/"[error] " logger prefixes. The graded bench contract is
// "the LAST stdout line is one compact JSON object"; through sbt's default
// logger every line arrived as `[info] {...}` and the driver's parser
// failed on it (BENCH_r01–r10 all `"parsed": null`). StdoutOutput inherits
// the child's streams, so the JSON line lands verbatim.
outputStrategy := Some(StdoutOutput)
// ...and nothing may print AFTER it: the `[success] Total time: ...`
// banner would otherwise become the new last line of an `sbt runMain`
// invocation.
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not by a task — exclude
// it from the unused-key lint so `compile` output stays warning-free.
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
// Forked heap: 16 GiB -Xms=-Xmx, pre-touched — the round-10 floor config.
// History: round 8 ran 8g and showed "GC-like" inflations; round 9 moved to
// 48g on a heap theory its own forensics later disproved; round 10 found
// the REAL mechanism with JFR: this VM's first-touch page faulting is
// pathologically slow and super-linear in heap size (8g=1s, 16g=14s,
// 48g=232s wall just to fault the heap), and WITHOUT -XX:+AlwaysPreTouch
// that cost lands inside measure windows as G1 marches through fresh
// regions — kernel time charged to whichever task thread first touches
// each region: the recorded "multi-10 s stall, zero GC, clean calibration"
// signature. 16g + pre-touch pays ~14 s at JVM start, outside every
// window; the 48g heap made the tax 25× bigger for zero GC benefit at
// gate scale. SPARK_DRIVER_MEM overrides for small hosts.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // pre-size the heap so allocation-heavy stages (the 28-rule regex
  // transform) don't pay heap-growth GC pauses mid-measurement
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+AlwaysPreTouch",
)
