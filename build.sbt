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
// The forked heap MUST match the configuration every BASELINE.md floor
// was measured at (48 GiB, -Xms=-Xmx, host has 128 GiB): the round-8
// graded pass ran at the old 8g default and landed at ~2× the floor
// with family-clustered GC inflations — the gate and the floors have to
// measure the same thing. SPARK_DRIVER_MEM overrides for small hosts.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // pre-size the heap so allocation-heavy stages (the 28-rule regex
  // transform) don't pay heap-growth GC pauses mid-measurement
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
