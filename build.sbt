ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "feature_store_mlspark"
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
// Forked run output goes straight to this process's stdout/stderr instead
// of through sbt's logger — no "[info] " prefix mangling the one-line JSON
// contract of graft.Bench (round-1 driver bench recorded "parsed": null
// because the metric line arrived as "[info] {...}").
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and no "[success] Total time" trailer AFTER it: four rounds of bench
// artifacts carried "parsed": null because sbt's success summary was the
// last stdout line instead of the Bench JSON. Exit codes still signal
// failure; compile/test logging is unaffected.
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not a task — exempt it
// from the unused-key lint
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g: local[32] runs 32 concurrent tasks in ONE JVM — the heap is the
  // whole cluster's memory. At 8g the sf0.1 bench spent a measured ~30%
  // of wall-clock in GC stalls on the string-heavy document queries
  // (round-2 "documents-family 5-7x regression": 110.7s total; same
  // bench at 24g: 52.7s). A real deployment sizes executor memory per
  // core count for exactly this reason; the host has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
