ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hashdbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// All suites share one SparkSession in one forked JVM; running them as
// parallel threads stacks concurrent Spark jobs' memory peaks (observed
// OOM in the last suite to run). Spark parallelizes within a job anyway.
Test / parallelExecution := false
run / fork := true
// Pass the forked process's stdout through VERBATIM (no "[info] " logger
// prefix) so Bench's single JSON result line stays machine-parseable.
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
  // 16g default: local[$cpus] runs driver + every executor task slot in
  // THIS one JVM, so the heap is the whole cluster's unified memory. At
  // 32 concurrent tasks, 8g left ~2.3g of protected storage + ~2.3g of
  // execution for 32 shuffling tasks — a full bench session was measured
  // GC-thrashing its tail queries 2-4x slower (see OPTIMIZATION_r16.md,
  // "suite-state regression"); 16g on a 128 GiB box removes it. Still
  // env-overridable for smaller machines.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
