ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kp_data_pipelinesspark"
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
  // the box has 128 GiB; 8g starved the single-JVM bench once per-query
  // caches accumulated (GC spikes on whichever query ran late)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // 60 whole-stage-codegen queries in one JVM overflow the default
  // 240m reserved code cache; when it fills, JIT compilation stalls and
  // random queries show 3-4x spikes (measured: bench total 55→77s with
  // a rotating outlier). 512m keeps every generated class compiled.
  "-XX:ReservedCodeCacheSize=512m",
  // G1's GCLocker allocation retry defaults to 2: under a small heap
  // with heavy spill, 32 executor threads allocating while lz4/snappy
  // JNI critical sections hold the GCLocker hit "Retried waiting for
  // GCLocker too often" and throw a SPURIOUS OutOfMemoryError with
  // free heap available (JDK-8137099 family — observed: the sf10
  // full-surface run at -Xmx8g died in q_salted_join's shuffle write
  // allocating 8 WORDS). More retries just wait for the pending GC;
  // no effect on measurements or large-heap runs. (Diagnostic VM
  // option — the unlock flag must precede it.)
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
)
