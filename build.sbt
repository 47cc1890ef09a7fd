ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "miniloglakehousespark"
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
// Forked output goes straight to stdout, NOT through sbt's logger:
// the logger prefixes every line with "[info] ", which breaks any
// harness that parses the one-line JSON that graft.Bench prints.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 32 concurrent tasks over md5-heavy shingle pipelines allocate
  // fast; the host has 128 GiB — headroom keeps GC off the critical
  // path even when the host is contended
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Whole-stage codegen emits one generated class per plan stage; a run
  // of ~50 distinct queries fills the default 240m code cache, the JIT
  // shuts off, and CPU-bound queries degrade ~10x mid-run (measured:
  // d5 5.5s solo → 52s late in a bench pass; at 57 queries even 1g was
  // exhausted — whole-run degradation to 1042s total, any single query
  // warm-solo fine). Spark's compiled-class cache holds only 100 plans,
  // so a 57-query × 2-pass run recompiles codegen units mid-run and
  // needs JIT headroom for the recompiled code. Size both pools to the
  // JVM maximum (reserved virtual, committed on demand) and keep
  // flushing enabled so cold compiled code can be evicted.
  "-XX:ReservedCodeCacheSize=2047m", // JVM hard max is 2048m
  "-XX:+UseCodeCacheFlushing",
  "-XX:MaxMetaspaceSize=3g",
  // Whole-stage codegen emits HUGE methods (12-way min-agg, md5
  // chains); while C2 churns through its queue, query threads run
  // INTERPRETED at 10-30x (observed: the same warm query 3s or 60s
  // depending on whether the C2 thread was busy — thread-level CPU
  // sampling showed C2 CompilerThread as the only hot thread during
  // every slow episode). More compiler threads drain the queue
  // proportionally faster on a 32-core box.
  "-XX:CICompilerCount=12",
)
