ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parquetmergerspark"
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
// The driver parses Bench's single JSON stdout line; sbt's default
// LoggedOutput prefixes forked output with "[info] " which breaks a
// strict json parse. Stream the forked process's output through raw.
run / outputStrategy := Some(StdoutOutput)
// ...and sbt's closing "[success] Total time: ..." line still lands
// AFTER the JSON, so a parser that reads the LAST stdout line sees the
// success banner instead of the payload (BENCH_r02 "parsed": null).
// Suppress the banner entirely: the JSON line is then the final line.
Global / showSuccess := false
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
  // pin the JVM zone too: java.sql.Timestamp/Date literals in tests are
  // built in the default zone and must agree with the UTC session
  "-Duser.timezone=UTC",
  // local[N] runs driver + all executors in ONE JVM: the heap must
  // hold N concurrent tasks' operator buffers PLUS the storage pool
  // (Pin persists, loop checkpoints). 8g on a 32-core/128 GiB box kept
  // old-gen at 99% with the storage pool evicting mid-query — measured
  // full-registry bench: 285.8s at 8g vs 247.3s at 24g, with the 8g
  // run's worst per-query spikes (dd20 12.2s vs 2.1s) caused by
  // storage eviction, not compute. Production-cluster analog: size
  // executor memory to cores x per-task working set; here that is
  // 30 tasks x ~0.5g + storage headroom. Override via SPARK_DRIVER_MEM
  // for smaller boxes.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // ~110 queries × whole-stage-codegen classes overflow the default
  // 240m code cache mid-bench; the JIT then silently disables itself
  // and every later query runs interpreted (the r2 tail queries showed
  // 4-10x slowdowns vs the same queries run in isolation).
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("GRAFT_EXTRA_JVM_OPTS").toSeq.flatMap(_.split("\\s+").toSeq)
