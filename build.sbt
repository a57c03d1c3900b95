ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pythonminervaetlspark"
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
// Pass the forked main's stdout through RAW instead of relogging it
// with an "[info] " prefix: the driver parses Bench's JSON lines from
// captured sbt output, and a prefixed line is not valid JSON — both
// r17 and r18 round comparisons came back empty because of it
// (VERDICT r18 issue 1).
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
// Heap: measured on this box (local[32], sf0.1), the SAME query runs
// 10–25× slower at -Xmx89g than at 4–31g (e.g. d02: 112 s vs 4.4 s;
// uniform slowdown across all 32 tasks, ~0 GC time). Whatever the JVM
// micro-cause, huge heaps are a measured pathology for this workload,
// so the configured driver memory is clamped to 31g — also keeping
// CompressedOops. sf0.1 needs ~2 GB; Spark spills beyond memory anyway.
val driverMem: String = {
  val cfg = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
  val gb = "^(\\d+)[gG]$".r
  cfg match {
    case gb(n) if n.toInt > 31 => "31g"
    case _ => cfg
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
  // 32 codegen-hungry worker threads vs the default ~3 C2 compiler
  // threads: hot generated iterators can sit uncompiled for whole
  // stages. More compiler threads + code-cache headroom keep
  // multi-query sessions JIT-stable.
  "-XX:CICompilerCount=12",
  "-XX:ReservedCodeCacheSize=512m",
)
