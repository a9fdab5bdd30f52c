ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cdcstreambatchetlspark"
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
// Forked run output goes straight to stdout, NOT through the sbt logger —
// the driver parses Bench's one-line JSON and the "[info] " prefix broke it.
run / outputStrategy := Some(StdoutOutput)
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
  // 24g default: the full bench runs 48 queries × 3 in one JVM at
  // local[32]; at 8g the old-gen fills over the run and later queries'
  // medians inflated 3-5× from GC (the container has 128 GiB).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // The JIT code cache is the other unbounded-growth JVM resource in a
  // 138-query × 4-execution whole-stage-codegen bench: the 240 MB default
  // fills mid-run, HotSpot silently stops compiling, and later queries
  // run interpreted (round-7 example: product_rollup_windowed recorded
  // 9.0 s in the full bench vs 0.92 s isolated, code unchanged; raised
  // 512m → 1g in round 10 when the suite hit 138 queries and ann_pq_top1
  // ran ~2× slower in-suite than isolated).
  "-XX:ReservedCodeCacheSize=1g",
  // GC log per forked JVM (pid-keyed, under target/ so it never lands in
  // git): the r9 bench artifact (product_performance 3→39→47 s within one
  // run) is a heap/GC-or-accretion class diagnosis — this makes the next
  // occurrence directly attributable from the log instead of inferred.
  "-Xlog:gc*:file=target/gc-%p.log:time,uptime",
)
