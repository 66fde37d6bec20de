ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "anansispark"
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
// glibc retains freed large allocations in per-thread malloc arenas
// (default 8×cores = 256 arenas on this box); across the bench's many
// session restarts the freed off-heap pools linger as RSS and stack
// toward the container limit (observed: 118 GB anon-rss OOM kill with
// two 40 GB pools + heap). Four arenas bound the retention without
// measurable contention for Spark's MB-sized off-heap allocations.
Test / envVars += "MALLOC_ARENA_MAX" -> "4"
run / envVars += "MALLOC_ARENA_MAX" -> "4"
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
  // 56g: the bench's N=2M sweep needs headroom beyond the 40g off-heap
  // pool; tests run far below this (the JVM only commits what it uses).
  // Deliberately NO -Xms pin: A/B-measured on the same VM phase, a
  // 56g initial heap made the 32-thread sweep's GC 10-18× WORSE (9.97 s
  // vs 0.55 s on identical tiny sweeps — ParallelGC's huge young gen
  // pays page-commit/copy in early collections), far outweighing the
  // first-big-sweep growth cost it was meant to remove. Override for
  // experiments via SPARK_GRAFT_XMS.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "56g")}",
) ++ sys.env.get("SPARK_GRAFT_XMS").map(x => s"-Xms$x").toSeq ++
  sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq
    .flatMap(_.split(" ").filter(_.nonEmpty)) ++ Seq(
  // Throughput collector: the crawl sweep is an allocation-heavy batch
  // workload; G1 spent 25% of a 32-thread 2M-URL sweep in GC pauses,
  // ParallelGC cuts that ~3x (measured: 41.6s -> 12.0s GC on the same
  // sweep) and lifts peak throughput ~25%.
  "-XX:+UseParallelGC",
)
