ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mobilityduckspark"
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
// Forked run output goes straight to stdout, NOT through the sbt logger:
// the driver machine-parses Bench's one-line JSON and an "[info] " prefix
// breaks json.loads (BENCH_r01.json "parsed": null).
outputStrategy := Some(StdoutOutput)
run / connectInput := true
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
  // -Xms == -Xmx, and deliberately COMPACT (8g): this guest runs
  // virtio_balloon free-page reporting, so any page the guest frees is
  // discarded by the hypervisor and costs ~100µs/4k page to re-supply on
  // next touch (measured: 876 s of kernel time re-faulting 8 GB during
  // one query). A fixed-size heap is never reported free once touched,
  // and a compact one is fully materialized after HeapWarm.pretouch()
  // + one query — a 32g heap kept paying first-touch for the whole run
  // as G1 cycled eden across fresh regions (measured: 2x slower
  // steady-state on identical queries).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The bench JVM executes ~380 distinct codegen-heavy queries (125
  // gate entries x 2 passes + BerlinMOD + the scale blocks), each
  // producing Janino-compiled whole-stage classes; the JDK17 default
  // 240 MB code cache forces the flushing sweeper to evict warm
  // methods under that load. 1 GB is the standard headroom for a
  // long-lived many-query Spark JVM (driver or executor) and removes
  // the sweeper from the measurement entirely.
  "-XX:ReservedCodeCacheSize=1g",
)
