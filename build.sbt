ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mongodbetlmigrationspark"
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
// The bench/verify harness parses the forked main's stdout: pass it through
// verbatim (no "[info] " prefix) and drop the "[success] Total time" trailer
// so the last stdout line IS the bench JSON.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 32 task threads decompressing parquet through JNI critical sections
  // (zstd/snappy GetPrimitiveArrayCritical) can block GC long enough that
  // an allocation exhausts JDK 17's default 2 GCLocker retries and throws
  // a SPURIOUS "Java heap space" with free heap — observed as warm-pass
  // q45 at 100x dying on "Retried waiting for GCLocker too often
  // allocating 3 words" (a 24-byte allocation cannot fail on a non-full
  // heap unless GC is locked out). JDK-8192647; fixed-by-design in
  // JDK 22+ region pinning. Until then, retry harder.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
)
