ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparktimeseriesspark"
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
// Forked run output must NOT go through sbt's logger: the logger prefixes
// every stdout line with "[info] ", which breaks machine parsing of
// Bench/Verify's one-line JSON (every BENCH_r{1..5} artifact shows
// "parsed": null). StdoutOutput passes the child's stdout/stderr through
// verbatim.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 150+ benched queries generate enough whole-stage-codegen classes to fill
  // the default ~240m code cache; once it fills the JIT disables and late
  // CPU-bound kernels run interpreted (m16 benched 28s in-suite vs 2.4s
  // isolated). 512m moved the cliff but BENCH_r07 still showed the m-block
  // 4-9x slower mid-suite with later blocks recovering — the signature of a
  // code-cache flush storm, not permanent exhaustion. 1g + explicit
  // flushing (+ Bench's untimed per-block System.gc() unloading evicted
  // codegen classes) keeps the compiler on for the whole suite.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
