ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "brooklinspark"
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
// The forked run's stdout must reach the caller UNPREFIXED: the bench
// harness captures `sbt "runMain graft.Bench"` stdout and parses the
// final JSON line, and sbt's default logger turns every forked stdout
// line into "[info] {...}", which breaks that parse (BENCH_r01–r21 all
// carry "parsed": null for exactly this reason). StdoutOutput inherits
// the parent's stdout/stderr directly — the JSON line lands verbatim.
run / outputStrategy := Some(StdoutOutput)
// Durable per-test reporting for full-battery runs: every test's name,
// duration, and failure lands in target/test-reports/*.xml (plus
// durations on stdout), so a once-per-battery flake identifies ITSELF
// instead of needing a re-run to chase it.
Test / testOptions ++= Seq(
  Tests.Argument(TestFrameworks.ScalaTest, "-oD"),
  Tests.Argument(TestFrameworks.ScalaTest, "-u", "target/test-reports"),
)
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
)
