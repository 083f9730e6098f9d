ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "boletiakuberneteskafkamongodbspark"
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
// The bench/driver contract requires the ONE JSON line printed by
// graft.Bench to be the LAST stdout line of `sbt "runMain graft.Bench"`.
// sbt's default `[success] Total time: ...` epilogue lands AFTER the
// forked JVM's output and broke the driver's last-line parse two rounds
// running (BENCH_r16/BENCH_r17 `parsed: null`). Suppressing the success
// banner makes the bench's own println the final line; failures still
// print `[error]` lines and a nonzero exit code.
Global / showSuccess := false
// (showSuccess is consumed by sbt's command engine, not by another
// setting — exclude it from the false-positive unused-key lint)
Global / excludeLintKeys += showSuccess
// ... and the forked run's stdout must pass through UNWRAPPED: the
// default output strategy routes it through sbt's logger, which stamps
// every line with an `[info] ` prefix that would equally defeat a
// strict JSON parse of the last line.
run / connectInput := false
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
)
