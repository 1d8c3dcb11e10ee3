ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "deltalakedatafusionspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
scalacOptions ++= Seq("-deprecation")
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Driver bench contract (r17): the forked run's stdout must reach the
// parent UNPREFIXED — sbt's default LoggedOutput decorates every line
// with "[info] ", which broke the driver's JSON parse of the bench
// headline in rounds 1-16 (BENCH_rNN.json: parsed=null throughout).
run / outputStrategy := Some(StdoutOutput)
// ... and the headline must be the LAST stdout line: sbt's
// "[success] Total time: ..." banner otherwise lands after it inside
// the driver's tail buffer.
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not by a task — the
// unused-key lint can't see that
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
)
