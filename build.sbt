ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "backuprepospark"
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
// Pass the forked JVM's stdout through UNWRAPPED: rounds 1 and 2 both show
// BENCH parsed:null because sbt's default logger prefixes every forked-output
// line with "[info] ", which breaks the driver's metric-line parser.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Forward sbt's stdin to the forked JVM so graft.Shell's readLine loop
// works both interactively and piped (`echo "...;" | sbt "runMain graft.Shell"`).
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
  // r20: 8g -> 16g default. The forked JVM is driver AND all 32 local
  // executor threads in one heap; at 8g the bench JVM spent ~5.5% of wall
  // in G1 (measured: 6.6s GC over a 121s heavy-subset run, 182ms max
  // pause) vs 4.1s at 16g — persist-heavy iterative queries (pagerank,
  // components) hit new all-time floors with the larger heap. The sandbox
  // has 128 GiB; env still overrides for constrained hosts.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split("\\s+")).filter(_.nonEmpty)
