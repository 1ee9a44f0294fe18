ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "venaetltoolspark"
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
// Pass the forked program's stdout straight through instead of routing
// it through sbt's logger: the benchmark/verify harness parses stdout
// for a bare JSON line, and the logger's "[info] " prefix breaks that.
Compile / run / outputStrategy := Some(StdoutOutput)
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
// Heap stays at 8g deliberately (r18, guide §5): an -Xms24g/-Xmx24g
// experiment on this 128 GiB box made the parallel kernels 20-30×
// MORE cpu-expensive — a huge G1 eden turns every allocation path
// into cold-page traffic (first-touch zeroing billed to task CPU) —
// while at 8g the working set stays cache/TLB-warm. The GC pressure
// the r18 Spread floor exposed was fixed where it belonged, in the
// kernels' allocation rate, not by growing the heap.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ sys.env.get("EXTRA_JVM_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
