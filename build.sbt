ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mbcrdbcdcdlgen2synapsespark"
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
// Suites share one SparkSession, and several tests legitimately mutate
// session confs (broadcast thresholds for the skew/bucketing gates,
// codegen CODEGEN_ONLY, parquet nanos flags) with restore-in-finally.
// Under parallel suite execution those windows race against the
// plan-shape gates in OTHER suites (a q206 plan built while the skew
// test holds autoBroadcastJoinThreshold=-1 loses its broadcasts and
// trips the no-SMJ assert — observed round 17). Suites run serially;
// each already saturates the local[32] session on its own.
Test / parallelExecution := false
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
  // 32 executor threads × shuffle/sort/codegen buffers need headroom;
  // 8g showed 2-3× run-to-run variance from GC at sf0.1.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // A 242-key bench suite JIT-compiles thousands of whole-stage-
  // codegen classes; the JVM's default 240 MB reserved code cache can
  // force flushing/recompilation churn late in the suite. Tested as a
  // hypothesis for the in-suite-vs-solo 2x premium on driver-bound
  // keys: same-day A/B full recordings read 358.1 vs 369.2 gross
  // seconds — the premium is host whipsaw, not code-cache churn.
  // Kept anyway: the reservation is virtual address space (committed
  // only as used) and removes one confound from future recordings.
  "-XX:ReservedCodeCacheSize=2g",
)
