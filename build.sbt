ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hadoopprojectspark"
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
// The bench/verify harness parses ONE JSON line from the `sbt runMain`
// output: send the forked process's stdout through unprefixed (no sbt
// `[info] ` decoration) and drop the trailing `[success]` banner so the
// JSON line is clean and last.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
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
  // Whole-stage codegen emits one large Java method per stage; HotSpot's
  // default DontCompileHugeMethods refuses to JIT methods over 8 KB of
  // bytecode, so a deep codegen span (e.g. the 16-level Hilbert chain)
  // silently runs INTERPRETED — measured 5x on that scan stage (r19).
  // Standard practice for codegen-heavy Spark: let C2 compile them.
  "-XX:-DontCompileHugeMethods",
  // A 393-query session JIT-compiles thousands of generated classes; the
  // default 240 MB code cache fills mid-run, HotSpot stops compiling, and
  // every later query runs interpreted (the "slow only in the full run"
  // inflation measured in r19). 512 MB keeps the compiler on for the
  // whole surface.
  "-XX:ReservedCodeCacheSize=512m",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+"))
