ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mirrorlakekustospark"
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
  // One-JVM multi-query suites (Bench: 260 plans ×3, ScaleBench: 41 ×2
  // scales) generate far more compiled code than the 240 MB default cache
  // holds; once it fills, UseCodeCacheFlushing evicts nondeterministically
  // and late-suite queries run partially uncompiled — the r12 embed_kmeans
  // 143% SF10 spread (adjudicated via tools.KmeansProfile: cold-code rep
  // 11 s vs 4.1 s steady, GC and task balance ruled out). Reserved, not
  // committed, so tests pay nothing for it.
  "-XX:ReservedCodeCacheSize=512m",
)
