ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tveventstreamingspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
scalacOptions += "-deprecation"
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// OPTIONAL Kafka binding (stretch profile): spark-sql-kafka is not in
// /opt/spark/jars and nothing resolves online here, so the binding
// attaches as a second unmanaged-jars dir ONLY when the environment
// provides it. With GRAFT_KAFKA_JARS pointing at the connector +
// kafka-clients jars (and GRAFT_KAFKA_BOOTSTRAP at a broker),
// KafkaSourceContractSpec runs the binding-agnostic streaming-source
// contract unedited; unset — this image — the spec compiles against
// zero extra jars and cancels itself.
Test / unmanagedJars ++= sys.env.get("GRAFT_KAFKA_JARS")
  .map(d => (file(d) ** "*.jar").classpath.toSeq).getOrElse(Nil)
Test / fork := true
run / fork := true
// The bench driver captures a bounded TAIL of `sbt "runMain
// graft.Bench"` stdout and parses the LAST line as JSON. Two settings
// make that last line actually BE Bench's compact JSON: no "[success]
// Total time ..." epilogue after the forked run returns, and the
// forked JVM's stdout passed through raw instead of re-logged with
// "[info] " prefixes.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
run / outputStrategy := Some(StdoutOutput)
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
