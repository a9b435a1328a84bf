ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "walmartecommercesalesdatapipelinespark"
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
// Route forked run output straight to stdout, bypassing sbt's logger —
// the driver parses graft.Bench's JSON line from stdout, and the default
// LoggedOutput strategy prefixes every line with "[info] ".
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

// Determinism CI: run the full Verify suite twice in FRESH forked JVMs
// and diff every query's logical output. Catches driver-run instability
// (nondeterministic reduction orders, unstable sorts) before the
// round's oracle compare does. `sbt verifyStable`; SPARK_GRAFT_SF_DIR
// picks the scale (default sf0.01 — the driver's own gate scale).
lazy val verifyStable = taskKey[Unit](
  "Run graft.Verify twice in fresh JVMs and diff logical outputs")
val verifyStableSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
verifyStable := Def.sequential(
  (Compile / runMain).toTask(s" graft.Verify $verifyStableSf /tmp/graft_stab_a"),
  (Compile / runMain).toTask(s" graft.Verify $verifyStableSf /tmp/graft_stab_b"),
  Def.task {
    import scala.sys.process._
    val rc = Seq("python3", "scripts/diff_outputs.py",
      "/tmp/graft_stab_a", "/tmp/graft_stab_b").!
    if (rc != 0) sys.error("verifyStable: outputs differ between runs")
  }
).value
