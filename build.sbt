ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "adguard2clickhousespark"
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
)
// Split the test board into PARALLEL forked JVMs (optimization r17 /
// VERDICT r16 task 2): the whole 89-suite board previously ran
// sequentially in ONE forked JVM whose shared SparkTestBase session is
// local[2] — >60 min wall on an idle 32-core box, long enough for a
// busy driver host to kill the gate mid-suite (the r16 spawn-helper
// SIGTERM shape), and 55k+ tasks through one JVM. Suites group
// deterministically by name hash; each group forks its own JVM (own
// SparkSession, own temp dirs), so suite isolation only gets STRONGER —
// the wall divides by the group count and no JVM accumulates the whole
// board's task/heap history. SPARK_GRAFT_TEST_JVMS tunes it (1 restores
// the old single-JVM run).
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val groups = sys.env.getOrElse("SPARK_GRAFT_TEST_JVMS", "8").toInt
  tests.groupBy(t => java.lang.Math.floorMod(t.name.hashCode, groups)).toSeq
    .sortBy(_._1).map { case (i, ts) =>
      Tests.Group(s"g$i", ts,
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup,
    sys.env.getOrElse("SPARK_GRAFT_TEST_JVMS", "8").toInt))
