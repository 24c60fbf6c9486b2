ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dynamicsparkspark"
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
// Forked `run` output goes straight to this process's stdout/stderr,
// NOT through sbt's logger: the driver's bench parser needs the Bench
// JSON line bare, not wrapped in "[info] ".
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// suites share one local SparkSession; tests that toggle session confs
// (broadcast threshold, analyzer flags) must not race concurrent
// streaming/analysis in other suites
Test / parallelExecution := false
// ClusterDynamicSpec boots local-cluster[2,1,1024] (real separate
// executor JVMs). Its workers resolve SPARK_HOME for executor work
// dirs and the launcher classpath — point it at a repo-local skeleton
// (jars symlinked to /opt/spark/jars, created by the spec) so nothing
// is ever written into the read-only /opt/spark distribution.
Test / envVars ++= Map(
  "SPARK_HOME" ->
    (baseDirectory.value / "target" / "spark-home").getAbsolutePath,
  // the launcher's executor-command builder derives the Scala version
  // from SPARK_HOME build dirs unless told — the skeleton has none
  "SPARK_SCALA_VERSION" -> "2.13",
)
// graft.ClusterVerify (the cluster-parity sweep) boots the same
// local-cluster master from `runMain` — same repo-local SPARK_HOME.
// Harmless for the local[*] mains (Bench/Verify): local mode never
// launches workers, and the skeleton is a valid mini-distribution
// (RELEASE + conf/ + the real jars) for anything that does resolve it.
run / envVars ++= Map(
  "SPARK_HOME" ->
    (baseDirectory.value / "target" / "spark-home").getAbsolutePath,
  "SPARK_SCALA_VERSION" -> "2.13",
)
// Materialize the skeleton from the BUILD, before any forked test JVM
// starts (ADVICE r10: the env var above used to point every suite at a
// dir only ClusterDynamicSpec created, with a machine-specific jars
// path hardcoded in test code). The jars symlink targets unmanagedBase
// — the same mount the classpath itself comes from. Runtime code paths
// (graft.ClusterEnv) keep an idempotent classpath-derived fallback for
// JVMs not launched through sbt.
Test / testOptions += {
  val home = (baseDirectory.value / "target" / "spark-home")
  val jarsSource = unmanagedBase.value
  Tests.Setup { () =>
    IO.createDirectory(home / "conf")
    IO.touch(home / "RELEASE")
    val link = (home / "jars").toPath
    val target = jarsSource.toPath
    // NOFOLLOW (ADVICE r11): plain exists() FOLLOWS the link, so a
    // stale dangling symlink reads as absent and createSymbolicLink
    // throws FileAlreadyExists; a stale-but-resolvable one would be
    // silently kept pointing at the wrong jars. Re-point on mismatch.
    // The catches mirror graft.ClusterEnv: two sbt JVMs running this
    // setup concurrently can race delete-vs-delete and create-vs-create.
    if (java.nio.file.Files.isSymbolicLink(link) &&
        java.nio.file.Files.readSymbolicLink(link) != target)
      try java.nio.file.Files.delete(link)
      catch { case _: java.nio.file.NoSuchFileException => () }
    if (!java.nio.file.Files.exists(link,
        java.nio.file.LinkOption.NOFOLLOW_LINKS))
      try java.nio.file.Files.createSymbolicLink(link, target)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
  }
}
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
  // local-mode Spark = everything in the driver heap; 32 shuffle
  // threads over multi-10M-row joins GC-thrash in 8g (the machine has
  // 128g)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
