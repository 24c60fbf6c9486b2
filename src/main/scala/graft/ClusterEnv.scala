package graft

import java.nio.file.{Files, Path, Paths}

/** SPARK_HOME skeleton for `local-cluster[...]` masters.
  *
  * local-cluster workers spawn REAL executor JVMs through the
  * standalone launcher, which resolves SPARK_HOME for the executor
  * command line and scratch dirs. The build points SPARK_HOME at
  * `target/spark-home` (build.sbt) so nothing is ever written into the
  * read-only Spark distribution; this object materializes the skeleton
  * the launcher's distribution check needs (`RELEASE` marker + `conf/`
  * + a `jars` symlink to the real distribution jars).
  *
  * The jars source is derived from THIS JVM's classpath — the
  * directory holding the spark-core jar sbt mounted — not a hardcoded
  * machine path (ADVICE r10), so the skeleton is valid wherever the
  * build itself is valid. Idempotent and safe under concurrent
  * creation (two forked JVMs racing only see already-exists).
  */
object ClusterEnv {

  /** Directory holding the Spark distribution jars on this JVM's
    * classpath (build.sbt's `unmanagedBase` mount).
    */
  def sparkJarsDir(): Path =
    System.getProperty("java.class.path")
      .split(java.io.File.pathSeparatorChar)
      .find(p => p.endsWith(".jar") &&
        Paths.get(p).getFileName.toString.startsWith("spark-core_"))
      .map(p => Paths.get(p).toAbsolutePath.getParent)
      .getOrElse(sys.error(
        "spark-core_*.jar not found on java.class.path — cannot derive " +
          "a SPARK_HOME jars dir for local-cluster executors"))

  /** Materialize the skeleton iff SPARK_HOME points at the build's
    * repo-local location; a real distribution SPARK_HOME is left
    * untouched.
    */
  def ensureSparkHomeSkeleton(): Unit = {
    val home = Paths.get(sys.env.getOrElse("SPARK_HOME", ""))
    if (home.toString.endsWith("target/spark-home")) {
      Files.createDirectories(home.resolve("conf"))
      try Files.createFile(home.resolve("RELEASE"))
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      val jars = home.resolve("jars")
      val target = sparkJarsDir()
      // NOFOLLOW (ADVICE r11): exists() follows the link, so a stale
      // dangling symlink reads as absent (create then throws) and a
      // stale-but-resolvable one silently keeps the wrong jars.
      if (Files.isSymbolicLink(jars) &&
          Files.readSymbolicLink(jars) != target)
        try Files.delete(jars)
        catch { case _: java.nio.file.NoSuchFileException => () }
      if (!Files.exists(jars, java.nio.file.LinkOption.NOFOLLOW_LINKS))
        try Files.createSymbolicLink(jars, target)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
  }
}
