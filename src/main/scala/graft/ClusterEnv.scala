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
  *
  * Classpath-layout hazard (r12): when a main runs through the sbt
  * server's bgRun path, sbt COPIES every classpath jar into its own
  * `target/bg-jobs/...` hash directory — spark-core's parent then
  * holds exactly one jar, and pointing `jars` at it hands executors a
  * classpath with no spark-sql/catalyst/common-utils, which
  * crash-loops the worker (thousands of relaunch dirs, no progress).
  * [[sparkJarsDir]] therefore VALIDATES the candidate actually holds
  * the distribution side by side, and falls back to materializing a
  * link farm of every classpath jar under SPARK_HOME when it doesn't.
  */
object ClusterEnv {

  private def classpathEntries(): Seq[Path] =
    System.getProperty("java.class.path")
      .split(java.io.File.pathSeparatorChar)
      .iterator.filter(_.nonEmpty)
      .map(p => Paths.get(p).toAbsolutePath).toSeq

  /** The dir holds the distribution iff the core runtime jars sit
    * side by side — spark-core alone is NOT enough (see header).
    */
  private def isDistDir(dir: Path): Boolean = {
    val names = Option(dir.toFile.list()).map(_.toSet).getOrElse(Set.empty[String])
    Seq("spark-core_", "spark-sql_", "spark-catalyst_")
      .forall(p => names.exists(_.startsWith(p)))
  }

  /** Directory holding the Spark distribution jars, derived from this
    * JVM's classpath: the validated parent of a spark-core jar, or —
    * when every jar lives in its own copy dir (sbt bgRun) — a link
    * farm of ALL classpath jars materialized under SPARK_HOME.
    */
  def sparkJarsDir(): Path = {
    val entries = classpathEntries()
    val coreParents = entries
      .filter(p => p.getFileName != null &&
        p.getFileName.toString.startsWith("spark-core_") &&
        p.toString.endsWith(".jar"))
      .map(_.getParent)
    coreParents.find(isDistDir).getOrElse {
      if (coreParents.isEmpty) sys.error(
        "spark-core_*.jar not found on java.class.path — cannot derive " +
          "a SPARK_HOME jars dir for local-cluster executors")
      materializeJarFarm(entries)
    }
  }

  /** Build `$SPARK_HOME/jars-cp` as symlinks to every jar on the
    * classpath. Rebuilt from scratch on each call: bg-jobs copy dirs
    * are deleted when their sbt job ends, so links from a previous
    * run may dangle — and the JVM's `-cp` wildcard expansion must
    * never see a dangling jar. Concurrent rebuild races are guarded the
    * same way as the skeleton itself (best effort, both writers link
    * the same filenames to equivalent jars).
    */
  private def materializeJarFarm(entries: Seq[Path]): Path = {
    val home = Paths.get(sys.env.getOrElse("SPARK_HOME", "target/spark-home"))
    val farm = home.resolve("jars-cp")
    Files.createDirectories(farm)
    Option(farm.toFile.listFiles()).getOrElse(Array.empty).foreach { f =>
      val p = f.toPath
      val stale = Files.isSymbolicLink(p) &&
        !Files.exists(p) // dangling: bg-jobs dir of a finished job
      if (stale)
        try Files.delete(p)
        catch { case _: java.nio.file.NoSuchFileException => () }
    }
    entries.filter(_.toString.endsWith(".jar")).foreach { jar =>
      val link = farm.resolve(jar.getFileName.toString)
      if (Files.isSymbolicLink(link) && Files.readSymbolicLink(link) != jar)
        try Files.delete(link)
        catch { case _: java.nio.file.NoSuchFileException => () }
      if (!Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
        try Files.createSymbolicLink(link, jar)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    farm
  }

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
