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

  /** Build `$SPARK_HOME/jars-cp-<hash>` as symlinks to every jar on
    * the classpath. The farm dir is keyed by a hash of the classpath
    * string, so a DIFFERENT classpath (new jar versions, another
    * bg-jobs copy set) gets its own farm — links from one run are
    * never repointed or polluted by another, and a version bump can't
    * leave both old and new jar versions on an executor classpath.
    * Within one farm (same classpath string re-run), dangling links
    * are refreshed: bg-jobs copy dirs are deleted when their sbt job
    * ends, and the JVM's `-cp` wildcard expansion must never see a
    * dangling jar. The one shared mutable resource left is the `jars`
    * symlink itself: two CONCURRENT runs with different classpaths
    * would repoint it under each other — the same pre-existing
    * contract as the rest of the skeleton (one local-cluster run per
    * SPARK_HOME at a time).
    */
  private def materializeJarFarm(entries: Seq[Path]): Path = {
    val home = Paths.get(sys.env.getOrElse("SPARK_HOME", "target/spark-home"))
    val cpHash = java.lang.Integer.toHexString(
      entries.map(_.toString).mkString(":").hashCode)
    val farm = home.resolve(s"jars-cp-$cpHash")
    Files.createDirectories(farm)
    val jars = entries.filter(_.toString.endsWith(".jar"))
    // Two classpath jars with the same filename in different dirs must
    // not collapse to one link (last-wins would silently drop a jar
    // from the executor classpath) — disambiguate colliding basenames
    // with a short hash of the full path.
    val collides: Set[String] = jars.groupBy(_.getFileName.toString)
      .collect { case (name, js) if js.map(_.toString).distinct.size > 1 => name }
      .toSet
    jars.foreach { jar =>
      val base = jar.getFileName.toString
      val linkName =
        if (collides(base))
          "p" + java.lang.Integer.toHexString(jar.toString.hashCode)
            .replace('-', '_') + "-" + base
        else base
      val link = farm.resolve(linkName)
      val dangling = Files.isSymbolicLink(link) && !Files.exists(link)
      if (dangling ||
          (Files.isSymbolicLink(link) && Files.readSymbolicLink(link) != jar))
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
