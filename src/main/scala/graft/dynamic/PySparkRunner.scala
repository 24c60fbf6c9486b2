package graft.dynamic

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

/** Executes a self-contained PySpark program through `spark-submit`,
  * the reference's fourth plugin entry point (reference:
  * PySparkProgram.java:54-70 — "Executes user-provided PySpark
  * program"; docs/PySparkProgram-sparkprogram.md:21-48 shows the
  * contract: the user source creates its OWN `SparkContext()` and
  * drives its own IO, with optional extra .py/.zip/.egg libraries).
  *
  * Architecture note (Spark-first, not a port): the reference routes
  * the script through its platform's `setPySparkScript` runtime; this
  * engine launches the standard `spark-submit` from a real Spark
  * distribution on the host — the exact mechanism the reference's
  * Javadoc names — as a SUBPROCESS with its own short-lived driver
  * JVM. That isolation is deliberate: user Python owns its
  * SparkContext lifecycle (the documented contract includes
  * `sc.stop()`), which must never be able to tear down the host
  * engine's long-lived session. The cost is one driver-JVM boot per
  * program (~10 s, data-independent); programs exchange data with the
  * surrounding pipeline through storage (parquet paths in macros),
  * the same pattern the reference doc's `${input.path}` /
  * `${output.path}` example uses.
  *
  * On a real cluster the subprocess submits with whatever master the
  * caller passes (`master` property) — `local[*]` here only because
  * the sandbox has no cluster manager.
  */
object PySparkRunner {

  /** A usable Spark distribution: needs bin/spark-submit AND the
    * python client libs (python/lib/pyspark.zip). The engine's own
    * SPARK_HOME may point at the local-cluster jar-farm skeleton
    * (ClusterEnv), which carries neither — candidates are filtered by
    * capability, not trusted blindly.
    */
  lazy val sparkHome: Option[Path] = {
    val candidates = sys.env.get("SPARK_HOME").map(Paths.get(_)).toSeq :+
      Paths.get("/opt/spark")
    candidates.find { h =>
      Files.isExecutable(h.resolve("bin/spark-submit")) &&
        Files.exists(h.resolve("python/lib/pyspark.zip"))
    }
  }

  /** python3 resolved from PATH (spark-submit needs it for both the
    * driver script and executor-side python workers).
    */
  lazy val pythonExec: Option[String] =
    sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
      .iterator.map(d => Paths.get(d, "python3"))
      .find(Files.isExecutable(_)).map(_.toString)

  def available: Boolean = sparkHome.isDefined && pythonExec.isDefined

  def unavailableReason: String =
    (if (sparkHome.isEmpty)
      Seq("no Spark distribution with bin/spark-submit + python/lib/pyspark.zip " +
        "found (checked $SPARK_HOME and /opt/spark)") else Nil) ++
      (if (pythonExec.isEmpty) Seq("no python3 on PATH") else Nil) mkString "; "

  /** Deploy-time syntax check (the Python analogue of the Scala
    * stages' deployCompile): byte-compiles the source with the
    * stdlib's py_compile — no Spark involved, ~50 ms. Returns errors,
    * empty = clean.
    */
  def syntaxCheck(code: String): Seq[String] = pythonExec match {
    case None => Seq(s"pysparkProgram: $unavailableReason")
    case Some(py) =>
      val dir = Files.createTempDirectory("graft-pyc")
      try {
        val src = dir.resolve("program.py")
        Files.write(src, code.getBytes("UTF-8"))
        val pb = new ProcessBuilder(py, "-m", "py_compile", src.toString)
        // output to a FILE, never a pipe read before waitFor: reading
        // the stream to EOF would block forever on a wedged python and
        // make the 30 s timeout below unreachable (run() has the same
        // discipline)
        val outF = dir.resolve("pyc.log").toFile
        pb.redirectErrorStream(true)
        pb.redirectOutput(outF)
        val p = pb.start()
        if (!p.waitFor(30, TimeUnit.SECONDS)) {
          killTree(p)
          Seq("python syntax check timed out")
        } else if (p.exitValue() != 0)
          Seq("python syntax error: " + tail(outF, 2000).linesIterator
            .filter(_.nonEmpty).toSeq.takeRight(4).mkString(" | "))
        else Nil
      } finally graft.Fs.deleteRecursively(dir)
  }

  /** Validate pyFiles entries as URIs (reference configure() parity:
    * PySparkProgram.java:49-51 validates the list at deploy time).
    */
  def validatePyFiles(pyFiles: Seq[String]): Seq[String] =
    pyFiles.flatMap { f =>
      try { java.net.URI.create(f); None }
      catch { case e: IllegalArgumentException =>
        Some(s"bad pyFiles URI '$f': ${e.getMessage}")
      }
    }

  /** Default subprocess master: the host session's `spark.master`
    * when it names a real cluster manager — on a cluster the
    * subprocess must submit where the host runs, not silently fall
    * back to one local box. Local masters keep `local[8]`: the host
    * may be `local[32]` sized for the whole engine (the one-shot
    * subprocess should not grab every core), and `local-cluster[...]`
    * is a test-only rig a fresh spark-submit cannot join. The stage's
    * explicit `master` property always wins (Stages.PySparkProgram).
    */
  def defaultMaster(spark: org.apache.spark.sql.SparkSession): String =
    defaultMaster(
      try spark.conf.get("spark.master", "") catch { case _: Exception => "" })

  /** String-level resolution (unit-testable without a cluster). */
  def defaultMaster(hostMaster: String): String =
    if (hostMaster.isEmpty || hostMaster.startsWith("local")) "local[8]"
    else hostMaster

  /** Run the program to completion. Throws with the stderr tail on a
    * nonzero exit; returns the subprocess stdout on success.
    *
    * @param pythonCode self-contained PySpark source (macros already
    *                   resolved by the pipeline)
    * @param pyFiles    extra .py/.zip/.egg libraries, passed through
    *                   as `--py-files` (comma-joined)
    * @param conf       extra `--conf` entries (override the defaults)
    * @param master     Spark master for the subprocess
    * @param timeoutSec wall-clock budget before the subprocess is
    *                   killed (a hung user program must not hang the
    *                   pipeline forever)
    */
  def run(pythonCode: String,
          pyFiles: Seq[String] = Nil,
          conf: Map[String, String] = Map.empty,
          master: String = "local[8]",
          appName: String = "graft-pyspark-program",
          timeoutSec: Long = 600): String = {
    require(available, s"pysparkProgram: $unavailableReason")
    val home = sparkHome.get
    val py = pythonExec.get
    val dir = Files.createTempDirectory("graft-pyspark")
    // set when a kill cannot be confirmed: deleting the workdir (the
    // subprocess cwd + logs) under a still-live process trades a hung
    // program for undiagnosable follow-on failures — leak it instead
    var keepDir = false
    try {
      val src = dir.resolve("program.py")
      Files.write(src, pythonCode.getBytes("UTF-8"))
      // defaults sized for an embedded one-shot driver; caller conf wins
      val effConf = Map(
        "spark.ui.enabled" -> "false",
        "spark.sql.session.timeZone" -> "UTC",
        "spark.sql.shuffle.partitions" -> "8",
        "spark.driver.memory" -> "2g") ++ conf
      val cmd = Seq(home.resolve("bin/spark-submit").toString,
        "--master", master, "--name", appName) ++
        (if (pyFiles.nonEmpty) Seq("--py-files", pyFiles.mkString(",")) else Nil) ++
        effConf.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq("--conf", s"$k=$v") } ++
        Seq(src.toString)
      val pb = new ProcessBuilder(cmd.asJava)
      pb.directory(dir.toFile)
      val env = pb.environment()
      // the subprocess must see the CAPABLE distribution, not the
      // engine's jar-farm skeleton SPARK_HOME
      env.put("SPARK_HOME", home.toString)
      env.put("PYSPARK_PYTHON", py)
      env.put("PYSPARK_DRIVER_PYTHON", py)
      // a stray PYTHONPATH could shadow the distribution's pyspark
      env.remove("PYTHONPATH")
      val outF = dir.resolve("stdout.log").toFile
      val errF = dir.resolve("stderr.log").toFile
      pb.redirectOutput(outF)
      pb.redirectError(errF)
      val p = pb.start()
      // diagnostics must carry BOTH streams: spark-submit surfaces the
      // python traceback on ITS stdout, Spark log noise on stderr
      def tails = s"stderr tail: ${tail(errF, 2000)}; stdout tail: ${tail(outF, 4000)}"
      if (!p.waitFor(timeoutSec, TimeUnit.SECONDS)) {
        val dead = killTree(p)
        val killNote =
          if (dead) ""
          else {
            keepDir = true
            s"; kill UNCONFIRMED (pid ${p.pid()} still alive after " +
              s"destroyForcibly + 10s) — leaving workdir $dir in place"
          }
        throw new RuntimeException(
          s"pysparkProgram timed out after ${timeoutSec}s$killNote; $tails")
      }
      if (p.exitValue() != 0)
        throw new RuntimeException(
          s"pysparkProgram exited ${p.exitValue()}; $tails")
      tail(outF, 64 * 1024)
    } finally if (!keepDir) graft.Fs.deleteRecursively(dir)
  }

  /** Kill the subprocess AND its descendants: spark-submit execs the
    * driver JVM, but the driver spawns python workers (and a hung
    * pure-python user loop never even touches py4j) — destroying only
    * the root would orphan a CPU-burning python to init. Descendants
    * first (the snapshot races with the tree changing; best effort),
    * then the root, then a second descendant sweep for stragglers
    * forked in between. Returns true iff the root process is
    * confirmed dead — callers must not treat the workdir as
    * reclaimable otherwise.
    */
  private def killTree(p: Process): Boolean = {
    def sweep(): Unit =
      try p.descendants().forEach(h => { h.destroyForcibly(); () })
      catch { case _: Exception => () }
    sweep()
    p.destroyForcibly()
    val dead = p.waitFor(10, TimeUnit.SECONDS)
    sweep()
    dead && !p.isAlive
  }

  /** Last `n` bytes of a log file WITHOUT loading it whole: a chatty
    * user program can emit gigabytes of stdout, and readAllBytes on
    * that would OOM the host engine after the program already
    * succeeded.
    */
  private def tail(f: java.io.File, n: Int): String =
    if (!f.exists()) "(empty)"
    else {
      val raf = new java.io.RandomAccessFile(f, "r")
      try {
        val len = raf.length()
        val from = math.max(0L, len - n)
        val buf = new Array[Byte](math.min(n.toLong, len - from).toInt)
        raf.seek(from)
        raf.readFully(buf)
        new String(buf, "UTF-8")
      } finally raf.close()
    }
}
