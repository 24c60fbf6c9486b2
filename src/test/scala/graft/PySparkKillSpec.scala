package graft

import java.nio.file.{Files, Paths}

import graft.dynamic.PySparkRunner

/** External SIGKILL of the spark-submit subprocess mid-parquet-write
  * (VERDICT r13 #3). PySparkSpec already proves timeout-kill (the
  * ENGINE kills a hung program); this is the other direction — the OS
  * or an operator kills the subprocess while its job is writing — and
  * pins the three recovery guarantees:
  *
  *   (a) the pipeline fails LOUDLY: run() throws with the nonzero
  *       exit and the stderr tail, never returns partial success;
  *   (b) no torn output is readable: with FileOutputCommitter
  *       semantics nothing reaches the final dir before job commit —
  *       a killed write leaves only `_temporary`, no part-files, no
  *       `_SUCCESS`;
  *   (c) a rerun in `overwrite` mode into the SAME dir produces the
  *       exact clean-run result (the committer's overwrite replaces
  *       the torn attempt wholesale).
  */
class PySparkKillSpec extends SparkSpec {

  /** Program whose write is slow enough to kill mid-flight: each row
    * sleeps, so the 8 write tasks hold the job open for ~8 s after
    * `_temporary` appears. Content is deterministic for the rerun
    * hash-match.
    */
  private def slowWriteProgram(out: String): String =
    s"""from pyspark import SparkContext
       |from pyspark.sql import SparkSession
       |import time
       |sc = SparkContext()
       |spark = SparkSession(sc)
       |def slow(it):
       |    for x in it:
       |        time.sleep(0.04)
       |        yield (x, x * 3)
       |rdd = sc.parallelize(range(1600), 8).mapPartitions(slow)
       |spark.createDataFrame(rdd, "a long, b long") \\
       |    .write.mode("overwrite").parquet("$out")
       |sc.stop()
       |""".stripMargin

  /** The subprocess java command line carries `--name <appName>`; the
    * test JVM's own cmdline does not, so the match is unambiguous.
    */
  private def findByAppName(appName: String): Option[ProcessHandle] = {
    import scala.jdk.CollectionConverters._
    ProcessHandle.allProcesses().iterator().asScala.find(
      _.info().commandLine().map[Boolean](_.contains(appName)).orElse(false))
  }

  /** One kill attempt: runs the slow-write program and SIGKILLs the
    * subprocess once its write job has opened the output
    * (`_temporary` exists => tasks in flight for several more
    * seconds). The process is tracked by appName INDEPENDENTLY of
    * `_temporary` (ADVICE r14): if the write commits (removing
    * `_temporary`) or the subprocess exits before the killer lands
    * the signal, the killer notices the process came and went and
    * stops polling instead of spinning to its deadline. Returns the
    * run outcome and the killed pid (-1 = kill never landed).
    */
  private def attemptKilledRun(out: String,
      appName: String): (Option[Throwable], Long) = {
    @volatile var killedPid = -1L
    val killer = new Thread(() => {
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      var done = false
      var seen = false
      while (!done && System.nanoTime() < deadline) {
        val h = findByAppName(appName)
        if (h.isDefined) seen = true
        if (h.isDefined && Files.exists(Paths.get(out, "_temporary"))) {
          killedPid = h.get.pid()
          h.get.destroyForcibly() // SIGKILL on linux
          done = true
        } else if (seen && h.isEmpty) {
          done = true // victim came and went before we could land it
        }
        if (!done) Thread.sleep(25)
      }
    })
    killer.start()
    val ex =
      try { PySparkRunner.run(slowWriteProgram(out),
        appName = appName, timeoutSec = 300); None }
      catch { case e: Throwable => Some(e) }
    killer.join(130000)
    (ex, killedPid)
  }

  test("pysparkProgram: external SIGKILL mid-parquet-write fails loudly, " +
      "leaves no readable torn output, and a rerun matches a clean run") {
    assume(PySparkRunner.available, PySparkRunner.unavailableReason)
    val dir = Files.createTempDirectory("graft-pykill")
    val cleanOut = s"$dir/clean"

    // ---- reference: a never-killed run --------------------------
    PySparkRunner.run(slowWriteProgram(cleanOut),
      appName = "graft-pykill-clean", timeoutSec = 300)
    val cleanRows = spark.read.parquet(cleanOut)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(cleanRows.size == 1600 && cleanRows.head == ((0L, 0L)),
      s"clean run wrong: n=${cleanRows.size}")

    // ---- the kill, with the fast-commit race handled (ADVICE r14):
    // if the victim commits or exits before the signal lands, that
    // attempt proves nothing about kill recovery — retry on a fresh
    // dir, and CANCEL (not fail) if the host never lets a kill land.
    // A run that FAILED without our kill is a real bug and surfaces.
    var landed: Option[(Throwable, String)] = None
    var attempt = 0
    while (landed.isEmpty && attempt < 3) {
      attempt += 1
      val out = s"$dir/killed$attempt"
      val (ex, pid) = attemptKilledRun(out, s"graft-pykill-victim-$attempt")
      (ex, pid) match {
        // TOCTOU (ADVICE r15): between the killer's `_temporary` check
        // and destroyForcibly the job can commit (_SUCCESS lands, exit
        // still nonzero from the post-commit SIGKILL) — that attempt
        // proves nothing about MID-WRITE recovery either; retry it like
        // the committed-first case instead of failing assertion (b).
        case (Some(_), p) if p > 0 &&
          Files.exists(Paths.get(out, "_SUCCESS")) => // committed first — retry
        case (Some(e), p) if p > 0 => landed = Some((e, out))
        case (None, _) => // committed before the kill landed — retry
        case (Some(e), _) => throw e
      }
    }
    val (ex, killedOut) = landed.getOrElse(cancel(
      s"SIGKILL never landed mid-write in $attempt attempts " +
        "(victim committed/exited first every time — loaded host)"))
    // (a) loud failure with the diagnostics channel attached
    assert(ex.getMessage.contains("exited"),
      s"expected nonzero-exit failure, got: ${ex.getMessage.take(200)}")
    assert(ex.getMessage.contains("stderr tail"),
      "failure message must carry the stderr tail")

    // (b) no torn output: nothing committed to the final location
    val top = Option(new java.io.File(killedOut).listFiles())
      .map(_.map(_.getName).toSeq).getOrElse(Seq.empty)
    assert(!top.exists(_.startsWith("part-")),
      s"torn part-files visible in final dir: $top")
    assert(!top.contains("_SUCCESS"), s"_SUCCESS after a killed job: $top")

    // (c) rerun into the SAME dir -> bit-identical to the clean run
    PySparkRunner.run(slowWriteProgram(killedOut),
      appName = "graft-pykill-rerun", timeoutSec = 300)
    val rerunRows = spark.read.parquet(killedOut)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rerunRows == cleanRows,
      s"rerun diverged from clean run: n=${rerunRows.size} vs ${cleanRows.size}")
    val success = Files.exists(Paths.get(killedOut, "_SUCCESS"))
    assert(success, "rerun must commit the _SUCCESS marker")
  }
}
