package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Scale curve for the Arrow/mapInPandas path (VERDICT r13 #4) — the
  * one gate family [[ScaleCurves]] could not cover because its wall
  * time is dominated by a data-INDEPENDENT spark-submit driver-JVM
  * boot (~12 s). This harness runs the `pyspark_pandas_decode` gate's
  * OWN program (PySparkPrograms.pandasPpmDecodeTimed — the canonical
  * source with a work timer spliced in) on ScaleGen slices and splits
  * each run into:
  *
  *   - `py_work_s`: python-side read -> Arrow batches -> numpy decode
  *     -> parquet write (the data-dependent part, printed by the
  *     program itself as ARROW_WORK_SECONDS);
  *   - `boot_s`: subprocess wall minus py_work_s — JVM boot + py4j
  *     handshake, the constant the bench annotates via const_queries.
  *
  * The claim to check: `py_work_s` is ≈linear in documents (exp ≈ 1;
  * the decode is row-local, partition-wise) while `boot_s` is flat.
  *
  * Usage: ScaleArrow <scaleBase> <outJson> [multiples]
  * (defaults: target/testdata, SCALE_ARROW.json, 1,3,10).
  */
object ScaleArrow {
  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "target/testdata"
    val outJson = if (args.length > 1) args(1) else "SCALE_ARROW.json"
    val ms = (if (args.length > 2) args(2) else "1,3,10")
      .split(",").map(_.trim.toLong).sorted.toSeq

    require(graft.dynamic.PySparkRunner.available,
      graft.dynamic.PySparkRunner.unavailableReason)
    require(graft.dynamic.PySparkPrograms.pandasAvailable,
      "no pandas/pyarrow/numpy in the subprocess python")

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // media tables from ScaleGen slices — the gate's exact write shape
    // (coalesce(2)) so the measured plan IS the gate's plan
    val media: Map[Long, (String, Long)] = ms.map { m =>
      val dir = s"$base/scale${m}x"
      if (!Files.exists(Paths.get(s"$dir/documents.parquet")))
        ScaleGen.generate(spark, base, m, Set("documents")) // only table read here
      // absolute: the subprocess runs from its own temp cwd
      val in = Paths.get(s"$base/arrow_media_${m}x").toAbsolutePath.toString
      if (!Files.exists(Paths.get(in)))
        graft.llm.Multimodal.writePpmMediaTable(
          Tables.load(spark, dir, "documents"), in)
      val n = spark.read.parquet(in).count()
      m -> (in, n)
    }.toMap

    // one run = one fresh subprocess; returns (wall_s, py_work_s)
    def runOnce(m: Long): (Double, Double) = {
      val (in, _) = media(m)
      val dir = Files.createTempDirectory("graft-scale-arrow")
      val out = dir.resolve("feat")
      try {
        val code = graft.dynamic.PySparkPrograms.pandasPpmDecodeTimed
          .replace("${input.path}", in)
          .replace("${output.path}", out.toString)
        val t0 = System.nanoTime()
        val stdout = graft.dynamic.PySparkRunner.run(code,
          appName = s"graft-scale-arrow-${m}x", timeoutSec = 1200)
        val wall = (System.nanoTime() - t0) / 1e9
        val work = stdout.linesIterator
          .collectFirst { case l if l.startsWith("ARROW_WORK_SECONDS=") =>
            l.stripPrefix("ARROW_WORK_SECONDS=").trim.toDouble }
          .getOrElse(-1.0)
        val got = spark.read.parquet(out.toString).count()
        require(got == media(m)._2,
          s"decode dropped rows at ${m}x: $got of ${media(m)._2}")
        (wall, work)
      } finally Fs.deleteRecursively(dir) // decode output is rep-local
    }

    // warm-up at the smallest multiple (pyc compile, OS page cache)
    runOnce(ms.head)
    val rows = ms.map { m =>
      // min-of-2 by WALL, keeping that rep's own (wall, work) pair —
      // mixing min(wall) with min(work) across reps would publish a
      // boot_s = wall - work split no rep actually exhibited
      val reps = Seq(runOnce(m), runOnce(m))
      val (wall, work) = reps.minBy(_._1)
      println(s"[scalearrow] ${m}x: wall ${Jsons.num(wall, 3)} s, " +
        s"py_work ${Jsons.num(work, 3)} s, n=${media(m)._2}")
      (m, wall, work)
    }

    def fit(p: (Long, Double), q: (Long, Double)): Double =
      math.log(q._2 / p._2) / math.log(q._1.toDouble / p._1)
    def numOrNull(d: Double) =
      if (d.isNaN || d.isInfinite) "null" else Jsons.num(d)
    val workPts = rows.collect { case (m, _, p) if p > 0 => (m, p) }
    val (expFull, expTail) =
      if (workPts.size >= 2)
        (fit(workPts.head, workPts.last),
          fit(workPts(workPts.size - 2), workPts.last))
      else (Double.NaN, Double.NaN)
    // The log-log exponent understates linearity here because a
    // constant (python-worker launch + Arrow session, ~5 s) dominates
    // py_work at these sizes. The crisp claim is the LINEAR model
    // py_work = const + marginal·n_docs: a near-constant per-doc
    // marginal across multiples IS the ≈linear data term.
    val linPts = rows.collect { case (m, _, p) if p > 0 =>
      (media(m)._2.toDouble, p) }
    val (constPy, usPerDoc, r2) =
      if (linPts.size >= 2) {
        val mx = linPts.map(_._1).sum / linPts.size
        val my = linPts.map(_._2).sum / linPts.size
        val b = linPts.map(p => (p._1 - mx) * (p._2 - my)).sum /
          linPts.map(p => (p._1 - mx) * (p._1 - mx)).sum
        val a = my - b * mx
        val ssRes = linPts.map(p => math.pow(p._2 - (a + b * p._1), 2)).sum
        val ssTot = linPts.map(p => math.pow(p._2 - my, 2)).sum
        (a, b * 1e6, if (ssTot > 0) 1 - ssRes / ssTot else Double.NaN)
      } else (Double.NaN, Double.NaN, Double.NaN)
    // A run whose ARROW_WORK_SECONDS line never arrived has no real
    // py_work measurement: publish null for the derived fields rather
    // than a -1.0 sentinel that reads like data (ADVICE r14).
    val rowsJson = rows.map { case (m, w, p) =>
      val (pyS, bootS) =
        if (p > 0) (Jsons.num(p, 3), Jsons.num(w - p, 3)) else ("null", "null")
      s""""${m}x":{"n_docs":${media(m)._2},"wall_s":${Jsons.num(w, 3)},""" +
        s""""py_work_s":$pyS,"boot_s":$bootS}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"scale_arrow","multiples":[${ms.mkString(",")}],""" +
        s""""base":${Jsons.jq(base)},"runs":$rowsJson,""" +
        s""""exp_full_py_work":${numOrNull(expFull)},""" +
        s""""exp_tail_py_work":${numOrNull(expTail)},""" +
        s""""linear_fit":{"const_py_s":${numOrNull(constPy)},""" +
        s""""marginal_us_per_doc":${numOrNull(usPerDoc)},"r2":${numOrNull(r2)}}}"""
    println(json)
    Files.write(Paths.get(outJson), (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
