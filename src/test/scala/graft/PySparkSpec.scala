package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.dynamic.PySparkRunner
import graft.pipeline.{Connection, Pipeline, PipelineSpec, StageSpec}

/** The reference's fourth entry point run for REAL: a self-contained
  * PySpark program (reference docs/PySparkProgram-sparkprogram.md:21-48
  * shape — own SparkContext, own IO via macros) executed through a
  * spark-submit subprocess, inside the pipeline DAG.
  *
  * One subprocess run covers the whole surface (each run boots a
  * driver JVM, ~12 s): pyFiles import + python RDD lambdas (real
  * executor-side python workers) + parquet IO through `${...}` macros
  * + result equivalence with the Scala-side plan.
  */
class PySparkSpec extends SparkSpec {

  test("pysparkProgram: wordcount with pyFiles lib, macros and python workers " +
      "matches the Scala plan (PySparkProgram-sparkprogram.md:21-48)") {
    assume(PySparkRunner.available, PySparkRunner.unavailableReason)
    val dir = Files.createTempDirectory("graft-pyspec")
    // input: the golden fixture lines as parquet
    import spark.implicits._
    val in = s"$dir/in"
    (0 until 10).map(i => s"Line $i").toDF("body").coalesce(1)
      .write.parquet(in)
    // a pyFiles helper library the program imports (reference
    // Config.pyFiles: ','-separated URIs of extra .py libraries)
    val lib = dir.resolve("wclib.py")
    Files.write(lib,
      """def tokenize(line):
        |    return [w for w in (line or "").split(" ") if w != ""]
        |""".stripMargin.getBytes("UTF-8"))
    val code =
      """from pyspark import SparkContext
        |from pyspark.sql import SparkSession
        |from pyspark.sql.types import StructType, StructField, StringType, LongType
        |import wclib
        |
        |sc = SparkContext()
        |spark = SparkSession(sc)
        |df = spark.read.parquet("${input.path}")
        |counts = (df.rdd.flatMap(lambda r: wclib.tokenize(r["body"]))
        |          .map(lambda w: (w, 1))
        |          .reduceByKey(lambda a, b: a + b))
        |schema = StructType([StructField("word", StringType(), False),
        |                     StructField("n", LongType(), False)])
        |spark.createDataFrame(counts, schema) \
        |     .coalesce(1).write.mode("overwrite").parquet("${output.path}")
        |sc.stop()
        |""".stripMargin
    val out = s"$dir/out"
    val pipe = PipelineSpec(
      Seq(StageSpec("pys", "pysparkProgram", Map(
        "pythonCode" -> code,
        "pyFiles" -> lib.toString,
        "master" -> "local[4]",
        "conf.spark.sql.shuffle.partitions" -> "4"))),
      Seq.empty)
    new Pipeline(pipe).run(spark,
      Map("input.path" -> in, "output.path" -> out))
    val got = spark.read.parquet(out)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val golden = Map("Line" -> 10L) ++ (0 until 10).map(i => i.toString -> 1L)
    assert(got == golden)
  }

  test("pysparkProgram: MLlib side-artifact flow in PYTHON — one program " +
      "trains+saves, a second loads+applies (PySparkProgram-sparkprogram.md:21-48)") {
    assume(PySparkRunner.available, PySparkRunner.unavailableReason)
    // the reference doc's flagship use case is an MLlib NaiveBayes
    // train/save/load in user Python; DynamicSpec proves the same flow
    // in dynamic Scala — this is the python side, as two SEPARATE
    // programs exchanging the model through storage (the side-artifact
    // contract: `model.save(sc, "${output.path}")`, doc line 48)
    val dir = Files.createTempDirectory("graft-pyml")
    val model = s"$dir/model"; val out = s"$dir/pred"
    val train =
      """from pyspark import SparkContext
        |from pyspark.sql import SparkSession
        |from pyspark.ml.classification import NaiveBayes
        |from pyspark.ml.linalg import Vectors
        |
        |sc = SparkContext()
        |spark = SparkSession(sc)
        |data = spark.createDataFrame(
        |    [(0.0, Vectors.dense([5.0, 1.0])), (0.0, Vectors.dense([4.0, 0.0])),
        |     (1.0, Vectors.dense([1.0, 5.0])), (1.0, Vectors.dense([0.0, 4.0]))],
        |    ["label", "features"])
        |model = NaiveBayes(smoothing=1.0).fit(data)
        |model.write().overwrite().save("${model.path}")
        |sc.stop()
        |""".stripMargin
    val apply =
      """from pyspark import SparkContext
        |from pyspark.sql import SparkSession
        |from pyspark.ml.classification import NaiveBayesModel
        |from pyspark.ml.linalg import Vectors
        |
        |sc = SparkContext()
        |spark = SparkSession(sc)
        |model = NaiveBayesModel.load("${model.path}")
        |test = spark.createDataFrame(
        |    [(0, Vectors.dense([6.0, 1.0])), (1, Vectors.dense([1.0, 6.0]))],
        |    ["row_id", "features"])
        |(model.transform(test).select("row_id", "prediction")
        |    .coalesce(1).write.mode("overwrite").parquet("${output.path}"))
        |sc.stop()
        |""".stripMargin
    def stage(name: String, code: String) =
      StageSpec(name, "pysparkProgram", Map(
        "pythonCode" -> code, "master" -> "local[4]",
        "conf.spark.sql.shuffle.partitions" -> "4"))
    // two action nodes in ONE pipeline, ordered by a connection — the
    // apply program must only run after the model exists
    val pipe = PipelineSpec(
      Seq(stage("train", train), stage("apply", apply)),
      Seq(Connection("train", "apply")))
    new Pipeline(pipe).run(spark,
      Map("model.path" -> model, "output.path" -> out))
    val got = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(0L -> 0.0, 1L -> 1.0), s"wrong predictions: $got")
  }

  test("pysparkProgram: pandas-UDF (mapInPandas) PPM decode bit-matches the " +
      "independent JVM decoder on binary media columns") {
    assume(PySparkRunner.available, PySparkRunner.unavailableReason)
    // the Arrow path needs pandas+pyarrow+numpy in the subprocess python
    assume(graft.dynamic.PySparkPrograms.pandasAvailable,
      "no pandas/pyarrow/numpy in the subprocess python")

    // JVM side: the multimodal fixture (binary P6 images incl. header
    // comments) and the pure-JVM decoder as the independent reference
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pypandas")
    val in = s"$dir/media"; val out = s"$dir/feat"
    val docs = spark.range(0, 40).toDF("doc_id")
    val media = graft.llm.Multimodal.syntheticPpmTable(docs)
    media.select("doc_id", "payload").coalesce(2).write.parquet(in)

    // python side: the SHARED program source the gate also runs
    // (graft.dynamic.PySparkPrograms.pandasPpmDecode) — this spec pins
    // it against the independent JVM decoder, the gate against DuckDB
    val code = graft.dynamic.PySparkPrograms.pandasPpmDecode
    val pipe = PipelineSpec(
      Seq(StageSpec("pys", "pysparkProgram", Map(
        "pythonCode" -> code, "master" -> "local[4]",
        "conf.spark.sql.shuffle.partitions" -> "4"))),
      Seq.empty)
    new Pipeline(pipe).run(spark,
      Map("input.path" -> in, "output.path" -> out))

    val fromPython = spark.read.parquet(out)
      .select("doc_id", "width", "height", "n_pixels", "luma_sum")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val fromJvm = graft.llm.Multimodal.decodeImages(spark, media)
      .select(col("doc_id"), col("width").cast("long"),
        col("height").cast("long"), col("n_pixels"), col("luma_sum"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(fromJvm.size == 40, s"JVM decoder dropped rows: ${fromJvm.size}")
    assert(fromPython == fromJvm,
      s"python pandas decode diverged from the JVM decoder: " +
        s"py-only=${(fromPython -- fromJvm).take(3)} jvm-only=${(fromJvm -- fromPython).take(3)}")
  }

  test("pysparkProgram: nonzero exit surfaces the python stderr tail") {
    assume(PySparkRunner.available, PySparkRunner.unavailableReason)
    // runtime failure (deploy-time py_compile passes — the error is a
    // raise, not a syntax error), so the subprocess exit path is on
    // the hook, including stderr capture
    val e = intercept[RuntimeException] {
      PySparkRunner.run("raise RuntimeError('graft-boom')",
        master = "local[2]", timeoutSec = 120)
    }
    assert(e.getMessage.contains("graft-boom"), e.getMessage.take(500))
  }

  test("pysparkProgram: a hung program is killed at timeoutSec, not waited on forever") {
    assume(PySparkRunner.available, PySparkRunner.unavailableReason)
    // no SparkContext — plain python sleep, so the whole test costs
    // ~timeoutSec + python startup, and the kill path (destroyForcibly
    // on the exec'd process) is what's under test
    val t0 = System.nanoTime()
    val e = intercept[RuntimeException] {
      PySparkRunner.run("import time\ntime.sleep(600)\n", timeoutSec = 5)
    }
    val waited = (System.nanoTime() - t0) / 1e9
    assert(e.getMessage.contains("timed out"), e.getMessage.take(300))
    assert(waited < 60, s"kill took ${waited}s — timeout not enforced")
  }

  test("pysparkProgram: two programs run CONCURRENTLY stay isolated " +
      "(own driver JVMs, temp dirs, outputs)") {
    assume(PySparkRunner.available, PySparkRunner.unavailableReason)
    // gates can run concurrently on one session (ConcurrencySpec
    // contract); each pysparkProgram boots its own driver JVM with
    // auto-assigned ports — two at once must not collide
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = Files.createTempDirectory("graft-pyconc")
    def prog(tag: Int) =
      s"""from pyspark import SparkContext
         |from pyspark.sql import SparkSession
         |sc = SparkContext()
         |spark = SparkSession(sc)
         |spark.range(0, 100).selectExpr("id", "id * $tag as v") \\
         |    .coalesce(1).write.mode("overwrite").parquet("$dir/out$tag")
         |sc.stop()
         |""".stripMargin
    val fs = Seq(3, 7).map(t => Future {
      PySparkRunner.run(prog(t), master = "local[2]",
        appName = s"graft-pyconc-$t", timeoutSec = 300)
    })
    Await.result(Future.sequence(fs), 300.seconds)
    import spark.implicits._
    for (t <- Seq(3, 7)) {
      val sum = spark.read.parquet(s"$dir/out$t")
        .agg(org.apache.spark.sql.functions.sum("v")).as[Long].head()
      assert(sum == 99L * 100 / 2 * t, s"program $t wrong output: $sum")
    }
  }

  test("pysparkProgram: subprocess master resolution — stage property wins, " +
      "then a real cluster manager inherits, local hosts fall back to local[8]") {
    // string-level contract (VERDICT r13 #5): the stage must be
    // cluster-correct by default without every caller passing master
    assert(PySparkRunner.defaultMaster("spark://host:7077") == "spark://host:7077")
    assert(PySparkRunner.defaultMaster("yarn") == "yarn")
    assert(PySparkRunner.defaultMaster("k8s://https://1.2.3.4:6443")
      == "k8s://https://1.2.3.4:6443")
    // local flavors: the subprocess must NOT inherit (local[32] would
    // over-subscribe; a fresh spark-submit cannot join local-cluster)
    assert(PySparkRunner.defaultMaster("local[32]") == "local[8]")
    assert(PySparkRunner.defaultMaster("local[*]") == "local[8]")
    assert(PySparkRunner.defaultMaster("local-cluster[2,2,1024]") == "local[8]")
    assert(PySparkRunner.defaultMaster("") == "local[8]")
    // session-level overload reads the live conf (this suite is local)
    assert(PySparkRunner.defaultMaster(spark) == "local[8]")
  }

  test("pysparkProgram: validate() reports a missing pythonCode property " +
      "instead of throwing (ADVICE r13)") {
    assume(PySparkRunner.available, PySparkRunner.unavailableReason)
    val stage = new graft.pipeline.PySparkProgram(StageSpec(
      "noCode", "pysparkProgram", Map.empty))
    val errs = stage.validate()
    assert(errs.exists(_.contains("missing required property 'pythonCode'")),
      s"expected a validation finding, got: $errs")
  }
}
