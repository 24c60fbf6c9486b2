package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.graftbridge.bridge
import graft.functions.{PolyHash, VectorDot, WinnowKeys, WordShingles}

/** Session wiring for the engine.
  *
  * `GraftExtensions` is the cluster-grade path: register the engine's
  * native expressions as SQL functions via
  * `--conf spark.sql.extensions=graft.GraftExtensions` (the public
  * SparkSessionExtensions injection point), so `spark.sql("SELECT
  * poly_hash(text) ...")` works in any session of the cluster.
  *
  * `GraftSession.builder` is the local/default path: engine-tuned conf
  * (AQE on, UTC, right-sized shuffle partitions, nanos-timestamp
  * acceptance) + the same function registrations applied post-build.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("poly_hash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PolyHash].getName, "poly_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyHash(exprs.head)))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("vector_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorDot(exprs(0), exprs(1))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("word_shingles"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordShingles(exprs(0),
          exprs(1).eval().asInstanceOf[Int])))
  }
}

object GraftSession {

  /** Register the engine's SQL functions on an existing session (for
    * sessions not built with `spark.sql.extensions`).
    */
  def registerFunctions(spark: SparkSession): Unit = {
    bridge.registerFunction(spark, "poly_hash", exprs => PolyHash(exprs.head))
    bridge.registerFunction(spark, "vector_dot", exprs => VectorDot(exprs(0), exprs(1)))
    bridge.registerFunction(spark, "word_shingles",
      exprs => WordShingles(exprs(0), exprs(1).eval().asInstanceOf[Int]))
    bridge.registerFunction(spark, "winnow_keys",
      exprs => WinnowKeys(exprs(0), exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int]))
  }

  /** Engine-tuned local session. `cores` should match the box in
    * local mode; shuffle partitions follow it (not the 200 default —
    * SURVEY.md perf rules).
    */
  def build(master: String, cores: Int, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cores * 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    registerFunctions(spark)
    spark
  }
}
