// Plan auditor: dumps formatted physical plans for headline queries so
// pushdown / pruning / broadcast / codegen spans can be inspected.
// Run: cp tools/Explain.scala src/main/scala/graft/ && sbt "runMain graft.ExplainAudit" (then remove)
package graft

import org.apache.spark.sql.SparkSession

object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("filter_project", "join_multiway", "q1_agg", "asof_join",
        "dedup_minhash_lsh", "ann_ivf", "window_rank")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n=============== $n ===============")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
