package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: print a gate query's optimized + formatted physical
  * plan without executing it (generator-input vs project siting, scan
  * pushdown, join strategy — the SURVEY perf-rule checklist).
  *
  * Usage: PlanDump <sfDir> <name>[,<name>…] [--optimized|--formatted]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim).toSeq
    val mode = if (args.length > 2) args(2) else "--formatted"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.registerFunctions(spark)
    names.foreach { name =>
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      mode match {
        case "--optimized" => println(df.queryExecution.optimizedPlan.treeString)
        case _ => df.explain("formatted")
      }
    }
    spark.stop()
  }
}
