// One-off self-check at a scale the DuckDB oracle can't reach:
// minhashNearDups (collapse→LSH→verify→re-expand) must equal the
// independent exact inverted-index ngramJaccardPairs at the same
// shingle width/threshold (LSH miss probability at j ≥ 0.5 is < 1e-4
// per pair with 32×2 bands).
// Run: cp tools/CrossCheck.scala src/main/scala/graft/ && sbt "runMain graft.CrossCheck <sfDir>" (then remove)
package graft

import org.apache.spark.sql.SparkSession

object CrossCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "128")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("ia", "ib", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = pairs(graft.llm.Dedup.minhashNearDups(docs, "text", "doc_id", 3, 0.5))
    val inv = pairs(graft.llm.Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5))
    val onlyLsh = lsh.keySet -- inv.keySet
    val onlyInv = inv.keySet -- lsh.keySet
    val valDiff = (lsh.keySet & inv.keySet).filter(k => lsh(k) != inv(k))
    println(s"[crosscheck] sf=$sfDir lsh=${lsh.size} inv=${inv.size} " +
      s"onlyLsh=${onlyLsh.size} onlyInv=${onlyInv.size} valueDiffs=${valDiff.size}")
    if (onlyLsh.nonEmpty) println("  onlyLsh sample: " + onlyLsh.take(5))
    if (onlyInv.nonEmpty) println("  onlyInv sample: " + onlyInv.take(5))
    if (valDiff.nonEmpty) println("  valueDiff sample: " +
      valDiff.take(5).map(k => (k, lsh(k), inv(k))))
    assert(onlyLsh.isEmpty && onlyInv.isEmpty && valDiff.isEmpty, "MISMATCH")
    println("[crosscheck] OK — pair sets and jaccard values identical")
    spark.stop()
  }
}
