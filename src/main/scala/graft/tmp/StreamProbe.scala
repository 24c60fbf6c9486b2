package graft.tmp

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.streaming.StreamStages

/** Scratch probe (round 8, deleted after use): where do the streaming
  * gates' seconds go — harness input write, query start, or batch
  * execution?
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.build("local[32]", 32, "probe")
    s.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm up table load etc.
    Tables.load(s, dir, "events").count()

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val base = java.nio.file.Files.createTempDirectory("probe-ssj")
      val ev = Tables.load(s, dir, "events").withColumn("ts_us", expr("ts div 1000"))
      timed("input-write") {
        ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("l_id"),
            col("ts_us").as("l_us"), timestamp_micros(col("ts_us")).as("l_ets"))
          .coalesce(1).write.mode("overwrite").parquet(s"$base/views")
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("r_user"), col("event_id").as("r_id"),
            col("ts_us").as("r_us"), timestamp_micros(col("ts_us")).as("r_ets"))
          .coalesce(1).write.mode("overwrite").parquet(s"$base/purchases")
      }
      val (lSchema, rSchema) = timed("schema-read") {
        (s.read.parquet(s"$base/views").schema,
          s.read.parquet(s"$base/purchases").schema)
      }
      val q = timed("stream-run") {
        val l = StreamStages.fileSource(s, "parquet", s"$base/views", lSchema.json)
        val r = StreamStages.fileSource(s, "parquet", s"$base/purchases", rSchema.json)
        val joined = StreamStages.streamStreamJoin(l, "l_ets", r, "r_ets",
          watermark = "1 hour",
          cond = col("user_id") === col("r_user") &&
            col("r_ets") >= col("l_ets") &&
            col("r_ets") <= col("l_ets") + expr("INTERVAL 30 MINUTES"),
          joinType = "inner")
          .select(col("user_id"), col("l_id"), col("r_id"),
            ((col("r_us") - col("l_us")) / 1000000L).cast("long").as("lag_s"))
        val prev = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try StreamStages.runToMemory(joined, s"probe_ssj_$rep")
        finally s.conf.set("spark.sql.shuffle.partitions", prev)
      }
      q.recentProgress.foreach { p =>
        println(s"PROBE batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
      }
      timed("drain") { s.table(s"probe_ssj_$rep").count() }
    }
    s.stop()
  }
}
