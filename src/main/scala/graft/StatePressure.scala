package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamStages

/** The state-store swap criterion, demonstrated rather than argued.
  *
  * ScaleStream (r11) measured the within-watermark dedup gate's peak
  * state at the 50× event point: ≈1.1 GB of heap under the default
  * HDFS-backed (in-memory-map) provider vs ≈40 MB resident under
  * RocksDB, and BASELINE.md records the swap rule as "move to RocksDB
  * once per-partition state approaches executor memory". This main
  * makes that rule a measured life-or-death fact across a real
  * process boundary: the SAME gate, the SAME 50× slice, on a
  * `local-cluster[1,2,1024]` executor (1 GiB heap — smaller than the
  * state):
  *
  *  - RocksDB provider: state lives off-heap in the native store —
  *    the run must COMPLETE and hash-match the unconstrained local[8]
  *    reference signature;
  *  - HDFS-backed provider: the in-memory map cannot fit — the run
  *    must fail LOUDLY (executor heap OOM → task/executor loss → job
  *    abort), never complete wrongly. `spark.task.maxFailures=2`
  *    keeps the expected-death run from cycling OOMs for minutes.
  *
  * The artifact is `ok` only when BOTH halves hold; an HDFS run that
  * completes means the slice no longer exceeds the heap and the cell
  * proved nothing — that reads as not-ok so it gets re-sized, not
  * waved through.
  *
  * Usage: StatePressure <sliceDir> [outJson]   (slice: ScaleGen 50×)
  */
object StatePressure {

  /** The ScaleStream dedup shape, parquet-sinked (the memory sink
    * would buffer |keys| rows in the driver; the parquet sink keeps
    * the pressure where the proof needs it — executor state).
    */
  private def runDedup(spark: SparkSession, sliceDir: String,
      base: java.nio.file.Path): DataFrame = {
    val events = Tables.load(spark, sliceDir, "events")
    val ev = events.select(col("event_id"), col("event_type"),
      timestamp_micros(expr("ts div 1000")).as("ets"))
    val in = base.resolve("in").toString
    if (!Files.exists(base.resolve("in"))) {
      ev.coalesce(4).write.mode("overwrite").parquet(in)
      ev.coalesce(4).write.mode("append").parquet(in)
    }
    val schema = spark.read.parquet(in).schema
    val src = StreamStages.fileSource(spark, "parquet", in, schema.json)
    val deduped = StreamStages.dedupWithinWatermark(src, "ets", "1 hour",
      Seq("event_id"))
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ets")).as("ts_us"))
    val out = base.resolve(s"out-${System.nanoTime()}").toString
    val cp = base.resolve(s"cp-${System.nanoTime()}").toString
    StreamStages.withGateConf(spark, StreamStages.SkipNoDataBatch) {
      StreamStages.toParquet(deduped, out, cp)
    }
    spark.read.parquet(out)
  }

  def main(args: Array[String]): Unit = {
    val sliceDir = args(0)
    val outPath = if (args.length > 1) args(1) else "STATE_PRESSURE.json"
    ClusterEnv.ensureSparkHomeSkeleton()
    val base = Files.createTempDirectory("graft-state-pressure")

    System.err.println("[state-pressure] phase A: local[8] reference")
    val t0 = System.nanoTime()
    val ref = ClusterVerify.withSession(_.master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")) { spark =>
      ClusterVerify.signature(runDedup(spark, sliceDir, base))
    }
    val refSecs = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[state-pressure] reference: ${ref.rows} rows in " +
      f"$refSecs%.1fs")

    def pressureRun(provider: String): (String, Double) = {
      val t = System.nanoTime()
      val outcome =
        try ClusterVerify.withSession(b =>
          ClusterVerify.clusterBase(b, "local-cluster[1,2,1024]")
            .appName(s"graft-state-pressure-$provider")
            .config("spark.task.maxFailures", "2")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.sql.streaming.stateStore.providerClass",
              if (provider == "rocksdb")
                "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
              else
                "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")) { spark =>
          val sig = ClusterVerify.signature(runDedup(spark, sliceDir, base))
          if (sig == ref) "match" else s"MISMATCH: $sig vs $ref"
        } catch {
          case e: Throwable =>
            val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
              .map(t => String.valueOf(t.getMessage)).mkString(" | ")
            // the executor's java.lang.OutOfMemoryError never reaches
            // the driver-side message text (Scala boxes fatal errors as
            // 'Boxed Error' inside the task-failure reason) — the loud
            // signature at the driver is the stage/stream failure
            // itself; the executor stderr carries the OOM (verified,
            // see BASELINE). A quiet WRONG completion is the only
            // outcome this cell must never see, and that is labeled
            // MISMATCH above, not here.
            val loud = msgs.contains("OutOfMemory") ||
              msgs.contains("Boxed Error") ||
              msgs.contains("Job aborted due to stage failure") ||
              msgs.contains("STREAM_FAILED") ||
              msgs.contains("ExecutorLostFailure")
            if (loud) s"loud_failure: ${msgs.take(300)}"
            else s"error: ${msgs.take(300)}"
        }
      (outcome, (System.nanoTime() - t) / 1e9)
    }

    System.err.println("[state-pressure] phase B: rocksdb on 1 GiB executor")
    val (rocks, rocksSecs) = pressureRun("rocksdb")
    System.err.println(f"[state-pressure] rocksdb: $rocks ($rocksSecs%.1fs)")
    System.err.println("[state-pressure] phase C: hdfs-backed on 1 GiB executor")
    val (hdfs, hdfsSecs) = pressureRun("hdfs")
    System.err.println(f"[state-pressure] hdfs: $hdfs ($hdfsSecs%.1fs)")

    val ok = rocks == "match" && hdfs.startsWith("loud_failure")
    import Jsons.{jq, num}
    val json =
      s"""{"slice_dir": ${jq(sliceDir)},
         |"cluster_master": "local-cluster[1,2,1024]",
         |"dedup_out_rows": ${ref.rows},
         |"ref_secs": ${num(refSecs, 1)},
         |"rocksdb": {"outcome": ${jq(rocks)}, "secs": ${num(rocksSecs, 1)}},
         |"hdfs": {"outcome": ${jq(hdfs)}, "secs": ${num(hdfsSecs, 1)}},
         |"ok": $ok}
         |""".stripMargin
    Files.writeString(Paths.get(outPath), json)
    System.err.println(s"[state-pressure] ok=$ok — $outPath")
    if (!ok) sys.exit(1)
  }
}
