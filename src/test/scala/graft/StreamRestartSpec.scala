package graft

import java.nio.file.Files
import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamStages

object StreamRestartSpec {
  /** Armed for the first run only: the poisoned batch signals arrival
    * and then blocks, so the main thread can kill the query while that
    * batch is provably IN FLIGHT (its sink file may already be flushed
    * to the output dir, but it is not yet in the manifest).
    */
  val armed = new AtomicBoolean(false)
  @volatile var inFlight: CountDownLatch = _
}

/** Streaming exactly-once across a mid-stream kill: a months-long
  * 100 TB streaming job WILL be restarted with a batch half-written,
  * and the file sink's `_spark_metadata` manifest is what keeps the
  * output exactly-once — batch reads over the directory must see only
  * manifest-committed files, never the orphans of an aborted batch.
  * The existing restart tests (sessionize phases, upsert idempotent
  * replay) restart AFTER a drained AvailableNow run; this one stops
  * the query while a batch is executing — tasks interrupted, the
  * in-flight batch unacknowledged — then restarts from the same
  * checkpoint and requires the final output to be bit-exact and
  * duplicate-free.
  */
class StreamRestartSpec extends SparkSpec {

  test("file sink stays exactly-once across a kill-while-batch-in-flight restart") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-stream-restart")
    val in = base.resolve("in").toString
    val out = base.resolve("out").toString
    val cp = base.resolve("cp").toString
    // 6 files, 1000 unique ids each; maxFilesPerTrigger=1 → 6 batches
    for (f <- 0 until 6)
      spark.range(f * 1000L, (f + 1) * 1000L).toDF("id")
        .coalesce(1).write.mode("append").parquet(in)
    val schemaJson = spark.read.parquet(in).schema.json

    def poisoned() = {
      val src = StreamStages.fileSource(spark, "parquet", in, schemaJson,
        maxFilesPerTrigger = Some(1))
      // block when the run is armed and this row belongs to file 3
      // (whichever batch that file lands in): signal, then sleep until
      // the kill interrupts us
      val trap = udf { (id: Long) =>
        if (id == 3100L && StreamRestartSpec.armed.get()) {
          StreamRestartSpec.inFlight.countDown()
          try Thread.sleep(30000)
          catch { case _: InterruptedException => () }
        }
        id
      }
      src.select(trap(col("id")).as("id"))
    }
    def start() = poisoned().writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()

    StreamRestartSpec.armed.set(true)
    StreamRestartSpec.inFlight = new CountDownLatch(1)
    val q1 = start()
    assert(StreamRestartSpec.inFlight.await(120, java.util.concurrent.TimeUnit.SECONDS),
      "the poisoned batch never started")
    q1.stop() // kill with the poisoned batch in flight
    StreamRestartSpec.armed.set(false)

    // mid-stream state: not all batches committed (file order rides
    // mtime, so the poisoned batch may even be batch 0 — in which case
    // the sink has no readable manifest yet and the count is 0)
    val committed = scala.util.Try(spark.read.parquet(out).count()).getOrElse(0L)
    assert(committed < 6000, s"kill landed after the run drained ($committed rows)")

    val q2 = start() // same checkpoint; must finish the remaining batches
    q2.awaitTermination()

    val got = spark.read.parquet(out) // manifest-aware batch read
    assert(got.count() === 6000L)
    assert(got.distinct().count() === 6000L)
    val sum = got.agg(sum_distinct(col("id"))).head().getLong(0)
    assert(sum === 5999L * 6000L / 2)
  }
}
