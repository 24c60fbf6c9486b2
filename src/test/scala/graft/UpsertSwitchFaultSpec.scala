package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.functions._

import graft.streaming.StreamStages

object UpsertSwitchFaultSpec {
  /** Armed for the first run only: poisoned rows kill their write job
    * AFTER the version dir exists (job setup) and BEFORE the commit
    * marker (job commit) — the exact between-write-and-switch window.
    */
  val armed = new AtomicBoolean(false)
}

/** Kill-mid-SWITCH for the foreachBatch upsert (VERDICT r12 #5):
  * StreamRestartSpec proves the FILE sink's manifest keeps output
  * exactly-once across a kill; this pins the same property for the
  * upsert's write-new-then-switch snapshot protocol. The "switch" is
  * the atomic creation of the version's `_SUCCESS` marker at job
  * commit — so a batch killed while its version write is in flight
  * must leave a state where
  *
  *   1. readers (`latestSnapshot`) still serve the previous committed
  *      version — never the torn one, and never an error;
  *   2. the replayed batch merges against the previous COMMITTED
  *      version and rewrites the torn one in place (idempotent
  *      at-least-once replay);
  *   3. the final snapshot is bit-identical to the never-killed run.
  *
  * The torn state is produced by a REAL aborted write job (a poisoned
  * row fails its task inside the version's write job), not by
  * fabricating directory debris.
  */
class UpsertSwitchFaultSpec extends SparkSpec {

  test("upsert snapshot switch: kill between version write and commit marker " +
      "is invisible to readers and healed by replay") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-upsert-switch")
    val in = base.resolve("in").toString
    val out = base.resolve("out").toString

    // three waves → three micro-batches (maxFilesPerTrigger=1), mtimes
    // pinned so the poisoned wave is provably the LAST batch
    def wave(rows: Seq[(Long, Long, Long)], ageSec: Long): Unit = {
      val before = Option(new java.io.File(in).listFiles()).toSeq.flatten
        .map(_.toPath).toSet
      rows.toDF("event_id", "user_id", "ts_us")
        .coalesce(1).write.mode("append").parquet(in)
      val t = FileTime.fromMillis(System.currentTimeMillis() - ageSec * 1000)
      Option(new java.io.File(in).listFiles()).toSeq.flatten.map(_.toPath)
        .filterNot(before).foreach(p => Files.setLastModifiedTime(p, t))
    }
    wave(Seq((1L, 1L, 100L), (2L, 2L, 150L)), 120)
    wave(Seq((3L, 1L, 200L)), 60)
    wave(Seq((300L, 2L, 250L), (301L, 3L, 50L)), 0)
    val schemaJson = spark.read.parquet(in).schema.json

    val trap = udf { (id: Long) =>
      if (id >= 300L && UpsertSwitchFaultSpec.armed.get())
        throw new RuntimeException("graft-torn-write")
      id
    }
    def run(): Unit = {
      val src = StreamStages.fileSource(spark, "parquet", in, schemaJson,
        maxFilesPerTrigger = Some(1))
        .select(trap(col("event_id")).as("event_id"),
          col("user_id"), col("ts_us"))
      StreamStages.foreachBatchUpsert(src, Seq("user_id"),
        Seq("ts_us", "event_id"), out)
      ()
    }

    // AQE off for the poisoned run only: with AQE, the version write's
    // window exchange materializes as a separate query stage BEFORE the
    // write job sets up, so a map-side failure aborts with no version
    // dir at all (safe, but not the state under test). Without AQE the
    // write is ONE job — committer setup creates the version dir, then
    // the task failure aborts between write and switch: the exact torn
    // window. The healed replay below runs under the default (AQE on).
    UpsertSwitchFaultSpec.armed.set(true)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val e = try intercept[Exception](run())
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      UpsertSwitchFaultSpec.armed.set(false)
    }
    assert(Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .take(16).exists(t => String.valueOf(t.getMessage).contains("graft-torn-write")),
      s"expected the poisoned write to abort the run, got: ${e.getMessage}")

    // torn state is REAL: the poisoned version's dir exists (write
    // started) but carries no commit marker (switch never happened)
    def state() = Option(new java.io.File(out).listFiles()).toSeq.flatten
      .map(f => f.getName + (if (new java.io.File(f, "_SUCCESS").isFile) "(ok)" else "(torn)"))
      .sorted.mkString(",")
    val torn = new java.io.File(out, "v2")
    assert(torn.isDirectory, "poisoned version dir was never created — " +
      s"the kill did not land inside the write window; out state: ${state()}")
    assert(!new java.io.File(torn, "_SUCCESS").isFile,
      "poisoned version has a commit marker — the kill landed after the switch")

    // 1. readers never observe the torn version
    val served = StreamStages.latestSnapshot(spark, out)
      .select("user_id", "event_id", "ts_us")
      .as[(Long, Long, Long)].collect().toSet
    assert(served == Set((1L, 3L, 200L), (2L, 2L, 150L)),
      s"reader observed a torn or wrong snapshot: $served")

    // 2+3. replay heals: same checkpoint, disarmed — the failed batch
    // re-runs, overwrites the torn version, and commits the marker
    run()
    assert(new java.io.File(torn, "_SUCCESS").isFile,
      "replayed batch did not commit the poisoned version")
    val healed = StreamStages.latestSnapshot(spark, out)
      .select("user_id", "event_id", "ts_us")
      .as[(Long, Long, Long)].collect().toSet
    assert(healed == Set((1L, 3L, 200L), (2L, 300L, 250L), (3L, 301L, 50L)))
  }

  test("version commit markers survive a cluster conf that suppresses _SUCCESS " +
      "(the marker IS the switch — it must not be an optional courtesy file)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-upsert-marker")
    val in = base.resolve("in").toString
    val out = base.resolve("out").toString
    Seq((1L, 1L, 100L), (2L, 2L, 150L)).toDF("event_id", "user_id", "ts_us")
      .coalesce(1).write.parquet(in)
    val schemaJson = spark.read.parquet(in).schema.json
    val hconf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    val saved = hconf.get(key)
    hconf.set(key, "false") // the object-store-style suppression
    try {
      val src = StreamStages.fileSource(spark, "parquet", in, schemaJson)
      StreamStages.foreachBatchUpsert(src, Seq("user_id"),
        Seq("ts_us", "event_id"), out)
      val v0 = new java.io.File(out, "v0")
      assert(v0.isDirectory, "no version written")
      assert(new java.io.File(v0, "_SUCCESS").isFile,
        "version write honored the suppression conf — the per-write " +
          "override regressed and every snapshot is now invisible")
      assert(StreamStages.latestSnapshot(spark, out).count() == 2)
    } finally {
      if (saved == null) hconf.unset(key) else hconf.set(key, saved)
    }
  }
}
