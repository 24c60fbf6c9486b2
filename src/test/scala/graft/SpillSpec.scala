package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** CI guard for the spill path (companion to [[SpillVerify]]'s full
  * committed sweep): force every sorter/window buffer to spill via the
  * runtime force-spill thresholds, run a window-heavy gate, and pin
  * that (a) spill ACTUALLY happened — the task metrics show disk
  * bytes — and (b) the result signature is bit-identical to the
  * unforced run. Cheap by design: the thresholds are SQLConf (runtime
  * settable on the shared local[4] session), unlike SpillVerify's
  * memory.fraction squeeze which needs its own executor JVMs.
  *
  * Why it matters: at 100 TB partitions outgrow execution memory and
  * every design note in this repo answers "Spark spills and the result
  * is unchanged". This spec keeps the spill read/merge path executing
  * under OUR plans in every `sbt test`, so the claim can't silently
  * rot (before r12 no gate run had ever actually spilled).
  */
class SpillSpec extends SparkSpec {

  // SQL configs only: the core-side force threshold
  // (spark.shuffle.spill.numElementsForceSpillThreshold) is not
  // runtime-modifiable — SpillVerify sets it at session build instead
  private val thresholdKeys = Seq(
    "spark.sql.windowExec.buffer.spill.threshold",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold")

  test("forced spill: window gate hash-matches its in-memory run and reports disk spill") {
    val sf01 = "/root/testdata/sf0.01" // enough rows to cross the threshold
    val fn = SparkEntry.queries("window_rank")
    val ref = ClusterVerify.signature(fn(spark, sf01))

    val disk = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) disk.addAndGet(m.diskBytesSpilled)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      thresholdKeys.foreach(spark.conf.set(_, "512"))
      val forced = ClusterVerify.signature(fn(spark, sf01))
      assert(forced == ref,
        s"spilled run diverged from in-memory run: $forced vs $ref")
      // listener events are async; poll briefly for the metrics
      val deadline = System.currentTimeMillis() + 5000
      while (disk.get() == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(disk.get() > 0,
        "force-spill thresholds at 512 elements produced no disk spill — " +
          "the spill path did not execute and this spec proved nothing")
    } finally {
      thresholdKeys.foreach(spark.conf.unset)
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
