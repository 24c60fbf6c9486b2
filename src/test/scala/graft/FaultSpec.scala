package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** CI guard for the fault-injection sweep (VERDICT r11 #1): a 2-gate
  * slice of [[FaultVerify]] in every `sbt test`, so executor-loss
  * recovery can't rot between the full committed sweeps —
  *
  *  - `q1_agg`: a pure-lineage batch plan killed at job 0 must
  *    hash-match its own no-kill signature first attempt (task
  *    re-schedule + stage retry + worker relaunch);
  *  - `mmr_rerank`: the localCheckpoint path killed mid-iterations,
  *    aimed at the block-holding executor, must either recover
  *    in-flight (blocks happened to sit on the survivor) or fail
  *    LOUDLY with the documented checkpoint-contract error and then
  *    hash-match on a fresh attempt — never mismatch, never a
  *    non-contract error.
  *
  * Session discipline is ClusterDynamicSpec's: FaultVerify.run stops
  * the suites' shared context and boots its own local-cluster master;
  * later suites' getOrCreate rebuilds local[4].
  */
class FaultSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  test("executor SIGKILL: lineage gate recovers in-flight, checkpoint gate honors its contract") {
    val out = FaultVerify.run(sfDir,
      Seq("q1_agg" -> 0.0, "mmr_rerank" -> 0.5))
    val byName = out.map(r => r.name -> r).toMap
    val q1 = byName("q1_agg")
    assert(q1.outcome == "match_first_attempt", q1)
    val mmr = byName("mmr_rerank")
    assert(mmr.outcome == "match_first_attempt" ||
      mmr.outcome == "match_after_contract_error", mmr)
    // if the loud path fired, it must have been the DOCUMENTED error
    if (mmr.outcome == "match_after_contract_error")
      assert(mmr.contractError.exists(_.contains("Checkpoint block")), mmr)
  }

  override def afterAll(): Unit = {
    // FaultVerify.run stopped its own session; make sure nothing
    // half-stopped leaks into the next suite
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.sparkContext.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }
}
