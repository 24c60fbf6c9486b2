package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Concurrent-query parity: the reference is a shared-session
  * multi-pipeline environment (one CDAP SparkSession serving many
  * concurrently-deployed pipelines), so the library surface must be
  * safe when several gates run on the SAME SparkSession at once. Two
  * shared-state hazards live in this repo by construction and get
  * direct coverage here:
  *
  *  - checkpoint freeing: `mmrRerank`/`pqCodes` localCheckpoint
  *    per-iteration frames and free superseded ones through the
  *    frame's own LogicalRDD handle (the r11 advice fix — the old
  *    context-global persistent-RDD set-diff would unpersist a
  *    CONCURRENT query's checkpoint and kill it unrecoverably). Both
  *    run here in parallel with everything else, twice each.
  *  - temp views: `Tables.registerAll` re-registers table-name views
  *    (same content per sfDir — benign by idempotence), and the
  *    pipeline DSL registers its stage input names; one pipeline gate
  *    rides along to keep that path exercised.
  *
  * Method: sequential reference signatures first, then every gate
  * twice concurrently on a fixed pool, every result must bit-match
  * its sequential signature and no future may fail.
  */
class ConcurrencySpec extends SparkSpec {

  private val gates = Seq(
    "q1_agg", "join_multiway", "window_rank", "dedup_exact",
    "dedup_minhash_lsh", "text_stats", "lang_id", "tfidf_topk",
    "embed_quantize", "kmeans_assign", "json_funcs", "zorder_cluster",
    "mmr_rerank", "pq_codes", "pipeline_e2e",
    // joined the slice in r12 once its session-wide analyzer-conf flip
    // (the one conf-race in the inventory) was replaced by a SQL view
    "agg_rollup")

  test("16 gates x2 run concurrently on one session and bit-match their sequential signatures") {
    val refs = gates.map { n =>
      n -> ClusterVerify.signature(SparkEntry.queries(n)(spark, sfDir))
    }.toMap

    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = (gates ++ gates).zipWithIndex.map { case (n, i) =>
        Future {
          val sig = ClusterVerify.signature(SparkEntry.queries(n)(spark, sfDir))
          (n, i, sig == refs(n), sig)
        }
      }
      val results = Await.result(Future.sequence(futures), 10.minutes)
      val bad = results.filterNot(_._3)
      assert(bad.isEmpty, s"concurrent runs diverged: " +
        bad.map(r => s"${r._1}#${r._2}: got ${r._4}, want ${refs(r._1)}")
          .mkString("; "))
    } finally pool.shutdownNow()
  }
}
