package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Scale-safety CI: no gate query may plan a cartesian product, a
  * broadcast-nested-loop join, or an unpartitioned (single-task)
  * window — the three shapes that silently stop scaling — unless it
  * appears in the allowlist below with a reason. The allowlist is
  * exact: an entry whose plan CLEANS UP also fails the test, so stale
  * justifications can't rot in place.
  *
  * Streaming gates are excluded: calling their query fn executes a
  * real micro-batch run and returns the drained memory table, whose
  * plan says nothing about the streaming plan shape (StreamingSpec
  * covers those semantics).
  */
class PlanAuditSpec extends SparkSpec {

  /** query -> why its flagged shapes are bounded at 100 TB. Every
    * flagged side is broadcast and metadata-scale by construction.
    */
  private val allowed: Map[String, String] = Map(
    "ann_topk_exact" -> "brute-force oracle BY DESIGN: broadcast query side x corpus",
    "ann_ivf" -> ("brute-force baseline feeding the recall verdict (gate harness); " +
      "centroid probe = broadcast k-cell crossJoin; verdict window input is " +
      "k*|Q| rows (top-k output), not corpus-scale"),
    "ann_lsh" -> "same verdict harness as ann_ivf (exact baseline + bounded verdict window)",
    "dedup_embedding_lsh" -> ("same verdict harness as ann_ivf: the global " +
      "window runs over the EXACT operator's OUTPUT (the near-dup pair set — " +
      "already the reduced result, not the corpus); both pair generators " +
      "underneath are equi-joins (block pairs / LSH buckets)"),
    "dedup_embedding_lsh_hi" -> ("dedup_embedding_lsh's verdict harness on the " +
      "planted high-cos corpus (r16): the global window runs over the exact " +
      "leg's OUTPUT pair set (the planted pairs); both pair generators are " +
      "equi-joins"),
    "ann_ivfpq" -> ("same verdict harness as ann_ivf: one BNLJ is the broadcast " +
      "brute-force baseline, one the broadcast k-cell centroid crossJoin " +
      "(probe ranking); ADC candidate + rerank joins are equi-joins on cell/id"),
    "join_cross" -> "the cross-join operator itself (4-row region side, broadcast)",
    "multimodal_frames" -> "ascii_ok verdict = crossJoin of a broadcast 1-row aggregate",
    "multimodal_resize" -> "ascii_ok verdict = crossJoin of a broadcast 1-row aggregate",
    "resample_gapfill" -> "hour-spine x event-type grid: both sides metadata-scale, broadcast",
    "tfidf_topk" -> "crossJoin of the broadcast 1-row corpus doc count (idf denominator)",
    "unigram_logprob" -> "crossJoin of the broadcast 1-row corpus token total (LM denominator)",
    "domain_mixture_stats" -> "same 1-row token total via unigramLogProb",
    // NOTE: quality_buckets/budget_select also carry unigramLogProb's
    // broadcast 1-row crossJoin, but their NLL chain now executes
    // inside an eager localCheckpoint, so the returned plan no longer
    // exposes it to this audit (the checkpointed sub-plan was audited
    // via unigram_logprob, which shares the chain).
    "bm25_topk" -> "crossJoin of the broadcast 1-row corpus stats (N, avg doclen)",
    "hybrid_rrf" -> ("its two legs' already-adjudicated shapes: the dense leg IS " +
      "ann_topk_exact's broadcast-query x corpus brute force; the lexical leg " +
      "carries bm25_topk's broadcast 1-row corpus-stats crossJoin"),
    "bigram_logprob" -> "crossJoin of the broadcast 1-row vocabulary size (smoothing V)",
    "sketch_hll_intersect" -> ("pair grid over the per-event-type sketch rows " +
      "(one row per type — metadata-scale, broadcast); the user-id scan " +
      "reduces to sketches before any pairing"),
    "pareto_front" -> ("running-min window over the per-size aggregate " +
      "(<=|distinct p_size| rows — metadata-scale); the corpus-side pass " +
      "is a broadcast equi-join on p_size"),
    // NOTE: mmr_rerank's candidate generation IS ann_topk_exact's
    // broadcast-query x corpus brute force (swap in ivf/lsh at scale),
    // but it now executes inside an eager localCheckpoint, so the
    // returned plan no longer exposes it to this audit (the shape was
    // adjudicated via ann_topk_exact, which shares the chain); every
    // greedy step after it is per-query bounded (<= nCand rows).
    "assoc_lift" -> "crossJoin of the broadcast 1-row distinct-user total (lift denominator)",
    "mixture_waterfill" -> ("waterfill solve runs entirely on the per-domain " +
      "aggregate (<=|domains| rows — metadata-scale global windows)"),
    "collocations" -> ("top-20 window over <=|frequent-vocab|^2/2 aggregated " +
      "pair rows (df-pruned vocabulary — metadata-scale) + the broadcast " +
      "1-row doc count (lift denominator)"),
    "domain_gini" -> ("Gini numerator on the per-domain aggregate " +
      "(<=|domains| rows — metadata-scale global windows, the waterfill discipline)"),
    "interval_overlap_join" -> ("crossJoin of the broadcast 1-row corpus " +
      "hour-traffic totals (the busy-threshold denominator); the interval " +
      "pairing itself is the hour-band EQUI-join, never a nested loop"),
    "hard_negatives" -> ("brute-force anchors × corpus under a label-" +
      "inequality condition — the anchor set is the broadcast side " +
      "(ann_topk_exact's shape); at scale the generator swaps to the " +
      "ivf/lsh probe path, label filter and top-k window unchanged"),
    "retrieval_metrics" -> ("the retrieval under test IS ann_topk_exact's " +
      "broadcast-query × corpus brute force (swap in the ivf/lsh candidate " +
      "generator at scale, metrics unchanged); all metric arithmetic runs " +
      "on |Q|·k rows plus a broadcast ≤|labels|-row total"),
    "dsir_weights" -> ("two broadcast 1-row crossJoins: the raw-corpus " +
      "(total, vocab) aggregate and the target-corpus token total — the " +
      "unigram_logprob LM-denominator pattern, twice"),
    "profile_table_approx" -> ("verdict harness: crossJoin of TWO broadcast " +
      "1-row aggregates (exact baseline × approx production row); the " +
      "production path is the approx aggregation alone — no Expand, " +
      "pinned in RelationalSpec"),
    "rolling_distinct_hll" -> ("24-sketch trailing union = global RANGE " +
      "window over the per-hour sketch aggregate (<=|hours| rows — " +
      "metadata-scale, ~8760/year; the waterfill discipline)"),
    "source_overlap" -> ("zero-fill src×src grid = broadcast crossJoin of " +
      "the per-source size aggregate with itself (<=|sources| rows each " +
      "side — metadata-scale); the shingle pairing stays the EQUI-join " +
      "on the shingle key"))

  test("no unlisted cartesian / BNLJ / unpartitioned window in any gate plan") {
    // Failure-isolated: a query that throws at analysis becomes its own
    // finding instead of aborting the audit — one broken query must not
    // leave the other ~130 plans unaudited.
    val broken = Map.newBuilder[String, String]
    val findings = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (name.startsWith("stream_")) None
      else scala.util.Try(fn(spark, sfDir).queryExecution.sparkPlan) match {
        case scala.util.Failure(e) =>
          broken += name -> e.getMessage.linesIterator.take(1).mkString
          None
        case scala.util.Success(plan) =>
          val hits = plan.collect {
            case _: BroadcastNestedLoopJoinExec => "BNLJ"
            case _: CartesianProductExec => "CARTESIAN"
            case w: WindowExec if w.partitionSpec.isEmpty => "GLOBAL_WINDOW"
          }
          if (hits.isEmpty) None else Some(name -> hits)
      }
    }.toMap
    val unlisted = findings.keySet -- allowed.keySet
    assert(unlisted.isEmpty,
      s"scale anti-pattern in unlisted queries: ${unlisted.toSeq.sorted
        .map(n => s"$n=${findings(n).mkString("+")}").mkString(", ")}")
    val stale = allowed.keySet -- findings.keySet
    assert(stale.isEmpty,
      s"allowlist entries whose plans are now clean (remove them): ${stale.toSeq.sorted.mkString(", ")}")
    val failed = broken.result()
    assert(failed.isEmpty,
      s"queries failing analysis (audited all others first): ${failed.toSeq.sorted
        .map { case (n, m) => s"$n: $m" }.mkString("; ")}")
  }
}
