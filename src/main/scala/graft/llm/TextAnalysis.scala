package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PolyHash

/** Text-analysis operators for training-data pipelines (SURVEY.md
  * §2.11): tokenization, language ID, quality scoring, token counting,
  * fingerprinting. All pure Column expressions (whole-stage codegen,
  * no UDFs) so they run at scan speed over 100 TB — the only shuffle
  * any of these needs is the caller's own aggregation, if any.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Per-language stopword profiles for the n-gram/stopword language
    * heuristic. Small on purpose: broadcast as literals into codegen.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "nicht", "mit"),
    "en" -> Seq("a", "the", "of", "and", "to", "in", "is", "it"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pour"))

  /** Number of profile-word hits (duplicates counted) for one profile. */
  def profileHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, w => w.isInCollection(words)))

  /** Predicted language: argmax of profile hits, ties broken by
    * profile order (de < en < fr), no hits ⇒ "und".
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langProfiles.map { case (lang, ws) => lang -> profileHits(toks, ws) }
    // fold: keep (bestLang, bestScore); strict > so earlier profile wins ties
    val (bestLang, bestScore) = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bl, bs), (lang, sc)) =>
        (when(sc > bs, lit(lang)).otherwise(bl), when(sc > bs, sc).otherwise(bs))
    }
    when(bestScore > 0, bestLang).otherwise(lit("und"))
  }

  /** doc stats: token count, distinct tokens, avg/max token length. */
  def stats(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_uniq"),
        (aggregate(transform(col("toks"), w => length(w)), lit(0), (a, x) => a + x)
          .cast("double") / size(col("toks"))).as("avg_token_len"),
        array_max(transform(col("toks"), w => length(w))).as("max_token_len"))
  }

  /** Quality heuristic: 3 binary criteria → score 0..3, pass = 3.
    * Mirrors the length/uniqueness/word-shape filters used by public
    * LLM-corpus pipelines (C4-style heuristics).
    */
  def quality(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.select(col("doc_id"),
        size(toks).as("n_tokens"),
        (aggregate(transform(toks, w => length(w)), lit(0), (a, x) => a + x)
          .cast("double") / size(toks)).as("avg_len"),
        (size(array_distinct(toks)).cast("double") / size(toks)).as("uniq_ratio"))
      .select(col("doc_id"),
        (col("n_tokens") >= 20 && col("n_tokens") <= 1000).cast("int").as("len_ok"),
        (col("avg_len") >= 2.0 && col("avg_len") <= 12.0).cast("int").as("shape_ok"),
        (col("uniq_ratio") >= 0.2).cast("int").as("uniq_ok"))
      .select(col("doc_id"), col("len_ok"), col("shape_ok"), col("uniq_ok"),
        (col("len_ok") + col("shape_ok") + col("uniq_ok")).as("quality_score"))
  }

  /** BPE-ish subword count: runs of letters, runs of digits, single
    * punctuation — the pre-tokenization regex shape used by GPT-2-like
    * tokenizers, kept to a dialect-portable character-class subset.
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"))

  /** Gopher-style repetition metrics (Rae et al. 2021 §A1.1: docs
    * dominated by a few repeated n-grams are boilerplate/spam):
    * per-doc top-bigram fraction, duplicate-bigram fraction, and
    * duplicate-token fraction. Pure Column expressions — no shuffle,
    * scan speed at 100 TB. Occurrence counts come from a SORT + one
    * run-length pass per row (O(n log n)), not the naive
    * O(distinct × n) count-each-distinct form (HOF lambdas are
    * interpreted per element; the naive form measured 9.6 s vs
    * ~1 s at sf0.1 for identical results). Fractions are exact-int
    * divisions → identical double bits across engines; docs with
    * < 2 tokens yield nulls.
    */
  /** `parallelism > 0` inserts a repartition between bigram
    * generation and the metric pass. Two real effects at once: (a) an
    * exchange is a hard optimizer barrier, so CollapseProject cannot
    * inline the sorted-bigram array into its several consumers and
    * re-evaluate it per reference (HOF projections are interpreted —
    * no codegen CSE rescues them); (b) small single-row-group parquet
    * inputs scan as ONE task regardless of maxPartitionBytes, and the
    * shuffle spreads the CPU-dense pass across cores. At production
    * scale with many multi-GB files, leave it 0 — scan splits already
    * parallelize, and the shuffle would cost a full corpus pass.
    */
  def repetition(df: DataFrame, textCol: String, parallelism: Int = 0): DataFrame = {
    val toks = tokens(col(textCol))
    val bg = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array())
    // repartition the RAW rows so the expensive interpreted-HOF
    // projection runs across cores, not in the (possibly single) scan
    // task. A bare repartition is NOT enough: Catalyst pushes
    // deterministic projections straight through it, landing the
    // heavy compute back in the scan task — the localCheckpoint cuts
    // lineage so the projection stays above the exchange (cheap here:
    // it materializes only the raw id+text rows).
    val src = if (parallelism > 0)
      df.select(col("doc_id"), col(textCol)).repartition(parallelism)
        .localCheckpoint(true)
    else df
    val base = src.select(col("doc_id"), toks.as("toks"),
        array_sort(bg).as("sb"))
      .select(col("doc_id"), col("toks"), col("sb"), size(col("sb")).as("nb"))
    // longest run in the sorted array = max occurrence count
    val maxRun = aggregate(col("sb"),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("maxv")),
      (a, x) => {
        val r = when(x === a.getField("prev"), a.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), r.as("run"), greatest(a.getField("maxv"), r).as("maxv"))
      },
      a => a.getField("maxv"))
    // an element is a singleton iff it differs from both sorted
    // neighbors; occurrences in ≥2-count bigrams = nb − singletons.
    // (guarded element_at args stay in [1, nb] — the boolean guard
    // already decides the boundary cases)
    val singletons = size(filter(col("sb"), (x, i) =>
      (i === 0 || x =!= element_at(col("sb"), greatest(i, lit(1)))) &&
        (i === col("nb") - 1 || x =!= element_at(col("sb"), least(i + 2, col("nb"))))))
    base.select(col("doc_id"),
      col("nb").as("n_bigrams"),
      when(col("nb") > 0,
        maxRun.cast("double") / col("nb").cast("double")).as("top_bigram_frac"),
      when(col("nb") > 0,
        (col("nb") - singletons).cast("double") / col("nb").cast("double"))
        .as("dup_bigram_frac"),
      when(size(col("toks")) > 0,
        lit(1.0) - size(array_distinct(col("toks"))).cast("double")
          / size(col("toks")).cast("double"))
        .as("dup_token_frac"))
  }

  /** Pattern scrubbing (PII/boilerplate removal shape): replace every
    * match of `pattern` with `replacement` and count the matches —
    * the email/URL/id-scrub primitive of a production corpus cleaner,
    * as two codegen'd regex expressions (single scan, no UDF).
    */
  def scrub(df: DataFrame, textCol: String, pattern: String,
      replacement: String): DataFrame =
    df.select(col("doc_id"),
      regexp_replace(col(textCol), pattern, replacement).as("clean_text"),
      regexp_count(col(textCol), lit(pattern)).as("n_scrubbed"))

  /** Deterministic document fingerprint (polynomial rolling hash via a
    * codegen'd native expression).
    */
  def fingerprint(text: Column): Column = PolyHash(text)
}
