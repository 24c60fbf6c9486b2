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

  /** Deterministic document fingerprint (polynomial rolling hash via a
    * codegen'd native expression).
    */
  def fingerprint(text: Column): Column = PolyHash(text)
}
