package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All pure
  * `Column` algebra over Spark's higher-order array functions — fully
  * codegen-friendly, no UDFs, no driver-side state, so every operator
  * scales as a narrow map over the scan.
  *
  * These extend the engine beyond the reference's surface (the reference
  * has no text ops; BASELINE.json's north star asks for them as
  * first-class operators at 100 TB scale).
  */
object TextFunctions {

  /** Whitespace tokens, empties removed. Mirrors
    * `list_filter(string_split(text,' '), x -> x <> '')` so results are
    * oracle-comparable with DuckDB.
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-style pre-tokenizer segmentation pattern: contraction
    * suffixes, optionally space-prefixed letter runs / digit runs /
    * punctuation runs, residual whitespace runs — the GPT-2
    * pre-tokenization family, restricted to the RE2-compatible subset
    * (no lookahead) so match counts reproduce identically on engines
    * with RE2 regexes. A BPE vocabulary merges WITHIN these segments,
    * so the segment count is the standard model-free "how many tokens
    * will this roughly cost" estimator.
    */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Subword-aware token count over [[bpePattern]] (null text = 0). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(coalesce(text, lit("")), lit(bpePattern),
      lit(0))).cast("long")

  /** Distinct-token count — vocabulary richness component. */
  def uniqueTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Total characters across tokens (text length minus whitespace). */
  def tokenChars(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, x) => acc + length(x))

  /** English-ish stopword list used by the quality score and language ID.
    * Tiny on purpose: it broadcasts as literals inside the expression.
    */
  val stopwordsEn: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "on", "for", "it",
      "with", "as", "at", "by")

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))
      .cast("long")

  /** Stopword hits (quality signal: natural prose has some; keyboard mash
    * and boilerplate have none or all).
    */
  def stopwordCount(text: Column): Column = hitCount(tokens(text), stopwordsEn)

  /** Document quality score in [0,1]: blend of vocabulary richness
    * (unique/total tokens), a stopword-presence band, and a mean-token-
    * length band — the standard cheap pre-filter shape for LLM corpus
    * cleaning (length/punct/stopword heuristics). Deterministic double
    * algebra, identical on any engine that divides the same longs.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val uniq = size(array_distinct(toks)).cast("double")
    val stop = hitCount(toks, stopwordsEn).cast("double")
    val chars = aggregate(toks, lit(0L), (acc, x) => acc + length(x))
      .cast("double")
    val richness = when(n > 0, uniq / n).otherwise(0.0)
    val stopRatio = when(n > 0, stop / n).otherwise(0.0)
    val meanLen = when(n > 0, chars / n).otherwise(0.0)
    // stopword sweet spot ~[0.05, 0.6]; mean token length sweet spot [3, 10]
    val stopOk = when(stopRatio.between(0.05, 0.6), 1.0).otherwise(0.0)
    val lenOk = when(meanLen.between(3.0, 10.0), 1.0).otherwise(0.0)
    // deliberately unrounded: the raw double algebra is bit-identical on
    // any IEEE engine, while rounding introduces exact-tie divergence
    richness * 0.5 + stopOk * 0.25 + lenOk * 0.25
  }

  /** Tiny per-language marker wordlists for the n-gram/stopword language
    * heuristic. Real pipelines use char-n-gram profiles (e.g. CLD-style);
    * the heuristic keeps the operator closed-form and oracle-checkable.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "est", "que"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "zai4", "wo3", "you3", "he2"))

  /** Language ID: argmax of marker-word hits, first-listed language wins
    * ties (deterministic). Returns "und" when nothing matches.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.map { case (lang, words) =>
      lang -> hitCount(toks, words)
    }
    val best = scores.tail.foldLeft(scores.head._2)((m, s) => greatest(m, s._2))
    scores.foldRight(lit("und")) { case ((lang, sc), rest) =>
      when(best > 0 && sc === best, lit(lang)).otherwise(rest)
    }
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text.
    * The canonical exact-dedup key: two documents that differ only in case
    * or spacing collide. (DuckDB mirror needs the 'g' regex flag.)
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** PII/noise scrubbing for corpus cleaning: mask emails, URLs, and long
    * digit runs with stable placeholder tokens. Patterns stay in the
    * RE2-compatible subset (no backreferences/lookaround) so the same
    * regex text runs identically on any engine.
    */
  def scrub(text: Column): Column = {
    val noEmail = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val noUrl = regexp_replace(noEmail,
      "https?://[^ ]+", "<URL>")
    regexp_replace(noUrl, "[0-9]{6,}", "<NUM>")
  }

  /** Word n-gram shingles (default trigrams) — the unit set for MinHash /
    * Jaccard near-dup. `sequence` + `slice` keeps it inside codegen.
    *
    * PERF: this convenience form re-tokenizes `text` once per reference
    * inside the expression (the slice runs per shingle). Hot paths must
    * tokenize into a separate projection first and call
    * [[shinglesFromTokens]] on the resulting ATTRIBUTE — slicing a
    * materialized array is O(n), re-splitting a string per shingle is
    * O(tokens × shingles).
    */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(text), n)

  /** Shingles over an already-tokenized array column (see [[shingles]]). */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
}
