package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. No UDFs,
  * no driver-side state — every operator scales as a narrow map over
  * the scan. The per-token kernels are native codegen'd expressions
  * ([[graft.expressions.TextKernels]]); the round-3 higher-order-array
  * formulations were retired after interpreted HOF call sites were
  * measured degrading 100x+ in long-lived JVMs (see TextKernels
  * scaladoc; the HOF versions survive in the specs as the semantics
  * reference the natives are asserted against).
  *
  * These extend the engine beyond the reference's surface (the reference
  * has no text ops; BASELINE.json's north star asks for them as
  * first-class operators at 100 TB scale).
  */
object TextFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

  /** Whitespace tokens, empties removed. Mirrors
    * `list_filter(string_split(text,' '), x -> x <> '')` so results are
    * oracle-comparable with DuckDB.
    */
  def tokens(text: Column): Column =
    toCol(graft.expressions.TokenArray(toExpr(text)))

  /** Compression-ratio repetitiveness signal
    * ([[graft.expressions.DeflateRatio]]): deflated/raw UTF-8 length —
    * low = degenerate repetition, natural prose ~0.4-0.8.
    */
  def compressionRatio(text: Column): Column =
    toCol(graft.expressions.DeflateRatio(toExpr(text)))

  /** One-pass native token statistics
    * ([[graft.expressions.TokenProfile]]): struct<n_tokens, n_unique,
    * n_chars, hits> where hits(0) counts [[stopwordsEn]] occurrences
    * and hits(1..5) the [[langMarkers]] lists in declaration order.
    * Always built with the SAME canonical word-list vector so every
    * call site's instance is equal — whole-stage codegen's
    * subexpression elimination then folds all stats selected in one
    * projection into a single tokenizer pass.
    */
  private def profile(text: Column): Column =
    toCol(graft.expressions.TokenProfile(toExpr(text),
      stopwordsEn +: langMarkers.map(_._2)))

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = profile(text).getField("n_tokens")

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
    profile(text).getField("n_unique")

  /** Total characters across tokens (text length minus whitespace). */
  def tokenChars(text: Column): Column =
    profile(text).getField("n_chars")

  /** English-ish stopword list used by the quality score and language ID.
    * Tiny on purpose: it broadcasts as literals inside the expression.
    */
  val stopwordsEn: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "on", "for", "it",
      "with", "as", "at", "by")

  /** Stopword hits (quality signal: natural prose has some; keyboard mash
    * and boilerplate have none or all).
    */
  def stopwordCount(text: Column): Column =
    element_at(profile(text).getField("hits"), 1)

  /** Document quality score in [0,1]: blend of vocabulary richness
    * (unique/total tokens), a stopword-presence band, and a mean-token-
    * length band — the standard cheap pre-filter shape for LLM corpus
    * cleaning (length/punct/stopword heuristics). Deterministic double
    * algebra, identical on any engine that divides the same longs.
    */
  def qualityScore(text: Column): Column = {
    val p = profile(text)
    val n = p.getField("n_tokens").cast("double")
    val uniq = p.getField("n_unique").cast("double")
    val stop = element_at(p.getField("hits"), 1).cast("double")
    val chars = p.getField("n_chars").cast("double")
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
    val hits = profile(text).getField("hits")
    // hits(0) is the stopword list; language lists follow in order
    val scores = langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(hits, i + 2)
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

  /** Character-count common prefix of two strings, capped — the
    * prefix-cache locality kernel ([[graft.expressions.CommonPrefixChars]];
    * one byte walk replacing a cap-term substring tower).
    */
  def commonPrefixChars(a: Column, b: Column, cap: Int): Column =
    toCol(graft.expressions.CommonPrefixChars(toExpr(a), toExpr(b), cap))

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
    * Jaccard near-dup. Native one-pass kernel
    * ([[graft.expressions.ShingleArray]]); tokenization and shingling
    * each run exactly once per row regardless of how Catalyst inlines
    * the expression (the retired HOF form re-ran the token slice per
    * shingle when pushdown inlined it).
    */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(text), n)

  /** Shingles over an already-tokenized array column (see [[shingles]]). */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    toCol(graft.expressions.ShingleArray(toExpr(toks), n))
}
