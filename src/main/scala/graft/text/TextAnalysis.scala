package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, and document
  * fingerprinting.
  *
  * Everything here is a pure `Column` expression over built-in Catalyst
  * functions (split/regexp/array lambdas/md5) — whole-stage codegen'd,
  * no UDFs, no driver-side state — so each operator is a single
  * narrow-dependency projection that scales linearly with input splits
  * and never shuffles. (The reference pipeline has no text analytics;
  * this is the training-data extension surface required by the build
  * brief, designed Spark-first.)
  */
object TextAnalysis {

  /** Lowercased whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = tokenCountOf(tokens(text))

  /** Token count over a pre-staged token array. The `*Of` variants let a
    * composed pipeline (e.g. the curation query) stage `tokens(text)` as
    * ONE column and feed every metric from it — the text-only forms
    * inline a fresh tokenization per use, which multiplies the dominant
    * split/lower cost by the number of metrics.
    */
  def tokenCountOf(toks: Column): Column = size(toks)

  /** BPE-ish token count: runs of letters, single digits, or single
    * non-alphanumeric marks — a deterministic proxy for subword tokenizer
    * cost (GPT-2-style pre-tokenization without the merges table).
    */
  val bpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0)))

  /** English stopword list used by the quality heuristics (fixed, small —
    * inlined into the generated code as an array literal).
    */
  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "from", "this")

  /** Fraction of tokens that are stopwords (0 for empty docs). */
  def stopwordRatio(text: Column): Column = stopwordRatioOf(tokens(text))

  def stopwordRatioOf(toks: Column): Column = {
    val stops = array(englishStopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        size(filter(toks, t => array_contains(stops, t))).cast("double")
          / size(toks))
  }

  /** Fraction of characters that are punctuation marks. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        size(regexp_extract_all(text, lit("[!-/:-@\\[-`{-~]"), lit(0)))
          .cast("double") / length(text))

  /** Mean token length in characters (0 for empty docs). */
  def meanTokenLength(text: Column): Column = meanTokenLengthOf(tokens(text))

  def meanTokenLengthOf(toks: Column): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        // Σ length(tok) ≡ length of the separator-less concatenation —
        // native codegen'd string ops instead of an interpreted
        // higher-order aggregate over every token
        length(array_join(toks, "")).cast("long").cast("double")
          / size(toks))

  /** Composite quality score in [0,1] — the standard pretraining-corpus
    * heuristics (C4/Gopher-style): enough tokens, sane mean word length,
    * not punctuation-soup, some (but not all) stopwords.
    *
    *   0.25 · [5 ≤ n_tokens ≤ 100k]
    * + 0.25 · [2 ≤ mean_token_len ≤ 12]
    * + 0.25 · [punct_ratio ≤ 0.2]
    * + 0.25 · [0 < stopword_ratio ≤ 0.6]
    */
  def qualityScore(text: Column): Column =
    qualityScoreOf(text, tokens(text))

  /** [[qualityScore]] over a pre-staged token array (punctuation ratio
    * still reads the raw text).
    */
  def qualityScoreOf(text: Column, toks: Column): Column = {
    val n = tokenCountOf(toks)
    val mtl = meanTokenLengthOf(toks)
    val pr = punctRatio(text)
    val sr = stopwordRatioOf(toks)
    val b = (c: Column) => when(c, lit(0.25)).otherwise(lit(0.0))
    b(n >= 5 && n <= 100000) +
      b(mtl >= 2.0 && mtl <= 12.0) +
      b(pr <= 0.2) +
      b(sr > 0.0 && sr <= 0.6)
  }

  /** Marker stopwords per language for the n-gram-free lang-ID heuristic.
    * Deliberately tiny and disjoint: the operator's contract is the
    * argmax formula, not lexicon completeness.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "for", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "une", "dans"),
    "es" -> Seq("el", "los", "que", "y", "es", "no", "una", "para"))

  /** Per-language marker-token hit count. */
  def langScore(text: Column, markers: Seq[String]): Column =
    langScoreOf(tokens(text), markers)

  def langScoreOf(toks: Column, markers: Seq[String]): Column = {
    val m = array(markers.map(lit): _*)
    size(filter(toks, t => array_contains(m, t)))
  }

  /** Language ID: CJK-character ratio short-circuits to `zh`; otherwise
    * the marker-count argmax over {en,de,fr,es}, `und` (undetermined)
    * when no marker hits. Ties break in declaration order (en first).
    */
  def langId(text: Column): Column = langIdOf(text, tokens(text))

  /** [[langId]] over a pre-staged token array (CJK ratio still reads the
    * raw text).
    */
  def langIdOf(text: Column, toks: Column): Column = {
    val cjk = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val scores = langMarkers.map { case (l, ms) => (l, langScoreOf(toks, ms)) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val argmax = scores.reverse.foldLeft(lit("und")) {
      case (acc, (l, s)) => when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    when(cjk > 0 && cjk * 2 >= length(text), lit("zh")).otherwise(argmax)
  }

  /** Non-empty trimmed lines of a document. */
  def lines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")

  /** Fraction of lines that duplicate an earlier line of the same
    * document (0 for empty docs) — the CCNet/Gopher within-document
    * repetition signal: boilerplate-heavy and template-generated pages
    * score high and get filtered before training.
    */
  def dupLineFraction(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) === 0, lit(0.0))
      .otherwise(
        (size(ls) - size(array_distinct(ls))).cast("double") / size(ls))
  }

  /** Word bigrams of a staged token array (empty below 2 tokens). */
  def bigramsOf(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", slice(toks, i, lit(2)))))

  /** Word k-gram shingles of the token stream. Documents shorter than k
    * tokens get a single shingle holding the whole token stream, so
    * set-similarity on shingles degrades to exact match for short docs
    * (never an empty set, which would make all short docs mutually
    * "identical").
    */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(
        transform(
          sequence(lit(1), size(toks) - (k - 1)),
          i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** Document fingerprint: the minimum md5 over word k-gram shingles —
    * a deterministic rolling-hash content signature (winnowing with one
    * window spanning the document). Documents sharing any near-identical
    * prefix/suffix k-grams collide with probability proportional to
    * overlap; identical documents always collide. Docs shorter than k
    * tokens hash their whole token stream (the singleton shingle).
    */
  def fingerprint(text: Column, k: Int = 8): Column =
    // native codegen shingle+md5+min loop — value-identical to
    // array_min(transform(shingles(text, k), md5)) (spec-asserted), but
    // with no interpreted higher-order functions and no intermediate
    // shingle/digest arrays
    graft.functions.FingerprintMinMd5(tokens(text), k)

  /** The interpreted column formulation of [[fingerprint]], kept as the
    * differential witness for the native expression.
    */
  def fingerprintHof(text: Column, k: Int = 8): Column =
    array_min(transform(shingles(text, k), s => md5(s)))
}
