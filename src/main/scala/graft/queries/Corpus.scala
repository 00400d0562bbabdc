package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** The training-data-pipeline surface over the `documents` and
  * `embeddings` corpus tables: text analysis, deduplication, and
  * similarity search. Every deterministic operator carries a DuckDB
  * oracle that mirrors the exact formula (md5-based hashing keeps even
  * MinHash/SimHash engine-independent); only the seeded-random LSH-ANN
  * variant is rows-only.
  *
  * Numeric discipline: ratios are single divisions of exact integers
  * (bit-identical across engines); cosine similarities are sequential
  * double sums rounded to 6 decimals on output in both engines.
  */
object Corpus {

  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Round-robin exchange ONLY when the scan cannot already feed every
    * core. The sf fixtures are single-row-group parquet files (1-2
    * input splits), where a regex-heavy projection would otherwise
    * serialize on one thread; at real scale the input has thousands of
    * splits and the same unconditional `repartition` would be a full
    * shuffle of the text corpus that buys nothing — so the exchange is
    * guarded on the actual scan parallelism (`rdd.getNumPartitions` is
    * planning-time file-split math, no job runs).
    */
  private def spreadScan(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  // DuckDB oracle fragment: the same normalized token stream
  // TextAnalysis.tokens produces.
  private val toksSql =
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

  /** The oracle token-stream fragment for queries living outside this
    * object (q132's Gini report) — one definition, every consumer.
    */
  private[queries] def toksSqlPublic: String = toksSql

  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** t38's stopword-rule constants — ONE definition emitted into every
    * plan AND oracle that restates the rule (the t38/q121/q126/q128/
    * q152 scorer's label, t40's contingency label, c10's source
    * signal): the `DriftSplitSql` discipline, so the two engines can
    * never drift on what counts as a stopword or where the ratio
    * threshold sits. The fixture corpus is English-only; a
    * multilingual deployment swaps this set per language.
    */
  private[graft] val StopRuleTokens: Seq[String] = Seq("the", "a")

  /** The rule's stopword count over a token-array column. */
  private[graft] def stopRuleCount(toks: Column): Column =
    size(filter(toks,
      x => StopRuleTokens.map(x === _).reduce(_ || _))).cast("long")

  /** The rule's label: stopword share strictly above 6% — stated in
    * cross-multiplied integers (100·n_stop > 6·n_tok), no float
    * boundary in either engine.
    */
  private[graft] def stopRuleLabel(toks: Column): Column =
    stopRuleCount(toks) * lit(100L) > size(toks).cast("long") * lit(6L)

  /** The SQL IN-list body for the same token set. */
  private[graft] val stopRuleInSql: String =
    StopRuleTokens.map(w => s"'$w'").mkString(", ")

  // ------------------------------------------------------------- text

  /** Token statistics per document: whitespace tokens, BPE-ish subword
    * proxy count, mean token length, stopword and punctuation ratios.
    * One narrow codegen'd projection — no shuffle at any scale.
    */
  val t01_token_stats: Q = (s, dir) => {
    val txt = col("text")
    t(s, dir, "documents")
      .withColumn("__toks", TextAnalysis.tokens(txt)) // tokenize once
      .select(
        col("doc_id"),
        TextAnalysis.tokenCountOf(col("__toks")).cast("long").as("n_tokens"),
        TextAnalysis.bpeishTokenCount(txt).cast("long").as("n_bpeish_tokens"),
        TextAnalysis.meanTokenLengthOf(col("__toks")).as("mean_token_len"),
        TextAnalysis.stopwordRatioOf(col("__toks")).as("stopword_ratio"),
        TextAnalysis.punctRatio(txt).as("punct_ratio"))
  }

  val t01_sql: String =
    s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
       |SELECT doc_id,
       | len(toks) AS n_tokens,
       | len(regexp_extract_all(text, '${TextAnalysis.bpeishPattern}')) AS n_bpeish_tokens,
       | CASE WHEN len(toks) = 0 THEN 0.0
       |      ELSE list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks) END AS mean_token_len,
       | CASE WHEN len(toks) = 0 THEN 0.0
       |      ELSE len(list_filter(toks, x -> list_contains(${sqlList(TextAnalysis.englishStopwords)}, x)))::DOUBLE / len(toks) END AS stopword_ratio,
       | CASE WHEN length(text) = 0 THEN 0.0
       |      ELSE len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]'))::DOUBLE / length(text) END AS punct_ratio
       |FROM t""".stripMargin

  /** Composite quality score per document (C4/Gopher-style heuristics),
    * aggregated into a score histogram.
    */
  val t02_quality_score: Q = (s, dir) =>
    t(s, dir, "documents")
      .withColumn("__toks", TextAnalysis.tokens(col("text"))) // tokenize once
      .select(TextAnalysis.qualityScoreOf(col("text"), col("__toks"))
        .as("quality_score"))
      .groupBy(col("quality_score"))
      .agg(count(lit(1)).as("n_docs"))

  val t02_sql: String = {
    val stops = sqlList(TextAnalysis.englishStopwords)
    s"""WITH t AS (SELECT text, $toksSql AS toks FROM documents),
       |m AS (SELECT
       |  len(toks) AS n,
       |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks) END AS mtl,
       |  CASE WHEN length(text) = 0 THEN 0.0 ELSE len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]'))::DOUBLE / length(text) END AS pr,
       |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE len(list_filter(toks, x -> list_contains($stops, x)))::DOUBLE / len(toks) END AS sr
       | FROM t),
       |q AS (SELECT
       |  (CASE WHEN n >= 5 AND n <= 100000 THEN 0.25 ELSE 0.0 END
       | + CASE WHEN mtl >= 2.0 AND mtl <= 12.0 THEN 0.25 ELSE 0.0 END
       | + CASE WHEN pr <= 0.2 THEN 0.25 ELSE 0.0 END
       | + CASE WHEN sr > 0.0 AND sr <= 0.6 THEN 0.25 ELSE 0.0 END)::DOUBLE AS quality_score
       | FROM m)
       |SELECT quality_score, COUNT(*) AS n_docs FROM q GROUP BY quality_score""".stripMargin
  }

  /** Language-ID over the corpus: predicted language × document count.
    * (The corpus's `lang` labels are synthetic and uncorrelated with the
    * text, so the contract is the deterministic argmax formula, mirrored
    * exactly by the oracle.)
    */
  val t03_lang_id: Q = (s, dir) =>
    t(s, dir, "documents")
      .transform(spreadScan) // parallelism guard: exchange only if the scan is narrow
      .withColumn("__toks", TextAnalysis.tokens(col("text"))) // tokenize once
      .select(TextAnalysis.langIdOf(col("text"), col("__toks"))
        .as("predicted_lang"))
      .groupBy(col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))

  val t03_sql: String = {
    val scoreCols = TextAnalysis.langMarkers.map { case (l, ms) =>
      s"len(list_filter(toks, x -> list_contains(${sqlList(ms)}, x))) AS s_$l"
    }.mkString(",\n  ")
    val langs = TextAnalysis.langMarkers.map(_._1)
    val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l => s"WHEN s_$l = best AND best > 0 THEN '$l'").mkString("\n  ")
    s"""WITH t AS (SELECT text, $toksSql AS toks FROM documents),
       |s AS (SELECT text,
       |  $scoreCols,
       |  len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk
       | FROM t),
       |b AS (SELECT *, $best AS best FROM s),
       |p AS (SELECT CASE WHEN cjk > 0 AND cjk * 2 >= length(text) THEN 'zh'
       |  $cases
       |  ELSE 'und' END AS predicted_lang FROM b)
       |SELECT predicted_lang, COUNT(*) AS n_docs FROM p GROUP BY predicted_lang""".stripMargin
  }

  /** Language-consistency filter — mixed-language detection: the t03
    * language-ID formula applied per fixed 200-char segment, then
    * aggregated per document into (segment count, distinct predicted
    * languages, sorted language list, mixed flag). Documents whose
    * segments disagree are concatenation artifacts, crawler boilerplate
    * sandwiches, or code-switching pages — a corpus-cleaning gate a
    * whole-document argmax (t03) structurally cannot provide, since
    * majority content masks the minority language. Fixed CHARACTER
    * windows may split tokens at boundaries — irrelevant at lang-ID
    * granularity and exactly mirrorable in SQL, where a token-aware
    * segmentation would need the full tokenizer replayed per offset.
    * Shape: one narrow explode (≤ len/200 rows per doc) + one keyed
    * aggregate; no joins, no windows.
    */
  val t31_lang_consistency: Q = (s, dir) =>
    t31Of(t(s, dir, "documents").transform(spreadScan))

  /** t31 over an EXPLICIT corpus frame — shared by the batch query,
    * c10's per-source roll-up, and the streaming read side
    * ([[graft.streaming.StreamingIngest.currentDomainGate]]).
    */
  private[graft] def t31Of(docs: DataFrame): DataFrame = {
    val segLen = 200
    val base = docs
      .withColumn("__nseg",
        greatest(expr(s"(length(text) + ${segLen - 1}) div $segLen"), lit(1L)))
    val segs = base.select(col("doc_id"),
      explode(transform(sequence(lit(0L), col("__nseg") - 1),
        i => col("text").substr((i * lit(segLen) + lit(1)).cast("int"),
          lit(segLen)))).as("__seg"))
    segs
      .select(col("doc_id"),
        TextAnalysis.langIdOf(col("__seg"), TextAnalysis.tokens(col("__seg")))
          .as("__lang"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        count_distinct(col("__lang")).as("n_langs"),
        array_join(array_sort(collect_set(col("__lang"))), ",").as("langs"))
      .withColumn("is_mixed", col("n_langs") > 1)
  }

  val t31_sql: String = {
    val segToks = "list_filter(string_split_regex(lower(seg), '\\s+'), x -> x <> '')"
    val scoreCols = TextAnalysis.langMarkers.map { case (l, ms) =>
      s"len(list_filter(toks, x -> list_contains(${sqlList(ms)}, x))) AS s_$l"
    }.mkString(",\n  ")
    val langs = TextAnalysis.langMarkers.map(_._1)
    val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l => s"WHEN s_$l = best AND best > 0 THEN '$l'").mkString("\n  ")
    s"""WITH d AS (SELECT doc_id, text,
       |    GREATEST((length(text) + 199) // 200, 1) AS nseg FROM documents),
       |g AS (SELECT doc_id, text,
       |    unnest(generate_series(0, nseg - 1)) AS i FROM d),
       |sg AS (SELECT doc_id, substr(text, CAST(i * 200 + 1 AS INT), 200) AS seg
       |       FROM g),
       |t AS (SELECT doc_id, seg, $segToks AS toks FROM sg),
       |s AS (SELECT doc_id,
       |  $scoreCols,
       |  len(regexp_extract_all(seg, '[\\x{4e00}-\\x{9fff}]')) AS cjk,
       |  length(seg) AS seglen
       | FROM t),
       |b AS (SELECT *, $best AS best FROM s),
       |p AS (SELECT doc_id, CASE WHEN cjk > 0 AND cjk * 2 >= seglen THEN 'zh'
       |  $cases
       |  ELSE 'und' END AS lang FROM b)
       |SELECT doc_id, COUNT(*) AS n_segments,
       |  COUNT(DISTINCT lang) AS n_langs,
       |  string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs,
       |  COUNT(DISTINCT lang) > 1 AS is_mixed
       |FROM p GROUP BY doc_id""".stripMargin
  }

  /** Cross-source duplication matrix — for every source pair, how many
    * content fingerprints (t04's min-md5 shingle signature) appear in
    * BOTH sources: the provenance diagnostic that exposes mirror sites,
    * re-crawled feeds, and syndication inside a corpus (a pair sharing
    * most of its fingerprints is one source counted twice — its mixture
    * weight in t15 is a lie until deduped). Shape: fingerprint-keyed
    * distinct-source aggregate, then per-fingerprint source-pair
    * explode — bounded by (sources per fingerprint)², with source
    * cardinality small by nature (it is a catalog key, not content);
    * never a corpus×corpus product.
    */
  val d12_source_overlap: Q = (s, dir) => {
    val fps = t(s, dir, "documents")
      .select(col("source"),
        TextAnalysis.fingerprint(col("text"), k = 8).as("__fp"))
      .distinct()
    val a = fps.select(col("__fp"), col("source").as("source_a"))
    val b = fps.select(col("__fp"), col("source").as("source_b"))
    a.join(b, Seq("__fp"))
      .where(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared_fingerprints"))
  }

  // t04's fingerprint recipe verbatim, keyed by source instead of doc
  val d12_sql: String =
    s"""WITH t AS (SELECT source, $toksSql AS toks FROM documents),
       |sh AS (SELECT source,
       |  CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(generate_series(1, len(toks) - 7),
       |                           i -> array_to_string(toks[i:i+7], ' ')) END AS sh
       | FROM t),
       |fp AS (SELECT DISTINCT source,
       |    list_min(list_transform(sh, x -> md5(x))) AS fp
       |  FROM sh)
       |SELECT a.source AS source_a, b.source AS source_b,
       |  COUNT(*) AS n_shared_fingerprints
       |FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
       |GROUP BY 1, 2""".stripMargin

  /** Readability scoring — Flesch reading-ease and Flesch–Kincaid
    * grade per document, the classic prose-complexity quality signals
    * (too-low ease flags legalese/spam walls; negative or absurd
    * grades flag token soup). Every input is an exact integer count —
    * words, sentence marks ([.!?]+ runs, floor 1), a vowel-group
    * syllable proxy (floor 1 per word) — so the scores are two double
    * divisions over exact integers, and both engines evaluate the
    * same literal coefficients in the same order. One narrow
    * projection; no shuffle at any scale.
    */
  val t32_readability: Q = (s, dir) => {
    val toks = col("__toks")
    val syll = aggregate(
      transform(toks, w =>
        greatest(size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))), lit(1))
          .cast("long")),
      lit(0L), (acc, x) => acc + x)
    val wps = col("n_words").cast("double") / col("n_sentences")
    val spw = col("n_syllables").cast("double") / col("n_words")
    t(s, dir, "documents")
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .where(size(col("__toks")) > 0)
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_words"),
        greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))),
          lit(1)).cast("long").as("n_sentences"),
        syll.as("n_syllables"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 6)
          .as("flesch_ease"),
        round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 6)
          .as("fk_grade"))
  }

  val t32_sql: String =
    s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |m AS (SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
       |      AS n_sentences,
       |    CAST(list_sum(list_transform(toks, w ->
       |      GREATEST(len(regexp_extract_all(w, '[aeiouy]+')), 1)))
       |      AS BIGINT) AS n_syllables
       |  FROM t WHERE len(toks) > 0)
       |SELECT doc_id, n_words, n_sentences, n_syllables,
       |  ROUND(206.835e0 - 1.015e0 * (CAST(n_words AS DOUBLE) / n_sentences)
       |    - 84.6e0 * (CAST(n_syllables AS DOUBLE) / n_words), 6) AS flesch_ease,
       |  ROUND(0.39e0 * (CAST(n_words AS DOUBLE) / n_sentences)
       |    + 11.8e0 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59e0, 6)
       |    AS fk_grade
       |FROM m""".stripMargin

  /** Incremental corpus-stats maintenance — t19's BM25 serving inputs
    * (N, Σdl → avgdl, per-term df) maintained by FOLDING a delta batch
    * into base partials instead of recomputing from raw history: the
    * corpus splits into base (doc_id % 10 ≠ 0) and delta (% 10 = 0)
    * batches, each contributes additive partial states, and
    * [[graft.text.CorpusStats.merge]] (the q49 mergeAggregates
    * machinery) folds them. The ORACLE computes the same stats from
    * the whole corpus in one pass — the hash match is the proof that
    * fold ≡ full recompute, the materialized-view exactness contract
    * for the "continuous corpus" loop (d09's admission counterpart for
    * retrieval stats). Output bounded to df ≥ 25 terms — the filter
    * runs POST-merge (pre-filtered partials would not merge exactly).
    * Shape: one term-keyed shuffle per batch + a 1-row broadcast cross
    * of the totals; cost O(|delta| + |vocab|) at any corpus size.
    */
  val t33_incremental_corpus_stats: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
    val base = docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
    val delta = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val (df, totals) = graft.text.CorpusStats.merge(
      Seq(graft.text.CorpusStats.dfPartial(base, col("__toks")),
        graft.text.CorpusStats.dfPartial(delta, col("__toks"))),
      Seq(graft.text.CorpusStats.totalsPartial(base, col("__toks")),
        graft.text.CorpusStats.totalsPartial(delta, col("__toks"))))
    df.where(col("df") >= 25)
      .crossJoin(broadcast(totals)) // 1-row totals: justified broadcast cross
      .select(col("token"), col("df"), col("n_docs"), col("total_dl"),
        round(col("total_dl").cast("double") / col("n_docs"), 6).as("avgdl"))
  }

  /** Full recompute over the whole corpus in one pass — hash-matching
    * this against the Spark side's two-batch fold proves the fold.
    */
  val t33_sql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |tot AS (SELECT COUNT(*) AS n_docs,
       |  CAST(SUM(len(toks)) AS BIGINT) AS total_dl FROM t),
       |x AS (SELECT doc_id, unnest(list_distinct(toks)) AS token FROM t),
       |df AS (SELECT token, COUNT(*) AS df FROM x GROUP BY token)
       |SELECT token, df, n_docs, total_dl,
       |  ROUND(CAST(total_dl AS DOUBLE) / n_docs, 6) AS avgdl
       |FROM df CROSS JOIN tot WHERE df >= 25""".stripMargin

  /** Unicode NFC normalization — the canonical first text-cleaning
    * step: web corpora carry the same grapheme composed (é = U+00E9)
    * and decomposed (e + U+0301), which silently breaks exact dedup,
    * shingle fingerprints, and token statistics until the corpus is
    * folded to one form. Spark has no built-in normalizer, so this is
    * [[graft.functions.UnicodeNormalize]] — a native codegen
    * `UnaryExpression` over `java.text.Normalizer` (UAX #15), with an
    * allocation-free fast path when the input is already NFC (the
    * dominant case for ASCII-heavy text). The query plants decomposed
    * sequences deterministically (every 'e' → e + combining acute) so
    * the normalizer provably recomposes, then fingerprints the result;
    * the ORACLE reaches the same bytes through DuckDB's independent
    * `nfc_normalize` (utf8proc) — md5 equality is a byte-exact
    * cross-library proof of UAX #15 agreement. Pure narrow projection;
    * no shuffle at any scale.
    */
  val t34_unicode_normalize: Q = (s, dir) => {
    import graft.functions.UnicodeNormalize
    val nfc = UnicodeNormalize(col("__d"), "NFC")
    t(s, dir, "documents")
      .select(col("doc_id"),
        regexp_replace(col("text"), "e", "e\u0301").as("__d"))
      .select(col("doc_id"),
        octet_length(col("__d")).cast("long").as("n_bytes_decomposed"),
        octet_length(nfc).cast("long").as("n_bytes_nfc"),
        (nfc =!= col("__d")).as("changed"),
        md5(nfc.cast("binary")).as("md5_nfc"))
  }

  val t34_sql: String =
    """WITH d AS (SELECT doc_id,
      |  replace(text, 'e', 'e' || chr(769)) AS t FROM documents),
      |n AS (SELECT doc_id, t, nfc_normalize(t) AS nt FROM d)
      |SELECT doc_id, CAST(strlen(t) AS BIGINT) AS n_bytes_decomposed,
      |  CAST(strlen(nt) AS BIGINT) AS n_bytes_nfc,
      |  nt <> t AS changed, md5(nt) AS md5_nfc
      |FROM n""".stripMargin

  /** Winnowing local fingerprints (Schleimer–Wilkerson–Aiken, the MOSS
    * algorithm) — per document, the distinct window-minimum shingle
    * hashes under the rightmost-tie rule, via the native
    * [[graft.functions.WinnowFingerprints]] loop (k=5 shingles, w=4
    * windows). This is the position-robust upgrade of t04's single
    * global min-hash: winnowing GUARANTEES any shared token run of
    * length ≥ w+k−1 contributes at least one common fingerprint
    * (spec-proven on planted docs), at density ~2/(w+1) — the
    * plagiarism/copy-span detector that single-signature schemes
    * cannot be. Pure narrow projection (the fingerprint explode for a
    * copy-detection join would be the d07 inverted-index shape); the
    * ORACLE replays shingle → md5 → window fold → sort in DuckDB list
    * algebra, byte-exact because selections are hex strings.
    */
  val t35_winnowing: Q = (s, dir) => {
    import graft.functions.WinnowFingerprints
    val n = size(col("__toks"))
    val nh = when(n < 5, lit(1)).otherwise(n - 4)
    val nw = greatest(nh - 3, lit(1)).cast("long")
    t(s, dir, "documents")
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), nw.as("n_windows"),
        WinnowFingerprints(col("__toks"), 5, 4).as("__fps"))
      .select(col("doc_id"), col("n_windows"),
        size(col("__fps")).cast("long").as("n_fingerprints"),
        round(size(col("__fps")).cast("double") / col("n_windows"), 6)
          .as("winnow_density"),
        element_at(col("__fps"), 1).as("min_fp"))
  }

  // the selection fold in DuckDB list algebra: rightmost window min ≡
  // left fold taking b when b <= a (positions strictly increase)
  val t35_sql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id,
       |  CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(generate_series(1, len(toks) - 4),
       |                           i -> array_to_string(toks[i:i+4], ' ')) END AS sh
       | FROM t),
       |h AS (SELECT doc_id, list_transform(sh, x -> md5(x)) AS hs FROM sh),
       |w AS (SELECT doc_id, hs, GREATEST(len(hs) - 3, 1) AS nw FROM h),
       |sel AS (SELECT doc_id, nw, list_sort(list_distinct(
       |    list_transform(generate_series(1, nw), i ->
       |      list_reduce(hs[i:LEAST(i + 3, len(hs))],
       |        (a, b) -> CASE WHEN b <= a THEN b ELSE a END)))) AS fps
       |  FROM w)
       |SELECT doc_id, CAST(nw AS BIGINT) AS n_windows,
       |  CAST(len(fps) AS BIGINT) AS n_fingerprints,
       |  ROUND(CAST(len(fps) AS DOUBLE) / nw, 6) AS winnow_density,
       |  fps[1] AS min_fp
       |FROM sel""".stripMargin

  /** Integer quota allocation by the largest-remainder method — the
    * missing half of t15's mixture weights: once per-source sampling
    * PROPORTIONS exist, a real pipeline must turn them into integer
    * per-source quotas that sum EXACTLY to the batch budget (rounding
    * each share independently over- or under-shoots; the
    * largest-remainder / Hamilton method is the canonical fix). All
    * arithmetic is exact integers: floor shares via integer division,
    * the leftover slots distributed by fractional-remainder rank
    * (source name as the deterministic tiebreak), and the invariant
    * Σ final_quota = budget holds by construction (spec-asserted).
    * Shape: one keyed aggregate over the corpus + windows over the
    * catalog-small source frame — the aggregate carries all growth.
    */
  val t36_quota_allocation: Q = (s, dir) =>
    hamiltonQuotas(
      // the ONLY corpus-scale work: one keyed count per source
      t(s, dir, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs")),
      budget = 1000L)

  /** Largest-remainder allocation over a (source, n_docs) frame —
    * factored out of t36 so the scalacheck property can drive it with
    * arbitrary count distributions (Σ final_quota = budget must hold
    * for ALL of them, not just the fixture's).
    */
  def hamiltonQuotas(bySource: DataFrame, budget: Long): DataFrame = {
    // everything below runs on the catalog-small source frame — 1-row
    // broadcast crosses and a theta self-join for the remainder rank
    // (the q65/t15 bounded-frame shape; a global window would funnel
    // through one task AND trip the plan lint, so the rank is a join)
    val total = bySource.agg(sum(col("n_docs")).as("__total"))
    val shares = bySource.crossJoin(broadcast(total))
      .withColumn("remainder",
        pmod(col("n_docs") * budget, col("__total")))
      .withColumn("base_quota",
        // SQL `div`, not Column./ (DOUBLE division, exact only below
        // 2^53) — integral div keeps the identity exact at any corpus
        expr(s"(n_docs * ${budget}L - remainder) div __total"))
    val leftover = shares.agg(
      (lit(budget) - sum(col("base_quota"))).as("__leftover"))
    val cmp = shares.select(col("source").as("__s2"),
      col("remainder").as("__r2"))
    shares.crossJoin(broadcast(leftover))
      .join(cmp,
        col("__r2") > col("remainder") ||
          (col("__r2") === col("remainder") && col("__s2") < col("source")),
        "left")
      .groupBy(col("source"), col("n_docs"), col("base_quota"),
        col("remainder"), col("__leftover"))
      .agg(count(col("__s2")).as("__nbetter"))
      .select(col("source"), col("n_docs"), col("base_quota"),
        col("remainder"),
        (col("base_quota") +
          when(col("__nbetter") < col("__leftover"), 1L).otherwise(0L))
          .as("final_quota"))
  }

  /** The largest-remainder CTE chain over a `(source, n_docs)`
    * relation named `$src` — ONE statement of the allocation spliced
    * by BOTH Hamilton oracles (t36 and c06): two textual copies would
    * let a future tie-break or integer-division edit silently fork
    * the two allocations. Ends in `q(source, n_docs, base_quota,
    * remainder, final_quota)`.
    */
  private def hamiltonSqlCtes(src: String, budget: Long): String =
    s"""ht AS (SELECT source, n_docs, SUM(n_docs) OVER () AS total
       |  FROM $src),
       |hsh AS (SELECT source, n_docs,
       |    CAST((n_docs * $budget) // total AS BIGINT) AS base_quota,
       |    CAST((n_docs * $budget) % total AS BIGINT) AS remainder
       |  FROM ht),
       |hr AS (SELECT *, $budget - SUM(base_quota) OVER () AS leftover,
       |    ROW_NUMBER() OVER (ORDER BY remainder DESC, source) AS rnk
       |  FROM hsh),
       |q AS (SELECT source, n_docs, base_quota, remainder,
       |    CAST(base_quota + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END
       |      AS BIGINT) AS final_quota
       |  FROM hr)""".stripMargin

  val t36_sql: String =
    s"""WITH s AS (SELECT source, COUNT(*) AS n_docs
       |  FROM documents GROUP BY 1),
       |${hamiltonSqlCtes("s", budget = 1000L)}
       |SELECT source, n_docs, base_quota, remainder, final_quota
       |FROM q""".stripMargin

  /** Winnowing copy detection — the pair-finding face of t35: explode
    * each document's winnow fingerprints into an inverted index, drop
    * "stop fingerprints" (df > 50 — boilerplate shared by many docs
    * pairs quadratically and carries no copy signal, the d07
    * stop-shingle discipline), self-join on fingerprint, and keep
    * pairs sharing ≥ 3 local fingerprints. Because winnowing
    * guarantees every shared run of ≥ w+k−1 tokens contributes a
    * common fingerprint, this finds COPY SPANS (quotes, syndication,
    * partial plagiarism) that whole-document similarity misses, at
    * inverted-index cost: the join is keyed on fingerprints whose df
    * is bounded, so candidate pairs are Σ df² over kept fingerprints —
    * never corpus². The ORACLE replays fingerprint selection in DuckDB
    * list algebra and the same bounded join.
    */
  val d13_winnow_copydetect: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.WinnowFingerprints
    val fps = t(s, dir, "documents")
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .withColumn("__fps", WinnowFingerprints(col("__toks"), 5, 4))
      .select(col("doc_id"), explode_outer(col("__fps")).as("fp"))
      .where(col("fp").isNotNull)
    // df via a WINDOW over the fp exchange, not a groupBy+join: both
    // self-join branches then end in the IDENTICAL exchange, which
    // ReuseExchange collapses — the winnow scan runs ONCE, where the
    // aggregate+join formulation ran it four times (plan-asserted in
    // AnalyticOpsSpec). The window key is the fingerprint (high
    // cardinality), and per-key row count is exactly the df being
    // computed — bounded for every key that survives the cut
    val kept = fps
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .where(col("__df") <= 50).drop("__df")
    val a = kept.select(col("fp"), col("doc_id").as("doc_a"))
    val b = kept.select(col("fp"), col("doc_id").as("doc_b"))
    // merge-join hint: at fixture scale Catalyst would broadcast one
    // side, wrapping it in a BroadcastExchange whose canonical form no
    // longer matches the other branch — killing the exchange reuse. At
    // corpus scale both sides are the same large relation (broadcast
    // is impossible anyway), so SMJ is the honest physical shape at
    // every size, and it is what lets the scan run once
    a.hint("merge").join(b.hint("merge"), Seq("fp"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_fps"))
      .where(col("n_shared_fps") >= 3)
  }

  val d13_sql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id,
       |  CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(generate_series(1, len(toks) - 4),
       |                           i -> array_to_string(toks[i:i+4], ' ')) END AS sh
       | FROM t),
       |h AS (SELECT doc_id, list_transform(sh, x -> md5(x)) AS hs FROM sh),
       |sel AS (SELECT doc_id, list_distinct(
       |    list_transform(generate_series(1, GREATEST(len(hs) - 3, 1)), i ->
       |      list_reduce(hs[i:LEAST(i + 3, len(hs))],
       |        (a, b) -> CASE WHEN b <= a THEN b ELSE a END))) AS fps
       |  FROM h),
       |f AS (SELECT doc_id, unnest(fps) AS fp FROM sel),
       |dfc AS (SELECT fp, COUNT(*) AS df FROM f GROUP BY fp),
       |k AS (SELECT f.doc_id, f.fp FROM f JOIN dfc USING (fp) WHERE df <= 50)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  COUNT(*) AS n_shared_fps
       |FROM k a JOIN k b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING COUNT(*) >= 3""".stripMargin

  // ------------------------------------------------------------ t37 BPE

  private val bpeModels =
    scala.collection.concurrent.TrieMap[String, graft.text.Bpe.Merges]()

  private def bpeMergesPath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/bpe_merges_$key.parquet"
  }

  private def bpeModel(s: SparkSession, dir: String): graft.text.Bpe.Merges =
    bpeModels.getOrElseUpdate(dir, {
      // bounded, deterministic training sample: the corpus word-
      // frequency table capped at 4096 rows by (freq desc, token asc)
      // — one keyed aggregate + a driver fit, the PqCodebook.fit
      // discipline (tokenizers are always trained on samples)
      val vocab = t(s, dir, "documents")
        .select(explode_outer(TextAnalysis.tokens(col("text"))).as("token"))
        .where(col("token").isNotNull)
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token").asc)
        .limit(4096)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val m = graft.text.Bpe.train(vocab, nMerges = 48)
      import s.implicits._
      m.lefts.indices.map(i => (i, m.lefts(i), m.rights(i)))
        .toDF("rank", "lft", "rgt")
        .coalesce(1).write.mode("overwrite").parquet(bpeMergesPath(dir))
      m
    })

  /** REAL BPE tokenization ([[graft.text.Bpe]] — Sennrich et al. ACL
    * 2016): a merge table is trained on the corpus's bounded
    * word-frequency sample, dumped for the oracle, and applied to
    * every document by the native [[graft.functions.BpeSubwords]]
    * expression — upgrading t01's "BPE-ish regex proxy" to an actual
    * learned subword segmenter. Output per document: token and
    * subword counts, fertility (subwords per token — THE tokenizer
    * quality metric), and an md5 digest of the full subword stream so
    * the segmentation itself is hash-checked, not just its length.
    *
    * One narrow projection over the corpus (the fit is driver-side
    * and amortized); no shuffle at any scale. The oracle replays the
    * apply rule — leftmost occurrence of the lowest-rank pair, one
    * merge per step — as a DuckDB recursive CTE over the DISTINCT
    * token vocabulary (segmentation is per-type, not per-occurrence),
    * then joins segments back to token positions.
    */
  val t37_bpe_encode: Q = (s, dir) => {
    val m = bpeModel(s, dir)
    t(s, dir, "documents").transform(spreadScan)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .withColumn("__subs", graft.functions.BpeSubwords(col("__toks"), m))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("n_subwords", size(col("__subs")).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("n_subwords"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("n_subwords").cast("double") / col("n_tokens"), 6))
          .as("fertility"),
        md5(concat_ws(" ", col("__subs"))).as("subword_md5"))
  }

  /** The shared recursive-CTE prefix of the BPE oracles: merge table +
    * per-doc token positions + per-TYPE segmentation (token → syms,
    * leftmost-lowest-rank, one merge per step). t37 (flat stream) and
    * t42 (marked round-trip) both state their report over `tokpos` +
    * `fin` — one definition of the replayed apply rule, two consumers.
    */
  /** The per-doc token-position + distinct-vocab CTEs every
    * tokenizer oracle segments over — ONE statement for the BPE
    * prefix, the unigram DP, and the t46 scorecard (a drift in what
    * counts as a token position would silently desynchronize the
    * tokenizer family's oracles).
    */
  private def tokposSqlCtes: String =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |tp0 AS (SELECT doc_id, toks,
       |          unnest(generate_series(1, len(toks))) AS pos FROM t),
       |tokpos AS (SELECT doc_id, pos, toks[pos] AS token FROM tp0),
       |vocab AS (SELECT DISTINCT token FROM tokpos)""".stripMargin

  private def bpeSegPrefixSql: String =
    s"""WITH RECURSIVE
       |mg AS (SELECT rank, lft, rgt
       |       FROM read_parquet('${bpeMergesPath(oracleSfDir)}/*.parquet')),
       |$tokposSqlCtes,
       |enc AS (
       |  SELECT token, list_transform(generate_series(1, length(token)),
       |           i -> substr(token, i, 1)) AS syms, 0 AS iter
       |  FROM vocab
       |  UNION ALL
       |  SELECT token,
       |    list_concat(list_concat(list_slice(syms, 1, bp - 1),
       |        [syms[bp] || syms[bp + 1]]),
       |      list_slice(syms, bp + 2, len(syms))) AS syms,
       |    iter + 1 AS iter
       |  FROM (
       |    SELECT x.token, x.syms, x.iter, x.i AS bp,
       |      ROW_NUMBER() OVER (PARTITION BY x.token, x.iter
       |                         ORDER BY m.rank, x.i) AS rn
       |    FROM (
       |      SELECT e.token, e.syms, e.iter,
       |        unnest(generate_series(1, len(e.syms) - 1)) AS i
       |      FROM enc e
       |    ) x
       |    JOIN mg m ON m.lft = x.syms[x.i] AND m.rgt = x.syms[x.i + 1]
       |  ) WHERE rn = 1
       |),
       |fin AS (SELECT token, syms FROM (
       |  SELECT token, syms, ROW_NUMBER() OVER (PARTITION BY token
       |      ORDER BY iter DESC) AS rn FROM enc) WHERE rn = 1)""".stripMargin

  def t37_sql: String =
    s"""$bpeSegPrefixSql,
       |agg AS (SELECT tp.doc_id,
       |    COUNT(*) AS n_tokens,
       |    CAST(SUM(len(f.syms)) AS BIGINT) AS n_subwords,
       |    string_agg(array_to_string(f.syms, ' '), ' ' ORDER BY tp.pos)
       |      AS joined
       |  FROM tokpos tp JOIN fin f ON f.token = tp.token
       |  GROUP BY tp.doc_id)
       |SELECT d.doc_id,
       |  COALESCE(a.n_tokens, 0) AS n_tokens,
       |  COALESCE(a.n_subwords, 0) AS n_subwords,
       |  CASE WHEN COALESCE(a.n_tokens, 0) = 0 THEN 0.0
       |       ELSE ROUND(CAST(a.n_subwords AS DOUBLE) / a.n_tokens, 6)
       |  END AS fertility,
       |  md5(COALESCE(a.joined, '')) AS subword_md5
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** t42: BPE DECODE — the inverse t37 never had, closing the
    * tokenizer round-trip. The flattened t37 stream is not decodable
    * (word boundaries are gone), so the encode side emits the
    * standard Sennrich et al. continuation notation instead: every
    * non-final subword of a word carries the "@@" suffix
    * ([[graft.functions.BpeSubwords.marked]]). Decode is then a pure
    * string rewrite — join the stream with spaces and delete every
    * `"@@ "` — identical in both engines, and `encode ∘ decode = id`
    * becomes checkable: the query reports the decoded stream's md5
    * AND a per-document `roundtrip_ok` that both engines must agree
    * on (scalacheck additionally proves the identity for arbitrary
    * marker-free token arrays under arbitrary trained tables; a
    * token that itself contains "@@" is the notation's documented
    * blind spot, absent from the whitespace-token corpus).
    *
    * Same scale shape as t37: one narrow projection, the merge table
    * rides into codegen as a reference object, no shuffle. The
    * oracle replays segmentation through the shared
    * [[bpeSegPrefixSql]] recursive CTE, marks per TYPE, reassembles
    * per document in token order, and decodes with the same one-line
    * rewrite — so a hash match proves the marked stream, the decode
    * rule, and the round-trip verdict all agree cross-engine.
    */
  val t42_bpe_roundtrip: Q = (s, dir) => {
    val m = bpeModel(s, dir)
    t(s, dir, "documents").transform(spreadScan)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .withColumn("__marked",
        graft.functions.BpeSubwords.marked(col("__toks"), m))
      .withColumn("__stream", concat_ws(" ", col("__marked")))
      .withColumn("__decoded", expr("replace(__stream, '@@ ', '')"))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(col("__marked")).cast("long").as("n_subwords"),
        (size(col("__marked")) - size(col("__toks"))).cast("long")
          .as("n_continuations"),
        md5(col("__decoded")).as("decoded_md5"),
        (col("__decoded") === concat_ws(" ", col("__toks")))
          .as("roundtrip_ok"))
  }

  def t42_sql: String =
    s"""$bpeSegPrefixSql,
       |mk AS (SELECT token, CAST(len(syms) AS BIGINT) AS nsub,
       |    CASE WHEN len(syms) <= 1 THEN array_to_string(syms, ' ')
       |         ELSE array_to_string(list_transform(
       |                syms[1:len(syms) - 1], x -> x || '@@'), ' ')
       |              || ' ' || syms[len(syms)] END AS mkstr
       |  FROM fin),
       |agg AS (SELECT tp.doc_id,
       |    COUNT(*) AS n_tokens,
       |    CAST(SUM(k.nsub) AS BIGINT) AS n_subwords,
       |    string_agg(k.mkstr, ' ' ORDER BY tp.pos) AS stream,
       |    string_agg(tp.token, ' ' ORDER BY tp.pos) AS orig
       |  FROM tokpos tp JOIN mk k ON k.token = tp.token
       |  GROUP BY tp.doc_id)
       |SELECT d.doc_id,
       |  CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(a.n_subwords, 0) AS BIGINT) AS n_subwords,
       |  CAST(COALESCE(a.n_subwords, 0) - COALESCE(a.n_tokens, 0)
       |    AS BIGINT) AS n_continuations,
       |  md5(replace(COALESCE(a.stream, ''), '@@ ', '')) AS decoded_md5,
       |  replace(COALESCE(a.stream, ''), '@@ ', '')
       |    = COALESCE(a.orig, '') AS roundtrip_ok
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  // ----------------------------------------- t52 byte-fallback BPE

  private val byteBpeModels =
    scala.collection.concurrent.TrieMap[String, graft.text.Bpe.Merges]()

  private def byteBpeMergesPath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/bytebpe_merges_$key.parquet"
  }

  private def byteBpeModel(s: SparkSession, dir: String): graft.text.Bpe.Merges =
    byteBpeModels.getOrElseUpdate(dir, {
      // same bounded fit sample as t37 (freq desc, token asc, 4096)
      val vocab = t(s, dir, "documents")
        .select(explode_outer(TextAnalysis.tokens(col("text"))).as("token"))
        .where(col("token").isNotNull)
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token").asc)
        .limit(4096)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val m = graft.text.Bpe.trainBytes(vocab, nMerges = 48)
      import s.implicits._
      m.lefts.indices.map(i => (i, m.lefts(i), m.rights(i)))
        .toDF("rank", "lft", "rgt")
        .coalesce(1).write.mode("overwrite").parquet(byteBpeMergesPath(dir))
      m
    })

  /** t52: byte-fallback BPE — the GPT-2-style BYTE-LEVEL alphabet
    * (Radford et al. 2019) that closes the tokenizer family's realism
    * gap for non-ASCII text: t37/t42's char-seeded BPE can only emit
    * symbols built from characters it trained on, while the byte
    * alphabet decomposes ANY string into one of 256 base symbols — no
    * [UNK] exists by construction. Symbols are uppercase UTF-8
    * hex pairs (`hex(encode(token))` split in twos — the same bytes
    * GPT-2 remaps to printable chars, spelled engine-portably), the
    * merge rule is t37's verbatim ([[graft.text.Bpe.trainBytes]] /
    * `encodeBytes` reuse the one merge loop), and the output is t42's
    * round-trip contract: continuation-marked stream, decode =
    * strip markers → un-hex → UTF-8, `roundtrip_ok` per document.
    * BpeSpec's scalacheck property proves encode∘decode = id for
    * arbitrary token arrays INCLUDING multi-byte UTF-8 — the case the
    * char-level family documents as its blind spot.
    *
    * Same scale shape as t37/t42: driver fit on the bounded frequency
    * sample, one narrow codegen projection over the corpus, no
    * shuffle. The oracle re-seeds the shared recursive-CTE replay
    * from hex pairs and decodes with `from_hex` — a hash match
    * certifies segmentation, marking, and the byte-level decode.
    */
  val t52_byte_bpe_roundtrip: Q = (s, dir) => {
    val m = byteBpeModel(s, dir)
    t(s, dir, "documents").transform(spreadScan)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .withColumn("__marked",
        graft.functions.BpeSubwords.markedBytes(col("__toks"), m))
      .withColumn("__stream", concat_ws(" ", col("__marked")))
      .withColumn("__dechex", expr("replace(__stream, '@@ ', '')"))
      .withColumn("__dec", expr(
        "array_join(transform(split(__dechex, ' '), " +
          "h -> decode(unhex(h), 'UTF-8')), ' ')"))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(col("__marked")).cast("long").as("n_subwords"),
        (size(col("__marked")) - size(col("__toks"))).cast("long")
          .as("n_continuations"),
        md5(col("__dec")).as("decoded_md5"),
        (col("__dec") === concat_ws(" ", col("__toks"))).as("roundtrip_ok"))
  }

  /** The byte-BPE segmentation CTE chain (dumped merge table →
    * hex-pair seed → recursive leftmost-lowest-rank merges → final
    * states), with CALLER-CHOSEN CTE names so one definition serves
    * both the t52 oracle (as mg/enc/fin, alone in its statement) and
    * the t46 four-way scorecard (as bmg/benc/bfin, beside the
    * char-BPE/unigram/WordPiece chains). Requires `vocab` in scope.
    */
  private def byteBpeSegSqlCtes(mg: String, enc: String,
      fin: String): String =
    s"""$mg AS (SELECT rank, lft, rgt
       |       FROM read_parquet('${byteBpeMergesPath(oracleSfDir)}/*.parquet')),
       |$enc AS (
       |  SELECT token,
       |    list_transform(generate_series(1, length(hex(encode(token))) // 2),
       |      i -> substr(hex(encode(token)), 2 * i - 1, 2)) AS syms,
       |    0 AS iter
       |  FROM vocab
       |  UNION ALL
       |  SELECT token,
       |    list_concat(list_concat(list_slice(syms, 1, bp - 1),
       |        [syms[bp] || syms[bp + 1]]),
       |      list_slice(syms, bp + 2, len(syms))) AS syms,
       |    iter + 1 AS iter
       |  FROM (
       |    SELECT x.token, x.syms, x.iter, x.i AS bp,
       |      ROW_NUMBER() OVER (PARTITION BY x.token, x.iter
       |                         ORDER BY m.rank, x.i) AS rn
       |    FROM (
       |      SELECT e.token, e.syms, e.iter,
       |        unnest(generate_series(1, len(e.syms) - 1)) AS i
       |      FROM $enc e
       |    ) x
       |    JOIN $mg m ON m.lft = x.syms[x.i] AND m.rgt = x.syms[x.i + 1]
       |  ) WHERE rn = 1
       |),
       |$fin AS (SELECT token, syms FROM (
       |  SELECT token, syms, ROW_NUMBER() OVER (PARTITION BY token
       |      ORDER BY iter DESC) AS rn FROM $enc) WHERE rn = 1)""".stripMargin

  def t52_sql: String =
    s"""WITH RECURSIVE
       |$tokposSqlCtes,
       |${byteBpeSegSqlCtes("mg", "enc", "fin")},
       |mk AS (SELECT token, CAST(len(syms) AS BIGINT) AS nsub,
       |    CASE WHEN len(syms) <= 1 THEN array_to_string(syms, ' ')
       |         ELSE array_to_string(list_transform(
       |                syms[1:len(syms) - 1], x -> x || '@@'), ' ')
       |              || ' ' || syms[len(syms)] END AS mkstr
       |  FROM fin),
       |agg AS (SELECT tp.doc_id,
       |    COUNT(*) AS n_tokens,
       |    CAST(SUM(k.nsub) AS BIGINT) AS n_subwords,
       |    string_agg(k.mkstr, ' ' ORDER BY tp.pos) AS stream,
       |    string_agg(tp.token, ' ' ORDER BY tp.pos) AS orig
       |  FROM tokpos tp JOIN mk k ON k.token = tp.token
       |  GROUP BY tp.doc_id),
       |dec AS (SELECT doc_id, n_tokens, n_subwords, orig,
       |    array_to_string(list_transform(
       |      string_split(replace(stream, '@@ ', ''), ' '),
       |      h -> decode(from_hex(h))), ' ') AS decoded
       |  FROM agg)
       |SELECT d.doc_id,
       |  CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(a.n_subwords, 0) AS BIGINT) AS n_subwords,
       |  CAST(COALESCE(a.n_subwords, 0) - COALESCE(a.n_tokens, 0)
       |    AS BIGINT) AS n_continuations,
       |  md5(COALESCE(a.decoded, '')) AS decoded_md5,
       |  COALESCE(a.decoded, '') = COALESCE(a.orig, '') AS roundtrip_ok
       |FROM documents d LEFT JOIN dec a USING (doc_id)""".stripMargin

  // ------------------------------------------------- t43 unigram-LM

  private val unigramModels =
    scala.collection.concurrent.TrieMap[String, graft.text.Unigram.Model]()

  private def unigramModelPath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/unigram_model_$key.parquet"
  }

  /** The fixed unigram-LM piece-length cap — a train-time parameter
    * (not data-derived), so both the expression and the oracle's
    * recursive CTE state it as the same literal.
    */
  private val UnigramMaxPieceLen = 6

  private def unigramModel(s: SparkSession, dir: String): graft.text.Unigram.Model =
    unigramModels.getOrElseUpdate(dir, {
      // the SAME bounded training sample discipline as bpeModel: the
      // corpus word-frequency table capped at 4096 rows by
      // (freq desc, token asc) — one keyed aggregate + a driver fit
      val vocab = t(s, dir, "documents")
        .select(explode_outer(TextAnalysis.tokens(col("text"))).as("token"))
        .where(col("token").isNotNull)
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token").asc)
        .limit(4096)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val m = graft.text.Unigram.train(vocab,
        vocabSize = 512, maxPieceLen = UnigramMaxPieceLen, iters = 3)
      import s.implicits._
      m.pieces.indices.map(i => (m.pieces(i), m.costs(i)))
        .toDF("piece", "cost")
        .coalesce(1).write.mode("overwrite")
        .parquet(unigramModelPath(dir))
      m
    })

  /** t43: unigram-LM (SentencePiece-style) tokenization
    * ([[graft.text.Unigram]] — Kudo ACL 2018), closing the tokenizer
    * family next to t37/t42's BPE: a piece table is EM-fit on the
    * corpus's bounded word-frequency sample, dumped with its INTEGER
    * costs for the oracle, and applied to every document by the
    * native [[graft.functions.UnigramEncode]] expression — Viterbi
    * min-cost segmentation in pure integer arithmetic (ties to the
    * smallest start position), so both engines reach identical
    * segmentations with no float seam. Output per document: token and
    * piece counts, fertility, the summed Viterbi cost (`total_cost`
    * certifies DP minimality agreement, not just piece counts), and
    * the md5 of the full piece stream.
    *
    * One narrow projection over the corpus (the fit is driver-side
    * and amortized, the table rides into codegen as a reference
    * object); no shuffle at any scale. The oracle replays the DP as a
    * DuckDB recursive CTE over the DISTINCT token vocabulary
    * (segmentation is per-type): position by position, each step
    * scores the ≤ [[UnigramMaxPieceLen]] candidate starts against the
    * dumped table (single-char misses fall back to the unk cost =
    * max cost + 10⁶, the exact train-time definition, restated in SQL
    * from the dump itself so the oracle has no side-channel), keeps
    * the (cost, start) minimum by window rank, and carries the dp and
    * segmentation arrays forward.
    */
  val t43_unigram_encode: Q = (s, dir) => {
    val m = unigramModel(s, dir)
    t(s, dir, "documents").transform(spreadScan)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .withColumn("__enc", graft.functions.UnigramEncode(col("__toks"), m))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(col("__enc").getField("pieces")).cast("long").as("n_pieces"),
        when(size(col("__toks")) === 0, lit(0.0))
          .otherwise(round(
            size(col("__enc").getField("pieces")).cast("double") /
              size(col("__toks")), 6))
          .as("fertility"),
        col("__enc").getField("cost").as("total_cost"),
        md5(concat_ws(" ", col("__enc").getField("pieces"))).as("piece_md5"))
  }

  /** The unigram Viterbi DP CTEs over an upstream `vocab(token)` —
    * ONE statement of the replayed segmentation rule shared by the
    * t43 oracle and the t46 scorecard. Final states land in `ufin`
    * (named apart from the BPE prefix's `fin` so both tokenizers can
    * segment the same vocab in one WITH RECURSIVE).
    */
  private def unigramVitSqlCtes: String = {
    val L = UnigramMaxPieceLen
    s"""vm AS (SELECT piece, cost
       |       FROM read_parquet('${unigramModelPath(oracleSfDir)}/*.parquet')),
       |uk AS (SELECT MAX(cost) + 1000000 AS unk FROM vm),
       |vit AS (
       |  SELECT token, 0 AS i, CAST([0] AS BIGINT[]) AS dp,
       |         CAST([''] AS VARCHAR[]) AS seg
       |  FROM vocab
       |  UNION ALL
       |  SELECT token, p AS i, list_append(dp, cand) AS dp,
       |         list_append(seg, nseg) AS seg
       |  FROM (
       |    SELECT token, p, dp, seg, cand, nseg,
       |      ROW_NUMBER() OVER (PARTITION BY token, p
       |                         ORDER BY cand, j) AS rn
       |    FROM (
       |      SELECT y.token, y.p, y.dp, y.seg, y.j,
       |        y.dp[y.j] + COALESCE(m.cost,
       |          CASE WHEN y.p = y.j THEN uk.unk END) AS cand,
       |        CASE WHEN y.j = 1
       |             THEN substr(y.token, y.j, y.p - y.j + 1)
       |             ELSE y.seg[y.j] || ' ' ||
       |                  substr(y.token, y.j, y.p - y.j + 1)
       |        END AS nseg
       |      FROM (
       |        SELECT v.token, v.i + 1 AS p, v.dp, v.seg,
       |          unnest(generate_series(GREATEST(1, v.i + 2 - $L),
       |                                 v.i + 1)) AS j
       |        FROM vit v WHERE v.i < length(v.token)
       |      ) y
       |      CROSS JOIN uk
       |      LEFT JOIN vm m
       |        ON m.piece = substr(y.token, y.j, y.p - y.j + 1)
       |    ) WHERE cand IS NOT NULL
       |  ) WHERE rn = 1
       |),
       |ufin AS (SELECT token, dp[length(token) + 1] AS cost,
       |    seg[length(token) + 1] AS pieces
       |  FROM vit WHERE i = length(token))""".stripMargin
  }

  def t43_sql: String =
    s"""WITH RECURSIVE
       |$tokposSqlCtes,
       |$unigramVitSqlCtes,
       |agg AS (SELECT tp.doc_id, COUNT(*) AS n_tokens,
       |    CAST(SUM(len(string_split(f.pieces, ' '))) AS BIGINT)
       |      AS n_pieces,
       |    CAST(SUM(f.cost) AS BIGINT) AS total_cost,
       |    string_agg(f.pieces, ' ' ORDER BY tp.pos) AS joined
       |  FROM tokpos tp JOIN ufin f ON f.token = tp.token
       |  GROUP BY tp.doc_id)
       |SELECT d.doc_id,
       |  CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(a.n_pieces, 0) AS BIGINT) AS n_pieces,
       |  CASE WHEN COALESCE(a.n_tokens, 0) = 0 THEN 0.0
       |       ELSE ROUND(CAST(a.n_pieces AS DOUBLE) / a.n_tokens, 6)
       |  END AS fertility,
       |  CAST(COALESCE(a.total_cost, 0) AS BIGINT) AS total_cost,
       |  md5(COALESCE(a.joined, '')) AS piece_md5
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  // ------------------------------------------------- t51 WordPiece

  private val wordPieceModels =
    scala.collection.concurrent.TrieMap[String, graft.text.WordPiece.Vocab]()

  private def wordPieceVocabPath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/wordpiece_vocab_$key.parquet"
  }

  private def wordPieceModel(s: SparkSession,
      dir: String): graft.text.WordPiece.Vocab = {
    val m = wordPieceModels.getOrElseUpdate(dir, {
      // the SAME bounded training sample discipline as bpeModel /
      // unigramModel: word-frequency table capped at 4096 rows by
      // (freq desc, token asc) — one keyed aggregate + a driver fit
      val vocab = t(s, dir, "documents")
        .select(explode_outer(TextAnalysis.tokens(col("text"))).as("token"))
        .where(col("token").isNotNull)
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token").asc)
        .limit(4096)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      graft.text.WordPiece.train(vocab, nMerges = 48)
    })
    import s.implicits._
    m.pieces.toSeq.toDF("piece")
      .coalesce(1).write.mode("overwrite")
      .parquet(wordPieceVocabPath(dir))
    m
  }

  /** t51: WordPiece tokenization ([[graft.text.WordPiece]] — Schuster
    * & Nakajima 2012, the BERT-family encoder), completing the
    * tokenizer trio next to t37/t42's BPE and t43's unigram-LM: a
    * vocabulary is fit on the corpus's bounded word-frequency sample
    * by likelihood-lift merges (exact cross-multiplied integer
    * scores), dumped for the oracle, and applied to every document by
    * the native [[graft.functions.WordPieceEncode]] expression —
    * greedy LONGEST-MATCH-FIRST with "##" continuation pieces, any
    * unmatchable position collapsing the whole word to `[UNK]` (the
    * standard rule, and the third categorically distinct apply
    * semantics after BPE's merge replay and unigram's Viterbi DP).
    * Output per document: token/piece/[UNK] counts, fertility, and
    * the md5 of the full piece stream so the segmentation itself is
    * hash-checked.
    *
    * One narrow codegen projection over the corpus (fit driver-side
    * and amortized, vocabulary riding as a reference object); no
    * shuffle at any scale. The oracle replays greedy longest-match as
    * a DuckDB recursive CTE over the DISTINCT token vocabulary
    * (segmentation is per-type): each step LEFT-joins the position
    * against the dumped piece table on
    * `substr(token, pos+1, len(body)) = body` with the continuation
    * flag matching `pos > 0` — the join IS the candidate search, so
    * no length literal can drift between engines — and keeps the
    * longest match by window rank (NULLS LAST carries the [UNK]
    * branch).
    */
  val t51_wordpiece_encode: Q = (s, dir) => {
    val m = wordPieceModel(s, dir)
    t(s, dir, "documents").transform(spreadScan)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .withColumn("__wp",
        graft.functions.WordPieceEncode(col("__toks"), m))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(col("__wp")).cast("long").as("n_pieces"),
        size(filter(col("__wp"), x => x === graft.text.WordPiece.Unk))
          .cast("long").as("n_unk"),
        when(size(col("__toks")) === 0, lit(0.0))
          .otherwise(round(
            size(col("__wp")).cast("double") / size(col("__toks")), 6))
          .as("fertility"),
        md5(concat_ws(" ", col("__wp"))).as("piece_md5"))
  }

  /** The WordPiece greedy-match CTEs over an upstream `vocab(token)`
    * — ONE statement of the replayed segmentation rule shared by the
    * t51 oracle and the t46 three-way scorecard (final states in
    * `wfin`, named apart from BPE's `fin` and unigram's `ufin`).
    */
  private def wordPieceSqlCtes: String =
    s"""wv AS (SELECT piece, (piece LIKE '##%') AS cont,
       |    CASE WHEN piece LIKE '##%' THEN substr(piece, 3)
       |         ELSE piece END AS body
       |  FROM read_parquet('${wordPieceVocabPath(oracleSfDir)}/*.parquet')),
       |wv2 AS (SELECT piece, cont, body, length(body) AS blen FROM wv),
       |wenc AS (
       |  SELECT token, 0 AS pos, CAST([] AS VARCHAR[]) AS pieces,
       |         FALSE AS unk
       |  FROM vocab
       |  UNION ALL
       |  SELECT token,
       |    CAST(CASE WHEN piece IS NULL THEN length(token)
       |              ELSE pos + blen END AS INTEGER) AS pos,
       |    CASE WHEN piece IS NULL THEN ['[UNK]']
       |         ELSE list_append(pieces, piece) END AS pieces,
       |    (piece IS NULL) AS unk
       |  FROM (
       |    SELECT s.token, s.pos, s.pieces, v.piece, v.blen,
       |      ROW_NUMBER() OVER (PARTITION BY s.token, s.pos
       |                         ORDER BY v.blen DESC NULLS LAST) AS rn
       |    FROM (SELECT token, pos, pieces FROM wenc
       |          WHERE pos < length(token) AND NOT unk) s
       |    LEFT JOIN wv2 v
       |      ON v.cont = (s.pos > 0)
       |     AND substr(s.token, s.pos + 1, v.blen) = v.body
       |  ) WHERE rn = 1
       |),
       |wfin AS (SELECT token, pieces,
       |    CAST(len(list_filter(pieces, x -> x = '[UNK]')) AS BIGINT)
       |      AS nunk
       |  FROM wenc WHERE pos >= length(token))""".stripMargin

  def t51_sql: String =
    s"""WITH RECURSIVE
       |$tokposSqlCtes,
       |$wordPieceSqlCtes,
       |agg AS (SELECT tp.doc_id,
       |    COUNT(*) AS n_tokens,
       |    CAST(SUM(len(f.pieces)) AS BIGINT) AS n_pieces,
       |    CAST(SUM(f.nunk) AS BIGINT) AS n_unk,
       |    string_agg(array_to_string(f.pieces, ' '), ' ' ORDER BY tp.pos)
       |      AS joined
       |  FROM tokpos tp JOIN wfin f ON f.token = tp.token
       |  GROUP BY tp.doc_id)
       |SELECT d.doc_id,
       |  CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(a.n_pieces, 0) AS BIGINT) AS n_pieces,
       |  CAST(COALESCE(a.n_unk, 0) AS BIGINT) AS n_unk,
       |  CASE WHEN COALESCE(a.n_tokens, 0) = 0 THEN 0.0
       |       ELSE ROUND(CAST(a.n_pieces AS DOUBLE) / a.n_tokens, 6)
       |  END AS fertility,
       |  md5(COALESCE(a.joined, '')) AS piece_md5
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** t46: per-language tokenizer scorecard — the EVALUATION that the
    * tokenizer family (t37/t42 BPE, t43 unigram-LM, t51 WordPiece,
    * t52 byte-BPE — a FOUR-way comparison since round 16; the byte
    * column is where non-Latin scripts pay their real fertility tax,
    * since every non-ASCII char costs ≥ 2 base symbols) exists to
    * feed:
    * a multilingual training mix is budgeted in TOKENS, so a
    * tokenizer that fragments one language more than another silently
    * shifts the mix (the "fertility tax" — the standard cross-lingual
    * tokenizer-equity audit). Per corpus language: document/char/word
    * mass, total BPE subwords and unigram pieces from the SAME two
    * fitted models the encode queries dump, and the derived scorecard
    * — fertility (pieces per word) and compression (chars per piece)
    * for each tokenizer. Ratios are single divisions of exact
    * BIGINT-derived doubles — bit-identical cross-engine; a zero-word
    * language yields NULLs, the q135 degenerate rule.
    *
    * Scale shape: one narrow projection applying both native encode
    * expressions (no shuffle), then ONE map-side-combined aggregate on
    * the language key — the grouped roll-up costs nothing beyond the
    * t37/t43 scans it merges. The oracle replays BOTH segmenters in
    * one WITH RECURSIVE (the shared [[tokposSqlCtes]] vocab feeding
    * the BPE merge CTE and the unigram Viterbi CTE side by side) —
    * one statement, two independent DPs, then the same grouped fold.
    */
  /** t46's additive per-language mass frame — every column is a count
    * or a sum, so the streaming twin folds per-batch partials of this
    * exact shape ([[graft.streaming.StreamingIngest.tokenizerEvalStream]])
    * and the state is bounded at one row per language.
    */
  private[graft] def tokenizerEvalPartial(docs: DataFrame,
      bm: graft.text.Bpe.Merges,
      um: graft.text.Unigram.Model,
      wm: graft.text.WordPiece.Vocab,
      ym: graft.text.Bpe.Merges): DataFrame =
    docs.transform(spreadScan)
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .select(col("lang"),
        length(col("text")).cast("long").as("__chars"),
        size(col("__toks")).cast("long").as("__words"),
        size(graft.functions.BpeSubwords(col("__toks"), bm)).cast("long")
          .as("__bpe"),
        size(graft.functions.UnigramEncode(col("__toks"), um)
          .getField("pieces")).cast("long").as("__uni"),
        size(graft.functions.WordPieceEncode(col("__toks"), wm))
          .cast("long").as("__wp"),
        size(graft.functions.BpeSubwords.bytes(col("__toks"), ym))
          .cast("long").as("__bb"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__chars")).as("n_chars"),
        sum(col("__words")).as("n_words"),
        sum(col("__bpe")).as("n_bpe_subwords"),
        sum(col("__uni")).as("n_unigram_pieces"),
        sum(col("__wp")).as("n_wordpiece_pieces"),
        sum(col("__bb")).as("n_byte_bpe_subwords"))

  private[graft] def foldTokenizerEval(parts: DataFrame): DataFrame =
    parts.groupBy(col("lang")).agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("n_chars")).as("n_chars"),
      sum(col("n_words")).as("n_words"),
      sum(col("n_bpe_subwords")).as("n_bpe_subwords"),
      sum(col("n_unigram_pieces")).as("n_unigram_pieces"),
      sum(col("n_wordpiece_pieces")).as("n_wordpiece_pieces"),
      sum(col("n_byte_bpe_subwords")).as("n_byte_bpe_subwords"))

  /** The scorecard tail over a folded mass frame — shared verbatim by
    * the batch query and the streaming monitor's read side, so the
    * streamed scorecard EQUALS the batch one on the union of batches.
    */
  def tokenizerEvalReport(mass: DataFrame): DataFrame = {
    def ratio(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(den === 0L, lit(null).cast("double"))
        .otherwise(num.cast("double") / den.cast("double"))
    mass.select(col("lang"), col("n_docs"), col("n_chars"), col("n_words"),
      col("n_bpe_subwords"), col("n_unigram_pieces"),
      col("n_wordpiece_pieces"), col("n_byte_bpe_subwords"),
      ratio(col("n_bpe_subwords"), col("n_words")).as("fertility_bpe"),
      ratio(col("n_unigram_pieces"), col("n_words"))
        .as("fertility_unigram"),
      ratio(col("n_wordpiece_pieces"), col("n_words"))
        .as("fertility_wordpiece"),
      ratio(col("n_byte_bpe_subwords"), col("n_words"))
        .as("fertility_byte_bpe"),
      ratio(col("n_chars"), col("n_bpe_subwords"))
        .as("chars_per_bpe_subword"),
      ratio(col("n_chars"), col("n_unigram_pieces"))
        .as("chars_per_unigram_piece"),
      ratio(col("n_chars"), col("n_wordpiece_pieces"))
        .as("chars_per_wordpiece_piece"),
      ratio(col("n_chars"), col("n_byte_bpe_subwords"))
        .as("chars_per_byte_bpe_subword"))
  }

  val t46_tokenizer_eval: Q = (s, dir) =>
    tokenizerEvalReport(tokenizerEvalPartial(
      t(s, dir, "documents"), bpeModel(s, dir), unigramModel(s, dir),
      wordPieceModel(s, dir), byteBpeModel(s, dir)))

  def t46_sql: String = {
    def ratio(num: String, den: String): String =
      s"CASE WHEN $den = 0 THEN NULL ELSE CAST($num AS DOUBLE) / CAST($den AS DOUBLE) END"
    s"""$bpeSegPrefixSql,
       |$unigramVitSqlCtes,
       |$wordPieceSqlCtes,
       |${byteBpeSegSqlCtes("bmg", "benc", "bfin")},
       |per AS (SELECT tp.doc_id,
       |    COUNT(*) AS nw,
       |    CAST(SUM(len(f.syms)) AS BIGINT) AS nb,
       |    CAST(SUM(len(string_split(u.pieces, ' '))) AS BIGINT) AS nu,
       |    CAST(SUM(len(w.pieces)) AS BIGINT) AS np,
       |    CAST(SUM(len(y.syms)) AS BIGINT) AS ny
       |  FROM tokpos tp
       |  JOIN fin f ON f.token = tp.token
       |  JOIN ufin u ON u.token = tp.token
       |  JOIN wfin w ON w.token = tp.token
       |  JOIN bfin y ON y.token = tp.token
       |  GROUP BY tp.doc_id),
       |dd AS (SELECT d.lang,
       |    CAST(length(d.text) AS BIGINT) AS chars,
       |    CAST(COALESCE(p.nw, 0) AS BIGINT) AS nw,
       |    CAST(COALESCE(p.nb, 0) AS BIGINT) AS nb,
       |    CAST(COALESCE(p.nu, 0) AS BIGINT) AS nu,
       |    CAST(COALESCE(p.np, 0) AS BIGINT) AS np,
       |    CAST(COALESCE(p.ny, 0) AS BIGINT) AS ny
       |  FROM documents d LEFT JOIN per p USING (doc_id)),
       |g AS (SELECT lang, COUNT(*) AS n_docs,
       |    CAST(SUM(chars) AS BIGINT) AS n_chars,
       |    CAST(SUM(nw) AS BIGINT) AS n_words,
       |    CAST(SUM(nb) AS BIGINT) AS n_bpe_subwords,
       |    CAST(SUM(nu) AS BIGINT) AS n_unigram_pieces,
       |    CAST(SUM(np) AS BIGINT) AS n_wordpiece_pieces,
       |    CAST(SUM(ny) AS BIGINT) AS n_byte_bpe_subwords
       |  FROM dd GROUP BY lang)
       |SELECT lang, n_docs, n_chars, n_words, n_bpe_subwords,
       |  n_unigram_pieces, n_wordpiece_pieces, n_byte_bpe_subwords,
       |  ${ratio("n_bpe_subwords", "n_words")} AS fertility_bpe,
       |  ${ratio("n_unigram_pieces", "n_words")} AS fertility_unigram,
       |  ${ratio("n_wordpiece_pieces", "n_words")} AS fertility_wordpiece,
       |  ${ratio("n_byte_bpe_subwords", "n_words")} AS fertility_byte_bpe,
       |  ${ratio("n_chars", "n_bpe_subwords")} AS chars_per_bpe_subword,
       |  ${ratio("n_chars", "n_unigram_pieces")} AS chars_per_unigram_piece,
       |  ${ratio("n_chars", "n_wordpiece_pieces")} AS chars_per_wordpiece_piece,
       |  ${ratio("n_chars", "n_byte_bpe_subwords")} AS chars_per_byte_bpe_subword
       |FROM g""".stripMargin
  }

  /** t47: Chao1 vocabulary estimate + Good–Turing unseen mass — the
    * coverage audit next to t41's growth curve: Heaps says how fast
    * vocabulary GROWS, Chao1 says how much is MISSING (the
    * abundance-based richness floor V̂ = V + F₁(F₁−1)/(2(F₂+1)),
    * bias-corrected so F₂ = 0 degrades gracefully), and the
    * Good–Turing mass p₀ = F₁/N is the probability the NEXT token is
    * out-of-vocabulary — the number that decides whether a tokenizer
    * vocabulary or an n-gram LM fit has seen enough corpus. All four
    * inputs (V, N, F₁, F₂) are exact BIGINTs from ONE
    * frequency-of-frequencies fold over the additive (token, count)
    * frame ([[tfCounts]] — so a streaming fold maintains the audit,
    * [[graft.streaming.StreamingIngest.termFreqStream]]); the two
    * derived estimates are single fixed-order IEEE expressions over
    * those integers, bit-identical cross-engine.
    *
    * Scale shape: explode → one map-side-combined (token) count →
    * one 4-column global fold. Nothing is corpus-size-bounded beyond
    * the vocabulary itself (the t12/t41 bound).
    */
  /** t47's additive per-token occurrence counts — summable across
    * micro-batches (the d01-hash discipline: the fold key is the
    * token itself, never document text).
    */
  private[graft] def tfCounts(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))

  /** The coverage report derived from a (token, c) count frame —
    * shared verbatim by the batch query and the streaming audit's
    * read side.
    */
  def chao1FromCounts(tf: DataFrame): DataFrame = {
    def d(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast("double")
    val m = tf.agg(
      count(lit(1)).as("vocab"),
      sum(col("c")).as("n_tokens"),
      sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
      sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
    m.select(col("vocab"), col("n_tokens"), col("f1"), col("f2"),
      (d(col("vocab")) + d(col("f1")) * (d(col("f1")) - lit(1.0))
        / (lit(2.0) * (d(col("f2")) + lit(1.0)))).as("chao1"),
      (d(col("f1")) / d(col("n_tokens"))).as("unseen_mass"),
      (lit(1.0) - d(col("f1")) / d(col("n_tokens"))).as("coverage"))
  }

  val t47_chao1_coverage: Q = (s, dir) =>
    chao1FromCounts(tfCounts(t(s, dir, "documents")))

  val t47_sql: String =
    s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
       |tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok),
       |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
       |    CAST(SUM(c) AS BIGINT) AS n_tokens,
       |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
       |  FROM tf)
       |SELECT vocab, n_tokens, f1, f2,
       |  CAST(vocab AS DOUBLE) + CAST(f1 AS DOUBLE)
       |    * (CAST(f1 AS DOUBLE) - 1.0)
       |    / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)) AS chao1,
       |  CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS unseen_mass,
       |  1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS coverage
       |FROM m""".stripMargin

  /** t48: context-length truncation-loss curve — the number a
    * training team reads before fixing max sequence length: at each
    * candidate context window, how many documents overflow and what
    * fraction of the corpus token mass a hard truncation throws away
    * (the t07/t44 packers ASSUME a window; this is the audit that
    * chooses it). One narrow token-count scan exploded against the
    * 4-element candidate-length literal (rows × 4 before a map-side
    * combine — never a broadcast product), one keyed aggregate; all
    * counts exact BIGINTs, the loss fraction one fixed-order
    * division. The per-length sums are additive, so the curve streams
    * with 4 state rows
    * ([[graft.streaming.StreamingIngest.truncationStream]]).
    */
  private[graft] val TruncLens = Seq(256L, 512L, 1024L, 2048L)

  /** t48's additive per-length partials — summable across batches. */
  private[graft] def truncationPartial(docs: DataFrame): DataFrame =
    docs.select(TextAnalysis.tokenCount(col("text")).cast("long").as("__n"))
      .select(col("__n"),
        explode(array(TruncLens.map(lit): _*)).as("max_len"))
      .groupBy(col("max_len"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(when(col("__n") > col("max_len"), 1L)
          .otherwise(0L)), lit(0L)).as("n_truncated"),
        coalesce(sum(col("__n")), lit(0L)).as("tokens_total"),
        coalesce(sum(when(col("__n") > col("max_len"),
          col("__n") - col("max_len")).otherwise(0L)), lit(0L))
          .as("tokens_lost"))

  /** The curve derived from a folded per-length partial frame —
    * shared verbatim by the batch query and the streaming audit's
    * read side.
    */
  def truncationReport(parts: DataFrame): DataFrame =
    parts.select(col("max_len"), col("n_docs"), col("n_truncated"),
      col("tokens_total"), col("tokens_lost"),
      when(col("tokens_total") > 0L,
        col("tokens_lost").cast("double") /
          col("tokens_total").cast("double"))
        .otherwise(lit(null).cast("double")).as("loss_frac"))

  val t48_truncation_loss: Q = (s, dir) =>
    truncationReport(truncationPartial(t(s, dir, "documents")))

  val t48_sql: String =
    s"""WITH t AS (SELECT CAST(len($toksSql) AS BIGINT) AS n
       |  FROM documents),
       |l AS (SELECT CAST(UNNEST([256, 512, 1024, 2048]) AS BIGINT)
       |  AS max_len),
       |g AS (SELECT max_len, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(CASE WHEN n > max_len THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_truncated,
       |    CAST(SUM(n) AS BIGINT) AS tokens_total,
       |    CAST(SUM(CASE WHEN n > max_len THEN n - max_len ELSE 0 END)
       |      AS BIGINT) AS tokens_lost
       |  FROM t CROSS JOIN l GROUP BY max_len)
       |SELECT max_len, n_docs, n_truncated, tokens_total, tokens_lost,
       |  CASE WHEN tokens_total > 0
       |       THEN CAST(tokens_lost AS DOUBLE) / CAST(tokens_total AS DOUBLE)
       |       ELSE NULL END AS loss_frac
       |FROM g""".stripMargin

  /** t50: vocabulary-coverage budget — the SIZING readout the
    * tokenizer family (t37/t42/t43) and the coverage audit (t47)
    * point at: the smallest vocabulary that covers 90 / 95 / 99% of
    * the corpus token mass, and the coverage actually achieved there
    * (the classic vocab-size/OOV trade curve a tokenizer team reads
    * before fixing |V|). Greedy-by-frequency is optimal for this
    * objective, so the answer is an exact order statistic on the
    * COUNT-CLASS frame (group tokens by occurrence count — bounded by
    * the distinct-count domain, far smaller than the vocabulary):
    * the crossing class is the largest count c* whose inclusive mass
    * reaches the target, and the within-class remainder is one
    * integer ceiling division — pure BIGINT comparisons end to end,
    * nothing for IEEE to diverge on until the single final coverage
    * division. The class prefix runs through the shared two-level
    * prefix (never a vocabulary-sized window); the target fan-out is
    * a 3-element literal explode.
    */
  val t50_vocab_budget: Q = (s, dir) => {
    import graft.queries.Features.exclusivePrefix
    val cls = tfCounts(t(s, dir, "documents"))
      .groupBy(col("c")).agg(count(lit(1)).as("__k"))
      .withColumn("__mass", col("c") * col("__k"))
      .withColumn("__ord", -col("c"))
      .withColumn("__bucket", floor(col("__ord") / lit(64.0)).cast("long"))
      .localCheckpoint(true) // prefix AND totals
    val pref = exclusivePrefix(cls, "__ord", "__bucket",
      Seq("__exm" -> "__mass", "__exk" -> "__k"))
    val tot = cls.agg(sum(col("__mass")).as("__n"), sum(col("__k")).as("__v"))
    val cand = pref.crossJoin(broadcast(tot))
      .withColumn("target",
        explode(array(lit(90L), lit(95L), lit(99L))))
      .where(lit(100L) * (col("__exm") + col("__mass")) >=
        col("target") * col("__n"))
    // the crossing class: inclusive mass is monotone as c descends,
    // so the FIRST satisfying class is the one with the largest c
    val sel = cand.groupBy(col("target"))
      .agg(max_by(struct(col("c"), col("__exm"), col("__exk"),
        col("__n"), col("__v")), col("c")).as("__s"))
      .select(col("target"), col("__s.c"), col("__s.__exm"),
        col("__s.__exk"), col("__s.__n"), col("__s.__v"))
    val m = expr(
      "(target * __n - 100L * __exm + 100L * c - 1L) div (100L * c)")
    sel.select(col("target").as("target_pct"),
      (col("__exk") + m).as("vocab_needed"),
      col("__v").as("vocab_total"),
      ((col("__exm") + m * col("c")).cast("double") /
        col("__n").cast("double")).as("coverage_frac"))
  }

  val t50_sql: String =
    s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
       |tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok),
       |cls AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS k,
       |    CAST(c * COUNT(*) AS BIGINT) AS mass FROM tf GROUP BY c),
       |cum AS (SELECT c, k, mass,
       |    CAST(COALESCE(SUM(mass) OVER w, 0) AS BIGINT) AS exm,
       |    CAST(COALESCE(SUM(k) OVER w, 0) AS BIGINT) AS exk
       |  FROM cls WINDOW w AS (ORDER BY c DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |tot AS (SELECT CAST(SUM(mass) AS BIGINT) AS n,
       |    CAST(SUM(k) AS BIGINT) AS v FROM cls),
       |tg AS (SELECT CAST(UNNEST([90, 95, 99]) AS BIGINT) AS target),
       |sel AS (SELECT target, c, exm, exk, n, v FROM (
       |  SELECT tg.target, cum.c, cum.exm, cum.exk, tot.n, tot.v,
       |    ROW_NUMBER() OVER (PARTITION BY tg.target
       |      ORDER BY cum.c DESC) AS rn
       |  FROM cum CROSS JOIN tot CROSS JOIN tg
       |  WHERE 100 * (exm + mass) >= target * n) WHERE rn = 1)
       |SELECT target AS target_pct,
       |  CAST(exk + (target * n - 100 * exm + 100 * c - 1) // (100 * c)
       |    AS BIGINT) AS vocab_needed,
       |  v AS vocab_total,
       |  CAST(exm + ((target * n - 100 * exm + 100 * c - 1) // (100 * c)) * c
       |    AS DOUBLE) / CAST(n AS DOUBLE) AS coverage_frac
       |FROM sel""".stripMargin

  /** Lossless edit-distance similarity join over the customer-name
    * column ([[Dedup.edJoin]] — the FastSS deletion-neighborhood
    * join at d=1): every name pair within Levenshtein distance 1,
    * guaranteed complete. The entity-resolution face of the dedup
    * ladder — t10 verifies edit distance on LOSSY fingerprint
    * candidates; this is the exact counterpart, as d06 is to d02.
    * The oracle is the brute-force n² ground truth, so the
    * CORRECTNESS row itself proves the deletion-variant equi-join
    * loses nothing; candidate buckets are alphabet-bounded (a
    * 1-deletion variant pins every other character), which is what
    * keeps the join LINEAR on zero-padded id keys where q-gram
    * prefix filters degenerate (see [[Dedup.edJoin]]'s dispatch
    * note).
    */
  val d14_edit_join: Q = (s, dir) =>
    graft.dedup.Dedup.edJoin(t(s, dir, "customer"), "c_name", "c_custkey",
      q = 2, d = 1)

  val d14_sql: String =
    """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_distance
      |FROM customer a JOIN customer b
      |  ON a.c_custkey < b.c_custkey
      | AND abs(length(a.c_name) - length(b.c_name)) <= 1
      |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin

  /** Fuzzy entity-resolution join: part-name pairs with Jaro–Winkler
    * similarity ≥ 0.85, scored by the native codegen
    * [[graft.functions.JaroWinklerSimilarity]] expression (Spark has
    * `levenshtein` but no JW; a UDF would box every candidate pair).
    * Candidates come from shared-token blocking — the standard ER
    * blocking key, one explode + one equi-join, never n² — and the
    * oracle is the brute-force n² ground truth over distinct names
    * with DuckDB's own `jaro_winkler_similarity`, so the hash match
    * proves BOTH that the expression reproduces the classic formula
    * bit-for-bit AND that token blocking loses no pair at this
    * threshold (the d06/d14 losslessness design). The threshold
    * applies to the raw score; the rounded score is output-only, so
    * boundary values can't flip membership between engines.
    */
  val d15_jw_join: Q = (s, dir) => {
    val nm = t(s, dir, "part").select(col("p_name")).distinct()
    val tok = nm.select(col("p_name"), explode(split(col("p_name"), " ")).as("tok"))
    tok.as("a").join(tok.as("b"),
        col("a.tok") === col("b.tok") && col("a.p_name") < col("b.p_name"))
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"))
      .distinct()
      // e-6-quantized score for BOTH the threshold and the report: the
      // c05 rule — the 0.8499995 quantized boundary is unattainable by
      // any exact JW rational, so a last-bit kernel difference between
      // engines can't flip membership, and the reported jw_e6 integer
      // is identical by construction (round 9: `round(jw, 6)` is the
      // engine-divergent class)
      .withColumn("jw_e6", floor(graft.functions.JaroWinklerSimilarity(
        col("name_a"), col("name_b")) * lit(1000000.0) + lit(0.5)))
      .where(col("jw_e6") >= 850000L)
      .select(col("name_a"), col("name_b"), col("jw_e6"))
  }

  val d15_sql: String =
    """WITH nm AS (SELECT DISTINCT p_name FROM part)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(FLOOR(jaro_winkler_similarity(a.p_name, b.p_name)
      |             * 1000000.0 + 0.5) AS BIGINT) AS jw_e6
      |FROM nm a JOIN nm b ON a.p_name < b.p_name
      |WHERE FLOOR(jaro_winkler_similarity(a.p_name, b.p_name)
      |            * 1000000.0 + 0.5) >= 850000""".stripMargin

  /** Content fingerprint (min-md5 over word 8-gram shingles) per doc —
    * the winnowing-style signature used for fast copy detection.
    */
  val t04_fingerprint: Q = (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.fingerprint(col("text"), k = 8).as("fingerprint"))

  val t04_sql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id,
       |  CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(generate_series(1, len(toks) - 7),
       |                           i -> array_to_string(toks[i:i+7], ' ')) END AS sh
       | FROM t)
       |SELECT doc_id, list_min(list_transform(sh, x -> md5(x))) AS fingerprint FROM sh""".stripMargin

  /** Within-document repetition signals (Gopher/CCNet filter family):
    * duplicate-line fraction plus the most frequent word bigram and the
    * share of bigram positions it occupies. The top-bigram mode is NOT
    * a per-row lambda over the bigram array (that formulation is O(n²)
    * interpreted per document): bigrams explode once and aggregate as
    * (doc, bigram) counts — partial map-side combine, then a doc-keyed
    * rank — the same two-exchange shape at 100 TB. Ties break (count
    * desc, bigram asc) identically in both engines.
    */
  val t06_repetition: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    // perDoc is consumed twice (bigram counts + final join), but the
    // second consumer prunes __bg away, so the recomputation is only
    // the cheap line/token stats — measured faster than an eager
    // checkpoint's materialization at this row size
    val perDoc = t(s, dir, "documents")
      .transform(spreadScan)
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .select(
        col("doc_id"),
        TextAnalysis.dupLineFraction(col("text")).as("dup_line_frac"),
        size(col("__toks")).cast("long").as("n_tokens"),
        TextAnalysis.bigramsOf(col("__toks")).as("__bg"))
    // explode_OUTER + null filter, not plain explode: for a non-outer
    // Generate the optimizer infers `size(bg) > 0 AND isnotnull(bg)`
    // and pushes it below the repartition, substituting the attribute
    // with its full defining expression — the whole tokenize+bigram
    // tree then evaluates 3x per row on the single-row-group scan's
    // one core (5.9s instead of 0.6s at sf0.1 measured)
    val counts = perDoc
      .select(col("doc_id"), explode_outer(col("__bg")).as("bigram"))
      .where(col("bigram").isNotNull)
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("bg_count"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("bg_count").desc, col("bigram").asc)
    val top = counts.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("doc_id"), col("bigram").as("top_bigram"),
        col("bg_count").as("top_bigram_count"))
    perDoc.drop("__bg")
      .join(top, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("dup_line_frac"), col("n_tokens"),
        coalesce(col("top_bigram"), lit("")).as("top_bigram"),
        coalesce(col("top_bigram_count"), lit(0L)).as("top_bigram_count"),
        when(col("n_tokens") < 2, lit(0.0))
          .otherwise(coalesce(col("top_bigram_count"), lit(0L)).cast("double")
            / (col("n_tokens") - 1))
          .as("top_bigram_frac"))
  }

  val t06_sql: String =
    s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |d AS (SELECT doc_id,
       |  list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
       |              x -> x <> '') AS ls,
       |  toks
       | FROM t),
       |perdoc AS (SELECT doc_id,
       |  CASE WHEN len(ls) = 0 THEN 0.0
       |       ELSE (len(ls) - len(list_distinct(ls)))::DOUBLE / len(ls) END AS dup_line_frac,
       |  len(toks) AS n_tokens, toks
       | FROM d),
       |bg AS (SELECT doc_id, unnest(
       |  CASE WHEN len(toks) < 2 THEN []
       |       ELSE list_transform(generate_series(1, len(toks) - 1),
       |                           i -> toks[i] || ' ' || toks[i + 1]) END) AS bigram
       | FROM perdoc),
       |bc AS (SELECT doc_id, bigram, COUNT(*) AS bg_count FROM bg GROUP BY 1, 2),
       |top AS (SELECT doc_id, bigram AS top_bigram, bg_count AS top_bigram_count
       | FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |                 ORDER BY bg_count DESC, bigram ASC) AS rn FROM bc)
       | WHERE rn = 1)
       |SELECT p.doc_id, p.dup_line_frac, p.n_tokens,
       |  COALESCE(top_bigram, '') AS top_bigram,
       |  COALESCE(top_bigram_count, 0) AS top_bigram_count,
       |  CASE WHEN p.n_tokens < 2 THEN 0.0
       |       ELSE COALESCE(top_bigram_count, 0)::DOUBLE / (p.n_tokens - 1) END AS top_bigram_frac
       |FROM perdoc p LEFT JOIN top ON p.doc_id = top.doc_id""".stripMargin

  /** Sequence packing (GPT-style concat-and-chunk) of the corpus into
    * 2048-token context windows, sharded by language and ordered by
    * doc_id — then a per-pack utilization summary. Pure integer window
    * arithmetic via [[graft.operators.Pack.concatChunk]]: the pack
    * layout is bit-identical across engines and re-runs. The window and
    * the (lang, pack_id) aggregate share the lang exchange (subset
    * rule): one shuffle end-to-end.
    */
  val t07_sequence_pack: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
      .transform(spreadScan)
      .select(col("lang"), col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    graft.operators.Pack.concatChunk(
        docs, Seq("lang"), "doc_id", "n_tokens", capacity = 2048L)
      .groupBy(col("lang"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs_starting"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col("pack_offset")).as("first_offset"))
  }

  val t07_sql: String =
    s"""WITH t AS (SELECT lang, doc_id, len($toksSql) AS n_tokens
       |           FROM documents),
       |o AS (SELECT lang, doc_id, n_tokens,
       |  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
       | FROM t),
       |p AS (SELECT lang, n_tokens,
       |  CAST(start_offset // 2048 AS BIGINT) AS pack_id,
       |  CAST(start_offset % 2048 AS BIGINT) AS pack_offset
       | FROM o)
       |SELECT lang, pack_id, COUNT(*) AS n_docs_starting,
       |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       |  MIN(pack_offset) AS first_offset
       |FROM p GROUP BY lang, pack_id""".stripMargin

  /** Cross-corpus boilerplate-line removal (CCNet-style): any trimmed
    * non-empty line appearing in ≥ 3 distinct documents is boilerplate
    * (navigation chrome, legal footers, templates); documents are
    * re-emitted with those lines struck, original line order preserved.
    * Shape at scale: explode once, one line-keyed count-distinct (the
    * partial-aggregate shuffle carries (line, doc) pairs), an anti-join
    * back on the line key, and a doc-keyed re-assembly — no step holds a
    * whole shard in memory, and the line-key shuffles are exactly the
    * dedup-bucket discipline the MinHash path uses.
    */
  val t08_boilerplate: Q = (s, dir) => {
    val boilerplateMinDocs = 3
    val docs = t(s, dir, "documents")
      .transform(spreadScan)
      .select(col("doc_id"),
        TextAnalysis.lines(col("text")).as("__lines"))
    // posexplode_OUTER + null filter for the same reason as t06: the
    // non-outer Generate's inferred size/notnull filter would push the
    // full line-splitting expression below the repartition
    val lines = docs.select(col("doc_id"),
        posexplode_outer(col("__lines")).as(Seq("idx", "line")))
      .where(col("line").isNotNull)
    val boiler = lines.groupBy(col("line"))
      .agg(count_distinct(col("doc_id")).as("n_docs"))
      .where(col("n_docs") >= boilerplateMinDocs)
      .select(col("line"))
    val keptAgg = lines.join(boiler, Seq("line"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("idx"), col("line")))),
            x => x.getField("line")),
          "\n").as("cleaned_text"))
    docs.select(col("doc_id"), size(col("__lines")).cast("long").as("__n"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        (col("__n") - coalesce(col("n_lines_kept"), lit(0L))).as("n_lines_removed"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  val t08_sql: String =
    s"""WITH d AS (SELECT doc_id,
       |  list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
       |              x -> x <> '') AS ls
       | FROM documents),
       |ix AS (SELECT doc_id, ls,
       |  unnest(generate_series(1, len(ls))) AS idx FROM d),
       |l AS (SELECT doc_id, idx, ls[idx] AS line FROM ix),
       |boiler AS (SELECT line FROM l GROUP BY line
       |           HAVING COUNT(DISTINCT doc_id) >= 3),
       |kept AS (SELECT doc_id, idx, line FROM l
       |         ANTI JOIN boiler USING (line)),
       |ka AS (SELECT doc_id, COUNT(*) AS n_lines_kept,
       |  string_agg(line, chr(10) ORDER BY idx) AS cleaned_text
       | FROM kept GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(n_lines_kept, 0) AS n_lines_kept,
       |  len(d.ls) - COALESCE(n_lines_kept, 0) AS n_lines_removed,
       |  COALESCE(cleaned_text, '') AS cleaned_text
       |FROM d LEFT JOIN ka ON d.doc_id = ka.doc_id""".stripMargin

  /** Capstone curation pipeline — the end-to-end shape of a training-
    * data filter stage: exact-dedup survivors with quality ≥ 0.75,
    * rolled up per predicted language with token budgets. Composes the
    * text and dedup operators in one plan (dedup window + quality
    * projection + lang argmax + final aggregate, two shuffles total).
    */
  val c01_curation: Q = (s, dir) => {
    // tokenize ONCE; every downstream metric (dedup hash, quality,
    // lang-ID, token budget) reads the staged array instead of
    // re-running split/lower per metric (~8x on the text-only forms)
    val staged = t(s, dir, "documents")
      .transform(spreadScan)
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
    val curated = Dedup.exactDedupOn(
      staged, md5(concat_ws(" ", col("__toks"))), "doc_id")
      .where(col("is_canonical"))
      .withColumn("quality_score",
        TextAnalysis.qualityScoreOf(col("text"), col("__toks")))
      .where(col("quality_score") >= 0.75)
      .withColumn("predicted_lang",
        TextAnalysis.langIdOf(col("text"), col("__toks")))
      .withColumn("n_tokens",
        TextAnalysis.tokenCountOf(col("__toks")).cast("long"))
    curated.groupBy(col("predicted_lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (sum(col("quality_score")) / count(lit(1))).as("avg_quality"))
  }

  val c01_sql: String = {
    val stops = sqlList(TextAnalysis.englishStopwords)
    val scoreCols = TextAnalysis.langMarkers.map { case (l, ms) =>
      s"len(list_filter(toks, x -> list_contains(${sqlList(ms)}, x))) AS s_$l"
    }.mkString(",\n  ")
    val langs = TextAnalysis.langMarkers.map(_._1)
    val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l => s"WHEN s_$l = best AND best > 0 THEN '$l'").mkString("\n  ")
    s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |dd AS (SELECT *, doc_id = MIN(doc_id) OVER (
       |         PARTITION BY md5(array_to_string(toks, ' '))) AS is_canonical FROM t),
       |m AS (SELECT doc_id, text, toks,
       |  len(toks) AS n,
       |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks) END AS mtl,
       |  CASE WHEN length(text) = 0 THEN 0.0 ELSE len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]'))::DOUBLE / length(text) END AS pr,
       |  CASE WHEN len(toks) = 0 THEN 0.0 ELSE len(list_filter(toks, x -> list_contains($stops, x)))::DOUBLE / len(toks) END AS sr
       | FROM dd WHERE is_canonical),
       |q AS (SELECT doc_id, text, toks, n,
       |  (CASE WHEN n >= 5 AND n <= 100000 THEN 0.25 ELSE 0.0 END
       | + CASE WHEN mtl >= 2.0 AND mtl <= 12.0 THEN 0.25 ELSE 0.0 END
       | + CASE WHEN pr <= 0.2 THEN 0.25 ELSE 0.0 END
       | + CASE WHEN sr > 0.0 AND sr <= 0.6 THEN 0.25 ELSE 0.0 END)::DOUBLE AS quality_score
       | FROM m),
       |f AS (SELECT *, $scoreCols,
       |  len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk
       | FROM q WHERE quality_score >= 0.75),
       |b AS (SELECT *, $best AS best FROM f),
       |p AS (SELECT quality_score, n, CASE WHEN cjk > 0 AND cjk * 2 >= length(text) THEN 'zh'
       |  $cases
       |  ELSE 'und' END AS predicted_lang FROM b)
       |SELECT predicted_lang, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS total_tokens,
       |       SUM(quality_score) / COUNT(*) AS avg_quality
       |FROM p GROUP BY predicted_lang""".stripMargin
  }

  /** Deterministic train/valid/test split (80/10/10) by hash bucket of
    * the document id — the reproducible alternative to `rand()`-based
    * sampling a 100 TB pipeline needs (same document lands in the same
    * split on every run, every retry, every executor), with per-
    * (source, split) document and token budgets. Pure projection +
    * one aggregate; the md5-derived bucket replays exactly in SQL.
    */
  val t05_split_sample: Q = (s, dir) => {
    val bucket = pmod(graft.functions.KmvSketch.hash64(col("doc_id")), lit(100L))
    val split = when(bucket < 80, "train")
      .when(bucket < 90, "valid").otherwise("test")
    t(s, dir, "documents")
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .select(col("source"), split.as("split"),
        TextAnalysis.tokenCountOf(col("__toks")).cast("long").as("__n"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n")).as("total_tokens"))
  }

  val t05_sql: String =
    s"""WITH d AS (
       |  SELECT source,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b,
       |    len($toksSql) AS n
       |  FROM documents)
       |SELECT source,
       |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n) AS BIGINT) AS total_tokens
       |FROM d GROUP BY 1, 2""".stripMargin

  /** Stratified (per-language) deterministic downsampling — the corpus
    * rebalancing step of a training-data mix: the over-represented
    * language keeps 50% (zh 80%, rest 100%) via the same md5-bucket
    * rule as [[t05_split_sample]], so membership is stable across runs
    * and engines (no `rand()`), and the sample composes with the split
    * assignment. Pure projection + filter + one aggregate.
    */
  val t09_stratified_sample: Q = (s, dir) => {
    val bp = pmod(graft.functions.KmvSketch.hash64(col("doc_id")), lit(10000L))
    val keepBelow = when(col("lang") === "en", lit(5000L))
      .when(col("lang") === "zh", lit(8000L))
      .otherwise(lit(10000L))
    val kept = t(s, dir, "documents")
      .where(bp < keepBelow)
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
    kept.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCountOf(col("__toks")).cast("long")).as("total_tokens"))
  }

  val t09_sql: String =
    s"""WITH d AS (
       |  SELECT lang,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 AS b,
       |    len($toksSql) AS n
       |  FROM documents)
       |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS total_tokens
       |FROM d
       |WHERE b < CASE WHEN lang = 'en' THEN 5000
       |               WHEN lang = 'zh' THEN 8000 ELSE 10000 END
       |GROUP BY lang""".stripMargin

  /** Second capstone: curation with NEAR-dup (not just exact) removal —
    * MinHash pairs → connected-component groups → keep each group's
    * min-id canonical plus every ungrouped doc, then per-source
    * kept/dropped counts and the surviving token budget. Composes the
    * heaviest dedup machinery end-to-end; the oracle replays everything
    * including the transitive closure (recursive CTE).
    */
  val c02_neardup_curation: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
      .transform(spreadScan)
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
    val groups = Dedup.duplicateGroups(
      Dedup.minhashNearDups(docs, "text", "doc_id",
        k = 5, numHashes = 16, bands = 4, threshold = 0.5))
    val flagged = docs
      .join(groups, docs("doc_id") === groups("id"), "left")
      .withColumn("__kept", col("id").isNull || col("doc_id") === col("group_id"))
    flagged.groupBy(col("source")).agg(
      sum(when(col("__kept"), 1L).otherwise(0L)).as("n_docs_kept"),
      sum(when(col("__kept"), 0L).otherwise(1L)).as("n_docs_dropped"),
      sum(when(col("__kept"), TextAnalysis.tokenCountOf(col("__toks")).cast("long"))
        .otherwise(0L)).as("total_tokens"))
  }

  // lazy: textually precedes the dedup-section vals it interpolates
  // (dupGroupCtes/d02_sql) — an eager val would capture them as null
  lazy val c02_sql: String =
    s"""WITH RECURSIVE $dupGroupCtes,
       |tt AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
       |flagged AS (
       |  SELECT source, len(toks) AS n,
       |    CASE WHEN g.id IS NULL OR tt.doc_id = g.group_id THEN 1 ELSE 0 END AS kept
       |  FROM tt LEFT JOIN groups g ON tt.doc_id = g.id)
       |SELECT source,
       |  CAST(SUM(kept) AS BIGINT) AS n_docs_kept,
       |  CAST(SUM(1 - kept) AS BIGINT) AS n_docs_dropped,
       |  CAST(SUM(CASE WHEN kept = 1 THEN n ELSE 0 END) AS BIGINT) AS total_tokens
       |FROM flagged GROUP BY source""".stripMargin

  /** Third capstone — the dataset-release QA manifest: the per-source
    * accounting a release pipeline publishes alongside the data. Each
    * non-benchmark document is classified with a fixed precedence —
    * exact duplicate (non-canonical content hash) first, then
    * benchmark-contaminated (≥50% 5-gram coverage of any held-out doc,
    * the d07 inverted-index join), else kept — and sources report
    * kept/dup/contaminated counts plus the surviving token budget.
    * Composes the d01 + d07 machinery end-to-end: one content-hash
    * shuffle, one shingle equi-join (benchmark side broadcastable at
    * scale), one final per-source aggregate. The oracle replays the
    * whole chain including the precedence rule.
    */
  val c03_release_qa: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val isBench = col("source").isin("src16", "src17", "src18", "src19")
    val staged = docs.where(!isBench)
      .transform(spreadScan)
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
    val dd = Dedup.exactDedupOn(
      staged, md5(concat_ws(" ", col("__toks"))), "doc_id")
    val contaminated = Dedup.crossCorpusOverlap(
        docs.where(!isBench), docs.where(isBench),
        "text", "doc_id", k = 5, minOverlap = 0.5)
      .select(col("train_id").as("doc_id")).distinct()
      .withColumn("__cont", lit(true))
    dd.join(broadcast(contaminated), Seq("doc_id"), "left")
      .withColumn("__status",
        when(!col("is_canonical"), "dup")
          .when(col("__cont"), "contaminated")
          .otherwise("kept"))
      .withColumn("__n", TextAnalysis.tokenCountOf(col("__toks")).cast("long"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("__status") === "kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__status") === "dup", 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("__status") === "contaminated", 1L).otherwise(0L))
          .as("n_contaminated"),
        sum(when(col("__status") === "kept", col("__n")).otherwise(0L))
          .as("tokens_kept"))
  }

  val c03_sql: String =
    s"""WITH t AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
       |tr AS (SELECT * FROM t WHERE source NOT IN ('src16','src17','src18','src19')),
       |dd AS (SELECT *, doc_id = MIN(doc_id) OVER (
       |         PARTITION BY md5(array_to_string(toks, ' '))) AS canon FROM tr),
       |sh AS (SELECT doc_id, source,
       |  list_distinct(CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(generate_series(1, len(toks) - 4),
       |                           i -> array_to_string(toks[i:i+4], ' ')) END) AS sh
       | FROM t),
       |ex AS (SELECT doc_id, source, len(sh) AS n, unnest(sh) AS tok FROM sh),
       |trx AS (SELECT doc_id AS train_id, tok FROM ex
       |        WHERE source NOT IN ('src16','src17','src18','src19')),
       |be AS (SELECT doc_id AS bench_id, n AS bn, tok FROM ex
       |       WHERE source IN ('src16','src17','src18','src19')),
       |ov AS (SELECT train_id, MIN(bn) AS bn, COUNT(*) AS shared, bench_id
       |       FROM trx JOIN be USING (tok) GROUP BY train_id, bench_id),
       |cont AS (SELECT DISTINCT train_id FROM ov
       |         WHERE shared::DOUBLE / bn >= 0.5),
       |f AS (SELECT source, len(toks) AS n,
       |  CASE WHEN NOT canon THEN 'dup'
       |       WHEN doc_id IN (SELECT train_id FROM cont) THEN 'contaminated'
       |       ELSE 'kept' END AS st
       | FROM dd)
       |SELECT source,
       |  CAST(SUM(CASE WHEN st = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN st = 'dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  CAST(SUM(CASE WHEN st = 'contaminated' THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       |  CAST(SUM(CASE WHEN st = 'kept' THEN n ELSE 0 END) AS BIGINT) AS tokens_kept
       |FROM f GROUP BY source""".stripMargin

  // ------------------------------------------------------------ dedup

  /** Exact dedup: content hash over the normalized token stream, group
    * size, deterministic canonical flag. One shuffle on the hash.
    */
  val d01_exact_dedup: Q = (s, dir) =>
    Dedup.exactDedup(t(s, dir, "documents"), "text", "doc_id")
      .select(col("doc_id"), col("content_hash"), col("group_size"),
        col("is_canonical"))

  val d01_sql: String =
    s"""WITH t AS (SELECT doc_id, md5(array_to_string($toksSql, ' ')) AS content_hash
       | FROM documents)
       |SELECT doc_id, content_hash,
       | COUNT(*) OVER (PARTITION BY content_hash) AS group_size,
       | doc_id = MIN(doc_id) OVER (PARTITION BY content_hash) AS is_canonical
       |FROM t""".stripMargin

  /** MinHash+LSH near-duplicate pairs (5-gram shingles, 16 hashes, 4
    * bands), exact-Jaccard ≥ 0.5 verified. The oracle replays the whole
    * pipeline — the md5 hash family makes every stage engine-exact.
    */
  val d02_minhash_neardups: Q = (s, dir) =>
    Dedup.minhashNearDups(t(s, dir, "documents"), "text", "doc_id",
      k = 5, numHashes = 16, bands = 4, threshold = 0.5)

  val d02_sql: String = {
    // Replays Dedup's universal-hash MinHash family with the same
    // constants ((a·v + b) mod p over the 28-bit md5 base hash).
    val sigExprs = Dedup.minhashCoeffs(16).map { case (a, b) =>
      s"list_min(list_transform(bh, v -> (v * $a + $b) % ${Dedup.minhashP}))"
    }.mkString("[", ",\n    ", "]")
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id,
       |  CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(generate_series(1, len(toks) - 4),
       |                           i -> array_to_string(toks[i:i+4], ' ')) END AS sh
       | FROM t),
       |bh AS (SELECT doc_id, sh,
       |  list_transform(sh, s -> ('0x' || substr(md5(s), 1, 7))::BIGINT) AS bh
       | FROM sh),
       |sig AS (SELECT doc_id, sh,
       |  $sigExprs AS sig
       | FROM bh),
       |banded AS (SELECT doc_id, sh,
       |  unnest(list_transform(generate_series(0, 3),
       |                        b -> md5(b::VARCHAR || ':' || array_to_string(sig[b*4+1:b*4+4], ',')))) AS band
       | FROM sig),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |                a.sh AS sh_a, b.sh AS sh_b
       | FROM banded a JOIN banded b USING (band) WHERE a.doc_id < b.doc_id),
       |j AS (SELECT id_a, id_b, list_distinct(sh_a) AS sa, list_distinct(sh_b) AS sb FROM cand),
       |jj AS (SELECT id_a, id_b,
       |  CASE WHEN len(sa) = 0 AND len(sb) = 0 THEN 1.0
       |       WHEN len(sa) = 0 OR len(sb) = 0 THEN 0.0
       |       ELSE len(list_filter(sa, x -> list_contains(sb, x)))::DOUBLE
       |            / (len(sa) + len(sb) - len(list_filter(sa, x -> list_contains(sb, x)))) END AS jaccard
       | FROM j)
       |SELECT id_a, id_b, jaccard FROM jj WHERE jaccard >= 0.5""".stripMargin
  }

  /** SimHash near-duplicate pairs: 48-bit md5-derived SimHash, Manku
    * block-and-verify, Hamming distance ≤ 3.
    */
  val d03_simhash_neardups: Q = (s, dir) =>
    Dedup.simhashNearDups(t(s, dir, "documents"), "text", "doc_id",
      maxDist = 3, bits = 48)

  val d03_sql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |h AS (SELECT doc_id,
       |  list_transform(toks, x -> ('0x' || substr(md5(x), 1, 12))::BIGINT) AS hs
       | FROM t),
       |s AS (SELECT doc_id,
       |  list_transform(generate_series(0, 47),
       |    j -> coalesce(list_sum(list_transform(hs,
       |           v -> CASE WHEN (v >> j) & 1 = 1 THEN 1 ELSE -1 END)), 0)) AS sums
       | FROM h),
       |sh AS (SELECT doc_id,
       |  coalesce(list_sum(list_transform(generate_series(0, 47),
       |    j -> CASE WHEN sums[j+1] > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END)), 0)::BIGINT AS sh
       | FROM s),
       |blocked AS (SELECT doc_id, sh,
       |  unnest(list_transform(generate_series(0, 3),
       |    i -> i::VARCHAR || ':' || ((sh >> (i*12)) & 4095)::VARCHAR)) AS block
       | FROM sh),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |                a.sh AS sh_a, b.sh AS sh_b
       | FROM blocked a JOIN blocked b USING (block) WHERE a.doc_id < b.doc_id)
       |SELECT id_a, id_b, bit_count(xor(sh_a, sh_b))::BIGINT AS hamming
       |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3""".stripMargin

  /** Near-dup pairs consolidated into duplicate groups: connected
    * components over the d02 pair graph via min-label propagation; the
    * oracle replays it with a recursive transitive-closure CTE (small
    * pair graphs — the Spark side never materializes the closure).
    */
  /** d05's near-dup group frame (id, group_id) — factored so q154's
    * leakage-safe split consumes the SAME grouping the dedup family
    * reports (one statement of "what counts as a duplicate group").
    */
  private[graft] def d05Groups(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicateGroups(
      Dedup.minhashNearDups(t(s, dir, "documents"), "text", "doc_id",
        k = 5, numHashes = 16, bands = 4, threshold = 0.5))

  val d05_dup_groups: Q = (s, dir) => d05Groups(s, dir)

  // the transitive-closure CTE chain shared by d05 and c02: near-dup
  // pairs → undirected edges → reachability → (id, group_id)
  private val dupGroupCtes: String =
    s"""pairs AS ($d02_sql),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b AS src, id_a AS dst FROM pairs),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |groups AS (
       |  SELECT src AS id, LEAST(src, MIN(dst)) AS group_id
       |  FROM reach GROUP BY src)""".stripMargin

  val d05_sql: String =
    s"""WITH RECURSIVE $dupGroupCtes
       |SELECT id, group_id FROM groups""".stripMargin

  /** q154: leakage-safe train/val/test split — the splitter a
    * training-data pipeline must run INSTEAD of a naive per-document
    * hash split: near-duplicates straddling train and test leak the
    * test set into training (the classic eval-inflation bug), so the
    * split key is the d05 DUPLICATE GROUP ([[d05Groups]] — one
    * statement of "what counts as a duplicate", two consumers):
    * every member of a group lands in the same split by
    * construction. Assignment is the t45/t28 hash-order rule —
    * bucket = hash64(group) mod 100, train < 80 ≤ val < 90 ≤ test —
    * a pure function of the data, no RNG, bit-replayable, and any
    * worker can compute its own shard. The report carries the AUDIT
    * that motivates the operator: `leaky_groups_grouped` (groups
    * straddling splits under the group key — 0 by construction,
    * asserted by spec) next to `leaky_groups_naive` (the same count
    * under the naive per-document split — positive on any corpus
    * with planted duplicates), plus per-split doc/group counts and
    * the q124 membership checksum.
    *
    * Scale shape: the group frame is d05's (banded MinHash, never
    * all-pairs); assignment is a narrow projection + one left join
    * on the 8-byte id; the report is one map-side-combined
    * groupBy(split) plus two broadcast 1-row audit folds (the q135
    * report shape).
    */
  /** q154's per-document split assignment (doc_id, __gid, __h, split,
    * __naive) — factored so q155's memorization audit runs over the
    * SAME split q154 reports (one statement of the split rule, two
    * consumers).
    */
  private[graft] def q154Assigned(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.KmvSketch
    val docs = t(s, dir, "documents").select(col("doc_id"))
    val g = d05Groups(s, dir)
    docs
      .join(g, docs("doc_id") === g("id"), "left")
      .select(col("doc_id"),
        coalesce(col("group_id"), col("doc_id")).as("__gid"))
      .select(col("doc_id"), col("__gid"),
        pmod(KmvSketch.hash64(col("__gid").cast("string")), lit(100L))
          .as("__gb"),
        pmod(KmvSketch.hash64(col("doc_id").cast("string")), lit(100L))
          .as("__nb"),
        KmvSketch.hash64(col("doc_id").cast("string")).as("__h"))
      .select(col("doc_id"), col("__gid"), col("__h"),
        when(col("__gb") < 80L, "train").when(col("__gb") < 90L, "val")
          .otherwise("test").as("split"),
        when(col("__nb") < 80L, "train").when(col("__nb") < 90L, "val")
          .otherwise("test").as("__naive"))
      .localCheckpoint(true) // the split report AND two audit folds
  }

  val q154_leakage_safe_split: Q = (s, dir) => {
    val assigned = q154Assigned(s, dir)
    def leaks(c: String, out: String) = assigned
      .groupBy(col("__gid")).agg(countDistinct(col(c)).as("__ns"))
      .where(col("__ns") > 1L).agg(count(lit(1)).as(out))
    assigned.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__gid")).as("n_groups"),
        expr("bit_xor(__h)").as("member_checksum"))
      .crossJoin(broadcast(leaks("split", "leaky_groups_grouped")))
      .crossJoin(broadcast(leaks("__naive", "leaky_groups_naive")))
  }

  /** The split-assignment CTE chain (dup groups -> gid -> hash
    * buckets -> split/naive labels, ending in `b`) — shared by the
    * q154 oracle and q155's memorization audit.
    */
  private def q154SplitSqlCtes: String =
    s"""$dupGroupCtes,
       |asg AS (SELECT d.doc_id,
       |    COALESCE(g.group_id, d.doc_id) AS gid
       |  FROM documents d LEFT JOIN groups g ON g.id = d.doc_id),
       |b AS (SELECT doc_id, gid,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
       |      AS h,
       |    CASE WHEN ('0x' || substr(md5(CAST(gid AS VARCHAR)), 1, 15))
       |                ::BIGINT % 100 < 80 THEN 'train'
       |         WHEN ('0x' || substr(md5(CAST(gid AS VARCHAR)), 1, 15))
       |                ::BIGINT % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split,
       |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
       |                ::BIGINT % 100 < 80 THEN 'train'
       |         WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
       |                ::BIGINT % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS naive
       |  FROM asg)""".stripMargin

  def q154_sql: String =
    s"""WITH RECURSIVE $q154SplitSqlCtes,
       |lg AS (SELECT CAST(COUNT(*) AS BIGINT) AS leaky_groups_grouped
       |  FROM (SELECT gid FROM b GROUP BY gid
       |        HAVING COUNT(DISTINCT split) > 1)),
       |ln2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS leaky_groups_naive
       |  FROM (SELECT gid FROM b GROUP BY gid
       |        HAVING COUNT(DISTINCT naive) > 1))
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT gid) AS BIGINT) AS n_groups,
       |  CAST(bit_xor(h) AS BIGINT) AS member_checksum,
       |  leaky_groups_grouped, leaky_groups_naive
       |FROM b CROSS JOIN lg CROSS JOIN ln2
       |GROUP BY split, leaky_groups_grouped, leaky_groups_naive""".stripMargin

  /** q155: n-gram memorization audit over the q154 split — the check
    * an eval team runs AFTER leakage-safe splitting: group-aware
    * assignment guarantees no near-duplicate straddles train/test,
    * but SUB-near-dup n-gram sharing (quotes, boilerplate, common
    * phrases) still lets the model "see" test text at train time.
    * Per TEST-split document: how many of its distinct 5-gram
    * shingles (the d07 decontamination rule — one shingle definition,
    * shared) also occur anywhere in the TRAIN split, and the seen
    * share — the memorization-risk score that decides whether an
    * eval number can be trusted. Composes two shipped operators
    * under one oracle: [[q154Assigned]]'s split and d07's shingle
    * algebra.
    *
    * Scale shape: ONE shingle explode, md5-hashed BEFORE the
    * materialization (d08/t26 discipline — the checkpoint, the train
    * DISTINCT, and the left-semi join all carry 32-byte keys, never
    * multi-word shingle text; the audit only counts matches, it never
    * emits a shingle, so hashing changes nothing downstream), the
    * train side collapsed to a vocabulary-bounded distinct set, one
    * map-side-combined per-doc count; seen_share is a single division
    * of exact BIGINTs.
    */
  val q155_memorization_audit: Q = (s, dir) => {
    val asg = q154Assigned(s, dir).select(col("doc_id"), col("split"))
    // ONE shingle explode over the corpus, materialized — the train
    // and test sides both read this compact (doc_id, split, n, tok)
    // stream; left lazy, each side would replay the corpus-scale
    // explode (at 100 TB this materialization IS the shingle index a
    // decontamination pipeline persists)
    val exploded = t(s, dir, "documents")
      .select(col("doc_id"),
        array_distinct(TextAnalysis.shingles(col("text"), 5)).as("__sh"))
      .join(asg, "doc_id")
      .where(col("split").isin("train", "test"))
      .select(col("doc_id"), col("split"),
        size(col("__sh")).cast("long").as("n_shingles"),
        explode_outer(col("__sh")).as("__tok"))
      .where(col("__tok").isNotNull)
      .select(col("doc_id"), col("split"), col("n_shingles"),
        // BINARY(16), not the 32-char hex (r18, the spanAnchors key
        // shrink): the key never reaches the output, and the
        // checkpoint + distinct + semi-join all halve their payload
        unhex(md5(col("__tok"))).as("tok"))
      .localCheckpoint(true)
    val trainSh = exploded.where(col("split") === "train")
      .select(col("tok")).distinct()
    val test = exploded.where(col("split") === "test")
    val seen = test.join(trainSh, Seq("tok"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_seen"))
    test.groupBy(col("doc_id"))
      .agg(first(col("n_shingles")).as("n_shingles"))
      .join(seen, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"),
        (coalesce(col("n_seen"), lit(0L)).cast("double") /
          col("n_shingles").cast("double")).as("seen_share"))
  }

  def q155_sql: String =
    s"""WITH RECURSIVE $q154SplitSqlCtes,
       |tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |shg AS (SELECT tk.doc_id, b.split,
       |  list_distinct(CASE WHEN len(toks) < 5
       |       THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(generate_series(1, len(toks) - 4),
       |                           i -> array_to_string(toks[i:i+4], ' '))
       |       END) AS sh
       | FROM tk JOIN b USING (doc_id)),
       |trn AS (SELECT DISTINCT unnest(sh) AS tok FROM shg
       |        WHERE split = 'train'),
       |tst AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles,
       |        unnest(sh) AS tok
       |  FROM shg WHERE split = 'test'),
       |sn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_seen
       |  FROM tst JOIN trn USING (tok) GROUP BY doc_id)
       |SELECT t.doc_id, MIN(t.n_shingles) AS n_shingles,
       |  CAST(COALESCE(MIN(sn.n_seen), 0) AS BIGINT) AS n_seen,
       |  CAST(COALESCE(MIN(sn.n_seen), 0) AS DOUBLE)
       |    / CAST(MIN(t.n_shingles) AS DOUBLE) AS seen_share
       |FROM tst t LEFT JOIN sn USING (doc_id)
       |GROUP BY t.doc_id""".stripMargin

  /** Sliding-window document chunking — the context-length splitter of
    * an LLM training pipeline: each document becomes ⌈(n−size)/stride⌉+1
    * overlapping chunks of `size` tokens with `overlap` carried between
    * neighbors (size 16 / overlap 4 here, scaled to the corpus's short
    * docs; a production 512/64 is the same plan). Pure narrow compute —
    * tokenize once, explode a computed chunk-index range, slice — no
    * shuffle at any scale.
    */
  val t11_chunking: Q = (s, dir) => {
    val size = 16
    val stride = 12 // size - overlap
    val staged = t(s, dir, "documents")
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .withColumn("__n", size_(col("__toks")))
      .where(col("__n") > 0)
      .withColumn("__nchunks",
        when(col("__n") <= size, lit(1L))
          .otherwise(
            floor((col("__n") - size + stride - 1) / lit(stride)).cast("long") + 1))
    staged
      .withColumn("chunk_id",
        explode_outer(sequence(lit(0L), col("__nchunks") - 1)))
      .withColumn("__chunk",
        slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"), lit(size)))
      .select(col("doc_id"), col("chunk_id"),
        size_(col("__chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }

  // size() shadowed by the local `size` val above
  private def size_(c: org.apache.spark.sql.Column) = size(c)

  val t11_sql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
       |c AS (SELECT doc_id, toks,
       |  unnest(generate_series(0,
       |    CASE WHEN n <= 16 THEN 0 ELSE (n - 16 + 11) // 12 END)) AS chunk_id
       | FROM n)
       |SELECT doc_id, chunk_id,
       |  len(toks[chunk_id*12 + 1 : chunk_id*12 + 16]) AS n_tokens,
       |  array_to_string(toks[chunk_id*12 + 1 : chunk_id*12 + 16], ' ') AS chunk_text
       |FROM c""".stripMargin

  /** Vocabulary build: corpus-wide token frequencies with document
    * frequency and a deterministic rank (count desc, token asc) — the
    * tokenizer-training precursor. One explode + one aggregate; the
    * top-K cut is a TakeOrdered, not a global sort.
    */
  val t12_vocab: Q = (s, dir) => {
    import s.implicits._
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
    // Top-K FIRST via orderBy().limit() — a TakeOrderedAndProject with
    // per-partition bounded heaps, never a global sort. (count, token)
    // is a strict total order (token is unique post-aggregate), so
    // limit(K) keeps exactly the rows an unpartitioned rank <= K
    // would. The rank then comes from the K COLLECTED rows' sort
    // position — a bounded 100-row driver hop, not a window (any
    // window ranking all rows needs an empty partition spec, which is
    // exactly the single-partition WindowExec this shape exists to
    // avoid; at 100 TB the aggregate is 10⁸⁺ tokens).
    tok.groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(100)
      .collect().toSeq.zipWithIndex
      .map { case (r, i) =>
        (r.getString(0), r.getLong(1), r.getLong(2), (i + 1).toLong)
      }
      .toDF("token", "n_occurrences", "n_docs", "rank")
  }

  val t12_sql: String =
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
       |v AS (SELECT token, COUNT(*) AS n_occurrences,
       |             COUNT(DISTINCT doc_id) AS n_docs
       |      FROM t GROUP BY token)
       |SELECT token, n_occurrences, n_docs,
       |  ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token ASC) AS rank
       |FROM v QUALIFY rank <= 100""".stripMargin

  /** Corpus-wide bigram frequencies with document frequency and a
    * deterministic rank — t12's vocabulary build at the n-gram level
    * (collocation mining / tokenizer-merge statistics). The bigram
    * explode is narrow; one aggregate + top-K.
    */
  val t13_ngram_freq: Q = (s, dir) => {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .where(size(col("__toks")) >= 2)
    // bigrams straight off the staged token array (shingles(text, 2)
    // would re-tokenize), exploded OUTER so the optimizer doesn't infer
    // a size filter whose pushdown re-evaluates the whole expression
    // (the q-series Generate lesson) — measured 5.1s → sub-second
    val bigrams = toks.select(col("doc_id"),
      explode_outer(transform(sequence(lit(1), size(col("__toks")) - 1),
        i => concat_ws(" ", slice(col("__toks"), i, lit(2))))).as("bigram"))
      .where(col("bigram").isNotNull)
    // same top-K-then-rank shape as t12: TakeOrderedAndProject cuts to
    // 50 rows, rank from the collected rows' sort position
    bigrams.groupBy(col("bigram"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("bigram").asc)
      .limit(50)
      .collect().toSeq.zipWithIndex
      .map { case (r, i) =>
        (r.getString(0), r.getLong(1), r.getLong(2), (i + 1).toLong)
      }
      .toDF("bigram", "n_occurrences", "n_docs", "rank")
  }

  val t13_sql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |f AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
       |bg AS (SELECT doc_id,
       |  unnest(list_transform(generate_series(1, len(toks) - 1),
       |                        i -> array_to_string(toks[i:i+1], ' '))) AS bigram
       | FROM f),
       |v AS (SELECT bigram, COUNT(*) AS n_occurrences,
       |             COUNT(DISTINCT doc_id) AS n_docs
       |      FROM bg GROUP BY bigram)
       |SELECT bigram, n_occurrences, n_docs,
       |  ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, bigram ASC) AS rank
       |FROM v QUALIFY rank <= 50""".stripMargin

  /** Edit-distance verification over fingerprint-bucketed candidates:
    * documents sharing a min-hash fingerprint (t04's operator) are
    * near-dup candidates; each pair gets its exact Levenshtein distance
    * and a length-normalized similarity. Candidates come from one
    * equi-join on the fingerprint — id-only discipline, texts re-attach
    * by id — so the DP-quadratic edit distance runs on candidate pairs,
    * never on the corpus product.
    */
  val t10_edit_distance: Q = (s, dir) => {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val fp = docs.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text"), k = 8).as("__fp"))
    val cand = fp.as("a").join(fp.as("b"), Seq("__fp"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val staged = cand
      .join(docs.select(col("doc_id").as("id_a"), col("text").as("__ta")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("text").as("__tb")), Seq("id_b"))
      .withColumn("edit_distance", levenshtein(col("__ta"), col("__tb")).cast("long"))
    staged.select(col("id_a"), col("id_b"), col("edit_distance"),
      (lit(1.0) - col("edit_distance").cast("double")
        / greatest(length(col("__ta")), length(col("__tb"))))
        .as("edit_similarity"))
  }

  val t10_sql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id,
       |  CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(generate_series(1, len(toks) - 7),
       |                           i -> array_to_string(toks[i:i+7], ' ')) END AS sh
       | FROM t),
       |fp AS (SELECT doc_id, list_min(list_transform(sh, x -> md5(x))) AS fp FROM sh),
       |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM fp a JOIN fp b USING (fp) WHERE a.doc_id < b.doc_id),
       |j AS (SELECT id_a, id_b,
       |  levenshtein(da.text, db.text) AS edit_distance,
       |  greatest(length(da.text), length(db.text)) AS mx
       | FROM cand JOIN documents da ON da.doc_id = id_a
       |           JOIN documents db ON db.doc_id = id_b)
       |SELECT id_a, id_b, edit_distance,
       |  1.0 - edit_distance::DOUBLE / mx AS edit_similarity
       |FROM j""".stripMargin

  /** Exact n-gram Jaccard near-duplicate pairs via prefix filtering —
    * the LOSSLESS counterpart to d02's MinHash: same 5-gram shingles,
    * same threshold, but guaranteed-complete output. Because the
    * algorithm is exact, the oracle is the brute-force GROUND TRUTH
    * (token-granularity overlap join — no candidate replay), so this
    * check also proves the prefix filter loses nothing at sf scale.
    */
  val d06_jaccard_neardups: Q = (s, dir) =>
    Dedup.ngramJaccardNearDups(t(s, dir, "documents"), "text", "doc_id",
      k = 5, threshold = 0.5)

  val d06_sql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id,
       |  list_distinct(CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(generate_series(1, len(toks) - 4),
       |                           i -> array_to_string(toks[i:i+4], ' ')) END) AS sh
       | FROM t),
       |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS tok FROM sh),
       |ov AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |        MIN(a.n) AS na, MIN(b.n) AS nb, COUNT(*) AS isect
       | FROM ex a JOIN ex b USING (tok) WHERE a.doc_id < b.doc_id
       | GROUP BY a.doc_id, b.doc_id)
       |SELECT id_a, id_b, isect::DOUBLE / (na + nb - isect) AS jaccard
       |FROM ov WHERE isect::DOUBLE / (na + nb - isect) >= 0.5""".stripMargin

  /** Test-set decontamination: treat sources src0-src15 as the training
    * corpus and src16-src19 as the held-out benchmark; flag train docs
    * covering ≥ 50% of a benchmark doc's distinct 5-grams. One
    * inverted-index join on the shingle — the pre-training
    * contamination sweep at corpus scale.
    */
  val d07_decontamination: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val isBench = col("source").isin("src16", "src17", "src18", "src19")
    Dedup.crossCorpusOverlap(
      docs.where(!isBench), docs.where(isBench),
      "text", "doc_id", k = 5, minOverlap = 0.5)
  }

  val d07_sql: String =
    s"""WITH t AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id, source,
       |  list_distinct(CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(generate_series(1, len(toks) - 4),
       |                           i -> array_to_string(toks[i:i+4], ' ')) END) AS sh
       | FROM t),
       |ex AS (SELECT doc_id, source, len(sh) AS n, unnest(sh) AS tok FROM sh),
       |tr AS (SELECT doc_id AS train_id, tok FROM ex
       |       WHERE source NOT IN ('src16', 'src17', 'src18', 'src19')),
       |be AS (SELECT doc_id AS bench_id, n AS bn, tok FROM ex
       |       WHERE source IN ('src16', 'src17', 'src18', 'src19')),
       |ov AS (SELECT train_id, bench_id, MIN(bn) AS bn, COUNT(*) AS shared_ngrams
       |       FROM tr JOIN be USING (tok) GROUP BY train_id, bench_id)
       |SELECT train_id, bench_id, shared_ngrams,
       |  shared_ngrams::DOUBLE / bn AS bench_coverage
       |FROM ov WHERE shared_ngrams::DOUBLE / bn >= 0.5""".stripMargin

  /** Embedding-cosine near-duplicate pairs (exhaustive variant so the
    * oracle can replay it; the LSH-bucketed variant is the scale path,
    * exercised in s02).
    */
  val d04_embedding_neardups: Q = (s, dir) =>
    Dedup.embeddingNearDups(t(s, dir, "embeddings"), "embedding", "vec_id",
      threshold = 0.5, bruteForce = true)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))

  // Zero-norm guard mirrors graft_cosine's (0.0, not NaN) — a latent
  // mismatch otherwise if the corpus ever contains an all-zero vector.
  private val cosSql =
    """CASE WHEN list_sum(list_transform(a.v, x -> x * x)) = 0
      |       OR list_sum(list_transform(b.v, x -> x * x)) = 0 THEN 0.0
      |     ELSE list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i])) /
      |          (sqrt(list_sum(list_transform(a.v, x -> x * x)))
      |           * sqrt(list_sum(list_transform(b.v, x -> x * x)))) END""".stripMargin

  val d04_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, $cosSql AS cos
       | FROM e a JOIN e b ON a.vec_id < b.vec_id)
       |SELECT id_a, id_b, ROUND(cos, 6) AS cosine FROM p WHERE cos >= 0.5""".stripMargin

  /** d16: the LSH-bucketed SCALE PATH for embedding near-dup pairs —
    * d04's production twin, the d02↔d06 duality applied to vectors
    * (d04 is the exhaustive ground truth whose brute-force oracle
    * replays at small scale; THIS is what runs at 100 TB). Candidates
    * come from the hyperplane bucket self-join with CORPUS-ADAPTIVE
    * plane count (⌈log₂(n/30)⌉ — s15's policy: fixed planes let
    * bucket occupancy grow with the corpus and Σ|bucket|² go
    * quadratic; pinning expected bucket size ≈ 30 keeps candidates
    * ≈ 30·n). The seeded planes are a pure function of (seed, dim,
    * planes, tables), so the oracle interpolates the exact same
    * double literals and replays bucket bits, candidate join and
    * cosine verify — the approximate path is hash-checked, not
    * spot-checked; recall vs d04's ground truth is additionally
    * spec-gated. 64 tables because the fixture's true pairs all hug
    * the 0.5 threshold (cos 0.50–0.60 — 60° angles, hyperplane
    * LSH's worst regime): boundary recall ≈ 1−(1−(2/3)^planes)^64.
    * At production thresholds (0.9+) a handful of tables suffices —
    * the table count is the recall dial, candidates stay ≈
    * tables·30·n under the adaptive plane count either way.
    */
  private val d16PlaneCounts =
    scala.collection.concurrent.TrieMap[String, Int]()

  /** The corpus-adaptive plane policy (s15's): pin expected bucket
    * occupancy ≈ 30. Shared by the query AND the oracle fallback so
    * the two sides cannot drift; DedupSpec asserts the fallback's
    * assumed fixture size still matches the shipped fixture.
    */
  def d16AdaptivePlanes(nVectors: Long): Int = math.max(4,
    math.ceil(math.log(nVectors / 30.0) / math.log(2.0)).toInt)

  val d16_embedding_neardups_lsh: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val planes = d16AdaptivePlanes(e.count())
    d16PlaneCounts(dir) = planes
    Dedup.embeddingNearDups(e, "embedding", "vec_id", threshold = 0.5,
      dim = 64, planes = planes, tables = 64, bruteForce = false)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  def d16_sql: String = {
    // the plane count the query ACTUALLY used for oracleSfDir: this
    // lookup is genuinely lazy — `oracles` and `d16_sql` are defs, and
    // Verify dumps oracle_sql.json only AFTER every query has run, so
    // a full verify always replays the exact planes the query chose.
    // The fallback (a VERIFY_ONLY subset that skipped d16) derives
    // from the same shared formula at the sf0.01 fixture's documented
    // 500-vector size, spec-pinned against fixture drift.
    val nPlanes = d16PlaneCounts.getOrElse(oracleSfDir, d16AdaptivePlanes(500))
    val hp = Similarity.hyperplanes(dim = 64, planes = nPlanes, tables = 64)
    val planeRows = for {
      (tablePlanes, tIdx) <- hp.zipWithIndex
      (plane, pIdx)       <- tablePlanes.zipWithIndex
    } yield s"($tIdx, $pIdx, [${plane.map(Relational.sqlDouble).mkString(",")}]::DOUBLE[])"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |planes(t, p, vec) AS (VALUES
       |  ${planeRows.mkString(",\n  ")}),
       |pb AS (SELECT e.vec_id, pl.t, pl.p,
       |  CASE WHEN list_reduce(list_transform(generate_series(1, 64),
       |         i -> e.v[i] * pl.vec[i]), (a, b) -> a + b) >= 0
       |       THEN '1' ELSE '0' END AS bit
       | FROM e CROSS JOIN planes pl),
       |bk AS (SELECT vec_id, t::VARCHAR || ':' || string_agg(bit, '' ORDER BY p) AS bucket
       | FROM pb GROUP BY vec_id, t),
       |cand AS (SELECT DISTINCT q.vec_id AS ida, c.vec_id AS idb
       | FROM bk q JOIN bk c USING (bucket)
       | WHERE q.vec_id < c.vec_id),
       |p AS (SELECT ida, idb, $cosSql AS cos
       | FROM cand JOIN e a ON a.vec_id = ida JOIN e b ON b.vec_id = idb)
       |SELECT ida AS id_a, idb AS id_b, ROUND(cos, 6) AS cosine
       |FROM p WHERE cos >= 0.5""".stripMargin
  }

  // ------------------------------------------------------- similarity

  /** Exact cosine top-10 neighbors for a small probe set (vec_id < 5):
    * broadcast the probes, stream the corpus, rank per query.
    */
  val s01_cosine_topk: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(
      e.where(col("vec_id") < 5), e,
      "vec_id", "embedding", "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
  }

  val s01_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |sc AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, $cosSql AS cos
       | FROM e a JOIN e b ON b.vec_id <> a.vec_id WHERE a.vec_id < 5),
       |r AS (SELECT query_id, neighbor_id, cos,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
       | FROM sc)
       |SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rank
       |FROM r WHERE rank <= 10""".stripMargin

  /** Approximate top-10 via random-hyperplane LSH (seeded planes) — the
    * 100 TB path: bucket join instead of the queries × corpus product.
    * The planes are a pure function of the seed, so the oracle
    * interpolates the exact same 64×64 double literals and replays the
    * whole pipeline — bucket bits, candidate join, exact-cosine rank —
    * making even this approximate path hash-checked. Recall quality is
    * additionally pinned by the SimilaritySpec recall gate: recall@10 =
    * 0.92 vs exact ground truth at this configuration (floor 0.85). On
    * an isotropic corpus P[table collision] ≈ (1/2)^planes, so recall
    * is bought with tables × 2^-planes — planes must grow with corpus
    * density, tables with the recall target.
    */
  private val lshIndexes =
    scala.collection.concurrent.TrieMap[String, Similarity.LshIndex]()

  val s02_lsh_ann_topk: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    // build-once/serve-many, like the IVF index: bucket construction is
    // the amortized index cost, searches pay only the candidate join
    val idx = lshIndexes.getOrElseUpdate(dir,
      Similarity.LshIndex.build(e, "vec_id", "embedding",
        dim = 64, planes = 4, tables = 16))
    idx.search(e.where(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
  }

  val s02_sql: String = {
    // the same seeded planes the Spark query materializes as literals,
    // emitted with Relational.sqlDouble so DuckDB parses identical bits
    val hp = Similarity.hyperplanes(dim = 64, planes = 4, tables = 16)
    val planeRows = for {
      (tablePlanes, tIdx) <- hp.zipWithIndex
      (plane, pIdx)       <- tablePlanes.zipWithIndex
    } yield s"($tIdx, $pIdx, [${plane.map(Relational.sqlDouble).mkString(",")}]::DOUBLE[])"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |planes(t, p, vec) AS (VALUES
       |  ${planeRows.mkString(",\n  ")}),
       |pb AS (SELECT e.vec_id, pl.t, pl.p,
       |  -- sign bit of the sequential dot against each plane (same
       |  -- accumulation order as graft_dot)
       |  CASE WHEN list_reduce(list_transform(generate_series(1, 64),
       |         i -> e.v[i] * pl.vec[i]), (a, b) -> a + b) >= 0
       |       THEN '1' ELSE '0' END AS bit
       | FROM e CROSS JOIN planes pl),
       |bk AS (SELECT vec_id, t::VARCHAR || ':' || string_agg(bit, '' ORDER BY p) AS bucket
       | FROM pb GROUP BY vec_id, t),
       |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       | FROM bk q JOIN bk c USING (bucket)
       | WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
       |sc AS (SELECT query_id, neighbor_id, $cosSql AS cos
       | FROM cand JOIN e a ON a.vec_id = query_id JOIN e b ON b.vec_id = neighbor_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
       | FROM sc)
       |SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rank
       |FROM r WHERE rank <= 10""".stripMargin
  }

  /** kNN-graph construction — every vector's top-3 approximate
    * neighbors in ONE pass, the backbone artifact of modern curation
    * (SemDeDup variants, diversity/typicality sampling, graph-based
    * label propagation all consume a kNN graph, not per-query
    * searches). The scale shape is the one thing that matters here:
    * s01/s02 broadcast a SMALL probe set, which cannot express
    * all-vectors-vs-all; the graph instead self-joins the LSH BUCKETS
    * (candidates = Σ|bucket|² over tables, never corpus²), re-attaches
    * vectors by id through keyed joins, scores with the codegen
    * cosine, and ranks with the custom [[graft.plans.TopKPerKey]]
    * whole-operator — map-side bounded heaps forward ≤ k rows per key
    * per partition into the final exchange, so the rank step shuffles
    * O(k·|corpus|), not the candidate volume. Oracle: the s02 seeded
    * hyperplanes replayed as SQL literals over ALL vectors.
    */
  private val lshKnnIndexes =
    scala.collection.concurrent.TrieMap[String, (Int, Similarity.LshIndex)]()

  /** s15's own index with CORPUS-ADAPTIVE plane count: fixed planes
    * make bucket sizes grow linearly with the corpus, so the bucket
    * SELF-join's Σ|bucket|² goes quadratic — the first s15 measured
    * exactly that (ScaleGrowth at 10× blew past 10 min). planes =
    * ⌈log₂(n / 30)⌉ (floor 4) pins expected bucket size at ~30, making
    * candidates ≈ 30·n — the same published policy as
    * `IvfIndex.adaptiveNLists`, applied to the hyperplane family. The
    * chosen count is stashed per dir so the ORACLE interpolates the
    * same seeded planes (the s03 dump-then-replay protocol: Verify
    * runs queries before dumping oracle SQL).
    */
  private def lshKnnIndex(s: SparkSession, dir: String): (Int, Similarity.LshIndex) =
    lshKnnIndexes.getOrElseUpdate(dir, {
      val e = t(s, dir, "embeddings")
      val planes = math.max(4,
        math.ceil(math.log(e.count() / 30.0) / math.log(2.0)).toInt)
      (planes, Similarity.LshIndex.build(e, "vec_id", "embedding",
        dim = 64, planes = planes, tables = 32))
    })

  val s15_knn_graph: Q = (s, dir) => {
    val idx = lshKnnIndex(s, dir)._2
    val b = idx.buckets
    val cand = b.select(col("bucket"), col("neighbor_id").as("query_id"))
      .join(b.select(col("bucket"), col("neighbor_id").as("neighbor_id")),
        Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id")).distinct()
    val va = idx.corpus.select(col("neighbor_id").as("query_id"),
      col("__cv").as("__va"))
    val vb = idx.corpus.select(col("neighbor_id"), col("__cv").as("__vb"))
    val scored = cand.join(va, Seq("query_id")).join(vb, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("__va"), col("__vb")).as("cosine"))
    graft.plans.TopKPerKey(scored, Seq("query_id"),
        Seq(col("cosine").desc, col("neighbor_id").asc), 3)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  def s15_sql: String = {
    // the planes count the query actually used for oracleSfDir (5 at
    // the 500-vector fixtures — the adaptive formula's value there)
    val nPlanes = lshKnnIndexes.get(oracleSfDir).map(_._1).getOrElse(5)
    val hp = Similarity.hyperplanes(dim = 64, planes = nPlanes, tables = 32)
    val planeRows = for {
      (tablePlanes, tIdx) <- hp.zipWithIndex
      (plane, pIdx)       <- tablePlanes.zipWithIndex
    } yield s"($tIdx, $pIdx, [${plane.map(Relational.sqlDouble).mkString(",")}]::DOUBLE[])"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |planes(t, p, vec) AS (VALUES
       |  ${planeRows.mkString(",\n  ")}),
       |pb AS (SELECT e.vec_id, pl.t, pl.p,
       |  CASE WHEN list_reduce(list_transform(generate_series(1, 64),
       |         i -> e.v[i] * pl.vec[i]), (a, b) -> a + b) >= 0
       |       THEN '1' ELSE '0' END AS bit
       | FROM e CROSS JOIN planes pl),
       |bk AS (SELECT vec_id, t::VARCHAR || ':' || string_agg(bit, '' ORDER BY p) AS bucket
       | FROM pb GROUP BY vec_id, t),
       |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       | FROM bk q JOIN bk c USING (bucket)
       | WHERE c.vec_id <> q.vec_id),
       |sc AS (SELECT query_id, neighbor_id, $cosSql AS cos
       | FROM cand JOIN e a ON a.vec_id = query_id JOIN e b ON b.vec_id = neighbor_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
       | FROM sc)
       |SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine
       |FROM r WHERE rank <= 3""".stripMargin
  }

  /** Cross-document repeated-span sweep (the memorization-risk audit a
    * pre-training pipeline runs; the span-level view of exact substring
    * dedup, Lee et al. '22 "Deduplicating Training Data Makes Language
    * Models Better"): every 20-token span occurring in ≥ 2 documents,
    * with document and occurrence counts. The span md5-hashes BEFORE
    * the aggregate, so the shuffle carries 32-byte keys instead of
    * ~150-byte span strings — at 100 TB the explode is ~1 row/token and
    * that key width is the difference between a feasible and an
    * impossible exchange. One narrow explode + one combined aggregate.
    */
  val d08_repeated_spans: Q = (s, dir) => {
    val k = 20
    t(s, dir, "documents")
      .transform(spreadScan)
      .select(col("doc_id"),
        explode_outer(TextAnalysis.shingles(col("text"), k)).as("span"))
      .where(col("span").isNotNull)
      .select(col("doc_id"), md5(col("span")).as("span_hash"))
      .groupBy(col("span_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_total"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .where(col("n_docs") >= 2)
  }

  val d08_sql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id,
       |  unnest(CASE WHEN len(toks) < 20 THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(generate_series(1, len(toks) - 19),
       |                           i -> array_to_string(toks[i:i+19], ' ')) END) AS span
       | FROM t)
       |SELECT md5(span) AS span_hash, COUNT(DISTINCT doc_id) AS n_docs,
       |  COUNT(*) AS n_total, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       |FROM sh GROUP BY md5(span) HAVING COUNT(DISTINCT doc_id) >= 2""".stripMargin

  /** d17: maximal exact-substring dedup
    * ([[graft.dedup.Dedup.maximalMatches]], the Lee et al. 2022
    * operator) — every maximal cross-document duplicated substring of
    * ≥ 20 tokens, with both documents' 1-based token offsets and the
    * span text itself. d08 COUNTS fixed-length repeated spans; this
    * EMITS the maximal spans a pipeline actually cuts: consecutive
    * matching 20-gram anchors merge per (pair, diagonal) into one
    * unextendable match. The oracle replays the anchor→diagonal→island
    * recurrence over raw gram strings (no hashing — an independent
    * equality), and DedupSpec verifies spans character-exact on
    * planted duplicates. Scale: md5 anchors into every shuffle,
    * Σ|bucket|² pair bound, islands windowed per (pair, diagonal) —
    * never a document cross product.
    */
  val d17_maximal_spans: Q = (s, dir) =>
    Dedup.maximalMatches(t(s, dir, "documents"), "text", "doc_id", L = 20)

  /** The d17 anchor→diagonal→island CTE chain (token table `tk` →
    * maximal-match inventory `agg`) — spliced by the d17 oracle AND
    * d18's cut replay, exactly as the Spark side shares
    * [[graft.dedup.Dedup.maximalMatches]].
    */
  private def d17CoreSqlCtes: String =
    s"""tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |posi AS (SELECT doc_id, toks,
       |    unnest(CASE WHEN len(toks) >= 20
       |           THEN generate_series(1, len(toks) - 19)
       |           ELSE [] END) AS i
       |  FROM tk),
       |pos AS (SELECT doc_id, CAST(i AS BIGINT) AS p,
       |    array_to_string(toks[i:i+19], ' ') AS gram
       |  FROM posi),
       |m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.p AS pa, b.p AS pb
       |  FROM pos a JOIN pos b ON a.gram = b.gram
       |  WHERE a.doc_id < b.doc_id),
       |r AS (SELECT doc_a, doc_b, pa, pb, pa - pb AS diag,
       |    pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb
       |                            ORDER BY pa) AS isl
       |  FROM m),
       |agg AS (SELECT doc_a, doc_b, MIN(pa) AS a_start, MIN(pb) AS b_start,
       |    CAST(COUNT(*) + 19 AS BIGINT) AS n_tokens
       |  FROM r GROUP BY doc_a, doc_b, diag, isl)""".stripMargin

  def d17_sql: String =
    s"""WITH $d17CoreSqlCtes
       |SELECT agg.doc_a, agg.doc_b, agg.a_start, agg.b_start, agg.n_tokens,
       |  array_to_string(tk.toks[agg.a_start : agg.a_start + agg.n_tokens - 1],
       |                  ' ') AS span
       |FROM agg JOIN tk ON tk.doc_id = agg.doc_a""".stripMargin

  /** d18: exact-substring CUT ([[graft.dedup.Dedup.cutMaximalMatches]])
    * — the second half of Lee et al. 2022's recipe: apply d17's
    * maximal-match inventory by deleting every duplicated ≥ 20-token
    * occurrence except the one in the lowest doc id. Cut intervals
    * (the doc_b side of every d17 row) union per document through the
    * running-max-end islands window; the text rebuilds keeping every
    * token position outside the merged intervals. Every document
    * comes back (uncut ones pass through with n_removed = 0), so the
    * output IS the post-dedup training corpus plus its audit counts.
    * The oracle replays the shared [[d17CoreSqlCtes]] inventory, the
    * same interval union, and the same positional cut in DuckDB list
    * algebra — a hash match certifies the surgery token-for-token.
    */
  val d18_exact_substring_cut: Q = (s, dir) =>
    Dedup.cutMaximalMatches(t(s, dir, "documents"), "text", "doc_id", L = 20)

  def d18_sql: String =
    s"""WITH $d17CoreSqlCtes,
       |cuts AS (SELECT DISTINCT doc_b AS doc_id, b_start AS s,
       |    b_start + n_tokens AS e
       |  FROM agg),
       |isl2 AS (SELECT doc_id, s, e,
       |    CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id
       |           ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
       |           AND 1 PRECEDING), -9223372036854775808) THEN 1 ELSE 0
       |    END AS nw
       |  FROM cuts),
       |isl3 AS (SELECT doc_id, s, e,
       |    SUM(nw) OVER (PARTITION BY doc_id ORDER BY s, e
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
       |  FROM isl2),
       |mrg AS (SELECT doc_id, MIN(s) AS s, MAX(e) AS e
       |  FROM isl3 GROUP BY doc_id, isl),
       |iv AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS iv,
       |    CAST(COUNT(*) AS BIGINT) AS n_spans_cut
       |  FROM mrg GROUP BY doc_id),
       |ct AS (SELECT tk.doc_id, tk.toks, iv.iv, iv.n_spans_cut,
       |    CASE WHEN iv.iv IS NULL THEN toks
       |         ELSE list_transform(
       |           list_filter(generate_series(1, len(toks)),
       |             p -> len(list_filter(iv.iv,
       |                    v -> p >= v.s AND p < v.e)) = 0),
       |           p -> toks[p]) END AS kept
       |  FROM tk LEFT JOIN iv USING (doc_id))
       |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(toks) - len(kept) AS BIGINT) AS n_removed,
       |  COALESCE(n_spans_cut, 0) AS n_spans_cut,
       |  -- a fully-cut document keeps zero tokens: DuckDB's
       |  -- array_to_string yields NULL on the empty list, Spark's
       |  -- concat_ws yields '' — pin the empty string
       |  COALESCE(array_to_string(kept, ' '), '') AS clean_text
       |FROM ct""".stripMargin

  /** Incremental batch-vs-corpus near-dup admission: every tenth doc
    * plays the incoming batch, the rest the standing corpus. Same
    * signature family and constants as d02, so the oracle replays the
    * whole pipeline; the operator only ever pairs corpus×batch — the
    * corpus is never self-joined.
    */
  val d09_incremental_neardups: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val isBatch = pmod(col("doc_id"), lit(10)) === 0
    Dedup.incrementalNearDups(
      docs.where(!isBatch), docs.where(isBatch),
      "text", "doc_id", k = 5, numHashes = 16, bands = 4, threshold = 0.5)
  }

  val d09_sql: String = {
    // Same universal-hash MinHash replay as d02_sql; the only change is
    // the candidate stage joining corpus-banded against batch-banded.
    val sigExprs = Dedup.minhashCoeffs(16).map { case (a, b) =>
      s"list_min(list_transform(bh, v -> (v * $a + $b) % ${Dedup.minhashP}))"
    }.mkString("[", ",\n    ", "]")
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id,
       |  CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(generate_series(1, len(toks) - 4),
       |                           i -> array_to_string(toks[i:i+4], ' ')) END AS sh
       | FROM t),
       |bh AS (SELECT doc_id, sh,
       |  list_transform(sh, s -> ('0x' || substr(md5(s), 1, 7))::BIGINT) AS bh
       | FROM sh),
       |sig AS (SELECT doc_id, sh,
       |  $sigExprs AS sig
       | FROM bh),
       |banded AS (SELECT doc_id, sh,
       |  unnest(list_transform(generate_series(0, 3),
       |                        b -> md5(b::VARCHAR || ':' || array_to_string(sig[b*4+1:b*4+4], ',')))) AS band
       | FROM sig),
       |cand AS (SELECT DISTINCT c.doc_id AS corpus_id, b.doc_id AS batch_id,
       |                c.sh AS sh_c, b.sh AS sh_b
       | FROM banded c JOIN banded b USING (band)
       | WHERE c.doc_id % 10 <> 0 AND b.doc_id % 10 = 0),
       |j AS (SELECT batch_id, corpus_id,
       |  list_distinct(sh_c) AS sc, list_distinct(sh_b) AS sb FROM cand),
       |jj AS (SELECT batch_id, corpus_id,
       |  CASE WHEN len(sc) = 0 AND len(sb) = 0 THEN 1.0
       |       WHEN len(sc) = 0 OR len(sb) = 0 THEN 0.0
       |       ELSE len(list_filter(sb, x -> list_contains(sc, x)))::DOUBLE
       |            / (len(sb) + len(sc) - len(list_filter(sb, x -> list_contains(sc, x)))) END AS jaccard
       | FROM j)
       |SELECT batch_id, corpus_id, jaccard FROM jj WHERE jaccard >= 0.5""".stripMargin
  }

  /** Containment near-dups (overlap coefficient ≥ 0.7): the embedded /
    * quoted-document detector Jaccard misses. The oracle is the
    * brute-force ground truth over every shingle-sharing pair, so the
    * hash check doubles as a recall proof for the prefix filter.
    */
  val d10_containment_neardups: Q = (s, dir) =>
    Dedup.containmentNearDups(t(s, dir, "documents"), "text", "doc_id",
      k = 5, threshold = 0.7)

  val d10_sql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id,
       |  CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(generate_series(1, len(toks) - 4),
       |                           i -> array_to_string(toks[i:i+4], ' ')) END AS sh
       | FROM t),
       |s AS (SELECT doc_id, list_distinct(sh) AS s, len(list_distinct(sh)) AS n FROM sh),
       |ex AS (SELECT doc_id, n, unnest(s) AS tok FROM s),
       |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |                MIN(a.n) AS na, MIN(b.n) AS nb, COUNT(*) AS i
       | FROM ex a JOIN ex b USING (tok)
       | WHERE a.n < b.n OR (a.n = b.n AND a.doc_id < b.doc_id)
       | GROUP BY a.doc_id, b.doc_id)
       |SELECT id_a, id_b, i::BIGINT AS shared,
       |  i::DOUBLE / LEAST(na, nb) AS containment
       |FROM cand WHERE i::DOUBLE / LEAST(na, nb) >= 0.7""".stripMargin

  /** TF-IDF top terms per document — the keyword-extraction /
    * relevance-weighting stage of a curation pipeline. tf and df are
    * exact integer aggregates; the idf log is tf·(ln N − ln df) over
    * exact integers through [[graft.functions.PortableMath]], reported
    * in e-6 integer units (round(double·ln, 6) is the round-9
    * engine-divergence class), and ranking orders by the quantized
    * score (ties broken by token), so rank is engine-stable. Shape:
    * explode (narrow) → (doc, token) aggregate → token aggregate →
    * token-keyed join → per-doc rank window — every shuffle keyed,
    * the N scalar broadcast.
    */
  private def t14Bindings: graft.functions.PortableMath.Bindings = {
    import graft.functions.PortableMath._
    lnPosBigint("__nn", "__lnn") ++ lnPosBigint("df", "__lnd") :+
      ("tfidf_e6" -> roundedUnits(Dual.col("tf").toDouble *
        (Dual.col("__lnn") - Dual.col("__lnd")), 6))
  }

  val t14_tfidf_terms: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val n = docs.agg(countDistinct(col("doc_id")).as("__nn"))
    val tok = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("token"))
    val tf = tok.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    // df as a COUNT over a token-partitioned window on the tf rows: one
    // keyed shuffle, and the corpus is tokenized exactly once — the
    // self-join formulation (tf ⋈ tf.groupBy(token)) re-derives the tf
    // subtree and tokenizes every document a second time
    val wDf = Window.partitionBy(col("token"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf_e6").desc, col("token").asc)
    graft.functions.PortableMath.withBindings(
        tf.withColumn("df", count(lit(1)).over(wDf)).crossJoin(broadcast(n)),
        t14Bindings)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("tfidf_e6"), col("rank"))
  }

  def t14_sql: String = {
    val chain = graft.functions.PortableMath.sqlWithBindings(
      "SELECT doc_id, token, tf, df, nn AS __nn " +
        "FROM tf JOIN df USING (token) CROSS JOIN n", t14Bindings)
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
       |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY doc_id, token),
       |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
       |n AS (SELECT COUNT(DISTINCT doc_id) AS nn FROM documents),
       |x AS ($chain),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |  ORDER BY tfidf_e6 DESC, token ASC) AS rank FROM x)
       |SELECT doc_id, token, tf, df, tfidf_e6, rank FROM r WHERE rank <= 3""".stripMargin
  }

  /** Corpus mixture weights: per (source, lang) slice, a
    * temperature-scaled sampling weight w ∝ n_docs^0.5 (τ=2 in the
    * multilingual-sampling convention) — how a training pipeline
    * up-weights small slices without drowning in the big ones. The
    * per-slice sqrt is correctly-rounded IEEE in any engine; quantizing
    * it to DECIMAL(18,6) before the denominator sum makes the total
    * order-independent-exact, so the final division is bit-stable.
    * One aggregate over the corpus + one broadcast scalar.
    */
  val t15_mixture_weights: Q = (s, dir) => {
    val g = t(s, dir, "documents")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("__sq",
        round(sqrt(col("n_docs")), 6).cast("decimal(18,6)"))
    val tot = g.agg(sum(col("__sq")).cast("decimal(38,6)").as("__tot"))
    g.crossJoin(broadcast(tot))
      .withColumn("weight",
        round(col("__sq").cast("double") / col("__tot").cast("double"), 6))
      .select(col("source"), col("lang"), col("n_docs"), col("weight"))
  }

  val t15_sql: String =
    """WITH g AS (SELECT source, lang, COUNT(*) AS n_docs,
      |  CAST(ROUND(sqrt(COUNT(*)::DOUBLE), 6) AS DECIMAL(18,6)) AS sq
      | FROM documents GROUP BY source, lang),
      |tot AS (SELECT CAST(SUM(sq) AS DECIMAL(38,6)) AS tot FROM g)
      |SELECT source, lang, n_docs,
      |  ROUND(CAST(sq AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS weight
      |FROM g CROSS JOIN tot""".stripMargin

  /** Corpus position index: each document's global start offset in the
    * concatenated token stream (the byte/token-offset manifest a
    * packing or random-access loader needs). A global running sum is
    * the textbook single-partition window trap, so this computes a
    * scale-safe two-level prefix sum instead: per-bucket subtotals
    * (one tiny aggregate), an exclusive prefix over the ~N/8192
    * bucket rows (the only unpartitioned window — thousands of rows at
    * 100 TB, never documents), then a within-bucket running sum
    * partitioned by bucket. The oracle states the naive global window
    * directly — same numbers, independent plan.
    */
  val t16_corpus_positions: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val bucketSize = 8192L // docs per bucket; prefix table = N/8192 rows
    val counts = t(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCountOf(TextAnalysis.tokens(col("text")))
          .cast("long").as("n_tokens"))
      .withColumn("__bucket", floor(col("doc_id") / bucketSize))
    // Two branches over `counts`: the prefix branch partial-aggregates
    // per bucket BEFORE its exchange, so its shuffle carries only
    // ~buckets×partitions partial sums — the corpus itself shuffles
    // once (the window branch). The tokenize projection runs once per
    // branch (column pruning makes the subtrees differ, so exchange
    // reuse can't kick in): a constant 2× scan factor, not a scale
    // term — a production pipeline materializes (doc_id, n_tokens)
    // once and feeds both from it.
    // ONE deliberate partition of ~N/8192 bucket rows (thousands at
    // 100 TB, never documents). The partition key is constant-valued
    // but non-foldable (pmod(b,1) = 0): a literal would be folded away
    // and leave a genuinely unpartitioned window — this keeps the
    // intent visible to WindowExec and to PlanLintSpec's scale lint.
    val wBuckets = Window.partitionBy(pmod(col("__bucket"), lit(1)))
      .orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = counts.groupBy(col("__bucket"))
      .agg(sum(col("n_tokens")).as("__btot"))
      .select(col("__bucket"),
        coalesce(sum(col("__btot")).over(wBuckets), lit(0L)).as("__bstart"))
    val wInBucket = Window.partitionBy(col("__bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    counts.join(broadcast(prefixes), "__bucket")
      .select(col("doc_id"), col("n_tokens"),
        (col("__bstart") +
          coalesce(sum(col("n_tokens")).over(wInBucket), lit(0L)))
          .as("start_offset"))
  }

  val t16_sql: String =
    s"""WITH t AS (SELECT doc_id, len($toksSql) AS n_tokens FROM documents)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS start_offset
       |FROM t""".stripMargin

  /** Sketch-guided exact heavy hitters over corpus bigrams — the
    * one-pass answer to "frequent n-grams" when the key domain is too
    * large for a full groupBy: a SpaceSaving summary
    * ([[graft.functions.FreqSketch]], k=2048 counters per partition,
    * merged map-side) nominates candidates, and an exact recount over
    * JUST those (broadcast semi-join, ≤ k keys) makes the answer
    * exact. The overestimate guarantee means the candidate cut can
    * never drop a true heavy hitter as long as the threshold exceeds
    * N/k (here N/800 > N/2048). Two passes over the bigram stream
    * total; the shuffle carries k counters + candidate keys, never the
    * bigram domain. The oracle is the direct exact aggregate — no
    * sketch — so the hash check proves the pipeline loses nothing.
    * Threshold compare is pure integer arithmetic (n·800 > N),
    * engine-exact.
    */
  val t17_heavy_hitters: Q = (s, dir) => {
    def bigrams = {
      val toks = t(s, dir, "documents")
        .select(TextAnalysis.tokens(col("text")).as("__toks"))
        .where(size(col("__toks")) >= 2)
      toks.select(
        explode_outer(transform(sequence(lit(1), size(col("__toks")) - 1),
          i => concat_ws(" ", slice(col("__toks"), i, lit(2))))).as("bigram"))
        .where(col("bigram").isNotNull)
    }
    val summary = bigrams.agg(
      graft.functions.FreqSketch.spaceSavingTopK(col("bigram"), 2048)
        .as("__summary"),
      count(lit(1)).as("__n"))
    val candidates = summary
      .select(col("__n"), explode(col("__summary")).as("__e"))
      .where(col("__e.est") * 800 > col("__n"))
      .select(col("__e.item").as("bigram"), col("__n"))
    bigrams
      .join(broadcast(candidates.select(col("bigram"))), Seq("bigram"), "left_semi")
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n_occurrences"))
      .join(broadcast(candidates), Seq("bigram"))
      .where(col("n_occurrences") * 800 > col("__n"))
      .select(col("bigram"), col("n_occurrences"))
  }

  val t17_sql: String =
    s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
       |f AS (SELECT toks FROM t WHERE len(toks) >= 2),
       |bg AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
       |                     i -> array_to_string(toks[i:i+1], ' '))) AS bigram
       |       FROM f),
       |n AS (SELECT COUNT(*) AS n FROM bg),
       |c AS (SELECT bigram, COUNT(*) AS n_occurrences FROM bg GROUP BY bigram)
       |SELECT bigram, n_occurrences
       |FROM c, n WHERE n_occurrences * 800 > n""".stripMargin

  /** Grouped sketch-guided heavy hitters — [[t17_heavy_hitters]]
    * through `groupBy(lang)`: one SpaceSaving summary PER GROUP,
    * partials combining map-side like any hash aggregate, then the
    * per-group exact recount keyed on (lang, bigram). The shuffle
    * carries |langs|·k counters + candidate keys — at 100 TB the
    * grouped summary costs the same as the global one times the group
    * count, never the key domain. Per-group thresholds (n·400 > N_lang
    * > N_lang/2048·400 ⇒ guarantee holds per group).
    */
  val t18_heavy_hitters_by_lang: Q = (s, dir) => {
    def bigrams = {
      val toks = t(s, dir, "documents")
        .select(col("lang"), TextAnalysis.tokens(col("text")).as("__toks"))
        .where(size(col("__toks")) >= 2)
      toks.select(col("lang"),
        explode_outer(transform(sequence(lit(1), size(col("__toks")) - 1),
          i => concat_ws(" ", slice(col("__toks"), i, lit(2))))).as("bigram"))
        .where(col("bigram").isNotNull)
    }
    val summaries = bigrams.groupBy(col("lang")).agg(
      graft.functions.FreqSketch.spaceSavingTopK(col("bigram"), 2048)
        .as("__summary"),
      count(lit(1)).as("__n"))
    val candidates = summaries
      .select(col("lang"), col("__n"), explode(col("__summary")).as("__e"))
      .where(col("__e.est") * 400 > col("__n"))
      .select(col("lang"), col("__e.item").as("bigram"), col("__n"))
    bigrams
      .join(broadcast(candidates.select(col("lang"), col("bigram"))),
        Seq("lang", "bigram"), "left_semi")
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("n_occurrences"))
      .join(broadcast(candidates), Seq("lang", "bigram"))
      .where(col("n_occurrences") * 400 > col("__n"))
      .select(col("lang"), col("bigram"), col("n_occurrences"))
  }

  val t18_sql: String =
    s"""WITH t AS (SELECT lang, $toksSql AS toks FROM documents),
       |f AS (SELECT lang, toks FROM t WHERE len(toks) >= 2),
       |bg AS (SELECT lang,
       |  unnest(list_transform(generate_series(1, len(toks) - 1),
       |                        i -> array_to_string(toks[i:i+1], ' '))) AS bigram
       |       FROM f),
       |n AS (SELECT lang, COUNT(*) AS n FROM bg GROUP BY lang),
       |c AS (SELECT lang, bigram, COUNT(*) AS n_occurrences
       |      FROM bg GROUP BY lang, bigram)
       |SELECT c.lang, c.bigram, c.n_occurrences
       |FROM c JOIN n ON c.lang = n.lang
       |WHERE c.n_occurrences * 400 > n.n""".stripMargin

  /** Per-label embedding centroids (class prototypes — the mean-pooling
    * stage of prototype classifiers / dataset cartography), emitted as
    * (label, pos, value) rows. posexplode fans each vector into 64
    * keyed rows and ONE map-side-combined aggregate does the rest — at
    * 100 TB the shuffle carries (labels × dim) partial sums, never
    * vectors. Element sums quantize the (exact) float→double values to
    * DECIMAL(18,9) so the mean is order-independent-exact.
    */
  val s04_label_centroids: Q = (s, dir) =>
    t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("v").cast("double").cast("decimal(18,9)")).as("__sum"))
      .withColumn("centroid_val",
        round(col("__sum").cast("double") / col("n_vectors"), 6))
      .select(col("label"), col("pos").cast("long").as("pos"),
        col("n_vectors"), col("centroid_val"))

  val s04_sql: String =
    """WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
      |u AS (SELECT label, v, unnest(generate_series(1, len(v))) AS i FROM e),
      |g AS (SELECT label, CAST(i - 1 AS BIGINT) AS pos, COUNT(*) AS n_vectors,
      |  SUM(CAST(v[i] AS DECIMAL(18,9))) AS s
      | FROM u GROUP BY label, i)
      |SELECT label, pos, n_vectors,
      |  ROUND(CAST(s AS DOUBLE) / n_vectors, 6) AS centroid_val
      |FROM g""".stripMargin

  /** BM25 retrieval (Okapi, k1=1.2, b=0.75): rank documents against a
    * fixed query-term set — the lexical-retrieval counterpart of the
    * embedding top-k family (s01–s03) and the scoring stage quality
    * filtering / hard-negative mining pipelines run at corpus scale.
    * tf/df/dl/N are exact integer aggregates; avgdl is one rounded
    * double division; each per-term score is quantized to
    * DECIMAL(18,6) before the per-document sum, so the total is
    * order-independent-exact and the final ranking engine-stable
    * (ties broken by doc_id). Shape: tokenize once, filter to the
    * query terms BEFORE any shuffle (the exploded stream shrinks to
    * ~|terms|·N rows), df via a token-partitioned window on the tf
    * rows (the t14 recipe — no second tokenize pass), top-20 as a
    * TakeOrdered. The corpus-length branch is one count/sum aggregate.
    */
  /** BM25 term scoring in exact e-6 units. The Robertson idf
    * ln(1 + (N−df+½)/(df+½)) = ln(2N+2) − ln(2df+1) — a difference of
    * portable lns over exact integers (the ×2 clears the halves); the
    * avgdl normalizer is itself e-6-quantized before use so the whole
    * per-term expression evaluates from engine-identical inputs.
    */
  private def t19Bindings: graft.functions.PortableMath.Bindings = {
    import graft.functions.PortableMath._
    val two = Dual.litL(2L)
    val avgD = Dual.col("__avg6").toDouble / Dual.lit(1.0e6)
    val tfD = Dual.col("tf").toDouble
    val den = tfD + Dual.lit(1.2) * (Dual.lit(0.25) +
      Dual.lit(0.75) * Dual.col("dl").toDouble / avgD)
    Seq(
      "__in" -> (two * (Dual.col("__nn") + Dual.litL(1L))),
      "__idd" -> (two * Dual.col("df") + Dual.litL(1L)),
      "__avg6" -> roundedUnits(
        Dual.col("__sd").toDouble / Dual.col("__nn").toDouble, 6)) ++
      lnPosBigint("__in", "__lni") ++ lnPosBigint("__idd", "__lnid") :+
      ("__term_e6" -> roundedUnits(
        (Dual.col("__lni") - Dual.col("__lnid")) * tfD * Dual.lit(2.2) / den,
        6))
  }

  val t19_bm25: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val qTerms = Seq("spark", "vector", "window")
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("long"))
    val stats = toks.agg(count(lit(1)).as("__nn"), sum(col("dl")).as("__sd"))
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("token"))
      .where(col("token").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("token"))))
    graft.functions.PortableMath
      .withBindings(withDf.crossJoin(broadcast(stats)), t19Bindings)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("__term_e6")).as("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id").asc)
      .limit(20)
  }

  def t19_sql: String = {
    val chain = graft.functions.PortableMath.sqlWithBindings(
      "SELECT doc_id, dl, tf, df, nn AS __nn, sd AS __sd " +
        "FROM d CROSS JOIN st", t19Bindings)
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |l AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM t),
       |st AS (SELECT COUNT(*) AS nn, CAST(SUM(dl) AS BIGINT) AS sd FROM l),
       |x AS (SELECT doc_id, dl, unnest(toks) AS token FROM l),
       |tf AS (SELECT doc_id, dl, token, COUNT(*) AS tf FROM x
       |  WHERE token IN ('spark', 'vector', 'window')
       |  GROUP BY doc_id, dl, token),
       |d AS (SELECT *, COUNT(*) OVER (PARTITION BY token) AS df FROM tf),
       |sc AS ($chain)
       |SELECT doc_id, COUNT(*) AS n_terms,
       |  CAST(SUM(__term_e6) AS BIGINT) AS score_e6
       |FROM sc GROUP BY doc_id
       |ORDER BY score_e6 DESC, doc_id ASC LIMIT 20""".stripMargin
  }

  /** PII redaction sweep — the privacy-scrubbing stage every released
    * training corpus runs: detect and mask email addresses and phone
    * numbers, reporting per-document hit counts and a digest of the
    * scrubbed text. The corpus is synthetic, so (the q66 recipe) the
    * query plants deterministic PII in a known subset of documents
    * in-query — detection and masking are then fully oracle-replayable.
    * Patterns stay in the regex subset Java and RE2 evaluate
    * identically (char classes + bounded repetition, no lookaround);
    * the digest compares md5(redacted) so no text crosses the result.
    * One narrow codegen'd projection — no shuffle at any scale.
    */
  val t20_pii_redaction: Q = (s, dir) => {
    val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phonePat = "\\d{3}-\\d{4}"
    val planted = concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")))
    t(s, dir, "documents")
      .select(col("doc_id"), planted.as("__t"))
      .select(col("doc_id"),
        regexp_count(col("__t"), lit(emailPat)).cast("long").as("n_emails"),
        regexp_count(col("__t"), lit(phonePat)).cast("long").as("n_phones"),
        md5(regexp_replace(
          regexp_replace(col("__t"), emailPat, "<EMAIL>"),
          phonePat, "<PHONE>")).as("redacted_md5"))
  }

  val t20_sql: String =
    """WITH p AS (SELECT doc_id, text || CASE WHEN doc_id % 7 = 0
      |    THEN ' contact user' || CAST(doc_id AS VARCHAR)
      |      || '@example.com or 555-'
      |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |    ELSE '' END AS t FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t,
      |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(t, '\d{3}-\d{4}')) AS BIGINT) AS n_phones,
      |  md5(regexp_replace(regexp_replace(t,
      |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |    '\d{3}-\d{4}', '<PHONE>', 'g')) AS redacted_md5
      |FROM p""".stripMargin

  /** Vocabulary coverage / OOV rate — the tokenizer-fit diagnostic run
    * before committing a vocab: build the top-100 token vocabulary
    * (deterministic (freq desc, token asc) cut, the t12 ranking rule)
    * and report each document's out-of-vocabulary token count and
    * rate. The vocab side is a 100-row broadcast; the per-doc side is
    * one keyed aggregate over the exploded stream, with OOV decided by
    * a broadcast left join — no shuffle carries tokens twice. The two
    * branches re-tokenize the corpus (the documented t16 diamond
    * cost); the vocab branch's aggregate is tiny next to it.
    */
  val t21_oov_rate: Q = (s, dir) => {
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
    val vocab = tok.groupBy(col("token")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("token").asc).limit(100)
      .select(col("token"), lit(1).as("__v"))
    tok.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
  }

  val t21_sql: String =
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
       |v AS (SELECT token FROM (SELECT token, COUNT(*) AS n FROM t
       |    GROUP BY token ORDER BY n DESC, token ASC LIMIT 100)),
       |j AS (SELECT t.doc_id, t.token, v.token IS NOT NULL AS in_vocab
       |  FROM t LEFT JOIN v ON t.token = v.token)
       |SELECT doc_id, COUNT(*) AS n_tokens,
       |  CAST(SUM(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
       |  ROUND(CAST(SUM(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS DOUBLE)
       |    / COUNT(*), 6) AS oov_rate
       |FROM j GROUP BY doc_id""".stripMargin

  /** Token-distribution entropy per document — the lexical-diversity
    * quality signal (low entropy ⇒ repetitive/boilerplate text, high ⇒
    * diverse vocabulary) used alongside t02's surface ratios and t06's
    * repetition fractions in corpus filtering. Computed by the
    * algebraic identity H = ln(n) − (Σ c·ln c)/n over per-document
    * token counts, with each c·ln c term rounded and quantized to
    * DECIMAL before the sum — order-independent-exact, so the double
    * math is bit-replayable. One (doc, token) aggregate then one doc
    * aggregate; both keyed, nothing global.
    */
  private def t22TermBindings: graft.functions.PortableMath.Bindings = {
    import graft.functions.PortableMath._
    lnPosBigint("__c", "__lnc") :+
      ("__t_e9" -> roundedUnits(
        Dual.col("__c").toDouble * Dual.col("__lnc"), 9))
  }

  private def t22OutBindings: graft.functions.PortableMath.Bindings = {
    import graft.functions.PortableMath._
    lnPosBigint("n_tokens", "__lnt") :+
      ("entropy_e6" -> roundedUnits(Dual.col("__lnt") -
        (Dual.col("__s").toDouble / Dual.lit(1.0e9)) /
          Dual.col("n_tokens").toDouble, 6))
  }

  val t22_token_entropy: Q = (s, dir) => {
    import graft.functions.PortableMath
    val c = t(s, dir, "documents")
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("__c"))
    val g = PortableMath.withBindings(c, t22TermBindings)
      .groupBy(col("doc_id"))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("__t_e9")).as("__s"))
    PortableMath.withBindings(g, t22OutBindings)
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("entropy_e6"))
  }

  def t22_sql: String = {
    import graft.functions.PortableMath
    val termChain = PortableMath.sqlWithBindings(
      "SELECT doc_id, token, c AS __c FROM c", t22TermBindings)
    val outChain = PortableMath.sqlWithBindings(
      "SELECT * FROM a", t22OutBindings)
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
       |c AS (SELECT doc_id, token, COUNT(*) AS c FROM t GROUP BY doc_id, token),
       |ct AS ($termChain),
       |a AS (SELECT doc_id, CAST(SUM(__c) AS BIGINT) AS n_tokens,
       |    COUNT(*) AS n_distinct,
       |    CAST(SUM(__t_e9) AS BIGINT) AS __s
       |  FROM ct GROUP BY doc_id),
       |f AS ($outChain)
       |SELECT doc_id, n_tokens, n_distinct, entropy_e6 FROM f""".stripMargin
  }

  /** Per-vector symmetric int8 quantization manifest — the compression
    * step that makes a 100 TB float32 embedding store servable (4×
    * smaller, SIMD-friendly int dot products; the IVF/LSH ANN paths
    * would probe quantized codes and re-rank survivors in float).
    * scale = max|v|/127; codes are round-clamped ints. Outputs per
    * vector: the scale, exact integer code checksums (sum/min/max —
    * any engine disagreement in a single code flips them), and the
    * reconstruction error Σ(v−q·scale)², per-element quantized to
    * DECIMAL(28,12) so the sum is order-independent-exact. Zero
    * vectors (scale 0) are excluded up front — division semantics
    * under NULL/0 differ across engines. Shape: one narrow projection,
    * explode, ONE keyed aggregate on vec_id.
    */
  val s05_int8_quant: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        size(col("embedding")).cast("long").as("n_dims"),
        (array_max(transform(col("embedding"), x => abs(x.cast("double"))))
          / lit(127)).as("__sc"),
        col("embedding"))
      .where(col("__sc") > 0)
    val v = col("v").cast("double")
    val qi = least(lit(127.0), greatest(lit(-127.0), round(v / col("__sc"), 0)))
      .cast("int")
    e.select(col("vec_id"), col("label"), col("n_dims"), col("__sc"),
        explode(col("embedding")).as("v"))
      .withColumn("__q", qi)
      .groupBy(col("vec_id"), col("label"), col("n_dims"), col("__sc"))
      .agg(sum(col("__q")).as("sum_q"),
        min(col("__q")).as("min_q"), max(col("__q")).as("max_q"),
        sum(round((v - col("__q") * col("__sc"))
            * (v - col("__q") * col("__sc")), 12).cast("decimal(28,12)"))
          .as("__err"))
      .select(col("vec_id"), col("label"), col("n_dims"),
        round(col("__sc"), 6).as("scale"),
        col("sum_q"), col("min_q"), col("max_q"),
        round(col("__err").cast("double"), 6).as("sq_err"))
  }

  val s05_sql: String =
    """WITH e AS (SELECT vec_id, label,
      |    CAST(len(embedding) AS BIGINT) AS n_dims,
      |    CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
      |      / 127 AS sc,
      |    embedding
      |  FROM embeddings),
      |u AS (SELECT vec_id, label, n_dims, sc,
      |    CAST(unnest(embedding) AS DOUBLE) AS v
      |  FROM e WHERE sc > 0),
      |q AS (SELECT *, CAST(LEAST(127.0, GREATEST(-127.0, ROUND(v / sc, 0)))
      |    AS INT) AS qi FROM u)
      |SELECT vec_id, label, n_dims, ROUND(sc, 6) AS scale,
      |  CAST(SUM(qi) AS BIGINT) AS sum_q, MIN(qi) AS min_q, MAX(qi) AS max_q,
      |  ROUND(CAST(SUM(CAST(ROUND((v - qi * sc) * (v - qi * sc), 12)
      |    AS DECIMAL(28,12))) AS DOUBLE), 6) AS sq_err
      |FROM q GROUP BY vec_id, label, n_dims, sc""".stripMargin

  /** Quantized-scan ANN with float re-rank — the serving path the s05
    * manifest exists for: candidate generation scores int8 code pairs
    * (exact integer dot × the two per-vector scales; 4× less memory
    * traffic than a float scan, and the arithmetic SIMD-friendly
    * int ops), keeps the top-40 per probe, then re-ranks ONLY those
    * survivors with the exact float cosine. At 100 TB the quantized
    * scan composes with the IVF/LSH bucket paths (s02/s03) — this
    * query isolates the quantize→score→re-rank contract. Fully
    * deterministic (integer dot, tie-breaks on id), so even the
    * approximate candidate cut is hash-checked; the re-rank joins
    * carry only (query, neighbor, score) triples plus the ≤40×probes
    * survivor vectors.
    */
  val s06_quant_ann: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val nCand = 40
    val base = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        (array_max(transform(col("embedding"), x => abs(x.cast("double"))))
          / lit(127)).as("__sc"))
      .where(col("__sc") > 0)
      .withColumn("__q", transform(col("embedding"),
        x => least(lit(127.0), greatest(lit(-127.0),
          round(x.cast("double") / col("__sc"), 0))).cast("int")))
    val probes = broadcast(base.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        col("__q").as("__qp"), col("__sc").as("__scp")))
    val corpus = base
      .select(col("vec_id").as("neighbor_id"),
        col("__q").as("__qc"), col("__sc").as("__scc"))
      .transform(spreadScan)
    val dot = aggregate(
      zip_with(col("__qp"), col("__qc"), (a, b) => (a * b).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id").asc)
    val candidates = probes.crossJoin(corpus)
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot.cast("double") * col("__scp") * col("__scc")).as("approx"))
      .withColumn("__r", row_number().over(wc))
      .where(col("__r") <= nCand)
      .select(col("query_id"), col("neighbor_id"), col("approx"))
    val e = t(s, dir, "embeddings")
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .join(e.select(col("vec_id").as("query_id"),
        col("embedding").as("__pv")), Seq("query_id"))
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__cv")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("approx"),
        Similarity.cosine(col("__pv"), col("__cv")).as("cosine"))
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= 10)
      .select(col("query_id"), col("neighbor_id"),
        round(col("approx"), 6).as("approx"),
        round(col("cosine"), 6).as("cosine"),
        col("rank").cast("long").as("rank"))
  }

  val s06_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |qz AS (SELECT vec_id, v,
       |  list_max(list_transform(v, x -> abs(x))) / 127 AS sc FROM e),
       |q AS (SELECT vec_id, v, sc,
       |    list_transform(generate_series(1, 64),
       |      i -> CAST(LEAST(127.0, GREATEST(-127.0, ROUND(v[i] / sc, 0)))
       |        AS INT)) AS qc
       |  FROM qz WHERE sc > 0),
       |sc0 AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(generate_series(1, 64),
       |      i -> CAST(a.qc[i] * b.qc[i] AS BIGINT))) AS DOUBLE)
       |      * a.sc * b.sc AS approx
       |  FROM q a JOIN q b ON b.vec_id <> a.vec_id WHERE a.vec_id < 5),
       |cnd AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY approx DESC, neighbor_id ASC) AS r FROM sc0),
       |rr AS (SELECT c.query_id, c.neighbor_id, c.approx, $cosSql AS cos
       |  FROM cnd c
       |  JOIN e a ON a.vec_id = c.query_id
       |  JOIN e b ON b.vec_id = c.neighbor_id
       |  WHERE c.r <= 40),
       |rk AS (SELECT query_id, neighbor_id, approx, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id ASC) AS rank FROM rr)
       |SELECT query_id, neighbor_id, ROUND(approx, 6) AS approx,
       |  ROUND(cos, 6) AS cosine, rank
       |FROM rk WHERE rank <= 10""".stripMargin

  /** MMR diversified top-k re-rank: exact top-20 candidates per probe,
    * then the greedy λ·relevance − μ·redundancy selection. The oracle
    * replays the greedy as a recursive CTE picking one id per
    * iteration — bit-equality holds because every cosine in both
    * engines is the same sequential double fold.
    */
  val s07_mmr_rerank: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    Similarity.mmrRerank(e.where(col("vec_id") < 3), e,
      "vec_id", "embedding", "vec_id", "embedding",
      candidates = 20, k = 5, lambda = 0.7, mu = 0.3)
  }

  val s07_sql: String = {
    val cos2 = cosSql.replace("a.v", "ea.v").replace("b.v", "eb.v")
    s"""WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |sc AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, $cosSql AS cos
       |  FROM e a JOIN e b ON b.vec_id <> a.vec_id WHERE a.vec_id < 3),
       |cand AS (SELECT query_id, neighbor_id, cos FROM (
       |  SELECT query_id, neighbor_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS r
       |  FROM sc) WHERE r <= 20),
       |pair AS (SELECT c1.query_id, c1.neighbor_id AS id_a, c2.neighbor_id AS id_b,
       |    $cos2 AS cos2
       |  FROM cand c1 JOIN cand c2
       |    ON c1.query_id = c2.query_id AND c1.neighbor_id <> c2.neighbor_id
       |  JOIN e ea ON ea.vec_id = c1.neighbor_id
       |  JOIN e eb ON eb.vec_id = c2.neighbor_id),
       |step AS (
       |  SELECT query_id, CAST([] AS BIGINT[]) AS sel,
       |         CAST([] AS DOUBLE[]) AS scores, 0 AS n
       |  FROM (SELECT DISTINCT query_id FROM cand)
       |  UNION ALL
       |  SELECT s.query_id, list_append(s.sel, pick.id),
       |         list_append(s.scores, pick.score), s.n + 1
       |  FROM step s, LATERAL (
       |    SELECT c.neighbor_id AS id,
       |      0.7 * c.cos - 0.3 * coalesce((
       |        SELECT MAX(p.cos2) FROM pair p
       |        WHERE p.query_id = s.query_id AND p.id_a = c.neighbor_id
       |          AND list_contains(s.sel, p.id_b)), 0.0) AS score
       |    FROM cand c
       |    WHERE c.query_id = s.query_id AND NOT list_contains(s.sel, c.neighbor_id)
       |    ORDER BY score DESC, c.neighbor_id ASC
       |    LIMIT 1) pick
       |  WHERE s.n < 5)
       |SELECT query_id, unnest(sel) AS selected_id, unnest(scores) AS mmr_score,
       |  unnest(generate_series(1, 5)) AS mmr_rank
       |FROM step WHERE n = 5""".stripMargin
  }

  /** Zipf rank–frequency slope — the corpus-statistics diagnostic that
    * flags synthetic/spammy text (natural language fits ln f ≈
    * a + s·ln r with s ≈ −1; flat or cliff-shaped slopes betray
    * template spam or truncated vocabularies). OLS of ln(freq) on
    * ln(rank) over the top-200 tokens: rank is the deterministic t12
    * cut ((freq desc, token asc) — engine-stable), the four OLS moment
    * sums quantize each ln-term to DECIMAL(28,12) first (order-
    * independent-exact), and the final slope/intercept are single
    * double expressions over those exact moments. Everything after the
    * one token aggregate runs on 200 rows.
    */
  /** The log-log regression sums (t23/t41's shared shape) in exact
    * e-12 integer units: ln rank/freq through the portable series,
    * per-term quantization by exact floor — the whole fit replays
    * bit-identically from four BIGINT sums.
    */
  private def zipfTermBindings: graft.functions.PortableMath.Bindings = {
    import graft.functions.PortableMath._
    lnPosBigint("__r", "__lr") ++ lnPosBigint("__f", "__lf") :+
      ("__x_e12" -> roundedUnits(Dual.col("__lr"), 12)) :+
      ("__y_e12" -> roundedUnits(Dual.col("__lf"), 12)) :+
      ("__xx_e12" -> roundedUnits(Dual.col("__lr") * Dual.col("__lr"), 12)) :+
      ("__xy_e12" -> roundedUnits(Dual.col("__lr") * Dual.col("__lf"), 12))
  }

  /** OLS slope/intercept over the e-12 sums, reported in e-6 units —
    * doubles derived from exact integers with one written order.
    */
  private def zipfOutBindings(
      slopeName: String, interceptName: String)
      : graft.functions.PortableMath.Bindings = {
    import graft.functions.PortableMath._
    val e12 = Dual.lit(1.0e12)
    val nD = Dual.col("n").toDouble
    val sx = Dual.col("sx").toDouble / e12
    val sy = Dual.col("sy").toDouble / e12
    val sxx = Dual.col("sxx").toDouble / e12
    val sxy = Dual.col("sxy").toDouble / e12
    val slope = Dual.col("__slp")
    Seq(
      "__slp" -> ((nD * sxy - sx * sy) / (nD * sxx - sx * sx)),
      slopeName -> roundedUnits(slope, 6),
      interceptName -> roundedUnits((sy - slope * sx) / nD, 6))
  }

  val t23_zipf_slope: Q = (s, dir) => {
    import graft.functions.PortableMath
    val k = 200
    val ranked = t(s, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("__f"))
      .orderBy(col("__f").desc, col("token").asc).limit(k)
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(col("__f"), lit(1)))  // deliberate: k collected rows
          .orderBy(col("__f").desc, col("token").asc)).cast("long"))
    val m = PortableMath.withBindings(ranked, zipfTermBindings).agg(
      count(lit(1)).as("n"),
      sum(col("__x_e12")).as("sx"), sum(col("__y_e12")).as("sy"),
      sum(col("__xx_e12")).as("sxx"), sum(col("__xy_e12")).as("sxy"))
    PortableMath
      .withBindings(m, zipfOutBindings("zipf_slope_e6", "intercept_e6"))
      .select(col("n"), col("zipf_slope_e6"), col("intercept_e6"))
  }

  def t23_sql: String = {
    import graft.functions.PortableMath
    val termChain = PortableMath.sqlWithBindings(
      "SELECT f AS __f, r AS __r FROM r", zipfTermBindings)
    val outChain = PortableMath.sqlWithBindings(
      "SELECT * FROM m", zipfOutBindings("zipf_slope_e6", "intercept_e6"))
    s"""WITH t AS (SELECT unnest($toksSql) AS token FROM documents),
       |f AS (SELECT token, COUNT(*) AS f FROM t GROUP BY token
       |  ORDER BY f DESC, token ASC LIMIT 200),
       |r AS (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, token ASC) AS r FROM f),
       |rt AS ($termChain),
       |m AS (SELECT COUNT(*) AS n,
       |    CAST(SUM(__x_e12) AS BIGINT) AS sx,
       |    CAST(SUM(__y_e12) AS BIGINT) AS sy,
       |    CAST(SUM(__xx_e12) AS BIGINT) AS sxx,
       |    CAST(SUM(__xy_e12) AS BIGINT) AS sxy
       |  FROM rt)
       |SELECT n, zipf_slope_e6, intercept_e6 FROM ($outChain)""".stripMargin
  }

  /** BPE-training inner loop: adjacent character-pair frequencies over
    * the token VOCABULARY weighted by token frequency — the statistic a
    * byte-pair-encoding tokenizer trainer recomputes at every merge
    * step. Aggregating to the vocabulary first is the scale move: pair
    * extraction runs once per distinct token (10⁶-ish at any corpus
    * size), not once per the 10¹¹ token occurrences of a 100 TB corpus;
    * the occurrence weight rides along as an exact integer. Two keyed
    * map-side-combined aggregates, then the t12/t13 top-K-then-rank cut
    * (TakeOrderedAndProject, never an unpartitioned window).
    */
  val t24_bpe_pairs: Q = (s, dir) => {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select(explode_outer(TextAnalysis.tokens(col("text"))).as("token"))
      .where(col("token").isNotNull)
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .where(length(col("token")) >= 2)
    val pairs = vocab.select(col("freq"),
      explode_outer(transform(sequence(lit(1), length(col("token")) - 1),
        i => col("token").substr(i, lit(2)))).as("pair"))
      .where(col("pair").isNotNull)
    pairs.groupBy(col("pair"))
      .agg(sum(col("freq")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair").asc)
      .limit(50)
      .collect().toSeq.zipWithIndex
      .map { case (r, i) => (r.getString(0), r.getLong(1), (i + 1).toLong) }
      .toDF("pair", "n_occurrences", "rank")
  }

  val t24_sql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |tok AS (SELECT unnest(toks) AS token FROM t),
       |v AS (SELECT token, COUNT(*) AS freq FROM tok GROUP BY token),
       |f AS (SELECT token, freq FROM v WHERE length(token) >= 2),
       |p AS (SELECT freq,
       |  unnest(list_transform(generate_series(1, length(token) - 1),
       |                        i -> substr(token, i, 2))) AS pair
       | FROM f),
       |agg AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_occurrences
       |        FROM p GROUP BY pair)
       |SELECT pair, n_occurrences,
       |  ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, pair ASC) AS rank
       |FROM agg QUALIFY rank <= 50""".stripMargin

  /** Leakage-free train/valid split: near-duplicate GROUPS are assigned
    * atomically — a doc's split is decided by the deterministic hash of
    * its component anchor (the d05 min-id canonical; its own id when
    * unpaired), so no near-dup pair ever straddles the boundary (the
    * train→valid contamination a doc-keyed split like t05 cannot rule
    * out). Shape: the d02/d05 pair machinery + one left join + a narrow
    * hash projection; the split rule itself adds no shuffle.
    */
  val t25_leakage_split: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val groups = Dedup.duplicateGroups(
      Dedup.minhashNearDups(docs, "text", "doc_id",
        k = 5, numHashes = 16, bands = 4, threshold = 0.5))
    val bucket = pmod(
      graft.functions.KmvSketch.hash64(col("anchor_id")), lit(100L))
    docs.select(col("doc_id"))
      .join(groups.select(col("id").as("doc_id"), col("group_id")),
        Seq("doc_id"), "left")
      .withColumn("anchor_id", coalesce(col("group_id"), col("doc_id")))
      .select(col("doc_id"), col("anchor_id"),
        when(bucket < 90, "train").otherwise("valid").as("split"))
  }

  // lazy: references dupGroupCtes (the c02_sql init-order note applies)
  lazy val t25_sql: String =
    s"""WITH RECURSIVE $dupGroupCtes,
       |a AS (SELECT d.doc_id, coalesce(g.group_id, d.doc_id) AS anchor_id
       |      FROM documents d LEFT JOIN groups g ON d.doc_id = g.id),
       |b AS (SELECT doc_id, anchor_id,
       |  ('0x' || substr(md5(CAST(anchor_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bk
       | FROM a)
       |SELECT doc_id, anchor_id,
       |  CASE WHEN bk < 90 THEN 'train' ELSE 'valid' END AS split
       |FROM b""".stripMargin

  /** Per-source n-gram novelty — the inter-source diversity diagnostic
    * a mixture designer reads next to t15's weights: for each source,
    * the fraction of its distinct 5-gram shingles that appear in NO
    * other source (high = genuinely novel material, low = the source
    * restates the rest of the corpus). Shingles md5 to 32-byte keys
    * before any shuffle (the d08 discipline); then one distinct, one
    * per-shingle source count, one per-source aggregate — three keyed
    * shuffles, all map-side combined, nothing ever n².
    */
  val t26_source_novelty: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val sh = t(s, dir, "documents")
      .transform(spreadScan)
      .select(col("source"), explode_outer(array_distinct(
        TextAnalysis.shingles(col("text"), 5))).as("__sh"))
      .where(col("__sh").isNotNull)
      // BINARY(16) key (r18): internal only, never output
      .select(col("source"), unhex(md5(col("__sh"))).as("__h"))
      .distinct()
    // per-hash source spread as an h-partitioned window count (r18,
    // the d17/d18 move): the former groupBy + self-join re-shuffled
    // the distinct (source, h) frame a second time and recomputed its
    // lineage for the join's probe side; the window computes the same
    // count (rows are distinct (source, h)) in one exchange
    sh.withColumn("__ns", count(lit(1)).over(Window.partitionBy(col("__h"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__ns") === 1, 1L).otherwise(0L)).as("n_exclusive"))
      .withColumn("novelty",
        col("n_exclusive").cast("double") / col("n_shingles"))
  }

  val t26_sql: String =
    s"""WITH t AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
       |shl AS (SELECT source,
       |  unnest(CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(generate_series(1, len(toks) - 4),
       |                           i -> array_to_string(toks[i:i+4], ' ')) END) AS sh
       | FROM t),
       |d AS (SELECT DISTINCT source, md5(sh) AS h FROM shl),
       |c AS (SELECT h, COUNT(*) AS ns FROM d GROUP BY h)
       |SELECT source, COUNT(*) AS n_shingles,
       |  CAST(SUM(CASE WHEN ns = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exclusive,
       |  CAST(SUM(CASE WHEN ns = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS novelty
       |FROM d JOIN c USING (h) GROUP BY source""".stripMargin

  /** Stopword discovery by document-frequency ratio: tokens present in
    * at least half the corpus documents — the data-driven stopword list
    * a quality/BM25 pipeline derives instead of hardcoding. Integer
    * threshold arithmetic (df·2 ≥ N, never a float ratio compare); the
    * one-row corpus count broadcasts (the t14/t15 scalar pattern).
    */
  val t27_stopwords: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val pairs = docs.select(col("doc_id"), explode_outer(
      array_distinct(TextAnalysis.tokens(col("text")))).as("token"))
      .where(col("token").isNotNull)
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    pairs.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .where(col("df") * 2 >= col("n_docs"))
      .select(col("token"), col("df"), col("n_docs"))
  }

  val t27_sql: String =
    s"""WITH p AS (SELECT DISTINCT doc_id, unnest($toksSql) AS token FROM documents),
       |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
       |d AS (SELECT token, COUNT(*) AS df FROM p GROUP BY token)
       |SELECT token, df, n_docs FROM d, n WHERE df * 2 >= n_docs""".stripMargin

  /** Embedding-space QA: per-label vector counts, dimension-consistency
    * check, zero-vector count, and exact mean L2 norm — the health
    * report run before any ANN index build (mixed dims or degenerate
    * zero vectors silently poison cosine math). Norms quantize to
    * DECIMAL(28,12) before the sum (the t22/t23 moment recipe) so the
    * mean is order-independent-exact; one aggregate, no shuffle beyond
    * it.
    */
  val s08_embedding_qa: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
      .withColumn("sumsq",
        aggregate(col("v"), lit(0.0), (a, x) => a + x * x))
    e.groupBy(col("label")).agg(
      count(lit(1)).as("n_vectors"),
      countDistinct(size(col("v"))).as("n_dims_distinct"),
      sum(when(col("sumsq") === 0.0, 1L).otherwise(0L)).as("n_zero_vectors"),
      (sum(round(sqrt(col("sumsq")), 12).cast("decimal(28,12)"))
        .cast("double") / count(lit(1))).as("mean_norm"))
  }

  val s08_sql: String =
    """WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
      |x AS (SELECT label, len(v) AS nd,
      |  list_sum(list_transform(v, x -> x * x)) AS sumsq FROM e),
      |y AS (SELECT label, nd, sumsq,
      |  CAST(round(sqrt(sumsq), 12) AS DECIMAL(28,12)) AS qnorm FROM x)
      |SELECT label, COUNT(*) AS n_vectors,
      |  COUNT(DISTINCT nd) AS n_dims_distinct,
      |  CAST(SUM(CASE WHEN sumsq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vectors,
      |  CAST(SUM(qnorm) AS DOUBLE) / COUNT(*) AS mean_norm
      |FROM y GROUP BY label""".stripMargin

  /** Weighted sampling without replacement, RNG-free and float-free:
    * the top-20 docs by priority = max over w replica hashes of
    * md5(doc_id:i), w = token count. max of w uniforms is distributed
    * exactly as u^(1/w) — the Efraimidis–Spirakis priority — but
    * computed in pure integer/md5 arithmetic, so both engines replay it
    * bit-for-bit (a float pow/ln formulation would ride on libm
    * parity).
    *
    * Σw EXPLODE BOUND: the replica explode materializes exactly Σw
    * rows TOTAL — linear in corpus token count, the same order as any
    * tokenize stage, never quadratic. The hazard is PER-ROW: one
    * degenerate document with an extreme weight builds a w-element
    * `sequence` array inside a single task. [[weightedSamplePriorities]]'
    * `maxW` guards that boundary — any weight above it fails fast with
    * a clear error instead of silently OOMing an executor mid-explode;
    * at such weights switch to the per-doc float formulation (u^(1/w))
    * rather than replica hashing. t28's corpus weights are token
    * counts, orders of magnitude under the 2²⁰ default. Two keyed
    * map-side-combined stages + a TakeOrdered cut.
    */
  val t28_weighted_sample: Q = (s, dir) => {
    import s.implicits._
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCountOf(TextAnalysis.tokens(col("text")))
          .cast("long").as("w"))
      .where(col("w") > 0)
    weightedSamplePriorities(docs)
      .orderBy(col("priority").desc, col("doc_id").asc).limit(20)
      .collect().toSeq.zipWithIndex
      .map { case (r, i) =>
        (r.getLong(0), r.getLong(1), r.getLong(2), (i + 1).toLong) }
      .toDF("doc_id", "w", "priority", "rank")
  }

  /** Efraimidis–Spirakis replica-hash priorities for a (doc_id, w)
    * frame (see [[t28_weighted_sample]] for the scheme and the Σw
    * bound). Weights above `maxW` raise a runtime error BEFORE the
    * explode — the documented guard against a single degenerate row
    * materializing an unbounded in-task array.
    */
  private[graft] def weightedSamplePriorities(
      docs: DataFrame, maxW: Long = 1L << 20): DataFrame =
    docs
      .select(col("doc_id"),
        when(col("w") > maxW,
          raise_error(concat(lit("weightedSamplePriorities: weight "),
            col("w").cast("string"), lit(s" exceeds maxW=$maxW for doc_id "),
            col("doc_id").cast("string"),
            lit("; use a per-doc float priority for extreme weights"))))
          .otherwise(col("w")).as("w"))
      .select(col("doc_id"), col("w"),
        explode_outer(sequence(lit(1L), col("w"))).as("i"))
      .where(col("i").isNotNull)
      .select(col("doc_id"), col("w"),
        graft.functions.KmvSketch.hash64(
          concat_ws(":", col("doc_id"), col("i"))).as("h"))
      .groupBy(col("doc_id"), col("w"))
      .agg(max(col("h")).as("priority"))

  val t28_sql: String =
    s"""WITH d AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS w
       |           FROM documents WHERE len($toksSql) > 0),
       |e AS (SELECT doc_id, w, unnest(generate_series(1, w)) AS i FROM d),
       |h AS (SELECT doc_id, w,
       |  ('0x' || substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR), 1, 15))::BIGINT AS hv
       | FROM e),
       |p AS (SELECT doc_id, w, MAX(hv) AS priority FROM h GROUP BY doc_id, w)
       |SELECT doc_id, w, priority,
       |  ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id ASC) AS rank
       |FROM p QUALIFY rank <= 20""".stripMargin

  /** Per-document unigram-LM cross-entropy — the perplexity-proxy
    * quality filter (the CCNet move: score each document under a
    * corpus language model; outlier scores flag boilerplate / noise /
    * off-distribution text). The LM is the corpus's own add-one-
    * smoothed unigram model p(w) = (c(w)+1)/(N+V), so
    * xent(doc) = −mean ln p(w) = ln(N+V) − Σ c_d(w)·ln(c(w)+1) / n_d.
    *
    * Numeric discipline (the t22 pattern): per-(doc, distinct-token)
    * terms are rounded to 9 decimals and summed as DECIMAL(28,9) — an
    * exact, order-independent sum — so both engines reach identical
    * bits despite unordered aggregation; the final score rounds to 6.
    *
    * Scale shape: two map-side-combined token aggregates (corpus vocab,
    * per-doc counts), one token-keyed equi-join (the vocab side
    * broadcasts while it fits; Zipf keeps it millions of rows at 100 TB,
    * far under the doc-token side), one doc-keyed aggregate, and a
    * 1-row broadcast cross join for the (N, V) scalars. Nothing
    * collects; no windows.
    */
  /** t29's per-document score frame (doc_id, n_tokens, xent_e6) —
    * split out so the t49 bucketing consumes the IDENTICAL scoring
    * chain (one definition of the smoothed unigram score, two
    * consumers).
    */
  private[graft] def t29PerDoc(s: SparkSession, dir: String): DataFrame =
    t29PerDocOf(t(s, dir, "documents"))

  /** t29's per-doc scorer over an EXPLICIT corpus frame — shared by
    * the batch queries and the streaming read side
    * ([[graft.streaming.StreamingIngest.currentQualityRelease]]),
    * where the corpus is the doc store's newest generation.
    */
  private[graft] def t29PerDocOf(docs: DataFrame): DataFrame = {
    // ONE corpus scan + tokenize: vocab and the (N, V) totals both
    // derive from the per-(doc, token) counts, whose shuffle the
    // planner then shares across all three uses (ReusedExchange) —
    // the naive three-subtree formulation re-tokenized the corpus 3×
    val perDocTok = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("__cd"))
    val vocab = perDocTok.groupBy(col("token")).agg(sum(col("__cd")).as("__cw"))
    val totals = vocab.agg(sum(col("__cw")).as("__n"), count(lit(1)).as("__v"))
    val terms = graft.functions.PortableMath.withBindings(
      perDocTok.join(vocab, Seq("token"))
        .withColumn("__cw1", col("__cw") + lit(1L)),
      t29TermBindings)
    val g = terms.groupBy(col("doc_id"))
      .agg(sum(col("__cd")).as("n_tokens"), sum(col("__t_e9")).as("__s"))
      .crossJoin(broadcast(totals))
      .withColumn("__nv", col("__n") + col("__v"))
    graft.functions.PortableMath.withBindings(g, t29OutBindings)
      .select(col("doc_id"), col("n_tokens"), col("xent_e6"))
  }

  val t29_unigram_xent: Q = (s, dir) => t29PerDoc(s, dir)

  private def t29TermBindings: graft.functions.PortableMath.Bindings = {
    import graft.functions.PortableMath._
    lnPosBigint("__cw1", "__lnw") :+
      ("__t_e9" -> roundedUnits(
        Dual.col("__cd").toDouble * Dual.col("__lnw"), 9))
  }

  private def t29OutBindings: graft.functions.PortableMath.Bindings = {
    import graft.functions.PortableMath._
    lnPosBigint("__nv", "__lnv") :+
      ("xent_e6" -> roundedUnits(Dual.col("__lnv") -
        (Dual.col("__s").toDouble / Dual.lit(1.0e9)) /
          Dual.col("n_tokens").toDouble, 6))
  }

  /** The t29 scoring chain as CTEs ending in `f(doc_id, n_tokens,
    * xent_e6)` — spliced by BOTH the t29 oracle and t49's bucketing,
    * exactly as the Spark side shares [[t29PerDoc]].
    */
  private def t29SqlCtes: String = {
    import graft.functions.PortableMath
    val termChain = PortableMath.sqlWithBindings(
      "SELECT doc_id, cd AS __cd, cw + 1 AS __cw1 FROM d JOIN v USING (token)",
      t29TermBindings)
    val outChain = PortableMath.sqlWithBindings(
      "SELECT a.*, n + vsz AS __nv FROM a CROSS JOIN tot", t29OutBindings)
    s"""t AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
       |v AS (SELECT token, COUNT(*) AS cw FROM t GROUP BY token),
       |tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS n, COUNT(*) AS vsz FROM v),
       |d AS (SELECT doc_id, token, COUNT(*) AS cd FROM t GROUP BY doc_id, token),
       |dt AS ($termChain),
       |a AS (SELECT doc_id, CAST(SUM(__cd) AS BIGINT) AS n_tokens,
       |    CAST(SUM(__t_e9) AS BIGINT) AS __s
       |  FROM dt GROUP BY doc_id),
       |f AS ($outChain)""".stripMargin
  }

  def t29_sql: String =
    s"""WITH $t29SqlCtes
       |SELECT doc_id, n_tokens, xent_e6 FROM f""".stripMargin

  /** t49: perplexity-tertile bucketing — the CCNet curation step the
    * per-document score (t29) exists to feed: split the corpus into
    * head / middle / tail by the EXACT tertiles of the unigram
    * cross-entropy distribution and account each source's document
    * and token mass per bucket (the standard quality-mix report a
    * curation run publishes; training mixes typically keep head +
    * middle and down-weight tail). The score is t29's INTEGER e-6
    * xent ([[t29PerDoc]] — one definition, two consumers), so the
    * tertile boundaries are exact order statistics on integers: t_k =
    * min{x : 3·cum(x) ≥ k·N}, pure integer comparisons with no
    * quantile interpolation to diverge cross-engine. The cumulative
    * frame runs on the distinct-score counts through the shared
    * two-level prefix (never a corpus-sized window); the boundary
    * fold is a 1-row broadcast. At 100 TB: one keyed join back to the
    * source column, one map-side-combined (source, bucket) aggregate.
    */
  /** The exact-tertile labeling stage over a (doc_id, n_tokens,
    * xent_e6) score frame — split out so the spec pins the boundary
    * rule (t_k = min{x : 3·cum(x) ≥ k·N}) on hand-built score sets,
    * ties included.
    */
  private[graft] def tertileBuckets(perDoc0: DataFrame): DataFrame = {
    import graft.queries.Features.exclusivePrefix
    val perDoc = perDoc0.localCheckpoint(true) // dist AND label
    val dist = perDoc.groupBy(col("xent_e6")).agg(count(lit(1)).as("__c"))
      .withColumn("__bucket",
        floor(col("xent_e6") / lit(1000000L)).cast("long"))
      .localCheckpoint(true)
    val cum = exclusivePrefix(dist, "xent_e6", "__bucket",
        Seq("__exc" -> "__c"))
      .select(col("xent_e6"), (col("__exc") + col("__c")).as("__cum"))
    val tot = dist.agg(sum(col("__c")).as("__nn"))
    val th = cum.crossJoin(broadcast(tot)).agg(
      min(when(col("__cum") * lit(3L) >= col("__nn"), col("xent_e6")))
        .as("__t1"),
      min(when(col("__cum") * lit(3L) >= lit(2L) * col("__nn"),
        col("xent_e6"))).as("__t2"))
    perDoc.crossJoin(broadcast(th))
      .select(col("doc_id"), col("n_tokens"),
        when(col("xent_e6") <= col("__t1"), "head")
          .when(col("xent_e6") <= col("__t2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  val t49_perplexity_buckets: Q = (s, dir) =>
    tertileBuckets(t29PerDoc(s, dir))
      .join(t(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id")
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))

  def t49_sql: String =
    s"""WITH $t29SqlCtes,
       |dist AS (SELECT xent_e6 AS x, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM f GROUP BY 1),
       |cum AS (SELECT x, CAST(SUM(c) OVER (ORDER BY x
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cc FROM dist),
       |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM dist),
       |th AS (SELECT
       |    MIN(CASE WHEN cc * 3 >= nn THEN x END) AS t1,
       |    MIN(CASE WHEN cc * 3 >= 2 * nn THEN x END) AS t2
       |  FROM cum CROSS JOIN nn),
       |lab AS (SELECT doc_id, n_tokens,
       |    CASE WHEN xent_e6 <= t1 THEN 'head'
       |         WHEN xent_e6 <= t2 THEN 'middle'
       |         ELSE 'tail' END AS bucket
       |  FROM f CROSS JOIN th)
       |SELECT dd.source, lab.bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(lab.n_tokens) AS BIGINT) AS tokens
       |FROM lab JOIN documents dd USING (doc_id)
       |GROUP BY 1, 2""".stripMargin

  /** Bigram-LM cross-entropy — t29's conditional-probability upgrade
    * (one step toward the n-gram KenLM scoring CCNet actually runs):
    * score each document under the corpus's add-one-smoothed bigram
    * model p(w|prev) = (c₂(prev,w)+1)/(c₁(prev)+V). Unigram scoring
    * misses wrong-ORDER text (shuffled words keep their unigram
    * frequencies); the bigram conditional catches it.
    *
    * Derivation chain keeps ONE corpus scan: per-doc bigram counts →
    * corpus bigram counts (doc-summed) → context counts (prev-grouped)
    * → V (distinct continuation vocabulary) — every level derives from
    * the per-(doc, bigram) shuffle, the t29 reuse shape. Bigrams ride
    * as "prev w" strings (tokens cannot contain spaces). Terms follow
    * the t22/t29 decimal discipline: round-to-9 DECIMAL(28,9) sums,
    * final score rounded to 6. Docs with <2 tokens have no bigram
    * events and drop in both engines.
    */
  val t30_bigram_xent: Q = (s, dir) => {
    val toks = TextAnalysis.tokens(col("text"))
    val n = size(col("__toks"))
    val bigrams = when(n >= 2,
      transform(sequence(lit(2), n), i =>
        concat_ws(" ", element_at(col("__toks"), i - 1),
          element_at(col("__toks"), i))))
      .otherwise(array())
    val perDocBg = t(s, dir, "documents")
      .withColumn("__toks", toks)
      .select(col("doc_id"), explode(bigrams).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("__cd"))
    val c2 = perDocBg.groupBy(col("bigram")).agg(sum(col("__cd")).as("__c2"))
      .withColumn("__prev", split(col("bigram"), " ").getItem(0))
    val c1 = c2.groupBy(col("__prev")).agg(sum(col("__c2")).as("__c1"))
    val vocab = c2.agg(
      countDistinct(split(col("bigram"), " ").getItem(1)).as("__v"))
    val terms = graft.functions.PortableMath.withBindings(
      perDocBg
        .join(c2, Seq("bigram"))
        .join(c1, Seq("__prev"))
        .crossJoin(broadcast(vocab))
        .withColumn("__ctx", col("__c1") + col("__v"))
        .withColumn("__evt", col("__c2") + lit(1L)),
      t30TermBindings)
    graft.functions.PortableMath.withBindings(
        terms.groupBy(col("doc_id"))
          .agg(sum(col("__cd")).as("n_bigrams"),
            sum(col("__t_e9")).as("__s")),
        t30OutBindings)
      .select(col("doc_id"), col("n_bigrams"), col("xent2_e6"))
  }

  private def t30TermBindings: graft.functions.PortableMath.Bindings = {
    import graft.functions.PortableMath._
    lnPosBigint("__ctx", "__lnx") ++ lnPosBigint("__evt", "__lne") :+
      ("__t_e9" -> roundedUnits(Dual.col("__cd").toDouble *
        (Dual.col("__lnx") - Dual.col("__lne")), 9))
  }

  private def t30OutBindings: graft.functions.PortableMath.Bindings = {
    import graft.functions.PortableMath._
    Seq("xent2_e6" -> roundedUnits(
      (Dual.col("__s").toDouble / Dual.lit(1.0e9)) /
        Dual.col("n_bigrams").toDouble, 6))
  }

  def t30_sql: String = {
    import graft.functions.PortableMath
    val termChain = PortableMath.sqlWithBindings(
      "SELECT doc_id, cd AS __cd, c1 + vsz AS __ctx, c2 + 1 AS __evt " +
        "FROM d JOIN c2 USING (bigram) JOIN c1 USING (prev) CROSS JOIN v",
      t30TermBindings)
    val outChain = PortableMath.sqlWithBindings(
      "SELECT * FROM a", t30OutBindings)
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |i AS (SELECT doc_id, toks,
       |    unnest(generate_series(2, len(toks))) AS i FROM t),
       |bg AS (SELECT doc_id, toks[i-1] || ' ' || toks[i] AS bigram FROM i),
       |d AS (SELECT doc_id, bigram, COUNT(*) AS cd FROM bg
       |      GROUP BY doc_id, bigram),
       |c2 AS (SELECT bigram, split_part(bigram, ' ', 1) AS prev,
       |    CAST(SUM(cd) AS BIGINT) AS c2 FROM d GROUP BY bigram),
       |c1 AS (SELECT prev, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY prev),
       |v AS (SELECT COUNT(DISTINCT split_part(bigram, ' ', 2)) AS vsz FROM c2),
       |dt AS ($termChain),
       |a AS (SELECT doc_id, CAST(SUM(__cd) AS BIGINT) AS n_bigrams,
       |    CAST(SUM(__t_e9) AS BIGINT) AS __s
       |  FROM dt GROUP BY doc_id),
       |f AS ($outChain)
       |SELECT doc_id, n_bigrams, xent2_e6 FROM f""".stripMargin
  }

  /** Contrastive image–text pair assembly — the dataset-construction
    * step a multimodal (CLIP-style) training pipeline runs: each image
    * pairs with its caption document and the caption's embedding by
    * shared id, gated by a minimum-caption-length rule. Three keyed
    * equi-joins (media→documents→embeddings), every output column
    * exact integer/string arithmetic, so the whole assembly — synthetic
    * media geometry included — is replayed by the oracle from
    * generate_series plus the parquet tables. At 100 TB this is the
    * same plan family as any fact-dim join chain; nothing collects.
    */
  val m05_pair_manifest: Q = (s, dir) => {
    val media = graft.multimodal.MultiModal.syntheticMedia(s, n = 300).toDF()
      .where(col("kind") === "image")
      .select(col("mediaId").as("media_id"),
        col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"))
    val captions = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCountOf(TextAnalysis.tokens(col("text")))
          .cast("long").as("n_caption_tokens"))
    val embs = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        size(col("embedding")).cast("long").as("n_dims"))
    media
      .join(captions, col("media_id") === col("doc_id"))
      .join(embs, col("media_id") === col("vec_id"))
      .where(col("n_caption_tokens") >= 5)
      .select(col("media_id"), col("width"), col("height"),
        col("lang"), col("n_caption_tokens"), col("label"), col("n_dims"))
  }

  val m05_sql: String =
    s"""WITH m AS (SELECT unnest(generate_series(0, 299)) AS media_id),
       |img AS (SELECT media_id,
       |    CAST(32 + media_id % 64 AS BIGINT) AS width,
       |    CAST(24 + media_id % 48 AS BIGINT) AS height
       |  FROM m WHERE media_id % 3 = 0),
       |cap AS (SELECT doc_id, lang,
       |    CAST(len($toksSql) AS BIGINT) AS n_caption_tokens
       |  FROM documents),
       |e AS (SELECT vec_id, label,
       |    CAST(len(embedding) AS BIGINT) AS n_dims FROM embeddings)
       |SELECT media_id, width, height, lang, n_caption_tokens, label, n_dims
       |FROM img
       |JOIN cap ON media_id = doc_id
       |JOIN e ON media_id = vec_id
       |WHERE n_caption_tokens >= 5""".stripMargin

  /** Multimodal context packing — the batch-construction step of a
    * vision-language trainer: each (image, caption) sample costs
    * caption tokens + ViT patch tokens (the m03 16×16 grid), and
    * samples lay end-to-end into fixed 4096-token contexts via the same
    * [[graft.operators.Pack.concatChunk]] layout t07 uses for text
    * (per-language shards, one keyed window, pure integer arithmetic).
    */
  val m06_multimodal_pack: Q = (s, dir) => {
    val media = graft.multimodal.MultiModal.syntheticMedia(s, n = 300).toDF()
      .where(col("kind") === "image")
      .select(col("mediaId").as("media_id"),
        col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"))
    val captions = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCountOf(TextAnalysis.tokens(col("text")))
          .cast("long").as("n_caption_tokens"))
    val samples = media.join(captions, col("media_id") === col("doc_id"))
      .withColumn("n_patches",
        expr("((width + 15) div 16) * ((height + 15) div 16)").cast("long"))
      .withColumn("cost", col("n_caption_tokens") + col("n_patches"))
    graft.operators.Pack.concatChunk(
        samples, Seq("lang"), "media_id", "cost", capacity = 4096L)
      .groupBy(col("lang"), col("pack_id"))
      .agg(count(lit(1)).as("n_samples_starting"),
        sum(col("n_caption_tokens")).as("sum_caption_tokens"),
        sum(col("n_patches")).as("sum_patches"),
        min(col("pack_offset")).as("first_offset"))
  }

  val m06_sql: String =
    s"""WITH m AS (SELECT unnest(generate_series(0, 299)) AS media_id),
       |img AS (SELECT media_id,
       |    CAST(32 + media_id % 64 AS BIGINT) AS width,
       |    CAST(24 + media_id % 48 AS BIGINT) AS height
       |  FROM m WHERE media_id % 3 = 0),
       |cap AS (SELECT doc_id, lang,
       |    CAST(len($toksSql) AS BIGINT) AS n_caption_tokens
       |  FROM documents),
       |sm AS (SELECT lang, media_id, n_caption_tokens,
       |    CAST(((width + 15) // 16) * ((height + 15) // 16) AS BIGINT) AS n_patches
       |  FROM img JOIN cap ON media_id = doc_id),
       |c AS (SELECT lang, media_id, n_caption_tokens, n_patches,
       |    n_caption_tokens + n_patches AS cost FROM sm),
       |o AS (SELECT lang, n_caption_tokens, n_patches, cost,
       |  CAST(COALESCE(SUM(cost) OVER (PARTITION BY lang ORDER BY media_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
       | FROM c),
       |p AS (SELECT lang, n_caption_tokens, n_patches,
       |  CAST(start_offset // 4096 AS BIGINT) AS pack_id,
       |  CAST(start_offset % 4096 AS BIGINT) AS pack_offset
       | FROM o)
       |SELECT lang, pack_id, COUNT(*) AS n_samples_starting,
       |  CAST(SUM(n_caption_tokens) AS BIGINT) AS sum_caption_tokens,
       |  CAST(SUM(n_patches) AS BIGINT) AS sum_patches,
       |  MIN(pack_offset) AS first_offset
       |FROM p GROUP BY lang, pack_id""".stripMargin

  private def m01FeaturePath: String =
    s"${graft.ingest.FixtureTables.root}/m01_features.parquet"

  private def m07HashPath: String =
    s"${graft.ingest.FixtureTables.root}/m07_dhash.parquet"

  /** Perceptual image near-dup join — the multimodal face of the
    * dedup ladder (d02 is to text what this is to rasters): REAL PNG
    * images (encoded and decoded through `javax.imageio`, planted
    * near-dup groups) → 64-bit dHash ([[graft.multimodal.MultiModal.dHash64]]:
    * grayscale → 9×8 nearest-neighbor downsample → adjacent-column
    * comparisons, all-integer so exactly reproducible) → banded
    * self-join on four 16-bit hash bands → Hamming ≤ 3 via
    * `bit_count(xor)`. Banding is LOSSLESS here by pigeonhole: 3
    * differing bits cannot touch all 4 disjoint bands, so one band
    * always matches exactly — and the oracle is the brute-force n²
    * over the dumped hashes, so the hash check proves it. The decode +
    * hash stage is the one non-SQL-replayable step (the m01/s03
    * fixture-dump recipe); candidates are Σ|band bucket|², never
    * corpus² — the d02 LSH shape with the band count fixed by the
    * distance bound instead of tuned.
    */
  val m07_image_neardups: Q = (s, _) => {
    val hashes = graft.multimodal.MultiModal.imageDHashes(
      graft.multimodal.MultiModal.imageCorpus(s, n = 400))
    hashes.coalesce(1).write.mode("overwrite").parquet(m07HashPath)
    graft.multimodal.MultiModal.bandedHammingPairs(
      s.read.parquet(m07HashPath).withColumnRenamed("dhash", "h"), maxDist = 3)
  }

  def m07_sql: String =
    s"""WITH h AS (SELECT media_id, dhash
       |           FROM read_parquet('$m07HashPath/*.parquet'))
       |SELECT a.media_id AS id_a, b.media_id AS id_b,
       |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
       |FROM h a JOIN h b ON a.media_id < b.media_id
       |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3""".stripMargin

  private def m08HashPath: String =
    s"${graft.ingest.FixtureTables.root}/m08_audiofp.parquet"

  /** Perceptual AUDIO near-dup join — m07's audio sibling: real WAVs
    * (encoded + decoded through `javax.sound`, planted near-dup
    * groups) → 64-bit energy-delta fingerprint
    * ([[graft.multimodal.MultiModal.audioFingerprint64]], all-integer)
    * → the same four-band Hamming ≤ 3 join, lossless by the same
    * pigeonhole, proven by the same brute-force oracle over the
    * dumped fingerprints. Together with d02 (text) and m07 (images)
    * this completes banded near-dup across the three modalities a
    * training-data pipeline carries.
    */
  val m08_audio_neardups: Q = (s, _) => {
    val fps = graft.multimodal.MultiModal.audioFingerprints(
      graft.multimodal.MultiModal.audioCorpus(s, n = 400))
    fps.coalesce(1).write.mode("overwrite").parquet(m08HashPath)
    graft.multimodal.MultiModal.bandedHammingPairs(
      s.read.parquet(m08HashPath).withColumnRenamed("fp", "h"), maxDist = 3)
  }

  def m08_sql: String =
    s"""WITH h AS (SELECT media_id, fp
       |           FROM read_parquet('$m08HashPath/*.parquet'))
       |SELECT a.media_id AS id_a, b.media_id AS id_b,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
       |FROM h a JOIN h b ON a.media_id < b.media_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin

  private def m09HashPath: String =
    s"${graft.ingest.FixtureTables.root}/m09_framedh.parquet"

  /** Perceptual VIDEO near-dup join, completing the modality sweep
    * (d02 text, m07 images, m08 audio): real MJPEG-AVI clips (authored
    * and decoded through the codec registry's RIFF walk; baseline
    * JPEGs via `javax.imageio`) → per-frame dHash → two videos are
    * near-dups when ≥ 3 of their 4 aligned frame positions are within
    * Hamming ≤ 6. JPEG is lossy, so the threshold is wider than m07's
    * and the band count grows to EIGHT 8-bit bands — pigeonhole still
    * exact: 6 differing bits cannot touch all 8 disjoint bands, so
    * every qualifying (pair, position) surfaces in the band join, and
    * the position-count filter runs on complete candidates. Oracle =
    * brute-force n² over the dumped per-frame hashes, proving it.
    */
  val m09_video_neardups: Q = (s, _) => {
    val fps = graft.multimodal.MultiModal.videoFrameDHashes(
      graft.multimodal.MultiModal.videoCorpus(s, n = 200))
    fps.coalesce(1).write.mode("overwrite").parquet(m09HashPath)
    graft.multimodal.MultiModal.videoNearDupPairs(s.read.parquet(m09HashPath))
  }

  def m09_sql: String =
    s"""WITH h AS (SELECT media_id, frame_idx, dhash
       |           FROM read_parquet('$m09HashPath/*.parquet')),
       |close AS (SELECT a.media_id AS id_a, b.media_id AS id_b
       |  FROM h a JOIN h b
       |    ON a.media_id < b.media_id AND a.frame_idx = b.frame_idx
       |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6)
       |SELECT id_a, id_b, COUNT(*) AS n_close_frames
       |FROM close GROUP BY id_a, id_b HAVING COUNT(*) >= 3""".stripMargin

  // per-dir key (the q121/q126/q128 rule): a bench or verify run at a
  // DIFFERENT sfDir must never overwrite the weights a pending oracle
  // compare will replay — the one cross-run interference this family had
  private def t38WeightsPath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/t38_weights_$key"
  }

  /** Model-based document filter (fastText shape, CCNet-family): a
    * logistic classifier over 1024 hashed bag-of-words COUNT buckets
    * distills the stopword-ratio quality rule into a linear model —
    * the same pseudo-label pattern CCNet uses (train cheap model on a
    * rule, apply model at scale). The rule is exactly linear in count
    * features, so the fit has a realizable target; the held-out
    * distillation accuracy is spec-gated. The FIT is driver-side on
    * the bounded doc_id < 200 sample ([[graft.text.QualityClassifier]]
    * — the BPE/quantizer bounded-fit discipline); the APPLY stage —
    * the part that runs over the whole corpus — is one explode + a
    * (doc, bucket) count + a broadcast-sized weight join + an exact
    * INTEGER dot product per document, so the logit is
    * order-independent and the oracle replays it from the dumped
    * micro-unit weight table (bias rides at bucket −1). Both the
    * classification bit (integer logit > 0) and the reference label
    * (100·n_stop > 6·n_tok) are integer comparisons, so no float
    * boundary can flip either between engines.
    */
  /** Shared t38/q121 scorer: fits the distilled logistic model on the
    * bounded sample, dumps the micro-unit weight table to
    * `weightsPath`, and returns the whole-corpus scored frame
    * `(doc_id, __logit_u, __ntok, __nstop)` — the integer logit plus
    * the rule's raw counters, from which t38 projects its
    * classification view and q121 its evaluation report.
    */
  // one fit per fixture dir: t38/q121/q126 share the model (the fit is
  // deterministic, so this is a pure cache — each caller still dumps
  // the weight table to its OWN path for its oracle's replay)
  private val qcFits =
    scala.collection.concurrent.TrieMap[String, (Array[Long], Long)]()

  private def qcScored(s: SparkSession, dir: String,
      weightsPath: String): DataFrame = {
    import graft.text.QualityClassifier
    val docs = t(s, dir, "documents")
    val (w, bias) = qcFits.getOrElseUpdate(dir, {
      // bounded, deterministically ordered training sample;
      // pseudo-labels from the stopword rule over the SAME tokenizer
      val sample = docs.where(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
        .collect().sortBy(_.getLong(0))
        .map { r =>
          val text = r.getString(1)
          (text, QualityClassifier.label(QualityClassifier.tokens(text)))
        }.toSeq
      QualityClassifier.fit(sample)
    })
    val weightRows = w.zipWithIndex
      .map { case (wu, bkt) => (bkt.toLong, wu) } :+ (-1L, bias)
    import s.implicits._
    weightRows.toSeq.toDF("bucket", "w_u")
      .coalesce(1).write.mode("overwrite").parquet(weightsPath)
    val weights = s.read.parquet(weightsPath)
    val staged = docs
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("__ntok"),
        stopRuleCount(col("__toks")).as("__nstop"),
        col("__toks"))
    val perDoc = staged
      .select(col("doc_id"), explode(col("__toks")).as("tok"))
      .select(col("doc_id"),
        pmod(graft.functions.KmvSketch.hash64(col("tok")),
          lit(QualityClassifier.Buckets.toLong)).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("__c"))
      .join(weights.where(col("bucket") >= 0), Seq("bucket"))
      .groupBy(col("doc_id")).agg(sum(col("__c") * col("w_u")).as("__sw"))
    staged.select(col("doc_id"), col("__ntok"), col("__nstop"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (lit(bias) + coalesce(col("__sw"), lit(0L))).as("__logit_u"),
        col("__ntok"), col("__nstop"))
  }

  val t38_quality_classifier: Q = (s, dir) =>
    qcScored(s, dir, t38WeightsPath(dir)).select(
      col("doc_id"),
      (col("__logit_u").cast("double") / lit(1000000.0)).as("logit"),
      (col("__logit_u") > 0).as("pred_high_stop"),
      (col("__nstop") * lit(100L) > col("__ntok") * lit(6L))
        .as("label_high_stop"))

  def t38_sql: String =
    s"""WITH w AS (SELECT bucket, w_u
       |           FROM read_parquet('${t38WeightsPath(oracleSfDir)}/*.parquet')),
       |t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |st AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS ntok,
       |         CAST(len(list_filter(toks, x -> x IN ($stopRuleInSql)))
       |           AS BIGINT) AS nstop
       |       FROM t),
       |b AS (SELECT doc_id,
       |        ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS bucket,
       |        COUNT(*) AS c
       |      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
       |      GROUP BY 1, 2),
       |sw AS (SELECT doc_id, CAST(SUM(b.c * w.w_u) AS BIGINT) AS sw
       |       FROM b JOIN w USING (bucket) WHERE w.bucket >= 0
       |       GROUP BY doc_id),
       |bias AS (SELECT w_u FROM read_parquet('${t38WeightsPath(oracleSfDir)}/*.parquet')
       |         WHERE bucket = -1)
       |SELECT st.doc_id,
       |  CAST((SELECT w_u FROM bias) + COALESCE(sw.sw, 0) AS DOUBLE)
       |    / 1000000.0e0 AS logit,
       |  ((SELECT w_u FROM bias) + COALESCE(sw.sw, 0)) > 0 AS pred_high_stop,
       |  (st.nstop * 100 > st.ntok * 6) AS label_high_stop
       |FROM st LEFT JOIN sw USING (doc_id)""".stripMargin

  private def q121WeightsPath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/q121_weights_$key"
  }

  /** q121: model evaluation at corpus scale — the ROC AUC (plus the
    * confusion matrix and accuracy at the model's own 0 threshold) of
    * the t38 quality classifier against its reference rule. Every
    * trained filter ships with this report; at 100 TB the eval set IS
    * the corpus, so the rank statistic must be distributed.
    *
    * AUC is the Mann–Whitney pair statistic computed WITHOUT a global
    * sort of documents: scores collapse to the distinct-score frame
    * (one keyed aggregate with map-side combine — the integer
    * micro-unit logit makes ties exact, never float-fuzzy), and the
    * "negatives below" prefix runs as t16's two-level prefix sum over
    * that frame (per-bucket subtotals, an exclusive prefix over the
    * tiny bucket row set, a within-bucket running sum) — the only
    * unpartitioned window touches ~|distinct scores|/2²⁰ rows. The
    * numerator Σ_s p_s·(2·N_<(s) + n_s) — 2·(concordant pairs) +
    * (tied pairs) — sums DECIMAL(19,0)×DECIMAL(19,0) products
    * exactly at any corpus size; AUC and accuracy are then single
    * IEEE divisions of exact integers, written in the same order in
    * both engines. The oracle replays scoring from the dumped weight
    * table and states the naive global-window rank formula — same
    * number, independent plan.
    */
  val q121_auc_eval: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val scored = qcScored(s, dir, q121WeightsPath(dir))
      .select(col("__logit_u").as("s_u"),
        (col("__nstop") * lit(100L) > col("__ntok") * lit(6L)).as("__y"))
    // distinct-score frame: |g| ≤ distinct integer logits — consumed
    // by both prefix branches, so materialize once (the t39 rule)
    val g = scored.groupBy(col("s_u"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__p"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("__n"))
      .withColumn("__bucket",
        floor(col("s_u").cast("double") / lit(1048576.0)))
      .localCheckpoint(true)
    // t16's two-level prefix: exclusive bucket prefix (constant-valued
    // non-foldable key keeps the window visibly partitioned), then a
    // within-bucket running sum
    val wB = Window.partitionBy(pmod(col("__bucket"), lit(1)))
      .orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pref = g.groupBy(col("__bucket")).agg(sum(col("__n")).as("__bn"))
      .select(col("__bucket"),
        coalesce(sum(col("__bn")).over(wB), lit(0L)).as("__nstart"))
    val wIn = Window.partitionBy(col("__bucket")).orderBy(col("s_u"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLess = g.join(broadcast(pref), "__bucket")
      .select(col("s_u"), col("__p"), col("__n"),
        (col("__nstart") + coalesce(sum(col("__n")).over(wIn), lit(0L)))
          .as("__nless"))
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    withLess.agg(
        sum(col("__p")).as("n_pos"),
        sum(col("__n")).as("n_neg"),
        sum((lit(2L) * col("__nless") + col("__n")).cast(dec19) *
          col("__p").cast(dec19)).as("__num2"),
        sum(when(col("s_u") > 0, col("__p")).otherwise(0L)).as("tp"),
        sum(when(col("s_u") > 0, col("__n")).otherwise(0L)).as("fp"),
        sum(when(col("s_u") <= 0, col("__p")).otherwise(0L)).as("fn"),
        sum(when(col("s_u") <= 0, col("__n")).otherwise(0L)).as("tn"))
      .select(col("n_pos"), col("n_neg"),
        col("tp"), col("fp"), col("fn"), col("tn"),
        ((col("tp") + col("tn")).cast("double") /
          (col("n_pos") + col("n_neg")).cast("double")).as("accuracy"),
        (col("__num2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") *
            col("n_neg").cast("double"))).as("auc"))
  }

  def q121_sql: String =
    s"""WITH w AS (SELECT bucket, w_u
       |  FROM read_parquet('${q121WeightsPath(oracleSfDir)}/*.parquet')),
       |t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |st AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS ntok,
       |         CAST(len(list_filter(toks, x -> x IN ($stopRuleInSql)))
       |           AS BIGINT) AS nstop
       |       FROM t),
       |b AS (SELECT doc_id,
       |        ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS bucket,
       |        COUNT(*) AS c
       |      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
       |      GROUP BY 1, 2),
       |sw AS (SELECT doc_id, CAST(SUM(b.c * w.w_u) AS BIGINT) AS sw
       |       FROM b JOIN w USING (bucket) WHERE w.bucket >= 0
       |       GROUP BY doc_id),
       |sc AS (SELECT
       |         (SELECT w_u FROM w WHERE bucket = -1)
       |           + COALESCE(sw.sw, 0) AS s_u,
       |         (st.nstop * 100 > st.ntok * 6) AS y
       |       FROM st LEFT JOIN sw USING (doc_id)),
       |g AS (SELECT s_u,
       |        SUM(CASE WHEN y THEN 1 ELSE 0 END) AS p,
       |        SUM(CASE WHEN y THEN 0 ELSE 1 END) AS n
       |      FROM sc GROUP BY s_u),
       |c AS (SELECT s_u, p, n,
       |        COALESCE(SUM(n) OVER (ORDER BY s_u
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          AS nless
       |      FROM g)
       |SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
       |  CAST(SUM(n) AS BIGINT) AS n_neg,
       |  CAST(SUM(CASE WHEN s_u > 0 THEN p ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(SUM(CASE WHEN s_u > 0 THEN n ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(SUM(CASE WHEN s_u <= 0 THEN p ELSE 0 END) AS BIGINT) AS fn,
       |  CAST(SUM(CASE WHEN s_u <= 0 THEN n ELSE 0 END) AS BIGINT) AS tn,
       |  CAST(SUM(CASE WHEN s_u > 0 THEN p ELSE 0 END)
       |       + SUM(CASE WHEN s_u <= 0 THEN n ELSE 0 END) AS DOUBLE)
       |    / CAST(SUM(p) + SUM(n) AS DOUBLE) AS accuracy,
       |  CAST(SUM(CAST(2 * nless + n AS DECIMAL(19,0))
       |           * CAST(p AS DECIMAL(19,0))) AS DOUBLE)
       |    / (2.0 * CAST(SUM(p) AS DOUBLE) * CAST(SUM(n) AS DOUBLE)) AS auc
       |FROM c""".stripMargin

  private def q126WeightsPath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/q126_weights_$key"
  }

  /** q126: calibration report — q121's companion (AUC measures
    * RANKING; calibration measures whether the scores MEAN what they
    * claim, which is what a downstream threshold or mixture weight
    * consumes). Documents bucket by half-logit steps of the integer
    * micro-unit score (a pure projection — fixed-width buckets, no
    * quantile fit); per bucket the empirical positive rate (one IEEE
    * division of exact counts) sits next to the model's own predicted
    * probability. The logistic goes through
    * [[graft.functions.PortableMath]] — round 9 proved
    * `round(exp(…), 9)` is engine-divergent, so the mean logit and
    * predicted rate are reported as exact e-9 integer units computed
    * by the same correctly-rounded series on both sides. One keyed
    * aggregate over the scored frame; the report is
    * bucket-count-bounded at any corpus size. A well-calibrated model
    * shows pred_rate ≈ emp_rate down the table; expected calibration
    * error is one weighted fold over these rows.
    */
  private def q126Bindings: graft.functions.PortableMath.Bindings = {
    import graft.functions.PortableMath._
    Seq("__z" -> (Dual.col("__slu").toDouble / Dual.col("n_docs").toDouble /
        Dual.lit(1000000.0))) :+
      ("mean_logit_e9" -> roundedUnits(Dual.col("__z"), 9)) :++
      logisticE9("__z", "pred_rate_e9")
  }

  val q126_calibration: Q = (s, dir) => {
    val scored = qcScored(s, dir, q126WeightsPath(dir))
      .select(col("__logit_u"),
        (col("__nstop") * lit(100L) > col("__ntok") * lit(6L)).as("__y"))
    val g = scored
      .withColumn("bucket",
        floor(col("__logit_u").cast("double") / lit(500000.0)).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("__logit_u")).as("__slu"))
    graft.functions.PortableMath.withBindings(g, q126Bindings)
      .select(col("bucket"), col("n_docs"), col("n_pos"),
        col("mean_logit_e9"), col("pred_rate_e9"),
        (col("n_pos").cast("double") / col("n_docs").cast("double"))
          .as("emp_rate"))
  }

  def q126_sql: String = {
    val chain = graft.functions.PortableMath.sqlWithBindings(
      "SELECT * FROM g", q126Bindings)
    s"""WITH w AS (SELECT bucket, w_u
       |  FROM read_parquet('${q126WeightsPath(oracleSfDir)}/*.parquet')),
       |t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |st AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS ntok,
       |         CAST(len(list_filter(toks, x -> x IN ($stopRuleInSql)))
       |           AS BIGINT) AS nstop
       |       FROM t),
       |b AS (SELECT doc_id,
       |        ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS bucket,
       |        COUNT(*) AS c
       |      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
       |      GROUP BY 1, 2),
       |sw AS (SELECT doc_id, CAST(SUM(b.c * w.w_u) AS BIGINT) AS sw
       |       FROM b JOIN w USING (bucket) WHERE w.bucket >= 0
       |       GROUP BY doc_id),
       |sc AS (SELECT
       |         (SELECT w_u FROM w WHERE bucket = -1)
       |           + COALESCE(sw.sw, 0) AS s_u,
       |         (st.nstop * 100 > st.ntok * 6) AS y
       |       FROM st LEFT JOIN sw USING (doc_id)),
       |g AS (SELECT CAST(FLOOR(CAST(s_u AS DOUBLE) / 500000.0) AS BIGINT)
       |          AS bucket,
       |        COUNT(*) AS n_docs,
       |        CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |        CAST(SUM(s_u) AS BIGINT) AS __slu
       |      FROM sc GROUP BY 1),
       |fin AS ($chain)
       |SELECT bucket, n_docs, n_pos, mean_logit_e9, pred_rate_e9, emp_rate
       |FROM (SELECT bucket, n_docs, n_pos, mean_logit_e9, pred_rate_e9,
       |        CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE) AS emp_rate
       |      FROM fin)""".stripMargin
  }

  private def q128WeightsPath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/q128_weights_$key"
  }

  /** q128: per-slice AUC — q121 grouped by document source, the way
    * model evaluation is actually consumed (a global AUC hides a
    * slice the model ranks at chance; per-language/per-source
    * breakdowns are the first page of every real eval report). The
    * rank statistic runs INDEPENDENTLY per slice, and the t16
    * two-level prefix generalizes per group: per-(slice, bucket)
    * subtotals, an exclusive bucket prefix windowed BY SLICE (input =
    * slices × ~score-range/2²⁰ bucket rows — bounded), then the
    * within-bucket running sum keyed (slice, bucket). No window ever
    * sees a slice's full distinct-score frame in one partition — the
    * naive per-slice window (PARTITION BY source ORDER BY score)
    * funnels each slice through one task, exactly the low-cardinality
    * window trap the plan lint exists to catch; the oracle states
    * that naive form, the plan avoids it.
    */
  val q128_auc_by_slice: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val scored = qcScored(s, dir, q128WeightsPath(dir))
    val withSrc = t(s, dir, "documents").select(col("doc_id"), col("source"))
      .join(scored, Seq("doc_id"))
      .select(col("source"), col("__logit_u").as("s_u"),
        (col("__nstop") * lit(100L) > col("__ntok") * lit(6L)).as("__y"))
    val g = withSrc.groupBy(col("source"), col("s_u"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__p"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("__n"))
      .withColumn("__bucket",
        floor(col("s_u").cast("double") / lit(1048576.0)))
      .localCheckpoint(true)
    val wB = Window.partitionBy(col("source")).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pref = g.groupBy(col("source"), col("__bucket"))
      .agg(sum(col("__n")).as("__bn"))
      .select(col("source"), col("__bucket"),
        coalesce(sum(col("__bn")).over(wB), lit(0L)).as("__nstart"))
    val wIn = Window.partitionBy(col("source"), col("__bucket"))
      .orderBy(col("s_u"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLess = g.join(broadcast(pref), Seq("source", "__bucket"))
      .select(col("source"), col("s_u"), col("__p"), col("__n"),
        (col("__nstart") + coalesce(sum(col("__n")).over(wIn), lit(0L)))
          .as("__nless"))
    val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
    withLess.groupBy(col("source"))
      .agg(
        sum(col("__p")).as("n_pos"),
        sum(col("__n")).as("n_neg"),
        sum((lit(2L) * col("__nless") + col("__n")).cast(dec19) *
          col("__p").cast(dec19)).as("__num2"))
      .where(col("n_pos") > 0 && col("n_neg") > 0)
      .select(col("source"), col("n_pos"), col("n_neg"),
        (col("__num2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") *
            col("n_neg").cast("double"))).as("auc"))
  }

  def q128_sql: String =
    s"""WITH w AS (SELECT bucket, w_u
       |  FROM read_parquet('${q128WeightsPath(oracleSfDir)}/*.parquet')),
       |t AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
       |st AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS ntok,
       |         CAST(len(list_filter(toks, x -> x IN ($stopRuleInSql)))
       |           AS BIGINT) AS nstop
       |       FROM t),
       |b AS (SELECT doc_id,
       |        ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS bucket,
       |        COUNT(*) AS c
       |      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
       |      GROUP BY 1, 2),
       |sw AS (SELECT doc_id, CAST(SUM(b.c * w.w_u) AS BIGINT) AS sw
       |       FROM b JOIN w USING (bucket) WHERE w.bucket >= 0
       |       GROUP BY doc_id),
       |sc AS (SELECT st.source,
       |         (SELECT w_u FROM w WHERE bucket = -1)
       |           + COALESCE(sw.sw, 0) AS s_u,
       |         (st.nstop * 100 > st.ntok * 6) AS y
       |       FROM st LEFT JOIN sw USING (doc_id)),
       |g AS (SELECT source, s_u,
       |        SUM(CASE WHEN y THEN 1 ELSE 0 END) AS p,
       |        SUM(CASE WHEN y THEN 0 ELSE 1 END) AS n
       |      FROM sc GROUP BY source, s_u),
       |c AS (SELECT source, s_u, p, n,
       |        COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY s_u
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          AS nless
       |      FROM g)
       |SELECT source, CAST(SUM(p) AS BIGINT) AS n_pos,
       |  CAST(SUM(n) AS BIGINT) AS n_neg,
       |  CAST(SUM(CAST(2 * nless + n AS DECIMAL(19,0))
       |           * CAST(p AS DECIMAL(19,0))) AS DOUBLE)
       |    / (2.0 * CAST(SUM(p) AS DOUBLE) * CAST(SUM(n) AS DOUBLE)) AS auc
       |FROM c
       |GROUP BY source
       |HAVING SUM(p) > 0 AND SUM(n) > 0""".stripMargin

  private def q152WeightsPath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/q152_weights_$key"
  }

  /** q152: per-slice fairness report — the responsible-AI readout the
    * eval family still lacked: q121 scores the classifier, q126
    * calibrates it, q128 ranks it per slice, and q152 asks whether
    * its DECISIONS (the logit > 0 threshold t38 ships) treat slices
    * equitably. Per source slice: selection rate (demographic
    * parity), TPR and FPR against the rule label (the equalized-odds
    * pair), each as an EXACT e-6 integer rate; the gap columns are
    * integer differences against the pooled global rates (one
    * broadcast 1-row fold), and the disparate-impact flag is the
    * EEOC four-fifths rule AS THE RULE DEFINES IT — each slice's
    * selection rate against the HIGHEST-rate slice's, in exact
    * cross-multiplied integers (5·np_s·n_max < 4·np_max·n_s; the
    * r14 version compared floored e-6 rates to the POOLED rate,
    * which under-flags: a small 100%-rate slice barely moves the
    * pool, so a 70%-rate slice passed the pooled test while
    * violating the actual rule). The max-rate slice is picked by
    * exact fraction comparison (cross-multiplication, DECIMAL-wide)
    * with a source-name tie-break; ties cannot flip the verdict
    * because the flag depends only on the max rate's VALUE. A slice
    * with no label positives (or no negatives) has no TPR (FPR) —
    * NULL, the ksTail rule, and its gap is NULL rather than a silent
    * 0. The scorer is the SHARED [[qcScored]] fit (one model —
    * t38/q121/q126/q128/q152 read the same distillation), dumped
    * per-query for the oracle's replay.
    *
    * Ground-truth caveat: the `__y` label is the stopword RULE
    * itself — the same family the t38 classifier was distilled from,
    * i.e. a PROXY label. The query demonstrates (and the oracle
    * certifies) the fairness ARITHMETIC; its TPR/FPR gaps audit the
    * classifier against a rule proxy, not real-world human labels —
    * do not read the fixture's numbers as real fairness findings.
    *
    * Scale shape: the scoring scan is t38's (shared shuffle); the
    * report is ONE map-side-combined groupBy(source) over exact
    * counters plus a broadcast 1-row global fold and a broadcast
    * 1-row max-rate fold (an anti-join over the slice-domain-bounded
    * aggregate — the report-cross exemption class) — no window, no
    * driver state.
    */
  val q152_fairness_report: Q = (s, dir) => {
    val scored = qcScored(s, dir, q152WeightsPath(dir))
    val base = t(s, dir, "documents").select(col("doc_id"), col("source"))
      .join(scored, Seq("doc_id"))
      .select(col("source"),
        (col("__logit_u") > 0L).as("__pred"),
        (col("__nstop") * lit(100L) > col("__ntok") * lit(6L)).as("__y"))
    val agg = base.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__pred"), 1L).otherwise(0L)).as("__np"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__ny"),
        sum(when(col("__pred") && col("__y"), 1L).otherwise(0L)).as("__tp"),
        sum(when(col("__pred") && !col("__y"), 1L).otherwise(0L)).as("__fp"))
      .localCheckpoint(true) // the slice rows AND the global fold
    val glob = agg.agg(sum(col("n_docs")).as("__gn"),
      sum(col("__np")).as("__gnp"), sum(col("__ny")).as("__gny"),
      sum(col("__tp")).as("__gtp"), sum(col("__fp")).as("__gfp"))
    // the max-SELECTION-RATE slice, by exact fraction comparison
    // (cross-multiplied DECIMAL(19,0) products — exact up to 1e13-doc
    // slices) with a source-name tie-break; slice b "beats" slice a
    // when its rate is strictly higher or equal-with-smaller-name.
    // Anti-join over the slice-domain-bounded aggregate: ≤|sources|²
    // comparisons, never corpus-scale.
    val beats = expr(
      """CAST(__bnp AS DECIMAL(19,0)) * CAST(n_docs AS DECIMAL(19,0))
        |  > CAST(__np AS DECIMAL(19,0)) * CAST(__bn AS DECIMAL(19,0))
        | OR (CAST(__bnp AS DECIMAL(19,0)) * CAST(n_docs AS DECIMAL(19,0))
        |      = CAST(__np AS DECIMAL(19,0)) * CAST(__bn AS DECIMAL(19,0))
        |     AND __bs < source)""".stripMargin)
    val mx = agg.select(col("source"), col("n_docs"), col("__np"))
      .join(agg.select(col("source").as("__bs"), col("n_docs").as("__bn"),
        col("__np").as("__bnp")), beats, "left_anti")
      .select(col("__np").as("__mxnp"), col("n_docs").as("__mxn"))
    val one = agg.crossJoin(broadcast(glob)).crossJoin(broadcast(mx))
    val nullL = lit(null).cast("long")
    val ppr = expr("__np * 1000000L div n_docs")
    val tpr = when(col("__ny") > 0L, expr("__tp * 1000000L div __ny"))
      .otherwise(nullL)
    val fpr = when(col("n_docs") - col("__ny") > 0L,
      expr("__fp * 1000000L div (n_docs - __ny)")).otherwise(nullL)
    val gppr = expr("__gnp * 1000000L div __gn")
    val gtpr = when(col("__gny") > 0L, expr("__gtp * 1000000L div __gny"))
      .otherwise(nullL)
    val gfpr = when(col("__gn") - col("__gny") > 0L,
      expr("__gfp * 1000000L div (__gn - __gny)")).otherwise(nullL)
    one.select(col("source"), col("n_docs"),
      ppr.as("ppr_e6"), tpr.as("tpr_e6"), fpr.as("fpr_e6"),
      abs(ppr - gppr).as("dp_gap_e6"),
      abs(tpr - gtpr).as("tpr_gap_e6"),
      abs(fpr - gfpr).as("fpr_gap_e6"),
      // 5·np_s·n_max < 4·np_max·n_s — the EEOC rule against the
      // max-rate slice, in exact integers (np·5 fits BIGINT for any
      // real slice; the cross products go DECIMAL-wide)
      expr("""CAST(__np * 5 AS DECIMAL(19,0)) * CAST(__mxn AS DECIMAL(19,0))
             | < CAST(__mxnp * 4 AS DECIMAL(19,0))
             |   * CAST(n_docs AS DECIMAL(19,0))""".stripMargin)
        .as("four_fifths_flag"))
  }

  def q152_sql: String =
    s"""WITH w AS (SELECT bucket, w_u
       |  FROM read_parquet('${q152WeightsPath(oracleSfDir)}/*.parquet')),
       |t AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
       |st AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS ntok,
       |         CAST(len(list_filter(toks, x -> x IN ($stopRuleInSql)))
       |           AS BIGINT) AS nstop
       |       FROM t),
       |b AS (SELECT doc_id,
       |        ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS bucket,
       |        COUNT(*) AS c
       |      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
       |      GROUP BY 1, 2),
       |sw AS (SELECT doc_id, CAST(SUM(b.c * w.w_u) AS BIGINT) AS sw
       |       FROM b JOIN w USING (bucket) WHERE w.bucket >= 0
       |       GROUP BY doc_id),
       |sc AS (SELECT st.source,
       |         ((SELECT w_u FROM w WHERE bucket = -1)
       |           + COALESCE(sw.sw, 0)) > 0 AS pred,
       |         (st.nstop * 100 > st.ntok * 6) AS y
       |       FROM st LEFT JOIN sw USING (doc_id)),
       |agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(CASE WHEN pred THEN 1 ELSE 0 END) AS BIGINT) AS np,
       |    CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS ny,
       |    CAST(SUM(CASE WHEN pred AND y THEN 1 ELSE 0 END) AS BIGINT)
       |      AS tp,
       |    CAST(SUM(CASE WHEN pred AND NOT y THEN 1 ELSE 0 END) AS BIGINT)
       |      AS fp
       |  FROM sc GROUP BY 1),
       |gtot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS gn,
       |    CAST(SUM(np) AS BIGINT) AS gnp, CAST(SUM(ny) AS BIGINT) AS gny,
       |    CAST(SUM(tp) AS BIGINT) AS gtp, CAST(SUM(fp) AS BIGINT) AS gfp
       |  FROM agg),
       |mxs AS (SELECT a.np AS mxnp, a.n_docs AS mxn FROM agg a
       |  WHERE NOT EXISTS (SELECT 1 FROM agg b
       |    WHERE CAST(b.np AS HUGEINT) * a.n_docs
       |            > CAST(a.np AS HUGEINT) * b.n_docs
       |       OR (CAST(b.np AS HUGEINT) * a.n_docs
       |             = CAST(a.np AS HUGEINT) * b.n_docs
       |           AND b.source < a.source))),
       |one AS (SELECT agg.*, gtot.*, mxs.*
       |        FROM agg CROSS JOIN gtot CROSS JOIN mxs),
       |r AS (SELECT source, n_docs,
       |    CAST(np * 5 AS HUGEINT) * mxn
       |      < CAST(mxnp * 4 AS HUGEINT) * n_docs AS ff,
       |    np * 1000000 // n_docs AS ppr,
       |    CASE WHEN ny > 0 THEN tp * 1000000 // ny ELSE NULL END AS tpr,
       |    CASE WHEN n_docs - ny > 0
       |      THEN fp * 1000000 // (n_docs - ny) ELSE NULL END AS fpr,
       |    gnp * 1000000 // gn AS gppr,
       |    CASE WHEN gny > 0 THEN gtp * 1000000 // gny ELSE NULL END
       |      AS gtpr,
       |    CASE WHEN gn - gny > 0 THEN gfp * 1000000 // (gn - gny)
       |      ELSE NULL END AS gfpr
       |  FROM one)
       |SELECT source, n_docs,
       |  CAST(ppr AS BIGINT) AS ppr_e6, CAST(tpr AS BIGINT) AS tpr_e6,
       |  CAST(fpr AS BIGINT) AS fpr_e6,
       |  CAST(ABS(ppr - gppr) AS BIGINT) AS dp_gap_e6,
       |  CAST(ABS(tpr - gtpr) AS BIGINT) AS tpr_gap_e6,
       |  CAST(ABS(fpr - gfpr) AS BIGINT) AS fpr_gap_e6,
       |  ff AS four_fifths_flag
       |FROM r""".stripMargin

  /** t39: PMI-style collocation mining — the corpus's most-associated
    * word bigrams by lift p(ab)/(p(a)·p(b)), the statistic behind
    * phrase detection (word2vec's phrase pass), tokenizer merge
    * candidates beyond raw frequency (t24 ranks by count; this ranks
    * by association), and stop-phrase discovery. Unigram
    * probabilities come from token positions, bigram probabilities
    * from bigram positions; a minimum pair support of 10 removes the
    * classic PMI singleton pathology before ranking.
    *
    * Plan: ONE token explode feeds both count families (the unigram
    * aggregate directly, the bigram aggregate off the staged array) —
    * both map-side combined, both materialized once
    * (vocabulary-sized, the [[graft.graph.GraphOps]] checkpoint
    * discipline) because each is consumed twice (counts + its
    * position total). The two position totals are bounded 1-row
    * driver hops off the AGGREGATED frames (the q82/t19 scalar
    * discipline — never a scan of the corpus). Scoring joins the
    * bigram counts to the unigram vocabulary twice on the word key;
    * the top-50 cut is a TakeOrdered with the unique (w1, w2)
    * tie-break.
    *
    * Determinism: lift divides exact BIGINT counts as doubles in the
    * identical written order in both engines — every int→double cast
    * and IEEE step is correctly rounded from identical inputs, so no
    * output rounding is needed (the g08/q120 discipline; ln-free on
    * purpose, as ln is not correctly rounded and PMI's ln is a
    * monotone transform that cannot change the ranking).
    */
  val t39_collocations: Q = (s, dir) => {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
    val uc = toks
      .select(explode_outer(col("__toks")).as("w"))
      .where(col("w").isNotNull)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val bc = toks.where(size(col("__toks")) >= 2)
      .select(explode_outer(transform(
        sequence(lit(1), size(col("__toks")) - 1),
        i => struct(
          element_at(col("__toks"), i).as("w1"),
          element_at(col("__toks"), i + 1).as("w2")))).as("bg"))
      .where(col("bg").isNotNull)
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // the two corpus totals: bounded 1-row hops off vocabulary-sized
    // aggregates (never the corpus), like q82's bounds and t19's avgdl
    val nu = uc.agg(sum(col("c"))).collect()(0).getLong(0)
    val nb = bc.agg(sum(col("c"))).collect()(0).getLong(0)
    val lift =
      (col("pair_count").cast("double") / lit(nb).cast("double")) /
        ((col("ca").cast("double") / lit(nu).cast("double")) *
          (col("cb").cast("double") / lit(nu).cast("double")))
    bc.select(col("w1"), col("w2"), col("c").as("pair_count"))
      .where(col("pair_count") >= 10)
      .join(uc.select(col("w").as("w1"), col("c").as("ca")), "w1")
      .join(uc.select(col("w").as("w2"), col("c").as("cb")), "w2")
      .select(col("w1"), col("w2"), col("pair_count"), lift.as("lift"))
      .orderBy(col("lift").desc, col("w1").asc, col("w2").asc)
      .limit(50)
  }

  val t39_sql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |ug AS (SELECT unnest(toks) AS w FROM t),
       |uc AS MATERIALIZED (SELECT w, COUNT(*) AS c FROM ug GROUP BY w),
       |f AS (SELECT toks FROM t WHERE len(toks) >= 2),
       |bg AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
       |                                    i -> toks[i:i+1])) AS pair
       |       FROM f),
       |bc AS MATERIALIZED (SELECT pair[1] AS w1, pair[2] AS w2,
       |                           COUNT(*) AS c
       |                    FROM bg GROUP BY 1, 2),
       |nu AS (SELECT CAST(SUM(c) AS BIGINT) AS nu FROM uc),
       |nb AS (SELECT CAST(SUM(c) AS BIGINT) AS nb FROM bc)
       |SELECT b.w1, b.w2, b.c AS pair_count,
       |  (CAST(b.c AS DOUBLE) / CAST(nb.nb AS DOUBLE)) /
       |  ((CAST(a1.c AS DOUBLE) / CAST(nu.nu AS DOUBLE)) *
       |   (CAST(a2.c AS DOUBLE) / CAST(nu.nu AS DOUBLE))) AS lift
       |FROM bc b
       |JOIN uc a1 ON a1.w = b.w1
       |JOIN uc a2 ON a2.w = b.w2
       |CROSS JOIN nu CROSS JOIN nb
       |WHERE b.c >= 10
       |ORDER BY lift DESC, b.w1, b.w2
       |LIMIT 50""".stripMargin

  /** t40: χ²-based term selection against the quality label — the
    * classic feature-selection pass (which vocabulary terms are most
    * associated with low-quality documents) that sizes a filter
    * model's feature set before anything is trained, and doubles as a
    * corpus-QA report (a term whose presence predicts the label is a
    * contamination or boilerplate signal). Per term the 2×2
    * document-level contingency (has-term × label) comes from ONE
    * distinct (doc, token) explode + a token-keyed aggregate
    * (map-side combined); the label totals are a 1-row broadcast hop.
    * χ² = N·(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) evaluates on
    * exact-integer-valued doubles in a fixed written order — ad−bc
    * stays BIGINT-exact, the products run as doubles because
    * N·(ad−bc)² overflows BIGINT at corpus scale. A min-df of 20
    * drops the singleton tail (the PMI pathology, t39); ties order by
    * term. The oracle replays the same contingency in SQL.
    */
  val t40_chi2_terms: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val lab = docs
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), col("__toks"),
        stopRuleLabel(col("__toks")).as("__y"))
    // 1-row label totals: P docs positive, M negative
    val tot = lab.agg(
      sum(when(col("__y"), 1L).otherwise(0L)).as("__P"),
      sum(when(col("__y"), 0L).otherwise(1L)).as("__M"))
    val perTok = lab
      .select(col("doc_id"), col("__y"),
        explode(array_distinct(col("__toks"))).as("term"))
      .groupBy(col("term"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("a"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("b"))
    val cc = col("__P") - col("a") // positives without the term
    val dd = col("__M") - col("b") // negatives without the term
    val diff = col("a") * dd - col("b") * cc // BIGINT-exact
    val nD = (col("__P") + col("__M")).cast("double")
    val chi2 = nD * diff.cast("double") * diff.cast("double") /
      ((col("a") + col("b")).cast("double") * (cc + dd).cast("double") *
        col("__P").cast("double") * col("__M").cast("double"))
    perTok.crossJoin(broadcast(tot))
      .where(col("a") + col("b") >= 20 && cc + dd > 0)
      .select(col("term"), (col("a") + col("b")).as("df"),
        col("a").as("n_pos_docs"), col("b").as("n_neg_docs"),
        chi2.as("chi2"))
      .orderBy(col("chi2").desc, col("term").asc)
      .limit(50)
  }

  val t40_sql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |lab AS (SELECT doc_id, toks,
       |  (CAST(len(list_filter(toks, x -> x IN ($stopRuleInSql))) AS BIGINT)
       |     * 100 > CAST(len(toks) AS BIGINT) * 6) AS y
       |  FROM t),
       |tot AS (SELECT SUM(CASE WHEN y THEN 1 ELSE 0 END) AS P,
       |               SUM(CASE WHEN y THEN 0 ELSE 1 END) AS M
       |        FROM lab),
       |pt AS (SELECT term,
       |         SUM(CASE WHEN y THEN 1 ELSE 0 END) AS a,
       |         SUM(CASE WHEN y THEN 0 ELSE 1 END) AS b
       |       FROM (SELECT doc_id, y, unnest(list_distinct(toks)) AS term
       |             FROM lab)
       |       GROUP BY term)
       |SELECT term, CAST(a + b AS BIGINT) AS df,
       |  CAST(a AS BIGINT) AS n_pos_docs, CAST(b AS BIGINT) AS n_neg_docs,
       |  CAST(P + M AS DOUBLE) * CAST(a * (M - b) - b * (P - a) AS DOUBLE)
       |    * CAST(a * (M - b) - b * (P - a) AS DOUBLE)
       |    / (CAST(a + b AS DOUBLE) * CAST((P - a) + (M - b) AS DOUBLE)
       |       * CAST(P AS DOUBLE) * CAST(M AS DOUBLE)) AS chi2
       |FROM pt CROSS JOIN tot
       |WHERE a + b >= 20 AND (P - a) + (M - b) > 0
       |ORDER BY chi2 DESC, term
       |LIMIT 50""".stripMargin

  /** t41: Heaps'-law vocabulary-growth fit — t23's companion scaling
    * law (Zipf grades the FREQUENCY distribution; Heaps grades how
    * vocabulary GROWS with corpus size, V(n) ≈ K·n^β). The curve a
    * tokenizer team reads before sizing a vocabulary, and a corpus-QA
    * signal (β far from ~0.5 flags synthetic/duplicated text). The
    * exact growth curve V(n) derives WITHOUT any per-prefix rescan:
    * each token contributes once at its FIRST-occurrence document
    * (one min-aggregate — the q85 first-seen identity applied to
    * vocabulary), new-vocab and token counts roll up to 64 doc-id
    * buckets, and the only windows run over that 64-row bucket frame.
    * The log-log OLS follows t23 verbatim: per-point log terms
    * quantized to DECIMAL(28,12), closed-form slope in doubles with
    * one written order.
    */
  val t41_heaps_law: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val B = 64
    val docs = t(s, dir, "documents")
    val mx = docs.agg(max(col("doc_id")).cast("double").as("__mx"))
    def bucketOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c.cast("double") * lit(B.toDouble) / (col("__mx") + lit(1.0)))
        .cast("long").as("bucket")
    val tokensPerBucket = docs
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("__nt"))
      .crossJoin(broadcast(mx))
      .select(bucketOf(col("doc_id")), col("__nt"))
      .groupBy(col("bucket")).agg(sum(col("__nt")).as("toks"))
    val newVocabPerBucket = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(min(col("doc_id")).as("__fd"))
      .crossJoin(broadcast(mx))
      .select(bucketOf(col("__fd")))
      .groupBy(col("bucket")).agg(count(lit(1)).as("newv"))
    val w = Window.partitionBy(pmod(col("bucket"), lit(1)))
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the t23 log-log OLS machinery reused verbatim: x = ln cumulative
    // tokens, y = ln cumulative vocabulary, exact e-12 term units
    val pts = tokensPerBucket
      .join(newVocabPerBucket, Seq("bucket"), "full_outer")
      .select(col("bucket"), coalesce(col("toks"), lit(0L)).as("toks"),
        coalesce(col("newv"), lit(0L)).as("newv"))
      .select(col("bucket"),
        sum(col("toks")).over(w).as("__r"),
        sum(col("newv")).over(w).as("__f"))
      .where(col("__r") > 0 && col("__f") > 0)
    val m = graft.functions.PortableMath
      .withBindings(pts, zipfTermBindings).agg(
        count(lit(1)).as("n"),
        sum(col("__x_e12")).as("sx"), sum(col("__y_e12")).as("sy"),
        sum(col("__xx_e12")).as("sxx"), sum(col("__xy_e12")).as("sxy"))
    graft.functions.PortableMath
      .withBindings(m, zipfOutBindings("heaps_beta_e6", "log_k_e6"))
      .select(col("n").as("n_points"), col("heaps_beta_e6"),
        col("log_k_e6"))
  }

  def t41_sql: String = {
    val t41TermChain = graft.functions.PortableMath.sqlWithBindings(
      "SELECT ncum AS __r, vcum AS __f FROM cc WHERE ncum > 0 AND vcum > 0",
      zipfTermBindings)
    val t41OutChain = graft.functions.PortableMath.sqlWithBindings(
      "SELECT * FROM m", zipfOutBindings("heaps_beta_e6", "log_k_e6"))
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |mx AS (SELECT CAST(MAX(doc_id) AS DOUBLE) AS mx FROM t),
       |tb AS (SELECT CAST(FLOOR(CAST(doc_id AS DOUBLE) * 64.0 / (mx + 1.0))
       |           AS BIGINT) AS bucket,
       |         CAST(SUM(len(toks)) AS BIGINT) AS toks
       |       FROM t CROSS JOIN mx GROUP BY 1),
       |fo AS (SELECT tok, MIN(doc_id) AS fd
       |       FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
       |       GROUP BY tok),
       |vb AS (SELECT CAST(FLOOR(CAST(fd AS DOUBLE) * 64.0 / (mx + 1.0))
       |           AS BIGINT) AS bucket, COUNT(*) AS newv
       |       FROM fo CROSS JOIN mx GROUP BY 1),
       |cb AS (SELECT COALESCE(tb.bucket, vb.bucket) AS bucket,
       |         COALESCE(toks, 0) AS toks, COALESCE(newv, 0) AS newv
       |       FROM tb FULL JOIN vb ON tb.bucket = vb.bucket),
       |cc AS (SELECT bucket,
       |         CAST(SUM(toks) OVER w AS BIGINT) AS ncum,
       |         CAST(SUM(newv) OVER w AS BIGINT) AS vcum
       |       FROM cb WINDOW w AS (ORDER BY bucket
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |pt AS ($t41TermChain),
       |m AS (SELECT COUNT(*) AS n,
       |        CAST(SUM(__x_e12) AS BIGINT) AS sx,
       |        CAST(SUM(__y_e12) AS BIGINT) AS sy,
       |        CAST(SUM(__xx_e12) AS BIGINT) AS sxx,
       |        CAST(SUM(__xy_e12) AS BIGINT) AS sxy FROM pt)
       |SELECT CAST(n AS BIGINT) AS n_points, heaps_beta_e6, log_k_e6
       |FROM ($t41OutChain)""".stripMargin
  }

  /** c05: entity-resolution capstone — the full MDM pipeline as one
    * composed query: token blocking (d15's candidate generation) →
    * native Jaro–Winkler match at 0.92 ([[graft.functions.JaroWinklerSimilarity]],
    * kernel parity vs DuckDB proven by d15's brute-force oracle) →
    * transitive closure into entity clusters
    * ([[graft.graph.GraphOps.connectedComponents]], the g02 loop as a
    * library piece) → survivorship (oldest-record rule: the min-key
    * member donates the canonical name) → and the step that makes ER
    * USEFUL: re-keying the fact table to entities (lineitem activity
    * rolled up per resolved entity, decimal-exact in compute, BIGINT
    * e-2 at the boundary).
    *
    * The oracle replays the SAME name-level token blocking with
    * DuckDB's own `jaro_winkler_similarity` and unrolls the closure
    * [[ErRounds]] rounds (g02's MATERIALIZED-CTE pattern), so the
    * hash match proves (a) the two engines agree on every blocked
    * candidate's 0.92 decision, (b) the distributed min-label loop
    * reaches the same fixpoint as the sequential unroll, and (c) the
    * survivorship + rollup arithmetic agrees exactly. Blocking
    * losslessness (blocked ≡ brute force) moved to a named GraphSpec
    * test over the shipped fixtures — structural parity in the
    * oracle, semantic completeness in the spec. The Spark loop
    * early-exits on convergence; converged rounds are identity, so
    * any unroll ≥ the convergence round matches.
    *
    * Scale shape: matching runs on DISTINCT NAMES, never on rows —
    * records sharing a name are by definition one entity (JW(x,x)=1
    * ≥ any threshold), so the record-level match graph is the
    * name-level match graph with each name's record set substituted
    * in as a clique, and the two closures label identically when
    * each name carries its min record key. The name frame is
    * catalog-small next to the record table (64 distinct names under
    * 20k parts at sf0.1; the same ratio is what makes ER feasible at
    * all — a record-level candidate join would be Σ|name-group|²
    * ≈ all-pairs, measured minutes at sf0.1 vs sub-second here).
    * Blocking is one explode + equi-join on the name frame (never
    * n² — GraphSpec's brute-force fixture test guards completeness,
    * and a DuckDB audit of the driver's sf0.01 confirmed all eight
    * brute-force 0.92-pairs share a token); closure is the capped
    * keyed-aggregate loop over name keys; the label map broadcasts
    * back onto records, and survivorship + rollup are one keyed
    * aggregate each plus a broadcast-sized name join.
    */
  /** c05's name-level match graph — factored so GraphSpec can assert
    * the closure converges within [[ErRounds]] on each shipped
    * fixture (the oracle unrolls EXACTLY ErRounds; a future fixture
    * with a longer min-label chain must fail a named test, not the
    * hash compare).
    */
  private[graft] def c05NamePairs(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.JaroWinklerSimilarity
    val nm = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
    // each distinct name carries its min record key, so a name-level
    // min-label equals the record-level min-label of the lifted clique
    val names = nm.groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("name_key"))
    val tok = names.select(col("name_key"), col("p_name"),
      explode(split(col("p_name"), " ")).as("tok"))
    tok.as("a").join(tok.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.name_key") < col("b.name_key"))
      .select(col("a.name_key").as("src"), col("b.name_key").as("dst"),
        col("a.p_name").as("__na"), col("b.p_name").as("__nb"))
      .distinct() // one JW evaluation per candidate pair, not per shared token
      // threshold on the e-6-quantized score, NOT the raw double: the
      // decision boundary becomes 0.9199995, which no exact JW rational
      // (denominator 30·l1·l2·m) can equal — the nearest attainable
      // score is ≥ 1/(2·30·l1·l2·m·10⁶) away, orders of magnitude above
      // a few-ulp kernel difference, so engines can never disagree on
      // membership (round 9: raw `>= 0.92` flipped on the driver's
      // data; margin is property-tested in JwProperties)
      .where(floor(JaroWinklerSimilarity(col("__na"), col("__nb")) *
        lit(1000000.0) + lit(0.5)) >= lit(920000L))
      .select(col("src"), col("dst"))
  }

  val c05_entity_resolution: Q = (s, dir) => {
    import org.apache.spark.sql.types.DecimalType
    val dec2 = DecimalType(18, 2)
    val nm = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
    val names = nm.groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("name_key"))
    val pairs = c05NamePairs(s, dir)
    val cc = graft.graph.GraphOps.connectedComponents(pairs, ErRounds)
    // names with no cross-name match keep their own key (cc only
    // labels matched nodes); records inherit their name's entity
    val nameLabel = names
      .join(cc, col("name_key") === col("node"), "left")
      .select(col("p_name"),
        coalesce(col("label"), col("name_key")).as("entity_id"))
    val labels = nm.join(broadcast(nameLabel), Seq("p_name"))
      .select(col("p_partkey").as("node"), col("entity_id"))
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey").as("node"), col("l_quantity"))
    val rolled = labels.join(li, Seq("node"), "left")
      .groupBy(col("entity_id"))
      .agg(
        countDistinct(col("node")).as("n_members"),
        count(col("l_quantity")).as("n_lineitems"),
        // BIGINT e-2 units, not DECIMAL: the round-11 probes falsified
        // "DECIMAL(18,2) is safe" at the type level (h01 red with a
        // >2^53-unscaled extreme; no other green query emits decimal at
        // its boundary at all). Policy since r11: NO DECIMAL at any
        // result boundary. The sum itself stays exact DECIMAL —
        // l_quantity carries <=2 decimals, so x100 is an integer count
        // of e-2 units far below 2^63 even at 1000x sf0.1 — and only
        // the final integer crosses the boundary (the q125 recipe).
        coalesce((sum(col("l_quantity").cast(dec2)) * lit(100))
          .cast("long"), lit(0L)).as("total_qty_e2"))
    rolled.join(
        nm.select(col("p_partkey").as("entity_id"),
          col("p_name").as("canonical_name")),
        "entity_id")
      .select(col("entity_id"), col("n_members"), col("canonical_name"),
        col("n_lineitems"), col("total_qty_e2"))
  }

  private[graft] val ErRounds = 8

  /** The oracle mirrors the Spark plan's NAME-LEVEL shape since round
    * 12: candidates come from the same shared-token blocking (not a
    * record-level brute-force cross join), the min-label closure runs
    * over name keys, and labels lift to records through the name map.
    * Structural parity removes the candidate-set seam from the hash
    * compare entirely; what keeps the oracle honest is the named
    * GraphSpec test proving blocked ≡ brute-force on every shipped
    * fixture (and a round-12 DuckDB audit of the driver's own sf0.01:
    * all 8 brute-force 0.92-pairs share a token — blocking lossless).
    * Round 13 (advisor): the oracle additionally probes losslessness
    * on WHATEVER corpus the compare runs — `resid` brute-forces the
    * catalog-small distinct-NAME pairs (|names|², 64 names at sf0.1;
    * never the record level) and, if any ≥0.92 pair shares no token,
    * injects a sentinel row the Spark side never emits, turning lossy
    * blocking into a visible hash red instead of a silent agreement.
    * Boundary: BIGINT e-2 (no DECIMAL leaves any result boundary).
    */
  val c05_sql: String = {
    val rounds = (1 to ErRounds).map { i =>
      s"""lab$i AS MATERIALIZED (SELECT l.node,
         |  LEAST(l.label, COALESCE(MIN(ln.label), l.label)) AS label
         |  FROM lab${i - 1} l
         |  LEFT JOIN erbidir e ON e.dst = l.node
         |  LEFT JOIN lab${i - 1} ln ON ln.node = e.src
         |  GROUP BY l.node, l.label)""".stripMargin
    }.mkString(",\n")
    s"""WITH nm AS MATERIALIZED (SELECT p_partkey, p_name FROM part),
       |names AS MATERIALIZED (SELECT p_name,
       |    MIN(p_partkey) AS name_key FROM nm GROUP BY 1),
       |tok AS MATERIALIZED (SELECT name_key, p_name,
       |    unnest(string_split(p_name, ' ')) AS tok FROM names),
       |cand AS MATERIALIZED (SELECT DISTINCT a.name_key AS src,
       |    b.name_key AS dst, a.p_name AS na, b.p_name AS nb
       |  FROM tok a JOIN tok b
       |    ON a.tok = b.tok AND a.name_key < b.name_key),
       |pr AS MATERIALIZED (SELECT src, dst FROM cand
       |  WHERE FLOOR(jaro_winkler_similarity(na, nb)
       |              * 1000000.0 + 0.5) >= 920000),
       |erbidir AS MATERIALIZED (SELECT src, dst FROM pr
       |  UNION ALL SELECT dst AS src, src AS dst FROM pr),
       |lab0 AS (SELECT name_key AS node, name_key AS label FROM names),
       |$rounds,
       |reclab AS MATERIALIZED (SELECT nm.p_partkey,
       |    la.label AS entity_id
       |  FROM nm JOIN names n ON n.p_name = nm.p_name
       |  JOIN lab$ErRounds la ON la.node = n.name_key),
       |rolled AS (SELECT la.entity_id,
       |    COUNT(DISTINCT la.p_partkey) AS n_members,
       |    COUNT(li.l_quantity) AS n_lineitems,
       |    CAST(COALESCE(
       |        SUM(CAST(li.l_quantity AS DECIMAL(18,2))) * 100, 0)
       |      AS BIGINT) AS total_qty_e2
       |  FROM reclab la
       |  LEFT JOIN lineitem li ON li.l_partkey = la.p_partkey
       |  GROUP BY 1),
       |resid AS (SELECT COUNT(*) AS n FROM names a, names b
       |  WHERE a.name_key < b.name_key
       |    AND FLOOR(jaro_winkler_similarity(a.p_name, b.p_name)
       |              * 1000000.0 + 0.5) >= 920000
       |    AND len(list_intersect(string_split(a.p_name, ' '),
       |                           string_split(b.p_name, ' '))) = 0)
       |SELECT r.entity_id, r.n_members, n.p_name AS canonical_name,
       |  r.n_lineitems, r.total_qty_e2
       |FROM rolled r JOIN nm n ON n.p_partkey = r.entity_id
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT), resid.n,
       |  'LOSSY BLOCKING: >=0.92 brute-force pair outside candidate set',
       |  CAST(0 AS BIGINT), CAST(0 AS BIGINT)
       |FROM resid WHERE resid.n > 0""".stripMargin
  }

  /** c06's release budget: fixed-size release, independent of corpus
    * growth (the budget is what a training run consumes, not a corpus
    * fraction). Below every fixture's deduped size, so Hamilton quotas
    * never exceed their source's candidate count in practice — and the
    * LEAST() clamp makes even that case well-defined.
    */
  private[graft] val C06Budget = 200L

  /** c06: training-mix release capstone — the end-to-end "cut a
    * training batch" pipeline, chaining four individually-green
    * operators under ONE oracle for the first time:
    * exact dedup (d01's min-id survivorship) → integer quota
    * allocation over the DEDUPED per-source counts ([[hamiltonQuotas]],
    * t36 — dedup first, or the quota shares are inflated by dup mass)
    * → deterministic per-source sampling (each source's `final_quota`
    * smallest `hash64(doc_id)` — the t28/q73 hash-order rule: a pure
    * function of the data, no RNG, bit-replayable) → sequence packing
    * of the selected mix into 2048-token windows
    * ([[graft.operators.Pack.concatChunk]], t07) → a per-source release
    * manifest with the q124 checksum discipline
    * (`bit_xor(hash64(doc_id:text))`, duplicate-sensitive, BIGINT).
    *
    * Scale shape: the corpus is touched exactly ONCE — a narrow
    * projection computing per-doc token counts and hashes — and the
    * dedup fold shuffles on the 60-bit text HASH (8-byte key, never
    * document bodies); `localCheckpoint` then pins a compact
    * (id, source, 3×BIGINT) survivor frame and text never travels
    * again. The fold is ASSOCIATIVE (min-by of a union = min-by of
    * the min-bys), so the streaming twin
    * ([[graft.streaming.StreamingIngest.releaseStream]]) maintains
    * the survivor set per micro-batch in O(Δ) and derives the SAME
    * release at read time through [[releaseFromSurvivors]].
    * Selection avoids the per-source sort funnel: the
    * quota-th smallest hash per source comes from the KMV fold
    * ([[graft.functions.KmvSketch.kmvHashes]] — bounded ≤budget state,
    * map-side combined, mergeable min-k), broadcast back as a
    * threshold filter. Packing windows run over ≤quota rows per
    * source — bounded by construction. In production the deduped
    * selection would also be WRITTEN as a shard export (q124's job);
    * the manifest here recomputes it to keep the query self-contained.
    * Hash-distinctness caveat: threshold selection assumes no 60-bit
    * md5-prefix collision among a source's doc_ids (P ≈ n²/2⁶¹; the
    * q86 KMV discipline makes the same assumption).
    */
  /** The min-doc-id survivor fold over compact per-doc rows keyed by
    * the 60-bit text hash — ASSOCIATIVE (min-by of a union is min-by
    * of the min-bys), which is what lets the streaming twin maintain
    * the survivor set by folding per-batch partials
    * ([[graft.streaming.StreamingIngest.releaseStream]]) instead of
    * rescanning history. Keying dedup on `hash64(text)` instead of the
    * raw text also means the dedup SHUFFLE carries an 8-byte key, not
    * document bodies — the right exchange at 100 TB (collision odds
    * are the documented q86 KMV class, ≈ n²/2⁶¹).
    */
  private[graft] def c06FoldSurvivors(rows: DataFrame): DataFrame =
    rows.groupBy(col("__htext"))
      .agg(min_by(struct(col("doc_id"), col("source"), col("n_tokens"),
        col("__ck"), col("__h")), col("doc_id")).as("__s"))
      .select(col("__htext"), col("__s.doc_id"), col("__s.source"),
        col("__s.n_tokens"), col("__s.__ck"), col("__s.__h"))

  /** One batch's survivor partial: the corpus touched ONCE — a narrow
    * projection computing per-doc token counts and hashes — then the
    * associative fold. Raw text never leaves this function.
    */
  private[graft] def c06SurvivorPartial(docs: DataFrame): DataFrame = {
    import graft.functions.KmvSketch
    c06FoldSurvivors(docs.select(
      KmvSketch.hash64(col("text")).as("__htext"),
      col("doc_id"), col("source"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
      KmvSketch.hash64(concat_ws(":", col("doc_id"), col("text")))
        .as("__ck"),
      KmvSketch.hash64(col("doc_id")).as("__h")))
  }

  /** c06's quota-capped selection over a survivor frame — factored
    * out of [[releaseFromSurvivors]] so t44's best-fit-decreasing
    * packing report runs over the SAME selected mix (one statement of
    * the dedup→quota→threshold rule, two consumers). Returns
    * (selected rows, quotas frame); `quotas` is localCheckpoint-pinned
    * so both consumers reuse it without recompute.
    */
  private[graft] def c06Selection(
      survivors: DataFrame, budget: Long): (DataFrame, DataFrame) = {
    import graft.functions.KmvSketch
    val dd = survivors
      .localCheckpoint(true) // quota count + threshold fold + selection
    val quotas = hamiltonQuotas(
      dd.groupBy(col("source")).agg(count(lit(1)).as("n_docs")),
      budget = budget)
      .select(col("source"), col("n_docs"), col("final_quota"))
      .localCheckpoint(true) // threshold pick AND the manifest join
    val thrs = dd.groupBy(col("source"))
      .agg(KmvSketch.kmvHashes(col("__h"), budget.toInt).as("__hs"))
      .join(broadcast(quotas), Seq("source"))
      .select(col("source"),
        when(col("final_quota") <= 0, lit(-1L)) // 60-bit hashes are ≥ 0
          // clamp by the sketch's DISTINCT size too: under a 60-bit
          // collision within a source the KMV array is shorter than
          // least(quota, n_docs), and an out-of-range element_at would
          // NULL the threshold and silently drop the source's ENTIRE
          // selection. With the clamp, a collision merely admits the
          // collided duplicates past the quota — graceful, and the
          // oracle states the identical distinct-rank rule.
          .otherwise(element_at(col("__hs"),
            least(col("final_quota"), col("n_docs"), size(col("__hs")))
              .cast("int")))
          .as("__thr"))
    val sel = dd.join(broadcast(thrs), Seq("source"))
      .where(col("__h") <= col("__thr"))
    (sel, quotas)
  }

  /** The release tail over a survivor frame (columns doc_id, source,
    * n_tokens, __ck, __h) — shared verbatim by the batch query and the
    * streaming monitor's read side, so the stream-maintained release
    * EQUALS the batch one on the union of batches (spec-asserted).
    * Round 13: the manifest additionally reports the packing-policy
    * comparison — `n_bins_bfd`/`waste_bfd` from the no-split
    * best-fit-decreasing layout ([[graft.operators.Pack.bfdBinLoads]];
    * the per-source fold is bounded by the quota, so the collect_list
    * is ≤ budget rows by construction) against `waste_greedy`, the
    * concat-and-chunk stream's last-pack tail
    * (`ceil(sum/2048)·2048 − sum`). BFD pays waste to keep documents
    * unsplit; greedy pays splits to keep waste at one tail — the
    * manifest now prices that trade per source.
    */
  def releaseFromSurvivors(
      survivors: DataFrame, budget: Long = C06Budget): DataFrame = {
    val (sel, quotas) = c06Selection(survivors, budget)
    val packed = graft.operators.Pack.concatChunk(
      sel, Seq("source"), "doc_id", "n_tokens", capacity = 2048L)
    val mani = packed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_selected"),
        sum(col("n_tokens")).as("sum_tokens"),
        countDistinct(col("pack_id")).as("n_packs"),
        expr("bit_xor(__ck)").as("checksum"),
        // bounded by construction: ≤ final_quota ≤ budget weights
        collect_list(col("n_tokens")).as("__ws"))
      .withColumn("__loads",
        graft.operators.Pack.bfdBinLoads(col("__ws"), capacity = 2048L))
      .withColumn("n_bins_bfd", size(col("__loads")).cast("long"))
      .withColumn("waste_bfd",
        graft.operators.Pack.binWaste(col("__loads"), capacity = 2048L))
      .withColumn("waste_greedy",
        expr("((sum_tokens + 2047L) div 2048L) * 2048L") - col("sum_tokens"))
    quotas.join(mani, Seq("source"), "left")
      .select(col("source"),
        col("n_docs").as("n_candidates"),
        col("final_quota"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("sum_tokens"), lit(0L)).as("sum_tokens"),
        coalesce(col("n_packs"), lit(0L)).as("n_packs"),
        coalesce(col("checksum"), lit(0L)).as("checksum"),
        coalesce(col("n_bins_bfd"), lit(0L)).as("n_bins_bfd"),
        coalesce(col("waste_bfd"), lit(0L)).as("waste_bfd"),
        coalesce(col("waste_greedy"), lit(0L)).as("waste_greedy"))
  }

  val c06_training_mix_release: Q = (s, dir) =>
    releaseFromSurvivors(
      c06SurvivorPartial(t(s, dir, "documents").transform(spreadScan)
        .select(col("doc_id"), col("source"), col("text")))
        .drop("__htext"))

  /** c09: the QUALITY-GATED training-mix release — c06 with the CCNet
    * filter in front: documents in the perplexity TAIL tertile
    * ([[tertileBuckets]] over [[t29PerDoc]]'s score — t49's exact
    * integer boundaries) are dropped BEFORE dedup, quota and packing,
    * the filter-then-dedup order CCNet itself runs. Everything
    * downstream is c06 verbatim ([[c06SurvivorPartial]] →
    * [[releaseFromSurvivors]] — one definition, two releases), so the
    * manifest diff c06-vs-c09 IS the cost of the quality gate per
    * source: candidates lost, quota shifts (Hamilton re-apportions
    * over the kept counts), checksum changes. The oracle splices the
    * three shared CTE blocks (t29 scoring, the c06 selection over the
    * gated relation, the release tail) — a textual fork in any of
    * them could silently diverge a release from its audit.
    *
    * Scale shape: the gate adds one equi-join of the corpus against
    * the kept-id frame (8-byte keys) on top of c06's
    * touch-corpus-once chain; the scoring scan is t29's (shared
    * shuffle), the tertile fold is distinct-score-bounded.
    *
    * Zero-token documents: a document with no tokens never enters
    * t29's per-doc score frame (there is nothing to score), so the
    * inner keep-join drops it — it does not survive the gate even
    * though it is not tail-tertile. This is DELIBERATE (an empty
    * document has no place in a training mix, and both engines agree
    * because the oracle's t29 CTEs share the same definition), but it
    * means the c06-vs-c09 candidate diff counts unscorable documents
    * alongside the perplexity tail; an audit that needs the two
    * classes separated should count empty docs first.
    */
  /** c09's gate + release over an EXPLICIT corpus frame — ONE
    * definition shared by the batch query and the streaming read side
    * ([[graft.streaming.StreamingIngest.currentQualityRelease]]): the
    * tertile boundary and every doc's xent are CORPUS-RELATIVE, and
    * the gate runs before dedup, so no incremental fold of the gated
    * survivor set can be exact under growth — the read-time
    * derivation through this function is the only formulation whose
    * streamed answer equals the batch answer on the union of batches.
    */
  private[graft] def qualityReleaseOf(docs: DataFrame,
      budget: Long = C06Budget): DataFrame = {
    val keep = tertileBuckets(t29PerDocOf(docs))
      .where(col("bucket") =!= "tail")
      .select(col("doc_id"))
    releaseFromSurvivors(
      c06SurvivorPartial(docs
        .join(keep, "doc_id")
        .select(col("doc_id"), col("source"), col("text")))
        .drop("__htext"), budget)
  }

  val c09_quality_release: Q = (s, dir) =>
    qualityReleaseOf(t(s, dir, "documents").transform(spreadScan))

  def c09_sql: String =
    s"""WITH RECURSIVE
       |$t29SqlCtes,
       |dist AS (SELECT xent_e6 AS x, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM f GROUP BY 1),
       |cum AS (SELECT x, CAST(SUM(c) OVER (ORDER BY x
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cc FROM dist),
       |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM dist),
       |th AS (SELECT
       |    MIN(CASE WHEN cc * 3 >= 2 * nn THEN x END) AS t2
       |  FROM cum CROSS JOIN nn),
       |keep AS (SELECT doc_id FROM f CROSS JOIN th WHERE xent_e6 <= t2),
       |docs9 AS (SELECT d9.* FROM documents d9 JOIN keep USING (doc_id)),
       |${c06SelectionSqlCtes(C06Budget, "docs9")},
       |$releaseTailSql""".stripMargin

  // ------------------------------------------------ c10: domain gate

  /** c10 gate policy — integer-percent thresholds, source constants
    * shared by the Spark plan and the generated SQL oracle (the q143
    * one-table discipline). Chosen against the FineWeb/RefinedWeb
    * playbook: a source is DROPPED when it is mostly perplexity tail
    * (low-quality mass the c09 doc-gate would mostly delete anyway —
    * at that point the source itself is the problem) or when most of
    * its content fingerprints also appear in another source (a mirror
    * — keeping it double-counts whatever it mirrors); it is FLAGGED
    * (kept, but marked for human review) when its mixed-language,
    * high-stopword or tail shares are elevated without crossing the
    * drop line.
    */
  private[graft] val C10TailDropPct = 50L
  private[graft] val C10OverlapDropPct = 80L
  private[graft] val C10TailFlagPct = 40L
  private[graft] val C10MixedFlagPct = 60L
  private[graft] val C10HighStopFlagPct = 65L

  /** c10: the DOMAIN-level curation gate (FineWeb shape) — the c09
    * composition one level up: c09 gates DOCUMENTS by perplexity,
    * c10 gates SOURCES by a roll-up of the per-document quality
    * signals the engine already computes, because at corpus scale
    * curation decisions are made per domain/source first (blocklist)
    * and per document second. Four signals per source, each reusing
    * an existing query's exact definition (one definition, two
    * consumers — the t29/c09 discipline):
    *
    *   - perplexity-tail share: t49's exact tertile label over t29's
    *     integer xent; `tail_pct` over the SCORED docs (zero-token
    *     docs are unscorable and counted in `n_docs` only — the c09
    *     empty-doc note, surfaced here as n_docs − n_scored).
    *   - high-stopword share: t38's distillation TARGET (the exact
    *     integer rule 100·n_stop > 6·n_tok), not the fitted model —
    *     the gate wants the rule's verdict, not an approximation of
    *     it, and the rule is corpus-independent.
    *   - mixed-language share: t31's per-segment language-ID verdict.
    *   - cross-source overlap: d12's fingerprint frame re-keyed per
    *     source — the share of a source's distinct fingerprints that
    *     also appear in ANY other source.
    *
    * Verdict: drop / flag / keep by the [[C10TailDropPct]] family of
    * integer-percent thresholds — every percentage is an exact
    * integer division (100·n div max(d,1)), so no float boundary can
    * flip a verdict cross-engine. The manifest carries the raw
    * counts AND the percentages, so the compare certifies the
    * signals, not just the verdicts.
    *
    * Scale shape: each signal is one corpus scan collapsing straight
    * into a per-source (catalog-bounded) aggregate — tail reuses
    * t29's shared-shuffle scoring scan, the stopword rule and the
    * fingerprints are one projection each, t31 is one explode +
    * keyed agg; the roll-up joins are per-doc equi-joins (8-byte
    * keys) followed by ONE map-side-combined groupBy(source), and
    * the verdict is a projection over the catalog-sized frame.
    * Nothing driver-side, nothing all-pairs.
    */
  private[graft] def c10SourceSignals(s: SparkSession, dir: String): DataFrame =
    c10SignalsOf(t(s, dir, "documents").transform(spreadScan))

  /** The c10 signal roll-up over an EXPLICIT corpus frame — shared by
    * the batch query and the streaming read side
    * ([[graft.streaming.StreamingIngest.currentDomainGate]], which
    * derives it from [[graft.streaming.StreamingIngest.qualityReleaseStream]]'s
    * doc store with zero new state).
    */
  private[graft] def c10SignalsOf(docs: DataFrame): DataFrame = {
    // the tail-share and overlap signals both run eager checkpoint
    // jobs at CONSTRUCTION time (tertileBuckets pins the scored frame
    // and its distribution; the fingerprint frame feeds two
    // consumers) — build them concurrently (guide §2.6, the c04/c11
    // recipe) so those independent corpus passes overlap instead of
    // serializing on the driver; the stop/mixed signals are lazy and
    // evaluate inside the final joined job as before
    val Seq(tail, fps) = concurrently[DataFrame](
      docs.sparkSession, "c10 signal scans",
      () => tertileBuckets(t29PerDocOf(docs))
        .select(col("doc_id"), (col("bucket") === "tail").as("__tail")),
      () => docs
        .select(col("source"),
          TextAnalysis.fingerprint(col("text"), k = 8).as("__fp"))
        .distinct()
        .localCheckpoint(true)) // the share fold AND the per-source agg
    val stop = docs
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        stopRuleLabel(col("__toks")).as("__hs"))
    val mixed = t31Of(docs)
      .select(col("doc_id"), col("is_mixed"))
    val shared = fps.groupBy(col("__fp"))
      .agg(count_distinct(col("source")).as("__ns"))
    val ov = fps.join(shared, Seq("__fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_fingerprints"),
        sum(when(col("__ns") >= 2, 1L).otherwise(0L)).as("n_shared_fp"))
    docs.select(col("doc_id"), col("source"))
      .join(tail, Seq("doc_id"), "left") // unscorable docs: no verdict
      .join(stop, Seq("doc_id"))
      .join(mixed, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__tail").isNotNull, 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("__tail") === true, 1L).otherwise(0L)).as("n_tail"),
        sum(when(col("__hs"), 1L).otherwise(0L)).as("n_highstop"),
        sum(when(col("is_mixed"), 1L).otherwise(0L)).as("n_mixed"))
      .join(ov, Seq("source"))
  }

  /** The verdict projection over a c10 signal frame — shared by the
    * manifest query and [[c10KeptSources]].
    */
  private[graft] def c10Verdicts(sig: DataFrame): DataFrame = {
    val tailPct = expr("100L * n_tail div greatest(n_scored, 1L)")
    val hsPct = expr("100L * n_highstop div greatest(n_docs, 1L)")
    val mixPct = expr("100L * n_mixed div greatest(n_docs, 1L)")
    val ovPct = expr("100L * n_shared_fp div greatest(n_fingerprints, 1L)")
    sig
      .withColumn("tail_pct", tailPct)
      .withColumn("highstop_pct", hsPct)
      .withColumn("mixed_pct", mixPct)
      .withColumn("overlap_pct", ovPct)
      .withColumn("verdict",
        when(col("tail_pct") >= C10TailDropPct ||
          col("overlap_pct") >= C10OverlapDropPct, "drop")
          .when(col("tail_pct") >= C10TailFlagPct ||
            col("mixed_pct") >= C10MixedFlagPct ||
            col("highstop_pct") >= C10HighStopFlagPct, "flag")
          .otherwise("keep"))
  }

  /** The full c10 manifest over an explicit corpus frame — shared by
    * the batch query and the streaming read side.
    */
  private[graft] def c10ManifestOf(docs: DataFrame): DataFrame =
    c10Verdicts(c10SignalsOf(docs))
      .select(col("source"), col("n_docs"), col("n_scored"),
        col("n_tail"), col("tail_pct"), col("n_highstop"),
        col("highstop_pct"), col("n_mixed"), col("mixed_pct"),
        col("n_fingerprints"), col("n_shared_fp"), col("overlap_pct"),
        col("verdict"))

  val c10_domain_gate: Q = (s, dir) =>
    c10ManifestOf(t(s, dir, "documents").transform(spreadScan))

  /** Sources surviving the gate (keep + flag — flag is a review
    * marker, not a removal; only drop removes).
    */
  private[graft] def c10KeptSources(s: SparkSession, dir: String): DataFrame =
    c10Verdicts(c10SourceSignals(s, dir))
      .where(col("verdict") =!= "drop")
      .select(col("source"))

  /** The c10-gated release: source gate → c09's document gate → c06's
    * dedup/quota/pack chain — the full FineWeb order (domain
    * blocklist first, per-document quality second, dedup third), each
    * stage the existing definition. Used by the composition spec; the
    * registered c10 query is the manifest (the gate IS the new
    * operator — the release downstream is c09's, re-derived).
    */
  private[graft] def c10GatedRelease(s: SparkSession, dir: String): DataFrame = {
    val keepDocs = tertileBuckets(t29PerDoc(s, dir))
      .where(col("bucket") =!= "tail")
      .select(col("doc_id"))
    releaseFromSurvivors(
      c06SurvivorPartial(t(s, dir, "documents").transform(spreadScan)
        .join(broadcast(c10KeptSources(s, dir)), "source")
        .join(keepDocs, "doc_id")
        .select(col("doc_id"), col("source"), col("text")))
        .drop("__htext"))
  }

  def c10_sql: String = {
    // t31's segment CTEs renamed (l-prefixed) to coexist with t29's
    val segToks =
      "list_filter(string_split_regex(lower(seg), '\\s+'), x -> x <> '')"
    val scoreCols = TextAnalysis.langMarkers.map { case (l, ms) =>
      s"len(list_filter(ltoks, x -> list_contains(${sqlList(ms)}, x))) AS s_$l"
    }.mkString(",\n  ")
    val langs = TextAnalysis.langMarkers.map(_._1)
    val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs
      .map(l => s"WHEN s_$l = best AND best > 0 THEN '$l'").mkString("\n  ")
    s"""WITH $t29SqlCtes,
       |dist AS (SELECT xent_e6 AS x, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM f GROUP BY 1),
       |cum AS (SELECT x, CAST(SUM(c) OVER (ORDER BY x
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS cc FROM dist),
       |nn AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM dist),
       |th AS (SELECT
       |    MIN(CASE WHEN cc * 3 >= 2 * nn THEN x END) AS t2
       |  FROM cum CROSS JOIN nn),
       |tl AS (SELECT doc_id, (xent_e6 > t2) AS is_tail
       |  FROM f CROSS JOIN th),
       |tk AS (SELECT doc_id, source, text, $toksSql AS toks
       |  FROM documents),
       |hs AS (SELECT doc_id,
       |    (CAST(len(list_filter(toks, x -> x IN ($stopRuleInSql)))
       |       AS BIGINT) * 100 > CAST(len(toks) AS BIGINT) * 6) AS hs
       |  FROM tk),
       |ld AS (SELECT doc_id, text,
       |    GREATEST((length(text) + 199) // 200, 1) AS nseg FROM documents),
       |lg AS (SELECT doc_id, text,
       |    unnest(generate_series(0, nseg - 1)) AS i FROM ld),
       |lsg AS (SELECT doc_id,
       |    substr(text, CAST(i * 200 + 1 AS INT), 200) AS seg FROM lg),
       |lt AS (SELECT doc_id, seg, $segToks AS ltoks FROM lsg),
       |ls AS (SELECT doc_id,
       |  $scoreCols,
       |  len(regexp_extract_all(seg, '[\\x{4e00}-\\x{9fff}]')) AS cjk,
       |  length(seg) AS seglen
       | FROM lt),
       |lb AS (SELECT *, $best AS best FROM ls),
       |lp AS (SELECT doc_id,
       |    CASE WHEN cjk > 0 AND cjk * 2 >= seglen THEN 'zh'
       |  $cases
       |  ELSE 'und' END AS lang FROM lb),
       |lm AS (SELECT doc_id, COUNT(DISTINCT lang) > 1 AS is_mixed
       |  FROM lp GROUP BY doc_id),
       |fsh AS (SELECT doc_id, source,
       |  CASE WHEN len(toks) < 8 THEN [array_to_string(toks, ' ')]
       |       ELSE list_transform(generate_series(1, len(toks) - 7),
       |                           i -> array_to_string(toks[i:i+7], ' '))
       |  END AS sh
       | FROM tk),
       |fpd AS (SELECT DISTINCT source,
       |    list_min(list_transform(sh, x -> md5(x))) AS fp
       |  FROM fsh),
       |shr AS (SELECT fp, COUNT(DISTINCT source) AS ns
       |  FROM fpd GROUP BY fp),
       |ov AS (SELECT source,
       |    CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
       |    CAST(SUM(CASE WHEN ns >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_shared_fp
       |  FROM fpd JOIN shr USING (fp) GROUP BY source),
       |roll AS (SELECT d.source,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(CASE WHEN tl.is_tail IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_scored,
       |    CAST(SUM(CASE WHEN tl.is_tail THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_tail,
       |    CAST(SUM(CASE WHEN hs.hs THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_highstop,
       |    CAST(SUM(CASE WHEN lm.is_mixed THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_mixed
       |  FROM documents d
       |  LEFT JOIN tl USING (doc_id)
       |  JOIN hs USING (doc_id)
       |  JOIN lm USING (doc_id)
       |  GROUP BY 1),
       |sig AS (SELECT roll.*, ov.n_fingerprints, ov.n_shared_fp,
       |    100 * n_tail // GREATEST(n_scored, 1) AS tail_pct,
       |    100 * n_highstop // GREATEST(n_docs, 1) AS highstop_pct,
       |    100 * n_mixed // GREATEST(n_docs, 1) AS mixed_pct,
       |    100 * n_shared_fp // GREATEST(n_fingerprints, 1) AS overlap_pct
       |  FROM roll JOIN ov USING (source))
       |SELECT source, n_docs, n_scored, n_tail, tail_pct, n_highstop,
       |  highstop_pct, n_mixed, mixed_pct, n_fingerprints, n_shared_fp,
       |  overlap_pct,
       |  CASE WHEN tail_pct >= $C10TailDropPct
       |         OR overlap_pct >= $C10OverlapDropPct THEN 'drop'
       |       WHEN tail_pct >= $C10TailFlagPct
       |         OR mixed_pct >= $C10MixedFlagPct
       |         OR highstop_pct >= $C10HighStopFlagPct THEN 'flag'
       |       ELSE 'keep' END AS verdict
       |FROM sig""".stripMargin
  }

  /** ONE statement of c06's dedup → Hamilton-quota → KMV-threshold
    * selection as DuckDB CTEs, ending in `sel(doc_id, source,
    * n_tokens, ck, h)` + `q(source, n_docs, …, final_quota)` — spliced
    * by BOTH the c06 and t44 oracles, exactly as the Spark side shares
    * [[c06Selection]]: a textual fork here could silently diverge the
    * two selections.
    */
  /** Quota + threshold + selection over a PRE-SHAPED `dd(doc_id,
    * source, n_tokens, ck, h)` relation — split out of
    * [[c06SelectionSqlCtes]] so the media release (c11) can splice
    * the identical selection rule over its kept-media frame: one
    * statement of Hamilton + distinct-rank threshold, three consumers
    * (c06/c09 text, c11 media).
    */
  private def selectionFromDdSqlCtes(budget: Long): String =
    s"""s AS (SELECT source, COUNT(*) AS n_docs FROM dd GROUP BY 1),
       |${hamiltonSqlCtes("s", budget = budget)},
       |rk AS (SELECT source, h,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn,
       |    COUNT(*) OVER (PARTITION BY source) AS dcnt
       |  FROM (SELECT DISTINCT source, h FROM dd)),
       |thr AS (SELECT q.source,
       |    COALESCE(MAX(CASE WHEN rk.rn =
       |                   LEAST(q.final_quota, q.n_docs, rk.dcnt)
       |                 THEN rk.h END), -1) AS thr
       |  FROM q LEFT JOIN rk USING (source) GROUP BY q.source),
       |sel AS MATERIALIZED (SELECT dd.* FROM dd JOIN thr USING (source)
       |  WHERE dd.h <= thr.thr)""".stripMargin

  private def c06SelectionSqlCtes(budget: Long,
      docsRel: String = "documents"): String =
    s"""surv AS (SELECT MIN(doc_id) AS doc_id FROM $docsRel
       |  GROUP BY text),
       |dd AS MATERIALIZED (SELECT d.doc_id, d.source,
       |    CAST(len($toksSql) AS BIGINT) AS n_tokens,
       |    ('0x' || substr(md5(d.doc_id::VARCHAR || ':' || d.text), 1, 15))
       |      ::BIGINT AS ck,
       |    ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT AS h
       |  FROM $docsRel d JOIN surv USING (doc_id)),
       |${selectionFromDdSqlCtes(budget)}""".stripMargin

  /** The best-fit-decreasing fold over `sel`'s per-source weights as a
    * DuckDB recursive CTE — the EXACT rule
    * [[graft.operators.Pack.bfdBinLoads]] states in Catalyst
    * higher-order functions: weights descend, bins stay a sorted
    * ascending list, the fitting bins are a prefix of that list, best
    * fit is the prefix's last element, remove-and-reinsert keeps the
    * sort. One row per (source, step); the recursion depth is the
    * per-source selection size, bounded by the quota. Ends in
    * `binfin(source, bins)`.
    */
  private def bfdSqlCtes(cap: Long): String =
    s"""bw AS (SELECT source, n_tokens,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |                       ORDER BY n_tokens DESC, doc_id) AS rn
       |  FROM sel),
       |bfd AS (
       |  SELECT source, 0 AS rn, CAST([] AS BIGINT[]) AS bins
       |  FROM (SELECT DISTINCT source FROM sel)
       |  UNION ALL
       |  SELECT j.source, j.rn,
       |    CASE WHEN j.nf = 0
       |         THEN list_sort(list_append(j.bins, j.w))
       |         ELSE list_sort(list_concat(
       |                list_concat(j.bins[1:j.nf - 1], j.bins[j.nf + 1:]),
       |                [j.bins[j.nf] + j.w])) END AS bins
       |  FROM (
       |    SELECT b.source, b.rn + 1 AS rn, b.bins, w.n_tokens AS w,
       |      len(list_filter(b.bins, x -> x + w.n_tokens <= $cap)) AS nf
       |    FROM bfd b JOIN bw w ON w.source = b.source AND w.rn = b.rn + 1
       |  ) j
       |),
       |binfin AS (SELECT source, bins FROM (
       |  SELECT source, bins,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY rn DESC) AS r
       |  FROM bfd) WHERE r = 1)""".stripMargin

  /** The release tail over `sel` + `q` (pack, BFD comparison,
    * manifest) as DuckDB CTEs plus the final SELECT — ONE statement,
    * spliced by both the c06 and c09 oracles exactly as the Spark
    * side shares [[releaseFromSurvivors]].
    */
  private def releaseTailSql: String =
    s"""o AS (SELECT source, n_tokens, ck,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
       |      ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS start_offset
       |  FROM sel),
       |p AS (SELECT source, n_tokens, ck,
       |    CAST(start_offset // 2048 AS BIGINT) AS pack_id FROM o),
       |${bfdSqlCtes(2048L)},
       |bm AS (SELECT source, CAST(len(bins) AS BIGINT) AS n_bins_bfd,
       |    CAST(list_sum(list_transform(bins,
       |      x -> GREATEST(0, 2048 - x))) AS BIGINT) AS waste_bfd
       |  FROM binfin),
       |m AS (SELECT source, COUNT(*) AS n_selected,
       |    CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       |    CAST(COUNT(DISTINCT pack_id) AS BIGINT) AS n_packs,
       |    bit_xor(ck) AS checksum
       |  FROM p GROUP BY source)
       |SELECT q.source, q.n_docs AS n_candidates, q.final_quota,
       |  CAST(COALESCE(m.n_selected, 0) AS BIGINT) AS n_selected,
       |  CAST(COALESCE(m.sum_tokens, 0) AS BIGINT) AS sum_tokens,
       |  CAST(COALESCE(m.n_packs, 0) AS BIGINT) AS n_packs,
       |  CAST(COALESCE(m.checksum, 0) AS BIGINT) AS checksum,
       |  CAST(COALESCE(b.n_bins_bfd, 0) AS BIGINT) AS n_bins_bfd,
       |  CAST(COALESCE(b.waste_bfd, 0) AS BIGINT) AS waste_bfd,
       |  CAST(COALESCE(((m.sum_tokens + 2047) // 2048) * 2048
       |       - m.sum_tokens, 0) AS BIGINT) AS waste_greedy
       |FROM q LEFT JOIN m USING (source) LEFT JOIN bm b USING (source)""".stripMargin

  val c06_sql: String =
    s"""WITH RECURSIVE
       |${c06SelectionSqlCtes(C06Budget)},
       |$releaseTailSql""".stripMargin

  /** t44: best-fit-decreasing sequence packing — the NO-SPLIT policy
    * t07/c06's concat-and-chunk deliberately isn't: every document
    * lands wholly inside one fixed-capacity bin (an SFT/eval batch
    * can't split a sample across contexts), so the layout pays padding
    * waste instead of document splits. Policy: weights descend, each
    * takes the FULLEST bin it fits ([[graft.operators.Pack.bfdBinLoads]]
    * — deterministic, RNG-free, exact integers). Runs over the SAME
    * quota-capped selection as c06 ([[c06Selection]]), which is what
    * BOUNDS the per-source fold: ≤ final_quota ≤ budget weights per
    * group, so the collect_list state is bounded by construction and
    * the 100 TB shape is many independent bounded groups in parallel.
    * Output prices the policy trade per source — BFD bins/waste vs the
    * greedy concat-chunk stream's single last-pack tail — and
    * `bins_md5` hashes the FULL final bin-load multiset, so the oracle
    * compare certifies every step of the fold, not just the counts.
    * The oracle replays selection through the shared
    * [[c06SelectionSqlCtes]] and the fold through [[bfdSqlCtes]]'s
    * recursive CTE (same descending order, same sorted-prefix rule).
    */
  val t44_bestfit_pack: Q = (s, dir) => {
    val (sel, _) = c06Selection(
      c06SurvivorPartial(t(s, dir, "documents").transform(spreadScan)
        .select(col("doc_id"), col("source"), col("text")))
        .drop("__htext"),
      budget = C06Budget)
    sel.groupBy(col("source"))
      .agg(count(lit(1)).as("n_selected"),
        sum(col("n_tokens")).as("sum_tokens"),
        // bounded by construction: ≤ final_quota ≤ C06Budget weights
        collect_list(col("n_tokens")).as("__ws"))
      .withColumn("__loads",
        graft.operators.Pack.bfdBinLoads(col("__ws"), capacity = 2048L))
      .select(col("source"), col("n_selected"), col("sum_tokens"),
        size(col("__loads")).cast("long").as("n_bins_bfd"),
        graft.operators.Pack.binWaste(col("__loads"), capacity = 2048L)
          .as("waste_bfd"),
        element_at(col("__loads"), size(col("__loads")))
          .as("max_bin_load"),
        md5(array_join(transform(col("__loads"), _.cast("string")), ","))
          .as("bins_md5"),
        expr("(sum_tokens + 2047L) div 2048L").as("n_packs_greedy"),
        (expr("((sum_tokens + 2047L) div 2048L) * 2048L")
          - col("sum_tokens")).as("waste_greedy"))
  }

  val t44_sql: String =
    s"""WITH RECURSIVE
       |${c06SelectionSqlCtes(C06Budget)},
       |${bfdSqlCtes(2048L)},
       |agg AS (SELECT source, COUNT(*) AS n_selected,
       |    CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
       |  FROM sel GROUP BY 1)
       |SELECT a.source, a.n_selected, a.sum_tokens,
       |  CAST(len(f.bins) AS BIGINT) AS n_bins_bfd,
       |  CAST(list_sum(list_transform(f.bins,
       |    x -> GREATEST(0, 2048 - x))) AS BIGINT) AS waste_bfd,
       |  f.bins[len(f.bins)] AS max_bin_load,
       |  md5(array_to_string(f.bins, ',')) AS bins_md5,
       |  CAST((a.sum_tokens + 2047) // 2048 AS BIGINT) AS n_packs_greedy,
       |  CAST(((a.sum_tokens + 2047) // 2048) * 2048 - a.sum_tokens
       |    AS BIGINT) AS waste_greedy
       |FROM agg a JOIN binfin f USING (source)""".stripMargin

  /** t45: deterministic epoch reshuffling — multi-epoch training wants
    * a DIFFERENT data order every epoch without materializing (or even
    * being able to hold) a permutation of the corpus. The standard
    * trick at scale: order/shard epoch e by `hash(doc_id : e)` — a pure
    * function of the data and the epoch number, so any worker can
    * compute its shard independently, re-runs are bit-identical, and
    * no shuffle state persists between epochs. The query reports each
    * epoch's 16-way hash-range shard layout (bucket = top 4 bits of
    * the 60-bit hash): doc/token counts per (epoch, bucket) plus the
    * q124-discipline `bit_xor(hash64(doc_id))` membership checksum —
    * so the oracle certifies WHICH docs land in every shard of every
    * epoch, not just how many. Invariants a spec pins: each epoch's
    * bucket xor folds to the SAME corpus checksum (every epoch is a
    * permutation of the same corpus) while the per-bucket layouts
    * differ between epochs (it actually reshuffles).
    *
    * Scale shape: one corpus scan, an `explode` over the constant
    * epoch list (never a join), one keyed aggregate — the epoch factor
    * multiplies rows by a small constant, exactly like running the
    * epochs themselves.
    */
  /** One batch's (epoch, bucket) layout partial — counts, token sums,
    * and xor membership checksums are all ASSOCIATIVE+COMMUTATIVE, so
    * the streaming twin folds per-batch partials by the same aggregate
    * ([[foldEpochShuffle]]) and stays exact as the corpus grows.
    */
  private[graft] def epochShufflePartial(docs: DataFrame): DataFrame = {
    import graft.functions.KmvSketch
    val epochs = 3L
    docs
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
        KmvSketch.hash64(col("doc_id")).as("__ck"))
      .withColumn("epoch", explode(sequence(lit(0L), lit(epochs - 1L))))
      .withColumn("__h",
        KmvSketch.hash64(concat_ws(":", col("doc_id"), col("epoch"))))
      // 60-bit hash → top 4 bits: 16 equal hash-range buckets
      .withColumn("bucket", expr(s"__h div ${1L << 56}L"))
      .groupBy(col("epoch"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        expr("bit_xor(__ck)").as("checksum"))
  }

  /** Fold of (epoch, bucket) partials — the SAME shape as the partial
    * aggregate (Σ, Σ, xor), shared by the batch query (a no-op fold of
    * one partial) and the streaming monitor's generations.
    */
  def foldEpochShuffle(parts: DataFrame): DataFrame =
    parts.groupBy(col("epoch"), col("bucket"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("sum_tokens")).as("sum_tokens"),
        expr("bit_xor(checksum)").as("checksum"))

  val t45_epoch_shuffle: Q = (s, dir) =>
    epochShufflePartial(t(s, dir, "documents").transform(spreadScan))

  val t45_sql: String =
    s"""WITH d AS (SELECT doc_id,
       |    CAST(len($toksSql) AS BIGINT) AS n_tokens,
       |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS ck
       |  FROM documents),
       |x AS (SELECT d.*, e.epoch FROM d CROSS JOIN
       |  (SELECT unnest(generate_series(0, 2)) AS epoch) e),
       |b AS (SELECT epoch, n_tokens, ck,
       |    CAST((('0x' || substr(md5(doc_id::VARCHAR || ':' ||
       |      epoch::VARCHAR), 1, 15))::BIGINT) // ${1L << 56}
       |      AS BIGINT) AS bucket
       |  FROM x)
       |SELECT CAST(epoch AS BIGINT) AS epoch, bucket,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(bit_xor(ck) AS BIGINT) AS checksum
       |FROM b GROUP BY 1, 2""".stripMargin

  /** c07: SFT/instruction-mix assembly — the SUPERVISED sibling of
    * c06's pre-training mix: role-tagged conversations are assembled
    * from the events stream, rendered through a chat template, packed
    * into fixed contexts, and each sample carries its LOSS-MASK span
    * offsets (the integer [start:end) ranges of the assistant turns
    * inside the packed token stream — what a supervised trainer masks
    * everything else out with).
    *
    * Construction (all deterministic, integer/string boundaries only):
    * a conversation is one user's events in one epoch-week
    * (`unix_micros div 7·86400·10⁶` — pure integer arithmetic both
    * engines replay exactly; a 30-min session gap makes 95% of the
    * fixture's conversations single-turn, so the grouping key is the
    * week); turns order by (ts, event_id); role is a fixed
    * event_type map (signup→system, view/click→user, the rest→
    * assistant); each turn renders as
    * `<|role|> content <|end|>` with content = event_type repeated
    * 1 + (k mod 4) times (k = the digits in props) so turn lengths
    * vary; token counts run through the SAME whitespace tokenizer as
    * every t-operator. Offsets are two stacked integer prefix sums —
    * turn-in-conversation (rel_start) and conversation-in-user-stream
    * ([[graft.operators.Pack.concatChunk]] per user, capacity 2048) —
    * so a loss span is `pack start_offset + rel_start`.
    *
    * Scale shape: one narrow projection over events, two keyed
    * windows ((user, week) then user — both data-scaling keys), one
    * keyed aggregate, one keyed join back for the spans. The
    * collect_list state is ONE conversation's turns — an SFT sample
    * must fit in a context by definition, the same boundedness class
    * as a document's text. `conv_md5` hashes the fully rendered
    * conversation, so the oracle compare certifies the template
    * rendering and turn order, not just the counts; `loss_spans` is
    * the ';'-joined 'start:end' list, certifying every mask offset.
    */
  /** c07's per-event turn extraction — a STATELESS row map (week key,
    * role map, template rendering, token count), factored out so the
    * streaming twin can maintain the turn store per micro-batch while
    * [[sftFromTurns]] assembles conversations at read time. Keeping
    * assembly OUT of this stage is what makes the twin exact under
    * out-of-order arrival: a late turn re-slots into its conversation
    * and every downstream offset moves — which only works if offsets
    * are derived from the turn SET, never carried in state.
    */
  private[graft] def c07TurnFrame(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("props"))
      .withColumn("conv_week", expr("unix_micros(ts) div 604800000000L"))
      .withColumn("role",
        when(col("event_type") === "signup", lit("system"))
          .when(col("event_type").isin("view", "click"), lit("user"))
          .otherwise(lit("assistant")))
      .withColumn("__k",
        coalesce(regexp_extract(col("props"), "([0-9]+)", 1).cast("long"),
          lit(0L)))
      .withColumn("rendered",
        concat(lit("<|"), col("role"), lit("|> "),
          array_join(array_repeat(col("event_type"),
            (lit(1L) + pmod(col("__k"), lit(4L))).cast("int")), " "),
          lit(" <|end|>")))
      .withColumn("n_turn_tokens",
        size(TextAnalysis.tokens(col("rendered"))).cast("long"))
      .select(col("user_id"), col("conv_week"), col("ts"), col("event_id"),
        col("role"), col("rendered"), col("n_turn_tokens"))

  /** The assembly tail over a turn frame — shared verbatim by the
    * batch query and the streaming monitor's read side
    * ([[graft.streaming.StreamingIngest.currentSftAssembly]]), so the
    * stream-maintained assembly EQUALS the batch one on the union of
    * batches, late cross-batch turns included (spec-asserted).
    */
  def sftFromTurns(turns: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val convW = Window
      .partitionBy(col("user_id"), col("conv_week"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = turns.withColumn("rel_start",
      coalesce(sum(col("n_turn_tokens")).over(convW), lit(0L)))
    val convs = offs.groupBy(col("user_id"), col("conv_week"))
      .agg(count(lit(1)).as("n_turns"),
        sum(col("n_turn_tokens")).as("n_tokens"),
        sum(when(col("role") === "assistant", 1L).otherwise(0L))
          .as("n_assistant_turns"),
        sum(when(col("role") === "assistant", col("n_turn_tokens"))
          .otherwise(0L)).as("loss_tokens"),
        // one conversation's turns — context-bounded by definition
        md5(array_join(transform(
          array_sort(collect_list(struct(col("rel_start"), col("rendered")))),
          _.getField("rendered")), " ")).as("conv_md5"))
    val packed = graft.operators.Pack.concatChunk(
      convs, Seq("user_id"), "conv_week", "n_tokens", capacity = 2048L)
    val spans = offs.where(col("role") === "assistant")
      .join(packed.select(col("user_id"), col("conv_week"),
        col("start_offset")), Seq("user_id", "conv_week"))
      .withColumn("abs_start", col("start_offset") + col("rel_start"))
      .withColumn("abs_end", col("abs_start") + col("n_turn_tokens"))
      .groupBy(col("user_id"), col("conv_week"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("abs_start"), col("abs_end")))),
        st => concat(st.getField("abs_start").cast("string"), lit(":"),
          st.getField("abs_end").cast("string"))), ";").as("loss_spans"))
    packed.join(spans, Seq("user_id", "conv_week"), "left")
      .select(col("user_id"), col("conv_week"), col("n_turns"),
        col("n_tokens"), col("n_assistant_turns"), col("loss_tokens"),
        col("pack_id"), col("pack_offset"),
        coalesce(col("loss_spans"), lit("")).as("loss_spans"),
        col("conv_md5"))
  }

  val c07_sft_assembly: Q = (s, dir) =>
    sftFromTurns(c07TurnFrame(t(s, dir, "events")))

  /** The c07 turn-frame CTE prefix ([[c07TurnFrame]]'s dialect half) —
    * ONE statement shared by the c07 and c08 oracles: a drift between
    * the two restatements (role map, template, week key) would make
    * the SFT and preference faces disagree about what a turn IS with
    * no local test failing.
    */
  private val c07TurnSqlCtes: String =
    """e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    event_type, props FROM events),
      |tu AS (SELECT *,
      |    CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS conv_week,
      |    CASE event_type WHEN 'signup' THEN 'system'
      |         WHEN 'view' THEN 'user' WHEN 'click' THEN 'user'
      |         ELSE 'assistant' END AS role,
      |    COALESCE(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT), 0)
      |      AS k
      |  FROM e),
      |r AS (SELECT *,
      |    '<|' || role || '|> ' ||
      |    array_to_string(list_transform(
      |      generate_series(1, CAST(1 + k % 4 AS INT)), x -> event_type),
      |      ' ') || ' <|end|>' AS rendered
      |  FROM tu),
      |tok AS (SELECT *,
      |    CAST(len(list_filter(string_split_regex(lower(rendered), '\s+'),
      |      x -> x <> '')) AS BIGINT) AS n_turn_tokens
      |  FROM r)""".stripMargin

  val c07_sql: String =
    s"""WITH $c07TurnSqlCtes,
      |off AS (SELECT *,
      |    CAST(COALESCE(SUM(n_turn_tokens) OVER (
      |      PARTITION BY user_id, conv_week ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS rel_start
      |  FROM tok),
      |conv AS (SELECT user_id, conv_week,
      |    COUNT(*) AS n_turns,
      |    CAST(SUM(n_turn_tokens) AS BIGINT) AS n_tokens,
      |    CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_assistant_turns,
      |    CAST(SUM(CASE WHEN role = 'assistant' THEN n_turn_tokens
      |                  ELSE 0 END) AS BIGINT) AS loss_tokens,
      |    md5(string_agg(rendered, ' ' ORDER BY rel_start)) AS conv_md5
      |  FROM off GROUP BY 1, 2),
      |pk AS (SELECT *,
      |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY user_id
      |      ORDER BY conv_week
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS start_offset
      |  FROM conv),
      |pp AS (SELECT *, CAST(start_offset // 2048 AS BIGINT) AS pack_id,
      |    CAST(start_offset % 2048 AS BIGINT) AS pack_offset FROM pk),
      |sp AS (SELECT o.user_id, o.conv_week,
      |    string_agg(
      |      (p.start_offset + o.rel_start)::VARCHAR || ':' ||
      |      (p.start_offset + o.rel_start + o.n_turn_tokens)::VARCHAR,
      |      ';' ORDER BY o.rel_start) AS loss_spans
      |  FROM off o JOIN pp p USING (user_id, conv_week)
      |  WHERE o.role = 'assistant' GROUP BY 1, 2)
      |SELECT p.user_id, p.conv_week, p.n_turns, p.n_tokens,
      |  p.n_assistant_turns, p.loss_tokens, p.pack_id, p.pack_offset,
      |  COALESCE(s.loss_spans, '') AS loss_spans, p.conv_md5
      |FROM pp p LEFT JOIN sp s USING (user_id, conv_week)""".stripMargin

  /** c08: preference-pair (DPO/RLHF) assembly — the PREFERENCE face of
    * the training-data release family: c06 cuts the pre-training mix,
    * c07 the supervised turns, c08 the chosen/rejected pairs a
    * preference-optimization run consumes. From the SAME turn frame as
    * c07 ([[c07TurnFrame]] — one definition of what a turn is, three
    * consumers), each prompt group's (user, week) assistant turns are
    * the candidate responses; a deterministic reward scores each
    * candidate (`hash64(rendered) mod 1000` — an opaque, bit-replayable
    * stand-in for a reward model, deliberately NOT length, so the
    * manifest's `len_bias` column measures real length skew instead of
    * restating the scorer); chosen = the reward-ranked first, rejected
    * = the reward-ranked last (one total order read from both ends —
    * ONE window sort, not two), pairs with zero margin are dropped
    * (a DPO loss needs a strict preference), and identical
    * (chosen, rejected) content pairs are deduped globally keeping the
    * smallest (user, week) — the pair-level exact-dedup step of a real
    * preference pipeline. The manifest carries both event ids, both
    * rewards, the margin, both token counts, the length-bias flag, the
    * prompt-context hash, and `pair_md5` over the full renderings — so
    * the oracle compare certifies template rendering, ranking, margin
    * filter, and dedup, not just counts.
    *
    * Scale shape: one window + one unordered count over the
    * data-scaling (user, week) key, one keyed aggregate for the prompt
    * context, equi-joins on the group key, and a high-cardinality
    * `pair_md5` dedup window — no cross join, no driver state; the
    * window state is one prompt group's candidates, context-bounded
    * for the same reason a conversation is.
    */
  /** The PRE-dedup strict-margin pair frame (every independent
    * (user, week) comparison, rendered strings kept) — shared by c08
    * (which dedups identical content pairs for the release) and q150
    * (which must NOT: the Bradley–Terry fit wants every independent
    * comparison event, and the content dedup would collapse the duel
    * matrix to 0/1 counts at any corpus size).
    */
  private[graft] def prefPairsRaw(turns: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.KmvSketch
    val cand = turns.where(col("role") === "assistant")
      .withColumn("reward",
        pmod(KmvSketch.hash64(col("rendered")), lit(1000L)))
    val wOrd = Window.partitionBy(col("user_id"), col("conv_week"))
      .orderBy(col("reward").desc, col("ts").asc, col("event_id").asc)
    val wAll = Window.partitionBy(col("user_id"), col("conv_week"))
    val ranked = cand
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("n_candidates", count(lit(1)).over(wAll))
      .where(col("n_candidates") >= 2L)
      .localCheckpoint(true) // read from both ends: chosen + rejected
    val chosen = ranked.where(col("__rn") === 1)
      .select(col("user_id"), col("conv_week"), col("n_candidates"),
        col("event_id").as("chosen_event_id"),
        col("reward").as("chosen_reward"),
        col("n_turn_tokens").as("chosen_tokens"),
        col("rendered").as("__ch_rend"))
    val rejected = ranked.where(col("__rn") === col("n_candidates"))
      .select(col("user_id"), col("conv_week"),
        col("event_id").as("rejected_event_id"),
        col("reward").as("rejected_reward"),
        col("n_turn_tokens").as("rejected_tokens"),
        col("rendered").as("__rj_rend"))
    val prompts = turns.where(col("role") =!= "assistant")
      .groupBy(col("user_id"), col("conv_week"))
      .agg(
        // one prompt group's turns — context-bounded by definition
        md5(array_join(transform(
          array_sort(collect_list(
            struct(col("ts"), col("event_id"), col("rendered")))),
          _.getField("rendered")), " ")).as("prompt_md5"),
        sum(col("n_turn_tokens")).as("prompt_tokens"))
    chosen
      .join(rejected, Seq("user_id", "conv_week"))
      .join(prompts, Seq("user_id", "conv_week"), "left")
      .where(col("chosen_reward") > col("rejected_reward"))
      .withColumn("pair_md5",
        md5(concat(col("__ch_rend"), lit(" ## "), col("__rj_rend"))))
  }

  private[graft] def prefPairsFromTurns(turns: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = prefPairsRaw(turns)
    val wDup = Window.partitionBy(col("pair_md5"))
      .orderBy(col("user_id").asc, col("conv_week").asc)
    pairs
      .withColumn("__dup_rn", row_number().over(wDup))
      .where(col("__dup_rn") === 1)
      .select(col("user_id"), col("conv_week"), col("n_candidates"),
        col("chosen_event_id"), col("rejected_event_id"),
        col("chosen_reward"), col("rejected_reward"),
        (col("chosen_reward") - col("rejected_reward")).as("margin"),
        col("chosen_tokens"), col("rejected_tokens"),
        (col("chosen_tokens") > col("rejected_tokens")).as("len_bias"),
        coalesce(col("prompt_md5"), md5(lit(""))).as("prompt_md5"),
        coalesce(col("prompt_tokens"), lit(0L)).as("prompt_tokens"),
        col("pair_md5"))
  }

  val c08_preference_pairs: Q = (s, dir) =>
    prefPairsFromTurns(c07TurnFrame(t(s, dir, "events")))

  /** The c08 pair-assembly CTE chain ([[prefPairsRaw]]'s dialect
    * half, PRE-dedup, rendered strings kept in `pair`) — ONE
    * statement shared by the c08 and q150 oracles, the
    * [[c07TurnSqlCtes]] discipline one level up: a drift between the
    * release's and the fit's idea of what a preference pair is would
    * never fail a local test.
    */
  private val c08PairSqlCtes: String =
    s"""cand AS (SELECT user_id, conv_week, ts, event_id, rendered,
      |    n_turn_tokens,
      |    CAST(CAST(('0x' || substr(md5(rendered), 1, 15)) AS BIGINT)
      |      % 1000 AS BIGINT) AS reward
      |  FROM tok WHERE role = 'assistant'),
      |rk AS (SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, conv_week
      |      ORDER BY reward DESC, ts, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id, conv_week)
      |      AS n_candidates
      |  FROM cand),
      |ch AS (SELECT user_id, conv_week, n_candidates,
      |    event_id AS chosen_event_id, reward AS chosen_reward,
      |    n_turn_tokens AS chosen_tokens, rendered AS chosen_rendered
      |  FROM rk WHERE rn = 1 AND n_candidates >= 2),
      |rj AS (SELECT user_id, conv_week,
      |    event_id AS rejected_event_id, reward AS rejected_reward,
      |    n_turn_tokens AS rejected_tokens, rendered AS rejected_rendered
      |  FROM rk WHERE rn = n_candidates AND n_candidates >= 2),
      |pr AS (SELECT user_id, conv_week,
      |    md5(string_agg(rendered, ' ' ORDER BY ts, event_id))
      |      AS prompt_md5,
      |    CAST(SUM(n_turn_tokens) AS BIGINT) AS prompt_tokens
      |  FROM tok WHERE role <> 'assistant' GROUP BY 1, 2),
      |pair AS (SELECT c.user_id, c.conv_week, c.n_candidates,
      |    c.chosen_event_id, j.rejected_event_id,
      |    c.chosen_reward, j.rejected_reward,
      |    CAST(c.chosen_reward - j.rejected_reward AS BIGINT) AS margin,
      |    c.chosen_tokens, j.rejected_tokens,
      |    c.chosen_tokens > j.rejected_tokens AS len_bias,
      |    COALESCE(p.prompt_md5, md5('')) AS prompt_md5,
      |    CAST(COALESCE(p.prompt_tokens, 0) AS BIGINT) AS prompt_tokens,
      |    md5(c.chosen_rendered || ' ## ' || j.rejected_rendered)
      |      AS pair_md5,
      |    c.chosen_rendered, j.rejected_rendered
      |  FROM ch c JOIN rj j USING (user_id, conv_week)
      |  LEFT JOIN pr p USING (user_id, conv_week)
      |  WHERE c.chosen_reward > j.rejected_reward)""".stripMargin

  val c08_sql: String =
    s"""WITH $c07TurnSqlCtes,
      |$c08PairSqlCtes,
      |dd AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY pair_md5
      |    ORDER BY user_id, conv_week) AS dup_rn FROM pair)
      |SELECT user_id, conv_week, n_candidates, chosen_event_id,
      |  rejected_event_id, chosen_reward, rejected_reward, margin,
      |  chosen_tokens, rejected_tokens, len_bias, prompt_md5,
      |  prompt_tokens, pair_md5
      |FROM dd WHERE dup_rn = 1""".stripMargin

  /** q150: Bradley–Terry strength fit over c08's preference pairs —
    * the CONSUMPTION side of the preference ladder (c08 writes the
    * chosen/rejected pairs; q150 reads them back as duel outcomes and
    * asks whether they admit a one-dimensional strength scale): per
    * response template, the fitted strength, its rank, and whether
    * that rank agrees with the raw win rate — the curation signal a
    * DPO run wants BEFORE training (a fit/win-rate disagreement means
    * the pair mix is opponent-unbalanced). Items are the rendered
    * turn templates, an event-type-domain-bounded set (the q141 grid
    * argument: |event types| × 4 repetition classes); duels are the
    * PRE-dedup strict-margin pairs ([[prefPairsRaw]] — the release's
    * content dedup would collapse every duel count to 1 and starve
    * the fit; the fit wants each independent (user, week) comparison,
    * one definition shared with c08 so the two faces cannot drift).
    * The MM iteration ([[graft.analytics.Preference]]) runs a fixed
    * [[BtIters]] rounds in fixed-point BIGINT e-6 with exact
    * max-normalization — the g01/g10 recurrence discipline — and the
    * oracle unrolls the identical rounds, so the compare certifies
    * every intermediate division, not just the final ranking. Because
    * c08's reward is a deterministic function of the rendered
    * content, the duel data is perfectly separable (each item pair
    * always resolves the same way); the +1 smoothing keeps the MLE
    * finite and the fitted order then reproduces the acyclic
    * beat-order — which is exactly the consistency certificate the
    * fit exists to issue.
    *
    * Scale shape: ONE keyed aggregate collapses the corpus-scale pair
    * frame to the ≤ |items|² duel matrix; all [[BtIters]] rounds run
    * on that bounded frame (two broadcast joins + one keyed agg + one
    * 1-row max fold per round).
    */
  private[graft] val BtIters = 8

  /** q150's duel aggregation over a turn frame — shared by the batch
    * query and the streaming read side
    * ([[graft.streaming.StreamingIngest.currentBradleyTerry]], zero
    * new state over the c07 turn store).
    */
  private[graft] def btDuelsFromTurns(turns: DataFrame): DataFrame =
    prefPairsRaw(turns)
      .select(col("__ch_rend").as("item_w"), col("__rj_rend").as("item_l"))
      .groupBy(col("item_w"), col("item_l"))
      .agg(count(lit(1)).as("n_wl"))

  val q150_bradley_terry: Q = (s, dir) =>
    graft.analytics.Preference.bradleyTerryFromDuels(
      btDuelsFromTurns(c07TurnFrame(t(s, dir, "events"))), BtIters)

  def q150_sql: String = {
    import graft.analytics.Preference.{BtInnerK, BtRawK, BtScale}
    // AS MATERIALIZED for the g09/g10 reason: each round's state is
    // read by the next round's two join sides
    val rounds = (1 to BtIters).map { k =>
      s"""btd$k AS MATERIALIZED (SELECT nm.i,
         |    SUM(CAST(nm.n_ij AS HUGEINT) * $BtInnerK //
         |        CAST(a.s + b.s AS HUGEINT)) AS d
         |  FROM nm JOIN bts${k - 1} a ON a.i = nm.i
         |  JOIN bts${k - 1} b ON b.i = nm.j
         |  GROUP BY 1),
         |btr$k AS MATERIALIZED (SELECT wb.i,
         |    CAST(w1 AS HUGEINT) * $BtRawK // d AS raw
         |  FROM wb JOIN btd$k USING (i)),
         |btm$k AS (SELECT MAX(raw) AS mx FROM btr$k),
         |bts$k AS MATERIALIZED (SELECT i,
         |    GREATEST(CAST(raw * $BtScale // mx AS BIGINT), 1) AS s
         |  FROM btr$k CROSS JOIN btm$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH $c07TurnSqlCtes,
       |$c08PairSqlCtes,
       |duel AS (SELECT chosen_rendered AS iw, rejected_rendered AS il,
       |    CAST(COUNT(*) AS BIGINT) AS n FROM pair GROUP BY 1, 2),
       |nm AS MATERIALIZED (SELECT i, j, CAST(SUM(n) AS BIGINT) AS n_ij
       |  FROM (SELECT iw AS i, il AS j, n FROM duel
       |        UNION ALL SELECT il AS i, iw AS j, n FROM duel)
       |  GROUP BY 1, 2),
       |wb AS MATERIALIZED (SELECT t.i,
       |    CAST(COALESCE(w.w, 0) AS BIGINT) AS n_wins,
       |    CAST(COALESCE(w.w, 0) + 1 AS BIGINT) AS w1,
       |    t.tot AS n_duels
       |  FROM (SELECT i, CAST(SUM(n_ij) AS BIGINT) AS tot
       |        FROM nm GROUP BY 1) t
       |  LEFT JOIN (SELECT iw AS i, CAST(SUM(n) AS BIGINT) AS w
       |             FROM duel GROUP BY 1) w ON w.i = t.i),
       |bts0 AS (SELECT i, CAST($BtScale AS BIGINT) AS s FROM wb),
       |$rounds,
       |btfin AS (SELECT wb.i AS item, n_wins,
       |    CAST(n_duels - n_wins AS BIGINT) AS n_losses, n_duels,
       |    CAST((n_wins * 1000000) // n_duels AS BIGINT) AS win_rate_e6,
       |    CAST(s AS BIGINT) AS strength_e6
       |  FROM wb JOIN bts$BtIters b ON b.i = wb.i),
       |btk AS (SELECT *,
       |    CAST(ROW_NUMBER() OVER (ORDER BY strength_e6 DESC, item)
       |      AS BIGINT) AS bt_rank,
       |    CAST(ROW_NUMBER() OVER (ORDER BY win_rate_e6 DESC, item)
       |      AS BIGINT) AS wr_rank
       |  FROM btfin)
       |SELECT item, n_wins, n_losses, n_duels, win_rate_e6,
       |  strength_e6, bt_rank, wr_rank, bt_rank = wr_rank AS rank_agree
       |FROM btk""".stripMargin
  }

  private def c04Root: String = s"${graft.ingest.FixtureTables.root}/c04"

  /** Multimodal curation capstone — the c02 keep/drop composition
    * applied to MEDIA: every modality's perceptual near-dup pairs
    * (m07/m08/m09 machinery over freshly dumped per-kind hash
    * fixtures, so the query is self-contained and order-independent
    * of the m-series) feed the distributed connected-components
    * operator ([[graft.graph.GraphOps.connectedComponents]] — the
    * g02 loop reused as a library piece), each group keeps its min-id
    * canonical, and the release manifest reports per-kind kept /
    * dropped / duplicate-group counts. The oracle replays pair
    * generation brute-force from the dumps and the closure as a
    * recursive CTE — so the hash check covers the full composition:
    * hash → lossless banding → transitive grouping → manifest.
    */
  val c04_media_curation: Q = (s, _) => {
    import graft.multimodal.MultiModal
    val img = MultiModal.imageDHashes(MultiModal.imageCorpus(s, n = 400))
      .withColumnRenamed("dhash", "h")
    val aud = MultiModal.audioFingerprints(MultiModal.audioCorpus(s, n = 400))
      .withColumnRenamed("fp", "h")
    val vid = MultiModal.videoFrameDHashes(MultiModal.videoCorpus(s, n = 200))
    // guide §2.6: the three decode-and-dump jobs (and below, the three
    // per-kind dup-group fixpoints) are INDEPENDENT — submit them from
    // a small pool so one kind's straggler tail back-fills with the
    // next kind's tasks instead of idling the executor slots. Results
    // are unchanged (each job writes/derives its own kind); only the
    // driver-side sequencing goes away.
    concurrently(s, "c04 hash dump",
      () => img.coalesce(1).write.mode("overwrite")
        .parquet(s"$c04Root/image.parquet"),
      () => aud.coalesce(1).write.mode("overwrite")
        .parquet(s"$c04Root/audio.parquet"),
      () => vid.coalesce(1).write.mode("overwrite")
        .parquet(s"$c04Root/video.parquet"))
    def manifest(kind: String, ids: org.apache.spark.sql.DataFrame,
        pairs: org.apache.spark.sql.DataFrame) = {
      val comps = graft.graph.GraphOps.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
        maxRounds = 12)
      val flagged = ids
        .join(comps, ids("media_id") === comps("node"), "left")
        .withColumn("__kept", col("node").isNull || col("media_id") === col("label"))
      flagged.agg(
        count(lit(1)).as("n_media"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__kept"), 0L).otherwise(1L)).as("n_dropped"),
        count_distinct(col("label")).as("n_dup_groups"))
        .select(lit(kind).as("kind"), col("n_media"), col("n_kept"),
          col("n_dropped"), col("n_dup_groups"))
    }
    val imgH = s.read.parquet(s"$c04Root/image.parquet")
    val audH = s.read.parquet(s"$c04Root/audio.parquet")
    val vidH = s.read.parquet(s"$c04Root/video.parquet")
    val Seq(mi, ma, mv) = concurrently(s, "c04 dup groups",
      () => manifest("image", imgH.select(col("media_id")),
        MultiModal.bandedHammingPairs(imgH, maxDist = 3)),
      () => manifest("audio", audH.select(col("media_id")),
        MultiModal.bandedHammingPairs(audH, maxDist = 3)),
      () => manifest("video",
        vidH.select(col("media_id")).distinct(),
        MultiModal.videoNearDupPairs(vidH)))
    mi.unionAll(ma).unionAll(mv)
  }

  /** Run independent per-kind job chains concurrently (guide §2.6 —
    * "overlap independent jobs"): each thunk runs on its own driver
    * thread with a thread-local job description, so the scheduler
    * back-fills one chain's straggler tail with the next chain's
    * tasks. Returns the thunks' results in input order; any failure
    * propagates. Used by the media capstones whose three kinds
    * (image/audio/video) decode and group independently.
    */
  private def concurrently[T](s: SparkSession, what: String,
      thunks: (() => T)*): Seq[T] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    // each thunk runs under its own job GROUP (not just a
    // description) so a sibling's failure can cancel the others'
    // in-flight jobs — without this, Await.result rethrows while the
    // surviving threads keep running (and writing) to completion
    val groups = thunks.indices.map(i => s"$what [$i]")
    try {
      val futs = thunks.zipWithIndex.map { case (t, i) =>
        scala.concurrent.Future {
          s.sparkContext.setJobGroup(groups(i), groups(i),
            interruptOnCancel = true)
          try t() finally s.sparkContext.clearJobGroup()
        }
      }
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration.Inf).toSeq
      catch { case e: Throwable =>
        groups.foreach(s.sparkContext.cancelJobGroup)
        throw e
      }
    } finally { pool.shutdown() }
  }

  def c04_sql: String = {
    def kindBlock(kind: String, pfx: String, itemsSql: String, pairsSql: String) =
      (s"""${pfx}i AS ($itemsSql),
          |${pfx}p AS ($pairsSql),
          |${pfx}e AS (SELECT id_a AS src, id_b AS dst FROM ${pfx}p
          |            UNION SELECT id_b, id_a FROM ${pfx}p),
          |${pfx}r AS (
          |  SELECT src, dst FROM ${pfx}e
          |  UNION
          |  SELECT r.src, e.dst FROM ${pfx}r r JOIN ${pfx}e e ON r.dst = e.src),
          |${pfx}g AS (SELECT src AS id, LEAST(src, MIN(dst)) AS group_id
          |            FROM ${pfx}r GROUP BY src)""".stripMargin,
       s"""SELECT '$kind' AS kind,
          |  (SELECT COUNT(*) FROM ${pfx}i) AS n_media,
          |  (SELECT COUNT(*) FROM ${pfx}i LEFT JOIN ${pfx}g ON media_id = id
          |   WHERE id IS NULL OR media_id = group_id) AS n_kept,
          |  (SELECT COUNT(*) FROM ${pfx}i JOIN ${pfx}g ON media_id = id
          |   WHERE media_id <> group_id) AS n_dropped,
          |  (SELECT COUNT(DISTINCT group_id) FROM ${pfx}g) AS n_dup_groups"""
         .stripMargin)
    val (iC, iS) = kindBlock("image", "ci",
      s"SELECT media_id FROM read_parquet('$c04Root/image.parquet/*.parquet')",
      s"""SELECT a.media_id AS id_a, b.media_id AS id_b
         |FROM read_parquet('$c04Root/image.parquet/*.parquet') a
         |JOIN read_parquet('$c04Root/image.parquet/*.parquet') b
         |  ON a.media_id < b.media_id
         |WHERE bit_count(xor(a.h, b.h)) <= 3""".stripMargin)
    val (aC, aS) = kindBlock("audio", "ca",
      s"SELECT media_id FROM read_parquet('$c04Root/audio.parquet/*.parquet')",
      s"""SELECT a.media_id AS id_a, b.media_id AS id_b
         |FROM read_parquet('$c04Root/audio.parquet/*.parquet') a
         |JOIN read_parquet('$c04Root/audio.parquet/*.parquet') b
         |  ON a.media_id < b.media_id
         |WHERE bit_count(xor(a.h, b.h)) <= 3""".stripMargin)
    val (vC, vS) = kindBlock("video", "cv",
      s"""SELECT DISTINCT media_id
         |FROM read_parquet('$c04Root/video.parquet/*.parquet')""".stripMargin,
      s"""SELECT a.media_id AS id_a, b.media_id AS id_b
         |FROM read_parquet('$c04Root/video.parquet/*.parquet') a
         |JOIN read_parquet('$c04Root/video.parquet/*.parquet') b
         |  ON a.media_id < b.media_id AND a.frame_idx = b.frame_idx
         |WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
         |GROUP BY 1, 2 HAVING COUNT(*) >= 3""".stripMargin)
    s"""WITH RECURSIVE
       |$iC,
       |$aC,
       |$vC
       |$iS
       |UNION ALL
       |$aS
       |UNION ALL
       |$vS""".stripMargin
  }

  // --------------------------------------- c11 media training-mix release

  private def c11Root: String = s"${graft.ingest.FixtureTables.root}/c11"

  /** c11's release budget — below every fixture's kept-media total,
    * so the per-kind Hamilton quotas bind (the C06Budget argument).
    */
  private[graft] val C11Budget = 120L

  /** c11: MULTIMODAL training-mix release — the c06 chain applied to
    * media, closing the capstone symmetry (text c06/c09/c10, SFT c07,
    * preference c08, media previously manifest-only in c04): per-kind
    * perceptual near-dup groups (c04's m07/m08/m09 machinery over
    * freshly dumped hash+size fixtures) → each group keeps its min-id
    * canonical → Hamilton quota per media KIND over the kept counts →
    * hash-threshold selection → byte-budget packing + checksum
    * manifest, all through the SAME [[releaseFromSurvivors]] tail the
    * text releases run (one statement of quota/threshold/pack/
    * manifest, now four consumers). The media "token" cost is
    * ceil(bytes/64) — a patch-count proxy computed from the raw
    * payload size, dumped with the hashes so the oracle replays it.
    *
    * The oracle replays the FULL composition in one statement: pair
    * generation brute-force from the dumps (pigeonhole-lossless
    * banding is a plan optimization, not a semantics change), the
    * closure as a recursive CTE, the kept set, then the SHARED
    * [[selectionFromDdSqlCtes]] + [[releaseTailSql]] blocks — so a
    * hash match certifies dedup, apportionment, selection, packing
    * and checksum agree end-to-end.
    *
    * Scale shape: each kind's corpus is decoded ONCE into (hash,
    * size) rows; pair generation is banded (never all-pairs), the
    * grouping is the distributed CC loop, and everything after the
    * kept frame runs on (id, kind, 3×BIGINT) rows — media bytes never
    * travel past the hash stage.
    */
  val c11_media_mix_release: Q = (s, _) => {
    import graft.multimodal.MultiModal
    val imgC = MultiModal.imageCorpus(s, n = 400)
    val audC = MultiModal.audioCorpus(s, n = 400)
    val vidC = MultiModal.videoCorpus(s, n = 200)
    def sized(ds: org.apache.spark.sql.Dataset[MultiModal.MediaRow]) =
      ds.toDF().select(col("mediaId").as("media_id"),
        length(col("content")).cast("long").as("nbytes"))
    val img = MultiModal.imageDHashes(imgC).withColumnRenamed("dhash", "h")
      .join(sized(imgC), "media_id")
    val aud = MultiModal.audioFingerprints(audC).withColumnRenamed("fp", "h")
      .join(sized(audC), "media_id")
    val vid = MultiModal.videoFrameDHashes(vidC)
      .join(sized(vidC), "media_id")
    // guide §2.6 — the three decode-and-dump chains are independent;
    // overlap them (see [[concurrently]], same as c04)
    concurrently(s, "c11 hash dump",
      () => img.coalesce(1).write.mode("overwrite")
        .parquet(s"$c11Root/image.parquet"),
      () => aud.coalesce(1).write.mode("overwrite")
        .parquet(s"$c11Root/audio.parquet"),
      () => vid.coalesce(1).write.mode("overwrite")
        .parquet(s"$c11Root/video.parquet"))
    val imgH = s.read.parquet(s"$c11Root/image.parquet")
    val audH = s.read.parquet(s"$c11Root/audio.parquet")
    val vidH = s.read.parquet(s"$c11Root/video.parquet")
    // per-kind kept canonicals: group members keep only the min id
    // (the c04 manifest rule, now feeding a release instead of counts)
    def kept(ids: DataFrame, pairs: DataFrame): DataFrame = {
      val comps = graft.graph.GraphOps.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
        maxRounds = 12)
      ids.join(comps, ids("media_id") === comps("node"), "left")
        .where(col("node").isNull || col("media_id") === col("label"))
        .select(ids("media_id"), col("htok"), col("nbytes"))
    }
    // the three per-kind dup-group fixpoints are independent — overlap
    // them too (§2.6); a video's content token folds its frame hashes
    // (order-free XOR)
    val Seq(keptImg, keptAud, keptVid) = concurrently(s, "c11 dup groups",
      () => kept(
        imgH.select(col("media_id"), col("h").as("htok"), col("nbytes")),
        MultiModal.bandedHammingPairs(imgH, maxDist = 3))
        .select(lit("image").as("kind"), col("media_id"), col("htok"),
          col("nbytes")),
      () => kept(
        audH.select(col("media_id"), col("h").as("htok"), col("nbytes")),
        MultiModal.bandedHammingPairs(audH, maxDist = 3))
        .select(lit("audio").as("kind"), col("media_id"), col("htok"),
          col("nbytes")),
      () => kept(
        vidH.groupBy(col("media_id"))
          .agg(expr("bit_xor(dhash)").as("htok"),
            first(col("nbytes")).as("nbytes")),
        MultiModal.videoNearDupPairs(vidH))
        .select(lit("video").as("kind"), col("media_id"), col("htok"),
          col("nbytes")))
    import graft.functions.KmvSketch
    val shaped = keptImg.unionByName(keptAud).unionByName(keptVid)
      .select(
        concat_ws(":", col("kind"), col("media_id").cast("string"))
          .as("doc_id"),
        col("kind").as("source"),
        expr("(nbytes + 63L) div 64L").as("n_tokens"),
        col("htok"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        KmvSketch.hash64(concat_ws(":", col("doc_id"),
          col("htok").cast("string"))).as("__ck"),
        KmvSketch.hash64(col("doc_id")).as("__h"))
    releaseFromSurvivors(shaped, C11Budget)
  }

  def c11_sql: String = {
    def keptBlock(kind: String, pfx: String, itemsSql: String,
        pairsSql: String) =
      s"""${pfx}i AS ($itemsSql),
         |${pfx}p AS ($pairsSql),
         |${pfx}e AS (SELECT id_a AS src, id_b AS dst FROM ${pfx}p
         |            UNION SELECT id_b, id_a FROM ${pfx}p),
         |${pfx}r AS (
         |  SELECT src, dst FROM ${pfx}e
         |  UNION
         |  SELECT r.src, e.dst FROM ${pfx}r r JOIN ${pfx}e e ON r.dst = e.src),
         |${pfx}g AS (SELECT src AS id, LEAST(src, MIN(dst)) AS group_id
         |            FROM ${pfx}r GROUP BY src),
         |${pfx}k AS (SELECT i.media_id, i.htok, i.nbytes, '$kind' AS kind
         |  FROM ${pfx}i i LEFT JOIN ${pfx}g g ON g.id = i.media_id
         |  WHERE g.id IS NULL OR i.media_id = g.group_id)""".stripMargin
    val (iB, aB, vB) = (
      keptBlock("image", "ri",
        s"""SELECT media_id, h AS htok, nbytes
           |FROM read_parquet('$c11Root/image.parquet/*.parquet')""".stripMargin,
        s"""SELECT a.media_id AS id_a, b.media_id AS id_b
           |FROM read_parquet('$c11Root/image.parquet/*.parquet') a
           |JOIN read_parquet('$c11Root/image.parquet/*.parquet') b
           |  ON a.media_id < b.media_id
           |WHERE bit_count(xor(a.h, b.h)) <= 3""".stripMargin),
      keptBlock("audio", "ra",
        s"""SELECT media_id, h AS htok, nbytes
           |FROM read_parquet('$c11Root/audio.parquet/*.parquet')""".stripMargin,
        s"""SELECT a.media_id AS id_a, b.media_id AS id_b
           |FROM read_parquet('$c11Root/audio.parquet/*.parquet') a
           |JOIN read_parquet('$c11Root/audio.parquet/*.parquet') b
           |  ON a.media_id < b.media_id
           |WHERE bit_count(xor(a.h, b.h)) <= 3""".stripMargin),
      keptBlock("video", "rv",
        s"""SELECT media_id, bit_xor(dhash) AS htok,
           |  ANY_VALUE(nbytes) AS nbytes
           |FROM read_parquet('$c11Root/video.parquet/*.parquet')
           |GROUP BY media_id""".stripMargin,
        s"""SELECT a.media_id AS id_a, b.media_id AS id_b
           |FROM read_parquet('$c11Root/video.parquet/*.parquet') a
           |JOIN read_parquet('$c11Root/video.parquet/*.parquet') b
           |  ON a.media_id < b.media_id AND a.frame_idx = b.frame_idx
           |WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
           |GROUP BY 1, 2 HAVING COUNT(*) >= 3""".stripMargin))
    s"""WITH RECURSIVE
       |$iB,
       |$aB,
       |$vB,
       |mk AS (SELECT * FROM rik UNION ALL SELECT * FROM rak
       |       UNION ALL SELECT * FROM rvk),
       |dd AS MATERIALIZED (SELECT
       |    kind || ':' || CAST(media_id AS VARCHAR) AS doc_id,
       |    kind AS source,
       |    (nbytes + 63) // 64 AS n_tokens,
       |    ('0x' || substr(md5(kind || ':' || CAST(media_id AS VARCHAR)
       |       || ':' || CAST(htok AS VARCHAR)), 1, 15))::BIGINT AS ck,
       |    ('0x' || substr(md5(kind || ':' || CAST(media_id AS VARCHAR)),
       |       1, 15))::BIGINT AS h
       |  FROM mk),
       |${selectionFromDdSqlCtes(C11Budget)},
       |$releaseTailSql""".stripMargin
  }

  /** Multimodal plumbing demo (stub codec, real Spark dataflow):
    * synthetic media → batched decode → feature extraction → per-kind
    * stats. The stub decode is the one non-SQL-replayable stage (the
    * s03 k-means-fit analog), so — the s03 centroid-dump recipe — the
    * query dumps the extracted per-media feature vectors to a fixture
    * parquet and the static oracle replays everything downstream of the
    * decode: the L2 norm in graft's exact left-to-right accumulation
    * order and the per-kind aggregate. Decimal sums keep the aggregate
    * bit-exact regardless of partition merge order.
    */
  val m01_multimodal_features: Q = (s, _) => {
    val feats = graft.multimodal.MultiModal
      .extractFeatures(graft.multimodal.MultiModal.syntheticMedia(s, n = 300))
      .toDF()
      .select(col("mediaId").as("media_id"), col("kind"), col("features"))
    feats.coalesce(1).write.mode("overwrite").parquet(m01FeaturePath)
    s.read.parquet(m01FeaturePath)
      .select(col("kind"),
        sqrt(aggregate(transform(col("features"),
          x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("norm"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        // BIGINT e-6 units (round-12 sweep: this was the last DECIMAL
        // output boundary the r11 migrations missed — driver-green on
        // its small values, but the no-DECIMAL-boundary policy is
        // absolute and compare_oracle.py now enforces it). The decimal
        // SUM stays the exact compute type; ×10⁶ is integral by
        // construction, so the BIGINT crossing is exact.
        (sum(round(col("norm"), 6).cast("decimal(18,6)")) * lit(1000000))
          .cast("long").as("sum_feature_norm_e6"))
  }

  /** DuckDB replay downstream of the stub decode (see
    * [[m01_multimodal_features]]): list_reduce over list_transform is
    * the same sequential left-to-right double accumulation as Spark's
    * `aggregate(transform(...))`, so the rounded per-media norms are
    * bit-identical and the decimal sum is order-independent-exact.
    */
  def m01_sql: String = // def: the path must resolve AT DUMP TIME
    s"""WITH f AS (SELECT media_id, kind, features::DOUBLE[] AS v
       |           FROM read_parquet('$m01FeaturePath/*.parquet')),
       |n AS (SELECT kind,
       |  sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS norm
       | FROM f)
       |SELECT kind, COUNT(*) AS n_media,
       |  CAST(SUM(CAST(ROUND(norm, 6) AS DECIMAL(18,6))) * 1000000
       |    AS BIGINT) AS sum_feature_norm_e6
       |FROM n GROUP BY kind""".stripMargin

  /** Frame-sampling manifest over the synthetic video corpus — the
    * SQL-checkable half of the multimodal surface. The pixel decode is
    * honestly stubbed (no codecs in this container; m01 stays
    * rows-only), but the typed `flatMap` fan-out that drives it — how
    * many frames each video yields, their timestamps, the raster dims —
    * is pure arithmetic over the media metadata, so DuckDB replays it
    * from `generate_series` and hash-checks the plumbing a real codec
    * would slot into.
    */
  val m02_frame_manifest: Q = (s, _) =>
    graft.multimodal.MultiModal
      .sampleFrames(graft.multimodal.MultiModal.syntheticMedia(s, n = 300))
      .toDF()
      .select(
        col("mediaId").as("media_id"),
        col("frameIndex").cast("long").as("frame_index"),
        col("timestampMs").as("timestamp_ms"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))

  val m02_sql: String =
    """WITH ids AS (SELECT unnest(generate_series(0, 299)) AS id),
      |v AS (SELECT id,
      |  CAST(16 + id % 16 AS BIGINT) AS w,
      |  CAST(16 + id % 16 AS BIGINT) AS h,
      |  2000 + id % 5000 AS dur
      | FROM ids WHERE id % 3 = 2),
      |f AS (SELECT id, w, h,
      |  unnest(generate_series(0, CAST(greatest(1, dur // 1000) AS BIGINT) - 1)) AS i
      | FROM v)
      |SELECT id AS media_id, CAST(i AS BIGINT) AS frame_index,
      |  CAST(i * 1000 AS BIGINT) AS timestamp_ms, w AS width, h AS height
      |FROM f""".stripMargin

  /** Image patch manifest (ViT patchify): each synthetic image tiles
    * into a 16×16 grid with edge clamping — like m02, the geometry is
    * pure arithmetic over the media metadata, so DuckDB replays and
    * hash-checks the manifest a real patch loader would dereference.
    */
  val m03_patch_manifest: Q = (s, _) =>
    graft.multimodal.MultiModal
      .tilePatches(graft.multimodal.MultiModal.syntheticMedia(s, n = 300))
      .toDF()
      .select(
        col("mediaId").as("media_id"),
        col("patchId").cast("long").as("patch_id"),
        col("x0").cast("long").as("x0"),
        col("y0").cast("long").as("y0"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))

  val m03_sql: String =
    """WITH ids AS (SELECT unnest(generate_series(0, 299)) AS id),
      |img AS (SELECT id, 32 + id % 64 AS w, 24 + id % 48 AS h
      |        FROM ids WHERE id % 3 = 0),
      |g AS (SELECT id, w, h,
      |  (w + 15) // 16 AS nx, (h + 15) // 16 AS ny FROM img),
      |p AS (SELECT id, w, h, nx,
      |  unnest(generate_series(0, nx * ny - 1)) AS pid FROM g)
      |SELECT id AS media_id, CAST(pid AS BIGINT) AS patch_id,
      |  CAST((pid % nx) * 16 AS BIGINT) AS x0,
      |  CAST((pid // nx) * 16 AS BIGINT) AS y0,
      |  CAST(least(16, w - (pid % nx) * 16) AS BIGINT) AS width,
      |  CAST(least(16, h - (pid // nx) * 16) AS BIGINT) AS height
      |FROM p""".stripMargin

  /** Strided audio-window manifest (STFT/mel framing geometry) over the
    * synthetic audio corpus — [[m02_frame_manifest]]'s recipe for the
    * audio modality: the window fan-out is pure metadata arithmetic
    * (400-sample windows every 160 samples at 16 kHz), so DuckDB
    * replays it from generate_series and hash-checks the plumbing a
    * real PCM feature extractor would slot into.
    */
  val m04_audio_windows: Q = (s, _) =>
    graft.multimodal.MultiModal
      .windowAudio(graft.multimodal.MultiModal.syntheticMedia(s, n = 300))
      .toDF()
      .select(
        col("mediaId").as("media_id"),
        col("windowIndex").as("window_index"),
        col("startSample").as("start_sample"),
        col("nSamples").cast("long").as("n_samples"),
        col("startMs").as("start_ms"))

  val m04_sql: String =
    """WITH ids AS (SELECT unnest(generate_series(0, 299)) AS id),
      |a AS (SELECT id, 16000 * (500 + id % 2000) // 1000 AS n_total
      |      FROM ids WHERE id % 3 = 1),
      |w AS (SELECT id,
      |  unnest(generate_series(0, (n_total - 400) // 160)) AS i
      | FROM a WHERE n_total >= 400)
      |SELECT id AS media_id, CAST(i AS BIGINT) AS window_index,
      |  CAST(i * 160 AS BIGINT) AS start_sample,
      |  CAST(400 AS BIGINT) AS n_samples,
      |  CAST(i * 160 * 1000 // 16000 AS BIGINT) AS start_ms
      |FROM w""".stripMargin

  /** IVF-ANN top-10 (k-means inverted lists, 8-probe) — the second ANN
    * scale path next to s02's hyperplane LSH. The index is built once
    * per corpus and reused (real serving shape: construction amortizes
    * across query batches). The k-means fit is data-dependent, so a
    * static oracle can't replay it from scratch — instead the build
    * dumps the fitted centroids to parquet (the same move FixtureTables
    * makes for the stock ETL) and the oracle replays everything
    * downstream of the fit in pure SQL: nearest-centroid assignment
    * (graft's exact squared-distance operation order and (d, list)
    * tie-break), the 8-probe list join, and the exact-cosine ranking.
    * Quality is additionally pinned by the SimilaritySpec recall gate:
    * recall@10 = 0.94 vs exact ground truth at nProbe=8/nLists=16
    * (floor 0.9).
    */
  private val ivfIndexes =
    scala.collection.concurrent.TrieMap[String, Similarity.IvfIndex]()

  /** The sfDir the NEXT `oracles` read should describe. The s03 oracle
    * replays assignment from the centroids that s03's index build for a
    * specific sfDir dumped, so the fixture path must be per-dir (a
    * whole-registry sweep at another SF — PlanLintSpec, RegistrySpec —
    * would otherwise clobber the verified dir's centroid bits between
    * the Verify dump and the driver's DuckDB run). Verify sets this
    * from its sfDir argument before dumping oracle_sql.json; the
    * default is the driver's correctness SF.
    */
  @volatile var oracleSfDir: String = "/root/testdata/sf0.01"

  private def ivfCentroidPath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/ivf_centroids_$key.parquet"
  }

  /** The s03 IVF index, built once per dir and dumped for the oracle —
    * factored out so s19's recall eval searches the SAME index (and
    * a subset run of either query produces the centroid fixture).
    */
  private def s03Index(s: SparkSession, dir: String): Similarity.IvfIndex =
    ivfIndexes.getOrElseUpdate(dir, {
      // nLists = 0 → corpus-proportional (floor 16, so = 16 at every sf
      // fixture; grows with the corpus at 10×+ — see adaptiveNLists)
      val built = Similarity.IvfIndex.build(
        t(s, dir, "embeddings"), "vec_id", "embedding", nLists = 0)
      // dump the fitted quantizer so the oracle SQL can replay the
      // assignment from this run's exact centroid bits
      import s.implicits._
      built.centroids.zipWithIndex.map { case (c, i) => (i, c) }
        .toDF("list_id", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(ivfCentroidPath(dir))
      built
    })

  val s03_ivf_topk: Q = (s, dir) =>
    s03Index(s, dir)
      .search(t(s, dir, "embeddings").where(col("vec_id") < 5),
        "vec_id", "embedding", k = 10, nProbe = 8)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))

  /** DuckDB replay of everything downstream of the k-means fit. The
    * squared distance mirrors [[Similarity.IvfIndex.sqDist]]'s exact
    * operation order — (dot(v,v) - 2*dot(v,c)) + sum(c²), each sum
    * sequential left-to-right — and the (d, list_id) ROW_NUMBER order
    * mirrors the array_sort((d, i) struct) tie-break.
    */
  /** The IVF candidate-generation CTE chain (fitted-centroid read →
    * exact-op-order assignment → probe lists → candidate pairs),
    * requiring an `e(vec_id, v)` CTE in scope and ending in
    * `cand(query_id, neighbor_id)` — spliced by BOTH the s03 oracle
    * and s19's recall eval, exactly as the Spark side shares
    * [[s03Index]].
    */
  /** The fit-replay + assignment half of [[s03CoreSqlCtes]] (fitted
    * centroid read, exact-op-order distances, min-(d, list) list
    * assignment) — spliced by the s03/s19/s20 chain AND s21's
    * two-sided probe CTEs, which probe for every vector of each side
    * rather than the fixed 5-query demo set.
    */
  private def s03AssignSqlCtes: String =
    s"""ctr AS (SELECT list_id, centroid
       |        FROM read_parquet('${ivfCentroidPath(oracleSfDir)}/*.parquet')),
       |dist AS (SELECT e.vec_id, c.list_id,
       |  ((list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * e.v[i]), (a, b) -> a + b)
       |    - 2.0e0 * list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * c.centroid[i]), (a, b) -> a + b))
       |   + list_reduce(list_transform(c.centroid, x -> x * x),
       |      (a, b) -> a + b)) AS d
       | FROM e CROSS JOIN ctr c),
       |assign AS (SELECT vec_id AS neighbor_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM dist) WHERE rn = 1)""".stripMargin

  private def s03CoreSqlCtes: String =
    s"""$s03AssignSqlCtes,
       |probe AS (SELECT vec_id AS query_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM dist WHERE vec_id < 5) WHERE rn <= 8),
       |cand AS (SELECT DISTINCT query_id, neighbor_id
       | FROM probe JOIN assign USING (list_id)
       | WHERE neighbor_id <> query_id)""".stripMargin

  def s03_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |$s03CoreSqlCtes,
       |sc AS (SELECT query_id, neighbor_id, $cosSql AS cos
       | FROM cand JOIN e a ON a.vec_id = query_id
       |           JOIN e b ON b.vec_id = neighbor_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |                     ORDER BY cos DESC, neighbor_id ASC) AS rank
       | FROM sc)
       |SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rank
       |FROM r WHERE rank <= 10""".stripMargin

  /** s20: IVF radius (range) search — the similarity API the top-k
    * family lacks: dedup and link-discovery ask "every neighbor at
    * least this similar" (d04/d11 answer it by brute force or LSH),
    * and a k cap silently truncates dense neighborhoods while
    * flooding sparse ones with irrelevant tails. Probes the same
    * fitted s03 quantizer ([[s03Index]] — one fit, three consumers
    * with s19), nProbe = 8 of 16 lists, exact cosine ≥ 0.3 filter —
    * no window anywhere, the per-query result size is whatever the
    * radius contains. The oracle replays candidate generation from
    * the dumped centroid bits ([[s03CoreSqlCtes]], shared verbatim)
    * and the identical exact-op-order cosine + threshold, so the hash
    * match proves probe-for-probe equivalence. At 100 TB the shape is
    * s03's: the probe join shuffles on list id only, and a persisted
    * list-partitioned store prunes to the probed directories.
    */
  val s20_ivf_radius: Q = (s, dir) =>
    s03Index(s, dir)
      .searchRadius(t(s, dir, "embeddings").where(col("vec_id") < 5),
        "vec_id", "embedding", threshold = 0.3, nProbe = 8)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))

  def s20_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |$s03CoreSqlCtes,
       |sc AS (SELECT query_id, neighbor_id, $cosSql AS cos
       | FROM cand JOIN e a ON a.vec_id = query_id
       |           JOIN e b ON b.vec_id = neighbor_id)
       |SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine
       |FROM sc WHERE cos >= 0.3E0""".stripMargin

  /** s21: margin-based bitext mining (Artetxe–Schwenk) over the
    * persisted IVF index — the cross-lingual face of the similarity
    * family: given two embedding sets (a "source-language" and a
    * "target-language" side; the fixture has no language column, so
    * the sides are the DETERMINISTIC vec_id parity split — the c08
    * hash-reward move, an opaque bit-replayable stand-in), mine the
    * pairs whose cosine stands out of BOTH points' k-NN
    * neighborhoods: margin = cos(x,y) · 2k / (Σₖcos(x,·) + Σₖcos(y,·))
    * over e-6-quantized cosines ([[Similarity.marginScores]] — exact
    * integer sums, one IEEE division, bit-identical cross-engine).
    * Candidates come from the SAME fitted s03 quantizer (one fit,
    * four consumers with s19/s20), every side-A vector probing 8
    * lists for side-B neighbors and vice versa; the mined output is
    * each x's best-margin y above [[S21MarginThreshold]], flagged
    * `is_mutual` when y's own best-margin backward choice is x (the
    * Artetxe "mutual" strategy — the high-precision mode a real
    * bitext pipeline ships). The oracle replays candidate generation
    * from the dumped centroid bits ([[s03AssignSqlCtes]] shared
    * verbatim) and the identical integer margin algebra, so the hash
    * match certifies probes, quantization, neighborhood sums, the
    * ranking AND the mutual join. SimilaritySpec additionally gates
    * mined-pair recall against the brute-force margin miner (the
    * s19 discipline applied to the mining rule).
    *
    * Scale shape: candidate volume is |side| × probed-list mass (the
    * s03 probe budget, never |A|×|B|); margins are two windows + two
    * keyed aggs + equi-joins ([[Similarity.marginScores]]); the
    * mined top-1 is one window over the candidate frame.
    */
  private[graft] val S21K = 4
  private[graft] val S21MarginThreshold = 1.05

  /** The mining tail over two directed candidate frames (margin
    * scoring → forward top-1 + threshold → mutual flag) — shared by
    * the s21 query (IVF candidates) and the SimilaritySpec recall
    * gate (brute-force candidates), so the miner under test IS the
    * miner the gate measures.
    */
  private[graft] def s21MinedPairs(candAB: DataFrame,
      candBA: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (fwd, bwd) = graft.similarity.Similarity
      .marginScores(candAB, candBA, S21K)
    val wX = Window.partitionBy(col("query_id"))
      .orderBy(col("margin").desc, col("neighbor_id").asc)
    val mined = fwd.withColumn("__rn", row_number().over(wX))
      .where(col("__rn") === 1 && col("margin") >= lit(S21MarginThreshold))
    val wY = Window.partitionBy(col("query_id"))
      .orderBy(col("margin").desc, col("neighbor_id").asc)
    val bwdBest = bwd.withColumn("__rn", row_number().over(wY))
      .where(col("__rn") === 1)
      .select(col("query_id").as("y_id"), col("neighbor_id").as("x_id"),
        lit(true).as("__mut"))
    mined
      .select(col("query_id").as("x_id"), col("neighbor_id").as("y_id"),
        (col("__ce6").cast("double") / lit(1000000.0)).as("cosine"),
        col("margin"))
      .join(bwdBest, Seq("x_id", "y_id"), "left")
      .select(col("x_id"), col("y_id"), col("cosine"), col("margin"),
        coalesce(col("__mut"), lit(false)).as("is_mutual"))
  }

  /** The brute-force (exact-candidate) bitext miner over an explicit
    * embeddings frame (vec_id + embedding): every cross-parity pair
    * scores an exact cosine, then the SAME [[s21MinedPairs]] tail.
    * Ground truth for the SimilaritySpec recall gate AND the batch
    * definition the streaming read side
    * ([[graft.streaming.StreamingIngest.currentBitextPairs]]) derives
    * — one statement of "what the miner returns", three consumers.
    * Candidate generation is |A|×|B| by design (it exists to be
    * exact); the production-scale path is the s21 query's IVF probe.
    */
  private[graft] def s21BruteMinedPairs(emb: DataFrame): DataFrame = {
    def side(p: Int) = emb.where(pmod(col("vec_id"), lit(2L)) === p.toLong)
    def bfCands(p: Int) = {
      val q = side(p).select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("__qv"))
      val n = side(1 - p).select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("__nv"))
      q.crossJoin(n).select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("__qv"), col("__nv")).as("cosine"))
    }
    s21MinedPairs(bfCands(0), bfCands(1))
  }

  val s21_bitext_mining: Q = (s, dir) => {
    val idx = s03Index(s, dir)
    val emb = t(s, dir, "embeddings")
    def side(p: Int) = emb.where(pmod(col("vec_id"), lit(2L)) === p.toLong)
    def cands(p: Int): DataFrame =
      idx.searchRadius(side(p), "vec_id", "embedding",
          threshold = -2.0, nProbe = 8)
        .where(pmod(col("neighbor_id"), lit(2L)) === (1L - p.toLong))
    s21MinedPairs(cands(0), cands(1))
  }

  def s21_sql: String = {
    def sideCtes(tag: String, p: Int): String =
      s"""p$tag AS (SELECT vec_id AS query_id, list_id FROM (
         |  SELECT vec_id, list_id,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
         |  FROM dist WHERE vec_id % 2 = $p) WHERE rn <= 8),
         |c$tag AS (SELECT DISTINCT query_id, neighbor_id
         | FROM p$tag JOIN assign USING (list_id)
         | WHERE neighbor_id <> query_id AND neighbor_id % 2 = ${1 - p}),
         |s$tag AS (SELECT query_id, neighbor_id,
         |    CAST(ROUND($cosSql * 1000000.0) AS BIGINT) AS ce6
         | FROM c$tag JOIN e a ON a.vec_id = query_id
         |            JOIN e b ON b.vec_id = neighbor_id),
         |k$tag AS (SELECT query_id, CAST(SUM(ce6) AS BIGINT) AS sk,
         |    CAST(COUNT(*) AS BIGINT) AS nk FROM (
         |  SELECT query_id, ce6,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY ce6 DESC, neighbor_id ASC) AS rn
         |  FROM s$tag) WHERE rn <= $S21K GROUP BY query_id)""".stripMargin
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |$s03AssignSqlCtes,
       |${sideCtes("fw", 0)},
       |${sideCtes("bw", 1)},
       |mf AS (SELECT s.query_id, s.neighbor_id, s.ce6,
       |    CAST(s.ce6 * 2 * q.nk * n.nk AS DOUBLE)
       |      / CAST(q.sk * n.nk + n.sk * q.nk AS DOUBLE) AS margin
       |  FROM sfw s JOIN kfw q ON q.query_id = s.query_id
       |             JOIN kbw n ON n.query_id = s.neighbor_id
       |  WHERE q.sk * n.nk + n.sk * q.nk > 0),
       |mb AS (SELECT s.query_id, s.neighbor_id, s.ce6,
       |    CAST(s.ce6 * 2 * q.nk * n.nk AS DOUBLE)
       |      / CAST(q.sk * n.nk + n.sk * q.nk AS DOUBLE) AS margin
       |  FROM sbw s JOIN kbw q ON q.query_id = s.query_id
       |             JOIN kfw n ON n.query_id = s.neighbor_id
       |  WHERE q.sk * n.nk + n.sk * q.nk > 0),
       |tf AS (SELECT query_id AS x_id, neighbor_id AS y_id, ce6, margin
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY margin DESC, neighbor_id ASC) AS rn FROM mf)
       |  WHERE rn = 1 AND margin >= $S21MarginThreshold),
       |tb AS (SELECT query_id AS y_id, neighbor_id AS x_id
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY margin DESC, neighbor_id ASC) AS rn FROM mb)
       |  WHERE rn = 1)
       |SELECT tf.x_id, tf.y_id,
       |  CAST(tf.ce6 AS DOUBLE) / 1000000.0 AS cosine, tf.margin,
       |  (tb.x_id IS NOT NULL) AS is_mutual
       |FROM tf LEFT JOIN tb ON tb.x_id = tf.x_id AND tb.y_id = tf.y_id""".stripMargin
  }

  /** s22's shared ln-term bindings: for a frame with a positive
    * BIGINT count column `n`, the e-3-quantized entropy term
    * round(n·ln n · 10³) — [[graft.functions.PortableMath]]'s
    * bit-identical ln, so every term is the SAME integer in both
    * engines and the entropy sums are exact order-free folds. The
    * e-3 scale keeps n·ln n·10³ inside BIGINT for n up to ~2·10¹⁴
    * counts per cell — beyond any per-cluster mass (the cell frame is
    * cluster×label bounded).
    */
  private def s22LnBindings: graft.functions.PortableMath.Bindings = {
    import graft.functions.PortableMath._
    lnPosBigint("n", "__s22ln") :+
      ("__u_e3" -> roundedUnits(
        Dual.col("n").toDouble * Dual.col("__s22ln"), 3))
  }

  /** s22: cluster-quality eval (purity + NMI) of the fitted s03
    * coarse quantizer against the embeddings table's label column —
    * the eval face of the embedding family (build s03 → serve
    * s03/s20 → mine s21 → measure recall s19 → and NOW measure
    * whether the quantizer's partition agrees with ground truth,
    * which is what decides if cluster-based curation/near-dup
    * blocking over these lists can be trusted). Purity is pure
    * integer arithmetic (Σ per-cluster majority mass ·10⁶ div N);
    * the information-theoretic readout uses the exact contingency
    * identity MI·N·ln-units = Σn_cl·ln n_cl − Σn_c·ln n_c −
    * Σn_l·ln n_l + N·ln N with every n·ln n term quantized to an e-3
    * BIGINT through PortableMath's bit-identical ln
    * ([[s22LnBindings]]) — the sums are exact decimal folds at any
    * partitioning, the final H(C), H(L), MI and NMI are a FIXED
    * written sequence of IEEE steps over those exact integers
    * (decimal→double through the q120 string bridge), and
    * NMI = MI/√(H(C)·H(L)) goes NULL when either marginal entropy is
    * degenerate (the ksTail rule). The oracle replays assignment
    * from the dumped centroid bits ([[s03AssignSqlCtes]], shared
    * verbatim) and the identical binding-generated ln chains.
    *
    * Scale shape: one equi-join (assignment ⋈ labels, 8-byte keys)
    * collapsing straight into the cluster×label-bounded contingency;
    * everything downstream runs on that bounded frame (margins, a
    * per-cluster max, four broadcast 1-row folds into the report
    * row).
    */
  val s22_cluster_eval: Q = (s, dir) => {
    val idx = s03Index(s, dir)
    val cells = idx.listed
      .select(col("neighbor_id").as("vec_id"),
        col("ivf_list").cast("long").as("cluster"))
      .join(t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label")),
        "vec_id")
      .groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("n"))
    s22EvalOf(cells)
  }

  /** The purity/NMI readout over an explicit (cluster, label, n)
    * contingency frame — split out so the spec can pin the entropy
    * algebra against an independent driver-side math.log computation
    * on planted contingencies (perfect, independent, degenerate):
    * the plan and the oracle SHARE the binding-generated ln chains,
    * so a bug there is the q143 shared-constant class the hash
    * compare cannot see.
    */
  private[graft] def s22EvalOf(cells0: DataFrame): DataFrame = {
    import graft.functions.PortableMath
    val cells = cells0
      .localCheckpoint(true) // margins, purity, totals, cell terms
    def uSum(df: DataFrame): DataFrame =
      PortableMath.withBindings(df, s22LnBindings)
        .agg(sum(col("__u_e3").cast("decimal(38,0)")).as("__s"))
    val sCl = uSum(cells.select(col("n")))
    val sC = uSum(cells.groupBy(col("cluster")).agg(sum(col("n")).as("n")))
    val sL = uSum(cells.groupBy(col("label")).agg(sum(col("n")).as("n")))
    val tot = cells.agg(sum(col("n")).as("n"),
        count_distinct(col("cluster")).as("n_clusters"),
        count_distinct(col("label")).as("n_labels"))
      .localCheckpoint(true) // joins the report AND feeds N·lnN
    val uN = PortableMath.withBindings(tot.select(col("n")), s22LnBindings)
      .select(col("__u_e3").cast("decimal(38,0)").as("__un"))
    val pur = cells.groupBy(col("cluster")).agg(max(col("n")).as("__mx"))
      .agg(sum(col("__mx")).as("__pmx"))
    val one = tot
      .crossJoin(broadcast(sCl.select(col("__s").as("__scl"))))
      .crossJoin(broadcast(sC.select(col("__s").as("__sc"))))
      .crossJoin(broadcast(sL.select(col("__s").as("__sl"))))
      .crossJoin(broadcast(uN))
      .crossJoin(broadcast(pur))
    def dd(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast("string").cast("double")
    val nD = col("n").cast("double")
    val hc = dd(col("__un") - col("__sc")) / nD / lit(1000.0)
    val hl = dd(col("__un") - col("__sl")) / nD / lit(1000.0)
    val mi = dd(col("__scl") - col("__sc") - col("__sl") + col("__un")) /
      nD / lit(1000.0)
    val degen = !(hc > lit(0.0)) || !(hl > lit(0.0))
    val nullD = lit(null).cast("double")
    one.select(col("n").as("n_vectors"), col("n_clusters"),
      col("n_labels"),
      expr("CAST(__pmx AS DECIMAL(38,0)) * 1000000L div n").as("purity_e6"),
      hc.as("h_cluster"), hl.as("h_label"),
      when(degen, nullD).otherwise(mi).as("mi"),
      when(degen, nullD).otherwise(mi / sqrt(hc * hl)).as("nmi"))
  }

  def s22_sql: String = {
    import graft.functions.PortableMath
    def lnChain(base: String): String =
      PortableMath.sqlWithBindings(base, s22LnBindings)
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |$s03AssignSqlCtes,
       |cells AS (SELECT a.list_id AS cluster,
       |    CAST(b.label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM assign a JOIN embeddings b ON b.vec_id = a.neighbor_id
       |  GROUP BY 1, 2),
       |scl AS (SELECT SUM(__u_e3) AS s FROM
       |  (${lnChain("SELECT n FROM cells")})),
       |sc AS (SELECT SUM(__u_e3) AS s FROM (${lnChain(
      "SELECT CAST(SUM(n) AS BIGINT) AS n FROM cells GROUP BY cluster")})),
       |sl AS (SELECT SUM(__u_e3) AS s FROM (${lnChain(
      "SELECT CAST(SUM(n) AS BIGINT) AS n FROM cells GROUP BY label")})),
       |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
       |    CAST(COUNT(DISTINCT cluster) AS BIGINT) AS n_clusters,
       |    CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels
       |  FROM cells),
       |tu AS (SELECT __u_e3 AS un FROM
       |  (${lnChain("SELECT n FROM tot")})),
       |pm AS (SELECT SUM(mx) AS pmx FROM
       |  (SELECT cluster, MAX(n) AS mx FROM cells GROUP BY 1)),
       |one AS (SELECT tot.*, scl.s AS scl, sc.s AS scc, sl.s AS sll,
       |    tu.un AS un, pm.pmx AS pmx
       |  FROM tot CROSS JOIN scl CROSS JOIN sc CROSS JOIN sl
       |  CROSS JOIN tu CROSS JOIN pm),
       |fin AS (SELECT n, n_clusters, n_labels,
       |    CAST(pmx * 1000000 // n AS BIGINT) AS purity_e6,
       |    CAST(CAST(un - scc AS VARCHAR) AS DOUBLE)
       |      / CAST(n AS DOUBLE) / 1000.0 AS hc,
       |    CAST(CAST(un - sll AS VARCHAR) AS DOUBLE)
       |      / CAST(n AS DOUBLE) / 1000.0 AS hl,
       |    CAST(CAST(scl - scc - sll + un AS VARCHAR) AS DOUBLE)
       |      / CAST(n AS DOUBLE) / 1000.0 AS mi0
       |  FROM one)
       |SELECT n AS n_vectors, n_clusters, n_labels, purity_e6,
       |  hc AS h_cluster, hl AS h_label,
       |  CASE WHEN NOT (hc > 0.0) OR NOT (hl > 0.0) THEN NULL
       |       ELSE mi0 END AS mi,
       |  CASE WHEN NOT (hc > 0.0) OR NOT (hl > 0.0) THEN NULL
       |       ELSE mi0 / sqrt(hc * hl) END AS nmi
       |FROM fin""".stripMargin
  }

  // ---------------------------------------------- s23 PCA / whitening

  private val s23Models =
    scala.collection.concurrent.TrieMap[String, graft.similarity.Pca.Model]()

  private def s23ModelPath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/s23_pca_$key"
  }

  private[graft] val S23K = 4
  private[graft] val S23Dim = 64
  private[graft] val S23MaxSample = 4096

  /** One PCA fit per fixture dir (the qcFits pure-cache discipline);
    * each call re-dumps the model tables to the per-dir path so the
    * oracle replays from THIS run's fixtures.
    */
  /** Fit the PCA model on an explicit embeddings frame — bounded
    * deterministic sample: the smallest-vec_id rows, the
    * bpeModel/PqCodebook driver-fit discipline. Quantization to e-6
    * mirrors the plan's round() (never lands on a .5 boundary:
    * float×10⁶ is dyadic, k.5·10⁻⁶ is not float-representable).
    * Shared by the per-dir cached fit below and the streaming read
    * side ([[graft.streaming.StreamingIngest.currentPcaWhitening]] —
    * a read-time refit over the maintained store, the c09 rule: a
    * late vector inside the sample boundary changes the model, which
    * no carried moments could get right once dedup/first-write-wins
    * is in play).
    */
  private[graft] def fitPca(emb: DataFrame): graft.similarity.Pca.Model = {
    val sample = emb
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(S23MaxSample)
      .collect()
      .map(_.getSeq[Float](1).toArray
        .map(x => math.round(x.toDouble * 1e6)))
      .toSeq
    // dim inferred from the data so the fit also serves non-64-dim
    // stores (the streaming read side's spec corpus)
    val dim = sample.headOption.map(_.length).getOrElse(S23Dim)
    graft.similarity.Pca.fit(sample, dim, math.min(S23K, dim))
  }

  private[graft] def s23Model(s: SparkSession,
      dir: String): graft.similarity.Pca.Model = {
    val m = s23Models.getOrElseUpdate(dir, fitPca(t(s, dir, "embeddings")))
    import s.implicits._
    val path = s23ModelPath(dir)
    // n rides at j = -1 (the bias-at-bucket-−1 move)
    ((-1L, m.n) +: m.sums.toSeq.zipWithIndex
        .map { case (v, j) => (j.toLong, v) })
      .toDF("j", "s")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/means")
    (for (k <- 0 until S23K; j <- 0 until S23Dim)
      yield (k.toLong + 1L, j.toLong, m.loadings(k)(j)))
      .toDF("k", "j", "v_e6")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/load")
    m.sigE6.toSeq.zipWithIndex.map { case (v, k) => (k.toLong + 1L, v) }
      .toDF("k", "sig_e6")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/sig")
    m
  }

  /** s23: PCA projection + whitening over the embeddings table — the
    * learned linear dimensionality reduction the s-series lacked
    * (s05/s17 quantize, LSH planes are RANDOM projections; PCA is the
    * standard pre-step before semantic dedup / clustering at scale,
    * and composes with d11's SemDeDup as its input transform). The
    * model ([[graft.similarity.Pca]]) is a bounded driver fit —
    * exact integer moments over the ≤[[S23MaxSample]] smallest-id
    * rows, deterministic Jacobi eigensolve on the 64×64 covariance,
    * sign-canonicalized top-[[S23K]] eigenvectors — dumped in e-6
    * integer units for the oracle's replay (the s03 centroid-dump
    * recipe: the fit itself is not SQL-replayable; everything
    * downstream of the dump is, exactly).
    *
    * Projection is exact-integer: pc_num_k = Σ_j (n·xq_j − S_j)·v_e6
    * is an exact BIGINT at any partitioning (|num| ≤ 5·10¹⁷), and
    * pc_k = num/(n·10¹²), w_k = num/(n·10⁶·sig_e6) are each ONE IEEE
    * division of two exact integers — bit-identical cross-engine. A
    * degenerate component (sig_e6 = 0) whitens to NULL, the ksTail
    * rule. Scale shape: ONE narrow codegen projection over the
    * corpus — zip_with/aggregate per row, constants riding as
    * literals — no shuffle, no join, no window at any size.
    */
  /** The exact-integer projection numerators per vector —
    * (vec_id, __n1..__nK) with __nk = Σ_j (n·xq_j − S_j)·v_e6 —
    * shared by the s23 projection query and s24's pc-space recall
    * eval (cosine cancels the common n·10¹² scale, so the numerators
    * ARE the pc-space coordinates up to a positive factor).
    */
  private def s23Numerators(emb: DataFrame,
      m: graft.similarity.Pca.Model): DataFrame = {
    val nL = m.n
    val xq = expr("transform(embedding, x -> " +
      "CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT))")
    val cent = zip_with(xq, typedlit(m.sums.toSeq),
      (x, sj) => x * lit(nL) - sj)
    val staged = emb.select(col("vec_id"), cent.as("__cent"))
    m.loadings.indices.foldLeft(staged) { (df, k) =>
      df.withColumn(s"__n${k + 1}",
        aggregate(
          zip_with(col("__cent"), typedlit(m.loadings(k).toSeq),
            (c, v) => c * v),
          lit(0L), (acc, x) => acc + x))
    }.drop("__cent")
  }

  /** The projection + whitening tail over an explicit embeddings
    * frame and fitted model — shared verbatim by the s23 query and
    * the streaming read side, so the stream-derived projection EQUALS
    * the batch one on the union of batches (spec-asserted).
    */
  private[graft] def pcaWhitenOf(emb: DataFrame,
      m: graft.similarity.Pca.Model): DataFrame = {
    val nL = m.n
    val withNums = s23Numerators(emb, m)
    val pcs = m.loadings.indices.map { k =>
      (col(s"__n${k + 1}").cast("double") /
        lit(nL * 1000000000000L).cast("double")).as(s"pc${k + 1}")
    }
    val ws = m.loadings.indices.map { k =>
      val sig = m.sigE6(k)
      (if (sig > 0L)
        col(s"__n${k + 1}").cast("double") /
          lit(nL * 1000000L * sig).cast("double")
      else lit(null).cast("double")).as(s"w${k + 1}")
    }
    withNums.select(col("vec_id") +: (pcs ++ ws): _*)
  }

  val s23_pca_whitening: Q = (s, dir) =>
    pcaWhitenOf(t(s, dir, "embeddings"), s23Model(s, dir))

  /** The s23 model-replay CTE prefix (embeddings → e-6 quantization →
    * exact centered numerators per component, ending in
    * `nmr(vec_id, nn, sg1.., n1..)`) — ONE statement of the dumped
    * model's algebra, spliced by the s23 oracle AND s24's pc-space
    * recall eval.
    */
  private def s23NumSqlCtes: String = {
    val path = s23ModelPath(oracleSfDir)
    val loadCtes = (1 to S23K).map(k =>
      s"""l$k AS (SELECT LIST(v_e6 ORDER BY j) AS lv
         |  FROM read_parquet('$path/load/*.parquet') WHERE k = $k),
         |g$k AS (SELECT sig_e6 FROM read_parquet('$path/sig/*.parquet')
         |  WHERE k = $k)""".stripMargin).mkString(",\n")
    val nums = (1 to S23K).map(k =>
      s"""    list_reduce(list_transform(generate_series(1, $S23Dim),
         |      i -> cent[i] * l$k.lv[i]), (a, b) -> a + b) AS n$k"""
        .stripMargin).mkString(",\n")
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |mn AS (SELECT s AS nn FROM read_parquet('$path/means/*.parquet')
       |       WHERE j = -1),
       |ms AS (SELECT LIST(s ORDER BY j) AS sv
       |       FROM read_parquet('$path/means/*.parquet') WHERE j >= 0),
       |$loadCtes,
       |x AS (SELECT vec_id,
       |    list_transform(v, x -> CAST(ROUND(x * 1000000.0) AS BIGINT))
       |      AS xq
       |  FROM e),
       |c AS (SELECT vec_id,
       |    list_transform(generate_series(1, $S23Dim),
       |      i -> mn.nn * xq[i] - ms.sv[i]) AS cent
       |  FROM x CROSS JOIN mn CROSS JOIN ms),
       |nmr AS (SELECT vec_id, mn.nn,
       |${(1 to S23K).map(k => s"    g$k.sig_e6 AS sg$k").mkString(",\n")},
       |$nums
       |  FROM c CROSS JOIN mn
       |${(1 to S23K).map(k => s"  CROSS JOIN l$k CROSS JOIN g$k")
        .mkString("\n")})""".stripMargin
  }

  def s23_sql: String = {
    val outs = (1 to S23K).map(k =>
      s"""  CAST(n$k AS DOUBLE) / CAST(nn * 1000000000000 AS DOUBLE)
         |    AS pc$k""".stripMargin).mkString(",\n")
    val wouts = (1 to S23K).map(k =>
      s"""  CASE WHEN sg$k > 0 THEN CAST(n$k AS DOUBLE)
         |    / CAST(nn * 1000000 * sg$k AS DOUBLE) END AS w$k"""
        .stripMargin).mkString(",\n")
    s"""WITH $s23NumSqlCtes
       |SELECT vec_id,
       |$outs,
       |$wouts
       |FROM nmr""".stripMargin
  }

  /** s24: recall of PC-SPACE retrieval against the exact full-space
    * top-10 — the eval that prices the s23 reduction (the s19
    * discipline applied to dimensionality reduction instead of an
    * index): per probe query, how much of the exact 64-dim cosine
    * top-10 does ranking by 4-dim PCA cosine recover? Both sides are
    * deterministic-exact: the full-space baseline is s19's brute
    * scan; the pc-space side ranks by cosine over the EXACT integer
    * projection numerators (the n·10¹² scale cancels in cosine, so
    * the numerators ARE pc-space coordinates) converted once to
    * doubles — identical op order both engines, id tie-breaks, so
    * the recall NUMBER is engine-independent. Composes the s23 dump:
    * the oracle replays the projection through the shared
    * [[s23NumSqlCtes]] and the ranking through the same 4-dim cosine.
    *
    * Scale shape: the exact side brute-forces per PROBE (5 here, a
    * sample by construction — the s19 rule); the pc side is the same
    * probe-bounded scan over 4-dim vectors.
    *
    * Reading the number: the fixture embeddings are near-ISOTROPIC
    * (4 of 64 PCs carry ~6% of the variance), so the fixture recall
    * is legitimately near zero — the eval CORRECTLY prices a 4-dim
    * cut of this corpus as unsafe for retrieval, which is precisely
    * the decision it exists to inform. SimilaritySpec proves the
    * other direction on a planted anisotropic corpus (pc-space
    * recall ≥ 0.8 when low-rank structure actually exists).
    */
  val s24_pca_recall: Q = (s, dir) => {
    val m = s23Model(s, dir)
    val emb = t(s, dir, "embeddings")
    val exact = Similarity.bruteForceTopK(
        emb.where(col("vec_id") < 5), emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val pcv = s23Numerators(emb, m)
      .select(col("vec_id"),
        array((1 to S23K).map(k => col(s"__n$k").cast("double")): _*)
          .as("__pcv"))
    val approx = Similarity.bruteForceTopK(
        pcv.where(col("vec_id") < 5), pcv,
        "vec_id", "__pcv", "vec_id", "__pcv", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), lit(10L).as("k"), col("n_exact"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_exact"))
          .as("recall"))
  }

  def s24_sql: String = {
    val cos4 =
      s"""CASE WHEN list_sum(list_transform(a.v, x -> x * x)) = 0
         |       OR list_sum(list_transform(b.v, x -> x * x)) = 0 THEN 0.0
         |     ELSE list_sum(list_transform(generate_series(1, $S23K),
         |            i -> a.v[i] * b.v[i])) /
         |          (sqrt(list_sum(list_transform(a.v, x -> x * x)))
         |           * sqrt(list_sum(list_transform(b.v, x -> x * x))))
         |END""".stripMargin
    s"""WITH $s23NumSqlCtes,
       |xc AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    $cosSql AS cos
       | FROM e a JOIN e b ON b.vec_id <> a.vec_id WHERE a.vec_id < 5),
       |xr AS (SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM xc) WHERE rank <= 10),
       |pv AS (SELECT vec_id,
       |    [${(1 to S23K).map(k => s"CAST(n$k AS DOUBLE)").mkString(", ")}]
       |      AS v
       |  FROM nmr),
       |ac AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    $cos4 AS cos
       | FROM pv a JOIN pv b ON b.vec_id <> a.vec_id WHERE a.vec_id < 5),
       |ar AS (SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM ac) WHERE rank <= 10),
       |hx AS (SELECT query_id, COUNT(*) AS n_exact FROM xr GROUP BY 1),
       |hh AS (SELECT x.query_id, COUNT(*) AS n_hits
       | FROM xr x JOIN ar a USING (query_id, neighbor_id) GROUP BY 1)
       |SELECT hx.query_id, CAST(10 AS BIGINT) AS k, hx.n_exact,
       |  CAST(COALESCE(hh.n_hits, 0) AS BIGINT) AS n_hits,
       |  CAST(COALESCE(hh.n_hits, 0) AS DOUBLE) / hx.n_exact AS recall
       |FROM hx LEFT JOIN hh USING (query_id)""".stripMargin
  }

  private val graphAnnIndexes =
    scala.collection.concurrent.TrieMap[String, graft.similarity.GraphAnn.Index]()

  private def graphAnnPath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/graphann_$key"
  }

  /** The s25 graph-ANN serving index — built once per dir from the
    * SAME LSH fit as s15 (one fit, many consumers — the s03/s19
    * discipline) at serving out-degree 8, and dumped (graph edges +
    * entry points) so the oracle replays the walk over this run's
    * exact persisted index, the s03 dump-then-replay protocol.
    */
  private def s25Index(s: SparkSession, dir: String): graft.similarity.GraphAnn.Index =
    graphAnnIndexes.getOrElseUpdate(dir, {
      val built = graft.similarity.GraphAnn.build(
        lshKnnIndex(s, dir)._2, degree = 8, nEntries = 4)
      built.graph.coalesce(1).write.mode("overwrite")
        .parquet(s"${graphAnnPath(dir)}/graph.parquet")
      built.entries.coalesce(1).write.mode("overwrite")
        .parquet(s"${graphAnnPath(dir)}/entry.parquet")
      built
    })

  /** s25: graph-ANN beam serving ([[graft.similarity.GraphAnn]]) —
    * greedy beam search over the persisted s15-family kNN graph, the
    * NSW/HNSW search shape production vector stores default to and
    * the one family (next to LSH s02, IVF s03, PQ s17/s18) this
    * engine lacked. Entry = persisted approximate medoids; 6 hops of
    * expand-along-edges → score → merge → beam-32 cut (HNSW's ef —
    * wider than the answer so the walk has exploration slack), then
    * the final top-10, every cut by (cos DESC, id ASC) through
    * [[graft.plans.TopKPerKey]]. Fixed hop count keeps the recurrence
    * exactly unrollable: the oracle replays all 6 hops as chained SQL
    * CTEs over the DUMPED graph + entries, so the hash certifies the
    * walk itself hop by hop. Per-hop cost is beam-bounded (≤
    * |Q|·beam·outDegree scored rows, spec-asserted on the hop
    * candidate frames), independent of corpus size; recall@10 vs s01
    * brute force is spec-gated ≥ 0.85.
    */
  val s25_graph_ann: Q = (s, dir) => {
    val idx = s25Index(s, dir)
    graft.similarity.GraphAnn.search(idx,
        t(s, dir, "embeddings").where(col("vec_id") < 5),
        "vec_id", "embedding", k = 10, beam = 32, hops = 6)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"),
        col("rank").cast("long").as("rank"))
  }

  /** The unrolled beam-walk oracle, parameterized over the dumped
    * index, the corpus/query predicates, and the (beam, hops, k)
    * geometry — one recurrence definition for the s25 serving oracle
    * AND the s26 insert oracle (whose "found neighbors" ARE this walk
    * at k = the insert degree over the pre-insert graph).
    */
  private def graphAnnWalkSql(fixDir: String, corpusPred: String,
      queryPred: String, beam: Int, hops: Int, k: Int): String = {
    // the search-side cosine with explicit (q.qv, b.v) aliases — the
    // same zero-norm-guarded sequential form as cosSql
    val cosQB =
      """CASE WHEN list_sum(list_transform(q.qv, x -> x * x)) = 0
        |       OR list_sum(list_transform(b.v, x -> x * x)) = 0 THEN 0.0
        |     ELSE list_sum(list_transform(generate_series(1, 64), i -> q.qv[i] * b.v[i])) /
        |          (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
        |           * sqrt(list_sum(list_transform(b.v, x -> x * x)))) END"""
        .stripMargin
    // hop i unrolled: expand beam(i-1) along dumped edges, score, set-
    // union with the beam (exact-duplicate rows collapse — the same
    // idempotent merge as the Spark side's distinct), cut to the beam
    val hopCtes = (1 to hops).map { i =>
      s"""cand$i AS (SELECT DISTINCT b.query_id, g.dst AS node
         | FROM beam${i - 1} b JOIN g ON g.src = b.node),
         |sc$i AS (SELECT c.query_id, c.node, $cosQB AS cos
         | FROM cand$i c JOIN e b ON b.vec_id = c.node
         |               JOIN q ON q.query_id = c.query_id
         | WHERE c.node <> c.query_id),
         |u$i AS (SELECT query_id, node, cos FROM beam${i - 1}
         |        UNION SELECT query_id, node, cos FROM sc$i),
         |beam$i AS (SELECT query_id, node, cos FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, node ASC) AS rn FROM u$i) WHERE rn <= $beam)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |e AS (SELECT vec_id, v FROM e0 WHERE $corpusPred),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e0 WHERE $queryPred),
       |g AS (SELECT src, dst
       | FROM read_parquet('$fixDir/graph.parquet/*.parquet')),
       |ent AS (SELECT node
       | FROM read_parquet('$fixDir/entry.parquet/*.parquet')),
       |sc0 AS (SELECT q.query_id, ent.node, $cosQB AS cos
       | FROM q CROSS JOIN ent JOIN e b ON b.vec_id = ent.node
       | WHERE ent.node <> q.query_id),
       |beam0 AS (SELECT query_id, node, cos FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, node ASC) AS rn FROM sc0) WHERE rn <= $beam),
       |$hopCtes,
       |fin AS (SELECT query_id, node, cos,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |                     ORDER BY cos DESC, node ASC) AS rank
       | FROM beam$hops)
       |SELECT query_id, node AS neighbor_id, ROUND(cos, 6) AS cosine, rank
       |FROM fin WHERE rank <= $k""".stripMargin
  }

  def s25_sql: String =
    graphAnnWalkSql(graphAnnPath(oracleSfDir), corpusPred = "TRUE",
      queryPred = "vec_id < 5", beam = 32, hops = 6, k = 10)

  private val graphAnnRestIndexes =
    scala.collection.concurrent.TrieMap[String, graft.similarity.GraphAnn.Index]()

  private def graphAnnRestPath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/graphann_rest_$key"
  }

  /** The s26 PRE-INSERT index: built over the corpus MINUS the delta
    * decile (vec_id % 10 ≠ 0), dumped so the oracle replays the
    * insert walk over this exact graph. Its own LSH fit (adaptive
    * planes over the rest count — the lshKnnIndex policy).
    */
  private def s26Index(s: SparkSession, dir: String): graft.similarity.GraphAnn.Index =
    graphAnnRestIndexes.getOrElseUpdate(dir, {
      val rest = t(s, dir, "embeddings")
        .where(pmod(col("vec_id"), lit(10)) =!= 0)
      val planes = math.max(4,
        math.ceil(math.log(rest.count() / 30.0) / math.log(2.0)).toInt)
      val built = graft.similarity.GraphAnn.build(
        graft.similarity.Similarity.LshIndex.build(
          rest, "vec_id", "embedding", dim = 64, planes = planes, tables = 32),
        degree = 8, nEntries = 4)
      built.graph.coalesce(1).write.mode("overwrite")
        .parquet(s"${graphAnnRestPath(dir)}/graph.parquet")
      built.entries.coalesce(1).write.mode("overwrite")
        .parquet(s"${graphAnnRestPath(dir)}/entry.parquet")
      built
    })

  /** s26: graph-ANN INSERT ([[graft.similarity.GraphAnn.insert]]) —
    * the index-maintenance face s25 alone lacks, the s13 delta-append
    * move for the graph family: every tenth vector plays the arriving
    * delta, the index is built on the rest, and each delta vector
    * beam-searches the pre-insert graph for the top-16 neighbors it
    * connects to (both directions; new↔new edges deferred to rebuild,
    * classic batch NSW). The emitted rows ARE the insert's edge
    * selection — (new id, neighbor, cosine, rank ≤ 16) — so the
    * oracle replaying the same unrolled walk over the DUMPED
    * pre-insert graph certifies the maintenance recurrence itself;
    * SimilaritySpec proves the index-level behavior (inserted nodes
    * retrievable at cos 1.0 by their own vectors, bidirectional
    * edges, corpus growth).
    */
  val s26_graph_ann_insert: Q = (s, dir) => {
    val idx = s26Index(s, dir)
    graft.similarity.GraphAnn.search(idx,
        t(s, dir, "embeddings").where(pmod(col("vec_id"), lit(10)) === 0),
        "vec_id", "embedding", k = 16, beam = 32, hops = 6)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"),
        col("rank").cast("long").as("rank"))
  }

  def s26_sql: String =
    graphAnnWalkSql(graphAnnRestPath(oracleSfDir),
      corpusPred = "vec_id % 10 <> 0", queryPred = "vec_id % 10 = 0",
      beam = 32, hops = 6, k = 16)

  /** s19: ANN recall@k — the index-quality eval every serving stack
    * runs before trusting an approximate index: per probe query, how
    * much of the EXACT cosine top-10 (the s01 baseline) does the s03
    * IVF index return at nProbe=8? Both sides are deterministic
    * pipelines this registry already hash-checks individually; s19
    * composes them under ONE oracle, so the recall NUMBER itself — not
    * just each side — is engine-independent. SimilaritySpec's recall
    * floor (0.9 at this configuration) guards quality; s19 puts the
    * per-query figure on the dashboard. `recall` is a single division
    * of exact integers (bit-identical cross-engine).
    *
    * Scale shape: the exact side is the s01 broadcast-probe scan
    * (|probes| fixed); the IVF side touches 8 of nLists inverted
    * lists; the recall join is ≤ k·|probes| rows. At 100 TB the exact
    * baseline runs on a SAMPLE of queries by construction (5 probes
    * here) — recall eval never brute-forces the whole corpus per
    * query, it brute-forces per PROBE, which is the standard recipe.
    */
  val s19_ann_recall: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val exact = Similarity.bruteForceTopK(
        e.where(col("vec_id") < 5), e,
        "vec_id", "embedding", "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val approx = s03Index(s, dir)
      .search(e.where(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, nProbe = 8)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), lit(10L).as("k"), col("n_exact"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_exact"))
          .as("recall"))
  }

  def s19_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |xc AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    $cosSql AS cos
       | FROM e a JOIN e b ON b.vec_id <> a.vec_id WHERE a.vec_id < 5),
       |xr AS (SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM xc) WHERE rank <= 10),
       |$s03CoreSqlCtes,
       |ac AS (SELECT query_id, neighbor_id, $cosSql AS cos
       | FROM cand JOIN e a ON a.vec_id = query_id
       |           JOIN e b ON b.vec_id = neighbor_id),
       |ar AS (SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |                       ORDER BY cos DESC, neighbor_id ASC) AS rank
       |  FROM ac) WHERE rank <= 10),
       |hx AS (SELECT query_id, COUNT(*) AS n_exact FROM xr GROUP BY 1),
       |hh AS (SELECT x.query_id, COUNT(*) AS n_hits
       | FROM xr x JOIN ar a USING (query_id, neighbor_id) GROUP BY 1)
       |SELECT hx.query_id, CAST(10 AS BIGINT) AS k, hx.n_exact,
       |  CAST(COALESCE(hh.n_hits, 0) AS BIGINT) AS n_hits,
       |  CAST(COALESCE(hh.n_hits, 0) AS DOUBLE) / hx.n_exact AS recall
       |FROM hx LEFT JOIN hh USING (query_id)""".stripMargin

  /** Filtered ANN — vector search under a metadata predicate (the
    * retrieval-serving shape: "nearest neighbors WHERE label ∈ …").
    * The IVF index is built with `metaCols = label` so the predicate
    * PRE-filters the inverted lists before cosine ranking: a selective
    * filter shrinks the scored candidate set and still returns k
    * results, where post-filtering a plain top-k would decimate it.
    * On a persisted index the predicate reaches the probed lists'
    * parquet scan — pushdown composing with list-partition pruning.
    *
    * Same oracle recipe as s03: the query dumps its fitted centroids
    * (deterministic k-means — seeded, bounded fit) and DuckDB replays
    * assignment, probing, the label cut, and the exact-cosine rank.
    * The final ≤ k×|probes|-row label re-attach join is bounded by
    * construction. Recall under the filter is spec-gated in
    * SimilaritySpec against filtered brute-force ground truth.
    */
  private val ivfMetaIndexes =
    scala.collection.concurrent.TrieMap[String, Similarity.IvfIndex]()

  private def ivfMetaCentroidPath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/ivf_centroids_meta_$key.parquet"
  }

  /** The shared metadata-carrying IVF index (s09 filtered ANN + d11
    * semantic dedup). Whichever query runs first builds it and dumps
    * the fitted centroids for the oracle replay — the build is
    * deterministic (seeded, bounded fit), so the dump's bits do not
    * depend on which query wins.
    */
  private def ivfMetaIndex(s: SparkSession, dir: String): Similarity.IvfIndex =
    ivfMetaIndexes.getOrElseUpdate(dir, {
      val built = Similarity.IvfIndex.build(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        nLists = 0, metaCols = Seq("label"))
      import s.implicits._
      built.centroids.zipWithIndex.map { case (c, i) => (i, c) }
        .toDF("list_id", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(ivfMetaCentroidPath(dir))
      built
    })

  val s09_filtered_ann: Q = (s, dir) => {
    val idx = ivfMetaIndex(s, dir)
    idx.search(
        t(s, dir, "embeddings").where(col("vec_id") >= 5 && col("vec_id") < 10),
        "vec_id", "embedding", k = 10, nProbe = 8,
        candidateFilter = Some(col("label") % 4 === 1))
      .join(t(s, dir, "embeddings")
        .select(col("vec_id").as("neighbor_id"), col("label")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("label"),
        round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
  }

  /** DuckDB replay of s09: s03's assignment/probe recipe plus the
    * label pre-filter on candidates before the cosine rank.
    */
  def s09_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |lab AS (SELECT vec_id, label FROM embeddings),
       |ctr AS (SELECT list_id, centroid
       |        FROM read_parquet('${ivfMetaCentroidPath(oracleSfDir)}/*.parquet')),
       |dist AS (SELECT e.vec_id, c.list_id,
       |  ((list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * e.v[i]), (a, b) -> a + b)
       |    - 2.0e0 * list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * c.centroid[i]), (a, b) -> a + b))
       |   + list_reduce(list_transform(c.centroid, x -> x * x),
       |      (a, b) -> a + b)) AS d
       | FROM e CROSS JOIN ctr c),
       |assign AS (SELECT vec_id AS neighbor_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM dist) WHERE rn = 1),
       |probe AS (SELECT vec_id AS query_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM dist WHERE vec_id >= 5 AND vec_id < 10) WHERE rn <= 8),
       |cand AS (SELECT DISTINCT query_id, neighbor_id
       | FROM probe JOIN assign USING (list_id)
       | JOIN lab ON lab.vec_id = neighbor_id
       | WHERE neighbor_id <> query_id AND lab.label % 4 = 1),
       |sc AS (SELECT query_id, neighbor_id, $cosSql AS cos
       | FROM cand JOIN e a ON a.vec_id = query_id
       |           JOIN e b ON b.vec_id = neighbor_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |                     ORDER BY cos DESC, neighbor_id ASC) AS rank
       | FROM sc)
       |SELECT query_id, neighbor_id, lab.label, ROUND(cos, 6) AS cosine, rank
       |FROM r JOIN lab ON lab.vec_id = neighbor_id
       |WHERE rank <= 10""".stripMargin

  /** Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023):
    * cluster the embedding space with the IVF coarse quantizer, then
    * drop, within each cluster, every vector with a higher-id
    * near-twin at cosine ≥ τ — near-duplicate MEANING, where d01/d02
    * catch near-duplicate TEXT. Output: each dropped vector with its
    * kept representative (lowest-id ≥τ neighbor), duplicate count,
    * and max cosine.
    *
    * Scale shape: the candidate pair join is per-cluster (equi-join on
    * `ivf_list`), never all-pairs — at 100 TB `nLists` grows with the
    * corpus so per-list cardinality stays bounded, exactly the
    * published algorithm's clustering step. Reuses the s09 index
    * (shared build + centroid dump), so the oracle replays assignment
    * from the fitted centroids and brute-forces pairs inside each
    * replayed cluster.
    */
  val d11_semantic_dedup: Q = (s, dir) =>
    Dedup.semanticNearDups(t(s, dir, "embeddings"), "embedding", "vec_id",
      threshold = 0.35, index = Some(ivfMetaIndex(s, dir)))

  /** DuckDB replay of d11: centroid-fixture assignment (the s03/s09
    * recipe), within-cluster pairs, threshold, drop-set aggregation.
    */
  def d11_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ctr AS (SELECT list_id, centroid
       |        FROM read_parquet('${ivfMetaCentroidPath(oracleSfDir)}/*.parquet')),
       |dist AS (SELECT e.vec_id, c.list_id,
       |  ((list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * e.v[i]), (a, b) -> a + b)
       |    - 2.0e0 * list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * c.centroid[i]), (a, b) -> a + b))
       |   + list_reduce(list_transform(c.centroid, x -> x * x),
       |      (a, b) -> a + b)) AS d
       | FROM e CROSS JOIN ctr c),
       |assign AS (SELECT vec_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM dist) WHERE rn = 1),
       |p AS (SELECT x.vec_id AS ia, y.vec_id AS ib, $cosSql AS cos
       | FROM assign x JOIN assign y
       |   ON x.list_id = y.list_id AND x.vec_id < y.vec_id
       | JOIN e a ON a.vec_id = x.vec_id
       | JOIN e b ON b.vec_id = y.vec_id)
       |SELECT ib AS vec_id, MIN(ia) AS kept_id, COUNT(*) AS n_dups,
       |  ROUND(MAX(cos), 6) AS max_cosine
       |FROM p WHERE cos >= 0.35 GROUP BY ib""".stripMargin

  /** The full two-stage ANN serving stack: IVF candidate generation
    * (probe the 8 nearest lists — s03's coarse quantizer) feeding the
    * int8 quantized scorer with float re-rank (s06's contract). This is
    * the FAISS-style IVF+SQ composition: at 100 TB the list probe
    * prunes the corpus to probed partitions, the int8 scan cuts memory
    * traffic 4× over a float scan of those lists, and exact cosine
    * touches only the ≤40-per-probe survivors. The candidate join is
    * an equi-join on `ivf_list` (each corpus vector lives in exactly
    * one list, so no dedup stage is needed) — where s06 scans the
    * whole corpus per probe, s10 scans 8 lists.
    *
    * Fully deterministic end-to-end (fixture-replayed assignment,
    * integer dots, id tie-breaks), so the composed approximate path is
    * hash-checked like its pieces.
    */
  val s10_ivf_quant_ann: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val nCand = 40
    val idx = ivfMetaIndex(s, dir)
    def quantize(v: org.apache.spark.sql.Column)
        : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
      val sc = array_max(transform(v, x => abs(x))) / lit(127)
      val qc = transform(v, x => least(lit(127.0), greatest(lit(-127.0),
        round(x / sc, 0))).cast("int"))
      (sc, qc)
    }
    val (scc, qcc) = quantize(col("__cv"))
    val corpus = idx.listed
      .select(col("ivf_list"), col("neighbor_id"),
        scc.as("__scc"), qcc.as("__qc"))
      .where(col("__scc") > 0)
    val e = t(s, dir, "embeddings")
    val pv = col("embedding").cast("array<double>")
    val (scp, qcp) = quantize(pv)
    val probes = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), scp.as("__scp"), qcp.as("__qp"),
        explode_outer(idx.probeLists(col("embedding"), 8)).as("ivf_list"))
      .where(col("__scp") > 0 && col("ivf_list").isNotNull)
    val dot = aggregate(
      zip_with(col("__qp"), col("__qc"), (a, b) => (a * b).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id").asc)
    val candidates = probes.join(corpus, Seq("ivf_list"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot.cast("double") * col("__scp") * col("__scc")).as("approx"))
      .withColumn("__r", row_number().over(wc))
      .where(col("__r") <= nCand)
      .select(col("query_id"), col("neighbor_id"), col("approx"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .join(e.select(col("vec_id").as("query_id"),
        col("embedding").as("__pv")), Seq("query_id"))
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__nv")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("approx"),
        Similarity.cosine(col("__pv"), col("__nv")).as("cosine"))
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= 10)
      .select(col("query_id"), col("neighbor_id"),
        round(col("approx"), 6).as("approx"),
        round(col("cosine"), 6).as("cosine"),
        col("rank").cast("long").as("rank"))
  }

  /** DuckDB replay of s10: centroid-fixture assignment + probing (s03
    * recipe) composed with the int8 quantize → integer dot → float
    * re-rank arithmetic (s06 recipe).
    */
  def s10_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ctr AS (SELECT list_id, centroid
       |        FROM read_parquet('${ivfMetaCentroidPath(oracleSfDir)}/*.parquet')),
       |dist AS (SELECT e.vec_id, c.list_id,
       |  ((list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * e.v[i]), (a, b) -> a + b)
       |    - 2.0e0 * list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * c.centroid[i]), (a, b) -> a + b))
       |   + list_reduce(list_transform(c.centroid, x -> x * x),
       |      (a, b) -> a + b)) AS d
       | FROM e CROSS JOIN ctr c),
       |assign AS (SELECT vec_id AS neighbor_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM dist) WHERE rn = 1),
       |probe AS (SELECT vec_id AS query_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM dist WHERE vec_id < 5) WHERE rn <= 8),
       |qz AS (SELECT vec_id, v,
       |  list_max(list_transform(v, x -> abs(x))) / 127 AS sc FROM e),
       |q AS (SELECT vec_id, v, sc,
       |    list_transform(generate_series(1, 64),
       |      i -> CAST(LEAST(127.0, GREATEST(-127.0, ROUND(v[i] / sc, 0)))
       |        AS INT)) AS qc
       |  FROM qz WHERE sc > 0),
       |sc0 AS (SELECT p.query_id, s.neighbor_id,
       |    CAST(list_sum(list_transform(generate_series(1, 64),
       |      i -> CAST(a.qc[i] * b.qc[i] AS BIGINT))) AS DOUBLE)
       |      * a.sc * b.sc AS approx
       |  FROM probe p JOIN assign s USING (list_id)
       |  JOIN q a ON a.vec_id = p.query_id
       |  JOIN q b ON b.vec_id = s.neighbor_id
       |  WHERE s.neighbor_id <> p.query_id),
       |cnd AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY approx DESC, neighbor_id ASC) AS r FROM sc0),
       |rr AS (SELECT c.query_id, c.neighbor_id, c.approx, $cosSql AS cos
       |  FROM cnd c
       |  JOIN e a ON a.vec_id = c.query_id
       |  JOIN e b ON b.vec_id = c.neighbor_id
       |  WHERE c.r <= 40),
       |rk AS (SELECT query_id, neighbor_id, approx, cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id ASC) AS rank FROM rr)
       |SELECT query_id, neighbor_id, ROUND(approx, 6) AS approx,
       |  ROUND(cos, 6) AS cosine, rank
       |FROM rk WHERE rank <= 10""".stripMargin

  /** Hybrid retrieval — reciprocal-rank fusion (Cormack et al.,
    * SIGIR'09: score = Σ 1/(k + rankᵢ), k = 60) of the lexical BM25
    * ranking (t19) and the embedding cosine ranking (s01's brute-force
    * probe), the standard hybrid-search serving recipe: lexical
    * catches exact-term matches embeddings blur, vectors catch
    * paraphrases lexical misses, and RRF needs no score calibration
    * between the two scales because it consumes RANKS only. Both
    * input rankings are deterministic and oracle-replayed, ranks are
    * integers, and the fusion is two rational doubles summed in fixed
    * order — so even the fused list is hash-checked. The constant-key
    * rank windows run over ≤20-row frames by construction (the t23
    * bounded-window idiom).
    */
  val s11_hybrid_rrf: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val lex = t19_bm25(s, dir) // top-20 (doc_id, n_terms, score_e6)
      .withColumn("rank_lex", row_number().over(
        Window.partitionBy(pmod(col("doc_id"), lit(1))) // deliberate: 20 rows
          .orderBy(col("score_e6").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id").as("id"), col("rank_lex"))
    val e = t(s, dir, "embeddings")
    val vec = Similarity.bruteForceTopK(e.where(col("vec_id") === 0), e,
        "vec_id", "embedding", "vec_id", "embedding", k = 20)
      .select(col("neighbor_id").as("id"), col("rank").cast("long").as("rank_vec"))
    def term(r: org.apache.spark.sql.Column) =
      when(r.isNull, lit(0.0)).otherwise(lit(1.0) / (lit(60) + r))
    lex.join(vec, Seq("id"), "full_outer")
      .select(col("id"), col("rank_lex"), col("rank_vec"),
        round(term(col("rank_lex")) + term(col("rank_vec")), 6).as("rrf"))
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy(pmod(col("id"), lit(1))) // deliberate: ≤40 rows
          .orderBy(col("rrf").desc, col("id").asc)).cast("long"))
      .where(col("fused_rank") <= 10)
  }

  val s11_sql: String = {
    val vecCos = cosSql.replace("a.v", "ea.v").replace("b.v", "eb.v")
    // lexical branch = t19's portable BM25 chain verbatim (same bindings
    // object), so query and oracle rank by the SAME e-6-quantized score
    val chain = graft.functions.PortableMath.sqlWithBindings(
      "SELECT doc_id, dl, tf, df, nn AS __nn, sd AS __sd " +
        "FROM d CROSS JOIN st", t19Bindings)
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |l AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM t),
       |st AS (SELECT COUNT(*) AS nn, CAST(SUM(dl) AS BIGINT) AS sd FROM l),
       |x AS (SELECT doc_id, dl, unnest(toks) AS token FROM l),
       |tf AS (SELECT doc_id, dl, token, COUNT(*) AS tf FROM x
       |  WHERE token IN ('spark', 'vector', 'window')
       |  GROUP BY doc_id, dl, token),
       |d AS (SELECT *, COUNT(*) OVER (PARTITION BY token) AS df FROM tf),
       |sc AS ($chain),
       |lexagg AS (SELECT doc_id, CAST(SUM(__term_e6) AS BIGINT) AS score_e6
       |  FROM sc GROUP BY doc_id
       |  ORDER BY score_e6 DESC, doc_id ASC LIMIT 20),
       |lex AS (SELECT doc_id AS id,
       |  ROW_NUMBER() OVER (ORDER BY score_e6 DESC, doc_id ASC) AS rank_lex
       |  FROM lexagg),
       |emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |vsc AS (SELECT eb.vec_id AS id, $vecCos AS cos
       |  FROM emb ea JOIN emb eb ON eb.vec_id <> ea.vec_id
       |  WHERE ea.vec_id = 0),
       |vec AS (SELECT id,
       |  ROW_NUMBER() OVER (ORDER BY cos DESC, id ASC) AS rank_vec
       |  FROM vsc QUALIFY rank_vec <= 20),
       |f AS (SELECT COALESCE(lex.id, vec.id) AS id, rank_lex, rank_vec
       |  FROM lex FULL OUTER JOIN vec ON lex.id = vec.id),
       |r AS (SELECT id, rank_lex, rank_vec,
       |  ROUND((CASE WHEN rank_lex IS NULL THEN 0.0e0
       |              ELSE 1.0e0 / (60 + rank_lex) END)
       |      + (CASE WHEN rank_vec IS NULL THEN 0.0e0
       |              ELSE 1.0e0 / (60 + rank_vec) END), 6) AS rrf FROM f)
       |SELECT id, rank_lex, rank_vec, rrf,
       |  ROW_NUMBER() OVER (ORDER BY rrf DESC, id ASC) AS fused_rank
       |FROM r QUALIFY fused_rank <= 10""".stripMargin
  }

  /** ANN serving from a PERSISTED index — the shape every query after
    * the first pays at 100 TB: the IVF index lands on disk ONCE per
    * corpus ([[Similarity.IvfIndex#write]]: inverted lists partitioned
    * by `ivf_list`, a tiny centroid table, the s03 in-memory build's
    * durable artifact), and the query answers via `IvfIndex.read` +
    * `searchPruned`, whose probed list ids statically filter the lists
    * relation so the parquet scan reads ONLY the probed directories —
    * storage-partition pruning as the disk-side list lookup. The
    * write-once guard mirrors the s03 centroid-dump recipe; the timed
    * path (and the one CORRECTNESS exercises end-to-end) is the
    * restore + pruned probe. Results are identical to the in-memory
    * s03 search by construction (spec-asserted with scan metrics in
    * SimilaritySpec; the pruned-plan shape is additionally asserted on
    * THIS query's executed plan in SimilaritySpec).
    *
    * Oracle: the s03 assignment/probe replay against the STORE's own
    * centroid table — the serving artifact is also the replay fixture.
    */
  private val ivfStoresWritten =
    scala.collection.concurrent.TrieMap[String, Boolean]()

  def ivfStorePath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/ivf_store_$key"
  }

  val s12_ivf_serving: Q = (s, dir) => {
    val path = ivfStorePath(dir)
    ivfStoresWritten.getOrElseUpdate(dir, {
      // write-once per dir: persist the shared metadata-carrying index
      // (deterministic seeded build, so the store's bits never depend
      // on which query triggered the build)
      ivfMetaIndex(s, dir).write(path)
      true
    })
    Similarity.IvfIndex.read(s, path)
      .searchPruned(
        t(s, dir, "embeddings").where(col("vec_id") >= 10 && col("vec_id") < 15),
        "vec_id", "embedding", k = 10, nProbe = 8)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
  }

  /** DuckDB replay of s12: the s03 recipe with probe ids 10..14,
    * reading the quantizer from the written store's own centroid table.
    */
  def s12_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ctr AS (SELECT list_id, centroid
       |        FROM read_parquet('${ivfStorePath(oracleSfDir)}/centroids/*.parquet')),
       |dist AS (SELECT e.vec_id, c.list_id,
       |  ((list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * e.v[i]), (a, b) -> a + b)
       |    - 2.0e0 * list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * c.centroid[i]), (a, b) -> a + b))
       |   + list_reduce(list_transform(c.centroid, x -> x * x),
       |      (a, b) -> a + b)) AS d
       | FROM e CROSS JOIN ctr c),
       |assign AS (SELECT vec_id AS neighbor_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM dist) WHERE rn = 1),
       |probe AS (SELECT vec_id AS query_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM dist WHERE vec_id >= 10 AND vec_id < 15) WHERE rn <= 8),
       |cand AS (SELECT DISTINCT query_id, neighbor_id
       | FROM probe JOIN assign USING (list_id)
       | WHERE neighbor_id <> query_id),
       |sc AS (SELECT query_id, neighbor_id, $cosSql AS cos
       | FROM cand JOIN e a ON a.vec_id = query_id
       |           JOIN e b ON b.vec_id = neighbor_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |                     ORDER BY cos DESC, neighbor_id ASC) AS rank
       | FROM sc)
       |SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rank
       |FROM r WHERE rank <= 10""".stripMargin

  /** Incremental ANN index maintenance — the s-series counterpart of
    * t33's stats fold and d09's dedup admission, closing the
    * "continuous corpus" loop for retrieval serving: the IVF quantizer
    * is FIT ONCE on the base corpus (vec_id % 10 ≠ 0) and FROZEN, and
    * the delta batch (% 10 = 0) folds in through
    * [[Similarity.IvfIndex#append]] — a narrow nearest-centroid
    * assignment + union, O(|delta|) regardless of how much is already
    * indexed, never a refit. A probe set that STRADDLES the split
    * (ids 8..12 — four base vectors and one delta vector) then
    * searches the merged index.
    *
    * Correctness contract: per-vector assignment is independent, so
    * append ≡ assigning the full corpus under the same centroids — the
    * oracle replays exactly that from the base-fit centroid dump, and
    * the hash match proves the fold. (Drift is the operator's honest
    * boundary: after enough appends the frozen centroids stop
    * describing the corpus and a rebuild — s03's build — is the
    * rare scheduled event; the append path is the every-batch path.)
    */
  private val ivfDeltaIndexes =
    scala.collection.concurrent.TrieMap[String, Similarity.IvfIndex]()

  private def ivfDeltaCentroidPath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/ivf_centroids_delta_$key.parquet"
  }

  val s13_ivf_delta_append: Q = (s, dir) => {
    val e = t(s, dir, "embeddings")
    val baseIdx = ivfDeltaIndexes.getOrElseUpdate(dir, {
      val built = Similarity.IvfIndex.build(
        e.where(pmod(col("vec_id"), lit(10)) =!= 0), "vec_id", "embedding",
        nLists = 0)
      import s.implicits._
      built.centroids.zipWithIndex.map { case (c, i) => (i, c) }
        .toDF("list_id", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(ivfDeltaCentroidPath(dir))
      built
    })
    val merged = baseIdx.append(
      e.where(pmod(col("vec_id"), lit(10)) === 0), "vec_id", "embedding")
    merged.search(e.where(col("vec_id") >= 8 && col("vec_id") < 13),
        "vec_id", "embedding", k = 10, nProbe = 8)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
  }

  /** DuckDB replay of s13: assignment of the WHOLE corpus from the
    * base-fit centroid dump (≡ base assignment + frozen-quantizer
    * delta append), then the s03 probe/rank recipe for ids 8..12.
    */
  def s13_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ctr AS (SELECT list_id, centroid
       |        FROM read_parquet('${ivfDeltaCentroidPath(oracleSfDir)}/*.parquet')),
       |dist AS (SELECT e.vec_id, c.list_id,
       |  ((list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * e.v[i]), (a, b) -> a + b)
       |    - 2.0e0 * list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * c.centroid[i]), (a, b) -> a + b))
       |   + list_reduce(list_transform(c.centroid, x -> x * x),
       |      (a, b) -> a + b)) AS d
       | FROM e CROSS JOIN ctr c),
       |assign AS (SELECT vec_id AS neighbor_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM dist) WHERE rn = 1),
       |probe AS (SELECT vec_id AS query_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM dist WHERE vec_id >= 8 AND vec_id < 13) WHERE rn <= 8),
       |cand AS (SELECT DISTINCT query_id, neighbor_id
       | FROM probe JOIN assign USING (list_id)
       | WHERE neighbor_id <> query_id),
       |sc AS (SELECT query_id, neighbor_id, $cosSql AS cos
       | FROM cand JOIN e a ON a.vec_id = query_id
       |           JOIN e b ON b.vec_id = neighbor_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |                     ORDER BY cos DESC, neighbor_id ASC) AS rank
       | FROM sc)
       |SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rank
       |FROM r WHERE rank <= 10""".stripMargin

  /** Tombstone deletion against the PERSISTED ANN index — the third
    * and final face of index maintenance, closing the CRUD loop
    * (build = s03/s12, append = s13, delete = here): a delete batch
    * lands as an append-only tombstone file next to the store
    * ([[Similarity.IvfIndex.deleteFromStore]] — O(|batch|), list files
    * untouched), and every restore anti-joins the tombstones out, so
    * deleted vectors can never surface as neighbors — the GDPR-erasure
    * / retracted-document path a production corpus needs continuously.
    * The probe set deliberately includes a DELETED id (17 ≡ 3 mod 7):
    * a deleted vector may still query, it just cannot be returned.
    * [[Similarity.IvfIndex.compactStore]] is the rare scheduled
    * rewrite (only affected `ivf_list` partitions, filesystem swap) —
    * spec-proven identical before/after; the query times the serving
    * shape: restore + tombstone anti-join + pruned probe.
    *
    * Oracle: the s12 replay against THIS store's centroid table, with
    * the deleted ids excluded from the assignment side only.
    */
  private val ivfDelStoresWritten =
    scala.collection.concurrent.TrieMap[String, Boolean]()

  def ivfDelStorePath(dir: String): String = ivfStorePath(dir) + "_del"

  /** Write-once bootstrap of the tombstoned store (shared by s14's
    * serving query and s16's health report): the same deterministic
    * seeded index as s12's store, plus one tombstone batch
    * (vec_id ≡ 3 mod 7).
    */
  private def ensureDelStore(s: SparkSession, dir: String): String = {
    val path = ivfDelStorePath(dir)
    ivfDelStoresWritten.getOrElseUpdate(dir, {
      ivfMetaIndex(s, dir).write(path)
      Similarity.IvfIndex.deleteFromStore(
        t(s, dir, "embeddings").where(pmod(col("vec_id"), lit(7)) === 3),
        "vec_id", path)
      true
    })
    path
  }

  val s14_ivf_tombstone_delete: Q = (s, dir) => {
    val path = ensureDelStore(s, dir)
    Similarity.IvfIndex.read(s, path)
      .searchPruned(
        t(s, dir, "embeddings").where(col("vec_id") >= 15 && col("vec_id") < 20),
        "vec_id", "embedding", k = 10, nProbe = 8)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
  }

  /** Index health report over the persisted tombstoned store — the
    * observability query an operator runs against a serving index:
    * list count, live/tombstoned vector counts, per-list size extremes
    * and imbalance (max/avg — the probe-latency skew signal), and the
    * empty-list count (a quantizer-drift symptom: appends concentrate
    * in few lists while others starve → rebuild time). Reads the STORE
    * directly (raw lists + tombstone files, not the anti-joined
    * serving view) because tombstone DEBT is itself a health metric —
    * it is the compaction trigger. One partition-count aggregate over
    * the lists plus two tiny counts; no corpus-sized work beyond the
    * list scan. Oracle: assignment replay from the store's own
    * centroid table with the same ≡3 (mod 7) deletion rule.
    */
  val s16_index_health: Q = (s, dir) => {
    val path = ensureDelStore(s, dir)
    val nLists = s.read.parquet(s"$path/centroids").count()
    val tomb = s.read.parquet(s"$path/tombstones")
      .select(col("neighbor_id")).distinct()
    val lists = s.read.parquet(s"$path/lists")
    val live = lists.join(broadcast(tomb), Seq("neighbor_id"), "left_anti")
    val perList = live.groupBy(col("ivf_list")).agg(count(lit(1)).as("n"))
    perList.agg(
        count(lit(1)).as("__nonempty"),
        sum(col("n")).as("n_live"),
        min(col("n")).as("min_nonempty_list"),
        max(col("n")).as("max_list"))
      .crossJoin(broadcast(tomb.agg(count(lit(1)).as("n_tombstoned"))))
      .select(
        lit(nLists).as("n_lists"),
        col("n_live"), col("n_tombstoned"),
        (lit(nLists) - col("__nonempty")).as("n_empty_lists"),
        col("min_nonempty_list"), col("max_list"),
        round(col("n_live").cast("double") / nLists, 6).as("avg_list"),
        round(col("max_list").cast("double") /
          (col("n_live").cast("double") / nLists), 6).as("imbalance"))
  }

  /** The s14 assignment replay, aggregated into the same health row;
    * n_lists comes from the store's own centroid table.
    */
  def s16_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ctr AS (SELECT list_id, centroid
       |        FROM read_parquet('${ivfDelStorePath(oracleSfDir)}/centroids/*.parquet')),
       |dist AS (SELECT e.vec_id, c.list_id,
       |  ((list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * e.v[i]), (a, b) -> a + b)
       |    - 2.0e0 * list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * c.centroid[i]), (a, b) -> a + b))
       |   + list_reduce(list_transform(c.centroid, x -> x * x),
       |      (a, b) -> a + b)) AS d
       | FROM e CROSS JOIN ctr c),
       |assign AS (SELECT vec_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM dist) WHERE rn = 1),
       |live AS (SELECT * FROM assign WHERE vec_id % 7 <> 3),
       |ls AS (SELECT list_id, COUNT(*) AS n FROM live GROUP BY 1),
       |nl AS (SELECT COUNT(*) AS n_lists FROM ctr),
       |tb AS (SELECT COUNT(*) AS n_tombstoned FROM assign WHERE vec_id % 7 = 3),
       |agg AS (SELECT COUNT(*) AS nonempty, CAST(SUM(n) AS BIGINT) AS n_live,
       |        CAST(MIN(n) AS BIGINT) AS min_nonempty_list,
       |        CAST(MAX(n) AS BIGINT) AS max_list FROM ls)
       |SELECT n_lists, n_live, n_tombstoned,
       |  n_lists - nonempty AS n_empty_lists,
       |  min_nonempty_list, max_list,
       |  ROUND(CAST(n_live AS DOUBLE) / n_lists, 6) AS avg_list,
       |  ROUND(CAST(max_list AS DOUBLE)
       |    / (CAST(n_live AS DOUBLE) / n_lists), 6) AS imbalance
       |FROM agg CROSS JOIN nl CROSS JOIN tb""".stripMargin

  /** DuckDB replay of s14: the s12 recipe from the delete-store's own
    * centroid table, with ids ≡ 3 (mod 7) absent from the assignment
    * (= the index) but still allowed to probe.
    */
  def s14_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ctr AS (SELECT list_id, centroid
       |        FROM read_parquet('${ivfDelStorePath(oracleSfDir)}/centroids/*.parquet')),
       |dist AS (SELECT e.vec_id, c.list_id,
       |  ((list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * e.v[i]), (a, b) -> a + b)
       |    - 2.0e0 * list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * c.centroid[i]), (a, b) -> a + b))
       |   + list_reduce(list_transform(c.centroid, x -> x * x),
       |      (a, b) -> a + b)) AS d
       | FROM e CROSS JOIN ctr c),
       |assign AS (SELECT vec_id AS neighbor_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM dist WHERE vec_id % 7 <> 3) WHERE rn = 1),
       |probe AS (SELECT vec_id AS query_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM dist WHERE vec_id >= 15 AND vec_id < 20) WHERE rn <= 8),
       |cand AS (SELECT DISTINCT query_id, neighbor_id
       | FROM probe JOIN assign USING (list_id)
       | WHERE neighbor_id <> query_id),
       |sc AS (SELECT query_id, neighbor_id, $cosSql AS cos
       | FROM cand JOIN e a ON a.vec_id = query_id
       |           JOIN e b ON b.vec_id = neighbor_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |                     ORDER BY cos DESC, neighbor_id ASC) AS rank
       | FROM sc)
       |SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rank
       |FROM r WHERE rank <= 10""".stripMargin

  // ------------------------------------------------------- s17: PQ ANN

  private val pqCodebooks =
    scala.collection.concurrent.TrieMap[String, graft.similarity.PqCodebook]()

  private def pqCodebookPath(dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${graft.ingest.FixtureTables.root}/pq_codebooks_$key.parquet"
  }

  // PQ 16×4 (m subspaces of subDim dims, 16-entry codebooks — 4-bit
  // codes, a standard FAISS configuration): measured recall@10 0.90 at
  // 40 candidates on the sf0.01 corpus vs 0.62 for 8×8 — the finer
  // subspace grid explains far more variance on this corpus at the
  // same total code budget of m·log2(k) = 64 bits/vector (16×
  // compression vs the 256-byte float rows).
  private val pqM = 16
  private val pqSubDim = 64 / pqM

  /** Product-quantized ANN with ADC scoring and float re-rank — the
    * 32× compression rung of the quantization ladder (s05/s06 int8 is
    * 4×): each corpus vector is m=16 four-bit codes (64 bits packed)
    * against per-subspace 16-entry codebooks over 4-dim slices, and
    * candidate generation runs ENTIRELY from a per-query m×16 lookup
    * table — per candidate: 16 array lookups + one exact decimal sum,
    * zero float vector math ([[graft.similarity.PqCodebook]], Jégou et
    * al. TPAMI 2011). Top-40 ADC survivors re-rank with the exact
    * float cosine (the s06 two-stage contract). At 100 TB the codes
    * relation is 32× smaller than the float corpus — the scan that
    * feeds candidate generation reads ~8 bytes/vector — the codebook
    * is an ~8 KB driver literal, and the fit is bounded-sample (the
    * IvfIndex.build discipline), so build cost is corpus-size-
    * independent. Composes with the IVF bucket path exactly as s06
    * does (probe lists first, ADC-score inside probed lists).
    *
    * Fully deterministic: assignment argmin replays in the oracle from
    * this run's dumped codebook bits (the s03 centroid-dump recipe);
    * ADC terms are bit-identical sequential-sum dots folded in fixed
    * subspace order in both engines, so even the approximate scores
    * hash-match.
    */
  private def pqCodebook(s: SparkSession, dir: String)
      : graft.similarity.PqCodebook =
    pqCodebooks.getOrElseUpdate(dir, {
      val fitted = graft.similarity.PqCodebook.fit(
        t(s, dir, "embeddings"), "embedding", m = pqM, k = 16)
      // dump the fitted codebooks so the oracle SQL replays encoding
      // from this run's exact centroid bits
      import s.implicits._
      fitted.codebooks.zipWithIndex.flatMap { case (book, j) =>
        book.zipWithIndex.map { case (ctr, c) => (j, c, ctr) }
      }.toDF("sub_id", "code", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(pqCodebookPath(dir))
      fitted
    })

  val s17_pq_ann: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val cb = pqCodebook(s, dir)
    val e = t(s, dir, "embeddings")
    val codes = e
      .select(col("vec_id").as("neighbor_id"),
        cb.encode(col("embedding")).as("__codes"))
      .transform(spreadScan)
    val probes = broadcast(e.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), cb.lut(col("embedding")).as("__lut")))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id").asc)
    // approx is a fixed-order double fold of bit-identical LUT terms
    // (see PqCodebook.adcDot) — the oracle replays the same j-ascending
    // fold, so the scores agree to the last bit before the final round.
    val cand = probes.crossJoin(codes)
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cb.adcDot(col("__lut"), col("__codes")).as("approx"))
      .withColumn("__r", row_number().over(wc))
      .where(col("__r") <= 40)
      .select(col("query_id"), col("neighbor_id"), col("approx"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand
      .join(e.select(col("vec_id").as("query_id"),
        col("embedding").as("__pv")), Seq("query_id"))
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__cv")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("approx"),
        graft.similarity.Similarity.cosine(col("__pv"), col("__cv")).as("cosine"))
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= 10)
      .select(col("query_id"), col("neighbor_id"),
        round(col("approx"), 6).as("approx"),
        round(col("cosine"), 6).as("cosine"),
        col("rank").cast("long").as("rank"))
  }

  /** DuckDB replay of everything downstream of the PQ fit, from the
    * dumped codebooks: per-subspace argmin assignment in graft's exact
    * operation order with the (d, code) tie-break, the probe LUT of
    * raw sequential-sum dots, the ADC fold in ascending-subspace order
    * (`list(term ORDER BY sub_id)` + `list_reduce`, mirroring the
    * j-ascending left-to-right reduce) + top-40 cut, and the
    * exact-cosine re-rank. Subspace j covers 1-based vector positions
    * j·subDim+1 … (j+1)·subDim, matching `slice(v, j*subDim+1,
    * subDim)`.
    */
  def s17_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cb AS (SELECT sub_id, code, centroid
       |       FROM read_parquet('${pqCodebookPath(oracleSfDir)}/*.parquet')),
       |dist AS (SELECT e.vec_id, cb.sub_id, cb.code,
       |  ((list_reduce(list_transform(generate_series(1, $pqSubDim),
       |      i -> e.v[cb.sub_id*$pqSubDim+i] * e.v[cb.sub_id*$pqSubDim+i]),
       |      (a, b) -> a + b)
       |    - 2.0e0 * list_reduce(list_transform(generate_series(1, $pqSubDim),
       |      i -> e.v[cb.sub_id*$pqSubDim+i] * cb.centroid[i]), (a, b) -> a + b))
       |   + list_reduce(list_transform(cb.centroid, x -> x * x),
       |      (a, b) -> a + b)) AS d
       | FROM e CROSS JOIN cb),
       |enc AS (SELECT vec_id, sub_id, code FROM (
       |  SELECT vec_id, sub_id, code,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, sub_id
       |                       ORDER BY d, code) AS rn
       |  FROM dist) WHERE rn = 1),
       |lut AS (SELECT e.vec_id AS query_id, cb.sub_id, cb.code,
       |    list_reduce(list_transform(generate_series(1, $pqSubDim),
       |      i -> e.v[cb.sub_id*$pqSubDim+i] * cb.centroid[i]), (a, b) -> a + b)
       |      AS term
       |  FROM e CROSS JOIN cb WHERE e.vec_id < 5),
       |sc0 AS (SELECT l.query_id, enc.vec_id AS neighbor_id,
       |    list_reduce(list(l.term ORDER BY l.sub_id), (a, b) -> a + b) AS approx
       |  FROM enc JOIN lut l ON l.sub_id = enc.sub_id AND l.code = enc.code
       |  WHERE enc.vec_id <> l.query_id
       |  GROUP BY 1, 2),
       |cnd AS (SELECT query_id, neighbor_id, approx FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY approx DESC, neighbor_id ASC) AS r FROM sc0)
       |  WHERE r <= 40),
       |rr AS (SELECT c.query_id, c.neighbor_id, c.approx, $cosSql AS cos
       |  FROM cnd c JOIN e a ON a.vec_id = c.query_id
       |             JOIN e b ON b.vec_id = c.neighbor_id),
       |fin AS (SELECT query_id, neighbor_id, approx, cos,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |                     ORDER BY cos DESC, neighbor_id ASC) AS rank
       | FROM rr)
       |SELECT query_id, neighbor_id, ROUND(approx, 6) AS approx,
       |  ROUND(cos, 6) AS cosine, rank
       |FROM fin WHERE rank <= 10""".stripMargin

  /** IVF-PQ — the canonical composed serving index (FAISS's IVFPQ
    * shape, public literature: Jégou et al. TPAMI 2011 §V): the coarse
    * quantizer routes each query to its 8 nearest inverted lists
    * (s03's machinery), PQ-ADC scores ONLY the codes inside probed
    * lists (s17's machinery — 16 table lookups per candidate, no float
    * math), and the top-40 survivors re-rank in exact float cosine.
    * Versus s10 (IVF + int8): the candidate scan reads 8-byte codes
    * instead of 64-byte int8 vectors — another 8× less memory traffic
    * in the inner loop, the difference that dominates at 100 TB where
    * the probed-list scan IS the query cost. List-keyed equi-join
    * only; probes fixed; candidates bounded by probed-list size.
    *
    * Probe set vec_id ∈ [10, 15) — disjoint from s03/s17 (< 5), s09
    * ([5, 10)) and s14 ([15, 20)), so every ANN family exercises
    * different query geometry. Oracle replays BOTH dumped fixtures:
    * the s03-style centroid assignment/probing and the s17-style
    * codebook encode/LUT/ordered-ADC-fold.
    */
  val s18_ivfpq_ann: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    // 80 ADC candidates (vs s17's 40): the composed pipeline loses
    // recall at BOTH stages (probing ceiling ~0.94 x ADC cut), and the
    // re-rank is 80 cosines per query -- widening the cut is free next
    // to the probed-list scan. recall@10 0.88 at 80 vs 0.78 at 40 (spec-gated at 0.85).
    val nCand = 80
    val idx = ivfMetaIndex(s, dir)
    val cb = pqCodebook(s, dir)
    val corpus = idx.listed
      .select(col("ivf_list"), col("neighbor_id"),
        cb.encode(col("__cv")).as("__codes"))
    val e = t(s, dir, "embeddings")
    val probes = e.where(col("vec_id") >= 10 && col("vec_id") < 15)
      .select(col("vec_id").as("query_id"), cb.lut(col("embedding")).as("__lut"),
        explode_outer(idx.probeLists(col("embedding"), 8)).as("ivf_list"))
      .where(col("ivf_list").isNotNull)
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id").asc)
    val cand = probes.join(corpus, Seq("ivf_list"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cb.adcDot(col("__lut"), col("__codes")).as("approx"))
      .withColumn("__r", row_number().over(wc))
      .where(col("__r") <= nCand)
      .select(col("query_id"), col("neighbor_id"), col("approx"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand
      .join(e.select(col("vec_id").as("query_id"),
        col("embedding").as("__pv")), Seq("query_id"))
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__cv")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("approx"),
        graft.similarity.Similarity.cosine(col("__pv"), col("__cv")).as("cosine"))
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= 10)
      .select(col("query_id"), col("neighbor_id"),
        round(col("approx"), 6).as("approx"),
        round(col("cosine"), 6).as("cosine"),
        col("rank").cast("long").as("rank"))
  }

  /** DuckDB replay of s18 from both dumped fixtures: the s10-recipe
    * centroid assignment + 8-list probing (for probes [10, 15)),
    * composed with the s17-recipe codebook encode + LUT +
    * ascending-subspace ADC fold, restricted to candidates sharing a
    * probed list.
    */
  def s18_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |ctr AS (SELECT list_id, centroid
       |        FROM read_parquet('${ivfMetaCentroidPath(oracleSfDir)}/*.parquet')),
       |cdist AS (SELECT e.vec_id, c.list_id,
       |  ((list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * e.v[i]), (a, b) -> a + b)
       |    - 2.0e0 * list_reduce(list_transform(generate_series(1, 64),
       |      i -> e.v[i] * c.centroid[i]), (a, b) -> a + b))
       |   + list_reduce(list_transform(c.centroid, x -> x * x),
       |      (a, b) -> a + b)) AS d
       | FROM e CROSS JOIN ctr c),
       |assign AS (SELECT vec_id AS neighbor_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM cdist) WHERE rn = 1),
       |probe AS (SELECT vec_id AS query_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, list_id) AS rn
       |  FROM cdist WHERE vec_id >= 10 AND vec_id < 15) WHERE rn <= 8),
       |cand AS (SELECT p.query_id, a.neighbor_id
       |  FROM probe p JOIN assign a USING (list_id)
       |  WHERE a.neighbor_id <> p.query_id),
       |cb AS (SELECT sub_id, code, centroid
       |       FROM read_parquet('${pqCodebookPath(oracleSfDir)}/*.parquet')),
       |pqdist AS (SELECT e.vec_id, cb.sub_id, cb.code,
       |  ((list_reduce(list_transform(generate_series(1, $pqSubDim),
       |      i -> e.v[cb.sub_id*$pqSubDim+i] * e.v[cb.sub_id*$pqSubDim+i]),
       |      (a, b) -> a + b)
       |    - 2.0e0 * list_reduce(list_transform(generate_series(1, $pqSubDim),
       |      i -> e.v[cb.sub_id*$pqSubDim+i] * cb.centroid[i]), (a, b) -> a + b))
       |   + list_reduce(list_transform(cb.centroid, x -> x * x),
       |      (a, b) -> a + b)) AS d
       | FROM e CROSS JOIN cb),
       |enc AS (SELECT vec_id, sub_id, code FROM (
       |  SELECT vec_id, sub_id, code,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, sub_id
       |                       ORDER BY d, code) AS rn
       |  FROM pqdist) WHERE rn = 1),
       |lut AS (SELECT e.vec_id AS query_id, cb.sub_id, cb.code,
       |    list_reduce(list_transform(generate_series(1, $pqSubDim),
       |      i -> e.v[cb.sub_id*$pqSubDim+i] * cb.centroid[i]), (a, b) -> a + b)
       |      AS term
       |  FROM e CROSS JOIN cb WHERE e.vec_id >= 10 AND e.vec_id < 15),
       |sc0 AS (SELECT c.query_id, c.neighbor_id,
       |    list_reduce(list(l.term ORDER BY l.sub_id), (a, b) -> a + b) AS approx
       |  FROM cand c
       |  JOIN enc ON enc.vec_id = c.neighbor_id
       |  JOIN lut l ON l.query_id = c.query_id
       |    AND l.sub_id = enc.sub_id AND l.code = enc.code
       |  GROUP BY 1, 2),
       |cnd AS (SELECT query_id, neighbor_id, approx FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY approx DESC, neighbor_id ASC) AS r FROM sc0)
       |  WHERE r <= 80),
       |rr AS (SELECT c.query_id, c.neighbor_id, c.approx, $cosSql AS cos
       |  FROM cnd c JOIN e a ON a.vec_id = c.query_id
       |             JOIN e b ON b.vec_id = c.neighbor_id),
       |fin AS (SELECT query_id, neighbor_id, approx, cos,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |                     ORDER BY cos DESC, neighbor_id ASC) AS rank
       | FROM rr)
       |SELECT query_id, neighbor_id, ROUND(approx, 6) AS approx,
       |  ROUND(cos, 6) AS cosine, rank
       |FROM fin WHERE rank <= 10""".stripMargin

  val queries: Map[String, Q] = Map(
    "m01_multimodal_features" -> m01_multimodal_features,
    "m02_frame_manifest"    -> m02_frame_manifest,
    "m03_patch_manifest"    -> m03_patch_manifest,
    "m04_audio_windows"     -> m04_audio_windows,
    "m05_pair_manifest"     -> m05_pair_manifest,
    "m06_multimodal_pack"   -> m06_multimodal_pack,
    "m07_image_neardups"    -> m07_image_neardups,
    "m08_audio_neardups"    -> m08_audio_neardups,
    "m09_video_neardups"    -> m09_video_neardups,
    "c04_media_curation"    -> c04_media_curation,
    "s03_ivf_topk"          -> s03_ivf_topk,
    "c01_curation"          -> c01_curation,
    "c02_neardup_curation"  -> c02_neardup_curation,
    "c03_release_qa"        -> c03_release_qa,
    "t01_token_stats"       -> t01_token_stats,
    "t02_quality_score"     -> t02_quality_score,
    "t03_lang_id"           -> t03_lang_id,
    "t04_fingerprint"       -> t04_fingerprint,
    "t05_split_sample"      -> t05_split_sample,
    "t06_repetition"        -> t06_repetition,
    "t07_sequence_pack"     -> t07_sequence_pack,
    "t08_boilerplate"       -> t08_boilerplate,
    "t09_stratified_sample" -> t09_stratified_sample,
    "t10_edit_distance"     -> t10_edit_distance,
    "t11_chunking"          -> t11_chunking,
    "t12_vocab"             -> t12_vocab,
    "t13_ngram_freq"        -> t13_ngram_freq,
    "t14_tfidf_terms"       -> t14_tfidf_terms,
    "t15_mixture_weights"   -> t15_mixture_weights,
    "t16_corpus_positions"  -> t16_corpus_positions,
    "t17_heavy_hitters"     -> t17_heavy_hitters,
    "t18_heavy_hitters_by_lang" -> t18_heavy_hitters_by_lang,
    "t19_bm25"              -> t19_bm25,
    "t20_pii_redaction"     -> t20_pii_redaction,
    "t21_oov_rate"          -> t21_oov_rate,
    "t22_token_entropy"     -> t22_token_entropy,
    "t23_zipf_slope"        -> t23_zipf_slope,
    "t24_bpe_pairs"         -> t24_bpe_pairs,
    "t25_leakage_split"     -> t25_leakage_split,
    "t26_source_novelty"    -> t26_source_novelty,
    "t27_stopwords"         -> t27_stopwords,
    "t28_weighted_sample"   -> t28_weighted_sample,
    "t29_unigram_xent"      -> t29_unigram_xent,
    "t30_bigram_xent"       -> t30_bigram_xent,
    "t31_lang_consistency"  -> t31_lang_consistency,
    "t32_readability"       -> t32_readability,
    "t33_incremental_corpus_stats" -> t33_incremental_corpus_stats,
    "t34_unicode_normalize" -> t34_unicode_normalize,
    "t35_winnowing"         -> t35_winnowing,
    "t36_quota_allocation"  -> t36_quota_allocation,
    "t37_bpe_encode"        -> t37_bpe_encode,
    "t42_bpe_roundtrip"     -> t42_bpe_roundtrip,
    "t43_unigram_encode"    -> t43_unigram_encode,
    "t51_wordpiece_encode"  -> t51_wordpiece_encode,
    "t52_byte_bpe_roundtrip" -> t52_byte_bpe_roundtrip,
    "t44_bestfit_pack"      -> t44_bestfit_pack,
    "t45_epoch_shuffle"     -> t45_epoch_shuffle,
    "t46_tokenizer_eval"    -> t46_tokenizer_eval,
    "t47_chao1_coverage"    -> t47_chao1_coverage,
    "t48_truncation_loss"   -> t48_truncation_loss,
    "t49_perplexity_buckets" -> t49_perplexity_buckets,
    "t50_vocab_budget"      -> t50_vocab_budget,
    "t38_quality_classifier" -> t38_quality_classifier,
    "t39_collocations"      -> t39_collocations,
    "t40_chi2_terms"        -> t40_chi2_terms,
    "t41_heaps_law"         -> t41_heaps_law,
    "q121_auc_eval"         -> q121_auc_eval,
    "q126_calibration"      -> q126_calibration,
    "q128_auc_by_slice"     -> q128_auc_by_slice,
    "c05_entity_resolution" -> c05_entity_resolution,
    "c06_training_mix_release" -> c06_training_mix_release,
    "c09_quality_release"   -> c09_quality_release,
    "c07_sft_assembly"      -> c07_sft_assembly,
    "c08_preference_pairs"  -> c08_preference_pairs,
    "q150_bradley_terry"    -> q150_bradley_terry,
    "c10_domain_gate"       -> c10_domain_gate,
    "c11_media_mix_release" -> c11_media_mix_release,
    "s21_bitext_mining"     -> s21_bitext_mining,
    "s22_cluster_eval"      -> s22_cluster_eval,
    "s23_pca_whitening"     -> s23_pca_whitening,
    "s24_pca_recall"        -> s24_pca_recall,
    "s25_graph_ann"         -> s25_graph_ann,
    "s26_graph_ann_insert"  -> s26_graph_ann_insert,
    "q152_fairness_report"  -> q152_fairness_report,
    "d01_exact_dedup"       -> d01_exact_dedup,
    "d02_minhash_neardups"  -> d02_minhash_neardups,
    "d03_simhash_neardups"  -> d03_simhash_neardups,
    "d04_embedding_neardups" -> d04_embedding_neardups,
    "d16_embedding_neardups_lsh" -> d16_embedding_neardups_lsh,
    "d05_dup_groups"        -> d05_dup_groups,
    "q154_leakage_safe_split" -> q154_leakage_safe_split,
    "q155_memorization_audit" -> q155_memorization_audit,
    "d06_jaccard_neardups"  -> d06_jaccard_neardups,
    "d07_decontamination"   -> d07_decontamination,
    "d08_repeated_spans"    -> d08_repeated_spans,
    "d09_incremental_neardups" -> d09_incremental_neardups,
    "d10_containment_neardups" -> d10_containment_neardups,
    "d11_semantic_dedup"    -> d11_semantic_dedup,
    "d12_source_overlap"    -> d12_source_overlap,
    "d13_winnow_copydetect" -> d13_winnow_copydetect,
    "d14_edit_join"         -> d14_edit_join,
    "d15_jw_join"           -> d15_jw_join,
    "d17_maximal_spans"     -> d17_maximal_spans,
    "d18_exact_substring_cut" -> d18_exact_substring_cut,
    "s01_cosine_topk"       -> s01_cosine_topk,
    "s02_lsh_ann_topk"      -> s02_lsh_ann_topk,
    "s04_label_centroids"   -> s04_label_centroids,
    "s05_int8_quant"        -> s05_int8_quant,
    "s06_quant_ann"         -> s06_quant_ann,
    "s07_mmr_rerank"        -> s07_mmr_rerank,
    "s08_embedding_qa"      -> s08_embedding_qa,
    "s09_filtered_ann"      -> s09_filtered_ann,
    "s10_ivf_quant_ann"     -> s10_ivf_quant_ann,
    "s11_hybrid_rrf"        -> s11_hybrid_rrf,
    "s12_ivf_serving"       -> s12_ivf_serving,
    "s13_ivf_delta_append"  -> s13_ivf_delta_append,
    "s14_ivf_tombstone_delete" -> s14_ivf_tombstone_delete,
    "s15_knn_graph"         -> s15_knn_graph,
    "s16_index_health"      -> s16_index_health,
    "s17_pq_ann"            -> s17_pq_ann,
    "s18_ivfpq_ann"         -> s18_ivfpq_ann,
    "s19_ann_recall"        -> s19_ann_recall,
    "s20_ivf_radius"        -> s20_ivf_radius)

  // def, not val: s03_sql embeds the per-dir centroid fixture path for
  // the CURRENT `oracleSfDir`, so the map must be rebuilt at dump time.
  def oracles: Map[String, String] = Map(
    "m01_multimodal_features" -> m01_sql,
    "m02_frame_manifest"    -> m02_sql,
    "m03_patch_manifest"    -> m03_sql,
    "m04_audio_windows"     -> m04_sql,
    "m05_pair_manifest"     -> m05_sql,
    "m06_multimodal_pack"   -> m06_sql,
    "m07_image_neardups"    -> m07_sql,
    "m08_audio_neardups"    -> m08_sql,
    "m09_video_neardups"    -> m09_sql,
    "c04_media_curation"    -> c04_sql,
    "c01_curation"          -> c01_sql,
    "c02_neardup_curation"  -> c02_sql,
    "c03_release_qa"        -> c03_sql,
    "t01_token_stats"       -> t01_sql,
    "t02_quality_score"     -> t02_sql,
    "t03_lang_id"           -> t03_sql,
    "t04_fingerprint"       -> t04_sql,
    "t05_split_sample"      -> t05_sql,
    "t06_repetition"        -> t06_sql,
    "t07_sequence_pack"     -> t07_sql,
    "t08_boilerplate"       -> t08_sql,
    "t09_stratified_sample" -> t09_sql,
    "t10_edit_distance"     -> t10_sql,
    "t11_chunking"          -> t11_sql,
    "t12_vocab"             -> t12_sql,
    "t13_ngram_freq"        -> t13_sql,
    "t14_tfidf_terms"       -> t14_sql,
    "t15_mixture_weights"   -> t15_sql,
    "t16_corpus_positions"  -> t16_sql,
    "t17_heavy_hitters"     -> t17_sql,
    "t18_heavy_hitters_by_lang" -> t18_sql,
    "t19_bm25"              -> t19_sql,
    "t20_pii_redaction"     -> t20_sql,
    "t21_oov_rate"          -> t21_sql,
    "t22_token_entropy"     -> t22_sql,
    "t23_zipf_slope"        -> t23_sql,
    "t24_bpe_pairs"         -> t24_sql,
    "t25_leakage_split"     -> t25_sql,
    "t26_source_novelty"    -> t26_sql,
    "t27_stopwords"         -> t27_sql,
    "t28_weighted_sample"   -> t28_sql,
    "t29_unigram_xent"      -> t29_sql,
    "t30_bigram_xent"       -> t30_sql,
    "t31_lang_consistency"  -> t31_sql,
    "t32_readability"       -> t32_sql,
    "t33_incremental_corpus_stats" -> t33_sql,
    "t34_unicode_normalize" -> t34_sql,
    "t35_winnowing"         -> t35_sql,
    "t36_quota_allocation"  -> t36_sql,
    "t37_bpe_encode"        -> t37_sql,
    "t42_bpe_roundtrip"     -> t42_sql,
    "t43_unigram_encode"    -> t43_sql,
    "t51_wordpiece_encode"  -> t51_sql,
    "t52_byte_bpe_roundtrip" -> t52_sql,
    "t44_bestfit_pack"      -> t44_sql,
    "t45_epoch_shuffle"     -> t45_sql,
    "t46_tokenizer_eval"    -> t46_sql,
    "t47_chao1_coverage"    -> t47_sql,
    "t48_truncation_loss"   -> t48_sql,
    "t49_perplexity_buckets" -> t49_sql,
    "t50_vocab_budget"      -> t50_sql,
    "t38_quality_classifier" -> t38_sql,
    "t39_collocations"      -> t39_sql,
    "t40_chi2_terms"        -> t40_sql,
    "t41_heaps_law"         -> t41_sql,
    "q121_auc_eval"         -> q121_sql,
    "q126_calibration"      -> q126_sql,
    "q128_auc_by_slice"     -> q128_sql,
    "c05_entity_resolution" -> c05_sql,
    "c06_training_mix_release" -> c06_sql,
    "c09_quality_release"   -> c09_sql,
    "c07_sft_assembly"      -> c07_sql,
    "c08_preference_pairs"  -> c08_sql,
    "q150_bradley_terry"    -> q150_sql,
    "c10_domain_gate"       -> c10_sql,
    "c11_media_mix_release" -> c11_sql,
    "s21_bitext_mining"     -> s21_sql,
    "s22_cluster_eval"      -> s22_sql,
    "s23_pca_whitening"     -> s23_sql,
    "s24_pca_recall"        -> s24_sql,
    "s25_graph_ann"         -> s25_sql,
    "s26_graph_ann_insert"  -> s26_sql,
    "q152_fairness_report"  -> q152_sql,
    "d01_exact_dedup"       -> d01_sql,
    "d02_minhash_neardups"  -> d02_sql,
    "d03_simhash_neardups"  -> d03_sql,
    "d04_embedding_neardups" -> d04_sql,
    "d16_embedding_neardups_lsh" -> d16_sql,
    "d05_dup_groups"        -> d05_sql,
    "q154_leakage_safe_split" -> q154_sql,
    "q155_memorization_audit" -> q155_sql,
    "d06_jaccard_neardups"  -> d06_sql,
    "d07_decontamination"   -> d07_sql,
    "d08_repeated_spans"    -> d08_sql,
    "d09_incremental_neardups" -> d09_sql,
    "d10_containment_neardups" -> d10_sql,
    "d11_semantic_dedup"    -> d11_sql,
    "d12_source_overlap"    -> d12_sql,
    "d13_winnow_copydetect" -> d13_sql,
    "d14_edit_join"         -> d14_sql,
    "d15_jw_join"           -> d15_sql,
    "d17_maximal_spans"     -> d17_sql,
    "d18_exact_substring_cut" -> d18_sql,
    "s01_cosine_topk"       -> s01_sql,
    "s02_lsh_ann_topk"      -> s02_sql,
    "s03_ivf_topk"          -> s03_sql,
    "s04_label_centroids"   -> s04_sql,
    "s05_int8_quant"        -> s05_sql,
    "s06_quant_ann"         -> s06_sql,
    "s07_mmr_rerank"        -> s07_sql,
    "s08_embedding_qa"      -> s08_sql,
    "s09_filtered_ann"      -> s09_sql,
    "s10_ivf_quant_ann"     -> s10_sql,
    "s11_hybrid_rrf"        -> s11_sql,
    "s12_ivf_serving"       -> s12_sql,
    "s13_ivf_delta_append"  -> s13_sql,
    "s14_ivf_tombstone_delete" -> s14_sql,
    "s15_knn_graph"         -> s15_sql,
    "s16_index_health"      -> s16_sql,
    "s17_pq_ann"            -> s17_sql,
    "s18_ivfpq_ann"         -> s18_sql,
    "s19_ann_recall"        -> s19_sql,
    "s20_ivf_radius"        -> s20_sql)
}
