package graft.llmdata

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators over a document corpus: token counting, quality
  * scoring, language identification, document fingerprinting.
  *
  * All four are single-pass narrow projections (no shuffle, no UDFs — only
  * codegen'd built-ins and higher-order array functions), so at 100 TB they
  * cost exactly one scan and parallelize per input split. Column pruning
  * keeps the parquet reader on `(doc_id, text)`.
  */
object TextAnalysis {
  import TextPrimitives._

  /** BPE-ish pre-tokenizer: letter runs, single digits, single punctuation
    * marks — the shape GPT-style byte-pair pre-splitting produces. Same
    * semantics under Java regex (Spark) and RE2 (DuckDB). */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  /** Stopword lists driving [[langId]] and the quality score's stopword
    * ratio. Deterministic heuristic n-gram/stopword language ID — the
    * standard cheap first-pass filter in corpus pipelines. */
  val StopWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"),
    "zh" -> Seq())

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Per-language token-hit-count SQL (Spark == DuckDB for these exprs,
    * modulo the size/len alias handled by the caller). `zh` scores CJK
    * characters instead of stopwords (no whitespace tokenization there). */
  def langScoreSpark(lang: String, words: String, text: String): String =
    StopWords.toMap.apply(lang) match {
      case Seq() => s"size(filter(split($text, ''), ch -> ch >= '一' AND ch <= '鿿'))"
      case ws    => s"size(filter($words, w -> lower(w) IN ${inList(ws)}))"
    }

  def langScoreDuck(lang: String, words: String, text: String): String =
    StopWords.toMap.apply(lang) match {
      case Seq() => s"len(list_filter(string_split($text, ''), ch -> ch >= '一' AND ch <= '鿿'))"
      case ws    => s"len(list_filter($words, w -> lower(w) IN ${inList(ws)}))"
    }

  /** Token statistics: whitespace token count, BPE-ish subword count, chars
    * per token. */
  def tokenStats(documents: DataFrame): DataFrame =
    documents
      .withColumn("__words", tokens(col("text")))
      .select(
        col("doc_id"),
        size(col("__words")).cast("bigint").as("ws_tokens"),
        regexp_count(col("text"), lit(BpePattern)).cast("bigint").as("bpe_tokens"),
        round(length(col("text")).cast("double") / size(col("__words")), 6).as("chars_per_token"))

  /** Adds the quality columns (n_tokens, punct_ratio, stop_ratio,
    * mean_word_len, quality_score) to a frame that already carries
    * `__words`. Exposed package-private so composed pipelines
    * ([[CorpusOps.cleanCorpus]]) can score in the same single pass instead
    * of re-deriving tokens per signal. */
  private[llmdata] def withQuality(df: DataFrame): DataFrame = {
    val en = StopWords.toMap.apply("en")
    df
      .withColumn("n_tokens", size(col("__words")).cast("bigint"))
      .withColumn("punct_ratio",
        round(regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("double") / greatest(length(col("text")), lit(1)), 6))
      .withColumn("stop_ratio",
        round(expr(s"size(filter(__words, w -> lower(w) IN ${inList(en)}))").cast("double") / greatest(col("n_tokens"), lit(1)), 6))
      .withColumn("mean_word_len",
        round(expr("aggregate(__words, 0L, (s, w) -> s + length(w))").cast("double") / greatest(col("n_tokens"), lit(1)), 6))
      .withColumn("quality_score",
        round(
          least(col("n_tokens").cast("double") / lit(64.0), lit(1.0)) * lit(0.4)
            + least(col("stop_ratio") * lit(4.0), lit(1.0)) * lit(0.3)
            + (lit(1.0) - least(col("punct_ratio") * lit(5.0), lit(1.0))) * lit(0.3), 6))
  }

  /** Quality signals: length, punctuation density, stopword ratio, mean word
    * length, and a composite score in [0,1] — the usual cheap pre-filter for
    * corpus curation (drop too-short / too-punctuated / stopword-free junk). */
  def quality(documents: DataFrame): DataFrame =
    withQuality(documents.withColumn("__words", tokens(col("text"))))
      .select("doc_id", "n_tokens", "punct_ratio", "stop_ratio", "mean_word_len", "quality_score")

  /** Adds `lang_guess` (argmax of per-language scores, first-language
    * tie-break, `und` when no signal) to a frame carrying `__words` +
    * `text`. Package-private building block shared with composed
    * pipelines. */
  private[llmdata] def withLangGuess(df: DataFrame): DataFrame = {
    val scored = df.withColumns(StopWords.map { case (l, _) =>
      s"s_$l" -> expr(langScoreSpark(l, "__words", "text"))
    }.toMap)
    val best = greatest(StopWords.map { case (l, _) => col(s"s_$l") }: _*)
    val ordered = StopWords.foldRight(lit("und")) { case ((l, _), e) =>
      when(col(s"s_$l") === best && best > 0, lit(l)).otherwise(e)
    }
    scored.withColumn("lang_guess", ordered)
      .drop(StopWords.map { case (l, _) => s"s_$l" }: _*)
  }

  /** Language ID: argmax of per-language stopword/CJK hit counts, ties
    * broken by fixed language order (en, de, es, fr, zh), `und` when no
    * signal at all. */
  def langId(documents: DataFrame): DataFrame =
    // First language (in declared order) hitting the max wins — mirrors the
    // oracle's CASE chain exactly.
    withLangGuess(documents.withColumn("__words", tokens(col("text"))))
      .select(col("doc_id"), col("lang").as("lang_label"), col("lang_guess"),
        when(col("lang") === col("lang_guess"), lit(1)).otherwise(lit(0)).as("agree"))

  /** Rolling-hash fingerprint expression over a token-hash array column —
    * the single definition shared by [[fingerprint]] and the streaming
    * dedup key ([[graft.streaming.DocStream]]), so batch and stream can
    * never hash differently. `mult`/`mod` parameterize a SECOND independent
    * fingerprint (dedup keys pair two so the joint collision space is
    * ~2^60, not ~2^30). */
  private[graft] def fingerprintOf(thCol: String, mult: Long = 37L, mod: Long = P) =
    expr(s"aggregate($thCol, 0L, (h, c) -> (h * $mult + c) % $mod)")

  /** Document fingerprint: order-sensitive polynomial rolling hash over the
    * token hashes — a compact per-doc identity for exact-dup detection and
    * incremental re-crawl diffing. */
  def fingerprint(documents: DataFrame): DataFrame = {
    graft.functions.VectorExprs.register(documents.sparkSession)
    documents
      .withColumn("__words", tokens(col("text")))
      .withColumn("__th", sparkPolyHashArray("__words"))
      .select(col("doc_id"), fingerprintOf("__th").as("fingerprint"))
  }

  /** Within-document repetition signals (the Gopher-style repetition
    * filter): fraction of duplicate word 2-grams / 3-grams per document.
    * Heavily templated or looping text scores high and is dropped before
    * training. Single-pass narrow projection like the other signals. */
  def repetition(documents: DataFrame): DataFrame = {
    def dupRatio(n: Int) = {
      val ng = expr(TextPrimitives.sparkNgrams("__words", "text", n))
      round(lit(1.0) - size(array_distinct(ng)).cast("double") / greatest(size(ng), lit(1)), 6)
    }
    documents
      .withColumn("__words", tokens(col("text")))
      .select(col("doc_id"),
        dupRatio(2).as("dup_2gram_ratio"),
        dupRatio(3).as("dup_3gram_ratio"))
  }

  /** The stopword-presence list of the Gopher rule set ([[gopherRules]]):
    * a document that contains fewer than 2 of these is likely not natural
    * prose (navigation junk, code, tables). Published list, Rae et al.
    * 2021 appendix A1.1. */
  val GopherStops: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document rule filter (Rae et al. 2021, appendix A1.1) —
    * the published per-document heuristics corpus pipelines run before
    * training, emitted as one row of signals plus the composite `keep`
    * flag so downstream can either hard-filter (`keep = 1`) or re-weight
    * on the individual signals:
    *
    *   - word count in [50, 100000]
    *   - mean word length in [3, 10]
    *   - symbol-to-word ratio ('#' or '...') <= 0.1
    *   - <= 90% of lines start with a bullet ('-', '*', '•')
    *   - <= 30% of lines end with an ellipsis
    *   - >= 80% of words contain at least one alphabetic character
    *   - >= 2 of the 8 [[GopherStops]] stopwords present
    *
    * Single-pass narrow projection (words + lines derived once, no
    * shuffle); at 100 TB this is one scan like the other signal passes,
    * and composes with [[repetition]] (the rule set's other half) in the
    * same pass. The `keep` flag compares the ROUNDED emitted ratios, so
    * the oracle's comparison sees bit-identical doubles. */
  def gopherRules(documents: DataFrame): DataFrame = {
    val stopArr = GopherStops.map(w => s"'$w'").mkString("array(", ", ", ")")
    documents
      .withColumn("__words", tokens(col("text")))
      .withColumn("__lines", expr("filter(split(text, '\\n'), l -> length(trim(l)) > 0)"))
      .select(
        col("doc_id"),
        size(col("__words")).cast("bigint").as("n_words"),
        round(expr("aggregate(__words, 0L, (s, w) -> s + length(w))").cast("double")
          / greatest(size(col("__words")), lit(1)), 6).as("mean_word_len"),
        round((regexp_count(col("text"), lit("#")) + regexp_count(col("text"), lit("\\.\\.\\.")))
          .cast("double") / greatest(size(col("__words")), lit(1)), 6).as("symbol_ratio"),
        round(expr("size(filter(__lines, l -> substring(trim(l), 1, 1) IN ('-', '*', '•')))")
          .cast("double") / greatest(size(col("__lines")), lit(1)), 6).as("bullet_ratio"),
        round(expr("size(filter(__lines, l -> trim(l) LIKE '%...'))")
          .cast("double") / greatest(size(col("__lines")), lit(1)), 6).as("ellipsis_ratio"),
        round(expr("size(filter(__words, w -> w rlike '[A-Za-z]'))")
          .cast("double") / greatest(size(col("__words")), lit(1)), 6).as("alpha_ratio"),
        expr(s"size(filter($stopArr, sw -> exists(__words, w -> lower(w) = sw)))")
          .cast("bigint").as("stop_hits"))
      .withColumn("keep",
        (col("n_words").between(50, 100000)
          && col("mean_word_len").between(3.0, 10.0)
          && col("symbol_ratio") <= 0.1
          && col("bullet_ratio") <= 0.9
          && col("ellipsis_ratio") <= 0.3
          && col("alpha_ratio") >= 0.8
          && col("stop_hits") >= 2).cast("int"))
  }

  /** Corpus-relative token rarity score: mean inverse document frequency
    * over a document's tokens, as the exact integer rational
    * `sum(1e6 div df) div n_tokens` (ppm — same reproducibility rationale
    * as [[tfidfTopTerms]]'s score: no `ln`, so any engine reproduces the
    * ranking bit-for-bit). High score = the document is mostly tokens the
    * rest of the corpus never uses — boilerplate IDs, foreign scripts,
    * OCR noise — the standard corpus-relative complement to the
    * document-local [[quality]] signals.
    *
    * Shape: one tokenize pass shuffled on (doc, token), the df side
    * aggregated from it (same persisted-frame pattern as TF-IDF), scores
    * re-aggregated per document — two shuffles total, vocabulary-sized
    * join input, AQE picks broadcast when the vocab fits. */
  def rarityScore(documents: DataFrame): DataFrame = {
    val terms = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), lower(col("token")).as("token"))
      .agg(count(lit(1)).as("tf"))
      .transform(graft.core.CacheScope.persisted)
    val docFreq = terms.groupBy("token").agg(count(lit(1)).as("df"))
    terms.join(docFreq, "token")
      .groupBy("doc_id")
      .agg(
        sum(expr("tf * (1000000L div df)")).as("__s"),
        sum(col("tf")).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr("__s div n_tokens").as("rarity_ppm"))
  }

  /** Default merge-round count for [[bpeMerges]] — bounded because the
    * oracle replays every round as SQL (each adds ~3 CTEs). */
  val BpeDefaultMerges = 6

  /** BPE merge training (Sennrich et al. 2016) on the corpus: `nMerges`
    * rounds of (count adjacent symbol pairs) → (merge the most frequent
    * pair everywhere), returning the learned merge table
    * (merge_idx, pair_a, pair_b, merged, cnt) — the artifact a tokenizer
    * is built from. Word-internal, as in the paper: `syms` is an ARRAY of
    * per-word spaced-symbol strings, so pairs never form across word
    * boundaries and every greedy merge fold runs over one word's ≤10ish
    * symbols — a whole-document fold would be O(doc²) in accumulated
    * string copying (measured 3× slower at sf0.1). Ties break
    * lexicographically (cnt desc, pair asc), so the table is
    * deterministic and exactly oracle-checkable.
    *
    * Each round is one distributed pass: pair counts shuffle once
    * (map-side partials absorb the Zipf head), the 1-row argmax winner is
    * broadcast back, and the merge itself is a narrow per-word fold —
    * greedy left-to-right non-overlapping, the textbook BPE application
    * order.
    *
    * Scale shape: cost is nMerges corpus passes. Real tokenizer training
    * runs thousands of merges — at 100 TB do what the k-means trainer
    * does: train the merge table on a deterministic sample (the pair
    * distribution converges long before the corpus is exhausted), then
    * apply the frozen table corpus-wide as a narrow projection. */
  def bpeMerges(documents: DataFrame, nMerges: Int = BpeDefaultMerges): DataFrame = {
    // The textbook structure (Sennrich's reference implementation trains
    // on a word-count dictionary): ONE corpus pass builds the
    // word-frequency table, and every merge round runs over the distinct
    // word types with the count as the pair weight — pair totals are
    // identical to counting over the corpus (a word's internal pairs
    // depend only on its content), but per-round cost is vocabulary-sized
    // instead of corpus-sized. Earlier corpus-shaped forms measured
    // 12-30 s for 6 rounds at sf0.1; this one is bounded by the single
    // tokenize pass.
    val vocab0 = documents
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wcnt"))
      .select(expr("split(w, '')").as("t"), col("wcnt"))
    def pairCounts(v: DataFrame): DataFrame = v
      .select(col("wcnt"), explode(expr(
        """zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),
          |         (x, y) -> named_struct('a', x, 'b', y))"""
          .stripMargin.replace("\n", " "))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("wcnt").as("cnt"))
    // Greedy left-to-right merge within each word type: fold its symbol
    // list, merging when the accumulated tail is exactly `a` and the next
    // symbol is `b`. A fresh merge output can never immediately re-merge
    // (merged = a+b with b nonempty, so merged != a), which is exactly
    // BPE's non-overlapping application order.
    val fold =
      """aggregate(t, cast(array() as array<string>), (acc, tk) -> CASE
        | WHEN size(acc) = 0 THEN array(tk)
        | WHEN tk = b AND element_at(acc, -1) = a
        |   THEN concat(slice(acc, 1, size(acc) - 1), array(merged))
        | ELSE concat(acc, array(tk)) END)""".stripMargin.replace("\n", " ")
    // Per-round lineage truncation, like clusterLabels: round i's vocab
    // plan contains round i's winner, whose plan contains round i-1's
    // vocab AGAIN — the logical tree doubles every round (2^n subtree
    // copies) and analysis/planning cost blows up super-linearly in
    // rounds if left untruncated. The lazy localCheckpoint makes each
    // round's (tiny) vocab a leaf; the winner frames persist normally
    // (1 row each, read by the next round's cross join and the final
    // union).
    val (_, winners) = (1 to nMerges).foldLeft((vocab0, Seq.empty[DataFrame])) {
      case ((v, ws), i) =>
        val w = graft.core.CacheScope.persisted(
          pairCounts(v).orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
            .select(col("a"), col("b"), concat(col("a"), col("b")).as("merged"), col("cnt")))
        val next = v.crossJoin(broadcast(w))
          .withColumn("t", expr(fold))
          .select("t", "wcnt")
          .localCheckpoint(false)
        (next, ws :+ w.withColumn("merge_idx", lit(i)))
    }
    winners.reduce(_ unionByName _)
      .select(col("merge_idx"), col("a").as("pair_a"), col("b").as("pair_b"),
        col("merged"), col("cnt"))
  }

  /** Apply a learned BPE merge table ([[bpeMerges]] output) to the corpus
    * and return the resulting subword vocabulary (token, cnt) — the
    * other half of the tokenizer lifecycle. The merge table aggregates
    * to ONE ordered array row (sorted fold over merge_idx) and
    * broadcasts; the fold over it replays, per word, the same greedy
    * left-to-right pass [[bpeMerges]] used — so applying the table
    * reproduces training's symbol state exactly (the property the
    * oracle checks by replaying the training rounds corpus-wide
    * instead).
    *
    * Like training, the count aggregate runs over the word-FREQUENCY
    * table: a word type's subwords depend only on its content, so
    * per-type fold × count is identical to folding every occurrence and
    * ~corpus/vocabulary times cheaper (the corpus-shaped form measured
    * 8.4 s at sf0.1; this is ~1 s, dominated by the tokenize pass). The
    * same broadcast fold applied to `__words` directly is the
    * per-document TOKENIZATION projection — one scan, no shuffle — when
    * the output should be token streams rather than counts. */
  /** 1-row merge-table aggregate shared by [[bpeApply]] and
    * [[bpeFertility]]: the trained merges as an ordered struct array,
    * broadcastable next to any word column. */
  private def mergeTable(merges: DataFrame): DataFrame = merges
    .groupBy()
    .agg(expr(
      "transform(array_sort(collect_list(struct(merge_idx, pair_a, pair_b, merged))), " +
        "m -> named_struct('a', m.pair_a, 'b', m.pair_b, 'merged', m.merged))").as("__m"))

  /** SQL fold applying the broadcast merge table `__m` to one word `w`
    * (chars → symbols, each merge replayed in training order). */
  private val applyWord =
    """aggregate(__m, split(w, ''), (syms, m) ->
      |  aggregate(syms, cast(array() as array<string>), (acc, tk) -> CASE
      |    WHEN size(acc) = 0 THEN array(tk)
      |    WHEN tk = m.b AND element_at(acc, -1) = m.a
      |      THEN concat(slice(acc, 1, size(acc) - 1), array(m.merged))
      |    ELSE concat(acc, array(tk)) END))""".stripMargin.replace("\n", " ")

  def bpeApply(documents: DataFrame, merges: DataFrame): DataFrame =
    documents
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wcnt"))
      .crossJoin(broadcast(mergeTable(merges)))
      .select(col("wcnt"), explode(expr(applyWord)).as("token"))
      .groupBy("token").agg(sum("wcnt").as("cnt"))

  /** Tokenizer-fertility quality signal: characters per applied-BPE token,
    * per document (the compression-ratio filter family — text a trained
    * tokenizer compresses poorly is disproportionately boilerplate, noise,
    * or out-of-distribution; Gopher's C4-style filters use the same
    * signal). `chars_ppt` is ppm-scaled chars-per-token, exact integer.
    *
    * Same vocabulary-form trick as [[bpeApply]]: a word type's subword
    * count depends only on its content, so the merge fold runs once per
    * DISTINCT word (vocab-sized, merge table broadcast) and joins back to
    * the per-(doc, word) counts — ~corpus/vocab cheaper than folding every
    * occurrence, and the join is broadcast (vocab side) so the whole
    * operator is one (doc, word) shuffle. Freeze-then-apply at 100 TB:
    * train the merges on a sample, score everything with the frozen
    * table. */
  def bpeFertility(documents: DataFrame, merges: DataFrame): DataFrame = {
    val wf = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("n"))
      .transform(graft.core.CacheScope.persisted)
    val sub = wf.select("w").distinct()
      .crossJoin(broadcast(mergeTable(merges)))
      .select(col("w"), expr(s"size($applyWord)").as("n_sub"),
        length(col("w")).as("n_ch"))
    wf.join(broadcast(sub), "w")
      .groupBy("doc_id")
      .agg(sum(expr("n * n_sub")).as("n_bpe"),
        expr("(1000000L * sum(n * n_ch)) div sum(n * n_sub)").as("chars_ppt"))
  }

  /** Email pattern for [[scrub]]. Same match semantics under Java regex
    * (Spark, backtracking) and RE2 (DuckDB oracle, automaton): RE2
    * guarantees leftmost-first PCRE-compatible results for these shapes. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"

  /** PII / link scrubbing: count and mask emails and URLs (emails first —
    * a masked URL can't contain one). The standard pre-release redaction
    * pass; per-row regex projection, no shuffle. */
  def scrub(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("bigint").as("n_emails"),
      regexp_count(col("text"), lit(UrlRe)).cast("bigint").as("n_urls"),
      regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"), UrlRe, "<URL>")
        .as("clean_text"))

  /** Corpus vocabulary: term frequency + document frequency per
    * lower-cased whitespace token. One explode + one hash aggregation —
    * partial (map-side) aggregation absorbs stopword skew before the
    * shuffle, so the exchange carries one row per (partition, token), not
    * per occurrence; output cardinality is the vocabulary, not the corpus. */
  /** Per-document token-concentration signal: Gini impurity of the
    * lowercased token distribution, `1 − Σ pᵢ²` — low values mean the
    * document keeps repeating a few types (keyword stuffing, boilerplate,
    * log spam), high values a diverse vocabulary. The entropy-family
    * quality signal WITHOUT the `ln`: Σpᵢ² is an exact rational, so the
    * score is emitted as integer ppm (`1e6 − (Σcᵢ²·1e6) div n²`, one
    * pinned floor division) and reproduces bit-for-bit in any engine —
    * same reason the TF-IDF/BM25/LM family here is ln-free.
    *
    * Scale shape: one shuffle on (doc_id, token) for the per-type counts
    * (map-side partials absorb in-document repetition), then a per-doc
    * agg of Σc² over type rows (vocabulary-of-the-doc sized, ≤ token
    * count). Both aggs hash-partition on doc_id, so the second reuses the
    * first's partitioning; no global state, nothing driver-side.
    * Zero-token documents drop out (the explode emits nothing for them)
    * rather than carrying a divide-by-zero NULL — same contract as
    * [[vocabulary]]; gate on [[tokenStats]] first if empties must be
    * surfaced. */
  def giniDiversity(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), lower(col("token")).as("token"))
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c") * col("c")).as("sum_c2"), sum("c").as("n_tokens"),
        count(lit(1)).as("n_types"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        expr("1000000L - (sum_c2 * 1000000L) div (n_tokens * n_tokens)")
          .as("gini_ppm"))

  def vocabulary(documents: DataFrame, minDf: Int = 1): DataFrame =
    documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(lower(col("token")).as("token"))
      .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)

  /** Top-K most characteristic terms per document — TF-IDF with the log
    * damping replaced by the exact rational `tf * 1e6 div df` (integer
    * floor division), so the score and therefore the per-document ranking
    * are bit-identical in any engine: `ln` is the one term-weighting
    * ingredient two floating-point runtimes won't reproduce bit-for-bit,
    * and rank flips at near-ties would be invisible-until-the-oracle-fails
    * bugs. The ranking this produces is the same family (monotone in tf,
    * anti-monotone in df); swap in `log(nDocs / df)` per corpus if
    * calibrated scores matter more than exact reproducibility.
    *
    * Scale shape, in order:
    *   1. per-(doc, term) counts — one shuffle on (doc_id, token), partial
    *      agg absorbs in-document repetition before the exchange. The frame
    *      is PERSISTED: it feeds both the df aggregate and the score join,
    *      and without the pin Catalyst's column pruning specializes the two
    *      subtrees enough that exchange reuse can't dedup them — the corpus
    *      would be tokenized and shuffled twice;
    *   2. document frequency — partial aggregation collapses the stopword
    *      skew (billions of "the" rows become one row per map partition)
    *      before its exchange. The score join is left to AQE: broadcast
    *      when the vocabulary fits (it usually does after `minDf`-style
    *      pruning), sort-merge with runtime skew-split when it doesn't —
    *      forcing either statically would be wrong at one end of the scale;
    *   3. top-K per document — `row_number <= K` over (score desc, token):
    *      Spark's InferWindowGroupLimit plants a PARTIAL WindowGroupLimit
    *      before the doc_id exchange, so each map task forwards at most K
    *      rows per document it sees, not the full term list. The plan-shape
    *      spec pins this.
    */
  def tfidfTopTerms(documents: DataFrame, k: Int = 3): DataFrame = {
    val terms = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), lower(col("token")).as("token"))
      .agg(count(lit(1)).as("tf"))
      .transform(graft.core.CacheScope.persisted)
    val docFreq = terms.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score_ppm").desc, col("token"))
    terms.join(docFreq, "token")
      .withColumn("score_ppm", expr("tf * 1000000L div df"))
      // The filter sits on the RAW row_number output (cast only after):
      // InferWindowGroupLimit pattern-matches `Filter(rn <= k, Window)`,
      // and an intervening cast would silently disable the map-side prune.
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("score_ppm"), col("__rn").cast("bigint").as("term_rank"))
  }

  /** Default query for the registered `t_bm25` row — terms present in the
    * fixture vocabulary with spread document frequencies. */
  val Bm25DefaultQuery: Seq[String] = Seq("spark", "join", "merge", "stream", "window")

  /** BM25 ranked retrieval: top-k documents for a bag-of-terms query,
    * scored with the Okapi saturation curve at the textbook constants
    * k1 = 1.2, b = 0.75 — re-expressed in exact integer arithmetic so any
    * engine reproduces the ranking bit-for-bit (same rationale as
    * [[tfidfTopTerms]]: `ln` and float division are where two runtimes
    * drift at the last ulp, and a rank flip at a near-tie is an
    * invisible-until-the-oracle-fails bug). With k1 = 6/5 and b = 3/4 the
    * per-term score is
    *   idf_ppm · (22000·tf) div (10·tf + 3 + (9·dl_ppk) div 1000)
    * where idf_ppm = (1e6·N) div df (the ln-free rational idf family) and
    * dl_ppk = (1000·dl) div avgdl is the length ratio in ppk. At
    * tf = 1, dl = avgdl the saturation term is exactly 1000 — the curve's
    * defining normalization point. Floor divisions are part of the
    * operator's definition, not a lossy approximation of it: both engines
    * compute identical integers. Overflow bound, stated honestly: the
    * per-term product is ≤ idf_ppm · 2200 ≤ 2.2e9 · N, so BIGINT is safe
    * for corpora up to N ≈ 4×10⁹ documents; past that, drop the idf scale
    * to 1e3 per extra decade of N (ranking unchanged — it is a monotone
    * rescale) before the silent-wraparound regime, where Spark would wrap
    * negative while DuckDB raises.
    *
    * Shape, in order: ONE tokenize pass builds the per-(doc, term) counts
    * (persisted — it feeds document lengths, corpus totals, AND the posting
    * lists; without the pin the corpus is tokenized three times). The
    * posting list is `token IN (query)` — a pushable filter on the
    * persisted frame, so scoring touches only documents containing a query
    * term, never the corpus. df and the 1-row (N, total-tokens) stats
    * broadcast back; the doc-length join is left to AQE. The global top-k
    * is `orderBy.limit(k)` — planned as TakeOrderedAndProject, the
    * map-side-partial global top-k (each partition forwards ≤ k rows), with
    * the rank stamped on the ≤ k survivors. */
  /** Default query BATCH for the multi-query retrieval rows — three
    * distinct five-term queries over the fixture vocabulary (query 0 is
    * the single-query default, so the batch strictly extends it). */
  val Bm25DefaultQueries: Seq[Seq[String]] = Seq(
    Bm25DefaultQuery,
    Seq("hash", "scan", "filter", "column", "batch"),
    Seq("table", "query", "sort", "group", "order"))

  /** [[bm25TopDocs]] for a BATCH of queries in one corpus pass — the
    * shape retrieval actually runs (nothing per-query touches the
    * corpus). One tokenize+tf build serves every query; the postings are
    * filtered once to the UNION of all query terms, df per term is
    * computed once and shared (document frequency doesn't depend on the
    * query), and the tiny (query_id, token) map broadcast-joins the
    * postings to fan each term row out to the queries that use it.
    * Per-query scores aggregate on (query_id, doc_id) — one shuffle of
    * posting-sized data however many queries run — and the per-query
    * top-k is a rank window on query_id, which the optimizer bounds
    * map-side via WindowGroupLimit (each partition forwards ≤ k rows per
    * query). Integer scoring identical to [[bm25TopDocs]], so query 0 of
    * the default batch reproduces the single-query row exactly. */
  def bm25TopDocsMulti(documents: DataFrame,
                       queries: Seq[Seq[String]] = Bm25DefaultQueries,
                       k: Int = 10): DataFrame = {
    require(queries.nonEmpty, "empty query batch")
    val spark = documents.sparkSession
    import spark.implicits._
    val qlists = queries.map(_.map(_.toLowerCase).distinct)
    val allTerms = qlists.flatten.distinct
    val qFrame = qlists.zipWithIndex
      .flatMap { case (ts, i) => ts.map(t => (i.toLong, t)) }
      .toDF("query_id", "token")
    val terms = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), lower(col("token")).as("token"))
      .agg(count(lit(1)).as("tf"))
      .transform(graft.core.CacheScope.persisted)
    val docLen = terms.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = documents.agg(count(lit(1)).as("nd"))
      .crossJoin(terms.agg(sum("tf").as("tt")))
    val posting = terms.filter(col("token").isin(allTerms: _*))
    val docFreq = posting.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = posting
      .join(broadcast(qFrame), "token")
      .join(broadcast(docFreq), "token")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("__sx", expr(
        """((1000000L * nd) div df) *
          |((22000L * tf) div (10L * tf + 3L +
          |  (9L * ((1000L * dl) div greatest(tt div nd, 1L))) div 1000L))""".stripMargin))
      .groupBy("query_id", "doc_id").agg(sum(col("__sx")).as("bm25_x"))
    scored.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("bm25_x").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("bm25_x"),
        col("rank").cast("bigint").as("rank"))
  }

  def bm25TopDocs(documents: DataFrame, query: Seq[String] = Bm25DefaultQuery,
                  k: Int = 10): DataFrame = {
    val qTerms = query.map(_.toLowerCase).distinct
    val terms = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), lower(col("token")).as("token"))
      .agg(count(lit(1)).as("tf"))
      .transform(graft.core.CacheScope.persisted)
    val docLen = terms.groupBy("doc_id").agg(sum("tf").as("dl"))
    // N counts ALL documents (token-less ones included — they dilute idf
    // exactly as in the classic formulation); total tokens folds in-plan.
    val stats = documents.agg(count(lit(1)).as("nd"))
      .crossJoin(terms.agg(sum("tf").as("tt")))
    val posting = terms.filter(col("token").isin(qTerms: _*))
    val docFreq = posting.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = posting
      .join(broadcast(docFreq), "token")
      .join(docLen, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("__sx", expr(
        """((1000000L * nd) div df) *
          |((22000L * tf) div (10L * tf + 3L +
          |  (9L * ((1000L * dl) div greatest(tt div nd, 1L))) div 1000L))""".stripMargin))
      .groupBy("doc_id").agg(sum(col("__sx")).as("bm25_x"))
    val top = scored.orderBy(col("bm25_x").desc, col("doc_id")).limit(k)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("bm25_x").desc, col("doc_id"))))
      .select(col("doc_id"), col("bm25_x"), col("rank").cast("bigint").as("rank"))
  }

  /** Blocklist term filter — the wordlist stage (NSFW/spam/badwords) every
    * production corpus pipeline runs before the statistical filters: flag
    * documents containing any blocked term, with occurrence and
    * distinct-term counts so the gate can be tuned (1 stray hit in a long
    * document vs. saturation) instead of binary. Token-level exact match
    * after case folding — substring matching would flag "class" for
    * "ass"; phrase patterns belong in [[scrub]]'s regex layer. Narrow
    * single pass, the term list lives in the plan (an IN list over a
    * lowered token array) — at any scale this is a per-row projection,
    * zero shuffles, and the blocklist ships with the plan, not as a side
    * table. */
  def blocklistFilter(documents: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty blocklist would pass everything")
    val list = terms.map(_.toLowerCase).distinct
    documents
      .select(col("doc_id"),
        filter(transform(tokens(col("text")), w => lower(w)),
          w => w.isInCollection(list)).as("__hits"))
      .select(col("doc_id"),
        size(col("__hits")).cast("bigint").as("n_hits"),
        size(array_distinct(col("__hits"))).cast("bigint").as("n_terms"),
        (size(col("__hits")) === 0).cast("int").as("keep"))
  }

  /** Canonical text for robust dedup keys — the normalize-before-hashing
    * step CCNet-style pipelines run so that trivially-different copies
    * (case, accents, runs of whitespace, stray control bytes) hash
    * identically: collapse whitespace/control runs to one space → trim →
    * accent-fold (the [[graft.core.Normalize]] table, shared with the
    * reference pipelines) → lowercase, plus the polynomial hash of the
    * canonical string as the ready-made dedup key. Exact dedup on
    * `canon_fp` then catches the near-misses raw-text dedup leaves
    * behind, with NO change to the dedup operator itself. Narrow
    * single-pass projection; the canonical ORDER of the steps is part of
    * the definition (whitespace and control bytes collapse TO A SPACE —
    * never stripped, which would glue words; accents fold before
    * lowering: the table maps uppercase accents to uppercase ASCII). */
  def canonicalize(documents: DataFrame): DataFrame = {
    graft.functions.VectorExprs.register(documents.sparkSession)
    // Whitespace AND control bytes collapse to ONE SPACE in a single
    // class — stripping controls separately would glue words together
    // ("alpha\nbeta" -> "alphabeta"), both missing the real duplicate and
    // colliding with genuinely different text. Collapse first, then trim
    // (plain trim only eats 0x20, so a leading "\n" must become a leading
    // space before trim can see it).
    val canon = lower(translate(
      trim(regexp_replace(col("text"), "[\\s\\x00-\\x1f\\x7f]+", " ")),
      graft.core.Normalize.AccentFrom, graft.core.Normalize.AccentTo))
    documents.select(col("doc_id"), canon.as("canon_text"))
      .withColumn("canon_fp", expr("element_at(poly_hash_array(array(canon_text)), 1)"))
  }

  /** Corpus-trained bigram language-model score — the CCNet-style
    * "perplexity filter" stage: train a bigram LM on the corpus itself,
    * then score every document by how typical its token transitions are.
    * Low scores flag machine-garbled text, OCR noise, and wrong-language
    * fragments whose individual tokens all look fine; the signal is
    * corpus-RELATIVE (like [[rarityScore]]) where [[quality]] and
    * [[gopherRules]] are document-local.
    *
    * The score is the mean conditional bigram probability in ppm:
    * p(w2|w1) = (1e6·c(w1,w2)) div c(w1·) with c(w1·) the bigram-prefix
    * marginal, averaged over the document's bigram occurrences — exact
    * integer arithmetic end-to-end (the true log-perplexity needs `ln`,
    * the one ingredient two engines won't reproduce bit-for-bit; this
    * ln-free mean ranks the same direction: typical transitions score
    * high, improbable ones score ~0). Documents with fewer than two
    * tokens have no transitions and are excluded.
    *
    * Shape: ONE bigram-extraction pass grouped to per-(doc, w1, w2)
    * occurrence counts — persisted, because it feeds BOTH the global
    * bigram table and the scoring join (the tfidf pattern; without the pin
    * the corpus is re-tokenized per branch). The LM table aggregates from
    * those partials (map-side combine absorbs the Zipf head before the
    * exchange), its prefix marginal folds from the table itself
    * (vocabulary-sized, never a corpus pass), and AQE broadcasts both
    * when they fit. At 100 TB the same split applies: train the table on
    * a sample if the vocabulary² tail overflows executor memory, score
    * corpus-wide with the frozen table — the same freeze-then-apply
    * policy as the k-means and BPE trainers. */
  def bigramLmScore(documents: DataFrame): DataFrame = {
    val bigrams = documents
      .select(col("doc_id"), transform(tokens(col("text")), w => lower(w)).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("n"))
      .transform(graft.core.CacheScope.persisted)
    val table = bigrams.groupBy("w1", "w2").agg(sum("n").as("c2"))
    val prefix = table.groupBy("w1").agg(sum("c2").as("c1"))
    bigrams
      .join(table, Seq("w1", "w2"))
      .join(prefix, Seq("w1"))
      .groupBy("doc_id")
      .agg(
        sum(col("n")).as("n_bigrams"),
        expr("sum(n * ((1000000L * c2) div c1)) div sum(n)").as("lm_ppm"))
  }

  /** Count-min sketch depth (hash rows) and width (counters per row).
    * Collision probability per row ≈ vocab/width on the fixture; at
    * production widths (2^20+) the estimate error is ≤ e·N/width with
    * probability 1 − e^−depth, the classic CMS bound. */
  val CmsDepth = 4
  val CmsWidth = 256

  /** Count-min sketch term-frequency estimates (Cormode & Muthukrishnan
    * 2005) — the FREQUENCY sketch next to the KMV CARDINALITY sketch
    * (`v_kmv`): every token occurrence increments `depth` counters
    * (row i at bucket `(a_i·h + b_i) mod P mod width`, the MinHash
    * permutation family so both engines share constants); a term's
    * estimate is the MIN of its counters, always ≥ the true count.
    *
    * The registered row audits the sketch against the exact counts for
    * every distinct corpus token (`overcount = est − exact ≥ 0`, with
    * equality unless buckets collide) — the same self-auditing pattern as
    * `e_lsh_selectivity`.
    *
    * Scale shape: the sketch build is the whole point at 100 TB — the
    * shuffle carries at most depth×width counter partials PER PARTITION
    * (map-side combine absorbs every occurrence), so sketch cost is
    * independent of vocabulary size, unlike the exact `t_vocab` aggregate
    * whose shuffle is vocab-keyed. Sketches from disjoint shards merge by
    * elementwise addition (counters are sums), giving frequency estimates
    * over federated corpora without ever co-shuffling them. The exact
    * side here is the verification baseline, corpus-bounded by design. */
  def cmsTermEstimates(documents: DataFrame,
                       depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame = {
    graft.functions.VectorExprs.register(documents.sparkSession)
    val A = graft.functions.HashKernels.MinHashA
    val B = graft.functions.HashKernels.MinHashB
    require(depth <= A.length, s"depth $depth exceeds the hash family (${A.length})")
    val buckets = (0 until depth).map(i =>
        s"named_struct('row', $i, 'bucket', cast(((${A(i)}L * __h + ${B(i)}L) % $P) % $width as int))")
      .mkString("array(", ", ", ")")
    // One tokenize+hash pass feeds the sketch build AND the exact probe
    // side — PRE-AGGREGATED to (token, __h, count) before the persist:
    // the exact verification side needs the vocab-keyed aggregate anyway,
    // and counters are sums, so the sketch build weights each token's
    // buckets by its count instead of exploding per occurrence. The
    // cached footprint is vocabulary-sized, not corpus-token-sized (the
    // raw occurrence stream at 100 TB IS the corpus). A production
    // sketch-only build (no exact audit) would skip even this groupBy:
    // occurrences → per-partition counter partials directly, the
    // vocab-independent shape the docstring describes — it's the
    // registered row's exact-baseline audit that makes vocab-keyed work
    // unavoidable here.
    val occ = documents
      .select(explode(transform(tokens(col("text")), w => lower(w))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("exact_cnt"))
      .withColumn("__h", expr("element_at(poly_hash_array(array(token)), 1)"))
      .transform(graft.core.CacheScope.persisted)
    val sketch = occ.select(col("exact_cnt"), explode(expr(buckets)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(sum("exact_cnt").as("cnt"))
    occ
      .select(col("token"), col("exact_cnt"), explode(expr(buckets)).as("rb"))
      .select(col("token"), col("exact_cnt"),
        col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy("token")
      .agg(min("cnt").as("est_cnt"), min("exact_cnt").as("exact_cnt"))
      .select(col("token"), col("est_cnt"), col("exact_cnt"),
        (col("est_cnt") - col("exact_cnt")).as("overcount"))
  }

  /** Heavy hitters — every token whose corpus frequency exceeds N/k, with
    * its EXACT count, found without a vocabulary-wide shuffle: the
    * FREQUENT-ITEMS member of the sketch family (KMV = cardinality, CMS =
    * point frequency, this = the frequent set).
    *
    * Two passes, both corpus scans with bounded exchanges:
    *  1. CANDIDATES: a Misra-Gries summary ([[graft.functions.MisraGries]])
    *     — per-partition partials of ≤ k (token, count) pairs merge into
    *     one global summary, so the exchange carries sketches, never
    *     rows. The MG invariant guarantees every token with
    *     `count > N/k` survives (no false negatives); survivors' residual
    *     counts are order-dependent and are DISCARDED.
    *  2. EXACT VERIFY: the ≤ k candidates broadcast back; occurrences are
    *     candidate-filtered before the count agg, so the only
    *     vocab-keyed aggregation runs over ≤ k distinct keys. The gate
    *     `n_occ·k > N` then makes the output a pure function of the
    *     corpus multiset — partitioning and merge order cannot change it
    *     (the same candidates-then-verify discipline as LSH).
    *
    * The occurrence stream is deliberately NOT persisted: it is
    * corpus-token-sized, and two cheap scans beat one corpus-sized cache
    * at any real scale (the round-8 `v_cms` review finding, applied from
    * the start). Emits (token, n_occ, share_ppm) — integer-exact. */
  def heavyHitters(documents: DataFrame, k: Int = 64): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    import org.apache.spark.sql.functions.udaf
    val mg = udaf(new graft.functions.MisraGries(k))
    def occ = documents
      .select(explode(transform(tokens(col("text")), w => lower(w))).as("token"))
    // One 1-row frame carries BOTH the MG summary and the corpus total —
    // the total rides the same scan/agg as the sketch (the documented
    // two-scan cost model; a separate `occ.agg(count)` would be a third
    // full tokenize pass).
    val sketch = graft.core.CacheScope.persisted(
      occ.agg(mg(col("token")).as("cand"), count(lit(1)).as("total")))
    val cands = sketch.select(explode(col("cand")).as("token"))
    val totals = sketch.select("total")
    occ.join(broadcast(cands), Seq("token"))
      .groupBy("token").agg(count(lit(1)).as("n_occ"))
      .crossJoin(broadcast(totals))
      .filter(col("n_occ") * k > col("total"))
      .select(col("token"), col("n_occ"),
        expr("n_occ * 1000000L div total").as("share_ppm"))
  }
}
