package graft.llmdata

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document deduplication for corpus curation: exact, n-gram Jaccard
  * (inverted index), MinHash+LSH, and SimHash. None of them ever builds an
  * all-pairs product — every candidate generation is a bucket join
  * (shingle, LSH band, or SimHash chunk), which is the only shape that
  * survives 100 TB.
  */
object DocDedup {
  import TextPrimitives._

  /** Exact dedup (hash-groupBy): one row per distinct text, keeping the
    * smallest doc_id as the canonical copy. Single hash-shuffle on the text
    * (Spark partitions by the string's hash; only group sizes matter, so
    * skew is bounded by the duplication factor). */
  def exact(documents: DataFrame): DataFrame =
    documents.groupBy(col("text"))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")

  /** Near-dup pairs by exact word-k-gram Jaccard, computed with an inverted
    * index: explode distinct shingles, self-join on the shingle (bucket
    * join — only docs sharing a shingle ever meet), count common shingles
    * per pair, then J = common / (|A| + |B| - common).
    *
    * Scale notes: the shuffle key is the shingle; a stopword-like shingle
    * shared by k docs contributes k² pair rows. `maxDocFreq` caps that —
    * shingles appearing in more docs are dropped from the index (they carry
    * ~no discriminative signal but dominate pair volume). The default (0 =
    * no cap) keeps exact oracle parity; production corpora should set it
    * (~1e4). The per-pair groupBy is the second and last shuffle. */
  def ngramJaccardPairs(documents: DataFrame, k: Int = 3, threshold: Double = 0.5,
                        maxDocFreq: Long = 0L): DataFrame = {
    graft.functions.VectorExprs.register(documents.sparkSession)
    // Persisted: consumed by both sides of the posting self-join and the
    // sizes side — Catalyst has no cross-join subplan reuse, so without
    // this the corpus is scanned and shingled twice (see SCALING.md on
    // diamond plans). The cache holds the HASH array, not the shingle
    // strings (r15): every consumer needs only hashes (posting explodes
    // them) or the count (`size` is 1:1 through poly_hash_array), so
    // hashing lands in the one-time cache build instead of running per
    // consumer — and the cached bytes shrink to 8 B per shingle.
    // Join on the shingle's polynomial hash (BIGINT) instead of the string:
    // far less shuffle volume at corpus scale. A cross-doc hash collision
    // would overcount `common` by 1 — probability ~(shingles²/2)/1e9, and
    // the oracle hashes identically so parity always holds.
    val sh = documents
      .withColumn("__words", tokens(col("text")))
      .withColumn("__sh", expr(sparkShingles("__words", "text", k)))
      .select(col("doc_id"), sparkPolyHashArray("__sh").as("__h"),
        size(col("__sh")).as("n_sh"))
      .transform(graft.core.CacheScope.persisted)
    val postingAll = sh
      .select(col("doc_id"), explode(col("__h")).as("shingle"))
    val posting =
      if (maxDocFreq <= 0L) postingAll
      else {
        // df-filter = one extra agg on the same shuffle key; note Jaccard
        // then under-counts `common` for pairs sharing only capped shingles
        // (sizes stay exact) — the standard recall/cost trade.
        val frequent = postingAll.groupBy("shingle")
          .agg(count(lit(1)).as("__df")).filter(col("__df") > maxDocFreq)
          .select("shingle")
        postingAll.join(frequent, Seq("shingle"), "left_anti")
      }
    val sizes = sh.select(col("doc_id"), col("n_sh"))
    val common = posting.as("a")
      .join(posting.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "id_a", "n_sh" -> "sz_a")), "id_a")
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "id_b", "n_sh" -> "sz_b")), "id_b")
      .withColumn("jaccard",
        round(col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact set-similarity join with PREFIX FILTERING (the PPJoin family —
    * Chaudhuri/Ganti/Kaushik 2006 SSJoin, Xiao et al. 2008 PPJoin): all
    * document pairs whose distinct-shingle-set Jaccard clears
    * `thresholdPpm`, found WITHOUT indexing every shingle. Same pair
    * semantics as [[ngramJaccardPairs]]; the difference is the candidate
    * bound.
    *
    * Prefix principle: order the universe of set elements by ANY fixed
    * total order (here: document frequency ASC, then hash — rarest
    * first); if `J(x, y) ≥ t` then the first `|x| − ⌈t·|x|⌉ + 1` elements
    * of x and of y under that order must intersect. So only the PREFIX
    * of each document — its ~(1−t)·|x| RAREST shingles — enters the
    * inverted index, and no true pair is lost (no false negatives; the
    * oracle twin is the brute-force all-postings join, which is exactly
    * that claim checked per pair). A shingle shared by k docs still
    * contributes k² candidate rows, but only while it is among somebody's
    * rarest few: on Zipf-shaped corpora the head shingles that dominate
    * [[ngramJaccardPairs]]' pair volume never enter the index at all —
    * the classic orders-of-magnitude prune, with exact (not approximate)
    * output, where MinHash banding (L7) trades recall for the same prune.
    *
    * Everything is integer-exact: the threshold is ppm, the prefix length
    * and both pair filters are Long arithmetic, and the output carries
    * (n_inter, n_union) instead of a rounded float. Shuffles: df agg +
    * per-doc prefix window (both keyed corpus-size), candidate join on
    * prefix shingles, and the per-pair verify agg — the verify join's
    * volume is candidate-bounded, never corpus². The length filter
    * (`t·|x| ≤ |y| ∧ t·|y| ≤ |x|`) prunes candidates before the verify.
    * Deviation from full PPJoin: the positional filter is omitted —
    * prefix + length are the dominant prunes and keep the plan to plain
    * joins. */
  def ppJoinPairs(documents: DataFrame, k: Int = 3,
                  thresholdPpm: Long = 500000L): DataFrame = {
    require(thresholdPpm > 0 && thresholdPpm <= 1000000L,
      s"thresholdPpm must be in (0, 1e6], got $thresholdPpm")
    graft.functions.VectorExprs.register(documents.sparkSession)
    val t = thresholdPpm
    // Distinct hashed shingle set + set size. list_distinct AFTER hashing:
    // the pair math is over the hash universe in both engines, so a
    // cross-doc collision still reconciles exactly.
    val base = documents
      .withColumn("__words", tokens(col("text")))
      .withColumn("__sh", expr(sparkShingles("__words", "text", k)))
      .select(col("doc_id"),
        expr(s"array_distinct(${sparkPolyHashArraySql("__sh")})").as("__tk"))
      .withColumn("len", size(col("__tk")).cast("bigint"))
      .transform(graft.core.CacheScope.persisted)
    val posting = base.select(col("doc_id"), col("len"), explode(col("__tk")).as("tok"))
    val dfreq = posting.groupBy("tok").agg(count(lit(1)).as("df"))
    // Prefix = the p rarest shingles of each doc under the global
    // (df ASC, tok ASC) order; p = len − ⌈t·len⌉ + 1. Per-doc window —
    // parallel by doc_id, no global rank needed (any fixed total order
    // satisfies the prefix principle).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("tok"))
    val pref = posting.join(dfreq, Seq("tok"))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= expr(s"len - (len * $t + 999999) DIV 1000000 + 1"))
      .select(col("doc_id"), col("len"), col("tok"))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id") &&
          col("a.len") * lit(1000000L) >= lit(t) * col("b.len") &&
          col("b.len") * lit(1000000L) >= lit(t) * col("a.len"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // Verify by per-pair set intersection over the persisted shingle
    // arrays — NOT by re-joining the posting lists: the posting form
    // explodes every candidate into ~|doc| rows before re-aggregating
    // (candidates × avg-len through an exchange — the sf10 rehearsal
    // caught that shape at exp 1.33, OOM on the default 8 GiB heap and
    // 459 s even at 48 GiB; candidate COUNT itself is exactly linear,
    // 3.29M → 32.9M over the decade). Two array joins ship each candidate
    // pair once, `array_intersect` counts in a projection, and no
    // aggregation state exists at all — re-measured 5.2 s at sf1 /
    // 56.3 s at sf10 (exp 1.03, honest pair-volume linear), 8.2× faster,
    // inside the default heap.
    cand
      .join(base.select(col("doc_id").as("id_a"),
        col("__tk").as("__tka"), col("len").as("__la")), Seq("id_a"))
      .join(base.select(col("doc_id").as("id_b"),
        col("__tk").as("__tkb"), col("len").as("__lb")), Seq("id_b"))
      .withColumn("n_inter", expr("size(array_intersect(__tka, __tkb))").cast("bigint"))
      .withColumn("n_union", col("__la") + col("__lb") - col("n_inter"))
      .filter(col("n_inter") * lit(1000000L) >= lit(t) * col("n_union"))
      .select("id_a", "id_b", "n_inter", "n_union")
  }

  /** Consensus near-dup classification: the union of the TEXT near-dup
    * pairs (MinHash-LSH over shingles, L7) and the EMBEDDING near-dup
    * pairs (hyperplane-LSH over vectors, L11), classified by which signal
    * fired — `both` (lexical AND semantic agreement: the true duplicates
    * safest to drop), `text_only` (shared boilerplate/template with
    * different meaning), `embedding_only` (paraphrase-shaped: same
    * content, different words — the pairs only semantic dedup can see).
    * The standard triage before choosing a removal policy per class.
    *
    * Pure composition: both inputs are the already-bucket-local pair sets
    * (never all-pairs), and the consensus join keys on (id_a, id_b) pair
    * identity — cost is |pairs|, not corpus-sized. Requires doc_id and
    * vec_id to identify the same item (the fixture's embeddings are the
    * documents' embeddings). */
  def consensusPairs(documents: DataFrame, embeddings: DataFrame,
                     textThreshold: Double = 0.5,
                     embThreshold: Double = 0.4): DataFrame = {
    val t = minhashLshPairs(documents, threshold = textThreshold)
      .select(col("id_a"), col("id_b"), lit(1).as("__t"))
    val e = Similarity.lshNearDupPairs(embeddings, embThreshold)
      .select(col("id_a"), col("id_b"), lit(1).as("__e"))
    t.join(e, Seq("id_a", "id_b"), "full_outer")
      .select(col("id_a"), col("id_b"),
        when(col("__t").isNotNull && col("__e").isNotNull, "both")
          .when(col("__t").isNotNull, "text_only")
          .otherwise("embedding_only").as("verdict"))
  }

  /** Window width (tokens) for [[substrPairs]]. The literature uses ~50
    * tokens; the fixture corpus runs 10-99 words per doc, so the default
    * is sized to produce multiple windows per document there. Same
    * recall/precision knob either way: longer windows = fewer, stronger
    * matches. */
  val SubstrWindow = 20

  /** Exact-substring duplication (the ExactSubstr method of Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better"):
    * two documents are substring-duplicates if they share a verbatim run
    * of `window` tokens. Every length-`window` token window is reduced to
    * its polynomial rolling hash; windows meet by exact hash equality
    * (bucket join — only docs sharing a window ever meet, never
    * all-pairs), and pairs aggregate the count of shared window
    * positions. Catches the long-verbatim-overlap duplicates Jaccard
    * dilutes away (a 50-token boilerplate block inside two otherwise
    * different documents barely moves whole-doc Jaccard but is exactly
    * what memorization studies remove).
    *
    * Shape: the window explode emits (n_tokens - window + 1) rows per doc
    * and shuffles on the 64-bit hash — uniform keys, so no skew beyond
    * true duplication. Window hashing here recomputes each window's fold
    * (O(n·window) per doc — fine for verification); at ingest scale,
    * precompute prefix hashes once per doc and each window becomes O(1)
    * (classic rolling-hash identity; needs modular inverse or power
    * tables, which an oracle-checkable SQL twin can't carry cleanly).
    * Docs shorter than `window` contribute their whole token stream as
    * one window, mirroring the shingle fallback, so short exact dups
    * still pair. */
  def substrPairs(documents: DataFrame, window: Int = SubstrWindow): DataFrame = {
    graft.functions.VectorExprs.register(documents.sparkSession)
    val wins = documents
      .withColumn("__words", tokens(col("text")))
      .withColumn("__th", sparkPolyHashArray("__words"))
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN size(__th) >= $window
           | THEN transform(sequence(0, size(__th) - $window),
           |        i -> aggregate(slice(__th, i + 1, $window), 0L, (h, c) -> (h * 31 + c) % $P))
           | ELSE array(aggregate(__th, 0L, (h, c) -> (h * 31 + c) % $P)) END"""
          .stripMargin.replace("\n", " "))).as("whash"))
      // Persisted (r15): both sides of the self-join consume `wins`, and a
      // broadcast build side defeats Catalyst's subplan reuse — unpersisted,
      // the tokenize + poly-hash + O(n·window) rolling-fold ran over the
      // whole corpus TWICE (plan-verified: two full Scan→Project→Generate
      // legs). 16 B/window cached vs one corpus-sized recompute; the
      // release is the caller's via CacheScope.scoped, like every other
      // pair generator here.
      .transform(graft.core.CacheScope.persisted)
    wins.as("a")
      .join(wins.as("b"),
        col("a.whash") === col("b.whash") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_windows"))
  }

  /** MinHash permutation parameters: sig_i(doc) = min over shingle hashes h
    * of (a_i*h + b_i) mod P. 16 signatures in 4 bands of 4 → candidate
    * recall ~ J^4 per band; at J=0.7 overall recall ≈ 0.76, at J=0.9 ≈ 0.99.
    * Constants live in [[graft.functions.HashKernels]] (shared with the
    * codegen'd signature expression) so the DuckDB oracle reproduces the
    * signatures bit-for-bit. */
  def MinHashAB: Seq[(Long, Long)] =
    graft.functions.HashKernels.MinHashA.zip(graft.functions.HashKernels.MinHashB).toSeq

  val Bands = 4
  val RowsPerBand = 4

  /** Spark SQL for the 16-slot MinHash signature array over a shingle-hash
    * array column (codegen'd one-pass [[graft.functions.MinHashSigs]]). */
  def sparkSignature(hashArr: String): String = s"minhash_sigs($hashArr)"

  /** Spark SQL exploding a signature column into its band key strings —
    * the ONE banding definition; intra-set ([[minhashLshPairs]]) and
    * cross-set ([[CorpusOps.dedupAgainstCorpus]]) candidates must bucket
    * identically or cross-batch dedup silently finds no candidates. */
  def bandExplodeSql(sigCol: String): String =
    s"transform(sequence(0, ${Bands - 1}), b -> array_join(transform(slice($sigCol, b * $RowsPerBand + 1, $RowsPerBand), x -> CAST(x AS STRING)), '_'))"

  def duckSignature(hashArr: String): String =
    MinHashAB.map { case (a, b) =>
      s"list_min(list_transform($hashArr, h -> ($a * h + $b) % $P))"
    }.mkString("[", ", ", "]")

  /** MinHash+LSH near-dup pairs: per-doc signature (pure projection, no
    * shuffle), explode the 4 band keys, bucket-join on (band, key), then
    * verify every candidate pair with exact shingle Jaccard and keep
    * J >= threshold. The verification join is by doc_id against the
    * pre-computed shingle arrays — candidates are rare, so that join is
    * cheap; the heavy data (shingle arrays) is never exploded twice. */
  def minhashLshPairs(documents: DataFrame, k: Int = 3, threshold: Double = 0.5): DataFrame = {
    graft.functions.VectorExprs.register(documents.sparkSession)
    // Persisted: consumed four times (both sides of the band self-join +
    // both verification joins); unpersisted the corpus would be
    // re-shingled per consumer. The MinHash SIGNATURE is computed INTO
    // the cache (r15): the band self-join consumes the cache on both
    // sides, and a broadcast build side defeats Catalyst's subplan reuse,
    // so a signature derived downstream was poly-hashed + min-folded over
    // the whole corpus TWICE — one 16-long column per doc makes it
    // once-per-corpus. Same expressions, bit-identical values.
    val sh = documents
      .withColumn("__words", tokens(col("text")))
      .withColumn("__sh", expr(sparkShingles("__words", "text", k)))
      .withColumn("__h", sparkPolyHashArray("__sh"))
      .select(col("doc_id"), col("__sh"), expr(sparkSignature("__h")).as("__sig"))
      .transform(graft.core.CacheScope.persisted)
    val bands = sh.select(
      col("doc_id"),
      posexplode(expr(bandExplodeSql("__sig"))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_key"))
    val candidates = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    candidates
      .join(sh.select(col("doc_id").as("id_a"), col("__sh").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("__sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b"))), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash: 32-bit fingerprint — bit j is set when more distinct tokens
    * have bit j set in their hash than not. Entirely per-row (aggregate
    * lambdas over the token-hash array — no shuffle), then near-dup pairs
    * via the pigeonhole bucket join: hamming(a,b) <= 3 implies at least one
    * of the 4 bytes is identical, so candidates come from joining on
    * (byte_index, byte_value) and are then exact-filtered on bit_count. */
  def simhashFingerprints(documents: DataFrame): DataFrame = {
    // One-pass codegen'd fingerprint (graft.functions.ArraySimhash32) —
    // semantically identical to 32 per-bit aggregate() lambdas, ~30× less
    // array traversal per row.
    graft.functions.VectorExprs.register(documents.sparkSession)
    documents
      .withColumn("__words", tokens(col("text")))
      .withColumn("__h", expr(s"array_distinct(${sparkPolyHashArraySql("__words")})"))
      .select(col("doc_id"), expr("simhash32(__h)").as("simhash"))
  }

  /** SimHash dedup groups: exact-fingerprint buckets with a canonical doc
    * (min id) — the linear-output curation product. Use [[simhashPairs]]
    * for the hamming-window pair form; on corpora with a tiny shared
    * vocabulary (like the synthetic fixture) the pair set is quadratically
    * degenerate (~5M pairs from 5k docs), while groups stay O(docs). */
  def simhashGroups(documents: DataFrame): DataFrame =
    simhashFingerprints(documents)
      .groupBy(col("simhash"))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_docs"))
      .select("doc_id", "simhash", "n_docs")

  /** The REMOVAL half of ExactSubstr (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): [[substrPairs]] only
    * *finds* documents sharing a verbatim `window`-token run; production
    * pipelines REWRITE the corpus so no such duplicated run survives
    * anywhere. Every token position covered by a window whose rolling hash
    * occurs more than once in the corpus — across documents or repeated
    * within one — is dropped, and the document is re-assembled from the
    * surviving tokens (the paper's policy: remove ALL copies, not all but
    * one; the span's content usually survives in whichever document carries
    * it uniquely at a different length).
    *
    * Shape: same window-hash explode as [[substrPairs]] (O(n·window) fold
    * per doc, uniform 64-bit shuffle keys), then ONE count aggregate on the
    * window hash (never a pair join — removal needs multiplicity, not
    * partners, so the quadratic candidate step disappears entirely), a
    * per-doc `collect_set` of duplicated start positions, and a narrow
    * rebuild projection (position filter over the token array — whole-stage
    * codegen, no shuffle). Three shuffles total regardless of duplication
    * factor, which is the 100 TB shape: cost tracks corpus size, not
    * pair count. Docs shorter than `window` contribute their whole token
    * stream as one window (the [[substrPairs]] fallback), so a short doc
    * duplicated anywhere is removed in full (`text_clean = ''`) rather
    * than slipping under the window. */
  def removeDuplicateSpans(documents: DataFrame, window: Int = SubstrWindow): DataFrame = {
    graft.functions.VectorExprs.register(documents.sparkSession)
    // Persisted: consumed by the window explode AND the rebuild join.
    val toks = documents
      .withColumn("__words", tokens(col("text")))
      .withColumn("__th", sparkPolyHashArray("__words"))
      .select("doc_id", "__words", "__th")
      .transform(graft.core.CacheScope.persisted)
    val wins = toks.select(col("doc_id"), explode(expr(
      s"""CASE WHEN size(__th) >= $window
         | THEN transform(sequence(0, size(__th) - $window),
         |        i -> struct(i + 1 AS start, aggregate(slice(__th, i + 1, $window), 0L, (h, c) -> (h * 31 + c) % $P) AS whash))
         | ELSE array(struct(1 AS start, aggregate(__th, 0L, (h, c) -> (h * 31 + c) % $P) AS whash)) END"""
        .stripMargin.replace("\n", " "))).as("w"))
      .select(col("doc_id"), col("w.start").as("start"), col("w.whash").as("whash"))
    // count(*) > 1 counts POSITIONS, so an intra-doc repeat duplicates too.
    val dupStarts = wins
      .join(wins.groupBy("whash").agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1L).select("whash"), "whash")
      .groupBy("doc_id").agg(collect_set(col("start")).as("__starts"))
    toks.join(dupStarts, Seq("doc_id"), "left")
      .withColumn("__starts", coalesce(col("__starts"), expr("cast(array() as array<int>)")))
      .withColumn("__weff", least(size(col("__words")), lit(window)))
      .withColumn("__keep", expr(
        s"""filter(CASE WHEN size(__words) < 1 THEN cast(array() as array<int>)
           |       ELSE sequence(1, size(__words)) END,
           | p -> NOT exists(__starts, s -> p >= s AND p < s + __weff))"""
          .stripMargin.replace("\n", " ")))
      .select(col("doc_id"),
        size(col("__words")).cast("bigint").as("n_tokens"),
        (size(col("__words")) - size(col("__keep"))).cast("bigint").as("n_removed"),
        expr("concat_ws(' ', transform(__keep, p -> element_at(__words, p)))").as("text_clean"))
  }

  /** Bloom-filter hash-function constants, shared with the DuckDB twin:
    * bit_i(h) = ((h · A_i + B_i) mod P) mod m. h < P ≈ 1e9, A ≤ 8191, so
    * the product stays far from Long overflow. Three functions — with the
    * size-adaptive m ≥ 16·N the false-positive rate stays ≈ (1 − e^(−3/16))³
    * ≈ 0.4 % at every corpus size. */
  val BloomHashA: Seq[Long] = Seq(1L, 131L, 8191L)
  val BloomHashB: Seq[Long] = Seq(0L, 7L, 97L)

  /** Size-adaptive Bloom width: m = 2^(12 + #{k ∈ [8,21] : n > 2^k}) —
    * the power of two ≥ 16 bits per corpus key, clamped to [2^12, 2^26].
    * Integer-exact comparison ladder (no float log), mirrored as the CASE
    * sum in the `d_bloom_incr` DuckDB twin so both engines derive the
    * same m from the same row count. */
  def bloomBitsFor(n: Long): Long =
    1L << (12 + (8 to 21).count(k => n > (1L << k)))

  /** Bloom-gated incremental dedup: classify each document of an incoming
    * `batch` against a standing `corpus` WITHOUT shuffling the corpus — the
    * ingest-time membership pattern at 100 TB, where the corpus is orders
    * of magnitude larger than any batch and an exact anti-join per batch
    * would re-shuffle it daily.
    *
    * Shape, in order:
    *   1. corpus → Bloom bitmap: each text's polynomial hash sets 3 bits
    *      in an m-bit filter ([[bloomBitsFor]] — m ≥ 16·N keeps FP ≈ 0.4%).
    *      The bitmap is built as a hash AGGREGATION, not driver state:
    *      `groupBy(bit div 32).agg(bit_or(1 << bit mod 32))` → ≤ m/32 rows
    *      of (word index, 32-bit word in a BIGINT) — ~8 MB of frame at
    *      m = 2^26, a natural broadcast however big the corpus, and
    *      map-side partial `bit_or` collapses each partition's bits before
    *      the exchange (OR is the canonical mergeable sketch).
    *   2. batch probe: explode each batch doc's 3 bit positions, broadcast-
    *      join the word table, doc passes iff all 3 bits are set. Cost:
    *      3 rows per BATCH doc against a broadcast — zero corpus involvement.
    *   3. exact verify: only Bloom-POSITIVE texts (true dups + the ~0.4%
    *      FPs) are checked against the corpus — a broadcast semi-join
    *      pushed INTO the corpus scan, so the corpus is read once and
    *      never shuffled. Bloom misses are definitely novel (no false
    *      negatives), so they skip verification entirely.
    *
    * Output per batch doc: (doc_id, bloom_hit, exact_dup, false_pos) —
    * false_pos audits the filter's actual FP rate, the number a production
    * ingest pipeline alerts on when the filter saturates.
    *
    * `nHint` sizes m from table stats / parquet footers (metadata cost);
    * 0 falls back to one count of the persisted corpus-hash frame. */
  def bloomGateDedup(batch: DataFrame, corpus: DataFrame, nHint: Long = 0L): DataFrame = {
    graft.functions.VectorExprs.register(batch.sparkSession)
    val corpusH = corpus
      .select(expr("element_at(poly_hash_array(array(text)), 1)").as("__h"), col("text"))
      .transform(graft.core.CacheScope.persisted)
    val m = bloomBitsFor(if (nHint > 0) nHint else corpusH.count())
    def bitsExpr = BloomHashA.zip(BloomHashB)
      .map { case (a, b) => s"((__h * ${a}L + ${b}L) % $P) % ${m}L" }
      .mkString("array(", ", ", ")")
    val words = corpusH
      .select(explode(expr(bitsExpr)).as("__bit"))
      .groupBy(expr("__bit div 32").as("__w"))
      .agg(expr("bit_or(shiftleft(1L, cast(__bit % 32 as int)))").as("__word"))
    val probe = batch
      .select(col("doc_id"), col("text"),
        expr("element_at(poly_hash_array(array(text)), 1)").as("__h"))
      .withColumn("__bit", explode(expr(bitsExpr)))
      .withColumn("__w", expr("__bit div 32"))
      .join(broadcast(words), Seq("__w"), "left")
      .groupBy("doc_id", "text")
      .agg((sum(expr("CASE WHEN __word IS NOT NULL AND (__word & shiftleft(1L, cast(__bit % 32 as int))) != 0 THEN 1 ELSE 0 END"))
        === BloomHashA.size).as("bloom_hit"))
      .transform(graft.core.CacheScope.persisted)
    // Exact verify only the Bloom-positive texts: the survivors broadcast
    // into the corpus scan (corpus side stays shuffle-free), and the match
    // set that comes back is ≤ the survivor count.
    val survivors = probe.filter(col("bloom_hit")).select("text")
    val confirmed = corpusH.join(broadcast(survivors), Seq("text"), "left_semi")
      .select(col("text")).distinct()
      .withColumn("__dup", lit(true))
    probe.join(confirmed, Seq("text"), "left")
      .select(col("doc_id"),
        col("bloom_hit").cast("bigint").as("bloom_hit"),
        coalesce(col("__dup"), lit(false)).cast("bigint").as("exact_dup"),
        (col("bloom_hit") && !coalesce(col("__dup"), lit(false))).cast("bigint").as("false_pos"))
  }

  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fp = simhashFingerprints(documents)
    val chunks = fp.select(
      col("doc_id"), col("simhash"),
      posexplode(expr("transform(sequence(0, 3), c -> (simhash >> (c * 8)) & 255)")))
      .withColumnsRenamed(Map("pos" -> "chunk", "col" -> "chunk_val"))
    // Hamming-filter BEFORE the distinct: the bucket join can emit the same
    // candidate pair up to 4×, and far more non-pairs — filtering first
    // keeps the distinct's shuffle to the (small) result set.
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.chunk_val") === col("b.chunk_val")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
