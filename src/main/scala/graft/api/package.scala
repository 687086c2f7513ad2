package graft

import graft.core.{AsofJoin, Dedup, Normalize, RangeJoin, SchemaCasts, SkewJoin}
import graft.llmdata.{CorpusOps, DocDedup, Similarity, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}

/** User-facing syntax: one import gives DataFrame-method access to the
  * whole operator library, so pipeline code reads left-to-right like the
  * reference's PySpark chains.
  *
  * {{{
  * import graft.api._
  *
  * val clean = docs.cleanCorpus()                  // langID+quality → dedup
  * val latest = df.top1PerKey(Seq("k"), Seq($"ts".desc, $"id".asc))
  * val chunks = docs.chunkTokens(512)
  * }}}
  *
  * Everything here delegates 1:1 to the package objects (which remain the
  * canonical, individually documented API); this facade adds no logic.
  */
package object api {

  /** Core relational/cleansing operators (SURVEY.md §2: C1-C4, D1-D3, P7-P8). */
  implicit class GraftCoreOps(private val df: DataFrame) {
    /** Deterministic keep-one-per-key (window argmax; supply a total order). */
    def top1PerKey(keys: Seq[String], order: Seq[Column]): DataFrame =
      Dedup.top1PerKey(df, keys, order)
    /** Schema-driven Decimal→Double (+ named cols → TIMESTAMP_NTZ) cast. */
    def castDecimalDouble(tsCols: String*): DataFrame =
      SchemaCasts.castDecimalDouble(df, tsCols: _*)
    /** Null-fill every float/double column with 0. */
    def fillFloatNulls: DataFrame = SchemaCasts.fillFloatNulls(df)
    /** Skew-safe join: scatter hot keys across `saltFactor` sub-keys. */
    def saltedJoin(small: DataFrame, keys: Seq[String], saltFactor: Int,
                   joinType: String = "inner"): DataFrame =
      SkewJoin.saltedJoin(df, small, keys, saltFactor, joinType)
    /** Latest right row at-or-before each left timestamp, per key. */
    def asofJoin(right: DataFrame, keys: Seq[String], leftTs: String,
                 rightTs: String, payload: Seq[String]): DataFrame =
      AsofJoin.asofBackward(df, right, keys, leftTs, rightTs, payload)
    /** Point-in-interval join via time-bucketized equi-join. */
    def rangeJoin(intervals: DataFrame, pointTs: String, startCol: String,
                  endCol: String, bucketSeconds: Long, keys: Seq[String] = Nil): DataFrame =
      RangeJoin.pointInInterval(df, intervals, pointTs, startCol, endCol, bucketSeconds, keys)
    /** Band join: |left value − right value| <= eps, via value-bucketized
      * equi-join (integer-valued columns). */
    def bandJoin(right: DataFrame, lVal: String, rVal: String, eps: Long,
                 keys: Seq[String] = Nil): DataFrame =
      RangeJoin.bandJoin(df, right, lVal, rVal, eps, keys)
    /** Rolling ROWS-frame stats per user over event time (moving sum/count
      * + inter-arrival gap); expects event_id/user_id/ts/value columns. */
    def rollingStats(frame: Int = 5): DataFrame =
      graft.streaming.EventStream.rollingStats(df, frame)
    /** Equi-width histogram of an integral column (exact integer buckets;
      * pass loHi from stored stats to make it a single pass). */
    def histogram(colName: String, nBuckets: Int = 16,
                  loHi: Option[(Long, Long)] = None): DataFrame =
      graft.sources.TableStats.histogram(df, colName, nBuckets, loHi)
    /** Behavioral near-duplicate users over an event frame (token-enriched
      * sequence n-gram Jaccard — bot/replay detection). */
    def sequenceNearDup(k: Int = 3, threshold: Double = 0.5): DataFrame =
      graft.streaming.EventStream.sequenceNearDup(df, k, threshold)
  }

  /** Corpus curation over a `(doc_id, text, …)` document frame. */
  implicit class GraftCorpusOps(private val docs: DataFrame) {
    def tokenStats: DataFrame = TextAnalysis.tokenStats(docs)
    def qualitySignals: DataFrame = TextAnalysis.quality(docs)
    def langId: DataFrame = TextAnalysis.langId(docs)
    def contentFingerprint: DataFrame = TextAnalysis.fingerprint(docs)
    def repetitionSignals: DataFrame = TextAnalysis.repetition(docs)
    def scrubPii: DataFrame = TextAnalysis.scrub(docs)
    def vocabulary(minDf: Int = 1): DataFrame = TextAnalysis.vocabulary(docs, minDf)
    /** Top-k characteristic terms per doc (integer-exact TF-IDF). */
    def tfidfTopTerms(k: Int = 3): DataFrame = TextAnalysis.tfidfTopTerms(docs, k)
    /** Gopher-rule signals + composite keep flag. */
    def gopherRules: DataFrame = TextAnalysis.gopherRules(docs)
    /** Mean inverse-df rarity score (exact integer ppm). */
    def rarityScore: DataFrame = TextAnalysis.rarityScore(docs)
    /** Train a BPE merge table (word-frequency form). */
    def bpeMerges(nMerges: Int = TextAnalysis.BpeDefaultMerges): DataFrame =
      TextAnalysis.bpeMerges(docs, nMerges)
    /** Apply a learned merge table; returns the subword vocabulary. */
    def bpeApply(merges: DataFrame): DataFrame = TextAnalysis.bpeApply(docs, merges)
    /** Chars-per-BPE-token compression quality signal per document. */
    def bpeFertility(merges: DataFrame): DataFrame = TextAnalysis.bpeFertility(docs, merges)
    /** Every token above N/k corpus share, exact counts (MG candidates →
      * exact verify). */
    def heavyHitters(k: Int = 64): DataFrame = TextAnalysis.heavyHitters(docs, k)
    /** Hybrid BM25 × embedding retrieval fused by reciprocal-rank fusion,
      * over a query batch (lexical query i pairs with embedding vec i). */
    def hybridRrfTopK(embeddings: DataFrame,
                      queries: Seq[Seq[String]] = TextAnalysis.Bm25DefaultQueries,
                      k: Int = 10, kRrf: Int = 60): DataFrame =
      Similarity.hybridRrfTopK(docs, embeddings, queries, k, kRrf)
    /** Count-min sketch term-frequency estimates audited vs exact counts. */
    def cmsTermEstimates(depth: Int = TextAnalysis.CmsDepth,
                         width: Int = TextAnalysis.CmsWidth): DataFrame =
      TextAnalysis.cmsTermEstimates(docs, depth, width)
    /** Per-(source, lang) corpus report with exact ppm means. */
    def corpusReport: DataFrame = CorpusOps.corpusReport(docs)
    /** Token-concentration signal: Gini impurity of the per-doc token
      * distribution, exact integer ppm (the ln-free entropy family). */
    def giniDiversity: DataFrame = TextAnalysis.giniDiversity(docs)
    /** Cross-source shingle-overlap matrix (shared distinct k-shingles +
      * exact containment/Jaccard ppm per source pair). */
    def sourceOverlap(k: Int = 8): DataFrame = CorpusOps.sourceOverlap(docs, k)

    def dedupExact: DataFrame = DocDedup.exact(docs)
    def ngramNearDupPairs(k: Int = 3, threshold: Double = 0.5, maxDocFreq: Long = 0L): DataFrame =
      DocDedup.ngramJaccardPairs(docs, k, threshold, maxDocFreq)
    def minhashNearDupPairs(k: Int = 3, threshold: Double = 0.5): DataFrame =
      DocDedup.minhashLshPairs(docs, k, threshold)
    /** EXACT Jaccard ≥ t pairs via prefix filtering (PPJoin family):
      * only each doc's rarest shingles are indexed, no recall loss. */
    def ppJoinPairs(k: Int = 3, thresholdPpm: Long = 500000L): DataFrame =
      DocDedup.ppJoinPairs(docs, k, thresholdPpm)
    def simhashGroups: DataFrame = DocDedup.simhashGroups(docs)
    /** Pairs sharing a verbatim `window`-token run (rolling-hash windows). */
    def substrNearDupPairs(window: Int = DocDedup.SubstrWindow): DataFrame =
      DocDedup.substrPairs(docs, window)
    /** Rewrite the corpus with every duplicated `window`-token run removed
      * (the removal half of ExactSubstr). */
    def removeDuplicateSpans(window: Int = DocDedup.SubstrWindow): DataFrame =
      DocDedup.removeDuplicateSpans(docs, window)
    /** Text × embedding near-dup consensus (both/text_only/embedding_only). */
    def consensusNearDupPairs(embeddings: DataFrame,
                              textThreshold: Double = 0.5,
                              embThreshold: Double = 0.4): DataFrame =
      DocDedup.consensusPairs(docs, embeddings, textThreshold, embThreshold)

    def stratifiedSample(ratesPerMille: Map[String, Int], defaultPerMille: Int = 1000): DataFrame =
      CorpusOps.stratifiedSample(docs, ratesPerMille, defaultPerMille)
    /** Temperature-rebalanced sample — fully in-plan, no driver action. */
    def temperatureSample(stratum: String = "lang", temperature: Double = 2.0): DataFrame =
      CorpusOps.temperatureSample(docs, stratum, temperature)
    def tokenBudgetSample(budgets: Map[String, Long], defaultBudget: Long = Long.MaxValue): DataFrame =
      CorpusOps.tokenBudgetSample(docs, budgets, defaultBudget)
    def decontaminateAgainst(benchmark: DataFrame, k: Int = 8): DataFrame =
      CorpusOps.decontaminate(docs, benchmark, k)
    def dedupClusters: DataFrame = CorpusOps.dedupClusters(docs)
    /** Diameter-independent clusters (star contraction; same labels). */
    def dedupClustersStar: DataFrame = CorpusOps.dedupClustersStar(docs)
    /** Per-source cume_dist calibration of quality scores. */
    def sourceQuantileNorm: DataFrame = CorpusOps.sourceQuantileNorm(docs)
    /** Integer-ppm PageRank over the near-dup graph (redundancy signal). */
    def docPageRank: DataFrame = CorpusOps.docPageRank(docs)
    /** Per-document triangle counts (clique vs chain density signal). */
    def docTriangles: DataFrame = CorpusOps.docTriangles(docs)
    def chunkTokens(maxTokens: Int = 16): DataFrame = CorpusOps.chunk(docs, maxTokens)
    def packChunks(budget: Int = 64, shards: Int = 8): DataFrame =
      CorpusOps.packChunks(docs, budget, shards)
    def trainingSequences(budget: Int = 64, shards: Int = 8, maxTokens: Int = 16): DataFrame =
      CorpusOps.trainingSequences(docs, budget, shards, maxTokens)
    def lengthBucketedBatches(batchSize: Int = 4, budget: Int = 64,
                              shards: Int = 8, maxTokens: Int = 16): DataFrame =
      CorpusOps.lengthBucketedBatches(docs, batchSize, budget, shards, maxTokens)
    def scoreQuantiles(qs: Seq[Double] = CorpusOps.DefaultQuantiles,
                       buckets: Int = 256): DataFrame =
      CorpusOps.scoreQuantiles(docs, qs, buckets)
    /** Keep docs at/above the corpus's exact q-quantile quality score. */
    def autoQualityFilter(q: Double = 0.5, buckets: Int = 256): DataFrame =
      CorpusOps.autoQualityFilter(docs, q, buckets)
    def dedupAgainst(corpus: DataFrame, k: Int = 3, threshold: Double = 0.5): DataFrame =
      CorpusOps.dedupAgainstCorpus(docs, corpus, k, threshold)
    /** Bloom-gated membership vs a standing corpus (no corpus shuffle). */
    def bloomDedupAgainst(corpus: DataFrame, nHint: Long = 0L): DataFrame =
      DocDedup.bloomGateDedup(docs, corpus, nHint)
    /** Sampled quantile estimates of n_chars + exact-rank error audit. */
    def sampledQuantiles(qs: Seq[Double] = CorpusOps.DefaultQuantiles,
                         target: Long = 4096L, nHint: Long = 0L): DataFrame =
      CorpusOps.sampledQuantiles(docs, qs, target, nHint)
    /** Incremental dedup against a stored index ([[CorpusOps.buildDedupIndex]]). */
    def dedupAgainstIndex(indexDir: String, k: Int = 3, threshold: Double = 0.5): DataFrame =
      CorpusOps.dedupAgainstIndex(docs, indexDir, k, threshold)
    /** Materialize this corpus' dedup index (shingles + LSH bands). */
    def buildDedupIndex(indexDir: String, k: Int = 3): Unit =
      CorpusOps.buildDedupIndex(docs, indexDir, k)
    /** Keep each doc with probability weight/max(weight) — deterministic PPS. */
    def ppsSample(weightCol: String = "n_chars"): DataFrame =
      CorpusOps.ppsSample(docs, weightCol)
    /** FIXED-size weighted sample + unbiased ŵ = max(w, τ) estimator
      * (priority sampling). */
    def prioritySample(n: Int = 100, weightCol: String = "n_chars"): DataFrame =
      CorpusOps.prioritySample(docs, n, weightCol)
    def shuffleOrder(buckets: Int = 256, epoch: Long = 0L): DataFrame =
      CorpusOps.shuffleOrder(docs, buckets, epoch)
    def cleanCorpus(keepLang: String = "en", minQuality: Double = 0.6): DataFrame =
      CorpusOps.cleanCorpus(docs, keepLang, minQuality)
    def perSourceCap(cap: Int = 10): DataFrame = CorpusOps.perSourceCap(docs, cap)
    def datasetSplit(valPerMille: Int = 10, testPerMille: Int = 10): DataFrame =
      CorpusOps.datasetSplit(docs, valPerMille, testPerMille)
    def bm25TopDocs(query: Seq[String], k: Int = 10): DataFrame =
      TextAnalysis.bm25TopDocs(docs, query, k)
    /** Per-query BM25 top-k for a query batch in one corpus pass. */
    def bm25TopDocsMulti(queries: Seq[Seq[String]], k: Int = 10): DataFrame =
      TextAnalysis.bm25TopDocsMulti(docs, queries, k)
    def bigramLmScore: DataFrame = TextAnalysis.bigramLmScore(docs)
    def canonicalize: DataFrame = TextAnalysis.canonicalize(docs)
    def blocklistFilter(terms: Seq[String]): DataFrame =
      TextAnalysis.blocklistFilter(docs, terms)
    def cleanFunnel(keepLang: String = "en", minQuality: Double = 0.6): DataFrame =
      CorpusOps.cleanFunnel(docs, keepLang, minQuality)
    def epochPlan(weightsPerMille: Map[String, Int], stratum: String = "source"): DataFrame =
      CorpusOps.epochPlan(docs, weightsPerMille, stratum)
    /** DSIR-style importance score vs a target slice (ln-free integer form). */
    def importanceScore(isTarget: org.apache.spark.sql.Column =
                          org.apache.spark.sql.functions.col("lang") === "en",
                        buckets: Int = CorpusOps.DsirBuckets): DataFrame =
      CorpusOps.importanceScore(docs, isTarget, buckets)
    def keepBestPerCluster: DataFrame = CorpusOps.keepBestPerCluster(docs)
    def strideMixOrder(weightsPerMille: Map[String, Int],
                       stratum: String = "source"): DataFrame =
      CorpusOps.strideMixOrder(docs, weightsPerMille, stratum)
  }

  /** Similarity search over an `(id, vec: array<float>, …)` embedding frame
    * (query set = the first `nQueries` ids, as in the registered queries). */
  implicit class GraftEmbeddingOps(private val embs: DataFrame) {
    def cosineTopK(nQueries: Int = 8, k: Int = 10): DataFrame =
      Similarity.bruteForceTopK(embs, nQueries, k)
    def cosineNearDupPairs(threshold: Double = 0.4): DataFrame =
      Similarity.cosineNearDupPairs(embs, threshold)
    def lshNearDupPairs(threshold: Double = 0.4,
                        planes: Int = 0, bandBits: Int = 0): DataFrame =
      Similarity.lshNearDupPairs(embs, threshold, planes, bandBits)
    def lshNearDupAgainst(corpus: DataFrame, threshold: Double = 0.4,
                          planes: Int = 0, bandBits: Int = 0): DataFrame =
      Similarity.lshNearDupAgainst(embs, corpus, threshold, planes, bandBits)
    def lshTopK(nQueries: Int = 8, k: Int = 10,
                planes: Int = Similarity.LshPlanes,
                bandBits: Int = Similarity.LshBandBits): DataFrame =
      Similarity.lshTopK(embs, nQueries, k, planes, bandBits)
    def ivfTopK(nQueries: Int = 8, k: Int = 10, nCells: Int = 16,
                nProbe: Int = 2, kmeansIters: Int = 1): DataFrame =
      Similarity.ivfTopK(embs, nQueries, k, nCells, nProbe, kmeansIters)
    def quantizedTopK(nQueries: Int = 8, k: Int = 10): DataFrame =
      Similarity.quantizedTopK(embs, nQueries, k)
    /** Diversified top-k by Maximal Marginal Relevance (λ-weighted
      * redundancy penalty, greedy over the exact-cosine pool). */
    def mmrTopK(nQueries: Int = 8, k: Int = 8, overfetch: Int = 4,
                lambdaPpm: Long = 700000L): DataFrame =
      Similarity.mmrTopK(embs, nQueries, k, overfetch, lambdaPpm)
    /** Product-quantization ANN: codebook-encoded corpus, ADC candidates,
      * exact re-rank. */
    def pqTopK(nQueries: Int = 8, k: Int = 10, kSub: Int = 8,
               overfetch: Int = 3, kmeansIters: Int = 1): DataFrame =
      Similarity.pqTopK(embs, nQueries, k, kSub, overfetch, kmeansIters)
    def kmeansCentroids(nCells: Int = 16, iters: Int = 1): DataFrame =
      Similarity.kmeansCentroids(embs, nCells, iters)
    def labelCentroids: DataFrame = Similarity.labelCentroids(embs)
    /** Build + store the IVF index (cell-partitioned; DPP-served probes). */
    def buildIvfIndex(indexDir: String, nCells: Int = 16, kmeansIters: Int = 1): Unit =
      Similarity.buildIvfIndex(embs, indexDir, nCells, kmeansIters)
    /** Append this frame's vectors to a stored index (frozen centroids). */
    def appendToIvfIndex(indexDir: String): Unit =
      Similarity.appendToIvfIndex(embs, indexDir)
    /** SemDeDup: within-k-means-cell near-dup removal (min-id keeper). */
    def semDedup(threshold: Double = 0.4, nCells: Int = 0,
                 kmeansIters: Int = 1): DataFrame =
      Similarity.semDedup(embs, threshold, nCells, kmeansIters)
    /** SemDeDup with explicit two-level (coarse × fine) cells. */
    def semDedupHier(threshold: Double = 0.4, kCoarse: Int = 4, kFine: Int = 4,
                     kmeansIters: Int = 1): DataFrame =
      Similarity.semDedupHier(embs, threshold, kCoarse, kFine, kmeansIters)
    /** Near-dup pairs with identical-vector collapse + hot-bucket cap. */
    def collapsedNearDupPairs(threshold: Double = 0.4, planes: Int = 0,
                              bandBits: Int = 0, maxBucket: Long = 0L): DataFrame =
      Similarity.collapsedNearDupPairs(embs, threshold, planes, bandBits,
        maxBucket = maxBucket)
    def hardNegatives(nQueries: Int = 8, skip: Int = 10, take: Int = 10): DataFrame =
      Similarity.hardNegatives(embs, nQueries, skip, take)
    def pcaProjection(iters: Int = 3): DataFrame = Similarity.pcaProjection(embs, iters)
    def centroidOutliers(frac: Double = 0.05): DataFrame =
      Similarity.centroidOutliers(embs, frac)
    def rpTopK(nQueries: Int = 8, k: Int = 10, rpDims: Int = 16,
               overfetch: Int = 3): DataFrame =
      Similarity.rpTopK(embs, nQueries, k, rpDims, overfetch)
  }

  /** Column-level normalization functions (C1-C3). */
  def stripNormalize(c: Column): Column = Normalize.stripNormalize(c)
  def cnpjNormalize(c: Column): Column = Normalize.cnpjNormalize(c)
  def etiqueta(c: Column): Column = Normalize.etiqueta(c)
}
