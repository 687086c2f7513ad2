package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance: the number of shuffle partitions is the one
  * physical knob guaranteed to differ between local[32] and a 1000-executor
  * cluster, so every registered query must produce the identical multiset
  * of rows under different values. Catches hidden order-dependence
  * (dropDuplicates-style nondeterminism, float reduction order, rand()). */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** One representative per operator family (full coverage would re-run the
    * whole registry twice; the oracle gate already covers single-config
    * correctness). */
  private val representative = Seq(
    "a_flagship",      // day-range union + windows + broadcast join
    "b_ressarcimento", // the full pipeline-B assembly
    "c_pack",          // shard-local window packing
    "c_corpus",        // composed cleaning pipeline
    "d_minhash",       // LSH bucket join
    "j_asof",          // union-window as-of join
    "j_salted",        // deterministic salting
    "c_seqtext",       // ordered aggregation (collect_list arrival order)
    "e_centroids",     // sorted-fold float sums (reduction-order sensitivity)
    "e_kmeans",        // trained-centroid means (assignment + sorted folds)
    "c_incr",          // cross-batch LSH dedup
    "c_shuffle",       // global permutation (range-bucket offsets + rank)
    "c_quantiles",     // exact rank targets over the same machinery
    "v_kmv",           // sketch aggregate (merge-order sensitivity)
    "t_bm25",          // global top-k + integer scoring over persisted terms
    "t_lmscore",       // bigram LM (partial-agg table + weighted mean)
    "e_pca",           // power iteration (per-dim sorted folds across rounds)
    "c_sourcecap",     // per-source rank under partial WindowGroupLimit
    "c_funnel",        // staged counts over shared persisted frames
    "d_substr_rm",     // window multiplicity + collect_set cover rebuild
    "c_dsir",          // bucket models + shifted integer divisions
    "v_cms",           // counter-partial merge order (sketch = sums, min over rows)
    "k_snapshot_diff", // full-outer diff classification over committed stores
    "e_pq_topk",       // PQ codebooks + ADC candidate ties (code-pair scores)
    "d_ppjoin",        // df-ordered prefix window + array-intersect verify
    "e_mmr",           // greedy argmax fold (float ties broken on pool index)
    "c_overlap",       // collect_set source lists (arrival order) → sorted pairs
    "w_rolling",       // bounded ROWS frame over a (ts, event_id) sort
    "j_band",          // ±1-bucket replication exactly-once emission
    "x_seqsim")        // ordered sequence aggregation feeding shingle pairs

  private def run(name: String, parts: Int): Seq[String] = {
    // Drop blocks persisted by the previous run: CacheManager substitutes
    // cached data for identical subplans, which would let the second run
    // silently reuse stages executed under the FIRST partition count —
    // exactly the vacuity this spec must avoid.
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try SparkEntry.queries(name)(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", 4)
  }

  representative.foreach { name =>
    test(s"$name is invariant under shuffle-partition count (3 vs 17)") {
      assert(run(name, 3) == run(name, 17))
    }
  }
}
