package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an undirected pair graph — the graph-centrality signal a
  * curation pipeline derives from its near-dup / similarity graphs: a
  * document whose neighborhood is dense (boilerplate families, template
  * farms, SEO clusters) concentrates rank, so rank joins quality scoring
  * as a *structural* redundancy feature the per-document scores
  * ([[graft.llmdata.TextAnalysis]]) cannot see. The same fixed-iteration
  * loop serves embedding k-NN graphs (hub detection before semantic
  * dedup).
  *
  * Arithmetic is INTEGER parts-per-million end to end (the t_gini /
  * st_drift_psi discipline): rank starts at 1 000 000 ppm per node and a
  * round computes
  *
  *   rank'(v) = 150 000 + Σ_{(u,v) ∈ E} ((rank(u) div deg(u)) · 17) div 20
  *
  * — the standard damping d = 0.85 as the exact rational 17/20, applied
  * AFTER the degree split so every intermediate stays ≤ 17 · rank (no
  * overflow headroom needed beyond the graph's total mass, which a
  * BIGINT holds past 10¹² nodes). Integer sums are order-independent, so
  * the result is deterministic under any partitioning and the DuckDB
  * oracle (`x_pagerank`) reproduces it bit for bit with `//` — a
  * cross-engine EXACT check no floating-point PageRank can offer.
  *
  * Scale shape: one persisted symmetric edge frame; each round is ONE
  * equi-join (edges ⋈ rank on src — rank carries deg, so no second join)
  * plus ONE groupBy(dst) with map-side partial sums — two edge-set
  * shuffles per round, never a corpus shuffle, the
  * [[graft.llmdata.CorpusOps.clusterLabels]] budget. Fixed iterations
  * (power iteration truncated, not converged) keep the operator a pure
  * function of its input; `localCheckpoint` per round truncates lineage
  * exactly as [[StarComponents]] does — Catalyst re-analysis doubles per
  * round without it long before the data matters.
  */
object GraphRank {

  /** (doc_id, rank_ppm) for every node of `pairs` after `iterations`
    * damped power-iteration rounds (d = 17/20, teleport 150 000 ppm).
    * Domain = ids appearing in `pairs` (isolated docs hold rank exactly
    * 1 000 000 − nothing flows − and are not emitted, matching the
    * cluster operators' convention).
    *
    * @param pairs (id_a, id_b) undirected edges in the near-dup
    *              convention: canonical orientation, distinct, no self
    *              loops ([[graft.llmdata.DocDedup.minhashLshPairs]]'s
    *              contract). Parallel edges, if present, are multigraph
    *              edges — each carries mass.
    */
  def pageRankPpm(pairs: DataFrame, iterations: Int = 5): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    // The edge frame is repartitioned ONCE by src and persisted WITH
    // that partitioning (cached plans keep their outputPartitioning —
    // the scoreSeedPairsInBuckets discipline): every round's edges⋈rank
    // join then plans NO exchange on the edge side, and the degree
    // aggregation below is exchange-free too. Per round the only
    // m-sized shuffle left is the contribution transpose
    // (groupBy(dst)), which IS the algorithm; the rank side is N rows.
    val edges = CacheScope.persisted(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .repartition(col("src")))
    // rank carries deg so each round joins ONCE; both start checkpointed
    // so round plans reference a leaf, never the degree aggregation.
    var rank = edges.groupBy(col("src").as("doc_id"))
      .agg(count(lit(1)).as("deg"))
      .withColumn("rank_ppm", lit(1000000L))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(rank.select(col("doc_id").as("src"),
          expr("((rank_ppm div deg) * 17) div 20").as("__c")), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(sum("__c").as("__s"))
      rank = rank.select("doc_id", "deg")
        .join(contrib, Seq("doc_id"), "left")
        .select(col("doc_id"), col("deg"),
          (lit(150000L) + coalesce(col("__s"), lit(0L))).as("rank_ppm"))
        .localCheckpoint()
    }
    edges.unpersist(blocking = false)
    rank.select("doc_id", "rank_ppm")
  }
}
