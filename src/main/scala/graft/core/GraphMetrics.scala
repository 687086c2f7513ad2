package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected pair graph — the standard
  * degree-ordered orientation algorithm (Cohen, "Graph Twiddling in a
  * MapReduce World", CiSE 2009; the same shape GraphX's TriangleCount
  * and every shared-nothing engine use). Per-node triangle counts are
  * the local clustering-density signal the graph axis was missing:
  * near-dup CLIQUES (true duplicate families) are triangle-dense, while
  * chain-shaped components (template drift: A≈B≈C but A≉C) have none —
  * so triangles/degree separates "keep one of these" families from
  * "gradual rewrite" chains that [[StarComponents]] labels identically.
  *
  * Why orientation is the scale story: the naive wedge join fans out
  * Σ deg(v)² — a 10⁶-degree hub yields 10¹² wedges. Orienting every
  * edge from the (degree, id)-SMALLER endpoint to the larger caps
  * out-degree at O(√m), so wedge volume is bounded by O(m^1.5) TOTAL
  * regardless of skew, and each step is a plain equi-shuffle: one join
  * building wedges at the pivot, one join closing them against the
  * oriented edge set. Every triangle is counted exactly once (its
  * orientation-minimal vertex is the unique pivot).
  */
object GraphMetrics {

  /** (doc_id, n_triangles) for every node of `pairs` — the number of
    * triangles the node participates in (0-rows included, so the frame
    * is a total per-node feature). Input follows the near-dup pair
    * convention ((id_a, id_b), any orientation; self loops and duplicate
    * pairs are tolerated and ignored). */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    // Canonical undirected edge set: one row per unordered pair.
    val und = CacheScope.persisted(
      pairs.select(least(col("id_a"), col("id_b")).as("u"),
          greatest(col("id_a"), col("id_b")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct())
    val sym = und.union(und.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    // Total order (deg, id): orient each edge small → large. ord packs
    // the order key so the wedge emission can compare endpoints without
    // carrying two columns per side.
    // Repartitioned ONCE by the pivot key and persisted WITH that
    // partitioning: the wedge self-join below reads both sides
    // co-partitioned and plans ZERO exchanges (the
    // scoreSeedPairsInBuckets discipline) — the naive form shuffles the
    // oriented edge set twice. The closing join still exchanges the
    // wedge stream on (x, y); that stream IS the algorithm's volume.
    val oriented = CacheScope.persisted(
      sym.join(deg.select(col("node").as("u"), col("deg").as("__du")), "u")
        .join(deg.select(col("node").as("v"), col("deg").as("__dv")), "v")
        .filter(col("__du") < col("__dv")
          || (col("__du") === col("__dv") && col("u") < col("v")))
        .select(col("u"), col("v"), col("__dv"))
        .repartition(col("u"))
    )
    // Wedges at pivot u between out-neighbors v < w in the same (deg,
    // id) order; the closing edge, if present, is oriented v → w by
    // construction (orientation is a total order), so ONE equi-join
    // against the oriented set closes them.
    val wedges = oriented.as("a").join(oriented.as("b"),
        col("a.u") === col("b.u")
          && (col("a.__dv") < col("b.__dv")
            || (col("a.__dv") === col("b.__dv") && col("a.v") < col("b.v"))))
      .select(col("a.u").as("p"), col("a.v").as("x"), col("b.v").as("y"))
    val tris = wedges.join(
      oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
    // Each triangle increments all three corners; nodes outside any
    // triangle keep an explicit 0 so the frame is a total feature.
    val perNode = tris.select(col("p").as("doc_id"))
      .union(tris.select(col("x").as("doc_id")))
      .union(tris.select(col("y").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
    // und/oriented stay persisted for the returned lazy plan's diamonds;
    // release is caller-owned via the CacheScope contract.
    deg.select(col("node").as("doc_id"))
      .join(perNode, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Modulus/multipliers of the deterministic per-edge sampling hash used
    * by [[triangleCountsApprox]]: h(u,v) = ((u%M)·A + (v%M)·B) % M over
    * the canonical (u < v) orientation. M prime, A/B < M, so products
    * stay < 10¹² — BIGINT-safe, and the identical expression runs in the
    * DuckDB twin (`%` ≡ Spark `%` on the non-negative ids of the near-dup
    * convention). */
  val EdgeHashMod: Long = 1000003L
  val EdgeHashA: Long = 912367L
  val EdgeHashB: Long = 340993L

  /** DOULION-style approximate triangle counts (Tsourakakis, Kang,
    * Miller, Faloutsos, "DOULION: counting triangles in massive graphs
    * with a coin", KDD 2009) — the dense-regime escape hatch for
    * [[triangleCounts]]: keep each canonical edge iff
    * `h(u,v) % keepDen < keepNum` (deterministic hash, the library's
    * no-rand() house style — same input, same estimate, and the DuckDB
    * twin replays it bit for bit), count triangles EXACTLY on the
    * sparsified graph, scale by (keepDen/keepNum)³ in integer
    * arithmetic. Each triangle survives iff all 3 edges do (probability
    * p³ under the hash's uniformity), so E[count·p⁻³] = true count; the
    * estimator's variance falls as triangles-per-edge grows — exactly
    * the dense regime where the exact operator's O(m^1.5) wedge volume
    * stops fitting (measured: 16 M nodes / 264 M edges ≈ 65 GB of wedge
    * scratch exact; p = 1/4 divides edge volume by 4 and wedge volume by
    * ~4^1.5 = 8).
    *
    * Domain contract matches [[triangleCounts]]: every node of the FULL
    * graph is emitted (estimate 0 where no sampled triangle touches it)
    * — the sparsifier must not shrink the feature frame. With
    * keepNum == keepDen the filter keeps everything and the result is
    * BIT-IDENTICAL to the exact operator (spec-pinned), so callers can
    * treat p as a pure accuracy/cost knob.
    *
    * Per-NODE estimates are unbiased but noisy at small true counts (a
    * node with 1 triangle reads 0 or 8 at p = 1/2); the headline use is
    * aggregate density (per-component, per-source, whole-graph sums),
    * where the noise cancels. */
  def triangleCountsApprox(pairs: DataFrame,
                           keepNum: Int = 1, keepDen: Int = 2): DataFrame = {
    require(keepNum >= 1 && keepNum <= keepDen,
      s"sampling rate keepNum/keepDen must be in (0, 1]: got $keepNum/$keepDen")
    val und = CacheScope.persisted(
      pairs.select(least(col("id_a"), col("id_b")).as("u"),
          greatest(col("id_a"), col("id_b")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct())
    val kept = und.filter(
      expr(s"((((u % $EdgeHashMod) * $EdgeHashA) + ((v % $EdgeHashMod) * $EdgeHashB)) % $EdgeHashMod) % $keepDen")
        < lit(keepNum.toLong))
    // Exact counting on the sparsified graph, then the p⁻³ unbiasing in
    // one integer expression (den³ ≤ 2⁶³ guarded by the require above
    // for any sane den; num = den short-circuits to ×1 exactly).
    val num3 = keepNum.toLong * keepNum * keepNum
    val den3 = keepDen.toLong * keepDen * keepDen
    val est = triangleCounts(kept.select(col("u").as("id_a"), col("v").as("id_b")))
      .select(col("doc_id"),
        expr(s"(n_triangles * ${den3}L) div ${num3}L").as("est_triangles"))
    // Full-graph node domain: the sparsifier drops edges, never feature
    // rows — nodes whose every edge was sampled away still read 0.
    und.select(col("u").as("doc_id")).union(und.select(col("v").as("doc_id")))
      .distinct()
      .join(est, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("est_triangles"), lit(0L)).as("est_triangles"))
  }
}
