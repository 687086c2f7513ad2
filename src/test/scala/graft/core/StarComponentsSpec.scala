package graft.core

import graft.TestSpark
import graft.llmdata.CorpusOps
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class StarComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairsDf(ps: Seq[(Long, Long)]): DataFrame =
    ps.toDF("id_a", "id_b")

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("single pair yields one two-node component") {
    val (labels, rounds) =
      StarComponents.componentsWithRounds(pairsDf(Seq((9L, 5L))))
    assert(labelsOf(labels) == Map(5L -> 5L, 9L -> 5L))
    assert(rounds <= 2)
  }

  test("empty pair set yields empty labels without iterating") {
    val (labels, rounds) =
      StarComponents.componentsWithRounds(pairsDf(Seq.empty))
    assert(labels.count() == 0L)
    assert(rounds == 0)
  }

  test("self loops and duplicate/reversed edges are tolerated") {
    val labels = StarComponents.components(
      pairsDf(Seq((3L, 3L), (1L, 2L), (2L, 1L), (1L, 2L))))
    assert(labelsOf(labels) == Map(1L -> 1L, 2L -> 1L))
  }

  test("chain components close in O(log n) rounds, diameter-free") {
    // A 64-hop path: min-label propagation needs 63 rounds to carry node 0's
    // id to the far end (clusterLabels' fixed 3-round unroll provably cannot
    // close it); star contraction halves star depth per alternation.
    val chain = (0L until 63L).map(i => (i, i + 1))
    val (labels, rounds) = StarComponents.componentsWithRounds(pairsDf(chain))
    val m = labelsOf(labels)
    assert(m.size == 64 && m.values.forall(_ == 0L))
    assert(rounds <= 10, s"expected O(log n) alternations, took $rounds")
    // The propagation twin at its registered fixed budget does NOT close it:
    val lp = labelsOf(CorpusOps.clusterLabels(pairsDf(chain), iterations = 3))
    assert(lp.values.toSet.size > 1)
  }

  test("mixed cliques + chains match converged label propagation exactly") {
    val ps = Seq(
      // clique {10,11,12}
      (10L, 11L), (11L, 12L), (10L, 12L),
      // chain 20-21-22-23-24
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L),
      // pair {40, 7}
      (40L, 7L))
    val star = labelsOf(StarComponents.components(pairsDf(ps)))
    val prop = labelsOf(CorpusOps.clusterLabelsConverged(pairsDf(ps)))
    assert(star == prop)
    assert(star(24L) == 20L && star(12L) == 10L && star(40L) == 7L)
  }

  test("mergeComponents equals a full rebuild over the union graph") {
    val basePairs = pairsDf(Seq((1L, 2L), (5L, 6L), (10L, 11L)))
    val labels0 = StarComponents.components(basePairs)
    // New edges: bridge components {1,2} and {5,6} through NEW node 50,
    // a new-new pair {60,61}, and a new edge onto an untouched old node 30.
    val newPairs = pairsDf(Seq((2L, 50L), (50L, 6L), (60L, 61L), (30L, 70L)))
    val merged = labelsOf(StarComponents.mergeComponents(labels0, newPairs))
    val rebuild = labelsOf(StarComponents.components(
      basePairs.unionByName(newPairs)))
    assert(merged == rebuild)
    assert(merged(50L) == 1L && merged(6L) == 1L) // bridged through the new node
    assert(merged(11L) == 10L)                    // untouched component stays
    assert(merged(61L) == 60L && merged(70L) == 30L)
  }

  test("heavy rounds run exchange-free stars over the co-partitioned caches (plan-shape pin)") {
    // Forcing the heavy (cached) path with lightMaxEdges = 0: each
    // round's closing localCheckpoint plans exactly ONE
    // ENSURE_REQUIREMENTS exchange — the output `distinct` — because the
    // large-star groupBy-min + join and the small-star groupBy-min +
    // join all read the u-co-partitioned round caches (the −22–27%
    // measured win at 2 M chain nodes). A refactor that loses the cache
    // partitioning re-shuffles one of the four star passes and raises
    // the per-round count. (The initial canonicalization checkpoint is
    // also 1 — its own distinct.)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val chain = pairsDf((0L until 63L).map(i => (i, i + 1)))
      val cps = PlanShapes.capturePlans(spark) {
        StarComponents.componentsWithRounds(chain, lightMaxEdges = 0): Unit
      }.filter(_._1 == "localCheckpoint").map(p => PlanShapes.ensureShuffles(p._2))
      assert(cps.nonEmpty && cps.forall(_ == 1),
        s"star round exchange counts moved: $cps (every checkpoint should plan exactly 1)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a capped non-converged run fails loudly instead of returning labels") {
    // An 8-node chain needs more than one large/small-star alternation;
    // at maxIterations = 1 the old code silently emitted non-canonical
    // labels (and duplicate rows for multi-edge nodes) — now it throws.
    val chain = pairsDf((0L until 7L).map(i => (i, i + 1)))
    val e = intercept[IllegalStateException] {
      StarComponents.componentsWithRounds(chain, maxIterations = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("mergeComponents inherits the loud non-convergence guard") {
    val labels0 = StarComponents.components(pairsDf(Seq((100L, 101L))))
    val chain = pairsDf((0L until 7L).map(i => (i, i + 1)))
    intercept[IllegalStateException] {
      StarComponents.mergeComponents(labels0, chain, maxIterations = 1)
    }
  }

  test("mergeComponents with no new pairs returns the stored labels") {
    val basePairs = pairsDf(Seq((1L, 2L), (3L, 4L)))
    val labels0 = StarComponents.components(basePairs)
    val merged = StarComponents.mergeComponents(labels0, pairsDf(Seq.empty))
    assert(labelsOf(merged) == labelsOf(labels0))
  }

  test("incrementalClusters over the fixture equals the star rebuild") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val incr = labelsOf(CorpusOps.incrementalClusters(docs))
    val full = labelsOf(CorpusOps.dedupClustersStar(docs))
    assert(incr == full)
    assert(incr.nonEmpty)
  }
}
