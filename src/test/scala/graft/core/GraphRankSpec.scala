package graft.core

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of [[GraphRank.pageRankPpm]]: exact hand-computed integer
  * ranks on a path graph (pinning the ppm arithmetic the DuckDB oracle
  * mirrors), the degree-regular fixpoint (every regular graph holds every
  * node at exactly 1 000 000 ppm — truncation-free because deg divides the
  * damped mass evenly at the start and stays even), rank concentration on
  * hubs, and partitioning invariance (integer sums are order-free). */
class GraphRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairsDf(ps: Seq[(Long, Long)]): DataFrame =
    ps.toDF("id_a", "id_b")

  private def ranksOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph 1-2-3: hand-computed integer ranks, two rounds") {
    // deg: 1→1, 2→2, 3→1; start 1 000 000 ppm each.
    // round 1: ends send (1e6 div 1)·17 div 20 = 850 000 to the middle;
    //          middle sends (1e6 div 2)·17 div 20 = 425 000 to each end.
    //          ends = 150 000 + 425 000 = 575 000; middle = 1 850 000.
    // round 2: ends send 488 750; middle sends 786 250 to each end.
    //          ends = 936 250; middle = 1 127 500.
    val r = ranksOf(GraphRank.pageRankPpm(pairsDf(Seq((1L, 2L), (2L, 3L))), iterations = 2))
    assert(r == Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))
  }

  test("isolated pair is a fixpoint at exactly 1 000 000 ppm") {
    val r = ranksOf(GraphRank.pageRankPpm(pairsDf(Seq((7L, 3L))), iterations = 5))
    assert(r == Map(3L -> 1000000L, 7L -> 1000000L))
  }

  test("hub of a star concentrates rank; leaves fall below par") {
    val star = pairsDf((1L to 6L).map(i => (0L, i)))
    val r = ranksOf(GraphRank.pageRankPpm(star, iterations = 5))
    assert(r(0L) > 1000000L, s"hub rank ${r(0L)} should exceed par")
    (1L to 6L).foreach(i => assert(r(i) < 1000000L && r(i) == r(1L),
      "leaves must share one sub-par rank"))
  }

  test("ranks are partitioning-invariant (integer sums are order-free)") {
    val ps = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (5L, 6L))
    val base = ranksOf(GraphRank.pageRankPpm(pairsDf(ps), iterations = 4))
    val shuffled = ranksOf(GraphRank.pageRankPpm(
      pairsDf(ps).repartition(7), iterations = 4))
    assert(base == shuffled)
  }

  private def wPairsDf(ps: Seq[(Long, Long, Long)]): DataFrame =
    ps.toDF("id_a", "id_b", "w_ppm")

  test("weighted path graph 1-2-3 (w(1,2)=2, w(2,3)=1): hand-computed ranks") {
    // W: 1→2, 2→3, 3→1; start 1 000 000 each; contribution =
    // ((q·w + (rem·w) div W) · 17) div 20 with q = r div W, rem = r % W.
    // round 1: 1→2: 850000; 2→1: 566666; 2→3: 283333; 3→2: 850000
    //          → r1 = (716666, 1850000, 433333)
    // round 2: 1→2: 609166; 2→1: 1048333; 2→3: 524166; 3→2: 368333
    //          → r2 = (1198333, 1127499, 674166)
    val r = ranksOf(GraphRank.pageRankWeightedPpm(
      wPairsDf(Seq((1L, 2L, 2L), (2L, 3L, 1L))), iterations = 2))
    assert(r == Map(1L -> 1198333L, 2L -> 1127499L, 3L -> 674166L))
  }

  test("uniform weights reproduce the unweighted ranks bit for bit") {
    val ps = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (5L, 6L))
    val unweighted = ranksOf(GraphRank.pageRankPpm(pairsDf(ps), iterations = 4))
    val uniform = ranksOf(GraphRank.pageRankWeightedPpm(
      wPairsDf(ps.map { case (a, b) => (a, b, 700000L) }), iterations = 4))
    assert(uniform == unweighted)
  }

  test("weights change the ordering: the heavy neighbor outranks the light one") {
    // Star 2-1-3: unweighted leaves are symmetric (equal rank); with
    // w(1,2) ≫ w(1,3) node 2 receives most of node 1's mass.
    val uw = ranksOf(GraphRank.pageRankPpm(
      pairsDf(Seq((1L, 2L), (1L, 3L))), iterations = 3))
    assert(uw(2L) == uw(3L))
    val w = ranksOf(GraphRank.pageRankWeightedPpm(
      wPairsDf(Seq((1L, 2L, 1000000L), (1L, 3L, 400000L))), iterations = 3))
    assert(w(2L) > w(3L), s"heavy edge must concentrate rank: ${w(2L)} vs ${w(3L)}")
  }

  test("round plans never re-shuffle the cached edge side (plan-shape pin)") {
    // The operator's own exchange discipline, pinned on its EXECUTED
    // plans (CachePartitioningSpec pins the Spark behavior generically;
    // this pins pageRankPpm's use of it): the seed rank is a groupBy
    // OVER the src-partitioned edge cache — 0 exchanges — and each round
    // checkpoint plans exactly 3 ENSURE_REQUIREMENTS shuffles: the
    // rank side of the edges⋈rank join, the contribution transpose
    // (groupBy(dst) — the algorithm's own volume), and the rank side of
    // the left join (the contribution side reuses the transpose's
    // partitioning). The EDGE side contributes ZERO in every round; a
    // refactor that drops the co-partitioned cache shows up here as 4+.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ring = pairsDf((0L until 200L).map(i => (i, (i + 1) % 200)))
      val cps = PlanShapes.capturePlans(spark) {
        GraphRank.pageRankPpm(ring, iterations = 2).collect(): Unit
      }.filter(_._1 == "localCheckpoint").map(p => PlanShapes.ensureShuffles(p._2))
      assert(cps == Seq(0, 3, 3), s"pagerank round exchanges moved: $cps")
      val wring = wPairsDf((0L until 200L).map(i => (i, (i + 1) % 200, 500000L)))
      val wps = PlanShapes.capturePlans(spark) {
        GraphRank.pageRankWeightedPpm(wring, iterations = 2).collect(): Unit
      }.filter(_._1 == "localCheckpoint").map(p => PlanShapes.ensureShuffles(p._2))
      assert(wps == Seq(0, 3, 3), s"weighted round exchanges moved: $wps")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a zero or negative edge weight throws loudly, never corrupts silently") {
    // Non-ANSI div/% by a zero wsum would NULL contributions (mass
    // silently vanishes) and negative weights corrupt ranks with no
    // arithmetic fault at all — the per-edge guard must convert both
    // into a loud first-action failure.
    Seq(0L, -3L).foreach { bad =>
      val ex = intercept[Exception] {
        GraphRank.pageRankWeightedPpm(
          wPairsDf(Seq((1L, 2L, 1000000L), (2L, 3L, bad))), iterations = 1).collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(ex).exists(_.contains("w_ppm must be >= 1")),
        s"expected the w_ppm guard to fire for w=$bad, got: $ex")
    }
  }

  test("zero iterations returns the uniform start vector") {
    val r = ranksOf(GraphRank.pageRankPpm(pairsDf(Seq((1L, 2L), (2L, 3L))), iterations = 0))
    assert(r.values.toSet == Set(1000000L) && r.keySet == Set(1L, 2L, 3L))
  }
}
