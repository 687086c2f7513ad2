package graft.llmdata

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Similarity.scoringShapeChoice]] — the stats-driven join-vs-grid
  * recommendation for knnGraph's scoring stages. The estimates are pure
  * integer arithmetic off (n, dims, k, P), so the spec asserts EXACT
  * values at the measured sf10 point (200 k × 64-dim, k = 5) and the
  * decision's direction at the two P regimes the scaladoc discusses.
  * The registered default does NOT auto-switch (single-box measurement:
  * join 269 s vs grid 340 s at 200 k) — this spec also pins that the
  * helper is advisory arithmetic, not a plan hook: knnGraph's signature
  * takes gridScore from the CALLER only.
  */
class ScoringShapeSpec extends AnyFunSuite {

  test("sf10 point (200k x 64-dim, k=5): exact estimates, join wins at P=16") {
    val s = Similarity.scoringShapeChoice(200000L, 64, 5, gridSideP = 16)
    // knnBanding(200k) = (104, 13): 8 bands, occupancy 200k/8192 ≈ 24.41
    val (p, r) = Similarity.knnBanding(200000L)
    assert((p, r) == (104, 13))
    assert(s.poolPairs == 200000L * 55, "k-budget pool: N·(2k²+k)")
    // seedCand = 8 · 200000 · (occ−1)/2, occ = 200000/8192
    val occ = 200000.0 / 8192
    assert(s.seedCandidates == (8L * 200000 * (occ - 1.0) / 2.0).toLong)
    val vecBytes = 8L * 64 + 28
    assert(s.joinBytes == 8L * 200000 * vecBytes + 10L * 200000 * vecBytes +
      24L * (s.seedCandidates + s.poolPairs))
    assert(s.gridBytes == 2L * 16 * 200000 * vecBytes + 48L * 8 * 200000 +
      20L * (s.seedCandidates + s.poolPairs))
    assert(s.choice == "join",
      s"at P=16 the grid's 32-way vector replication must lose: $s")
  }

  test("at the in-engine grid side (P=8) the byte model favors the grid — the documented tension with the single-box wall clock") {
    val s = Similarity.scoringShapeChoice(200000L, 64, 5, gridSideP = 8)
    assert(s.choice == "grid",
      s"P=8 replication (16·N·vec) undercuts the join's bands+2k (18·N·vec): $s")
    // The sign of the tension is the point: bytes alone would flip the
    // default, and the measured wall clock says don't — which is why
    // gridScore stays caller-owned.
  }

  test("stats-frame entry point reads n_rows and refuses ambiguous stats") {
    val spark = TestSpark.spark
    import spark.implicits._
    val stats = Seq(("vec_id", 200000L), ("other", 7L)).toDF("column", "n_rows")
    val s = Similarity.scoringShapeChoice(stats, "vec_id", 64, 5)
    assert(s == Similarity.scoringShapeChoice(200000L, 64, 5))
    val dup = Seq(("vec_id", 1L), ("vec_id", 2L)).toDF("column", "n_rows")
    intercept[IllegalArgumentException] {
      Similarity.scoringShapeChoice(dup, "vec_id", 64, 5)
    }
  }

  test("advisory only: knnGraph's grid switch remains caller-owned (no auto-switch parameter)") {
    // Compile-time pin: the public surface takes gridScore as an explicit
    // caller argument; there is no overload taking a ScoringShape. If a
    // future change wires the recommendation into the default, this spec
    // is the place that must consciously change.
    val m = Similarity.getClass.getMethods.filter(_.getName == "knnGraph")
    assert(m.nonEmpty)
    assert(!m.exists(_.getParameterTypes.exists(_ == classOf[Similarity.ScoringShape])),
      "knnGraph must not take a ScoringShape — the default does not auto-switch")
  }
}
