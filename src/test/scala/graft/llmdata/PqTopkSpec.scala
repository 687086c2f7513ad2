package graft.llmdata

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior pins for [[Similarity.pqTopK]] (product-quantization ANN):
  * exact-twin retrieval through the code path, dense rank output, recall
  * against the brute-force oracle on a pseudo-random corpus, and the
  * candidate-tie property that ADC scores are a pure function of the code
  * pair. */
class PqTopkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic pseudo-random positive-orthant vectors (same shape as
    * SimilarityKnobsSpec.vecs). */
  private def vecs(n: Int, dims: Int) =
    spark.range(n).select(col("id").as("vec_id"),
      expr(s"transform(sequence(1, $dims), j -> CAST(abs(hash(vec_id * $dims + j)) % 997 AS DOUBLE) / 997.0)")
        .as("embedding"))

  test("pqTopK finds each query's exact twin at rank 1") {
    // Queries 0..7 = orthogonal basis-ish vectors; ids 100..107 duplicate
    // them exactly. A twin shares both sub-codes with its query, so it
    // must survive ADC candidacy and win the exact re-rank at cosine 1.
    val rows = (0 until 8).flatMap { i =>
      val v = Array.tabulate(64)(d => if (d == i * 7) 1.0 else 0.01 * ((d + i) % 5))
      Seq((i.toLong, v.toSeq), (100L + i, v.toSeq))
    }
    val in = rows.toDF("vec_id", "embedding")
    val top1 = Similarity.pqTopK(in, nQueries = 8, k = 3)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top1 == (0 until 8).map(i => i.toLong -> (100L + i)).toMap)
  }

  test("pqTopK emits dense ranks 1..k per query, never the query itself") {
    val out = Similarity.pqTopK(vecs(200, 64)).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 10L), s"ranks for $q")
      assert(!rows.exists(_.getLong(2) == q), s"query $q returned itself")
    }
  }

  test("pqTopK recall@10 against brute force clears the ANN floor") {
    val in = vecs(200, 64)
    val exact = Similarity.bruteForceTopK(in).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.pqTopK(in).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 2×8-code PQ on positive-orthant noise is the method's hardest
    // regime (all cosines ~0.75, codes coarse); the floor pins "the
    // candidate funnel works at all" without overclaiming precision —
    // the fixture measures 0.55 (printed below), so 0.4 leaves refactor
    // headroom while still failing a broken ADC join outright.
    info(s"recall@10 = $recall")
    assert(recall >= 0.4, s"recall@10 = $recall")
  }

  test("pqTopK candidate scores are a pure function of the code pair (overfetch widens recall)") {
    // More overfetch can only improve (or keep) agreement with brute
    // force: the candidate stage is a prefix of the same deterministic
    // ADC ordering either way.
    val in = vecs(120, 64)
    val exact = Similarity.bruteForceTopK(in).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def rec(of: Int) = {
      val a = Similarity.pqTopK(in, overfetch = of).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      (exact & a).size
    }
    assert(rec(6) >= rec(2))
  }
}
