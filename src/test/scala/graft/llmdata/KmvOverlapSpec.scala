package graft.llmdata

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Accuracy contract of [[CorpusOps.kmvSourceOverlap]] against the exact
  * matrix ([[CorpusOps.sourceOverlap]]) on the same corpus and shingle
  * size. Two regimes:
  *  - sketch ≥ union: every number is EXACT (the sketch IS the set — the
  *    same below-k anchor as the ANALYZE NDV estimator);
  *  - truncating sketch (the registered c_overlap_kmv regime, kmvK=256
  *    against ~1.1-1.5k distinct shingles per source): union NDV error
  *    concentrates at the theoretical ~1/√(k−1) ≈ 6%, per-pair
  *    intersection error is Poisson-limited by n_both ≈ jaccard·k, and
  *    the corpus-level totals stay unbiased. Bars pinned from measurement
  *    (mean union err 0.062, total-intersection ratio 1.062, mean |Δjacc|
  *    0.0074 at sf0.01), with headroom for fixture drift.
  */
class KmvOverlapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"
  private val K = graft.registry.Corpus.OverlapK

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private def exactByPair: Map[(String, String), (Long, Long)] =
    CorpusOps.sourceOverlap(docs, K)
      .select("src_a", "src_b", "shared", "n_a", "n_b").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3) + r.getLong(4) - r.getLong(2))))
      .toMap

  test("sketch covering the whole union reproduces the exact matrix") {
    val exact = exactByPair
    val est = CorpusOps.kmvSourceOverlap(docs, K, kmvK = 8192).collect()
    assert(est.length == exact.size)
    est.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (shared, union) = exact(key)
      assert(r.getLong(2) == shared, s"$key n_both")          // n_both exact
      assert(r.getLong(3) == union, s"$key k_union")          // union exact
      assert(r.getDouble(5) == union.toDouble, s"$key union_est")
      assert(r.getDouble(6) == shared.toDouble, s"$key inter_est")
    }
  }

  test("truncating sketch (registered kmvK=256) meets the measured error bars") {
    val exact = exactByPair
    val est = CorpusOps.kmvSourceOverlap(docs, K,
      kmvK = graft.registry.Corpus.OverlapKmvK).collect()
    assert(est.length == exact.size)
    val rows = est.map { r =>
      val (shared, union) = exact((r.getString(0), r.getString(1)))
      val unionErr = math.abs(r.getDouble(5) - union) / union
      val jaccErr = math.abs(r.getLong(4) / 1e6 - shared.toDouble / union)
      (unionErr, jaccErr, r.getDouble(6), shared)
    }
    val meanUnionErr = rows.map(_._1).sum / rows.length
    val meanJaccErr = rows.map(_._2).sum / rows.length
    val totalRatio = rows.map(_._3).sum / rows.map(_._4).sum
    info(f"mean union err $meanUnionErr%.4f, mean |dJacc| $meanJaccErr%.5f, total-inter ratio $totalRatio%.4f")
    assert(meanUnionErr <= 0.10, f"union NDV err $meanUnionErr%.4f above 1/sqrt(k-1) regime")
    assert(meanJaccErr <= 0.015, f"jaccard err $meanJaccErr%.5f")
    assert(totalRatio >= 0.80 && totalRatio <= 1.25,
      f"corpus-level intersection mass drifted: ratio $totalRatio%.4f")
  }

  test("sketches absorb duplicate rows: a doubled corpus changes nothing") {
    // KMV is a pure set function — feeding every document twice must
    // produce the identical output (what makes map-side partials and
    // merge-order freedom safe).
    val doubled = docs.union(docs)
    val a = CorpusOps.kmvSourceOverlap(docs, K, kmvK = 64)
      .orderBy("src_a", "src_b").collect().toSeq
    val b = CorpusOps.kmvSourceOverlap(doubled, K, kmvK = 64)
      .orderBy("src_a", "src_b").collect().toSeq
    assert(a == b)
  }
}
