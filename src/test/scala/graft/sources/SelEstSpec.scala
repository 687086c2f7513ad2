package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Contracts of range-predicate selectivity estimation from stored stats
  * ([[TableStats.selectivityEstimate]] — the optimizer-loop half beside
  * joinSizeEstimate):
  *  - on a two-regime skewed column the histogram-interpolated estimate
  *    lands within the partial-edge-bucket error bound while the
  *    min/max-only uniform estimate is orders of magnitude low;
  *  - fully-covered query ranges are estimated EXACTLY (covered buckets
  *    contribute their whole depth, no interpolation error);
  *  - the stored-stats fail-fast contract (unknown column, duplicate
  *    stats rows) refuses instead of estimating from garbage.
  */
class SelEstSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  /** The registered s_sel_est fixture: 90% of rows in [0, 999], 10%
    * spread over [1e6, 2e6) — min/max span ~2e6 but the hot mass sits in
    * a 1000-value sliver. */
  private def twoRegime = spark.read.parquet(s"$sfDir/lineitem.parquet")
    .selectExpr("CASE WHEN l_orderkey % 10 < 9 THEN l_partkey % 1000 " +
      "ELSE 1000000L + (l_partkey * 7919L) % 1000000L END AS v")

  test("histogram estimate within 10% on the hot range; uniform estimate >100x low") {
    val v = twoRegime
    val stats = TableStats.analyze(v, Seq("v"))
    val hist = TableStats.equiDepthHistogram(v, "v", nBuckets = 8)
    val row = TableStats.selectivityEstimate(stats, hist, "v", 200L, 799L)
      .collect()(0)
    val (est, uni) = (row.getLong(0), row.getLong(1))
    val exact = v.filter(col("v").between(200L, 799L)).count()
    info(s"exact $exact histogram-est $est uniform-est $uni")
    assert(exact > 0, "fixture lost its hot range")
    assert(math.abs(est - exact).toDouble / exact <= 0.10,
      s"histogram estimate $est vs exact $exact — interpolation error past the edge-bucket bound")
    assert(uni * 100 < exact,
      s"uniform estimate $uni not >100x low vs $exact — the skew fixture no longer demonstrates the failure mode")
  }

  test("a range covering every bucket is estimated exactly (sum of depths)") {
    val v = twoRegime
    val stats = TableStats.analyze(v, Seq("v"))
    val hist = TableStats.equiDepthHistogram(v, "v", nBuckets = 8)
    val row = TableStats.selectivityEstimate(stats, hist, "v", Long.MinValue / 4, Long.MaxValue / 4)
      .collect()(0)
    val n = v.count()
    assert(row.getLong(0) == n, s"full-range estimate ${row.getLong(0)} != N $n")
    assert(row.getLong(1) == n, s"full-range uniform ${row.getLong(1)} != N $n")
  }

  test("an empty query range estimates zero") {
    val v = twoRegime
    val stats = TableStats.analyze(v, Seq("v"))
    val hist = TableStats.equiDepthHistogram(v, "v", nBuckets = 8)
    val row = TableStats.selectivityEstimate(stats, hist, "v", 2500000L, 2600000L)
      .collect()(0)
    assert(row.getLong(0) == 0L && row.getLong(1) == 0L)
  }

  test("fail-fast: un-analyzed column and duplicate stats rows both refuse") {
    val v = twoRegime
    val stats = TableStats.analyze(v, Seq("v"))
    val hist = TableStats.equiDepthHistogram(v, "v", nBuckets = 8)
    val eMissing = intercept[IllegalArgumentException] {
      TableStats.selectivityEstimate(stats, hist, "nope", 0L, 10L)
    }
    assert(eMissing.getMessage.contains("analyze"))
    val eDup = intercept[IllegalArgumentException] {
      TableStats.selectivityEstimate(stats.union(stats), hist, "v", 0L, 10L)
    }
    assert(eDup.getMessage.contains("duplicate"))
  }
}
