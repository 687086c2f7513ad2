package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Contracts of the round-10 stats additions:
  *  - the kmvMix short-string spread makes ANALYZE's NDV estimates land
  *    inside KMV's ~1/√(k−1) theory band (they were 395-1290× off on
  *    numeric-string columns before the mix — the estimator's uniformity
  *    assumption broken by the poly hash's tiny range on short inputs);
  *  - heavyKeys = exactly the keys above the 1/k frequency gate;
  *  - joinSizeEstimate's sketch-corrected estimate lands within a few
  *    percent of the exact join size on a two-sided-skew join where the
  *    classic uniform estimate is ~70× low.
  */
class JoinEstSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("post-mix ANALYZE NDV estimates sit inside the KMV error band on short-string columns") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val stats = TableStats.analyze(li, Seq("l_orderkey", "l_quantity", "l_returnflag"))
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    val truth = li.agg(
      countDistinct("l_orderkey"), countDistinct("l_quantity"), countDistinct("l_returnflag"))
      .collect()(0)
    val cases = Seq(
      ("l_orderkey", truth.getLong(0)), ("l_quantity", truth.getLong(1)),
      ("l_returnflag", truth.getLong(2)))
    cases.foreach { case (c, t) =>
      val est = stats(c)
      val relErr = math.abs(est - t) / t
      info(f"$c: true $t est $est%.1f relErr $relErr%.3f")
      // kmvK=32 → theoretical ~18% std; 0.5 leaves room for unlucky draws
      // while still catching the pre-mix 395×/1290× failures outright.
      assert(relErr <= 0.5, f"$c NDV est $est%.1f vs true $t — mix regressed")
    }
  }

  test("heavyKeys returns exactly the keys above the 1/k gate, with exact counts") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("CASE WHEN l_orderkey % 10 < 9 THEN 1L ELSE 1L + l_suppkey % 99 END AS k")
    val got = TableStats.heavyKeys(li, "k", 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = li.count()
    val want = li.groupBy("k").agg(count(lit(1)).as("c")).collect()
      .filter(r => r.getLong(1) * 64 > n)
      .map(r => r.getLong(0).toString -> r.getLong(1)).toMap
    assert(got == want)
    assert(want.contains("1"), "fixture lost its heavy key")
  }

  test("sketch-corrected join estimate beats the uniform estimate by orders of magnitude under two-sided skew") {
    val a = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("CASE WHEN l_orderkey % 10 < 9 THEN 1L ELSE 1L + l_suppkey % 99 END AS k")
    val b = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CASE WHEN o_orderkey % 5 < 4 THEN 1L ELSE 1L + o_custkey % 49 END AS k")
    val est = TableStats.joinSizeEstimate(
      TableStats.analyze(a, Seq("k")), TableStats.heavyKeys(a, "k"),
      TableStats.analyze(b, Seq("k")), TableStats.heavyKeys(b, "k"), "k", "k")
      .collect()(0)
    val exact = a.groupBy("k").agg(count(lit(1)).as("fa"))
      .join(b.groupBy("k").agg(count(lit(1)).as("fb")), "k")
      .agg(sum(col("fa") * col("fb"))).collect()(0).getLong(0)
    val estRows = est.getDouble(0)
    val estUniform = est.getDouble(1)
    info(f"exact $exact, sketch-corrected $estRows%.0f (x${estRows / exact}%.3f), uniform $estUniform%.0f (x${estUniform / exact}%.5f)")
    assert(math.abs(estRows - exact) / exact <= 0.10,
      f"sketch-corrected estimate off by ${math.abs(estRows - exact) / exact}%.3f")
    assert(estUniform < exact / 10.0,
      "fixture no longer demonstrates the uniform-assumption failure")
  }
}
