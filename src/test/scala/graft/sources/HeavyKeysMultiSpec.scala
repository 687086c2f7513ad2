package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** heavyKeysMulti's per-column slices ≡ heavyKeys, exactly — the contract
  * that let s_plan_choice batch its per-(table, key) sketch/verify scans
  * into one pass per table. Covered shapes: two-sided skew (the heavy set
  * the estimators actually consume), near-uniform (empty heavy set), and
  * a null-bearing column (the multi pass cannot pre-filter rows per
  * column, so MG's null-skip carries the isNotNull contract instead).
  */
class HeavyKeysMultiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("per-column slices equal heavyKeys exactly on skewed, uniform, and null-bearing columns") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet").selectExpr(
      "CASE WHEN l_orderkey % 10 < 9 THEN 1L ELSE 1L + l_suppkey % 99 END AS skew",
      "CAST(l_orderkey AS BIGINT) AS uni",
      "CASE WHEN l_orderkey % 3 = 0 THEN CAST(NULL AS BIGINT) ELSE l_suppkey % 5 END AS holes")
    val cols = Seq("skew", "uni", "holes")
    val multi = TableStats.heavyKeysMulti(df, cols)
    def rows(d: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
      d.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    var sawNonEmpty = false
    for (c <- cols) {
      val single = rows(TableStats.heavyKeys(df.select(col(c)), c))
      val slice = rows(multi.filter(col("column") === c).select("key", "n_occ"))
      assert(slice == single, s"column $c: multi slice diverges from heavyKeys")
      sawNonEmpty ||= single.nonEmpty
    }
    assert(sawNonEmpty, "fixture must exercise a non-empty heavy set")
    // And the near-unique column's heavy set is genuinely empty — the
    // equality above must not be vacuous on the uniform shape either.
    assert(rows(multi.filter(col("column") === "uni").select("key", "n_occ")).isEmpty)
  }

  test("null values are not occurrences: totals and gates use the non-null mass") {
    import spark.implicits._
    // 900 nulls + 100 of one value: heavy relative to the 100 non-null
    // occurrences (100·64 > 100) — a total that counted nulls (1000)
    // would still pass here, but the n_occ must be exactly 100 and the
    // single-column reference must agree.
    val df = (1 to 1000).map(i => if (i <= 900) None else Some(7L)).toDF("v")
    val multi = TableStats.heavyKeysMulti(df, Seq("v"))
    val got = multi.collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("7", 100L)))
    val single = TableStats.heavyKeys(df, "v")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(single == Set(("7", 100L)))
  }
}
