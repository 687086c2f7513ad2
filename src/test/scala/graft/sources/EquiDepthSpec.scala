package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Contract of [[TableStats.equiDepthHistogram]]: buckets partition the
  * value domain in order, counts are ~N/nBuckets on smooth data, and a
  * heavy value overfills exactly its own bucket (the skew visibility that
  * is the whole point of equi-depth over equi-width). */
class EquiDepthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("smooth high-NDV column: ordered non-overlapping buckets, ~N/k depth, nothing lost") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .selectExpr("cast(floor(l_extendedprice * 100) as bigint) as cents")
    val n = li.count()
    val h = TableStats.equiDepthHistogram(li, "cents", 8)
      .orderBy("bucket").collect()
    assert(h.map(_.getLong(0)).toSeq == (0L until 8L))
    assert(h.map(_.getLong(3)).sum == n)
    // buckets ordered and disjoint on the value axis
    h.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) < b.getLong(1), "bucket value ranges must be disjoint and ordered")
    case _ => ()
    }
    // near-unique values: every bucket within one value-group of N/8
    val target = n / 8.0
    h.foreach { r =>
      assert(math.abs(r.getLong(3) - target) <= target * 0.02,
        s"bucket ${r.getLong(0)} depth ${r.getLong(3)} vs target $target")
    }
  }

  test("a heavy value overfills its own bucket; later buckets stay ~N/k") {
    import spark.implicits._
    // 500 rows of value 7 (half the mass), then 500 distinct values.
    val df = ((1 to 500).map(_ => 7L) ++ (1000L until 1500L)).toDF("v")
    val h = TableStats.equiDepthHistogram(df, "v", 4).orderBy("bucket").collect()
    // rankBefore(7)=0 -> bucket 0 holds all 500 copies (plus the values
    // whose rankBefore still floors to 0 - none here since 500*4/1000 = 2).
    assert(h.head.getLong(0) == 0 && h.head.getLong(1) == 7 && h.head.getLong(2) == 7)
    assert(h.head.getLong(3) == 500)
    // the heavy value consumed buckets 0-1's quota: remaining mass lands
    // in buckets 2,3 at ~250 each
    assert(h.map(_.getLong(0)).toSeq == Seq(0L, 2L, 3L))
    assert(h.drop(1).map(_.getLong(3)).toSeq == Seq(250L, 250L))
    assert(h.map(_.getLong(3)).sum == 1000L)
  }

  test("constant column collapses to one full bucket") {
    import spark.implicits._
    val df = (1 to 100).map(_ => 42L).toDF("v")
    val h = TableStats.equiDepthHistogram(df, "v", 8).collect()
    assert(h.length == 1 && h.head.getLong(0) == 0 && h.head.getLong(3) == 100L)
  }

  test("NDV guard refuses near-unique columns with the typed refusal, and maxNdv=0 disables it") {
    import spark.implicits._
    val unique = (1L to 500L).toDF("v")
    val e = intercept[graft.core.ScaleGuardRefusal] {
      TableStats.equiDepthHistogram(unique, "v", 8, maxNdv = 100L).collect()
    }
    assert(e.getMessage.contains("sampledQuantiles"))
    // explicit opt-out still computes
    assert(TableStats.equiDepthHistogram(unique, "v", 8, maxNdv = 0L)
      .agg(org.apache.spark.sql.functions.sum("n_rows")).collect()(0).getLong(0) == 500L)
  }
}
