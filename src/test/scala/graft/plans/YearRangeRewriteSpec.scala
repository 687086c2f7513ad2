package graft.plans

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The rewrite must be invisible in results (NULL rows included) and
  * visible in plans: the filter reaches the parquet scan as a RANGE on the
  * raw column, which a `year(...)` predicate never can. */
class YearRangeRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // TestSpark goes through GraftSession.applyDefaults, which pre-installs
  // the rule — so the baseline helper must REMOVE it (and restore after),
  // or every "without" comparison would silently run with the rule too.
  private def withRule[T](body: => T): T = {
    val had = spark.experimental.extraOptimizations.contains(YearRangeRewrite)
    if (!had) spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ YearRangeRewrite
    try body
    finally if (!had) spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == YearRangeRewrite)
  }

  private def withoutRule[T](body: => T): T = {
    val had = spark.experimental.extraOptimizations.contains(YearRangeRewrite)
    if (had) spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == YearRangeRewrite)
    try body
    finally if (had) spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ YearRangeRewrite
  }

  private def orders: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("year(timestamp) = y rewrites to a pushed range and keeps identical rows") {
    // def, not val: QueryExecution memoizes per Dataset, so the baseline
    // and the with-rule run must each plan a FRESH frame
    def q = orders.filter(expr("year(o_orderdate) = 1997")).select("o_orderkey")
    val without = withoutRule {
      // prove the baseline really is rule-free: year() must survive
      assert(q.queryExecution.optimizedPlan.toString.contains("year("))
      q.collect().map(_.getLong(0)).sorted.toSeq
    }
    withRule {
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("year("), s"year() survived the rewrite:\n$optimized")
      val physical = q.queryExecution.executedPlan.toString
      assert(physical.contains("GreaterThanOrEqual(o_orderdate")
        && physical.contains("LessThan(o_orderdate"),
        s"range not pushed to the scan:\n$physical")
      // ...and specifically inside the scan's PushedFilters list (the
      // catalog-filter rendering only appears there on a V1 parquet scan),
      // so parquet row-group min/max skipping actually applies.
      val pushed = physical.linesIterator.find(_.contains("PushedFilters: ["))
      assert(pushed.exists(l => l.contains("GreaterThanOrEqual(o_orderdate")),
        s"derived range missing from PushedFilters:\n$physical")
      assert(q.collect().map(_.getLong(0)).sorted.toSeq == without)
    }
  }

  test("literal-first order and DATE / TIMESTAMP_NTZ columns rewrite too") {
    withRule {
      val df = Seq("1996-02-29", "1997-06-01", "1998-01-01")
        .toDF("s")
        .select(
          col("s").cast("date").as("d"),
          col("s").cast("timestamp_ntz").as("tn"))
      def plan(c: String, pred: String) = {
        val q = df.filter(expr(pred))
        assert(!q.queryExecution.optimizedPlan.toString.contains("year("),
          s"$pred not rewritten")
        q.collect().length
      }
      assert(plan("d", "1997 = year(d)") == 1)
      assert(plan("tn", "year(tn) = 1997") == 1)
      // leap-day boundary stays in its own year
      assert(df.filter(expr("year(d) = 1996")).collect().length == 1)
    }
  }

  test("NULL dates are filtered identically with and without the rule") {
    val df = Seq(Some("1997-03-01"), None, Some("1998-03-01"))
      .toDF("s").select(col("s").cast("date").as("d"))
    val without = withoutRule(df.filter(expr("year(d) = 1997")).count())
    val withR = withRule(df.filter(expr("year(d) = 1997")).count())
    assert(without == 1L && withR == 1L)
  }

  test("a year at the DATE type's edge falls back to no rewrite, not a wrong bound") {
    // Apply the rule directly to the analyzed plan (the optimizer would
    // constant-fold this LocalRelation before we could look): 5881580 is
    // within LocalDate's range but its successor year's epoch day
    // overflows Int — exact arithmetic throws, caught as no-rewrite, so
    // the predicate must survive UNCHANGED rather than compare against a
    // wrapped garbage bound.
    val df = Seq("1997-06-01").toDF("s").select(col("s").cast("date").as("d"))
    val analyzed = df.filter(expr("year(d) = 5881580")).queryExecution.analyzed
    val after = YearRangeRewrite(analyzed)
    assert(after.toString.contains("year("), s"edge year was rewritten:\n$after")
    // and a representative in-range year on the same plan DOES rewrite
    val ok = YearRangeRewrite(df.filter(expr("year(d) = 1997")).queryExecution.analyzed)
    assert(!ok.toString.contains("year("))
  }

  test("inequalities and IN-lists rewrite with boundary-exact semantics") {
    withRule {
      val df = Seq("1996-12-31", "1997-01-01", "1997-12-31", "1998-01-01")
        .toDF("s").select(col("s").cast("date").as("d"))
      def n(pred: String): (Long, Boolean) = {
        val q = df.filter(expr(pred))
        (q.count(), !q.queryExecution.optimizedPlan.toString.contains("year("))
      }
      assert(n("year(d) >= 1997") == (3L, true))
      assert(n("year(d) > 1997") == (1L, true))
      assert(n("year(d) <= 1997") == (3L, true))
      assert(n("year(d) < 1997") == (1L, true))
      assert(n("1997 <= year(d)") == (3L, true))
      assert(n("1997 > year(d)") == (1L, true))
      assert(n("year(d) IN (1996, 1998)") == (2L, true))
      // NOT over a rewritten shape keeps identical semantics
      assert(n("NOT (year(d) = 1997)") == (2L, true))
    }
  }

  test("non-rewritable shapes are left alone") {
    withRule {
      val df = Seq("1997-06-01").toDF("s").select(col("s").cast("date").as("d"))
      // year-on-both-sides comparisons keep their semantics
      assert(df.filter(expr("year(d) = year(d)")).count() == 1)
      // IN with a NULL element is skipped (semantics differ under NOT)
      val q = df.filter(expr("year(d) IN (1997, CAST(NULL AS INT))"))
      assert(q.count() == 1)
    }
  }
}
