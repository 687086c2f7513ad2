package graft.core

import graft.TestSpark
import graft.sources.TableStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer loop CLOSED: stats → joinStrategyChoice decision →
  * JoinPlanner.autoJoin physical shape. Pins, per engineered scenario:
  *  - the DECISION (broadcast / shuffle_smj / salted_smj) and its salt
  *    factor — the values the s_plan_choice oracle row hash-checks;
  *  - the PLAN the decision buys (BroadcastHashJoin vs SortMergeJoin vs
  *    the salt column in the join keys);
  *  - result equality with a plain reference join on every path — the
  *    strategy may change the shuffle shape, never a row.
  */
class AutoJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  private def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
  private def ord = spark.read.parquet(s"$sfDir/orders.parquet")

  private def statsOf(df: DataFrame) =
    (TableStats.analyze(df, Seq("k")), TableStats.heavyKeys(df, "k"))

  private def choice(a: DataFrame, b: DataFrame, bl: Long, budget: Long) = {
    val (sa, ha) = statsOf(a); val (sb, hb) = statsOf(b)
    TableStats.joinStrategyChoice(sa, ha, sb, hb, "k", "k", bl, budget)
      .select("decision", "build_side", "salt_factor").collect()(0)
  }

  private def auto(a: DataFrame, b: DataFrame, bl: Long, budget: Long,
                   saltOn: Seq[String] = Nil) = {
    val (sa, ha) = statsOf(a); val (sb, hb) = statsOf(b)
    JoinPlanner.autoJoin(a, b, "k", sa, ha, sb, hb, bl, budget, saltOn = saltOn)
  }

  // Deterministic row sets for equality checks: aggregate the join output
  // (integer-valued sums stay exact whatever the execution order).
  private def agg(j: DataFrame) =
    j.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("broadcast-sized dim: decision broadcast, plan BroadcastHashJoin, rows identical") {
    val a = li.selectExpr("CAST(l_partkey AS BIGINT) AS k", "CAST(l_linenumber AS BIGINT) AS v")
    val b = spark.read.parquet(s"$sfDir/part.parquet")
      .selectExpr("CAST(p_partkey AS BIGINT) AS k", "CAST(p_size AS BIGINT) AS v2")
    val d = choice(a, b, bl = 30000L, budget = 1000000L)
    assert(d.getString(0) == "broadcast")
    assert(d.getString(1) == "b", "smaller side is b; ties prefer right-build")
    assert(d.getLong(2) == 1L)
    val j = auto(a, b, 30000L, 1000000L)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected BHJ, got:\n$plan")
    assert(agg(j.withColumn("v", col("v"))) == agg(a.join(b, Seq("k"))))
  }

  test("uniform big-big: decision shuffle_smj, plan SortMergeJoin without salt") {
    val a = li.selectExpr("CAST(l_orderkey AS BIGINT) AS k", "CAST(l_linenumber AS BIGINT) AS v")
    val b = ord.selectExpr("CAST(o_orderkey AS BIGINT) AS k", "CAST(o_custkey AS BIGINT) AS v2")
    val d = choice(a, b, bl = 10000L, budget = 1000000L)
    assert(d.getString(0) == "shuffle_smj")
    assert(d.getString(1) == "none")
    assert(d.getLong(2) == 1L)
    val j = auto(a, b, 10000L, 1000000L)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
    assert(!plan.contains("__graft_salt"), "no salt on the uniform path")
    assert(agg(j) == agg(a.join(b, Seq("k"))))
  }

  test("two-sided skew: decision salted_smj with computed factor, salt in the join keys, rows identical") {
    val a = li.selectExpr(
      "CASE WHEN l_orderkey % 10 < 9 THEN 1L ELSE 1L + l_suppkey % 99 END AS k",
      "CAST(l_linenumber AS BIGINT) AS v", "l_orderkey")
    val b = ord.selectExpr(
      "CASE WHEN o_orderkey % 5 < 4 THEN 1L ELSE 1L + o_custkey % 49 END AS k",
      "CAST(o_custkey AS BIGINT) AS v2")
    val d = choice(a.select("k", "v"), b, bl = 100L, budget = 1000000L)
    assert(d.getString(0) == "salted_smj")
    // fa(1)·fb(1) ≈ 0.9·60k × 0.8·15k ≈ 6.5e8 → ceil(/1e6) ≈ 650 → capped.
    assert(d.getLong(2) == 64L, s"expected the 64 cap, got ${d.getLong(2)}")
    val j = auto(a, b, 100L, 1000000L, saltOn = Seq("l_orderkey", "v"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_salt"), s"expected salted keys, got:\n$plan")
    assert(agg(j.select("k", "v", "v2")) == agg(a.join(b, Seq("k")).select("k", "v", "v2")))
  }

  test("salted path with the SMALLER frame first re-projects to (a ++ b) column order") {
    // Same skew scenario, sides swapped: stats say n_a < n_b, so autoJoin
    // salts b and replicates a — but the output schema must still be
    // a-then-b.
    val a = ord.selectExpr(
      "CASE WHEN o_orderkey % 5 < 4 THEN 1L ELSE 1L + o_custkey % 49 END AS k",
      "CAST(o_custkey AS BIGINT) AS v2")
    val b = li.selectExpr(
      "CASE WHEN l_orderkey % 10 < 9 THEN 1L ELSE 1L + l_suppkey % 99 END AS k",
      "CAST(l_linenumber AS BIGINT) AS v", "l_orderkey")
    val j = auto(a, b, 100L, 1000000L, saltOn = Seq("l_orderkey", "v"))
    assert(j.columns.toSeq == Seq("k", "v2", "v", "l_orderkey"))
    assert(agg(j.select("k", "v", "v2")) == agg(a.join(b, Seq("k")).select("k", "v", "v2")))
  }

  test("saltOn naming only one side's columns survives the stats flipping which side is big") {
    // The planner, not the caller, decides which side gets salted — so a
    // salt basis naming columns of only one side must not throw (or
    // silently hash a same-named different column) when the decision
    // lands on the other side: it filters to the chosen big side's
    // columns and falls back to whole-row hashing when none remain.
    val big = li.selectExpr(
      "CASE WHEN l_orderkey % 10 < 9 THEN 1L ELSE 1L + l_suppkey % 99 END AS k",
      "CAST(l_linenumber AS BIGINT) AS v", "l_orderkey")
    val small = ord.selectExpr(
      "CASE WHEN o_orderkey % 5 < 4 THEN 1L ELSE 1L + o_custkey % 49 END AS k",
      "CAST(o_custkey AS BIGINT) AS v2")
    // saltOn names big-side columns; big passed SECOND, so the stats pick
    // the FIRST argument's opposite — the basis still applies (filtered
    // to b's columns) and the join runs salted.
    val j1 = auto(small, big, 100L, 1000000L, saltOn = Seq("l_orderkey", "v"))
    assert(j1.queryExecution.executedPlan.toString.contains("__graft_salt"))
    assert(agg(j1.select("k", "v", "v2")) == agg(small.join(big, Seq("k")).select("k", "v", "v2")))
    // saltOn names SMALL-side columns while the stats salt big: before the
    // per-side filter this threw AnalysisException (v2 absent on big);
    // now it falls back to whole-row hashing on the salted side.
    val j2 = auto(big, small, 100L, 1000000L, saltOn = Seq("v2"))
    assert(j2.queryExecution.executedPlan.toString.contains("__graft_salt"))
    assert(agg(j2.select("k", "v", "v2")) == agg(big.join(small, Seq("k")).select("k", "v", "v2")))
  }

  test("empty heavy frames: max_key_est falls back to the residual-uniform per-key product") {
    val a = li.selectExpr("CAST(l_orderkey AS BIGINT) AS k")
    val b = ord.selectExpr("CAST(o_orderkey AS BIGINT) AS k")
    val (sa, ha) = statsOf(a); val (sb, hb) = statsOf(b)
    assert(ha.count() == 0 && hb.count() == 0, "near-unique keys must have no heavy hitters")
    val r = TableStats.joinStrategyChoice(sa, ha, sb, hb, "k", "k", 10L, 1000000L)
      .select("max_key_est").collect()(0).getDouble(0)
    assert(r > 0.0, "defined maximum even with empty heavy frames")
    assert(r < 100.0, s"per-key estimate should be ~lines-per-order, got $r")
  }
}
