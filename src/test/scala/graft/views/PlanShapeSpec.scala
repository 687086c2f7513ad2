package graft.views

import graft.TestSpark
import graft.registry.{PipelineA, PipelineB}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-SHAPE regressions for the two reference pipelines: the oracle gate
  * proves values, these prove the physical strategy — the part that decides
  * whether the same query survives a 100× scale-up. A refactor that
  * silently turns the dim joins into sort-merge shuffles or reintroduces a
  * fact-row window would still hash-match; it fails here instead.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("a_flagship joins its dims as BroadcastHashJoin, never a shuffle or cartesian") {
    // The reference broadcast-hints the cupom side explicitly
    // (etl_job.py:36); the plan must carry that through — at 100 TB the
    // cupom/autorizador/produto sides are bounded dims, the alternative
    // sort-merge would shuffle the whole fact feed.
    val plan = PipelineA.flagshipDf(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"flagship lost its broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"flagship dims fell back to sort-merge:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"flagship plan contains a product join:\n$plan")
  }

  test("a_cupom top-1-per-etiqueta plans a PARTIAL WindowGroupLimit before the shuffle") {
    // Dedup.top1PerKey keeps the rank filter directly on the raw
    // row_number output precisely so InferWindowGroupLimit (Spark 3.5+)
    // can plant a map-side group limit: each task forwards ONE row per
    // etiqueta it sees instead of the full POS feed — on the 100 TB feed
    // that is the difference between shuffling ~|keys| rows and shuffling
    // the corpus. A refactor that projects/casts between filter and window
    // would silently lose this; it fails here instead.
    val plan = graft.registry.PipelineA.queries("a_cupom")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val wgl = plan.linesIterator.filter(_.contains("WindowGroupLimit")).toSeq
    assert(wgl.exists(_.contains("Partial")),
      s"cupom dedup lost its map-side group limit:\n$plan")
  }

  test("b_ressarcimento plans no window over the fact rows (W2 agg+broadcast rewrite)") {
    // The reference computes per-parent loss totals as
    // `sum(perdas) OVER (PARTITION BY cnpj_forn_pai)` — a window that
    // shuffles every fact row to its parent's partition and serializes a
    // mega-parent onto one task. The rewrite computes the totals as an
    // aggregate joined back broadcast; value-identical (oracle-checked),
    // but the plan must prove the window is really gone. Windows on the
    // ~100-row supplier dim (the D2 dedup) are fine — the assertion is
    // specifically about the fact-side partition key.
    val optimized = PipelineB.ressarcimentoDf(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(!optimized.contains("windowspecdefinition(cnpj_forn_pai"),
      s"per-parent totals regressed to a fact-row window:\n$optimized")
  }

  test("w_rolling serves frame sum, count, and lag from ONE exchange and ONE sort") {
    // rollingStats's contract: all three window signals share the
    // (user_id, ts, event_id) ordering, so adding signals costs
    // projections, not shuffles. A refactor that gives the lag a
    // different orderBy (or partitioning) would silently double the
    // exchange; it fails here instead.
    val plan = graft.streaming.EventStream.rollingStats(
        graft.sources.Tables.events(spark, sfDir))
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.trim.startsWith("+- Exchange"))
    val sorts = plan.linesIterator.count(l => l.contains("Sort ["))
    assert(exchanges == 1, s"rolling stats should shuffle once, saw $exchanges:\n$plan")
    assert(sorts == 1, s"rolling stats should sort once, saw $sorts:\n$plan")
  }

  test("j_band plans as an equi-join on the bucket, never a product join") {
    // bandJoin exists precisely because Spark plans the bare |Δ| <= eps
    // predicate as BNLJ/cartesian; the bucketized form must stay an
    // equi-join (hash or sort-merge, AQE's choice).
    val plan = graft.registry.InfraOps.bandJoinRoundTrip(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"band join fell back to a product join:\n$plan")
  }
}
