package graft

import org.scalatest.funsuite.AnyFunSuite

/** Harness-contract invariants: a queries entry without an oracle (or the
  * reverse) silently weakens the correctness gate, so key parity is pinned
  * here rather than trusted. */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every registered query has oracle SQL and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("registry names are unique across sub-registries (no silent override)") {
    val all = Seq(
      registry.PipelineA.queries, registry.PipelineB.queries,
      registry.LlmData.queries, registry.Corpus.queries, registry.InfraOps.queries)
    val names = all.flatMap(_.keys)
    assert(names.size == names.distinct.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct}")
    assert(names.toSet == SparkEntry.queries.keySet)
  }

  test("entry() answers the flagship with rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
