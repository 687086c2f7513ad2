package graft.registry

import graft.TestSpark
import graft.core.GraphMetrics
import org.scalatest.funsuite.AnyFunSuite

/** Keeps [[Corpus.KCoreTwinRounds]] an honestly DERIVED budget: the twins'
  * unroll must dominate the registered fixtures' measured peel depths with
  * real headroom, so a driver-regenerated fixture that peels deeper trips
  * THIS spec (naming the constant to raise) before the gate ever shows the
  * sentinel row — and if a fixture slips past both, the sentinel in
  * [[Corpus.kcorePeelSelect]] still makes the gate diff read 'raise
  * KCoreTwinRounds', never a silent truncation (the Spark loop separately
  * throws rather than truncate). */
class KcoreTwinBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("registered fixtures' measured peel depths stay within half the twin budget") {
    graft.core.CacheScope.scoped {
      val docDepth = GraphMetrics.kCorePeelDepth(
        graft.llmdata.DocDedup.minhashLshPairs(
          spark.read.parquet(s"$sfDir/documents.parquet")), k = 2)
      val knnDepth = GraphMetrics.kCorePeelDepth(
        LlmData.mutualVerifiedKnnEdges(spark, sfDir).select("id_a", "id_b"), k = 2)
      assert(docDepth <= Corpus.KCoreTwinRounds / 2,
        s"doc-graph peel depth $docDepth ate the x_kcore twin's headroom — " +
          s"raise Corpus.KCoreTwinRounds (currently ${Corpus.KCoreTwinRounds})")
      assert(knnDepth <= Corpus.KCoreTwinRounds / 2,
        s"knn-graph peel depth $knnDepth ate the x_knn_kcore twin's headroom — " +
          s"raise Corpus.KCoreTwinRounds (currently ${Corpus.KCoreTwinRounds})")
    }
  }

  test("the twin SQL's sentinel fires exactly when the unroll budget is exceeded") {
    // A 5-node path at k = 2 peels both end edges per round — 2 rounds to
    // empty. An unroll of 1 leaves it mid-flight (ke1 ≠ ke0), so the
    // sentinel row must appear; at 4 the peel is long converged and the
    // sentinel must not. Checked in DuckDB-compatible SQL semantics via
    // Spark SQL over a temp view (same COUNT/UNION ALL constructs) — at
    // SMALL unroll counts only: Spark INLINES multiply-referenced CTEs
    // (each round references the previous one 3×, so the replayed plan is
    // 3^rounds chain copies — the exact blow-up MATERIALIZED prevents in
    // DuckDB; rounds = 8 OOM'd the analyzer here, which is itself a nice
    // demonstration of why the real twins pin MATERIALIZED).
    import spark.implicits._
    (0L until 4L).map(i => (i, i + 1)).toDF("u", "v")
      .createOrReplaceTempView("kcore_budget_probe")
    def peeled(rounds: Int): Set[(Long, Long)] =
      spark.sql(
        s"""WITH ke0 AS (SELECT u, v FROM kcore_budget_probe),
           |${Corpus.kcorePeelCtes(2, rounds).replaceAll("AS MATERIALIZED", "AS")}
           |${Corpus.kcorePeelSelect("doc_id", rounds)}""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(peeled(1).contains((-1L, -1L)), "exceeded budget must emit the sentinel")
    val done = peeled(4)
    assert(done.isEmpty, s"a converged peel of a 5-node path at k=2 is empty, got $done")
  }
}
