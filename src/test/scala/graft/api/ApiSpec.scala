package graft.api

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The facade must stay a zero-logic delegation layer: each syntax call
  * returns the same result as the canonical package-object call. */
class ApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("corpus syntax delegates to the canonical operators") {
    import spark.implicits._
    assert(docs.dedupExact.count() == graft.llmdata.DocDedup.exact(docs).count())
    assert(docs.vocabulary().count() == graft.llmdata.TextAnalysis.vocabulary(docs).count())
    assert(docs.chunkTokens(16).count() == graft.llmdata.CorpusOps.chunk(docs, 16).count())
    val in = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(in.dedupExact.count() == 1)
  }

  test("core syntax: top1PerKey and float null-fill") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 2L, Some(1.0)), (1L, 3L, None), (2L, 1L, Some(5.0)))
      .toDF("k", "v", "x")
    val top = df.top1PerKey(Seq("k"), Seq(col("v").desc))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top == Map(1L -> 3L, 2L -> 1L))
    assert(df.fillFloatNulls.filter(col("x").isNull).count() == 0)
  }

  test("embedding syntax returns k rows per query") {
    val out = embs.cosineTopK(nQueries = 2, k = 3)
    assert(out.count() == 6)
  }
}
