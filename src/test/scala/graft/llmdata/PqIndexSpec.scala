package graft.llmdata

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Stored-PQ-index round trips: serving from disk must equal the in-plan
  * operator row-for-row (doubles round-trip parquet bit-exactly), and an
  * index grown by appends against frozen codebooks must equal the
  * in-plan frozen-training variant — the build/append lifecycle the IVF
  * family pins via e_ivf_index/e_ivf_incr, on the memory axis. */
class PqIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("index-served top-k equals the in-plan operator; append-grown equals frozen in-plan") {
    graft.functions.VectorExprs.register(spark)
    import org.apache.spark.sql.functions.{broadcast, col, expr}
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    val dirA = graft.core.RunScratch.dir("pq_index_spec", sfDir)
    Similarity.buildPqIndex(emb, dirA)
    assert(rows(Similarity.pqTopKFromIndex(spark, dirA, emb)) ==
      rows(Similarity.pqTopK(emb)))

    val dirB = graft.core.RunScratch.dir("pq_incr_spec", sfDir)
    val half = broadcast(emb.agg(expr("(max(vec_id) + 1) div 2").as("__h")))
    Similarity.buildPqIndex(
      emb.crossJoin(half).filter(col("vec_id") < col("__h")).drop("__h"), dirB)
    Similarity.appendToPqIndex(
      emb.crossJoin(half).filter(col("vec_id") >= col("__h")).drop("__h"), dirB)
    assert(rows(Similarity.pqTopKFromIndex(spark, dirB, emb)) ==
      rows(Similarity.pqTopK(emb, halfTrain = true)))
  }
}
