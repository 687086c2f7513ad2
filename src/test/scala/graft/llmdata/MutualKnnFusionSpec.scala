package graft.llmdata

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r15 optimization pin: [[graft.registry.LlmData.mutualVerifiedKnnEdges]]
  * now reuses the ranked graph's stored cosines (one semi-join over the
  * checkpointed 3-column graph) instead of the former
  * intersect + vector-re-attach + cosine-recompute chain. The rewrite is
  * only sound if the stored cos for a mutual edge is BIT-identical to the
  * recomputed canonical-order [[Similarity.sparkCosPre]] fold — this spec
  * pins end-to-end equality (ids AND raw cosine bits) of the fused form
  * against the explicit re-attach form on the fixture, so a future change
  * to either scoring path that breaks the bit-identity contract fails
  * here instead of as an oracle-row mystery diff. */
class MutualKnnFusionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** The pre-r15 chain, verbatim: knnGraph (cos dropped) → intersect
    * mutuality → re-attach vectors → recompute cosine → threshold. */
  private def explicitForm: Set[(Long, Long, Long)] = graft.core.CacheScope.scoped {
    val g = Similarity.knnGraph(embs, k = 5,
      nHint = graft.sources.ParquetMeta.footerRows(spark, s"$sfDir/embeddings.parquet"))
    val e = g.select(col("vec_id").as("id_a"), col("nn_id").as("id_b"))
    val n = Similarity.withNorm(embs)
    e.intersect(e.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .filter(col("id_a") < col("id_b"))
      .join(n.select(col("vec_id").as("id_a"), col("ed").as("__ea"), col("nrm").as("__na")), "id_a")
      .join(n.select(col("vec_id").as("id_b"), col("ed").as("__eb"), col("nrm").as("__nb")), "id_b")
      .withColumn("cos", expr(Similarity.sparkCosPre("__ea", "__eb", "__na", "__nb")))
      .filter(col("cos") >= 0.4)
      .select(col("id_a"), col("id_b"), expr("cast(cos as double)").as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)))).toSet
  }

  private def fusedForm: Set[(Long, Long, Long)] = graft.core.CacheScope.scoped {
    graft.registry.LlmData.mutualVerifiedKnnEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)))).toSet
  }

  test("fused mutual-verify ≡ explicit re-attach form, cosine bits included") {
    val f = fusedForm
    val e = explicitForm
    assert(f.nonEmpty, "fixture produced an empty mutual graph")
    assert(f == e, {
      val onlyF = f -- e
      val onlyE = e -- f
      s"fused and explicit forms diverge: fused-only=${onlyF.take(5)}, explicit-only=${onlyE.take(5)}"
    })
  }
}
