package graft.views

import graft.TestSpark
import graft.registry.PipelineB
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the ressarcimento view (C13) that the hash oracle
  * can't express: credit conservation under pro-rating and the 3-branch
  * outer-assembly partition.
  */
class RessarcimentoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("pro-rata conserves credit: per parent CNPJ with losses, sum(ressarcimento) == group credit") {
    val rst = PipelineB.ressarcimentoDf(spark, sfDir).cache()
    val credito = PipelineB.creditoDf(spark, sfDir)
    val forn = PipelineB.fornecedoresDf(spark, sfDir)
    val creditByCnpj = credito.join(forn, "cod_forn")
      .groupBy("cnpj_forn_pai").agg(sum("credito").as("cg"))
    // branch 1 rows (losses AND credits) per cnpj: ressarcimento sums to cg
    val got = rst.filter(col("perdas") =!= 0.0 && col("ressarcimento") =!= 0.0)
      .groupBy("cnpj_forn_pai").agg(sum("ressarcimento").as("rs"))
      .join(creditByCnpj, "cnpj_forn_pai")
      .select(abs(col("rs") - col("cg")).as("diff"))
      .agg(max("diff")).head().getDouble(0)
    assert(got < 1e-6, s"conservation violated by $got")
    rst.unpersist()
  }

  test("3-branch assembly partitions the keys: no row has both zero perdas and zero ressarcimento unless source had them") {
    val rst = PipelineB.ressarcimentoDf(spark, sfDir)
    // every row belongs to exactly one branch shape:
    //   losses+credit (perdas>0 fill, ressarcimento computed),
    //   credit-only (perdas=0 null-filled, evento null),
    //   losses-only (ressarcimento=0 null-filled)
    val bad = rst.filter(col("evento").isNull && col("perdas") =!= 0.0).count()
    assert(bad == 0L, "credit-only branch must carry null losses payload")
  }
}
