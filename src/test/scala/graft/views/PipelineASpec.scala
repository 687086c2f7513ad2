package graft.views

import graft.{SparkEntry, TestSpark}
import graft.registry.PipelineA
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end smoke of the flagship join (the driver's `entry` contract) —
  * the oracle hash-check covers values; this pins shape and non-emptiness
  * at a second scale factor so a hardcoded path or empty-join regression
  * fails fast. */
class PipelineASpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flagship: 15-column schema, >0 rows, one row per etiqueta") {
    val df = PipelineA.flagshipDf(spark, "/root/testdata/sf0.001").cache()
    assert(df.columns.length == 15)
    assert(df.columns.contains("etiqueta") && df.columns.contains("dt_venda"))
    val n = df.count()
    assert(n > 0)
    assert(df.select("etiqueta").distinct().count() == n, "etiqueta must be unique after top-1 dedup")
    df.unpersist()
  }

  test("entry() runs the real flagship (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("typed flagship Dataset agrees with the DataFrame form") {
    val dir = "/root/testdata/sf0.001"
    val df = PipelineA.flagshipDf(spark, dir)
    val ds = SuperDesconto.flagshipTyped(
      PipelineA.cupomDf(spark, dir),
      PipelineA.autorizadorDf(spark, dir),
      PipelineA.produtoDf(spark, dir))
    assert(ds.count() == df.count())
    // typed access compiles and round-trips values
    val typedSum = ds.collect().map(_.venda).sum
    val dfSum = df.agg(org.apache.spark.sql.functions.sum("venda"))
      .head().getDouble(0)
    assert(math.abs(typedSum - dfSum) < 1e-6)
    assert(ds.collect().forall(_.etiqueta.length == 30)) // C3 lpad-30 invariant
  }
}
