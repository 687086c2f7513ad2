package graft.tools

import graft.registry.PipelineB
import org.apache.spark.sql.SparkSession

/** Dev-only profiler: times each Pipeline B stage at the given SF dir. */
object ProfileB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("fornecedores") { PipelineB.fornecedoresDf(spark, sfDir).count() }
    time("coletas") { PipelineB.coletasDf(spark, sfDir).count() }
    time("credito") { PipelineB.creditoDf(spark, sfDir).count() }
    time("ressarcimento") { PipelineB.ressarcimentoDf(spark, sfDir).count() }
    time("ressarcimento2") { PipelineB.ressarcimentoDf(spark, sfDir).count() }
    spark.stop()
  }
}
