package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan probe: prints `explain("formatted")` for named registry
  * queries at the given SF dir — the "is this the plan I'd want at 100×"
  * check (exchange count, ReusedExchange, PushedFilters, WholeStageCodegen
  * spans) without timing anything. Usage:
  *   runMain graft.tools.PlanProbe <sfDir> <query> [query ...]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanProbe <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.GraftSession.applyDefaults(spark)
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"\n========== $name ==========")
      graft.core.CacheScope.scoped {
        graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
