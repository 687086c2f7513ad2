package graft.job

import graft.core.GraftSession
import graft.sink.ParquetSink
import graft.sources.EnvConfig
import java.time.LocalDate
import org.apache.spark.sql.SparkSession

/** Production entrypoint (EP3 parity with the reference's `__main__`,
  * `etl_job.py:116-130`): build the session, load `.env` config, run the
  * daily flagship merge, and — on days 1-5 — the per-year ressarcimento
  * refresh. Sinks are parquet-backed here; swap the [[graft.sink.Sink]]
  * binding for an Iceberg implementation on a real catalog.
  *
  * Required config keys: `bucket`, `cosmos_system`, `pre_venda_system`,
  * `autorizacao`, `produto` (pipeline A), the eleven Pipeline B source
  * paths (see [[graft.sources.ConfigSources.ressarcimento]]), and the two
  * sink paths `sink_flagship`, `sink_ressarcimento`.
  */
object Main {
  def main(args: Array[String]): Unit = {
    // An explicitly-passed config path must exist: a typo'd filename would
    // otherwise parse as an empty map and fail later with a misleading
    // "key not found" (or silently read a same-named process env var).
    val envFile = args.headOption.getOrElse(".env")
    val config = EnvConfig.load(envFile, requireFile = args.nonEmpty)
    val spark = GraftSession.applyDefaults(
      SparkSession.builder().appName("graft-etl").getOrCreate())
    try {
      // Deployment-local date, NOT UTC: the reference's datetime.now() is
      // local, and the day-1-to-5 gate plus the month-window math shift a
      // whole day otherwise (a 21:30 UTC-3 run on day 5 is day 6 in UTC —
      // the monthly refresh would silently skip). Spark SQL's session
      // timezone stays pinned to UTC separately (GraftSession).
      val today = LocalDate.now(java.time.ZoneId.systemDefault())
      val daily = Runner.runDaily(spark, config,
        new ParquetSink(spark, config("sink_flagship")), today)
      // K4 observability: row counts, the reference's only metric
      // (etl_job.py:70,103), without the driver collect.
      println(s"[graft] flagship merged rows: $daily")
      Runner.runRessarcimento(spark, config,
        new ParquetSink(spark, config("sink_ressarcimento")), today)
        .toSeq.sortBy(_._1)
        .foreach { case (year, n) => println(s"[graft] ressarcimento $year rows: $n") }
    } finally spark.stop()
  }
}
