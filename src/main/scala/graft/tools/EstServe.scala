package graft.tools

import org.apache.spark.sql.SparkSession

/** Serving-form estimator timing: proves with a NUMBER that the stats
  * estimators are metadata-cost when the stats are standing artifacts.
  *
  * The registered rows (`s_join_est`, `s_sel_est`, `s_plan_choice`)
  * rebuild both sides' stats in-row every run — ~5 bounded scans each —
  * because the oracle gate needs a self-contained query. In production
  * the analyze/heavyKeys/histogram frames are PERSISTED next to the
  * table (the stats-as-data policy), and the estimators only read those.
  * This tool times the two phases separately:
  *
  *   build  — analyze + heavyKeys on both skew sides, equi-depth
  *            histogram on the two-regime column, all written to
  *            parquet (paid once per ingest batch, amortized);
  *   serve  — joinSizeEstimate + joinStrategyChoice + selectivityEstimate
  *            reading ONLY the persisted frames (paid per planning
  *            decision).
  *
  * Serve latency must be flat across SF — the frames are 1-row/≤ k-row
  * whatever the table size — and that flatness is the SCALING.md claim
  * this tool backs. Usage:
  *   SPARK_GRAFT_SF_DIR=… sbt "runMain graft.tools.EstServe"
  */
object EstServe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.GraftSession.applyDefaults(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val ts = graft.sources.TableStats

    val out = graft.core.RunScratch.dir("graft_est_serve", sfDir)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- build phase: the s_join_est/s_sel_est fixtures' stats, persisted.
    val a = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("CASE WHEN l_orderkey % 10 < 9 THEN 1L ELSE 1L + l_suppkey % 99 END AS k")
    val b = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CASE WHEN o_orderkey % 5 < 4 THEN 1L ELSE 1L + o_custkey % 49 END AS k")
    val v = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("CASE WHEN l_orderkey % 10 < 9 THEN l_partkey % 1000 " +
        "ELSE 1000000L + (l_partkey * 7919L) % 1000000L END AS v")
    val (_, buildSec) = timed {
      ts.analyze(a, Seq("k")).write.mode("overwrite").parquet(s"$out/stats_a")
      ts.heavyKeys(a, "k").write.mode("overwrite").parquet(s"$out/heavy_a")
      ts.analyze(b, Seq("k")).write.mode("overwrite").parquet(s"$out/stats_b")
      ts.heavyKeys(b, "k").write.mode("overwrite").parquet(s"$out/heavy_b")
      ts.analyze(v, Seq("v")).write.mode("overwrite").parquet(s"$out/stats_v")
      ts.equiDepthHistogram(v, "v", 8).write.mode("overwrite").parquet(s"$out/hist_v")
    }

    // ---- serve phase: estimators over the persisted frames only.
    def serveOnce(): Unit = {
      val sa = spark.read.parquet(s"$out/stats_a"); val ha = spark.read.parquet(s"$out/heavy_a")
      val sb = spark.read.parquet(s"$out/stats_b"); val hb = spark.read.parquet(s"$out/heavy_b")
      val sv = spark.read.parquet(s"$out/stats_v"); val hv = spark.read.parquet(s"$out/hist_v")
      val je = ts.joinSizeEstimate(sa, ha, sb, hb, "k", "k").collect()
      val pc = ts.joinStrategyChoice(sa, ha, sb, hb, "k", "k", 100L, 1000000L).collect()
      val se = ts.selectivityEstimate(sv, hv, "v", 200L, 799L).collect()
      require(je.nonEmpty && pc.nonEmpty && se.nonEmpty)
    }
    val serveTimes = (1 to reps).map { _ => timed(serveOnce())._2 }

    println(f"""{"metric":"est_serve","sf_dir":"$sfDir","build_sec":$buildSec%.3f,""" +
      f""""serve_sec_min":${serveTimes.min}%.3f,""" +
      f""""serve_all":[${serveTimes.map(t => f"$t%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
