package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only decomposition of e_lsh_neardup's cost at a given SF dir:
  * band-duplicated candidate volume, deduped candidate volume, and the
  * full verified operator, each timed separately. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/tmp/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.GraftSession.applyDefaults(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    embs.limit(10).count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[lsh] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }

    // deduped candidates (the operator's candidate stage as-is)
    time("cand_distinct") {
      graft.llmdata.Similarity.lshPairCandidates(embs).count()
    }
    // full operator
    time("full_verify") {
      graft.llmdata.Similarity.lshNearDupPairs(embs).count()
    }
    time("full_verify_warm") {
      graft.llmdata.Similarity.lshNearDupPairs(embs).count()
    }
    // exact baseline for comparison (guard-size allowing)
    time("exact_baseline") {
      graft.llmdata.Similarity.cosineNearDupPairs(embs, maxRows = 200000).count()
    }
    spark.stop()
  }
}
