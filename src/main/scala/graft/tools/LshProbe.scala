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

    // optional knob override: LshProbe <sfDir> <planes> <bandBits> — the
    // "r follows log N" recipe in action (see Similarity.LshDupPlanes)
    val planes = args.drop(1).headOption.map(_.toInt)
      .getOrElse(graft.llmdata.Similarity.LshDupPlanes)
    val bandBits = args.drop(2).headOption.map(_.toInt)
      .getOrElse(graft.llmdata.Similarity.LshDupBandBits)
    // deduped candidates (the operator's candidate stage at these knobs)
    time(s"cand_distinct_${planes}x$bandBits") {
      graft.llmdata.Similarity.lshPairCandidates(embs, planes, bandBits).count()
    }
    // full operator
    time(s"full_verify_${planes}x$bandBits") {
      graft.llmdata.Similarity.lshNearDupPairs(embs, 0.4, planes, bandBits).count()
    }
    time(s"full_verify_warm_${planes}x$bandBits") {
      graft.llmdata.Similarity.lshNearDupPairs(embs, 0.4, planes, bandBits).count()
    }
    // exact baseline for comparison (guard-size allowing; skipped past 30k)
    if (embs.limit(30001).count() <= 30000)
      time("exact_baseline") {
        graft.llmdata.Similarity.cosineNearDupPairs(embs, maxRows = 30000).count()
      }
    spark.stop()
  }
}
