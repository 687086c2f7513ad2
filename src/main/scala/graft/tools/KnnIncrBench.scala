package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The increment's value proposition, measured: build the graph index on
  * all but the last `batchPct`% of ids, then time (a) the APPEND of that
  * small batch vs (b) a full REBUILD over the whole corpus — the
  * continuous-ingest regime the lifecycle exists for (the half/half
  * oracle row exercises correctness; at a 50% "batch" the increment is
  * structurally modest). Dev tool (SCALING protocol). */
object KnnIncrBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf10")
    val batchPct = sys.env.getOrElse("SPARK_GRAFT_BATCH_PCT", "1").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.GraftSession.applyDefaults(spark)
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExprs.register(spark)
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = graft.sources.ParquetMeta.footerRows(spark, s"$sfDir/embeddings.parquet")
    // The batch is the last batchPct% of ROWS by id — resolved from the
    // ids themselves, NOT count-derived (scale-fixture vec_ids are
    // replica-block offsets, 0..9.9e9 at sf10; a count-based cut once
    // mislabeled 90% of the corpus as "new" and benched a near-rebuild).
    val cut = embs.select(col("vec_id"))
      .orderBy(col("vec_id").desc).limit((n * batchPct / 100).toInt)
      .agg(min("vec_id")).collect()(0).getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("knn_incr_bench").toString
    def timed[T](what: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[incr-bench] $what%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    println(s"[incr-bench] $sfDir n=$n cutId=$cut batchRows=${n * batchPct / 100} (${batchPct}%)")
    graft.core.CacheScope.scoped {
      timed("build_base")(graft.llmdata.Similarity.buildKnnGraphIndex(
        embs.filter(col("vec_id") < cut), dir, 5))
    }
    graft.core.CacheScope.scoped {
      timed(s"append_${batchPct}pct")(graft.llmdata.Similarity.appendToKnnGraphIndex(
        embs.filter(col("vec_id") >= cut), dir))
    }
    graft.core.CacheScope.scoped {
      timed("full_rebuild")(
        graft.llmdata.Similarity.knnGraph(embs, 5, nHint = n).count())
    }
    spark.stop()
  }
}
