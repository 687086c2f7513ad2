package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade sweep for knnGraph's `descentRounds` knob: wall per build and
  * recall@k against the exact graph for rounds 0/1/2, so the knob's
  * recall-per-second tradeoff is a measured SCALING row instead of
  * fixture-scale extrapolation. Recall is computed on a deterministic
  * node SAMPLE (vec_id ≡ 0 mod step, the standard ANN methodology) —
  * exact all-pairs at 200 k+ nodes is the quadratic the library exists
  * to avoid. Dev tool (SCALING protocol), not part of the bench. */
object KnnSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf1")
    val rounds = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(0, 1, 2)
    val k = 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.GraftSession.applyDefaults(spark)
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExprs.register(spark)
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val nHint = graft.sources.ParquetMeta.footerRows(spark, s"$sfDir/embeddings.parquet")
    // ~1k exact-ground-truth query nodes, deterministic.
    val step = math.max(1L, nHint / 1000)
    val n = graft.llmdata.Similarity.withNorm(embs).persist()
    val q = n.filter(col("vec_id") % step === 0)
      .select(col("vec_id").as("src"), col("ed").as("ea"), col("nrm").as("na"))
    val exact = q.crossJoin(n.select(col("vec_id").as("dst"), col("ed").as("eb"), col("nrm").as("nb")))
      .filter(col("src") =!= col("dst"))
      .withColumn("cos", expr(graft.llmdata.Similarity.sparkCosPre("ea", "eb", "na", "nb")))
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("src").orderBy(col("cos").desc, col("dst").asc)))
      .filter(col("rank") <= k)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[sweep] $sfDir n=$nHint sample=${exact.size / k} nodes, ${exact.size} exact edges")
    rounds.foreach { r =>
      // warm measurement: one cold build absorbs codegen, then timed build
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val got = graft.core.CacheScope.scoped {
          graft.llmdata.Similarity.knnGraph(embs, k, nHint = nHint, descentRounds = r)
            .filter(col("vec_id") % step === 0)
            .collect().map(x => (x.getLong(0), x.getLong(2))).toSet
        }
        ((System.nanoTime() - t0) / 1e9, got)
      }
      val (warm, got) = times.last
      val recall = got.intersect(exact).size.toDouble / exact.size
      println(f"[sweep] rounds=$r wall_cold=${times.head._1}%.1f s wall_warm=$warm%.1f s recall@$k=$recall%.4f")
    }
    spark.stop()
  }
}
