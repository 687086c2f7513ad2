package tmpsmoke

import graft.llmdata.{CorpusOps, DocDedup}
import graft.registry.Corpus
import org.apache.spark.sql.SparkSession

object ProfileC {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[profile] docs rows = ${docs.count()}")

    time("c_sample")(Corpus.queries("c_sample")(spark, sfDir).count())
    time("c_decontam run1")(Corpus.queries("c_decontam")(spark, sfDir).count())
    time("c_decontam run2")(Corpus.queries("c_decontam")(spark, sfDir).count())
    time("minhashLshPairs alone")(DocDedup.minhashLshPairs(docs).count())
    time("c_clusters run1")(Corpus.queries("c_clusters")(spark, sfDir).count())
    time("c_corpus run1")(Corpus.queries("c_corpus")(spark, sfDir).count())
    time("c_corpus run2")(Corpus.queries("c_corpus")(spark, sfDir).count())
    time("d_ngram")(DocDedup.ngramJaccardPairs(docs).count())
    spark.stop()
  }
}
