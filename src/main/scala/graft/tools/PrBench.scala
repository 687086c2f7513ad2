package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.core.GraphRank.pageRankPpm]]: synthetic
  * skewed graphs per decade (one ring edge per node for connectivity +
  * one hub edge per node to id/1024, giving ~2n edges with 1024-degree
  * hubs — the degree skew real near-dup graphs show), 5 fixed rounds.
  * Prints wall per decade and two rank invariants (hubs above par,
  * total mass bounded by n·10⁶ — truncation only ever loses ppm). Dev
  * tool (SCALING protocol), not part of the bench; synthetic edges, no
  * testdata dependency. */
object PrBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
    else Seq(1000000L, 10000000L, 50000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.GraftSession.applyDefaults(spark)
    spark.sparkContext.setLogLevel("ERROR")
    sizes.foreach { n =>
      val ring = spark.range(n)
        .select(col("id").as("id_a"), ((col("id") + 1) % n).as("id_b"))
      val hub = spark.range(n)
        .filter(col("id") % 1024 =!= 0)
        .select(col("id").as("id_a"), (col("id") - col("id") % 1024).as("id_b"))
      val pairs = ring.unionByName(hub)
      val t0 = System.nanoTime()
      val r = graft.core.GraphRank.pageRankPpm(pairs, iterations = 5)
      val agg = r.agg(count(lit(1)).as("nodes"), sum("rank_ppm").as("mass"),
        max("rank_ppm").as("mx")).collect()(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[pr] n=$n%,d edges=${2 * n}%,d: nodes=${agg.getLong(0)}%,d mass=${agg.getLong(1)} max=${agg.getLong(2)} wall=$secs%.1f s")
      require(agg.getLong(0) == n, s"node count off at n=$n")
      require(agg.getLong(1) <= n * 1000000L, s"mass above par at n=$n")
      require(agg.getLong(2) > 1000000L, s"no hub concentration at n=$n")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
