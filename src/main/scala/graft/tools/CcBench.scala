package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.core.StarComponents]] on the adversarial graph
  * shape: one chain of n nodes (diameter n−1) plus a field of two-node
  * pairs — the regime where min-label propagation needs n−1 edge-set
  * rounds and star contraction needs O(log n) alternations. Prints rounds
  * + wall per decade and verifies the labels (every chain node → 0, every
  * pair → its even anchor). Dev tool (SCALING protocol), not part of the
  * bench; synthetic edges, no testdata dependency. */
object CcBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
    else Seq(100000L, 1000000L, 10000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.GraftSession.applyDefaults(spark)
    spark.sparkContext.setLogLevel("ERROR")
    sizes.foreach { n =>
      // chain over ids [0, n); pair field over ids [2n, 3n): (2n+2i, 2n+2i+1)
      val chain = spark.range(n - 1)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val pairs = spark.range(n / 2)
        .select((col("id") * 2 + 2 * n).as("id_a"), (col("id") * 2 + 2 * n + 1).as("id_b"))
      val edges = chain.unionByName(pairs)
      val t0 = System.nanoTime()
      val (labels, rounds) =
        graft.core.StarComponents.componentsWithRounds(edges, maxIterations = 60)
      val bad = labels.filter(
        (col("doc_id") < n && col("cluster") =!= 0L) ||
          (col("doc_id") >= lit(2 * n) &&
            col("cluster") =!= (col("doc_id") - ((col("doc_id") - 2 * n) % 2)))).count()
      val nodes = labels.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[cc] n=$n%,d chain + ${n / 2}%,d pairs: nodes=$nodes%,d rounds=$rounds wall=$secs%.1f s bad=$bad")
      require(bad == 0, s"wrong labels at n=$n")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
