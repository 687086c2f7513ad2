package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.core.GraphMetrics.triangleCounts]]: blocks of
  * 32-cliques (the near-dup-family shape) plus ONE global hub adjacent to
  * every node (degree n — the skew the degree orientation exists to
  * absorb: the hub sorts last, so its out-degree is 0 and it never pivots
  * a wedge). The triangle count is exact in closed form —
  * blocks · (C(32,3) + C(32,2)) — so each decade verifies the count, not
  * just survival. Dev tool (SCALING protocol), not part of the bench. */
object TriBench {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
    else Seq(1000000L, 4000000L, 16000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.GraftSession.applyDefaults(spark)
    spark.sparkContext.setLogLevel("ERROR")
    sizes.foreach { n =>
      val blocks = n / 32
      val nodes = spark.range(n).select(col("id"), (col("id") / 32).cast("long").as("b"))
      val clique = nodes.as("a").join(nodes.as("b"),
          col("a.b") === col("b.b") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      val hub = spark.range(n).select(col("id").as("id_a"), lit(n).as("id_b"))
      val pairs = clique.unionByName(hub)
      val t0 = System.nanoTime()
      val tc = graft.core.GraphMetrics.triangleCounts(pairs)
      val agg = tc.agg(sum("n_triangles").as("s"), count(lit(1)).as("nodes")).collect()(0)
      val secs = (System.nanoTime() - t0) / 1e9
      val expect = blocks * (4960L + 496L) // C(32,3) + C(32,2) per block
      val got = agg.getLong(0) / 3
      println(f"[tri] n=${n + 1}%,d edges=${blocks * 496 + n}%,d: triangles=$got%,d (expect $expect%,d) nodes=${agg.getLong(1)}%,d wall=$secs%.1f s")
      require(got == expect, s"triangle count off at n=$n: $got vs $expect")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
