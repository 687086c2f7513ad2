package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.core.GraphMetrics.triangleCounts]]: blocks of
  * 32-cliques (the near-dup-family shape) plus ONE global hub adjacent to
  * every node (degree n — the skew the degree orientation exists to
  * absorb: the hub sorts last, so its out-degree is 0 and it never pivots
  * a wedge). The triangle count is exact in closed form —
  * blocks · (C(32,3) + C(32,2)) — so each decade verifies the count, not
  * just survival. Dev tool (SCALING protocol), not part of the bench.
  *
  * `approx` as the first arg runs [[GraphMetrics.triangleCountsApprox]]
  * at p = 1/4 instead — the dense-regime path for the decade the exact
  * operator honestly cannot fit on one box (16 M nodes / 264 M edges ≈
  * 65 GB of wedge scratch); the closed form then checks the ESTIMATOR
  * (require within ±30%), not equality.
  *
  * `incr` as the first arg measures the APPEND leg: stored counts for
  * the first 99% of blocks are built untimed (production reads them
  * from the count store), then [[GraphMetrics.mergeTriangleCounts]]
  * folds the last 1% of blocks in — the timed delta — and the merged
  * totals must equal the closed form exactly. */
object TriBench {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.filter(Set("approx", "incr")).getOrElse("exact")
    val rest = if (mode == "exact") args else args.drop(1)
    val approx = mode == "approx"
    val sizes = if (rest.nonEmpty) rest.map(_.toLong).toSeq
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
      val expect = blocks * (4960L + 496L) // C(32,3) + C(32,2) per block
      if (mode == "incr") {
        // 99/1 block split on a 32-aligned cut; hub edges follow their
        // low endpoint. Stored counts + the canonical old edge set are
        // built UNTIMED (production reads both from the store); the
        // timed leg is mergeTriangleCounts — the append's actual cost.
        val cut = (n / 100 * 99) / 32 * 32
        val oldPairs = pairs.filter(col("id_a") < cut &&
          (col("id_b") < cut || col("id_b") === n))
        val newPairs = pairs.filter(col("id_a") >= cut || (col("id_b") >= cut && col("id_b") =!= n))
        val oldU = oldPairs
          .select(least(col("id_a"), col("id_b")).as("u"),
            greatest(col("id_a"), col("id_b")).as("v"))
          .filter(col("u") =!= col("v")).distinct()
          .persist()
        val stored = graft.core.GraphMetrics
          .triangleCounts(oldU.select(col("u").as("id_a"), col("v").as("id_b")))
          .persist()
        stored.count(): Unit // materialize both, outside the timed window
        val t0 = System.nanoTime()
        val merged = graft.core.GraphMetrics.mergeTriangleCounts(stored, oldU, newPairs)
        val agg = merged.agg(sum("n_triangles").as("s"), count(lit(1)).as("nodes")).collect()(0)
        val secs = (System.nanoTime() - t0) / 1e9
        val got = agg.getLong(0) / 3
        println(f"[tri-incr 1%%] n=${n + 1}%,d edges=${blocks * 496 + n}%,d: triangles=$got%,d (expect $expect%,d) nodes=${agg.getLong(1)}%,d append-wall=$secs%.1f s")
        require(got == expect, s"incremental count off at n=$n: $got vs $expect")
      } else {
        val t0 = System.nanoTime()
        val (got, nNodes, secs) = if (approx) {
          val tc = graft.core.GraphMetrics.triangleCountsApprox(pairs, keepNum = 1, keepDen = 4)
          val agg = tc.agg(sum("est_triangles").as("s"), count(lit(1)).as("nodes")).collect()(0)
          (agg.getLong(0) / 3, agg.getLong(1), (System.nanoTime() - t0) / 1e9)
        } else {
          val tc = graft.core.GraphMetrics.triangleCounts(pairs)
          val agg = tc.agg(sum("n_triangles").as("s"), count(lit(1)).as("nodes")).collect()(0)
          (agg.getLong(0) / 3, agg.getLong(1), (System.nanoTime() - t0) / 1e9)
        }
        val tag = if (approx) "tri-approx p=1/4" else "tri"
        println(f"[$tag] n=${n + 1}%,d edges=${blocks * 496 + n}%,d: triangles=$got%,d (expect $expect%,d, ratio ${got.toDouble / expect}%.4f) nodes=$nNodes%,d wall=$secs%.1f s")
        if (approx)
          require(got > expect * 0.7 && got < expect * 1.3,
            s"estimate outside ±30% at n=$n: $got vs $expect")
        else
          require(got == expect, s"triangle count off at n=$n: $got vs $expect")
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
