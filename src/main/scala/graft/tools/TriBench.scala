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
  * totals must equal the closed form exactly.
  *
  * `sweep` as the first arg sweeps the DOULION coin p ∈ {1/2, 1/4, 1/8,
  * 1/16} on the closed-form fixture at each size, reporting estimate
  * error AND the per-node zero-rate (fraction of nodes — every one of
  * which truly participates in triangles here — whose estimate reads 0):
  * the spread a curator choosing p actually needs next to the mean the
  * decade rows validate.
  *
  * `kcore` as the first arg probes [[GraphMetrics.kCore]] (k = 2) on a
  * clique + pendant-path mix — per 40-node block, a 32-clique with an
  * 8-node path hung off its first node. The path is the peel-depth
  * adversary (one pendant dies per round, so depth = path length + the
  * confirm round = 9, independent of n), and the closed form is exact:
  * the 2-core is the cliques alone, every member at in-core degree 31.
  * Each decade verifies core size, in-core degree sum, AND the measured
  * depth — the number the twin budgets are derived from
  * ([[graft.registry.Corpus.KCoreTwinRounds]]).
  *
  * `kcore2` as the first arg probes [[GraphMetrics.kCore2Contracted]] on
  * the DEEP variant of that fixture — per 160-node block a 32-clique
  * with a 128-node pendant path — where the plain peel's depth law
  * (path length + confirm = 129 driver-sequenced rounds) is the
  * adversary the contraction exists to kill. Verifies the same closed
  * form (2-core = the cliques at degree 31) and reports contracted
  * rounds vs the plain form's depth; plain wall is measured alongside at
  * the smallest size only (129 rounds of it at 4 M nodes is the point).
  *
  * `kcore2knn <sfDir>...` measures BOTH forms on the real mutual-kNN
  * graph of each given scale dir — the graph whose drift-chain depth
  * law (7 at sf0.1 → 23 at sf1) motivated the contracted form. */
object TriBench {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption
      .filter(Set("approx", "incr", "sweep", "kcore", "kcore2", "kcore2knn"))
      .getOrElse("exact")
    val rest = if (mode == "exact") args else args.drop(1)
    val approx = mode == "approx"
    val knnDirs = if (mode == "kcore2knn") {
      if (rest.nonEmpty) rest.toSeq else Seq("/root/testdata/sf0.1")
    } else Seq.empty
    val sizes = if (mode == "kcore2knn") Seq.empty[Long]
    else if (rest.nonEmpty) rest.map(_.toLong).toSeq
    else if (mode == "sweep") Seq(1000000L)
    else if (mode == "kcore" || mode == "kcore2") Seq(1000000L, 4000000L)
    else Seq(1000000L, 4000000L, 16000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.GraftSession.applyDefaults(spark)
    spark.sparkContext.setLogLevel("ERROR")
    sizes.foreach { n =>
      if (mode == "kcore") {
        // 40-node blocks: ids b·40+0..31 form a K32; b·40+32..39 a pendant
        // path hung off the clique's first node. 2-core = the cliques.
        val blocks = n / 40
        val nodes = spark.range(blocks * 40)
          .select(col("id"), (col("id") / 40).cast("long").as("b"), (col("id") % 40).as("i"))
        val clique = nodes.filter(col("i") < 32).as("a")
          .join(nodes.filter(col("i") < 32).as("b"),
            col("a.b") === col("b.b") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        val path = nodes.filter(col("i") >= 32)
          .select(when(col("i") === 32, col("b") * 40).otherwise(col("id") - 1).as("id_a"),
            col("id").as("id_b"))
        val pairs = clique.unionByName(path)
        val t0 = System.nanoTime()
        val depth = graft.core.GraphMetrics.kCorePeelDepth(pairs, k = 2)
        val core = graft.core.GraphMetrics.kCore(pairs, k = 2)
        val agg = core.agg(count(lit(1)).as("nodes"), sum("deg").as("degsum")).collect()(0)
        val secs = (System.nanoTime() - t0) / 1e9
        // kCorePeelDepth + kCore run the loop twice; halve for per-run wall.
        println(f"[kcore k=2] n=${blocks * 40}%,d edges=${blocks * 504}%,d: core=${agg.getLong(0)}%,d (expect ${blocks * 32}%,d) degsum=${agg.getLong(1)}%,d (expect ${blocks * 32 * 31}%,d) peel-depth=$depth rounds wall=${secs / 2}%.1f s/run")
        require(agg.getLong(0) == blocks * 32 && agg.getLong(1) == blocks * 32 * 31,
          s"2-core closed form violated at n=$n")
        require(depth == 9, s"peel depth should be path-length 8 + confirm = 9, got $depth")
      } else if (mode == "kcore2") {
        // 160-node blocks: K32 + a 128-node pendant path — the deep-chain
        // adversary. Plain depth = 129 (one pendant per round + confirm);
        // contracted rounds must be O(log 128).
        val blocks = n / 160
        val nodes = spark.range(blocks * 160)
          .select(col("id"), (col("id") / 160).cast("long").as("b"), (col("id") % 160).as("i"))
        val clique = nodes.filter(col("i") < 32).as("a")
          .join(nodes.filter(col("i") < 32).as("b"),
            col("a.b") === col("b.b") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        val path = nodes.filter(col("i") >= 32)
          .select(when(col("i") === 32, col("b") * 160).otherwise(col("id") - 1).as("id_a"),
            col("id").as("id_b"))
        val pairs = clique.unionByName(path).persist()
        pairs.count(): Unit
        val t0 = System.nanoTime()
        val rounds = graft.core.GraphMetrics.kCore2ContractedRounds(pairs)
        val core = graft.core.GraphMetrics.kCore2Contracted(pairs)
        val agg = core.agg(count(lit(1)).as("nodes"), sum("deg").as("degsum")).collect()(0)
        val secs = (System.nanoTime() - t0) / 1e9
        // Rounds + core run the loop twice; halve for per-run wall.
        val plainNote = if (n <= 1000000L) {
          val p0 = System.nanoTime()
          val depth = graft.core.GraphMetrics.kCorePeelDepth(pairs, k = 2, maxRounds = 200)
          f" plain: depth=$depth wall=${(System.nanoTime() - p0) / 1e9}%.1f s"
        } else " plain: skipped (129 driver-sequenced rounds is the point)"
        println(f"[kcore2 k=2] n=${blocks * 160}%,d edges=${blocks * 624}%,d: core=${agg.getLong(0)}%,d (expect ${blocks * 32}%,d) degsum=${agg.getLong(1)}%,d (expect ${blocks * 32 * 31}%,d) contracted-rounds=$rounds wall=${secs / 2}%.1f s/run$plainNote")
        require(agg.getLong(0) == blocks * 32 && agg.getLong(1) == blocks * 32 * 31,
          s"contracted 2-core closed form violated at n=$n")
        require(rounds <= 20, s"contracted rounds not logarithmic: $rounds for a 128-path")
        pairs.unpersist(blocking = false): Unit
      } else if (mode == "sweep") {
        val blocks = n / 32
        val nodes = spark.range(n).select(col("id"), (col("id") / 32).cast("long").as("b"))
        val clique = nodes.as("a").join(nodes.as("b"),
            col("a.b") === col("b.b") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        val hub = spark.range(n).select(col("id").as("id_a"), lit(n).as("id_b"))
        val pairs = clique.unionByName(hub).persist()
        pairs.count(): Unit
        val expect = blocks * (4960L + 496L)
        Seq(2, 4, 8, 16).foreach { den =>
          val t0 = System.nanoTime()
          val est = graft.core.GraphMetrics.triangleCountsApprox(pairs, 1, den)
          val agg = est.agg(sum("est_triangles").as("s"), count(lit(1)).as("nodes"),
            sum(when(col("est_triangles") === 0, 1L).otherwise(0L)).as("zeros")).collect()(0)
          val secs = (System.nanoTime() - t0) / 1e9
          val got = agg.getLong(0) / 3
          // every node of this fixture truly participates in triangles, so
          // zeros/nodes IS the per-node miss rate at this p.
          println(f"[tri-sweep p=1/$den] n=${n + 1}%,d: est=$got%,d (expect $expect%,d, err ${(got.toDouble / expect - 1) * 100}%+.2f%%) node-zero-rate=${agg.getLong(2).toDouble / agg.getLong(1) * 100}%.1f%% wall=$secs%.1f s")
          spark.sharedState.cacheManager.clearCache()
        }
        pairs.unpersist(blocking = false): Unit
      } else {
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
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    knnDirs.foreach { dir =>
      // The REAL graph behind the depth law: mutual verified k-NN edges.
      // Build once (untimed), then measure plain peel vs contracted.
      graft.core.CacheScope.scoped {
        val edges = graft.registry.LlmData.mutualVerifiedKnnEdges(spark, dir)
          .select("id_a", "id_b").persist()
        val m = edges.count()
        val t0 = System.nanoTime()
        val depth = graft.core.GraphMetrics.kCorePeelDepth(edges, k = 2, maxRounds = 200)
        val plainS = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val rounds = graft.core.GraphMetrics.kCore2ContractedRounds(edges)
        val contrS = (System.nanoTime() - t1) / 1e9
        val same = graft.core.GraphMetrics.kCore2Contracted(edges)
          .union(graft.core.GraphMetrics.kCore(edges, k = 2, maxRounds = 200))
          .groupBy("doc_id", "deg").agg(count(lit(1)).as("c"))
          .filter(col("c") =!= 2).count()
        println(f"[kcore2knn] $dir edges=$m%,d: plain depth=$depth wall=$plainS%.1f s | contracted rounds=$rounds wall=$contrS%.1f s | result-diff-rows=$same (must be 0)")
        require(same == 0, s"contracted != plain on the knn graph at $dir")
        edges.unpersist(blocking = false): Unit
      }
    }
    spark.stop()
  }
}
