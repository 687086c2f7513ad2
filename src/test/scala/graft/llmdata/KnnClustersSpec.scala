package graft.llmdata

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The graph→cluster composition (x_knn_clusters): mutual-kNN edges,
  * exact-cosine-verified at the dedup family's 0.4 threshold, through the
  * same min-label propagation the MinHash cluster family runs. Pins WHY
  * both gates exist (mutuality alone percolates into one giant deep
  * component — measured here, not assumed), the fixed-round convergence
  * the oracle unrolls, and label canonicality.
  */
class KnnClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  private lazy val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private lazy val graph = Similarity.knnGraph(embs, k = 5).cache()

  // localCheckpoint, not cache: propagation embeds this plan 2^rounds
  // times and the knn lineage underneath blows the plan STRING (driver
  // OOM in explainString) — same truncation the registered row applies.
  private lazy val mutualRaw = {
    val e = graph.select(col("vec_id").as("id_a"), col("nn_id").as("id_b"))
    e.intersect(e.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .filter(col("id_a") < col("id_b")).localCheckpoint()
  }

  private lazy val mutual = {
    val n = Similarity.withNorm(embs)
    mutualRaw
      .join(n.select(col("vec_id").as("id_a"), col("ed").as("__ea"), col("nrm").as("__na")), "id_a")
      .join(n.select(col("vec_id").as("id_b"), col("ed").as("__eb"), col("nrm").as("__nb")), "id_b")
      .filter(expr(Similarity.sparkCosPre("__ea", "__eb", "__na", "__nb")) >= 0.4)
      .select("id_a", "id_b").localCheckpoint()
  }

  test("mutual-kNN keeps exactly the edges present in both directions") {
    val directed = graph.select(col("vec_id"), col("nn_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = mutualRaw.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = directed.filter { case (a, b) => a < b && directed.contains((b, a)) }
    assert(got == want)
    assert(got.nonEmpty)
    assert(got.size < directed.size, "sparsifier must drop asymmetric edges")
  }

  test("mutuality alone percolates; the 0.4 verify is load-bearing") {
    // The UNVERIFIED mutual 5-NN graph on this fixture is (nearly) one
    // giant component — min-label would collapse everything toward 0 and
    // no small unroll converges. The verified graph must be a real
    // sparsifier: strictly fewer edges, several components.
    val rawEdges = mutualRaw.count()
    val kept = mutual.count()
    assert(kept > 0, "threshold stripped every edge — fixture lost its near-dup structure")
    assert(kept < rawEdges / 2,
      s"verify kept $kept of $rawEdges mutual edges — threshold no longer selective")
  }

  test("3 propagation rounds are past the fixpoint on the verified graph (the oracle's unroll depth)") {
    val fixed = CorpusOps.clusterLabels(mutual, iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val converged = CorpusOps.clusterLabelsConverged(mutual)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fixed == converged,
      "verified components deeper than 3 hops — raise the unroll in BOTH dialects")
  }

  test("labels are consistent across every verified edge, canonical, and non-vacuous") {
    val labels = CorpusOps.clusterLabels(mutual, iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    mutual.collect().foreach { r =>
      assert(labels(r.getLong(0)) == labels(r.getLong(1)),
        s"edge (${r.getLong(0)}, ${r.getLong(1)}) split across clusters")
    }
    labels.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c, s"cluster $c is not its component's min id")
    }
    val sizes = labels.groupBy(_._2).map(_._2.size)
    assert(sizes.exists(_ >= 3), "no component beyond a pair — composition adds nothing over reciprocal-NN")
    assert(labels.values.toSet.size >= 2, "single cluster — vacuous fixture")
  }
}
