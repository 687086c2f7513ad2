package graft.llmdata

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Grid-scored edges ≡ join-scored edges, bit for bit — the contract
  * behind the caller-owned `gridScore` flag: a cluster deployment that
  * picks the grid shape (pairs cross the network at 20 B/row) and a
  * single-box run on the join default must produce the same graph to the
  * last bit. knnGraph deliberately does NOT auto-switch to the GRID on
  * corpus size — the single-box measurement contradicts that switch (see
  * the scale notes on knnGraph/scorePairsGrid) — so this spec covers
  * deployment choice. (The join default does gate its own internal
  * machinery on size — KnnLightMaxN — which KnnShapeGateSpec pins as
  * answer-identical; at this fixture's 500 vectors the whole-graph test
  * below therefore compares the LIGHT join shape against the grid.)
  * Candidates come from the real banding path over the sf0.01 embedding
  * fixture, so the compared pair set is the operator's own.
  */
class KnnGridScoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  private lazy val n = Similarity.withNorm(
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))).cache()

  // ALL directed pairs of the 500-vector fixture (249 500 edges) — a
  // strict superset of any banding candidate set, so bit-equality here
  // covers every edge either scoring shape will ever see on this corpus.
  private lazy val edges = {
    val ids = n.select(col("vec_id"))
    ids.select(col("vec_id").as("src"))
      .crossJoin(ids.select(col("vec_id").as("dst")))
      .filter(col("src") =!= col("dst"))
      .cache()
  }

  private def scored(grid: Boolean): Map[(Long, Long), Double] =
    Similarity.scoreEdges(edges, n, grid)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("grid scoring reproduces the join form bit-for-bit on the all-pairs edge set") {
    val j = scored(grid = false)
    val g = scored(grid = true)
    assert(j.keySet == g.keySet, "edge sets differ between scoring shapes")
    assert(j.nonEmpty, "fixture produced no banding candidates")
    val diverging = j.count { case (k, v) =>
      java.lang.Double.doubleToLongBits(v) != java.lang.Double.doubleToLongBits(g(k))
    }
    assert(diverging == 0, s"$diverging of ${j.size} cosines differ at the bit level")
  }

  test("full knnGraph output is identical through either scoring shape") {
    def run(grid: Boolean) = Similarity.knnGraph(
        spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding")),
        k = 5, gridScore = grid)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val join = run(grid = false)
    val grid = run(grid = true)
    assert(join.nonEmpty)
    assert(join == grid)
  }

  test("zero-norm contract: grid scorer emits NULL (ranks last under desc), never NaN") {
    import spark.implicits._
    val z = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 0.0f)), (3L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val zn = Similarity.withNorm(z)
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val rows = Similarity.scorePairsGrid(pairs, zn)
      .collect().map(r => (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(rows(2L).isEmpty, "zero-norm cosine must be NULL (the join form's Divide-by-zero)")
    assert(rows(3L).exists(c => c > 0.9), "well-defined pair must score")
    // And the join form agrees:
    val joinRows = Similarity.scoreEdges(pairs, zn, grid = false)
      .collect().map(r => (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(joinRows(2L).isEmpty)
  }

  test("degenerate-input parity: null and dimension-mismatched embeddings keep the pair with NULL cos in BOTH shapes") {
    import spark.implicits._
    // 1 = well-formed, 2 = null embedding, 3 = mismatched dimension,
    // 4 = well-formed partner; pair (1,5) references an absent id.
    val z = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, null.asInstanceOf[Array[Float]]),
      (3L, Array(0.5f)), (4L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val zn = Similarity.withNorm(z)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("src", "dst")
    def collectBoth(grid: Boolean): Map[Long, Option[Double]] =
      Similarity.scoreEdges(pairs, zn, grid)
        .collect().map(r => r.getLong(1) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val j = collectBoth(grid = false)
    val g = collectBoth(grid = true)
    assert(j.keySet == Set(2L, 3L, 4L),
      "join form must keep null/mismatched pairs (NULL cos) and drop only absent ids")
    assert(g.keySet == j.keySet,
      s"grid form's edge set ${g.keySet} diverges from the join form's ${j.keySet}")
    assert(j(2L).isEmpty && g(2L).isEmpty, "null embedding: NULL cos in both shapes")
    assert(j(3L).isEmpty && g(3L).isEmpty, "dimension mismatch: NULL cos in both shapes")
    assert(j(4L).isDefined && j(4L) == g(4L), "well-formed pair scores identically")
  }
}
