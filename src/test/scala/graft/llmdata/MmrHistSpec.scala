package graft.llmdata

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[Similarity.mmrTopK]] (greedy Maximal Marginal Relevance).
  * The reference implementation below repeats the operator's exact float
  * recipe in plain Scala (same left-to-right dot fold, same
  * (score, -index) argmax tie-break), so agreement is bit-for-bit, not
  * approximate. */
class MmrHistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))

  /** Driver-side greedy MMR over one query's pool — the independent twin
    * of the in-plan fold. Pool entries are (nn_id, cos, ed, nrm) sorted by
    * (cos desc, nn_id asc). Returns selected 1-based pool indices. */
  private def refMmr(pool: IndexedSeq[(Long, Double, Array[Double], Double)],
                     k: Int, lam: Double): Seq[Int] = {
    val sel = scala.collection.mutable.ArrayBuffer[Int]()
    while (sel.length < math.min(k, pool.length)) {
      val best = (1 to pool.length).filterNot(sel.contains).maxBy { i =>
        val (_, cos, e, en) = pool(i - 1)
        val pen =
          if (sel.isEmpty) 0.0
          else sel.map { j =>
            val (_, _, e2, en2) = pool(j - 1)
            dot(e, e2) / (en * en2)
          }.max
        (lam * cos - (1.0 - lam) * pen, -i)
      }
      sel += best
    }
    sel.toSeq
  }

  test("mmrTopK matches the driver-side greedy reference on real embeddings") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (nq, k, of) = (4, 5, 3)
    val out = Similarity.mmrTopK(embs, nQueries = nq, k = k, overfetch = of)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    // rebuild each query's pool the same way the operator does
    val vecs = embs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val norms = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    for (q <- 0L until nq.toLong) {
      val pool = vecs.keys.filter(_ != q).map { id =>
        (id, dot(vecs(q), vecs(id)) / (norms(q) * norms(id)), vecs(id), norms(id))
      }.toIndexedSeq.sortBy(t => (-t._2, t._1)).take(k * of)
      val want = refMmr(pool, k, 700000.0 / 1000000.0)
        .zipWithIndex.map { case (idx, p) =>
          (q, p + 1L, pool(idx - 1)._1, idx.toLong)
        }.toSet
      assert(out(q).toSet == want, s"query $q")
    }
  }

  test("mmrTopK diversifies: near-duplicate of the top hit is deferred") {
    // q = id 0; ids 1 and 2 are near-duplicates of each other and most
    // relevant; id 3 is less relevant but orthogonal. Plain top-3 order is
    // (1, 2, 3); MMR at λ=0.7 must pick 3 ahead of redundant 2.
    val embs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), "q"),
      (1L, Array(0.9f, 0.10f, 0.0f), "a"),
      (2L, Array(0.9f, 0.11f, 0.0f), "a"),
      (3L, Array(0.6f, 0.0f, 0.8f), "b"))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.mmrTopK(embs, nQueries = 1, k = 3, overfetch = 1,
        lambdaPpm = 500000L)
      .collect().sortBy(_.getLong(1))
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 3L, 2L), "MMR order")
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 2L), "relevance ranks rearranged")
  }
}
