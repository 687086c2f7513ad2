package graft.llmdata

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Contract of [[Similarity.lshTopKMultiProbe]]: Hamming-1 probing must
  * buy recall over the same banding config's plain [[Similarity.lshTopK]]
  * (that is the operator's whole reason to exist), stay below exact
  * brute force, and emit each neighbor exactly once per query. */
class MultiProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rows) =>
        q -> rows.sortBy(_._2).map(_._3).toSeq
      }

  test("multi-probe recall dominates single-probe at the same banding; neighbors exactly-once") {
    graft.functions.VectorExprs.register(spark)
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val exact = topSets(Similarity.bruteForceTopK(embs))
    val single = topSets(Similarity.lshTopK(embs))
    val multi = topSets(Similarity.lshTopKMultiProbe(embs))
    assert(multi.keySet == exact.keySet)
    // exactly-once: a double-emitted candidate would appear at two ranks
    multi.values.foreach { nns =>
      assert(nns.distinct == nns, "duplicate neighbor in one query's top-k")
      assert(nns.size == 10)
    }
    def recall(approx: Map[Long, Seq[Long]]): Double =
      exact.map { case (q, ex) =>
        approx.getOrElse(q, Seq.empty).toSet.intersect(ex.toSet).size.toDouble / ex.size
      }.sum / exact.size
    val rs = recall(single)
    val rm = recall(multi)
    info(f"recall@10: single-probe $rs%.3f, multi-probe $rm%.3f")
    assert(rm >= rs, f"probing lost recall: $rm%.3f < $rs%.3f")
    assert(rm > rs, "probing bought nothing at sf0.01 — knobs or fixture degenerated")
    assert(rm >= 0.85, f"multi-probe absolute recall $rm%.3f below the measured bar")
  }
}
