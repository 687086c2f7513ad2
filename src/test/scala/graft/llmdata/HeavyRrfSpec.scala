package graft.llmdata

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[TextAnalysis.heavyHitters]] (Misra-Gries candidates →
  * exact verify) and [[Similarity.hybridRrfTopK]] (RRF fusion). */
class HeavyRrfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sfDir = "/root/testdata/sf0.001"

  test("heavyHitters finds exactly the above-N/k tokens with exact counts") {
    // 100 docs of "filler{i} hot": hot = 100 of N=200 occurrences;
    // each filler = 1. k=4 -> threshold N/k = 50: only hot qualifies.
    val docs = (0 until 100).map(i => (i.toLong, s"filler$i hot"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.heavyHitters(docs, k = 4).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "hot")
    assert(out.head.getLong(1) == 100L)
    assert(out.head.getLong(2) == 500000L) // 100/200 in ppm
  }

  test("heavyHitters output is partition-invariant although the MG summary is not") {
    val docs = (0 until 300).map { i =>
      (i.toLong, if (i % 3 == 0) "alpha beta" else s"w$i beta")
    }.toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.heavyHitters(df, k = 8).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(docs) == run(docs.repartition(17)))
    assert(run(docs).exists(_._1 == "beta"))
  }

  test("heavyHitters exact gate excludes a token at exactly N/k") {
    // N = 8, k = 4: threshold is count > 2. 'a' has 2 (excluded),
    // 'b' has 3 (included), fillers 1 each.
    val docs = Seq((0L, "a a b b"), (1L, "b x y z")).toDF("doc_id", "text")
    val out = TextAnalysis.heavyHitters(docs, k = 4).collect()
      .map(_.getString(0)).toSet
    assert(out == Set("b"))
  }

  test("hybridRrfTopK ranks follow the recomputed RRF formula over both pools, per query") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val all = Similarity.hybridRrfTopK(docs, embs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    assert(all.map(_._1).distinct.sorted.toSeq ==
      TextAnalysis.Bm25DefaultQueries.indices.map(_.toLong))
    all.groupBy(_._1).foreach { case (qid, out) =>
      assert(out.nonEmpty && out.length <= 10)
      assert(out.map(_._3).sorted.toSeq == (1L to out.length), s"query $qid")
      // every row: rrf == round(lex term + sem term, 6); absent pool = 0
      out.foreach { case (_, id, _, rrf, lex, sem) =>
        val expect =
          (if (lex > 0) 1.0 / (60 + lex) else 0.0) +
          (if (sem > 0) 1.0 / (60 + sem) else 0.0)
        assert(math.abs(rrf - BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"query $qid doc $id")
        assert(lex > 0 || sem > 0, s"query $qid doc $id is in neither pool")
      }
      // rank order is rrf-descending (ties by doc_id)
      val byRank = out.sortBy(_._3).map(r => (r._4, r._2))
      assert(byRank.zip(byRank.tail).forall { case ((s1, i1), (s2, i2)) =>
        s1 > s2 || (s1 == s2 && i1 < i2) }, s"query $qid")
    }
  }

  test("hybridRrfTopK: membership in both pools dominates equal single-pool rank") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val all = Similarity.hybridRrfTopK(docs, embs).collect()
    assert(all.nonEmpty)
    all.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val both = rows.filter(r => r.getLong(4) > 0 && r.getLong(5) > 0)
      val single = rows.filter(r => r.getLong(4) == 0 ^ r.getLong(5) == 0)
      // if any doc sits in both pools, its fused score must beat any doc
      // whose single rank is >= both its ranks
      for (b <- both; s <- single) {
        val sr = math.max(s.getLong(4), s.getLong(5))
        if (sr >= b.getLong(4) && sr >= b.getLong(5))
          assert(b.getDouble(3) > s.getDouble(3))
      }
    }
  }

  test("bm25TopDocsMulti query 0 reproduces the single-query bm25TopDocs exactly") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val single = TextAnalysis.bm25TopDocs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val multi = TextAnalysis.bm25TopDocsMulti(docs).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(multi == single)
    assert(single.nonEmpty)
  }
}
