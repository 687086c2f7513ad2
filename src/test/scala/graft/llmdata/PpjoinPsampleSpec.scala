package graft.llmdata

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the two round-9 exact-with-bounds operators:
  * [[DocDedup.ppJoinPairs]] (prefix-filtered exact set-similarity join)
  * and [[CorpusOps.prioritySample]] (fixed-size weighted sampling with
  * the Duffield-Lund-Thorup estimator). */
class PpjoinPsampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Pseudo-random word-soup docs over a small vocabulary — enough shared
    * 3-gram structure for genuine near-dup pairs. Every 10th doc is a
    * near-copy of its predecessor (one word appended). */
  private def corpus(n: Int) = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val base = (0 until n).map { i =>
      val words = (0 until 30).map(j => vocab((i * 31 + j * 7) % vocab.size))
      (i.toLong, words.mkString(" "))
    }
    val rows = base.map { case (id, text) =>
      if (id % 10 == 9) (id, base((id - 1).toInt)._2 + " omega") else (id, text)
    }
    rows.toDF("doc_id", "text")
  }

  test("ppJoinPairs equals the unpruned inverted-index join (no false negatives, no false positives)") {
    val docs = corpus(60)
    val pp = DocDedup.ppJoinPairs(docs, k = 3, thresholdPpm = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ngramJaccardPairs indexes EVERY shingle (candidate = any shared
    // shingle) at the same J >= 0.5 semantics — the ground truth the
    // prefix filter must reproduce exactly.
    val full = DocDedup.ngramJaccardPairs(docs, k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pp == full)
    assert(pp.nonEmpty, "fixture produced no near-dup pairs — test is vacuous")
  }

  test("ppJoinPairs reports exact integer intersection/union") {
    // 5-word docs -> 3 shingles each (abc,bcd,cde vs abc,bcd,cdx):
    // 2 shared, union 4, J = 0.5 exactly.
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d x")).toDF("doc_id", "text")
    val out = DocDedup.ppJoinPairs(docs, k = 3, thresholdPpm = 500000L).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == (0L, 1L))
    assert(r.getLong(2) == 2L, "n_inter")
    assert(r.getLong(3) == 4L, "n_union")
  }

  test("ppJoinPairs threshold gates on exact ppm arithmetic") {
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d x")).toDF("doc_id", "text")
    // J = 2/4 = 0.5 exactly: kept at 500000 ppm, dropped at 500001.
    assert(DocDedup.ppJoinPairs(docs, 3, 500000L).count() == 1)
    assert(DocDedup.ppJoinPairs(docs, 3, 500001L).count() == 0)
  }

  test("prioritySample returns exactly n rows, est >= weight, heavy item always kept") {
    val docs = spark.range(500).select(col("id").as("doc_id"),
      (col("id") % 97 + 1).as("n_chars"))
      // one heavy item: weight far above any plausible tau
      .union(Seq((9999L, 1000000L)).toDF("doc_id", "n_chars"))
    val out = CorpusOps.prioritySample(docs, n = 50).collect()
    assert(out.length == 50)
    assert(out.forall(r => r.getDouble(2) >= r.getLong(1).toDouble),
      "estimator must never shrink a sampled weight")
    assert(out.exists(_.getLong(0) == 9999L),
      "w >= tau item must be a deterministic member")
  }

  test("prioritySample keeps everything with est = weight when the corpus is smaller than n") {
    val docs = spark.range(20).select(col("id").as("doc_id"),
      (col("id") + 5).as("n_chars"))
    val out = CorpusOps.prioritySample(docs, n = 100).collect()
    assert(out.length == 20)
    assert(out.forall(r => r.getDouble(2) == r.getLong(1).toDouble))
  }

  test("prioritySample is partition-invariant (shard tops merge exactly)") {
    val docs = spark.range(400).select(col("id").as("doc_id"),
      (col("id") % 53 + 1).as("n_chars"))
    val a = CorpusOps.prioritySample(docs, n = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = CorpusOps.prioritySample(docs.repartition(13), n = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }
}
