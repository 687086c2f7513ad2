package graft.llmdata

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 sketch operators: Bloom-gated incremental dedup
  * ([[DocDedup.bloomGateDedup]]) and sampled quantile estimation
  * ([[CorpusOps.sampledQuantiles]]). */
class BloomSquantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpusDf = (1L to 400L)
    .map(i => (i, s"corpus document number $i with body ${i % 37}"))
    .toDF("doc_id", "text")

  // 30 replays of corpus docs (true dups) + 70 novel docs
  private def batchDf = (
    (1L to 30L).map(i => (1000L + i, s"corpus document number ${i * 13} with body ${(i * 13) % 37}")) ++
    (1L to 70L).map(i => (2000L + i, s"novel batch document $i"))
  ).toDF("doc_id", "text")

  test("bloomBitsFor: power-of-two ladder, >= 16 bits per key, clamped") {
    assert(DocDedup.bloomBitsFor(1L) == 4096L)
    assert(DocDedup.bloomBitsFor(256L) == 4096L)
    assert(DocDedup.bloomBitsFor(257L) == 8192L)
    assert(DocDedup.bloomBitsFor(4000L) == 65536L)
    // >= 16 bits/key at every rung below the cap; monotone
    val ns = Seq(100L, 1000L, 10000L, 100000L, 1000000L)
    ns.foreach(n => assert(DocDedup.bloomBitsFor(n) >= 16 * n, s"n=$n"))
    assert(ns.map(DocDedup.bloomBitsFor) == ns.map(DocDedup.bloomBitsFor).sorted)
    // cap: past 2^21 corpus keys the width stays 2^26
    assert(DocDedup.bloomBitsFor(1L << 22) == (1L << 26))
    assert(DocDedup.bloomBitsFor(1L << 30) == (1L << 26))
  }

  test("bloomGateDedup: exact_dup matches the plain membership join, no false negatives") {
    val out = DocDedup.bloomGateDedup(batchDf, corpusDf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.size == 100)
    // ground truth by a plain join
    val truth = batchDf.join(corpusDf.select(col("text")).distinct(), Seq("text"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    out.foreach { case (id, (bloomHit, exactDup, falsePos)) =>
      assert((exactDup == 1L) == truth(id), s"doc $id")
      // no false negatives: a true member always passes the filter
      if (truth(id)) assert(bloomHit == 1L, s"doc $id is a member but missed the filter")
      // flags are consistent: false_pos = bloom_hit && !exact_dup
      assert(falsePos == (if (bloomHit == 1L && exactDup == 0L) 1L else 0L))
    }
    assert(truth.size == 30)
  }

  test("bloomGateDedup: footer-hint and counted paths pick the same filter") {
    val counted = DocDedup.bloomGateDedup(batchDf, corpusDf).collect().toSet
    val hinted = DocDedup.bloomGateDedup(batchDf, corpusDf, nHint = 400L).collect().toSet
    assert(counted == hinted)
  }

  test("sampleRateFor: bounds the expected sample to (target/2, target]") {
    assert(CorpusOps.sampleRateFor(4096L) == 1L)
    assert(CorpusOps.sampleRateFor(4097L) == 2L)
    assert(CorpusOps.sampleRateFor(8193L) == 4L)
    val ns = Seq(5000L, 50000L, 500000L, 5000000L)
    ns.foreach { n =>
      val r = CorpusOps.sampleRateFor(n)
      val expected = n.toDouble / r
      assert(expected <= 4096.0 && expected > 2048.0, s"n=$n rate=$r sample=$expected")
    }
  }

  test("sampledQuantiles: exact when the sample is the corpus (rate 1)") {
    val docsSmall = (1L to 1000L).map(i => (i, (i * 7919L) % 1000L + 1L))
      .toDF("doc_id", "n_chars")
    val out = CorpusOps.sampledQuantiles(docsSmall, Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    // n=1000 <= target -> rate 1 -> est_cutoff is the exact quantile and
    // the audit sees (floor-div ppm) zero error
    out.foreach { case (q, (cutoff, errPpm)) =>
      val sortedVals = docsSmall.orderBy("n_chars", "doc_id").select("n_chars").as[Long].collect()
      assert(cutoff == sortedVals(math.ceil(q * 1000).toInt - 1), s"q=$q")
      assert(errPpm <= 1000L, s"q=$q err=$errPpm") // div flooring only
    }
  }

  test("sampledQuantiles: sampled estimate stays within ~4/sqrt(target) rank error") {
    val target = 256L
    val docsBig = (1L to 20000L).map(i => (i, (i * 104729L) % 5000L + 1L))
      .toDF("doc_id", "n_chars")
    val out = CorpusOps.sampledQuantiles(docsBig, Seq(0.25, 0.5, 0.9), target = target)
      .collect()
    assert(out.length == 3)
    // rank error ~ sqrt(q(1-q)/s) <= 0.5/sqrt(s); assert an 8-sigma bound
    // so the deterministic fixture never flakes
    val bound = (4.0 / math.sqrt(target.toDouble) * 1e6).toLong
    out.foreach { r =>
      assert(r.getLong(3) < bound, s"q=${r.getDouble(0)} err_ppm=${r.getLong(3)} bound=$bound")
    }
  }

  test("sampledQuantiles: footer-hint and counted paths agree") {
    val docsSmall = (1L to 5000L).map(i => (i, (i * 31L) % 700L + 1L))
      .toDF("doc_id", "n_chars")
    val counted = CorpusOps.sampledQuantiles(docsSmall).collect().toSet
    val hinted = CorpusOps.sampledQuantiles(docsSmall, nHint = 5000L).collect().toSet
    assert(counted == hinted)
  }
}
