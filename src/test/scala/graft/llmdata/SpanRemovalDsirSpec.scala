package graft.llmdata

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 operators: corpus-wide duplicated-span removal (the rewrite
  * half of ExactSubstr) and DSIR-style hashed-feature importance scoring. */
class SpanRemovalDsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("removeDuplicateSpans: shared run removed from every carrier, rest intact") {
    val in = Seq(
      (1L, "a b c d e f"),   // shares "a b c" with doc 2 (its positions 1-3)
      (2L, "x y a b c z"),   // same run at positions 3-5
      (5L, "p q r s"))       // no duplicated window anywhere
      .toDF("doc_id", "text")
    val out = DocDedup.removeDuplicateSpans(in, window = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((6L, 3L, "d e f")))
    assert(out(2L) == ((6L, 3L, "x y z")))
    assert(out(5L) == ((4L, 0L, "p q r s")))
  }

  test("removeDuplicateSpans: short exact dups removed in full via the fallback window") {
    val in = Seq((3L, "k l"), (4L, "k l"), (5L, "k m"))
      .toDF("doc_id", "text")
    val out = DocDedup.removeDuplicateSpans(in, window = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(3L) == ((2L, "")))
    assert(out(4L) == ((2L, "")))
    assert(out(5L) == ((0L, "k m")))
  }

  test("removeDuplicateSpans: intra-document repetition counts as duplication") {
    // "m n o" occurs at positions 1, 4, and 7; the overlapping windows
    // (n o m), (o m n) repeat too, so every position is covered.
    val in = Seq((6L, "m n o m n o m n o"), (7L, "u v w")).toDF("doc_id", "text")
    val out = DocDedup.removeDuplicateSpans(in, window = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(6L) == ((9L, 9L, "")))
    assert(out(7L) == ((3L, 0L, "u v w")))
  }

  test("importanceScore: target-vocabulary docs score above, keep splits on the corpus mean") {
    val in = Seq(
      (1L, "en", "alpha beta alpha"),
      (2L, "en", "beta alpha beta"),
      (3L, "de", "gamma delta gamma"),
      (4L, "de", "delta gamma delta"))
      .toDF("doc_id", "lang", "text")
    val out = CorpusOps.importanceScore(in).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out.values.forall(_._1 == 3L)) // n_tokens exact
    // Target (en) docs share no vocabulary with the raw-only (de) docs, so
    // their features are strictly more target-like.
    assert(out(1L)._2 > out(3L)._2)
    assert(out(2L)._2 > out(4L)._2)
    assert(out(1L)._3 == 1 && out(2L)._3 == 1)
    assert(out(3L)._3 == 0 && out(4L)._3 == 0)
  }

  test("removeDuplicateSpans: zero-token docs share the empty fallback window but nothing is removed") {
    // Two all-whitespace docs both hash the empty token stream to the same
    // fallback window (so it counts as duplicated), but the effective
    // width is 0 — no position is covered, and both engines emit ''.
    val in = Seq((1L, "   "), (2L, "a b c d"), (3L, " ")).toDF("doc_id", "text")
    val out = DocDedup.removeDuplicateSpans(in, window = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((0L, 0L, "")))
    assert(out(2L) == ((4L, 0L, "a b c d")))
    assert(out(3L) == ((0L, 0L, "")))
  }

  test("bpeFertility: merged-away words compress, others stay at chars-per-char") {
    // "ab" repeated dominates pair counts, so training merges a+b first;
    // every "ab" then costs 1 BPE token for 2 chars (2e6 ppt), while "cd"
    // only benefits from later merges if trained — with 1 merge round it
    // stays 2 tokens for 2 chars (1e6 ppt).
    val in = Seq(
      (1L, "ab ab ab ab"),
      (2L, "cd cd cd"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(in, nMerges = 1)
    val f = TextAnalysis.bpeFertility(in, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(f(1L) == ((4L, 2000000L)))  // 4 single-token words, 8 chars
    assert(f(2L) == ((6L, 1000000L)))  // 2 tokens per word, 6 chars
  }

  test("cmsTermEstimates: estimates are exact without collisions and never undercount") {
    val in = Seq(
      (1L, "x x x y"),
      (2L, "y z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.cmsTermEstimates(in).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("x")._2 == 3L && out("y")._2 == 2L && out("z")._2 == 1L)
    assert(out.values.forall { case (est, exact, over) => est >= exact && over == est - exact })
    // 3 tokens into 4x256 counters: no collisions, estimates exact.
    assert(out.values.forall { case (est, exact, _) => est == exact })
  }

  test("importanceScore is deterministic across runs") {
    val in = Seq(
      (1L, "en", "alpha beta gamma"),
      (2L, "fr", "delta epsilon zeta"),
      (3L, "en", "alpha alpha beta"))
      .toDF("doc_id", "lang", "text")
    def run() = CorpusOps.importanceScore(in).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sortBy(_._1).toSeq
    assert(run() == run())
  }
}
