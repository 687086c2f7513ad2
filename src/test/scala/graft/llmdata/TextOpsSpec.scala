package graft.llmdata

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 text operators: repetition signals, PII scrub, vocabulary,
  * chunking. */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("repetition: fully repeated text scores high, unique text scores 0") {
    val in = Seq(
      (1L, "spam spam spam spam spam spam"), // 5 bigrams, 1 distinct
      (2L, "one two three four five six"),   // all bigrams distinct
      (3L, "ab"))                            // shorter than n: fallback, ratio 0
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetition(in).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L) == ((0.8, 0.75)))   // 1 - 1/5, 1 - 1/4
    assert(out(2L) == ((0.0, 0.0)))
    assert(out(3L) == ((0.0, 0.0)))
  }

  test("scrub masks emails and urls and counts them") {
    val in = Seq(
      (1L, "mail a.b+c@sub.example.com now"),
      (2L, "see https://x.org/p?q=1 and http://y.io today"),
      (3L, "nothing here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.scrub(in).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((1L, 0L, "mail <EMAIL> now")))
    assert(out(2L) == ((0L, 2L, "see <URL> and <URL> today")))
    assert(out(3L) == ((0L, 0L, "nothing here")))
  }

  test("vocabulary: tf counts occurrences, df counts documents, case-folded") {
    val in = Seq((1L, "The the cat"), (2L, "the dog"), (3L, "cat")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabulary(in).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map("the" -> ((3L, 2L)), "cat" -> ((2L, 2L)), "dog" -> ((1L, 1L))))
  }

  test("chunk: fixed token budget, last chunk short, empty doc yields one empty chunk") {
    val in = Seq(
      (1L, (1 to 35).map(i => s"w$i").mkString(" ")), // 35 tokens -> 16,16,3
      (2L, "a b"),                                    // 2 tokens -> 1 chunk
      (3L, "  "))                                     // empty -> 1 empty chunk
      .toDF("doc_id", "text")
    val rows = CorpusOps.chunk(in).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc(1L).sortBy(_._2).map(_._3).toSeq == Seq(16L, 16L, 3L))
    assert(byDoc(1L).sortBy(_._2).last._4 == "w33 w34 w35")
    assert(byDoc(2L).toSeq == Seq((2L, 0L, 2L, "a b")))
    assert(byDoc(3L).toSeq == Seq((3L, 0L, 0L, "")))
    // no token lost or duplicated across chunks
    val reassembled = byDoc(1L).sortBy(_._2).map(_._4).mkString(" ")
    assert(reassembled == (1 to 35).map(i => s"w$i").mkString(" "))
  }

  test("packedSequenceText: reassembled text carries exactly seq_tokens tokens, order-deterministic") {
    val docs = (1L to 30L).map(i => (i, (1 to 20).map(j => s"d${i}w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = CorpusOps.packedSequenceText(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3), r.getString(4)))
    out.foreach { case (_, _, seqTokens, text) =>
      val n = text.split(" +").count(_.nonEmpty)
      assert(n == seqTokens, s"text carries $n tokens, manifest says $seqTokens")
    }
    // deterministic across runs
    val again = CorpusOps.packedSequenceText(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(4))).toSet
    assert(again == out.map(r => (r._1, r._2, r._4)).toSet)
  }

  test("packChunks: contiguous shard-local sequences, bounded overflow, all chunks kept") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 40L).map(i => (i, (1 to 20).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text") // 20 tokens -> 2 chunks (16, 4) each
    val chunks = CorpusOps.chunk(docs)
    val packed = CorpusOps.packChunks(chunks, budget = 64, shards = 4)
    assert(packed.count() == chunks.count()) // every chunk assigned
    val rows = packed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getLong(4), r.getLong(5)))
    // a doc's chunks never cross shards
    assert(rows.groupBy(_._1).values.forall(_.map(_._3).distinct.size == 1))
    // offsets within a shard are strictly increasing in (doc_id, chunk_id) order
    rows.groupBy(_._3).values.foreach { shard =>
      val ordered = shard.sortBy(r => (r._1, r._2)).map(_._5)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a < b })
    }
    // seq_id = offset div budget (the packing invariant)
    assert(rows.forall { case (_, _, _, seqId, offset) => seqId == offset / 64 })
    // every sequence's total fits budget + maxTokens - 1
    val chunkTokens = chunks.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.groupBy(r => (r._3, r._4)).values.foreach { seq =>
      val total = seq.map(r => chunkTokens((r._1, r._2))).sum
      assert(total <= 64 + 16 - 1, s"sequence overflows: $total")
    }
  }

  test("tfidfTopTerms: integer score, deterministic tie-break, top-k per doc") {
    val in = Seq(
      (1L, "apple Apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry durian cherry"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(in, k = 3).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // df: apple 1, banana 2, cherry 2, durian 1; score = tf*1e6 div df
    assert(out((1L, "apple")) == ((2L, 1L, 2000000L, 1L)))   // case-folded tf=2
    assert(out((1L, "banana")) == ((1L, 2L, 500000L, 2L)))
    // doc 2: equal scores -> token asc breaks the tie
    assert(out((2L, "banana"))._4 == 1L && out((2L, "cherry"))._4 == 2L)
    // doc 3: equal scores 1000000 -> cherry before durian
    assert(out((3L, "cherry")) == ((2L, 2L, 1000000L, 1L)))
    assert(out((3L, "durian")) == ((1L, 1L, 1000000L, 2L)))
    // k truncates: k=1 keeps exactly one row per doc, the rank-1 term
    val top1 = TextAnalysis.tfidfTopTerms(in, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top1 == Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
  }

  test("tfidfTopTerms plan: partial WindowGroupLimit, terms computed once, no product join") {
    val in = (1L to 50L).map(i => (i, s"w${i % 7} w${i % 3} common"))
      .toDF("doc_id", "text")
    val df = TextAnalysis.tfidfTopTerms(in)
    val plan = df.queryExecution.executedPlan.toString
    // InferWindowGroupLimit must plant the map-side (Partial) group limit:
    // each task forwards <= k rows per doc to the rank exchange instead of
    // the full term list — the property that makes top-k-per-doc viable at
    // corpus scale. An intervening cast/projection between the rank filter
    // and the Window would silently disable it (see the operator comment).
    val wgl = plan.linesIterator.filter(_.contains("WindowGroupLimit")).toSeq
    assert(wgl.nonEmpty, s"rank filter lost its group limit:\n$plan")
    assert(wgl.exists(_.contains("Partial")),
      s"group limit is final-only (no map-side prune):\n${wgl.mkString("\n")}")
    // The (doc, term) frame feeds the df aggregate AND the score join; the
    // persist pin must make BOTH branches read the cached frame instead of
    // re-tokenizing the corpus. (Counting Generate nodes would misfire:
    // InMemoryRelation echoes its cached subtree into the plan string.)
    assert(plan.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
      s"terms frame not read from cache on both branches:\n$plan")
    // df joins on token — equi-join under any strategy, never a product
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"score join degenerated to a product:\n$plan")
  }

  test("bm25TopDocs: hand-computed integer scores, rank order, global top-k plan") {
    val in = Seq(
      (1L, "x x y"),   // dl=3
      (2L, "x z"),     // dl=2
      (3L, "w w w"))   // dl=3, no query term -> absent from output
      .toDF("doc_id", "text")
    // nd=3, tt=8, avgdl = 8 div 3 = 2; df: x=2, y=1
    // idf_ppm: x = 3e6 div 2 = 1500000, y = 3000000
    // sat_ppk(tf, dl): dl=3 -> denom 10tf+16; dl=2 -> denom 10tf+12
    //   doc1 x: 44000 div 36 = 1222 ; doc1 y: 22000 div 26 = 846
    //   doc2 x: 22000 div 22 = 1000  (tf=1, dl=avgdl -> exactly 1000)
    val out = TextAnalysis.bm25TopDocs(in, query = Seq("x", "y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 1500000L * 1222 + 3000000L * 846, 1L),
      (2L, 1500000L * 1000, 2L)))
    // the global top-k must plan as TakeOrderedAndProject (map-side partial
    // top-k: each partition forwards <= k rows), not a global sort
    val plan = TextAnalysis.bm25TopDocs(in, query = Seq("x", "y"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"global top-k lost:\n$plan")
    // the persisted (doc, term) frame must feed doc-lengths, corpus totals
    // AND the posting filter from cache, not three tokenize passes
    assert(plan.linesIterator.count(_.contains("InMemoryTableScan")) >= 3,
      s"terms frame not reused across branches:\n$plan")
  }

  test("blocklistFilter: token-exact case-folded hits, no substring matches") {
    val in = Seq(
      (1L, "clean text here"),
      (2L, "BAD word and bad again"),   // 2 hits, 1 distinct (case-folded)
      (3L, "badge is not bad-free"),    // 'badge'/'bad-free' must NOT match 'bad'
      (4L, "bad ugly"))                 // both terms
      .toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFilter(in, Seq("bad", "ugly")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) == ((0L, 0L, 1)))
    assert(out(2L) == ((2L, 1L, 0)))
    assert(out(3L) == ((0L, 0L, 1)), "substring matched — token-level contract broken")
    assert(out(4L) == ((2L, 2L, 0)))
  }

  test("canonicalize: case/accent/whitespace/control variants share one dedup key") {
    val in = Seq(
      (1L, "Café  au LAIT"),
      (2L, "cafe au lait"),        // the canonical form itself
      (3L, " CAFE   AU LAIT  "),   // case + padding + runs
      (4L, "completely different"),
      (5L, "cafe\nau\tlait"),      // newline/tab separators -> SPACES, not glue
      (6L, "cafeaulait"))          // must NOT collide with the separated form
      .toDF("doc_id", "text")
    val out = TextAnalysis.canonicalize(in).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L)._1 == "cafe au lait")
    assert(Set(1L, 2L, 3L, 5L).map(out(_)._2).size == 1, "variants must share canon_fp")
    assert(out(4L)._2 != out(1L)._2)
    assert(out(6L)._2 != out(1L)._2, "word boundaries must survive canonicalization")
    // the key plugs straight into exact dedup: the 4 variants collapse to
    // 1, leaving 3 distinct canonical texts
    val viaDedup = graft.llmdata.DocDedup.exact(
      TextAnalysis.canonicalize(in).select($"doc_id", $"canon_text".as("text")))
    assert(viaDedup.count() == 3)
  }

  test("bigramLmScore: hand-computed conditional ppm, short docs excluded") {
    val in = Seq(
      (1L, "a b a b"),   // bigrams: (a,b) x2, (b,a) x1
      (2L, "a b"),       // (a,b) x1
      (3L, "a c"),       // (a,c) x1
      (4L, "solo"))      // < 2 tokens -> excluded
      .toDF("doc_id", "text")
    // c2: (a,b)=3, (b,a)=1, (a,c)=1 ; c1: a=4, b=1
    // p_ppm: (a,b) = 3e6 div 4 = 750000; (b,a) = 1e6 div 1 = 1000000;
    //        (a,c) = 1e6 div 4 = 250000
    val out = TextAnalysis.bigramLmScore(in).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      1L -> ((3L, (2L * 750000 + 1000000) / 3)),  // 833333
      2L -> ((1L, 750000L)),
      3L -> ((1L, 250000L))))
    // typical transitions outscore rare ones: doc2 (common bigram) > doc3
    assert(out(2L)._2 > out(3L)._2)
  }

  test("bpeMerges: greedy non-overlapping merges, lexicographic ties, rounds compose") {
    val in = Seq((1L, "aaab aaab"), (2L, "aab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(in, nMerges = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    // round 1: (a,a) appears 5x (greedy counts overlaps: 'a a a' has two);
    //   the merge itself is NON-overlapping: 'a a a b' -> 'aa a b'
    // round 2: (aa,a) and (a,b) tie at 2 -> lexicographic pair order
    //   breaks to (a,b)
    // round 3: round 2's output 'ab' pairs with round 1's 'aa' -> 'aaab',
    //   proving merges compose across rounds
    assert(out.toSeq == Seq(
      (1, "a", "a", "aa", 5L),
      (2, "a", "b", "ab", 2L),
      (3, "aa", "ab", "aaab", 2L)))
    // word-internal only: a corpus of single-char words learns nothing
    val sentinel = Seq((1L, "x y z")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeMerges(sentinel, nMerges = 1).collect().isEmpty)
  }

  test("bpeApply: the learned table re-tokenizes the corpus to training's final state") {
    val in = Seq((1L, "aaab aaab"), (2L, "aab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(in, nMerges = 3)
    val vocab = TextAnalysis.bpeApply(in, merges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // after (a,a)->(a,b)->(aa,ab): 'aaab' fully merges (2 occurrences);
    // 'aab' becomes ['aa', 'b'] (its 'aa b' state never matches later pairs)
    assert(vocab == Map("aaab" -> 2L, "aa" -> 1L, "b" -> 1L))
  }

  test("rarityScore: corpus-unique tokens score 1e6, ubiquitous tokens score low") {
    val in = Seq(
      (1L, "common common xylophone"), // 2/3 common (df=3), 1/3 unique (df=1)
      (2L, "common words common"),     // all tokens corpus-frequent
      (3L, "common words again"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.rarityScore(in).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 1: (2*(1e6 div 3) + 1e6) div 3
    assert(out(1L) == (2 * 333333L + 1000000L) / 3)
    // doc 3: common df=3, words df=2, again df=1
    assert(out(3L) == (333333L + 500000L + 1000000L) / 3)
    assert(out(1L) > out(2L), "the unique-token doc must score rarer")
  }

  test("substrPairs: verbatim window shared, shifted positions count, short docs fall back") {
    val run = (1 to 25).map(i => s"tok$i").mkString(" ")
    val in = Seq(
      (1L, s"alpha $run omega"),     // the 25-token run embedded at offset 1
      (2L, s"$run completely other tail here"), // same run at offset 0
      (3L, "unrelated text entirely different"),
      (4L, "tiny dup"), (5L, "tiny dup"))       // < window: whole-doc fallback
      .toDF("doc_id", "text")
    val pairs = DocDedup.substrPairs(in, window = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 25-token shared run with window 20 -> 6 aligned window positions
    assert(pairs((1L, 2L)) == 6L)
    assert(pairs((4L, 5L)) == 1L)
    assert(pairs.size == 2, s"unexpected pairs: $pairs")
  }

  test("gopherRules: each rule trips the keep flag on its own violation") {
    val prose = ("the data be flowing to the lake of records and we know that " +
      "all engineers have worked with care ") * 3 // 57 words, all rules pass
    val in = Seq(
      (1L, prose),
      (2L, "the be to of and that have with short"), // < 50 words
      (3L, ("# # # " * 20) + prose),                  // symbol_ratio > 0.1
      (4L, (1 to 60).map(_ => "zz99...").mkString(" ")), // no stopwords, mean len ok
      (5L, (1 to 60).map(i => s"- item $i\n").mkString + "the of "), // bullets > 90% of lines? one giant line set
      (6L, ("the be to of and that have with " * 7) + (1 to 20).map(_ => "12345").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(in).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("keep") == 1)
    assert(out(2L).getAs[Int]("keep") == 0)           // word count rule
    assert(out(3L).getAs[Int]("keep") == 0)           // symbol rule
    assert(out(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(out(4L).getAs[Int]("keep") == 0)           // stopword rule
    assert(out(4L).getAs[Long]("stop_hits") == 0L)
    // doc 5: 60 bullet lines + 1 trailing text line -> bullet_ratio > 0.9
    assert(out(5L).getAs[Double]("bullet_ratio") > 0.9)
    assert(out(5L).getAs[Int]("keep") == 0)
    // doc 6: 56 prose words + 20 digit-only words -> alpha_ratio < 0.8
    assert(out(6L).getAs[Double]("alpha_ratio") < 0.8)
    assert(out(6L).getAs[Int]("keep") == 0)
    // signal sanity on the passing doc
    assert(out(1L).getAs[Long]("n_words") == 57L)
    assert(out(1L).getAs[Long]("stop_hits") >= 2L)
    assert(out(1L).getAs[Double]("bullet_ratio") == 0.0)
  }

  test("giniDiversity: exact ppm concentration, case-folded, empties dropped") {
    val docs = Seq(
      (1L, "spam spam spam spam"),      // one type: gini = 0
      (2L, "a b c d"),                  // 4 distinct: 1e6 - 1e6 div 4 = 750000
      (3L, "The the THE word"),         // case-folded: counts {the:3, word:1}
      (4L, "   "))                      // zero tokens: drops out
      .toDF("doc_id", "text")
    val out = TextAnalysis.giniDiversity(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((4L, 1L, 0L)))
    assert(out(2L) == ((4L, 4L, 750000L)))
    // {3,1}: 1e6 - (9+1)*1e6 div 16 = 1e6 - 625000 = 375000
    assert(out(3L) == ((4L, 2L, 375000L)))
  }
}
