package graft.llmdata

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LlmDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs: DataFrame = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.cache(); d
  }
  private lazy val embs: DataFrame = {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    e.cache(); e
  }

  test("exact dedup keeps one row per distinct text, min doc_id") {
    val in = Seq((1L, "a b"), (5L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val out = DocDedup.exact(in).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  test("consensusPairs classifies both / text_only / embedding_only correctly") {
    // 64-dim unit vectors: e(d) = 1.0 at dim d. Identical vectors pair
    // (cos 1), orthogonal ones never do (cos 0 < threshold).
    def e(d: Int): Seq[Double] = Seq.tabulate(64)(i => if (i == d) 1.0 else 0.0)
    val t1 = "the quick brown fox jumps over the lazy dog again today"
    val t2 = "completely different template text used twice verbatim here now"
    val t3 = "first paraphrase phrasing of some shared meaning content"
    val t4 = "unrelated second wording with disjoint vocabulary throughout entirely"
    val docsIn = Seq((1L, t1), (2L, t1), (3L, t2), (4L, t2), (5L, t3), (6L, t4))
      .toDF("doc_id", "text")
    val embsIn = Seq(
      (1L, e(0)), (2L, e(0)),   // same text, same embedding -> both
      (3L, e(1)), (4L, e(2)),   // same text, orthogonal embeddings -> text_only
      (5L, e(3)), (6L, e(3)))   // different texts, same embedding -> embedding_only
      .toDF("vec_id", "embedding")
    val out = DocDedup.consensusPairs(docsIn, embsIn).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(out == Map(
      (1L, 2L) -> "both",
      (3L, 4L) -> "text_only",
      (5L, 6L) -> "embedding_only"))
  }

  test("ngram jaccard finds identical docs with J=1 and no self/dup pairs") {
    val in = Seq((1L, "x y z w"), (2L, "x y z w"), (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val rows = DocDedup.ngramJaccardPairs(in, 3, 0.5).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1L && rows.head.getLong(1) == 2L)
    assert(rows.head.getDouble(2) == 1.0)
  }

  test("minhash-LSH candidates contain every ngram-jaccard pair at J>=0.7 (fixture)") {
    // At J>=0.7, 4 bands x 4 rows gives ~87% per-pair recall; on this
    // fixture every high-J pair must survive (checked exactly).
    val exact = DocDedup.ngramJaccardPairs(docs, 3, 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DocDedup.minhashLshPairs(docs, 3, 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall too low (exact=${exact.size}, lsh=${lsh.size})")
    assert(lsh.subsetOf(exact), "verified LSH pairs must all satisfy the exact threshold")
  }

  test("simhash identical docs collide, disjoint docs differ") {
    val in = Seq((1L, "p q r s t"), (2L, "p q r s t"), (3L, "completely other vocabulary set"))
      .toDF("doc_id", "text")
    val fp = DocDedup.simhashFingerprints(in).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("LSH top-k recall vs brute force >= 0.5 at k=10") {
    val exact = Similarity.bruteForceTopK(embs, 8, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.lshTopK(embs, 8, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // Near-random embeddings are the worst case for hyperplane LSH; the
    // bucketed candidate set still has to recover a useful fraction.
    assert(recall >= 0.5, s"LSH top-k recall $recall")
  }

  test("LSH banding knob: wider bands are strictly more selective (candidate subset)") {
    def cands(bandBits: Int) =
      Similarity.lshCandidates(embs, 8, 32, bandBits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val c4 = cands(4)
    val c8 = cands(8)
    // An 8-bit band collision at band c means bits [8c, 8c+8) agree, which
    // implies both 4-bit sub-bands collide — so the candidate set can only
    // shrink as bandBits grows.
    assert(c8.subsetOf(c4), "8-bit-band candidates must be a subset of 4-bit-band candidates")
    val perQuery = embs.count() - 1
    val frac4 = c4.size.toDouble / (8 * perQuery)
    val frac8 = c8.size.toDouble / (8 * perQuery)
    // Banding math on uniform vectors: 1-(1-2^-4)^8 ~ 40% vs 1-(1-2^-8)^4
    // ~ 1.6% — assert at least a 4x selectivity win so the knob's scale
    // claim (fewer candidates into the exact re-rank) stays measured.
    assert(frac8 < frac4 / 4, s"frac4=$frac4 frac8=$frac8")
    // and the default setting keeps its recall bar (separate test below)
  }

  test("IVF top-k shape + trained-centroid recall >= 0.75 vs brute force") {
    val out = Similarity.ivfTopK(embs, 8, 10).collect()
    assert(out.length == 80)
    assert(out.forall(r => r.getLong(0) != r.getLong(2)))
    val exact = Similarity.bruteForceTopK(embs, 8, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = out.map(r => (r.getLong(0), r.getLong(2))).toSet
    // Measured 0.8375 on this deterministic fixture (one Lloyd round,
    // 2-probe/16-cell). The pre-round-4 every-Nth-id stride centroids
    // scored 0.39 on the same fixture — the trained bar must stay far
    // above that.
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.75, s"IVF trained recall $recall")
  }

  test("int8-quantized top-k keeps recall >= 0.95 vs full precision") {
    val exact = Similarity.bruteForceTopK(embs, 8, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val quant = Similarity.quantizedTopK(embs, 8, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // Measured 0.9875 on the deterministic fixture: int8 noise flips only
    // near-tied neighbors. The bar protects the 4x-memory-savings claim
    // from a quantizer regression.
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.95, s"quantized recall $recall")
  }

  test("kmeansCentroids: iter-0 returns seeds; iter-1 is a per-cell mean") {
    val seeds = Similarity.kmeansCentroids(embs, 16, 0).collect()
    assert(seeds.length == 16)
    assert(seeds.map(_.getInt(0)).sorted.toSeq == (0 until 16))
    val trained = Similarity.kmeansCentroids(embs, 16, 1)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(trained.nonEmpty && trained.size <= 16)
    assert(trained.values.forall(_.length == 64))
    // trained centroids are interior means, not raw corpus vectors
    val raw = embs.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSet
    assert(trained.values.forall(v => !raw.contains(v.toSeq)))
  }

  test("rpTopK: k rows per query, no self, high recall on clustered data") {
    // JL projection preserves DISTANCE GAPS, so recall is meaningful on
    // clustered vectors (real embeddings), not isotropic noise where the
    // exact ranking is itself noise. 5 deterministic clusters of 8: each
    // query's true neighbors are its cluster-mates.
    def v(cluster: Int, member: Int): Array[Float] =
      Array.tabulate(64) { d =>
        val base = (((cluster * 31 + d) * 2654435761L) % 1000L) / 1000.0f - 0.5f
        base + (((member * 17 + d) % 7) - 3) * 0.004f
      }
    val in = (for (c <- 0 until 5; m <- 0 until 8)
      yield ((c * 8 + m).toLong, v(c, m))).toDF("vec_id", "embedding")
    val rp = Similarity.rpTopK(in, 4, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(rp.length == 20)
    assert(rp.forall { case (q, nn) => q != nn })
    val exact = Similarity.bruteForceTopK(in, 4, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = rp.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("centroidOutliers flags the planted outlier first, honors the ceil(frac*n) cut") {
    // 29 vectors clustered near +e1 with small wiggle, one at -e1: the
    // opposite vector must be far_rank 1; ceil(0.1 * 30) = 3 flagged.
    val in = ((0 until 29).map { i =>
      (i.toLong, "a", Array(1.0f, (i % 5) * 0.01f, 0.0f))
    } :+ ((29L, "a", Array(-1.0f, 0.0f, 0.0f)))
      :+ ((30L, "a", Array(0.0f, 0.0f, 0.0f))))  // zero-norm: no direction
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.centroidOutliers(in, frac = 0.1).collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    // ceil(0.1 * 31) = 4 by the count base, but the zero-norm vector is
    // excluded from SCORING (cosine undefined, and the engines rank NULLs
    // at opposite ends) — flag encoder failures with a nrm > 0 check, not
    // an undefined angle
    assert(!out.exists(_._1 == 30L), "zero-norm vector must not be ranked")
    assert(out.contains((29L, 1L)), s"planted outlier not rank 1: ${out.toSeq}")
    assert(out.forall(_._2 <= 4))
  }

  test("pcaProjection recovers the dominant axis: centered, proportional, run-stable") {
    // Points on the line t·(1, 2, 0) plus a tiny orthogonal wiggle — the
    // top component is (1, 2)/√5, so proj_i ≈ (t_i − mean_t)·√5.
    val ts = (0 until 40).map(_.toDouble)
    val in = ts.zipWithIndex.map { case (t, i) =>
      (i.toLong, Array(t.toFloat, (2 * t).toFloat, (if (i % 2 == 0) 0.01f else -0.01f)))
    }.toDF("vec_id", "embedding")
    val out = Similarity.pcaProjection(in).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val meanT = ts.sum / ts.length
    val expected = ts.zipWithIndex.map { case (t, i) =>
      i.toLong -> (t - meanT) * math.sqrt(5.0)
    }.toMap
    // sign is deterministic but init-dependent; compare up to a global sign
    val sign = math.signum(out(39L)) * math.signum(expected(39L))
    expected.foreach { case (id, e) =>
      assert(math.abs(sign * out(id) - e) < 1e-2, s"vec $id: ${out(id)} vs $e")
    }
    assert(math.abs(out.values.sum) < 1e-3, "projections must be mean-centered")
    // bit-stable: a second run returns the identical doubles
    val again = Similarity.pcaProjection(in).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == out)
  }

  test("hardNegatives is exactly the (skip, skip+take] slice of the full ranking") {
    // The band must agree with a deeper top-k's ranks — same ordering, the
    // top `skip` presumed-positives removed, absolute ranks preserved.
    val deep = Similarity.bruteForceTopK(embs, 4, 15)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val band = Similarity.hardNegatives(embs, 4, skip = 5, take = 10).collect()
    assert(band.length == 40)
    assert(band.forall(r => r.getLong(1) > 5 && r.getLong(1) <= 15))
    assert(band.forall(r => deep((r.getLong(0), r.getLong(1))) == r.getLong(2)))
    // the lower-bound conjunct must not cost the map-side partial top-k
    val plan = Similarity.hardNegatives(embs, 4, skip = 5, take = 10)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("WindowGroupLimit") && l.contains("Partial")),
      s"rank band lost its map-side group limit:\n$plan")
  }

  test("brute-force top-k is symmetric-safe: k rows per query, no self") {
    val rows = Similarity.bruteForceTopK(embs, 4, 5).collect()
    assert(rows.length == 20)
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    val ranks = rows.groupBy(_.getLong(0)).values.map(_.map(_.getLong(1)).sorted.toSeq)
    assert(ranks.forall(_ == Seq(1L, 2L, 3L, 4L, 5L)))
  }

  test("langId picks declared-order language on ties and und on no signal") {
    val in = Seq((1L, "the der xyzzy", "en"), (2L, "qqq www eee", "zh")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langId(in).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "en") // en ties de at 1 hit; declared order wins
    assert(out(2L) == "und")
  }

  test("fingerprint is order-sensitive and whitespace-insensitive") {
    val in = Seq((1L, "a b c"), (2L, "c b a"), (3L, "  a  b   c ")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(in).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) != fp(2L))
    assert(fp(1L) == fp(3L))
  }

  test("multimodal decode plumbing: schema, determinism, frame sampling shape") {
    val meta = Multimodal.decodeMeta(spark, docs).toDF()
    assert(meta.columns.toSeq ==
      Seq("doc_id", "media_type", "byte_len", "width", "height", "channels", "checksum"))
    val m = meta.filter(col("doc_id") === 0).head()
    val n = m.getAs[Long]("byte_len")
    assert(m.getAs[Long]("width") == 1L + n % 640L)
    assert(m.getAs[Long]("checksum") == (n * 2654435761L) % 4294967296L)
    val frames = Multimodal.sampleFrames(spark, docs, 64)
    val f0 = frames.filter(col("doc_id") === 0).count()
    assert(f0 == (n - 1) / 64 + 1)
  }
}
