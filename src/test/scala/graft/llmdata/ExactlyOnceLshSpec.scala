package graft.llmdata

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for round 10's exactly-once LSH candidate emission: a pair
  * sharing k bands is kept only in the FIRST shared band (a pure
  * predicate over the rows' earlier-band prefixes — the
  * `intervalOverlap` idiom), replacing the candidate-wide `distinct()`
  * whose hash-aggregate state was the sf100-measured ~50 GB spill.
  * Two properties must hold forever:
  *
  *   1. the candidate stream is distinct BY CONSTRUCTION — identical
  *      vectors collide in EVERY band and must still emit one row per
  *      pair;
  *   2. under the hot-bucket cap, a dropped bucket stops counting as an
  *      "earlier shared band": a pair whose FIRST collision sat in a
  *      dropped bucket must still surface through a later surviving
  *      band (the old distinct-based path kept it; a naive first-match
  *      predicate over the raw signatures would silently lose it).
  */
class ExactlyOnceLshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecs(n: Int): org.apache.spark.sql.DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(1, 64), j -> CAST(abs(hash(vec_id * 64 + j)) % 997 AS DOUBLE) / 997.0 - 0.5)")
        .as("embedding"))

  test("identical vectors (colliding in every band) emit each pair exactly once") {
    graft.functions.VectorExprs.register(spark)
    // 10 identical copies of one vector + 30 distinct decoys: every
    // identical pair collides in all 7 bands of 56x8; the candidate
    // frame must carry it once, not 7 times.
    val group = vecs(1).filter(col("vec_id") === 0)
      .withColumn("vec_id",
        explode(expr("transform(sequence(0, 9), i -> 1000 + CAST(i AS BIGINT))")))
    val all = vecs(30).unionByName(group)
    val cands = Similarity.lshPairCandidates(all, planes = 56, bandBits = 8)
    val rows = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(rows.size == rows.toSet.size,
      s"candidate stream carries duplicate pairs: ${rows.size} rows, ${rows.toSet.size} distinct")
    val ids = (1000L until 1010L).toVector
    for (a <- ids; b <- ids if a < b)
      assert(rows.contains((a, b)), s"identical pair ($a,$b) missing")
    assert(rows.count { case (a, b) => ids.contains(a) && ids.contains(b) } == 45)
  }

  test("cross-set candidates (lshNearDupAgainst) are exactly-once too") {
    graft.functions.VectorExprs.register(spark)
    // batch = exact copies of corpus rows 0..4 — each (new, old) pair
    // collides in every band; output must carry it once.
    val corpus = vecs(40)
    val batch = vecs(5).withColumn("vec_id", col("vec_id") + 500L)
    val out = Similarity.lshNearDupAgainst(batch, corpus, threshold = 0.999,
      planes = 56, bandBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(out.size == out.toSet.size, "duplicate (new, old) rows")
    (0L until 5L).foreach(i =>
      assert(out.contains((i + 500L, i)), s"copy pair (${i + 500L},$i) missing"))
  }

  test("pair first colliding in a dropped hot bucket survives via a later band") {
    graft.functions.VectorExprs.register(spark)
    // Plant geometry in the first two dims (the rest zero): a vector at
    // angle t signs plane p by cos(t)*w(p,0) + sin(t)*w(p,1), so the
    // 16-plane sign pattern is a function of the angle alone and we can
    // steer band membership exactly. Find a band-0 pattern A that splits
    // into two band-1 patterns B1 != B2 somewhere on the circle.
    def pattern(theta: Double): (Int, Int) = {
      val bits = (0 until 16).map { p =>
        val v = math.cos(theta) * Similarity.planeWeight(p, 0) +
          math.sin(theta) * Similarity.planeWeight(p, 1)
        if (v > 0) 1 else 0
      }
      (bits.take(8).zipWithIndex.map { case (b, i) => b << i }.sum,
        bits.drop(8).zipWithIndex.map { case (b, i) => b << i }.sum)
    }
    val byAngle = (0 until 4096).map(i => i -> pattern(2 * math.Pi * i / 4096))
    val split = byAngle.groupBy(_._2._1).collectFirst {
      case (_, members) if members.map(_._2._2).distinct.size >= 2 =>
        val byB1 = members.groupBy(_._2._2).toSeq.sortBy(_._1)
        (byB1(0)._2.head._1, byB1(1)._2.head._1) // one angle index per band-1 group
    }
    assert(split.nonEmpty, "no band-0 pattern splits across band-1 patterns (plane table changed?)")
    val (angPair, angHot) = split.get
    def vecAt(i: Int, id: Long, scale: Double) = {
      val t = 2 * math.Pi * i / 4096
      (id, Array.tabulate(64)(d =>
        if (d == 0) scale * math.cos(t) else if (d == 1) scale * math.sin(t) else 0.0))
    }
    // u, v: same arc (share band 0 AND band 1), colinear so cos = 1.
    // Hot six: same band-0 bucket as u/v, DIFFERENT band-1 bucket.
    val rows = Seq(vecAt(angPair, 1L, 1.0), vecAt(angPair, 2L, 1.1)) ++
      (0 until 6).map(j => vecAt(angHot, 10L + j, 1.0 + j * 0.05))
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding")
    // Band-0 bucket has 8 members > cap 6 -> dropped; u/v's band-1
    // bucket (2 members) survives. The pair's FIRST shared band is the
    // dropped one: the masked rebuild must re-emit it at band 1.
    val out = Similarity.lshNearDupPairs(df, threshold = 0.9,
      planes = 16, bandBits = 8, maxBucket = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)),
      "pair lost: dropped hot bucket still counted as an earlier shared band")
    // and with no cap the same pair is of course present, exactly once
    val uncapped = Similarity.lshNearDupPairs(df, threshold = 0.9,
      planes = 16, bandBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
    assert(uncapped.count(_ == (1L, 2L)) == 1)
  }

  test("grid-blocked verify is output-identical to the two-join verify (within- and cross-set)") {
    graft.functions.VectorExprs.register(spark)
    // planted identical dups guarantee a nonempty surviving set; pinned
    // knobs make the candidate set identical across both calls, so any
    // difference is the verify shape. nHint > GridVerifyMinN forces the
    // grid path without needing 500k real vectors.
    val group = vecs(3).withColumn("vec_id", col("vec_id") + 700L)
    val all = vecs(120).unionByName(group)
    def pairsOf(hint: Long) = Similarity.lshNearDupPairs(all, threshold = 0.9,
      planes = 56, bandBits = 8, nHint = hint)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaJoin = pairsOf(0L)
    val viaGrid = pairsOf(Similarity.GridVerifyMinN + 1)
    assert(viaGrid == viaJoin)
    assert(viaJoin.nonEmpty)
    // cross-set: batch copies of corpus rows, same equivalence
    val corpus = vecs(100)
    val batch = vecs(6).withColumn("vec_id", col("vec_id") + 900L)
    def crossOf(hint: Long) = Similarity.lshNearDupAgainst(batch, corpus,
      threshold = 0.999, planes = 56, bandBits = 8, corpusNHint = hint)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cJoin = crossOf(0L)
    val cGrid = crossOf(Similarity.GridVerifyMinN + 1)
    assert(cGrid == cJoin)
    assert(cJoin.nonEmpty)
  }

  test("zero-norm pairs (undefined cosine) are DROPPED, identically on both sides of the grid switch") {
    graft.functions.VectorExprs.register(spark)
    // Two all-zero vectors: identical signatures (they collide in every
    // band, so they ARE a candidate pair) but cos = 0/0 — undefined.
    // Spark SQL's non-ANSI division gives NULL, so the join form's
    // `cos >= t` drops the pair; the grid's JVM division gives NaN and
    // `NaN >= t` is the same drop verdict. This pins the library-wide
    // convention (assignArgmax: undefined cosine loses) across the
    // GridVerifyMinN auto-switch. Note the DuckDB dialect would say
    // EMIT here (IEEE 0/0 = NaN, which DuckDB orders above every
    // double) — zero-norm vectors are excluded from every oracle
    // fixture precisely because the engines' division semantics
    // diverge on them; this spec is the Spark-side contract.
    val zeros = spark.range(2).select((col("id") + 800L).as("vec_id"),
      expr("transform(sequence(1, 64), j -> CAST(0.0 AS DOUBLE))").as("embedding"))
    val all = vecs(50).unionByName(zeros)
    def pairsOf(hint: Long) = Similarity.lshNearDupPairs(all, threshold = 0.9,
      planes = 56, bandBits = 8, nHint = hint)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaJoin = pairsOf(0L)
    val viaGrid = pairsOf(Similarity.GridVerifyMinN + 1)
    assert(!viaJoin.contains((800L, 801L)), "zero-norm pair must be dropped (undefined cosine)")
    assert(viaGrid == viaJoin)
  }
}
