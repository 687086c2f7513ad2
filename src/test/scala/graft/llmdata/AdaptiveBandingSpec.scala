package graft.llmdata

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the size-adaptive LSH banding and cell-count ladders (the
  * sf10-decade fix: any FIXED banding/cell config passes a constant
  * fraction of chance pairs, so its cost is Θ(N²) with a small constant —
  * measured exp 1.33 / 1.51 over sf1→sf10 before these ladders).
  *
  * The anchors below are load-bearing: the DuckDB twins derive the same
  * knobs from `count(*)` with a mirrored integer CASE ladder, so a change
  * here that isn't mirrored there breaks the oracle hash compare — and
  * the small-N anchors must keep resolving to the former fixed configs or
  * every small-corpus oracle row changes. */
class AdaptiveBandingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecs(n: Int): org.apache.spark.sql.DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(1, 64), j -> CAST(abs(hash(vec_id * 64 + j)) % 997 AS DOUBLE) / 997.0 - 0.5)")
        .as("embedding"))

  test("dupBanding anchors: former fixed 7x8 at small N, 14x12 at sf1 scale, 23x15 at sf10 scale") {
    assert(Similarity.dupBanding(200L) == (56, 8))   // sf0.01 oracle scale
    assert(Similarity.dupBanding(2048L) == (56, 8))  // last pre-rung count
    assert(Similarity.dupBanding(2049L) == (81, 9))  // first rung
    assert(Similarity.dupBanding(20000L) == (168, 12))
    assert(Similarity.dupBanding(200000L) == (345, 15))
    // third-decade rungs (sf100 rehearsal): 69x22 at 20M vectors
    assert(Similarity.dupBanding(20000000L) == (1518, 22))
    // ladder caps at 94x24 past 2^26 — past it the doc says shard or semDedup
    assert(Similarity.dupBanding(100000000L) == (2256, 24))
  }

  test("dupBanding: width is monotone in N and chance survival b*2^-r decays") {
    val ns = Seq(100L, 3000L, 30000L, 300000L, 3000000L)
    val knobs = ns.map(Similarity.dupBanding)
    assert(knobs.map(_._2) == knobs.map(_._2).sorted)
    val survival = knobs.map { case (p, r) => (p / r).toDouble * math.pow(2.0, -r) }
    assert(survival == survival.sorted.reverse, s"survival not decaying: $survival")
  }

  test("centeredDupBanding: 2 bands always, former 2x20 at small N, growing width, 2x31 cap") {
    assert(Similarity.centeredDupBanding(500L) == (40, 20))  // sf0.01 docs
    assert(Similarity.centeredDupBanding(50000L) == (52, 26))
    assert(Similarity.centeredDupBanding(500000L) == (58, 29))
    assert(Similarity.centeredDupBanding(10000000L) == (62, 31))
    Seq(100L, 10000L, 1000000L).foreach { n =>
      val (p, r) = Similarity.centeredDupBanding(n)
      assert(p == 2 * r)
    }
  }

  test("semDedupCells: former fixed 16 at small N, k grows ~sqrt(N)") {
    assert(Similarity.semDedupCells(200L) == 16)    // sf0.01
    assert(Similarity.semDedupCells(2000L) == 16)   // sf0.1
    assert(Similarity.semDedupCells(20000L) == 64)  // sf1
    assert(Similarity.semDedupCells(200000L) == 256) // sf10
    // ~sqrt scaling: 100x the rows -> ~sqrt(100)=10x cells (8..16 by rung parity)
    val ratio = Similarity.semDedupCells(200000L).toDouble / Similarity.semDedupCells(2000L)
    assert(ratio >= 8.0 && ratio <= 16.0)
  }

  test("semDedupKnobs: single-level at every published scale, hierarchical past 2^19") {
    // every scale any oracle or committed measurement runs at stays
    // single-level at the OLD cell counts — bit-identical results
    assert(Similarity.semDedupKnobs(2048L) == ((0, 16)))
    assert(Similarity.semDedupKnobs(20000L) == ((0, 64)))
    assert(Similarity.semDedupKnobs(200000L) == ((0, 256)))
    assert(Similarity.semDedupKnobs(1L << 19) == ((0, 256)))
    // past the boundary: two-level, k = kc*kf grows ~N^(2/3)
    assert(Similarity.semDedupKnobs((1L << 19) + 1) == ((128, 64)))   // k=8192
    assert(Similarity.semDedupKnobs(20000000L) == ((256, 256)))       // sf100: k=65536
    // per-row assignment work kc+kf stays ~2*sqrt(k)
    Seq(1000000L, 10000000L, 50000000L).foreach { n =>
      val (kc, kf) = Similarity.semDedupKnobs(n)
      assert(kc > 0 && kc + kf <= 4 * math.sqrt(kc.toLong * kf).toInt, s"n=$n")
    }
  }

  test("argmax assignment (keep=1) is tie-for-tie identical to the window form") {
    graft.functions.VectorExprs.register(spark)
    val n = vecs(200).withColumn("ed", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", expr("sqrt(array_dot(ed, ed))"))
    // centroids with cells 0 and 2 EXACTLY EQUAL: every row's cosine ties
    // between them, so the tie-break (lowest cell wins) decides every
    // assignment — the window form must never pick cell 2
    val cents = vecs(4)
      .withColumn("cell", col("vec_id").cast("int"))
      .withColumn("ced", expr(
        "CASE WHEN vec_id IN (0, 2) THEN transform(sequence(1, 64), j -> CAST(j AS DOUBLE)) " +
          "ELSE transform(embedding, x -> CAST(x AS DOUBLE)) END"))
      .withColumn("cnrm", expr("sqrt(array_dot(ced, ced))"))
      .select("cell", "ced", "cnrm")
    val viaWindow = n.join(broadcast(cents))
      .withColumn("ccos", expr("array_dot(ed, ced) / (nrm * cnrm)"))
      .withColumn("__r", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("ccos").desc, col("cell").asc)))
      .filter(col("__r") === 1)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaArgmax = Similarity.assignArgmax(n, cents)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaArgmax == viaWindow)
    // the tie case actually fired: some rows sit on the duplicated centroid
    assert(viaArgmax.values.exists(_ == 0) && !viaArgmax.values.exists(_ == 2))
  }

  test("collapsedNearDupPairs at cap=0 is output-identical to the direct operator") {
    graft.functions.VectorExprs.register(spark)
    // base vectors + planted identical duplicates (groups of 3)
    val base = vecs(150)
    val dups = vecs(20).withColumn("vec_id", col("vec_id") + 200L)
      .unionByName(vecs(20).withColumn("vec_id", col("vec_id") + 300L))
    val all = base.unionByName(dups)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = pairs(Similarity.lshNearDupPairs(all, threshold = 0.9,
      planes = 56, bandBits = 8))
    val collapsed = pairs(Similarity.collapsedNearDupPairs(all, threshold = 0.9,
      planes = 56, bandBits = 8))
    assert(collapsed == direct)
    assert(direct.nonEmpty)
  }

  test("bucket cap never loses identical-vector pairs (collapse finds them first)") {
    graft.functions.VectorExprs.register(spark)
    // one identical group of 50 copies — its bucket size (50) exceeds the
    // forced cap of 8, so the CAPPED banding alone would drop every pair;
    // the collapse stage must still emit all 50*49/2 of them
    val group = vecs(1).filter(col("vec_id") === 0)
      .withColumn("vec_id",
        explode(expr("transform(sequence(0, 49), i -> 1000 + CAST(i AS BIGINT))")))
    val out = Similarity.collapsedNearDupPairs(
      vecs(100).unionByName(group), threshold = 0.999,
      planes = 56, bandBits = 8, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // vec 0 plus its 50 re-keyed copies: every cross pair present
    val ids = 0L +: (1000L until 1050L).toVector
    for (a <- ids; b <- ids if a < b)
      assert(out.contains((a, b)), s"identical pair ($a,$b) lost under cap")
  }

  test("mmBucketCap: uncapped at every oracle/decade scale, 4096 past 2^21") {
    Seq(500L, 5000L, 500000L, 1L << 21).foreach(n =>
      assert(Similarity.mmBucketCap(n) == 0L, s"n=$n"))
    assert(Similarity.mmBucketCap((1L << 21) + 1) == 4096L)
    assert(Similarity.mmBucketCap(5000000L) == 4096L)
  }

  test("semDedupHier finds planted within-cell duplicates and never a fine-cell mix-up") {
    graft.functions.VectorExprs.register(spark)
    // plant exact duplicates: rows 100..109 duplicate rows 0..9
    val base = vecs(100)
    val dups = vecs(10).withColumn("vec_id", col("vec_id") + 100L)
    val removed = Similarity.semDedupHier(base.unionByName(dups),
      threshold = 0.999, kCoarse = 2, kFine = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // an exact duplicate lands in the same coarse AND fine cell as its
    // twin (identical cosines everywhere), so the higher id must be removed
    (100L to 109L).foreach(id => assert(removed.contains(id), s"dup $id kept"))
    // keepers are never removed by their own duplicate
    (0L to 9L).foreach(id => assert(!removed.contains(id), s"keeper $id removed"))
  }

  // The builder requires LITERAL offsets (the production bandsOf path
  // unrolls one call per band with constant offsets), so the specs below
  // unroll bands the same way instead of computing offsets in a lambda.
  test("hyperplane_sig_at band values equal packed-signature bit ranges (56x8)") {
    graft.functions.VectorExprs.register(spark)
    val bands = (0 until 7)
      .map(c => s"hyperplane_sig_at(ed, ${c * 8}, 8)").mkString("array(", ", ", ")")
    val packed = (0 until 7)
      .map(c => s"shiftright(hyperplane_sig(ed, 56), ${c * 8}) & 255").mkString("array(", ", ", ")")
    val n = vecs(64).withColumn("ed", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    val mismatches = n.select(expr(bands).as("bands"), expr(packed).as("packed"))
      .filter(col("bands") =!= col("packed"))
      .count()
    assert(mismatches == 0L)
  }

  test("hyperplane_sig_at reaches planes past the 63-bit packed cap") {
    graft.functions.VectorExprs.register(spark)
    // bands 20-22 at 15 bits read planes 300..344 — inexpressible as one
    // packed BIGINT
    val high = (20 to 22)
      .map(c => s"hyperplane_sig_at(ed, ${c * 15}, 15)").mkString("array(", ", ", ")")
    val distinctVals = vecs(32)
      .withColumn("ed", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .select(explode(expr(high)).as("bv"))
      .select(countDistinct(col("bv")))
      .head().getLong(0)
    // high planes must still discriminate: expect many distinct band values
    assert(distinctVals > 10L)
  }

  test("auto knobs produce the same pairs as explicitly passing dupBanding(count)") {
    val in = vecs(300)
    val auto = Similarity.lshNearDupPairs(in, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (p, r) = Similarity.dupBanding(300L)
    val explicit = Similarity.lshNearDupPairs(in, threshold = 0.2, planes = p, bandBits = r)
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1))).toSet
    assert(auto == explicit)
  }

  test("lshNearDupAgainst shares corpus-derived knobs across both sides (pairs found across the split)") {
    // 2100 corpus rows crosses the first rung (r=9) while a 50-row batch
    // alone would resolve r=8: per-side auto-knobs would band the sides
    // differently and silently find nothing. Exact duplicates of corpus
    // vectors MUST surface regardless of the resolved width.
    val corpus = vecs(2100)
    val batch = vecs(50).withColumn("vec_id", col("vec_id") + 1000000L)
    val dups = Similarity.lshNearDupAgainst(batch, corpus, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch vec i is vecs(50) row i = corpus row i duplicated exactly
    (0 until 50).foreach { i =>
      assert(dups.contains((i + 1000000L, i.toLong)), s"exact dup $i not found")
    }
  }
}
