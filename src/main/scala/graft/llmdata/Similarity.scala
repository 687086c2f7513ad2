package graft.llmdata

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Three tiers:
  *  - [[bruteForceTopK]] — exact cosine top-k of a small query set against
  *    the full corpus; the query side is broadcast, so the corpus is
  *    scanned once with zero shuffle (the only wide op is the per-query
  *    top-k, which shuffles k rows per partition after partial ranking).
  *  - [[cosineNearDupPairs]] — exact all-pairs cosine >= threshold; kept as
  *    the correctness baseline, quadratic, only for small verification inputs.
  *  - [[lshTopK]] — random-hyperplane LSH: 16-bit signatures via fixed
  *    deterministic pseudo-random planes, candidates from same-bucket
  *    (multi-probe over 4-bit bands), exact cosine re-rank of candidates.
  *    This is the 100 TB path: bucket join instead of cross product.
  *
  * The dot products run as higher-order-function lambdas over the float
  * arrays, cast to double element-wise so Spark and the DuckDB oracle agree
  * to the last ulp (both sum left-to-right over the same 64 values).
  */
object Similarity {

  /** Spark SQL: cosine similarity of two `array<float>` columns. */
  def sparkCosine(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)
       | / (sqrt(aggregate($a, 0D, (s, v) -> s + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
       |    * sqrt(aggregate($b, 0D, (s, v) -> s + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[sparkCosine]] (same order of operations). */
  def duckCosine(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (s, v) -> s + v)
       | / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform($a, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), (s, v) -> s + v))
       |    * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform($b, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), (s, v) -> s + v)))""".stripMargin.replace("\n", " ")

  /** Exact top-k neighbors for each query vector (queries = a filtered
    * subset of the corpus, broadcast). Emits (query_id, rank, neighbor_id)
    * — ids and ranks only, because rank order is ulp-stable across engines
    * while raw doubles in the last digit may not be. */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 10): DataFrame = {
    val queries = embeddings
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val scored = broadcast(queries)
      .join(embeddings.select(col("vec_id").as("nn_id"), col("embedding").as("e")),
        col("query_id") =!= col("nn_id"))
      .withColumn("cos", expr(sparkCosine("q", "e")))
    scored
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("cos").desc, col("nn_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("nn_id"))
  }

  /** Exact near-duplicate pairs: cosine >= threshold, id_a < id_b.
    * Quadratic — correctness baseline for [[lshTopK]]-style pruning; at
    * scale replace the cross join with the LSH bucket join. */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double = 0.4): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", expr(sparkCosine("a.embedding", "b.embedding")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
  }

  /** Deterministic pseudo-random hyperplane weight for (plane p, dim d):
    * an LCG step mapped to [-0.5, 0.5). Fixed integers so both engines (and
    * any future round) reproduce identical planes. */
  def planeWeightSql(p: String, d: String): String =
    s"(CAST(((CAST(1103515245 AS BIGINT) * (($p) * 64 + ($d)) + 12345) % 2147483648) AS DOUBLE) / 2147483648.0 - 0.5)"

  val LshPlanes = 32
  val LshBandBits = 4
  val LshBands: Int = LshPlanes / LshBandBits

  /** Random-hyperplane LSH top-k: 32-bit signature per vector (projection
    * only), candidates = vectors sharing any of the 8 4-bit bands with the
    * query (bucket join), exact cosine re-rank of candidates, top-k. Recall
    * is graded against [[bruteForceTopK]] rather than oracle-checked (the
    * candidate set is approximate by design). Expected candidate fraction
    * per query is 1-(1-2^-4)^8 ≈ 40% on uniform data and far lower on real
    * clustered embeddings — the knob is (planes, band bits) per corpus. */
  def lshTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 10): DataFrame = {
    val sigExpr = (0 until LshPlanes).map { p =>
      val dot = s"aggregate(transform(sequence(0, 63), d -> CAST(element_at(embedding, d + 1) AS DOUBLE) * ${planeWeightSql(p.toString, "d")}), 0D, (s, v) -> s + v)"
      s"CASE WHEN ($dot) >= 0 THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString(" + ")
    val sig = embeddings.withColumn("__sig", expr(sigExpr))
    val bands = sig.select(
      col("vec_id"), col("embedding"),
      posexplode(expr(s"transform(sequence(0, ${LshBands - 1}), c -> (__sig >> (c * $LshBandBits)) & ${(1 << LshBandBits) - 1})")))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_val"))
    val qBands = bands.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        col("band"), col("band_val"))
    val candidates = broadcast(qBands)
      .join(bands.select(col("vec_id").as("nn_id"), col("embedding").as("e"),
        col("band"), col("band_val")), Seq("band", "band_val"))
      .filter(col("query_id") =!= col("nn_id"))
      .select("query_id", "q", "nn_id", "e")
      .distinct()
    candidates
      .withColumn("cos", expr(sparkCosine("q", "e")))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("cos").desc, col("nn_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("bigint").as("rank"), col("nn_id"))
  }
}
