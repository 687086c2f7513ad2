package graft.llmdata

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic text primitives for the LLM-data operators
  * (tokenization, shingling, polynomial hashing).
  *
  * Design constraint: every dedup/fingerprint operator must be verifiable
  * against a DuckDB oracle, so the hash functions are NOT Spark's xxhash64
  * (DuckDB can't reproduce it) but an explicit polynomial rolling hash over
  * Unicode code points, `h := (h*31 + code) mod P`, P = 1e9+7 — expressible
  * as pure SQL lambdas in both engines and identical bit-for-bit. All of it
  * stays inside whole-stage codegen (higher-order functions on arrays, no
  * UDFs), so at 100 TB each hash is a per-row projection: no shuffle, no
  * driver involvement, linear scan cost.
  *
  * Reference scope note: the reference app (Marcus-Holanda777/etl-spark) has
  * no text-corpus operators; this module is the "training-data pipeline"
  * extension required by the build brief.
  */
object TextPrimitives {
  /** Modulus for all polynomial hashes (fits products in Long: a*h < 1e18). */
  val P = 1000000007L

  /** Whitespace tokens of a trimmed text column (empty tokens dropped so the
    * hash lambdas never see `''`). */
  def tokens(text: Column): Column =
    filter(split(trim(text), " +"), w => length(w) > 0)

  /** DuckDB polynomial hash of one string expression `e` — the oracle twin
    * of [[graft.functions.HashKernels.polyHash]] (fold over code points,
    * `h := (h*31 + cp) mod P`). */
  def duckPolyHash(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length($e) + 1), i -> CAST(ord($e[i]) AS BIGINT))), (h, c) -> (h * 31 + c) % $P)"

  /** Polynomial hash of each element of a string-array column, as
    * `array<bigint>` (SQL string so callers can nest it). Uses the
    * codegen'd [[graft.functions.ArrayPolyHash]] — callers must have run
    * `VectorExprs.register` on the session; semantics are identical to the
    * HOF lambda form
    * `transform(arr, w -> aggregate(transform(sequence(1, length(w)), i -> ascii(substring(w, i, 1))), 0L, (h, c) -> (h*31 + c) % P))`. */
  def sparkPolyHashArraySql(arrCol: String): String =
    s"poly_hash_array($arrCol)"

  def sparkPolyHashArray(arrCol: String): Column = expr(sparkPolyHashArraySql(arrCol))

  def duckPolyHashArray(arr: String): String =
    s"list_transform($arr, w -> ${duckPolyHash("w")})"

  /** Word k-shingles (distinct, space-joined). Documents shorter than k
    * words contribute their whole trimmed text as a single shingle so no
    * row drops out of dedup. Spark dialect, over a pre-built `words` array
    * column and the raw text column. */
  def sparkShingles(words: String, text: String, k: Int): String =
    s"""CASE WHEN size($words) >= $k
       | THEN array_distinct(transform(sequence(0, size($words) - $k), i -> concat_ws(' ', slice($words, i + 1, $k))))
       | ELSE array(trim($text)) END""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[sparkShingles]] (1-based inclusive list slices). */
  def duckShingles(words: String, text: String, k: Int): String =
    s"""CASE WHEN len($words) >= $k
       | THEN list_distinct(list_transform(range(1, len($words) - ${k - 2}), i -> array_to_string($words[i:i + ${k - 1}], ' ')))
       | ELSE [trim($text)] END""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[tokens]] (whitespace token array, empties dropped). */
  def duckWords(text: String): String =
    s"list_filter(string_split_regex(trim($text), ' +'), w -> length(w) > 0)"

  /** Word n-grams WITH duplicates (order-preserving) — the multiset the
    * repetition signals need ([[TextAnalysis.repetition]]); [[sparkShingles]]
    * is the distinct-set variant used by dedup. Same short-doc fallback. */
  def sparkNgrams(words: String, text: String, n: Int): String =
    s"""CASE WHEN size($words) >= $n
       | THEN transform(sequence(0, size($words) - $n), i -> concat_ws(' ', slice($words, i + 1, $n)))
       | ELSE array(trim($text)) END""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[sparkNgrams]]. */
  def duckNgrams(words: String, text: String, n: Int): String =
    s"""CASE WHEN len($words) >= $n
       | THEN list_transform(range(1, len($words) - ${n - 2}), i -> array_to_string($words[i:i + ${n - 1}], ' '))
       | ELSE [trim($text)] END""".stripMargin.replace("\n", " ")
}
