package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** State of a KMV sketch: the ≤ k smallest DISTINCT hash values seen,
  * sorted ascending. */
final case class KmvState(values: Array[Long])

/** K-minimum-values distinct-count sketch as a typed [[Aggregator]] — the
  * "sketch aggregate" slot of the operator library (SURVEY.md §7 step 7).
  *
  * Estimator: hashes are ~uniform on [0, P); the k-th smallest distinct
  * hash h_k estimates the distinct count as (k-1) · P / h_k. Below k
  * distinct values the sketch IS the distinct set, so the count is exact.
  *
  * Two properties drive the design:
  *  - **Bounded state**: the aggregation buffer is ≤ k longs regardless of
  *    group size — a billion-row group costs the same 8k bytes of state as
  *    a thousand-row group, and partial aggregation ships sketches, not
  *    rows, through the exchange.
  *  - **Deterministic, hence oracle-checkable**: unlike HLL (whose
  *    estimate depends on engine-specific hashing), KMV over the library's
  *    polynomial hash is a pure function of the input SET — merge order,
  *    partitioning, and retries cannot change it, and DuckDB reproduces it
  *    exactly (`v_kmv` CORRECTNESS row).
  */
final class KmvDistinct(k: Int) extends Aggregator[Long, KmvState, Double] {
  require(k >= 2, "k must be >= 2")

  override def zero: KmvState = KmvState(Array.empty)

  override def reduce(s: KmvState, v: Long): KmvState = {
    val a = s.values
    val pos = java.util.Arrays.binarySearch(a, v)
    if (pos >= 0) s // already present
    else {
      val ins = -pos - 1
      if (a.length < k) {
        val out = new Array[Long](a.length + 1)
        System.arraycopy(a, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(a, ins, out, ins + 1, a.length - ins)
        KmvState(out)
      } else if (ins < k) {
        val out = new Array[Long](k)
        System.arraycopy(a, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(a, ins, out, ins + 1, k - ins - 1)
        KmvState(out)
      } else s // v larger than the current k-th minimum
    }
  }

  override def merge(a: KmvState, b: KmvState): KmvState =
    KmvState((a.values ++ b.values).distinct.sorted.take(k))

  override def finish(s: KmvState): Double =
    if (s.values.length < k) s.values.length.toDouble
    else {
      // (k-1) * P as one exactly-representable constant, so the DuckDB
      // oracle can spell the identical double expression. Raw IEEE result;
      // callers round(…, 6) in BOTH dialects (rounding modes differ between
      // engines, identical raw division does not).
      (k - 1).toDouble * HashKernels.P.toDouble / s.values(k - 1)
    }

  override def bufferEncoder: Encoder[KmvState] = Encoders.product[KmvState]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** [[KmvDistinct]] with the sketch STATE as the output (sorted ≤ k
  * smallest distinct hashes) instead of the finished estimate — the form
  * incremental statistics need: two KMV states over disjoint (or even
  * overlapping) inputs merge by `distinct ∪ → sort → take k`, and the
  * merged state is EXACTLY the state a direct pass over the union would
  * produce (KMV is a pure set function). That identity is what lets
  * `TableStats.mergeStats` fold a new batch's stats into a standing
  * table's without rescanning the table ([[graft.sources.TableStats]]). */
final class KmvSketch(k: Int) extends Aggregator[Long, KmvState, Seq[Long]] {
  private val inner = new KmvDistinct(k)
  override def zero: KmvState = inner.zero
  override def reduce(s: KmvState, v: Long): KmvState = inner.reduce(s, v)
  override def merge(a: KmvState, b: KmvState): KmvState = inner.merge(a, b)
  override def finish(s: KmvState): Seq[Long] = s.values.toSeq
  override def bufferEncoder: Encoder[KmvState] = Encoders.product[KmvState]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
