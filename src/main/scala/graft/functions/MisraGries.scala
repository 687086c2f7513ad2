package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** State of a Misra-Gries summary: ≤ k (token, count) pairs as parallel
  * arrays (Encoders.product serializes both). */
final case class MgState(keys: Array[String], counts: Array[Long])

/** Misra-Gries heavy-hitters summary (Misra & Gries 1982; mergeable form
  * per Agarwal et al., PODS 2012 "Mergeable summaries") as a typed
  * [[Aggregator]] — the FREQUENT-ITEMS slot of the sketch family, beside
  * [[KmvDistinct]] (cardinality) and the count-min sketch (point
  * frequency, `v_cms`).
  *
  * Invariant: for every item x, `trueCount(x) − summaryCount(x) ≤ N/k`
  * (N = stream length). Hence every item with `trueCount > N/k` is
  * PRESENT in the summary — the no-false-negative guarantee the
  * candidate-then-exact-verify pipeline builds on. The merge keeps the
  * invariant under arbitrary merge trees (sum counts, then subtract the
  * (k+1)-th largest and drop non-positives), so partial aggregation
  * ships ≤ k pairs per partition through the exchange, never rows.
  *
  * The summary CONTENTS (survivor set, residual counts) depend on
  * arrival/merge order — unlike KMV this is not a pure set function.
  * That is why [[graft.llmdata.TextAnalysis.heavyHitters]] never emits
  * the summary itself: candidates are re-counted exactly and gated on
  * `count·k > N`, making the operator's OUTPUT order- and
  * partitioning-invariant even though the sketch is not. */
final class MisraGries(k: Int) extends Aggregator[String, MgState, Array[String]] {
  require(k >= 1, "k must be >= 1")

  override def zero: MgState = MgState(Array.empty, Array.empty)

  override def reduce(s: MgState, tok: String): MgState = {
    // NULL values are not occurrences: skip them so a multi-column
    // sketch pass ([[graft.sources.TableStats.heavyKeysMulti]], which
    // cannot pre-filter rows per column) sees exactly the per-column
    // non-null sequence the single-column path's isNotNull filter fed —
    // tracking nulls would both pollute the candidate slots and charge
    // the N/k error bound for a mass the exact-verify total excludes.
    if (tok == null) return s
    val i = s.keys.indexOf(tok)
    if (i >= 0) {
      s.counts(i) += 1 // in-place: Spark owns the buffer between rows
      s
    } else if (s.keys.length < k) {
      MgState(s.keys :+ tok, s.counts :+ 1L)
    } else {
      // Decrement-all step: every tracked count pays for the untracked
      // arrival; zeros vacate their slot.
      var j = 0
      var zeros = 0
      while (j < k) { s.counts(j) -= 1; if (s.counts(j) == 0) zeros += 1; j += 1 }
      if (zeros == 0) s
      else {
        val kk = new Array[String](k - zeros)
        val cc = new Array[Long](k - zeros)
        var o = 0
        j = 0
        while (j < k) {
          if (s.counts(j) > 0) { kk(o) = s.keys(j); cc(o) = s.counts(j); o += 1 }
          j += 1
        }
        MgState(kk, cc)
      }
    }
  }

  override def merge(a: MgState, b: MgState): MgState = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var j = 0
    while (j < a.keys.length) { m.update(a.keys(j), a.counts(j)); j += 1 }
    j = 0
    while (j < b.keys.length) {
      m.update(b.keys(j), m.getOrElse(b.keys(j), 0L) + b.counts(j)); j += 1
    }
    if (m.size <= k) MgState(m.keys.toArray, m.values.toArray)
    else {
      // Subtract the (k+1)-th largest count from everything, keep > 0 —
      // the Agarwal et al. merge that preserves the N/k error bound.
      val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val kept = m.iterator.map { case (t, c) => (t, c - cut) }.filter(_._2 > 0).toArray
      MgState(kept.map(_._1), kept.map(_._2))
    }
  }

  /** Candidate tokens only (sorted for a stable dump); residual counts are
    * order-dependent noise no caller should read. */
  override def finish(s: MgState): Array[String] = s.keys.sorted

  override def bufferEncoder: Encoder[MgState] = Encoders.product[MgState]
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
