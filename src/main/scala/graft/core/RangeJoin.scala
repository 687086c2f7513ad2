package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — Spark's built-in planner turns
  * `p.ts BETWEEN w.start AND w.end` into a broadcast nested loop (or a
  * cartesian when neither side fits a broadcast): every point × every
  * interval. This operator makes it an equi-join by time-bucketizing:
  * intervals are replicated into each coarse bucket they overlap, points
  * join their single bucket, and the exact predicate filters the bucket-
  * local candidates.
  *
  * Cost: shuffle keyed on (keys, bucket); interval replication factor =
  * span / bucketSeconds + 1 (pick the bucket near the TYPICAL interval
  * span); candidate pairs are bucket-local instead of global. Each
  * matching (point, interval) pair is emitted exactly once — a point owns
  * exactly one bucket, so no dedup pass is needed.
  */
object RangeJoin {

  /** Epoch-second bucket of a timestamp column (UTC-pinned sessions make
    * NTZ↔instant unambiguous). */
  private def bucket(c: Column, bucketSeconds: Long): Column =
    floor(c.cast("timestamp").cast("double") / bucketSeconds).cast("bigint")

  /** Inner point-in-interval join: rows of `points` paired with every row
    * of `intervals` (same `keys`) whose [startCol, endCol) half-open range
    * contains pointTs. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTs: String, startCol: String, endCol: String,
                      bucketSeconds: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketSeconds > 0)
    val overlap = points.columns.intersect(intervals.columns).filterNot(keys.contains)
    require(overlap.isEmpty,
      s"points and intervals share non-key columns ${overlap.mkString(", ")} — " +
        "the post-join predicate would be ambiguous; rename one side")
    val b = Iterator.from(0).map(i => s"__graft_bucket$i")
      .find(n => !points.columns.contains(n) && !intervals.columns.contains(n)).get
    val ptsB = points.withColumn(b, bucket(col(pointTs), bucketSeconds))
    // Degenerate intervals (end <= start) contain no point under half-open
    // semantics — drop them BEFORE the explode: sequence() would otherwise
    // happily emit a DESCENDING bucket range for them.
    val ivB = intervals
      .where(col(endCol) > col(startCol))
      .withColumn(b, explode(sequence(
        bucket(col(startCol), bucketSeconds), bucket(col(endCol), bucketSeconds))))
    ptsB.join(ivB, keys :+ b)
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop(b)
  }

  /** Inner band join: pairs of (left, right) rows with equal `keys` whose
    * integer-valued columns differ by at most `eps` — `|lVal − rVal| <= eps`
    * (DeWitt et al. 1991's band join; the value-distance sibling of the
    * temporal joins above). Spark's planner sees only a non-equi predicate
    * and falls back to a broadcast nested loop or a cartesian; this makes
    * it an equi-join on a value bucket of width `eps`.
    *
    * Bucketization: the LEFT row sits in its single bucket
    * `floor(lVal / eps)`; the RIGHT row is replicated into that bucket and
    * both neighbors — any pair within `eps` has bucket distance <= 1, so
    * candidates are bucket-local and no pair can be missed. Exactly-once
    * emission is structural: left owns ONE bucket and right's three
    * replicas land in three DISTINCT buckets, so a given (left, right)
    * pair can meet in at most one. Cost: one shuffle keyed on
    * (keys, bucket), right side ×3 replication, candidate volume =
    * per-bucket products instead of |L|×|R|.
    *
    * Values must be integral (cents, not dollars): float bucket edges
    * would disagree across engines at the ulp and `floor` on a binary
    * fraction is exactly the boundary case an oracle diff can't forgive.
    */
  def bandJoin(left: DataFrame, right: DataFrame,
               lVal: String, rVal: String, eps: Long,
               keys: Seq[String] = Nil): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    val overlap = left.columns.intersect(right.columns).filterNot(keys.contains)
    require(overlap.isEmpty,
      s"left and right share non-key columns ${overlap.mkString(", ")} — " +
        "the band predicate would be ambiguous; rename one side")
    val b = Iterator.from(0).map(i => s"__graft_bucket$i")
      .find(n => !left.columns.contains(n) && !right.columns.contains(n)).get
    // Integer floor-div with correct negative handling, in INTEGER
    // arithmetic end to end: subtract the positive remainder
    // (((v % eps) + eps) % eps) so the numerator is an exact multiple of
    // eps, then integral `div` (exact on a multiple — no rounding mode in
    // play). The Column `/` operator would divide as DOUBLE, which loses
    // exactness past 2^53 — an epoch-nanos band join would misplace
    // buckets by ±1 and silently drop matching pairs.
    def bkt(vc: String): Column =
      expr(s"(`$vc` - (((`$vc` % $eps) + $eps) % $eps)) div $eps")
    val lB = left.withColumn(b, bkt(lVal))
    val rB = right.withColumn(b, explode(array(
      bkt(rVal) - 1, bkt(rVal), bkt(rVal) + 1)))
    lB.join(rB, keys :+ b)
      .filter(abs(col(lVal) - col(rVal)) <= eps)
      .drop(b)
  }

  /** Inner interval-overlap join: pairs of (left, right) rows with equal
    * `keys` whose half-open intervals [lStart, lEnd) and [rStart, rEnd)
    * have a NONEMPTY intersection — `greatest(starts) < least(ends)`,
    * which (unlike the textbook pair of `<` inequalities) is also correct
    * for degenerate intervals: [x, x) is the empty set and overlaps
    * nothing, even when x falls inside the other interval. The media /
    * session alignment join (segment × segment) the point-in-interval
    * form can't express.
    *
    * Same bucketization as [[pointInInterval]], both sides replicated into
    * the coarse buckets they span. A pair can now share MANY buckets, so
    * exactly-once emission comes from a pure predicate instead of a
    * distinct pass: the pair is kept only in bucket
    * `max(bucket(lStart), bucket(rStart))` — the first bucket both
    * intervals occupy. (Overlap implies that bucket lies in both sides'
    * replicated ranges: WLOG bucket(lStart) ≤ bucket(rStart), and
    * rStart < lEnd gives bucket(rStart) ≤ bucket(lEnd).) No shuffle
    * beyond the one keyed on (keys, bucket); replication factor per row =
    * span / bucketSeconds + 1. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String, rStart: String, rEnd: String,
                      bucketSeconds: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketSeconds > 0)
    val overlap = left.columns.intersect(right.columns).filterNot(keys.contains)
    require(overlap.isEmpty,
      s"left and right share non-key columns ${overlap.mkString(", ")} — " +
        "the overlap predicate would be ambiguous; rename one side")
    val b = Iterator.from(0).map(i => s"__graft_bucket$i")
      .find(n => !left.columns.contains(n) && !right.columns.contains(n)).get
    def replicated(df: DataFrame, s: String, e: String) = df
      .where(col(e) > col(s)) // empty intervals overlap nothing
      .withColumn(b, explode(sequence(
        bucket(col(s), bucketSeconds), bucket(col(e), bucketSeconds))))
    replicated(left, lStart, lEnd).join(replicated(right, rStart, rEnd), keys :+ b)
      .filter(greatest(col(lStart), col(rStart)) < least(col(lEnd), col(rEnd)))
      .filter(col(b) === greatest(
        bucket(col(lStart), bucketSeconds), bucket(col(rStart), bucketSeconds)))
      .drop(b)
  }
}
