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
}
