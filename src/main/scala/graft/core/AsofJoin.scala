package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — an operator Spark has no built-in for: enrich
  * each left row with the single right row holding the greatest right
  * timestamp ≤ the left timestamp within the same key group (the
  * "latest snapshot / price / config at event time" join of time-series
  * and feature-store pipelines).
  *
  * Implementation is the union-window form, NOT a range join: tag both
  * sides, union them, and run `last(payload, ignoreNulls) over (partition
  * by key order by ts, side rows unbounded preceding..current)`. One
  * shuffle on the key, one per-partition sort — cost identical to a
  * sort-merge join. A theta/range join formulation would explode to
  * |left|×|right| per key before filtering; this never materializes more
  * than left+right rows. Right rows sort BEFORE left rows at equal
  * timestamps (side 0 < 1), so a same-instant snapshot is visible —
  * matching DuckDB's native `ASOF JOIN ... ON l.ts >= r.ts` semantics,
  * which the `asof` CORRECTNESS row cross-checks against this exact
  * implementation (two independent engines, two independent algorithms).
  *
  * Requirement: `right` must be unique per (keys, rightTs) — with
  * duplicates, "the" as-of row is ill-defined in any engine; pre-dedup
  * with [[Dedup.top1PerKey]] if needed.
  */
object AsofJoin {

  /** Left rows + `payload` columns of the latest right row at-or-before
    * the left timestamp (NULL-extended when no right row precedes). */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.forall(right.columns.contains), s"payload must be right columns")
    require(payload.intersect(leftCols).isEmpty,
      s"payload names must not collide with left columns: ${payload.intersect(leftCols)}")
    val ts = "__graft_asof_ts"
    val side = "__graft_asof_side"
    val lTagged = left
      .withColumn(ts, col(leftTs))
      .withColumn(side, lit(1))
    val rTagged = right
      .select((keys.map(col) :+ col(rightTs).as(ts)) ++ payload.map(col): _*)
      .withColumn(side, lit(0))
    val unified = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unified) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled
      .filter(col(side) === 1)
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }

  /** Forward variant: earliest right row at-or-after the left timestamp. */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.forall(right.columns.contains), s"payload must be right columns")
    require(payload.intersect(leftCols).isEmpty,
      s"payload names must not collide with left columns: ${payload.intersect(leftCols)}")
    val ts = "__graft_asof_ts"
    val side = "__graft_asof_side"
    val lTagged = left.withColumn(ts, col(leftTs)).withColumn(side, lit(1))
    val rTagged = right
      .select((keys.map(col) :+ col(rightTs).as(ts)) ++ payload.map(col): _*)
      .withColumn(side, lit(2))
    val unified = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(side).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = payload.foldLeft(unified) { (df, p) =>
      df.withColumn(p, first(col(p), ignoreNulls = true).over(w))
    }
    filled
      .filter(col(side) === 1)
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }
}
