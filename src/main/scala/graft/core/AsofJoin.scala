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
  * sides, union them, and propagate the latest right-side payload with
  * `last(..., ignoreNulls) over (partition by key order by ts, side rows
  * unbounded preceding..current)`. One shuffle on the key, one
  * per-partition sort — cost identical to a sort-merge join. A theta/range
  * join formulation would explode to |left|×|right| per key before
  * filtering; this never materializes more than left+right rows. Right
  * rows sort BEFORE left rows at equal timestamps (side 0 < 1), so a
  * same-instant snapshot is visible — matching DuckDB's native
  * `ASOF JOIN ... ON l.ts >= r.ts` semantics, which the `j_asof`
  * CORRECTNESS row cross-checks against this exact implementation (two
  * independent engines, two independent algorithms).
  *
  * NULL semantics match the native form too: the payload columns are
  * carried as ONE struct (non-null for every right row), so the window
  * fill always takes the whole latest snapshot — a snapshot whose payload
  * VALUES are NULL yields NULLs rather than leaking an older snapshot, and
  * multi-column payloads can never mix rows. Right rows with a NULL
  * timestamp are excluded (a NULL never satisfies `l.ts >= r.ts`).
  *
  * Requirement: `right` must be unique per (keys, rightTs) — with
  * duplicates, "the" as-of row is ill-defined in any engine; pre-dedup
  * with [[Dedup.top1PerKey]] if needed.
  */
object AsofJoin {

  private def freeName(base: String, taken: Set[String]): String =
    Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
      .find(n => !taken.contains(n)).get

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, payload: Seq[String],
                   forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.forall(right.columns.contains), s"payload must be right columns")
    require(payload.intersect(leftCols).isEmpty,
      s"payload names must not collide with left columns: ${payload.intersect(leftCols)}")
    val taken = (leftCols ++ right.columns).toSet
    val ts = freeName("__graft_asof_ts", taken)
    val side = freeName("__graft_asof_side", taken)
    val pl = freeName("__graft_asof_payload", taken)
    // Left sorts before right at equal ts in forward mode (sees the
    // same-instant snapshot ahead of it); after in backward mode (sees it
    // behind). side values chosen so ascending order does both.
    val lTagged = left.withColumn(ts, col(leftTs)).withColumn(side, lit(1))
    // SQL join semantics: a NULL key or NULL timestamp on the right matches
    // nothing — exclude those rows up front (NULL left keys then fall into
    // a partition with no right rows and NULL-extend naturally).
    val rightValid = keys.foldLeft(col(rightTs).isNotNull) { (c, k) => c && col(k).isNotNull }
    val rTagged = right
      .filter(rightValid)
      .select((keys.map(col) :+ col(rightTs).as(ts))
        :+ struct(payload.map(col): _*).as(pl): _*)
      .withColumn(side, lit(if (forward) 2 else 0))
    val unified = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val ordered = Window.partitionBy(keys.map(col): _*).orderBy(col(ts).asc, col(side).asc)
    val fill =
      if (forward)
        first(col(pl), ignoreNulls = true).over(
          ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col(pl), ignoreNulls = true).over(
          ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    unified
      .withColumn(pl, fill)
      .filter(col(side) === 1)
      // A left row with NULL timestamp satisfies no ts predicate in either
      // direction — NULL-extend it explicitly (ordering alone would leak
      // the earliest snapshot in forward mode, where NULLS FIRST puts the
      // row ahead of every right row).
      .select(leftCols.map(col) ++
        payload.map(p => when(col(ts).isNotNull, col(pl).getField(p)).as(p)): _*)
  }

  /** Left rows + `payload` columns of the latest right row at-or-before
    * the left timestamp (NULL-extended when no right row precedes). */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, payload: Seq[String]): DataFrame =
    asof(left, right, keys, leftTs, rightTs, payload, forward = false)

  /** Forward variant: earliest right row at-or-after the left timestamp. */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String, payload: Seq[String]): DataFrame =
    asof(left, right, keys, leftTs, rightTs, payload, forward = true)

  /** Backward as-of with a maximum-STALENESS tolerance (pandas
    * `merge_asof(tolerance=...)`): a snapshot older than
    * `toleranceSeconds` at event time is REJECTED — the row NULL-extends
    * — instead of silently served stale. The difference matters exactly
    * where as-of joins live: a price/config/feature older than the
    * freshness SLA is an error signal, not an answer.
    *
    * Same union-window plan as [[asofBackward]] (one shuffle + sort,
    * never a range product): the matched right TIMESTAMP rides the
    * payload struct, and the tolerance check is a per-row projection on
    * the result — zero extra shuffles. NULL-extension is all-or-nothing
    * per row (the whole snapshot is rejected, never a column mix). */
  def asofBackwardTolerance(left: DataFrame, right: DataFrame, keys: Seq[String],
                            leftTs: String, rightTs: String, payload: Seq[String],
                            toleranceSeconds: Long): DataFrame = {
    require(toleranceSeconds >= 0)
    val taken = (left.columns ++ right.columns).toSet
    val mts = freeName("__graft_asof_matchts", taken)
    val joined = asof(left, right.withColumn(mts, col(rightTs)),
      keys, leftTs, rightTs, payload :+ mts, forward = false)
    val fresh = col(leftTs).cast("timestamp").cast("double") -
      col(mts).cast("timestamp").cast("double") <= toleranceSeconds
    joined
      .select(left.columns.map(col) ++
        payload.map(p => when(fresh, col(p)).as(p)): _*)
  }
}
