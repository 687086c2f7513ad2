package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}

import graft.sources.TableStats

/** Stats-driven join execution — the optimizer loop CLOSED: [[TableStats
  * .joinStrategyChoice]] turns standing `analyze`/`heavyKeys` artifacts
  * into a decision, and this object turns the decision into a physical
  * plan shape (broadcast hint, salted shuffle, or pinned sort-merge).
  *
  * The decision read is ONE driver action on a 1-row frame built from
  * ≤ k-row broadcast inputs — metadata cost, the same class as the
  * `nHint` footer reads; the data tables are never touched before the
  * join itself runs. That ordering is the point at scale: AQE can only
  * re-plan a skewed sort-merge join AFTER the skewed exchange has
  * materialized, while a stats-driven choice has the salt (or the
  * broadcast) in the FIRST submitted plan, so the pathological shuffle
  * never runs — on a 100 TB fact table that is the difference between
  * mitigating a hot key and paying it once to find out it's hot.
  *
  * Semantics contract: inner equi-join on one shared key column name
  * (USING-style, key emitted once), bit-identical output across all
  * three strategies — pinned by AutoJoinSpec on engineered
  * broadcast/uniform/skew inputs.
  */
object JoinPlanner {

  /** Inner-join `a` with `b` on the shared column `key`, with the
    * strategy chosen by [[TableStats.joinStrategyChoice]] from the four
    * stats frames. `saltOn` feeds [[SkewJoin.saltedJoin]]'s salt basis:
    * pass high-cardinality columns of EITHER side (or both) — the salt
    * hashes the big side's rows, and WHICH side is big is the stats'
    * decision, not the caller's, so `saltOn` is filtered down to the
    * columns present on the side the decision picked (none present →
    * saltedJoin's whole-row default). Without the filter a saltOn naming
    * only one side's columns would throw AnalysisException — or silently
    * hash a same-named different column — whenever the stats flip which
    * side is bigger: a data-dependent runtime failure in a planner meant
    * to be hands-off. Thresholds are caller-owned: row-count knobs, not
    * bytes, because the stats frames carry row counts — callers with
    * width estimates fold them into the limits. */
  def autoJoin(a: DataFrame, b: DataFrame, key: String,
               statsA: DataFrame, heavyA: DataFrame,
               statsB: DataFrame, heavyB: DataFrame,
               broadcastRowLimit: Long, perKeyRowBudget: Long,
               maxSaltFactor: Int = 64,
               saltOn: Seq[String] = Nil): DataFrame = {
    val d = TableStats.joinStrategyChoice(statsA, heavyA, statsB, heavyB,
        key, key, broadcastRowLimit, perKeyRowBudget, maxSaltFactor)
      .select("decision", "build_side", "salt_factor", "n_a", "n_b")
      .collect()(0)
    d.getString(0) match {
      case "broadcast" =>
        if (d.getString(1) == "b") a.join(broadcast(b), Seq(key))
        else broadcast(a).join(b, Seq(key))
      case "salted_smj" =>
        val salt = d.getLong(2).toInt
        // The salt basis must name columns of the side being salted —
        // keep only those on the stats-chosen big side (see scaladoc).
        // Matching follows the session's resolution rules (case-insensitive
        // unless spark.sql.caseSensitive): a caller whose saltOn entry
        // differs only in case from the frame's column previously resolved
        // and salted; a case-sensitive filter here would silently demote
        // it to whole-row hashing — a quiet skew-mitigation regression.
        // The mapped-back FRAME name is what saltedJoin receives, so
        // downstream column references stay exact.
        val caseSensitive =
          a.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
        def saltColsOf(big: DataFrame) =
          if (caseSensitive) saltOn.filter(big.columns.contains)
          else saltOn.flatMap(s => big.columns.find(_.equalsIgnoreCase(s)))
        // Salt the side with more rows; replicate the other ×salt.
        if (d.getLong(3) >= d.getLong(4))
          SkewJoin.saltedJoin(a, b, Seq(key), salt, saltOn = saltColsOf(a))
        else {
          // saltedJoin's output column order is (big ++ small); re-project
          // to (a ++ b) so the caller-visible schema does not depend on
          // which side the stats said was bigger.
          val joined = SkewJoin.saltedJoin(b, a, Seq(key), salt, saltOn = saltColsOf(b))
          val cols = col(key) +: (a.columns.filterNot(_ == key) ++
            b.columns.filterNot(_ == key)).toIndexedSeq.map(col)
          joined.select(cols: _*)
        }
      // The decision said "too big to broadcast, no key worth salting" —
      // pin sort-merge so the choice is THIS module's, not a session
      // autoBroadcast threshold's.
      case _ => a.join(b.hint("merge"), Seq(key))
    }
  }
}
