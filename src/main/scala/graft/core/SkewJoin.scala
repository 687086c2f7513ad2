package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffle joins: salting.
  *
  * AQE's skew-join handles skewed SORT-MERGE joins by splitting oversized
  * partitions, but only after the skewed exchange has materialized, and
  * only for joins. Salting removes the hot key at the source: the big side
  * scatters each key across `saltFactor` sub-keys, the small side is
  * replicated once per sub-key, and the join key becomes (key, salt) — no
  * single reducer ever owns a whole hot key.
  *
  * The salt is DETERMINISTIC (hash of the big side's whole row, mod
  * factor), not `rand()`: re-runs, retried tasks, and speculative
  * duplicates all compute the same salt, so the operator stays idempotent
  * and oracle-checkable — the same rule every random-looking choice in
  * this library follows.
  *
  * Cost model: small side grows ×saltFactor (keep it broadcast-sized ÷
  * saltFactor); big side is unchanged. Worst hot-key reducer shrinks
  * ~×saltFactor. Inner and left joins preserve exact semantics (each big
  * row carries exactly one salt value, so it meets each matching small row
  * exactly once).
  */
object SkewJoin {

  /** Join `big` with `small` on `keys`, scattering each big-side key over
    * `saltFactor` sub-keys. `joinType`: "inner" or "left".
    *
    * `saltOn` (optional) picks the columns the salt hashes; default = the
    * whole row. Caveat of any deterministic salt: rows that are IDENTICAL
    * on the hashed columns share a salt, so a hot key consisting of exact
    * duplicate rows still lands on one reducer — pass a high-cardinality
    * `saltOn` column (an id, an offset) when one exists, and fall back to
    * AQE's skew-join (partition splitting, content-independent) for
    * duplicate-heavy skew. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner",
                 saltOn: Seq[String] = Nil): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(joinType == "inner" || joinType == "left",
      s"salting preserves semantics for inner/left joins only, got $joinType")
    val saltCol = Iterator.from(0).map(i => s"__graft_salt$i")
      .find(n => !big.columns.contains(n) && !small.columns.contains(n)).get
    val saltBasis = if (saltOn.nonEmpty) saltOn else big.columns.toSeq
    val salted = big.withColumn(saltCol,
      pmod(xxhash64(saltBasis.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ saltCol, joinType).drop(saltCol)
  }
}
