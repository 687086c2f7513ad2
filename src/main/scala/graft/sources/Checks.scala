package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality constraint checks (the Deequ idea, library-free): each
  * check is a tiny DataFrame of (check, observed, passed) where `observed`
  * counts VIOLATIONS — so `passed = observed == 0` and a failing check
  * carries its evidence. Checks compose with `union` into one report that
  * a pipeline can assert on, persist next to the data, or alert from.
  *
  * Every check is a single aggregate over a (pushable) predicate or join:
  * uniqueness is one groupBy-free `count - count_distinct`, referential
  * integrity is a LEFT ANTI join (broadcast or SMJ as AQE sizes it —
  * never a product), range/null checks are pushed-down filter counts.
  * Nothing collects to the driver; the report IS a DataFrame.
  */
object Checks {

  private def report(name: String, violations: DataFrame): DataFrame =
    violations.select(
      lit(name).as("check"),
      col("observed").cast("bigint").as("observed"),
      (col("observed") === 0L).cast("int").as("passed"))

  /** Key uniqueness: observed = rows minus distinct keys (0 = unique).
    * NULL convention: `count_distinct` ignores rows whose key is NULL
    * while `count(*)` includes them, so NULL-keyed rows count as
    * violations — a nullable-but-otherwise-unique key reports observed
    * > 0. That is the strict reading (a NULL key can't prove itself
    * distinct) and matches the DuckDB oracle's convention; use
    * [[satisfies]] with an `IS NOT NULL` predicate first if you need
    * to separate null-ness from duplication. */
  def unique(df: DataFrame, name: String, keyCols: String*): DataFrame =
    report(name, df.agg(
      (count(lit(1)) - count_distinct(col(keyCols.head), keyCols.tail.map(col): _*))
        .as("observed")))

  /** Referential integrity: observed = child rows whose key has no match
    * in the parent (LEFT ANTI join). Null child keys are orphans too —
    * an equi-join never matches them, which is the strict reading. */
  def references(child: DataFrame, childKey: String,
                 parent: DataFrame, parentKey: String, name: String): DataFrame =
    report(name, child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("observed")))

  /** Predicate conformance: observed = rows violating `predicateSql`
    * (a Spark SQL boolean; NULL counts as a violation). One conditional
    * aggregate — one scan, like every other check. */
  def satisfies(df: DataFrame, predicateSql: String, name: String): DataFrame =
    report(name, df.agg(
      (count(lit(1)) - count(when(expr(s"coalesce($predicateSql, false)"), 1)))
        .as("observed")))

  /** Null conformance: observed = null rows in `c`. */
  def notNull(df: DataFrame, c: String, name: String): DataFrame =
    report(name, df.agg((count(lit(1)) - count(col(c))).as("observed")))
}
