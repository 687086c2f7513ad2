package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table statistics: per-column row count, null count,
  * min/max, and a KMV distinct-count estimate — the numbers a cost-based
  * optimizer (join reorder, broadcast threshold, skew detection) runs on.
  * Spark's own `ANALYZE TABLE` needs a catalog table; this operates on any
  * DataFrame and emits the stats AS data, so a pipeline can persist them
  * next to the table it wrote (the pattern long-lived stores need: stats
  * travel with the data, not with a session's catalog).
  *
  * ONE pass over the input computes every column's aggregates side by side
  * (k columns = one scan, not k); the single stats row is then unpivoted
  * with `stack` — driver-free, the output is itself a (tiny) DataFrame.
  * NDV uses the [[graft.functions.KmvDistinct]] sketch over the shared
  * polynomial hash: bounded state (k longs) per column regardless of
  * cardinality, and — unlike HLL — deterministic (a set function of the
  * input), so the estimate is exactly reproducible by any engine. Null
  * handling is the standard one: min/max/NDV describe the non-null
  * population (the `FILTER` clause keeps nulls out of the sketch), nulls
  * get their own count.
  */
object TableStats {

  /** Per-column stats frame: (column, n_rows, n_nulls, min_value,
    * max_value, ndv_est). min/max are cast to string AFTER aggregation so
    * heterogeneous column types share one schema. */
  def analyze(df: DataFrame, cols: Seq[String], kmvK: Int = 32): DataFrame = {
    val missing = cols.filterNot(df.columns.contains)
    require(cols.nonEmpty && missing.isEmpty,
      s"unknown column(s): ${missing.mkString(", ")}")
    val spark = df.sparkSession
    graft.functions.VectorExprs.register(spark)
    spark.udf.register(s"graft_kmv_$kmvK",
      udaf(new graft.functions.KmvDistinct(kmvK)))
    val aggExprs = cols.flatMap { c =>
      Seq(
        expr(s"count(`$c`)").as(s"__cnt_$c"),
        expr(s"cast(min(`$c`) as string)").as(s"__min_$c"),
        expr(s"cast(max(`$c`) as string)").as(s"__max_$c"),
        expr(s"graft_kmv_$kmvK(element_at(poly_hash_array(array(cast(`$c` as string))), 1)) " +
          s"FILTER (WHERE `$c` IS NOT NULL)").as(s"__ndv_$c"))
    } :+ expr("count(1)").as("__rows")
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', __rows, __rows - __cnt_$c, __min_$c, __max_$c, round(__ndv_$c, 6)")
      .mkString(", ")
    one.selectExpr(
        s"stack(${cols.size}, $stacked) as (column, n_rows, n_nulls, min_value, max_value, ndv_est)")
      .selectExpr("column", "cast(n_rows as bigint) as n_rows",
        "cast(n_nulls as bigint) as n_nulls", "min_value", "max_value", "ndv_est")
  }
}
