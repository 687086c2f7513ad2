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

  /** MERGEABLE one-row partial stats — the incremental-maintenance half of
    * [[analyze]]. Per column: non-null count, TYPED min/max (typing matters:
    * merging string-cast mins would order "9" > "10"; the cast to string
    * happens only at [[mergeStats]]'s final projection), and the KMV sketch
    * STATE (sorted ≤ k min hashes, [[graft.functions.KmvSketch]]) instead
    * of the finished estimate. At 100 TB this is the shape that makes
    * ANALYZE affordable: each ingest batch pays one scan of ITSELF, and the
    * standing table's stats fold in at metadata cost — never rescanned. */
  def analyzePartial(df: DataFrame, cols: Seq[String], kmvK: Int = 32): DataFrame = {
    val missing = cols.filterNot(df.columns.contains)
    require(cols.nonEmpty && missing.isEmpty,
      s"unknown column(s): ${missing.mkString(", ")}")
    val spark = df.sparkSession
    graft.functions.VectorExprs.register(spark)
    spark.udf.register(s"graft_kmvsketch_$kmvK",
      udaf(new graft.functions.KmvSketch(kmvK)))
    val aggExprs = cols.flatMap { c =>
      Seq(
        expr(s"count(`$c`)").as(s"__cnt_$c"),
        expr(s"min(`$c`)").as(s"__min_$c"),
        expr(s"max(`$c`)").as(s"__max_$c"),
        expr(s"graft_kmvsketch_$kmvK(element_at(poly_hash_array(array(cast(`$c` as string))), 1)) " +
          s"FILTER (WHERE `$c` IS NOT NULL)").as(s"__kmv_$c"))
    } :+ expr("count(1)").as("__rows")
    df.agg(aggExprs.head, aggExprs.tail: _*)
  }

  /** Merge any number of [[analyzePartial]] frames into the [[analyze]]
    * output schema, without touching the underlying data: counts add,
    * typed min/max fold, and the KMV states union-merge (`distinct →
    * sort → take k`) — a pure set function, so the merged estimate is
    * BIT-IDENTICAL to a direct [[analyze]] of the unioned input (the
    * oracle for `s_analyze_merge` is literally `s_analyze`'s SQL over the
    * whole table). The input frames are one row each, so every aggregate
    * here runs on ≤ parts.size rows — metadata cost. */
  def mergeStats(parts: Seq[DataFrame], cols: Seq[String], kmvK: Int = 32): DataFrame = {
    require(parts.nonEmpty, "need at least one partial stats frame")
    import graft.llmdata.TextPrimitives.P
    val unioned = parts.reduce(_ unionByName _)
    val aggExprs = cols.flatMap { c =>
      Seq(
        expr(s"sum(__cnt_$c)").as(s"__cnt_$c"),
        expr(s"cast(min(__min_$c) as string)").as(s"__min_$c"),
        expr(s"cast(max(__max_$c) as string)").as(s"__max_$c"),
        expr(s"slice(array_sort(array_distinct(flatten(collect_list(__kmv_$c)))), 1, $kmvK)")
          .as(s"__kmvm_$c"))
    } :+ expr("sum(__rows)").as("__rows")
    val merged = unioned.agg(aggExprs.head, aggExprs.tail: _*)
      .select((cols.flatMap(c => Seq(col(s"__cnt_$c"), col(s"__min_$c"), col(s"__max_$c"))) ++
        cols.map { c =>
          // Same estimator as KmvDistinct.finish / the analyze oracle:
          // below k the sketch IS the distinct set; at k, (k-1)·P / h_k.
          expr(s"CASE WHEN size(__kmvm_$c) < $kmvK THEN cast(size(__kmvm_$c) as double) " +
            s"ELSE ${kmvK - 1}.0 * ${P}.0 / element_at(__kmvm_$c, $kmvK) END").as(s"__ndv_$c")
        } :+ col("__rows")): _*)
    val stacked = cols.map(c =>
      s"'$c', __rows, __rows - __cnt_$c, __min_$c, __max_$c, round(__ndv_$c, 6)")
      .mkString(", ")
    merged.selectExpr(
        s"stack(${cols.size}, $stacked) as (column, n_rows, n_nulls, min_value, max_value, ndv_est)")
      .selectExpr("column", "cast(n_rows as bigint) as n_rows",
        "cast(n_nulls as bigint) as n_nulls", "min_value", "max_value", "ndv_est")
  }

  /** Equi-width histogram of an integral column — the distribution stat
    * beside [[analyze]]'s min/max/NDV: per-bucket row counts plus observed
    * bounds, the input a cost model needs for selectivity estimates on
    * range predicates (`price BETWEEN a AND b`) where min/max alone can't
    * distinguish uniform from skewed.
    *
    * Exact integer bucket math: width = `(hi − lo) div nBuckets + 1` (so
    * every value lands in [0, nBuckets) and width ≥ 1 even on constant
    * columns), bucket = `(v − lo) div width` — engine-reproducible with no
    * float boundary cases. The (lo, hi) pair comes from a 1-row aggregate
    * broadcast back into the plan (no driver action); callers that already
    * ran [[analyze]] can pass `loHi` to skip that scan — at 100 TB the
    * stats-as-data path makes the histogram a SINGLE pass (the same
    * footer-stats policy as the banding ladders). Bucket count keys the
    * final agg, so shuffle volume is ≤ nBuckets rows per map partition.
    * A `loHi` hint that no longer covers the data does NOT truncate:
    * out-of-range values land in buckets < 0 or ≥ nBuckets, so stale
    * stats surface as visible overflow buckets instead of silently
    * folding into the edge bars. */
  def histogram(df: DataFrame, colName: String, nBuckets: Int = 16,
                loHi: Option[(Long, Long)] = None): DataFrame = {
    require(df.columns.contains(colName), s"unknown column: $colName")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val vals = df.select(col(colName).cast("bigint").as("v")).where(col("v").isNotNull)
    val stats = loHi match {
      case Some((lo, hi)) =>
        require(lo <= hi, s"lo $lo > hi $hi")
        vals.sparkSession.range(1).selectExpr(
          s"CAST($lo AS BIGINT) AS lo", s"CAST($hi AS BIGINT) AS hi")
      case None => vals.agg(min("v").as("lo"), max("v").as("hi"))
    }
    histogramWith(vals, stats, nBuckets)
  }

  /** [[histogram]] with (lo, hi) read from a STORED [[analyze]] /
    * [[mergeStats]] stats frame instead of a data scan — the
    * stats-as-data form that matters at 100 TB: the standing table's
    * bounds come from catalog metadata (one 1-row broadcast), so the
    * histogram is a SINGLE pass over the data, same policy as the
    * footer-driven banding ladders. No driver action anywhere: the
    * bounds never leave the plan (the `loHi` hint, by contrast, is a
    * driver-side literal). Stats frames carry min/max as strings
    * (typed-agnostic storage) — parsed bigint-FIRST (exact for integer
    * renderings of any magnitude: a double round-trip would corrupt
    * bounds past 2^53, shifting every bucket edge on snowflake-id-sized
    * keys), falling back through double only for fractional renderings
    * ("10.0") where the value is float-typed anyway. Stale bounds — stats from
    * an older snapshot than the data — surface as overflow buckets
    * (< 0 / ≥ nBuckets), never silently fold into the edge bars;
    * the registered `s_hist_stats` row pins exactly that scenario. */
  def histogramFromStats(df: DataFrame, colName: String, stats: DataFrame,
                         nBuckets: Int = 16): DataFrame = {
    require(df.columns.contains(colName), s"unknown column: $colName")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val vals = df.select(col(colName).cast("bigint").as("v")).where(col("v").isNotNull)
    def parsed(c: String) =
      s"coalesce(try_cast($c as bigint), cast(cast($c as double) as bigint))"
    val st = stats.filter(col("column") === colName)
      .select(expr(parsed("min_value")).as("lo"),
        expr(parsed("max_value")).as("hi"))
    histogramWith(vals, st, nBuckets)
  }

  /** EQUI-DEPTH histogram of an integral column — the skew-robust
    * complement to [[histogram]]'s equi-width buckets, and the form real
    * optimizers store (per-bucket row counts are ~N/nBuckets by
    * construction, so per-bucket selectivity error is bounded no matter
    * how skewed the distribution; an equi-width histogram of a Zipf column
    * puts 99% of rows in one bar and answers nothing about it).
    *
    * Bucket rule: a value v (atomic — all its rows travel together) lands
    * in `floor(rankBefore(v) · nBuckets / N)` where rankBefore is the
    * count of rows with smaller values — exact integer math, deterministic
    * cross-engine. A value heavier than N/nBuckets overfills its bucket
    * and later cut points shift right, which is the standard equi-depth
    * behavior (the bucket's observed bounds make the heavy value visible).
    *
    * Scale shape: one shuffle groups rows by VALUE (map-side partials
    * absorb repetition — the exchange carries ≤ NDV rows), then the
    * running count needs a single global pass over the ≤ NDV distinct
    * values (an unpartitioned window — the one deliberate single-task
    * stage, bounded by NDV, NOT by row count; the same NDV-bounded
    * contract as [[analyze]]'s sketch finish). For columns whose NDV
    * itself is huge, the sampled-quantile path
    * ([[graft.llmdata.CorpusOps.sampledQuantiles]]) is the documented
    * fork — approximate cuts at bounded state. Final agg re-keys the ≤
    * NDV rows by bucket id: ≤ nBuckets output rows. */
  def equiDepthHistogram(df: DataFrame, colName: String,
                         nBuckets: Int = 8): DataFrame = {
    require(df.columns.contains(colName), s"unknown column: $colName")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val vals = df.select(col(colName).cast("bigint").as("v")).where(col("v").isNotNull)
    val byV = vals.groupBy("v").agg(count(lit(1)).as("cnt"))
    // Both the running count and the grand total N ride the SAME
    // unpartitioned sort — a full-frame window over the grouped rows, so
    // N costs nothing extra (re-counting the raw input would be a second
    // corpus scan for a number the ≤-NDV frame already holds).
    val win = org.apache.spark.sql.expressions.Window.orderBy("v")
    val w = win.rowsBetween(Long.MinValue, -1)
    val wAll = win.rowsBetween(Long.MinValue, Long.MaxValue)
    byV
      .withColumn("__cb", coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("__n", sum("cnt").over(wAll))
      .groupBy(expr(s"(__cb * $nBuckets) div __n").as("bucket"))
      .agg(min("v").as("lo"), max("v").as("hi"), sum("cnt").as("n_rows"))
      .select(col("bucket"), col("lo"), col("hi"), col("n_rows"))
  }

  private def histogramWith(vals: DataFrame, stats: DataFrame,
                            nBuckets: Int): DataFrame =
    vals.crossJoin(broadcast(stats))
      .withColumn("w", expr(s"(hi - lo) div $nBuckets + 1"))
      // FLOOR division, not Spark's truncate-toward-zero `div`: with the
      // in-plan (lo, hi) the dividend is never negative and the two agree,
      // but stale stored bounds can put values below lo — truncation would
      // silently fold the (lo − w, lo) band into bucket 0 instead of
      // surfacing bucket −1. (DuckDB's `//` ALSO truncates on negatives —
      // measured -8//3 = -2 — so the s_hist_stats oracle uses this same
      // canonicalized-numerator formula rather than a bare `//`.)
      .groupBy(expr("(v - lo - ((v - lo) % w + w) % w) div w").as("bucket"),
        col("lo"), col("w"))
      .agg(count(lit(1)).as("n_rows"), min("v").as("seen_min"), max("v").as("seen_max"))
      .select(col("bucket"),
        (col("lo") + col("bucket") * col("w")).as("bucket_lo"),
        (col("lo") + (col("bucket") + 1) * col("w") - 1).as("bucket_hi"),
        col("n_rows"), col("seen_min"), col("seen_max"))
}
