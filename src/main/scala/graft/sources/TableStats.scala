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

  /** Quadratic post-mix of the polynomial string hash, mod P — REQUIRED
    * in front of any KMV estimator whose inputs may be SHORT strings.
    * The raw poly hash of a short string is bounded by ~31^len, so short
    * keys ("42", "7.0") land in a tiny prefix of [0, P) and the KMV
    * estimator `(k−1)·P/h_k` — which assumes uniformity — explodes:
    * measured on sf0.01 lineitem BEFORE this mix, l_quantity estimated
    * 19 760 against a true NDV of 50 (395×) and l_orderkey 1.9e7 against
    * 14 743 (1290×); the flaw sat green for nine rounds because the
    * DuckDB twin replicated the same math. `x → (x²·A1 + x·A2) mod P`
    * spreads any structured input (constant-length keys hash to near-
    * arithmetic progressions, which a LINEAR mix would map to another AP
    * — three-gap order statistics, still ~2× biased; the quadratic term
    * breaks the progression). Collisions: x, y collide only on the line
    * x + y ≡ −A2/A1, at most one partner per value — immaterial for an
    * estimator. The largest intermediate is `(P−1)·A1 ≈ 2.66e18` —
    * a ~3.5× margin under int64's 9.22e18 in both engines (DuckDB
    * raises on overflow; nothing here wraps — but do NOT grow P or A1
    * past `P·A1 < 9.2e18` without rechecking this bound). Long
    * inputs (the shingle sketches of c_overlap_kmv) already wrap mod P
    * many times and stay on the raw hash. */
  private[graft] def kmvMix(h: String): String =
    s"((($h) * ($h) % ${graft.llmdata.TextPrimitives.P}) * 2654435769L + ($h) * 40503L) % ${graft.llmdata.TextPrimitives.P}"

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
      val h = s"element_at(poly_hash_array(array(cast(`$c` as string))), 1)"
      Seq(
        expr(s"count(`$c`)").as(s"__cnt_$c"),
        expr(s"cast(min(`$c`) as string)").as(s"__min_$c"),
        expr(s"cast(max(`$c`) as string)").as(s"__max_$c"),
        expr(s"graft_kmv_$kmvK(${kmvMix(h)}) " +
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
        expr(s"graft_kmvsketch_$kmvK(${kmvMix(s"element_at(poly_hash_array(array(cast(`$c` as string))), 1)")}) " +
          s"FILTER (WHERE `$c` IS NOT NULL)").as(s"__kmv_$c"))
    } :+ expr("count(1)").as("__rows")
    // Hash-domain format marker, carried IN THE SCHEMA (a column name, so
    // checking it is a pure metadata operation — reading a value would
    // trigger the whole aggregate): v2 = the kmvMix'd sketch domain.
    // Partial frames persist as parquet next to their tables; a pre-mix
    // frame read back from disk lacks this column and mergeStats fails
    // loudly instead of union-merging sketches from two different hash
    // domains into a silently meaningless NDV estimate.
    df.agg(aggExprs.head, aggExprs.tail: _*)
      .withColumn(StatsFormatMarker, lit(StatsFormatVersion))
  }

  /** Version of the KMV hash domain baked into [[analyzePartial]] sketch
    * states: v2 = [[kmvMix]] post-mix (round 10). Bump whenever the
    * sketch input hash changes — stored partials from a different
    * version must be re-analyzed, never merged. */
  val StatsFormatVersion: Int = 2

  /** Marker column name on [[analyzePartial]] frames; the version is in
    * the NAME so [[mergeStats]]'s check is schema-only (no job runs). */
  val StatsFormatMarker: String = s"__stats_fmt_v$StatsFormatVersion"

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
    // KMV states only merge meaningfully within ONE hash domain — a
    // partial persisted before the kmvMix change (round 10) holds
    // min-hashes of a different function, and unioning the two domains
    // estimates garbage with no visible symptom. The format marker is a
    // schema-level stamp ([[StatsFormatMarker]]), so this check runs at
    // plan-build time and costs nothing.
    parts.zipWithIndex.foreach { case (p, i) =>
      require(p.columns.contains(StatsFormatMarker),
        s"mergeStats: partial frame #$i lacks the $StatsFormatMarker column — " +
          "it was written by a different stats format (different KMV hash " +
          "domain); re-run analyzePartial on its source data instead of merging")
    }
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
    requireOneStatsRow(stats, colName, "histogramFromStats")
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
    * contract as [[analyze]]'s sketch finish). That contract is
    * ENFORCED, not just documented: past `maxNdv` distinct values
    * (default 2^22 — ~100 MB of single-task sort state) the operator
    * refuses with a typed [[graft.core.ScaleGuardRefusal]] naming the
    * fork — the sampled-quantile path
    * ([[graft.llmdata.CorpusOps.sampledQuantiles]]), approximate cuts
    * at bounded state; a near-unique key column would otherwise
    * degenerate the window into one task sorting the whole corpus
    * (`maxNdv = 0` opts out for callers that know their domain). Final
    * agg re-keys the ≤ NDV rows by bucket id: ≤ nBuckets output rows. */
  def equiDepthHistogram(df: DataFrame, colName: String,
                         nBuckets: Int = 8, maxNdv: Long = 1L << 22): DataFrame = {
    require(df.columns.contains(colName), s"unknown column: $colName")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val vals = df.select(col(colName).cast("bigint").as("v")).where(col("v").isNotNull)
    val byV0 = vals.groupBy("v").agg(count(lit(1)).as("cnt"))
    // NDV guard: the running count below is ONE task sorting the grouped
    // frame — NDV-bounded by design, which on a near-unique key column
    // degenerates to a single task sorting the whole corpus. Refuse past
    // maxNdv (typed ScaleGuardRefusal, the library's fail-fast-by-design
    // convention) and point at the bounded-state fork; the NDV count is
    // a DISTRIBUTED agg over the same grouped frame (persisted so the
    // guard's pass is the window's input, not a second shuffle).
    // maxNdv = 0 disables (callers that know their domain).
    val byV =
      if (maxNdv <= 0) byV0
      else {
        val b = graft.core.CacheScope.persisted(byV0)
        val ndv = b.count()
        if (ndv > maxNdv) {
          // Release the (NDV-sized, potentially huge) cache BEFORE the
          // refusal propagates — a refused call must not leave blocks
          // behind to pressure the rest of the session.
          b.unpersist(blocking = false)
          throw new graft.core.ScaleGuardRefusal(
            s"equiDepthHistogram: $colName has $ndv distinct values (> $maxNdv); " +
              "the exact running count is a single NDV-sized sorting task at this " +
              "cardinality - use CorpusOps.sampledQuantiles for approximate cuts " +
              "at bounded state, or raise maxNdv deliberately")
        }
        b
      }
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

  /** Apply STORED equi-depth cuts to (new) data — the serving form of
    * [[equiDepthHistogram]], and the distribution-drift check that makes
    * stored cuts useful beyond selectivity: buckets were built to hold
    * ~N/k rows each on the training snapshot, so re-bucketing today's
    * data against yesterday's cuts turns distribution drift into
    * directly-readable depth imbalance (the population-stability-index
    * shape, ln-free — per-bucket observed counts against a flat
    * expectation). One pass, no shuffle before the final ≤ k+1-key agg:
    * the ≤ k cut values broadcast as one sorted array and bucket
    * assignment is a projection (`#cuts ≤ v − 1`). Values below the
    * first cut land in bucket −1 — out-of-range mass surfaces, the same
    * no-silent-folding policy as [[histogramFromStats]]'s overflow
    * buckets. `cuts` is [[equiDepthHistogram]] output (its `lo` column
    * is the cut set; bucket ids are re-derived, so a cuts frame with
    * collapsed/missing buckets still applies cleanly). */
  /** ONE definition of the stored-cuts bucket rule, shared by
    * [[equiDepthFromCuts]] and the streaming drift monitor
    * ([[graft.streaming.EventStream]]'s `bucketAgg`) so the batch
    * diagnostic and the live monitor can never drift apart: attach the
    * broadcast sorted cut array and a `bucket` column
    * (`#cuts ≤ v − 1`; `vCol` must be a non-null BIGINT — callers filter
    * nulls first, nulls are NOT below-range mass). */
  private[graft] def withCutBucket(vals: DataFrame, vCol: String,
                                   cuts: DataFrame): DataFrame =
    vals.crossJoin(broadcast(cuts.agg(
        expr("array_sort(collect_list(cast(lo as bigint)))").as("__cuts"))))
      .withColumn("bucket",
        expr(s"CAST(size(filter(__cuts, c -> c <= $vCol)) - 1 AS BIGINT)"))

  def equiDepthFromCuts(df: DataFrame, colName: String,
                        cuts: DataFrame): DataFrame = {
    require(df.columns.contains(colName), s"unknown column: $colName")
    val vals = df.select(col(colName).cast("bigint").as("v")).where(col("v").isNotNull)
    withCutBucket(vals, "v", cuts)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), min("v").as("seen_min"), max("v").as("seen_max"))
  }

  /** Fail-fast contract every stored-stats consumer shares: the stats
    * frame must hold EXACTLY ONE row for the column — zero rows (a
    * misspelled or never-analyzed column) would silently empty the
    * consumer's broadcast crossJoin chain and read as "no data", while
    * DUPLICATE rows (a stats frame accidentally unioned from two
    * analyze() runs instead of folded through [[mergeStats]]) would
    * silently multiply the chain and fan the output out N ways. The
    * stats frame is one row per analyzed column, so the exact count is
    * a metadata action; no `limit(1)` — that form cannot see
    * duplicates. */
  private def requireOneStatsRow(stats: DataFrame, colName: String,
                                 op: String): Unit = {
    val n = stats.filter(col("column") === colName).count()
    require(n == 1,
      s"$op: expected exactly 1 stats row for column '$colName', found $n — " +
        (if (n == 0) "analyze() it first"
         else "duplicate stats rows (union of two analyze() runs?); merge partials with mergeStats instead"))
  }

  /** Heavy keys of one column (exact counts for every key above the 1/k
    * frequency gate) — the generic-keyed sibling of
    * [[graft.llmdata.TextAnalysis.heavyHitters]], feeding
    * [[joinSizeEstimate]]: Misra-Gries candidates (≤ k (key, count) pairs
    * per partition cross the exchange, never rows) + an exact verify agg
    * over candidate-filtered occurrences, gated `n_occ·k > N` so the
    * output is a pure function of the column's multiset. Keys travel as
    * strings (the stats frames' typed-agnostic convention). */
  def heavyKeys(df: DataFrame, colName: String, k: Int = 64): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    import org.apache.spark.sql.functions.udaf
    val mg = udaf(new graft.functions.MisraGries(k))
    def occ = df.select(col(colName).cast("string").as("key")).where(col("key").isNotNull)
    val sketch = graft.core.CacheScope.persisted(
      occ.agg(mg(col("key")).as("cand"), count(lit(1)).as("total")))
    val cands = sketch.select(explode(col("cand")).as("key"))
    val totals = sketch.select("total")
    // The FINAL ≤ k-row frame is persisted too (cheap — k rows), because
    // consumers like joinSizeEstimate evaluate it more than once and each
    // evaluation would otherwise re-run the verify's full table scan.
    graft.core.CacheScope.persisted(
      occ.join(broadcast(cands), Seq("key"))
        .groupBy("key").agg(count(lit(1)).as("n_occ"))
        .crossJoin(broadcast(totals))
        .filter(col("n_occ") * k > col("total"))
        .select(col("key"), col("n_occ")))
  }

  /** [[heavyKeys]] for SEVERAL columns of one table in ONE sketch pass +
    * ONE exact-verify pass — the ANALYZE-side batching that collapsed
    * `s_plan_choice`'s per-column scans (6 sketch + 6 verify jobs → 2+2
    * for its two multi-key tables). Emits (column, key, n_occ); slice a
    * single column's frame with `filter(column = c).select(key, n_occ)`
    * — per column the output is IDENTICAL to [[heavyKeys]] by
    * construction, not by luck: the Misra-Gries candidates are only a
    * no-false-negative SUPERSET either way (the sketch skips nulls, so
    * the multi-column pass feeds each column's MG the same non-null
    * sequence the single-column filter did), and the exact verify gate
    * `n_occ·k > total_c` (per-column non-null totals) makes the output a
    * pure function of each column's multiset regardless of candidate
    * noise. One scan computes all sketches + totals (k independent
    * aggregates over the same rows); the verify unpivots the columns
    * into a (column, key) occurrence stream — k× the rows of one column,
    * ONE table scan instead of k — and joins the broadcast ≤ k·|cols|
    * candidate frame. HeavyKeysMultiSpec pins per-column equality. */
  def heavyKeysMulti(df: DataFrame, cols: Seq[String], k: Int = 64): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    require(k >= 1, s"k must be positive, got $k")
    import org.apache.spark.sql.functions.udaf
    val mg = udaf(new graft.functions.MisraGries(k))
    val aggs = cols.flatMap(c => Seq(
      mg(col(c).cast("string")).as(s"__cand_$c"),
      count(col(c)).as(s"__total_$c")))
    val sketch = graft.core.CacheScope.persisted(
      df.agg(aggs.head, aggs.drop(1): _*))
    val occ = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("key"))): _*)).as("o"))
      .select(col("o.column").as("column"), col("o.key").as("key"))
      .where(col("key").isNotNull)
    val cands = sketch.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(s"__cand_$c").as("cand"),
          col(s"__total_$c").as("total"))): _*)).as("s"))
      .select(col("s.column").as("column"), explode(col("s.cand")).as("key"),
        col("s.total").as("total"))
    graft.core.CacheScope.persisted(
      occ.join(broadcast(cands), Seq("column", "key"))
        .groupBy("column", "key", "total").agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") * k > col("total"))
        .select("column", "key", "n_occ"))
  }

  /** Join-size estimation from STORED statistics — the capstone of the
    * stats-as-data family: predict `|A ⋈ B on key|` from each side's
    * [[analyze]] row (row count + KMV NDV) and [[heavyKeys]] frame alone,
    * touching NEITHER table. This is what a cost-based optimizer actually
    * does with the stats this module emits (join ordering, broadcast
    * decisions, skew handling all hang off this one number), and the
    * classic uniform-frequency estimate `nA·nB / max(ndvA, ndvB)`
    * (Selinger et al. 1979) is catastrophically wrong under skew — the
    * registered row measures it ~70× low on a two-sided-skew join while
    * the sketch-corrected estimate lands within a few percent.
    *
    * Decomposition (Ioannidis/Poosala-style frequency splitting): heavy
    * keys carry EXACT counts on both sides, so
    *   est = Σ_{k ∈ H_A ∩ H_B} fA(k)·fB(k)                (exact × exact)
    *       + Σ_{k ∈ H_A ∖ H_B} fA(k) · f̄B                 (exact × mean)
    *       + Σ_{k ∈ H_B ∖ H_A} fB(k) · f̄A
    *       + restA · restB / max(restNdvA, restNdvB)       (uniform tail)
    * where f̄X = restX / restNdvX and restX/restNdvX subtract the heavy
    * mass/keys from the ANALYZE totals. The tail term keeps the standard
    * containment assumption — but only for the residual, where uniformity
    * is defensible by construction (everything above the 1/k gate was
    * pulled out exactly).
    *
    * Every input is a ≤ k-row or 1-row broadcast frame; the whole
    * estimator is plan-side arithmetic (no driver actions, no table
    * scans). Deterministic: MG heavy sets are exact-verified (pure
    * function of each column's multiset), KMV NDV is a set function, and
    * the division/add order is pinned — so the DuckDB twin reproduces
    * the estimate bit-for-bit. */
  def joinSizeEstimate(statsA: DataFrame, heavyA: DataFrame,
                       statsB: DataFrame, heavyB: DataFrame,
                       keyColA: String, keyColB: String): DataFrame = {
    def side(stats: DataFrame, heavy: DataFrame, keyCol: String, tag: String) = {
      requireOneStatsRow(stats, keyCol, s"joinSizeEstimate side $tag")
      val tot = stats.filter(col("column") === keyCol)
        .select(col("n_rows").cast("double").as(s"n_$tag"),
          col("ndv_est").cast("double").as(s"ndv_$tag"))
      val h = heavy.agg(
        coalesce(sum("n_occ"), lit(0L)).cast("double").as(s"hrows_$tag"),
        count(lit(1)).cast("double").as(s"hkeys_$tag"))
      tot.crossJoin(broadcast(h))
        .withColumn(s"rest_$tag", col(s"n_$tag") - col(s"hrows_$tag"))
        .withColumn(s"restndv_$tag",
          greatest(lit(1.0), col(s"ndv_$tag") - col(s"hkeys_$tag")))
    }
    val a = side(statsA, heavyA, keyColA, "a")
    val b = side(statsB, heavyB, keyColB, "b")
    // Heavy-key overlap classes off one full outer join of the two ≤ k-row
    // frames: both → exact product; one-sided → exact × the other side's
    // residual mean (folded in after the crossJoin below).
    val hj = heavyA.select(col("key"), col("n_occ").as("__fa"))
      .join(heavyB.select(col("key"), col("n_occ").as("__fb")), Seq("key"), "full_outer")
      .agg(
        coalesce(sum(expr("CAST(__fa AS DOUBLE) * CAST(__fb AS DOUBLE)")), lit(0.0)).as("__both"),
        coalesce(sum(when(col("__fb").isNull, col("__fa"))), lit(0L)).cast("double").as("__aonly"),
        coalesce(sum(when(col("__fa").isNull, col("__fb"))), lit(0L)).cast("double").as("__bonly"))
    a.crossJoin(broadcast(b)).crossJoin(broadcast(hj))
      .select(
        round(expr("__both + __aonly * (rest_b / restndv_b) + __bonly * (rest_a / restndv_a)" +
          " + rest_a * rest_b / greatest(restndv_a, restndv_b)"), 2).as("est_rows"),
        round(expr("n_a * n_b / greatest(ndv_a, ndv_b)"), 2).as("est_uniform"))
  }

  /** Range-predicate selectivity estimation from STORED statistics — the
    * missing half of the optimizer loop beside [[joinSizeEstimate]]:
    * predict `|σ_{qLo ≤ v ≤ qHi}(T)|` from a stored [[analyze]] stats row
    * and a stored [[equiDepthHistogram]] frame alone, touching the table
    * NEVER. This is the number scan-vs-index and filter-pushdown
    * decisions hang off, and the min/max-only uniform estimate
    * `N · |range ∩ [min,max]| / (max − min + 1)` (Selinger et al. 1979)
    * collapses under skew: concentrated mass makes the value span huge
    * and the uniform density meaningless (the registered `s_sel_est` row
    * measures it >1000× low on a two-regime column), while equi-depth
    * buckets bound per-bucket error BY CONSTRUCTION — a bucket holds
    * ~N/k rows whatever the distribution, so even a fully-misestimated
    * partial bucket costs at most its own depth.
    *
    * Per-bucket interpolation, exact integer math (pinned division
    * order, engine-reproducible): a bucket [lo, hi] with n rows
    * contributes `(n · |[qLo,qHi] ∩ [lo,hi]|) div (hi − lo + 1)` —
    * uniform-over-span within the bucket, the standard equi-depth
    * assumption. Fully-covered buckets contribute exactly n; the ≤ 2
    * partial edge buckets are where the bounded-error guarantee bites.
    * `est_uniform` is emitted beside `est_rows` so the skew penalty of
    * the naive estimate is always visible in the same row.
    *
    * Both inputs are broadcast ≤ k-row / 1-row frames; the whole
    * estimator is plan-side arithmetic — metadata cost, the serving
    * shape where stats are standing artifacts next to the table.
    * Overflow bound (int64, both engines): per-bucket `n · overlap`
    * must stay under 2^63 — with equi-depth buckets n ≈ N/k, so the
    * contract is `(N/k) · maxBucketSpan < 9.2e18`; a 10^12-row table
    * with 64 buckets leaves span headroom of ~5·10^8. */
  def selectivityEstimate(stats: DataFrame, hist: DataFrame, colName: String,
                          qLo: Long, qHi: Long): DataFrame = {
    require(qLo <= qHi, s"qLo $qLo > qHi $qHi")
    requireOneStatsRow(stats, colName, "selectivityEstimate")
    val est = hist.select(
        expr(s"greatest(0L, least(${qHi}L, hi) - greatest(${qLo}L, lo) + 1L)").as("__ov"),
        expr("hi - lo + 1L").as("__w"), col("n_rows"))
      .agg(coalesce(sum(expr("(n_rows * __ov) div __w")), lit(0L))
        .cast("bigint").as("est_rows"))
    // Same bigint-first string parse as histogramFromStats: stats frames
    // carry min/max typed-agnostically as strings; a double round-trip
    // would corrupt bounds past 2^53.
    def parsed(c: String) =
      s"coalesce(try_cast($c as bigint), cast(cast($c as double) as bigint))"
    val uni = stats.filter(col("column") === colName)
      .select(
        (col("n_rows") - col("n_nulls")).as("__n"),
        expr(parsed("min_value")).as("__mn"),
        expr(parsed("max_value")).as("__mx"))
      .select(expr(
        s"(__n * greatest(0L, least(${qHi}L, __mx) - greatest(${qLo}L, __mn) + 1L))" +
          " div (__mx - __mn + 1L)").cast("bigint").as("est_uniform"))
    est.crossJoin(broadcast(uni))
  }

  /** Join-strategy choice from STORED statistics — the stats loop closing
    * into an actual planning DECISION: given each side's [[analyze]] row
    * and [[heavyKeys]] frame (the same inputs [[joinSizeEstimate]]
    * consumes), pick broadcast vs plain shuffle vs salted shuffle, and
    * size the salt. This is the judgment call Spark's own planner makes
    * from catalog stats and AQE makes from materialized exchanges —
    * here it runs BEFORE any exchange exists, from standing stats
    * artifacts, so the skew mitigation is in the very first plan (no
    * materialize-then-replan round trip, which at 100 TB means not
    * paying the skewed shuffle even once).
    *
    * The cascade, all thresholds caller-owned:
    *   1. `least(nA, nB) ≤ broadcastRowLimit` → `broadcast` (build side =
    *      the smaller frame, ties to 'b' — Spark's own right-build
    *      preference);
    *   2. else if the largest estimated SINGLE-KEY output exceeds
    *      `perKeyRowBudget` → `salted_smj`, salt factor =
    *      `min(maxSaltFactor, ceil(maxKeyEst / budget))` — the number of
    *      sub-keys that brings the worst reducer back inside budget;
    *   3. else → `shuffle_smj`.
    * The per-key estimate splits exactly like [[joinSizeEstimate]]:
    * heavy∩heavy keys get exact fA·fB products, one-sided heavy keys get
    * exact × the other side's residual mean, and the residual-uniform
    * per-key product floors the whole thing (so an empty heavy frame
    * still yields a defined maximum).
    *
    * Deterministic plan-side arithmetic over ≤ k-row broadcast frames
    * (division/rounding order pinned; the decision compares the ROUNDED
    * estimate so the DuckDB twin reproduces decision, build side, and
    * salt factor bit-for-bit). Emits the evidence beside the verdict:
    * est_rows/est_uniform from [[joinSizeEstimate]], max_key_est, and
    * both row counts. */
  def joinStrategyChoice(statsA: DataFrame, heavyA: DataFrame,
                         statsB: DataFrame, heavyB: DataFrame,
                         keyColA: String, keyColB: String,
                         broadcastRowLimit: Long,
                         perKeyRowBudget: Long,
                         maxSaltFactor: Int = 64): DataFrame = {
    require(broadcastRowLimit >= 1, s"broadcastRowLimit must be >= 1, got $broadcastRowLimit")
    require(perKeyRowBudget >= 1, s"perKeyRowBudget must be >= 1, got $perKeyRowBudget")
    require(maxSaltFactor >= 2, s"maxSaltFactor must be >= 2, got $maxSaltFactor")
    // No requireOneStatsRow here: the joinSizeEstimate call below guards
    // the SAME four frames with the same keys — duplicating the check
    // would add two more count actions per invocation for zero coverage.
    def side(stats: DataFrame, heavy: DataFrame, keyCol: String, tag: String) = {
      val tot = stats.filter(col("column") === keyCol)
        .select(col("n_rows").cast("bigint").as(s"n_$tag"),
          col("ndv_est").cast("double").as(s"ndv_$tag"))
      val h = heavy.agg(
        coalesce(sum("n_occ"), lit(0L)).cast("double").as(s"hrows_$tag"),
        count(lit(1)).cast("double").as(s"hkeys_$tag"))
      tot.crossJoin(broadcast(h))
        .withColumn(s"rest_$tag",
          col(s"n_$tag").cast("double") - col(s"hrows_$tag"))
        .withColumn(s"restndv_$tag",
          greatest(lit(1.0), col(s"ndv_$tag") - col(s"hkeys_$tag")))
    }
    val a = side(statsA, heavyA, keyColA, "a")
    val b = side(statsB, heavyB, keyColB, "b")
    // Largest single-key output over the heavy classes: same frequency
    // splitting as joinSizeEstimate, max instead of sum.
    val hmax = heavyA.select(col("key"), col("n_occ").as("__fa"))
      .join(heavyB.select(col("key"), col("n_occ").as("__fb")), Seq("key"), "full_outer")
      .crossJoin(broadcast(a)).crossJoin(broadcast(b))
      .select(
        when(col("__fa").isNotNull && col("__fb").isNotNull,
          col("__fa").cast("double") * col("__fb").cast("double"))
          .when(col("__fa").isNotNull,
            col("__fa").cast("double") * (col("rest_b") / col("restndv_b")))
          .otherwise(col("__fb").cast("double") * (col("rest_a") / col("restndv_a")))
          .as("__pk"))
      .agg(coalesce(max("__pk"), lit(0.0)).as("__hmax"))
    val est = joinSizeEstimate(statsA, heavyA, statsB, heavyB, keyColA, keyColB)
    a.crossJoin(broadcast(b)).crossJoin(broadcast(hmax)).crossJoin(broadcast(est))
      .withColumn("max_key_est", round(greatest(col("__hmax"),
        (col("rest_a") / col("restndv_a")) * (col("rest_b") / col("restndv_b"))), 2))
      .withColumn("decision",
        when(least(col("n_a"), col("n_b")) <= broadcastRowLimit, lit("broadcast"))
          .when(col("max_key_est") > perKeyRowBudget.toDouble, lit("salted_smj"))
          .otherwise(lit("shuffle_smj")))
      .withColumn("build_side",
        when(col("decision") =!= "broadcast", lit("none"))
          .when(col("n_b") <= col("n_a"), lit("b")).otherwise(lit("a")))
      .withColumn("salt_factor",
        when(col("decision") === "salted_smj",
          least(lit(maxSaltFactor.toLong),
            ceil(col("max_key_est") / perKeyRowBudget.toDouble)))
          .otherwise(lit(1L)).cast("bigint"))
      .select(col("decision"), col("build_side"), col("salt_factor"),
        col("max_key_est"), col("est_rows"), col("est_uniform"),
        col("n_a"), col("n_b"))
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
