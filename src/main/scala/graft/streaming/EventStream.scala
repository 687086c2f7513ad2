package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events feed.
  *
  * The reference is batch-only (driver-computed time windows,
  * `etl_job.py:121-125`); these are the streaming-native equivalents the
  * brief asks for: `readStream` → event-time transforms → `writeStream`,
  * with watermarked windowed aggregation and custom session state via
  * `flatMapGroupsWithState`. All operators take a DataFrame so tests can
  * bind a MemoryStream and production can bind a file/Kafka source.
  *
  * Scale notes: windowed aggregation shuffles on (window, key) with
  * partial aggregation map-side; state store size is bounded by the
  * watermark horizon (late data beyond it is dropped), which is the knob
  * that keeps 100 TB/day streams from accumulating unbounded state.
  */
object EventStream {

  /** Source of the streaming events feed over the repo's `events.parquet`
    * layout. The file has stored ts as either TIMESTAMP(NANOS) — which
    * Spark 4 only reads as BIGINT (nanosAsLong pin) — or plain
    * TIMESTAMP(MICROS) NTZ, depending on the generator run; a stream source
    * must DECLARE its schema, so sniff the physical type from one batch
    * footer read (driver-side, O(1)) and declare accordingly. Long feeds
    * get the same ns → µs → NTZ conversion as the batch reader
    * (`Tables.events`), so stream and batch see identical event times. */
  def fileSource(spark: SparkSession, dir: String): DataFrame = {
    // An empty / not-yet-populated feed directory (normal cold-start order:
    // stream first, producer later) has no footer to sniff — fall back to
    // the NTZ layout the current generator ships; a long-nanos feed only
    // needs the sniff once files exist. CONSTRAINT, stated rather than
    // hidden: the sniff runs ONCE at source construction and the declared
    // schema is pinned for the stream's whole life. If a nanos-as-long
    // producer populates the dir only AFTER an empty-dir start, the
    // pinned NTZ schema makes the first batch fail loudly (parquet
    // type-mismatch) — restart the stream to re-sniff; it will never
    // silently misread the longs as timestamps. The catch is deliberately
    // broad (Try, not just AnalysisException): ANY inference failure on an
    // unpopulated dir — missing path, no footers, FS hiccup — means "no
    // evidence of the long layout", and the NTZ default plus the loud
    // mismatch above is the safe resolution for all of them.
    val tsIsLong = scala.util.Try(
      spark.read.parquet(dir).schema("ts").dataType == org.apache.spark.sql.types.LongType
    ).getOrElse(false)
    if (tsIsLong)
      spark.readStream
        .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
        .parquet(dir)
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    else
      spark.readStream
        .schema("event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, value DOUBLE")
        .parquet(dir)
  }

  /** The ONE tumbling-window aggregate both forms share — streaming and
    * batch differ only in watermarking and which time column drives the
    * bucket, so an edit here changes both in lockstep (the property the
    * st_window oracle relies on). */
  private def windowAgg(df: DataFrame, tsCol: String, window_ : String): DataFrame =
    df.groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("revenue"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n_events"), col("revenue"))

  /** Watermarked sliding-window revenue: per 10-minute tumbling event-time
    * window and event_type, count + sum(value). Late events beyond the
    * 30-minute watermark are dropped (bounded state). */
  def windowedRevenue(events: DataFrame,
                      window_ : String = "10 minutes",
                      watermark: String = "30 minutes"): DataFrame =
    windowAgg(
      events
        .withColumn("ts_tz", col("ts").cast("timestamp"))
        .withWatermark("ts_tz", watermark),
      "ts_tz", window_)

  /** Batch twin of [[windowedRevenue]]: identical tumbling-window bucketing
    * and aggregate over a bounded DataFrame (no watermark — batch input is
    * complete by definition), shared via [[windowAgg]] so the streaming
    * operator's event-time semantics are oracle-checkable in batch
    * (`st_window` row; DuckDB `time_bucket` aligns hour buckets to the same
    * epoch boundaries). Operates directly on the NTZ event time. */
  def windowedRevenueBatch(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    windowAgg(events, "ts", window_)

  /** The tumbling-window BUCKET aggregate both drift forms share (the
    * [[windowAgg]] lockstep convention): assign each event's value-cents
    * to a stored-cuts bucket (the
    * [[graft.sources.TableStats.equiDepthFromCuts]] rule — bucket =
    * `#cuts ≤ v − 1`, below-range mass lands in −1), then count per
    * (event-time window, bucket). The cuts frame rides the plan as one
    * broadcast ≤ k-long sorted array (stream-static side, re-resolved per
    * micro-batch — a nightly stats refresh is picked up live, no restart),
    * so bucket assignment is a projection and per-window state is ≤
    * nBuckets+2 counters. */
  private def bucketAgg(df: DataFrame, tsCol: String, cuts: DataFrame,
                        window_ : String): DataFrame =
    graft.sources.TableStats.withCutBucket(
        df.withColumn("__cents", expr("cast(floor(value * 100) as bigint)"))
          // nulls are NOT below-range mass (the equiDepthFromCuts rule):
          // conflating a null-rate spike with a downward value shift
          // would make bucket −1 unreadable as a drift signal.
          .where(col("__cents").isNotNull),
        "__cents", cuts)
      .groupBy(window(col(tsCol), window_), col("bucket"))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("bucket"), col("n_rows"))

  /** STREAMING distribution-drift monitor: per event-time window, the
    * depth histogram of arriving values against STORED equi-depth cuts —
    * live population-stability monitoring (the `s_depth_drift` batch
    * diagnostic as a continuously-updating signal: cuts were built to
    * hold ~N/k rows each on the baseline snapshot, so any window whose
    * bucket counts leave flat is drifting from the baseline, visible the
    * moment the window closes). Watermarked tumbling windows (bounded
    * state: watermark horizon × (nBuckets+2) counters); late events
    * beyond the watermark are dropped. */
  def bucketDrift(events: DataFrame, cuts: DataFrame,
                  window_ : String = "1 day",
                  watermark: String = "1 hour"): DataFrame =
    bucketAgg(
      events
        .withColumn("ts_tz", col("ts").cast("timestamp"))
        .withWatermark("ts_tz", watermark),
      "ts_tz", cuts, window_)

  /** Batch twin of [[bucketDrift]] (the `st_drift` oracle row — identical
    * bucketing and window math via [[bucketAgg]], no watermark since
    * batch input is complete; the st_window twin convention). */
  def bucketDriftBatch(events: DataFrame, cuts: DataFrame,
                       window_ : String = "1 day"): DataFrame =
    bucketAgg(events, "ts", cuts, window_)

  /** Per-window POPULATION STABILITY INDEX over the stored cuts — the
    * single number production monitors alert on, folded from the same
    * bucket frame [[bucketDrift]] emits: PSI = Σ_b (aᵢ − eᵢ)·ln(aᵢ/eᵢ)
    * with a = the window's bucket fractions, e = the BASELINE's (the
    * cut-training set), both as clamped integer ppm (≥ 1, the standard
    * zero-bucket epsilon) so every input to the log is an integer in
    * [1, 10⁶].
    *
    * Oracle exactness: the log is [[graft.functions.DetMath]]'s
    * deterministic kernel, NOT the engine's `ln` (measured 1-ulp
    * divergent between the JVM and DuckDB on 24/10⁶ of exactly these
    * inputs), and the fold is a fixed ascending-bucket left fold — so the
    * DuckDB twin reproduces the doubles bit for bit, the t_gini/t_lmscore
    * integer-exact discipline extended to a transcendental metric.
    *
    * Streaming shape: ONE windowed aggregation (per-bucket counts as
    * nBuckets+2 conditional sums — the bucket domain is structural, so
    * the "agg of an agg" a naive two-level fold needs never arises), PSI
    * as a pure projection; state per window is nBuckets+3 counters.
    * Baseline fractions fold on the DRIVER from the ≤ nBuckets+2-row
    * bucketed baseline (stats-as-data, [[DetMath.detLn]] is
    * bit-identical to the SQL kernel) and ride the plan as literals — no
    * stream-static join after aggregation, which Spark disallows. */
  private def psiAgg(df: DataFrame, tsCol: String, cuts: DataFrame,
                     baseline: DataFrame, baselineCol: String,
                     window_ : String): DataFrame = {
    import graft.functions.DetMath
    val nCuts = cuts.count().toInt
    require(nCuts >= 1, "psiAgg: empty cuts frame")
    val slots = -1 until nCuts
    // Baseline ppm per bucket, clamped like the window side; ln via the
    // deterministic kernel on the driver (bit-identical to the SQL form).
    val baseCounts = graft.sources.TableStats.withCutBucket(
        baseline.select(col(baselineCol).cast("bigint").as("v"))
          .where(col("v").isNotNull), "v", cuts)
      .groupBy("bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baseTotal = baseCounts.values.sum
    require(baseTotal > 0, "psiAgg: empty baseline")
    val ePpm = slots.map(b => math.max(1L, baseCounts.getOrElse(b.toLong, 0L) * 1000000L / baseTotal))
    val eLn = ePpm.map(DetMath.detLn)
    val bucketed = graft.sources.TableStats.withCutBucket(
      df.withColumn("__cents", expr("cast(floor(value * 100) as bigint)"))
        .where(col("__cents").isNotNull),
      "__cents", cuts)
    val countCols = slots.map(b =>
      sum(when(col("bucket") === b, 1L).otherwise(0L)).as(s"__c_${b + 1}"))
    val agged = bucketed
      .groupBy(window(col(tsCol), window_))
      .agg(count(lit(1)).as("n_rows"), countCols: _*)
    // Window-side ppm + deterministic ln as array steps (short lambda
    // vars keep the kernel text small); the term fold is a left fold in
    // ascending bucket order — both choices mirrored exactly in the twin.
    val acArr = slots.map(b => s"__c_${b + 1}").mkString("array(", ", ", ")")
    val eppmArr = ePpm.map(v => s"${v}L").mkString("array(", ", ", ")")
    val elnArr = eLn.map(d => s"CAST('$d' AS DOUBLE)").mkString("array(", ", ", ")")
    agged
      .withColumn("__ap", expr(
        s"transform($acArr, c -> greatest(CAST(1 AS BIGINT), (c * CAST(1000000 AS BIGINT)) div n_rows))"))
      .withColumn("__am", expr(s"transform(__ap, v -> ${DetMath.floorLog2Sql("v")})"))
      .withColumn("__af", expr(
        "zip_with(__ap, __am, (v, m) -> CAST(v AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), m) AS DOUBLE))"))
      .withColumn("__ay", expr(
        "transform(__af, f -> ((f - CAST(1 AS DOUBLE)) / (f + CAST(1 AS DOUBLE))))"))
      .withColumn("__as", expr(s"transform(__ay, y -> ${DetMath.seriesSql("y")})"))
      .withColumn("__al", expr(s"zip_with(__am, __as, (m, s) -> ${DetMath.lnFromPartsSql("m", "s")})"))
      .withColumn("__terms", expr(
        s"""transform(sequence(0, ${nCuts}), i ->
           |  (CAST(element_at(__ap, i + 1) - element_at($eppmArr, i + 1) AS DOUBLE)
           |     / CAST(1000000 AS DOUBLE))
           |  * (element_at(__al, i + 1) - element_at($elnArr, i + 1)))""".stripMargin))
      .withColumn("psi", expr("aggregate(__terms, CAST(0 AS DOUBLE), (s, t) -> s + t)"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("n_rows"), col("psi"))
  }

  /** STREAMING PSI drift summary — [[psiAgg]] on watermarked event-time
    * windows; one row per closed window, the alerting signal next to
    * [[bucketDrift]]'s per-bucket detail. */
  def bucketDriftPsi(events: DataFrame, cuts: DataFrame,
                     baseline: DataFrame, baselineCol: String = "cents",
                     window_ : String = "1 day",
                     watermark: String = "1 hour"): DataFrame =
    psiAgg(
      events
        .withColumn("ts_tz", col("ts").cast("timestamp"))
        .withWatermark("ts_tz", watermark),
      "ts_tz", cuts, baseline, baselineCol, window_)

  /** Batch twin of [[bucketDriftPsi]] (the `st_drift_psi` oracle row —
    * same fold via [[psiAgg]], no watermark; st_window convention). */
  def bucketDriftPsiBatch(events: DataFrame, cuts: DataFrame,
                          baseline: DataFrame, baselineCol: String = "cents",
                          window_ : String = "1 day"): DataFrame =
    psiAgg(events, "ts", cuts, baseline, baselineCol, window_)

  /** Stream-static enrichment: join the event stream against a bounded
    * dimension. The broadcast hint makes every micro-batch a map-side
    * hash join — no stream-side state at all, and the dim is re-resolved
    * per batch (so a dim backed by a table picks up slowly-changing
    * updates between batches). The left join preserves events with no dim
    * match rather than dropping them mid-pipeline. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** Watermarked stream-stream inner join: pair each left event with the
    * right-stream events for the same key whose event time falls within
    * `[left.ts, left.ts + maxDelaySeconds]` — the orders×payments shape.
    * BOTH sides carry watermarks and the join condition bounds event time
    * in both directions, so Spark can evict state: each side holds only
    * the watermark horizon + delay window, not the whole stream (the
    * unbounded-state trap of an unconstrained stream-stream join).
    * Input schema both sides: (event_id, ts TIMESTAMP/NTZ, user_id,
    * event_type, value); output pairs left and right ids/times per key. */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       maxDelaySeconds: Long = 600,
                       watermark: String = "30 minutes"): DataFrame = {
    val l = left
      .withColumn("l_ts", col("ts").cast("timestamp"))
      .withWatermark("l_ts", watermark)
      .select(col("event_id").as("l_id"), col("l_ts"), col("user_id"),
        col("value").as("l_value"))
    val r = right
      .withColumn("r_ts", col("ts").cast("timestamp"))
      .withWatermark("r_ts", watermark)
      .select(col("event_id").as("r_id"), col("r_ts"), col("user_id").as("r_user"),
        col("value").as("r_value"))
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxDelaySeconds SECONDS"))
      .select(col("user_id"), col("l_id"), col("r_id"), col("l_ts"), col("r_ts"),
        col("l_value"), col("r_value"))
  }

  /** Batch twin of [[sessionize]]: gaps-and-islands — a session boundary
    * wherever the gap to the previous event (per user, event-time order,
    * event_id tie-break) exceeds `gapMs`; the running count of boundaries
    * is the session id. Two window passes over ONE shuffle on user_id
    * (same partitioning, Spark reuses the exchange and sort), then the
    * per-session aggregate. Oracle-checked (`st_sessions`), which pins the
    * session semantics the streaming state machine implements. */
  def sessionizeBatch(events: DataFrame, gapMs: Long = SessionGapMs): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_micros(col("ts").cast("timestamp")) - unix_micros(col("__prev").cast("timestamp")) > gapMs * 1000L, 1L)
        .otherwise(0L))
      .withColumn("sess_id",
        sum("__new").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_id")
      .agg(
        min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"), sum("value").as("total"))
  }

  /** Rolling window-frame statistics per user over event time: for every
    * event, the sum and count of the last `frame` events (ROWS BETWEEN
    * frame-1 PRECEDING AND CURRENT ROW) plus the gap to the previous event
    * — the moving-average / inter-arrival signals a time-series feed needs
    * and the one window FRAME shape (bounded rowsBetween) nothing else in
    * the library exercises (the reference's windows are rank-only D3/W1 and
    * whole-partition W2).
    *
    * Scale shape: the frame sum, the count, and the lag all run over the
    * SAME (user_id, ts, event_id) window, so one exchange on user_id and
    * one in-partition sort serve all three — adding signals costs
    * projections, not shuffles. Frame state per row is `frame` values,
    * independent of corpus size.
    *
    * Exactness: the measure is floored to integer cents BEFORE the frame
    * sum (a ROWS-frame float sum is evaluation-order-dependent across
    * engines — DuckDB's segment-tree accumulation vs Spark's sliding
    * fold); the gap is exact integer microseconds. */
  def rollingStats(events: DataFrame, frame: Int = 5): DataFrame = {
    require(frame >= 1, s"frame must be >= 1, got $frame")
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val framed = byUser.rowsBetween(-(frame - 1), Window.currentRow)
    events
      .withColumn("__cents", expr("cast(floor(value * 100) as bigint)"))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        sum("__cents").over(framed).as("roll_sum_cents"),
        count(lit(1)).over(framed).as("roll_n"),
        (unix_micros(col("ts").cast("timestamp")) -
          unix_micros(lag(col("ts"), 1).over(byUser).cast("timestamp")))
          .as("gap_us"))
  }

  /** Per-user behavioral token sequence: events in (ts, event_id) order,
    * each rendered as `event_type_v` where v = floor(value·10) mod 100 —
    * the token enrichment is the load-bearing knob, in BOTH directions.
    * Too coarse (raw ~5-type alphabet): every user's k-gram set saturates
    * the tiny shingle space and ALL pairs look alike (measured: 11 k of
    * 11 k pairs share shingles, none reach Jaccard 0.5). Slightly coarse
    * (~50 symbols, one value digit): the 125 k 3-gram space SATURATES
    * once postings reach it, per-shingle df then grows ∝ users and the
    * pair join goes Σdf² ∝ users² — measured exp 1.79 over sf1→sf10
    * (2.5 s → 154 s) with 17.3 M Σdf² at sf1 already. At ~500 composite
    * symbols the 3-gram space is ~1.25·10⁸: postings land on mostly-
    * unique shingles (df ≈ 1), Σdf² tracks postings, and candidates stay
    * linear — re-measured 2.4 s at sf1 / 7.3 s at sf10, exp 0.49 (after
    * the same rehearsal also exposed a FIXTURE artifact: GenScale's
    * key-shift-only event replicas left every user an identical
    * behavioral clone in every replica, which this operator dutifully
    * reported as a quadratically growing pair mass; events now
    * content-decorrelate per replica like text/embeddings always did).
    * The general rule: alphabet^k must dominate total POSTINGS (users ×
    * sequence length), not merely the user count — saturation, not
    * population, is what turns the posting join quadratic. Exact replays
    * share exact tokens, so enrichment never costs twin recall.
    * Output is `(doc_id, text)` — the document-shaped frame the whole
    * text-dedup family accepts unchanged.
    *
    * One user_id shuffle; the ordered aggregation is the c_seqtext idiom
    * (sort structs, then project) so the sequence is deterministic under
    * any partitioning. NULL-safe: both token parts are coalesced, so a
    * null type/value can never make collect_list and the DuckDB twin's
    * `list()` disagree on null handling. */
  def userSequences(events: DataFrame): DataFrame =
    events
      .withColumn("__tok", expr(
        "concat(coalesce(event_type, ''), '_', CAST(CAST(floor(coalesce(value, 0.0) * 10) AS BIGINT) % 100 AS STRING))"))
      .groupBy("user_id")
      .agg(expr(
        "concat_ws(' ', transform(array_sort(collect_list(struct(ts, event_id, __tok))), s -> s.__tok))")
        .as("text"))
      .select(col("user_id").as("doc_id"), col("text"))

  /** Behavioral near-duplicate users (bot detection, replayed streams,
    * shared automation): n-gram Jaccard over [[userSequences]] — a pure
    * composition into [[graft.llmdata.DocDedup.ngramJaccardPairs]], so
    * candidates are shingle-bucket-local, never users × users. Pick k so
    * alphabet^k ≫ total POSTINGS — users × sequence length, not merely
    * the user count (see [[userSequences]]'s saturation measurements):
    * k = 3 over the shipped ~500 composite symbols (event_type × two
    * value digits) gives a ~1.25·10⁸ shingle space, which holds df ≈ 1
    * to ~10⁷ postings (≈ 10⁵–10⁶ users at typical sequence lengths);
    * raise k or widen the value digits beyond that. */
  def sequenceNearDup(events: DataFrame, k: Int = 3,
                      threshold: Double = 0.5): DataFrame =
    graft.llmdata.DocDedup.ngramJaccardPairs(userSequences(events), k, threshold)

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long, total: Double)

  final case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                               session_end: java.sql.Timestamp, n_events: Long, total: Double)

  /** Session gap in ms before a user's activity closes into a session row. */
  val SessionGapMs: Long = 30L * 60 * 1000

  /** Custom stateful sessionization: one state entry per user, closed and
    * emitted when no event arrives within the gap (event-time timeout keyed
    * to the watermark). The state is O(active users), not O(events). */
  def sessionize(spark: SparkSession, events: DataFrame,
                 watermark: String = "30 minutes"): Dataset[UserSession] = {
    import spark.implicits._
    events
      .withColumn("ts_tz", col("ts").cast("timestamp"))
      .withWatermark("ts_tz", watermark)
      .select(col("event_id"), col("ts_tz").as("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSession(userId,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.lastSeen),
              s.nEvents, s.total))
          } else {
            val events = batch.toSeq
            val closed = Seq.newBuilder[UserSession]
            var cur = state.getOption
            events.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                // Within gap of the session INTERVAL [start, lastSeen] —
                // the signed `t - lastSeen` test alone would merge a late
                // event arbitrarily far BEFORE the session (any negative
                // distance passes), and never extend `start` backwards.
                case Some(s) if t >= s.start - SessionGapMs && t - s.lastSeen <= SessionGapMs =>
                  cur = Some(s.copy(start = math.min(s.start, t),
                    lastSeen = math.max(s.lastSeen, t),
                    nEvents = s.nEvents + 1, total = s.total + e.value))
                // Late event more than a gap BEFORE the current session:
                // a stand-alone past session (anything mergeable with it
                // would already have arrived — batch events are sorted, so
                // only cross-batch lateness reaches here). Emit directly.
                case Some(s) if t < s.start - SessionGapMs =>
                  closed += UserSession(userId, new java.sql.Timestamp(t),
                    new java.sql.Timestamp(t), 1, e.value)
                case Some(s) =>
                  closed += UserSession(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.lastSeen), s.nEvents, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Close via timeout once the watermark passes the gap. Spark
              // rejects timeouts at/below the current watermark (possible
              // when a batch carries events older than watermark - gap), so
              // clamp just above it — the session then closes on the next
              // watermark advance, which is the earliest legal moment.
              state.setTimeoutTimestamp(
                math.max(s.lastSeen + SessionGapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }
}
