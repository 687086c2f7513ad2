package graft.registry

import graft.sink.{Layouts, ParquetSink, PartitionedParquetSink, WriteMode}
import graft.sources.Tables
import graft.streaming.{DocStream, EventStream}
import java.time.LocalDate
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** CORRECTNESS rows for the infrastructure operators that aren't plain
  * queries: the keyed-merge sink (K2) and the day-range scan (S3/C5).
  *
  * Each registered fn materializes its scaffolding under a per-SF temp dir
  * (fresh every run), exercises the real operator, and returns the final
  * state as a DataFrame; the oracle recomputes the expected state purely
  * from the fixture parquet in DuckDB. Side-effecting by design — the
  * side effects are the operators under test.
  */
object InfraOps {

  private def scratch(spark: SparkSession, sfDir: String, name: String): String = {
    // Per-JVM path (RunScratch) so two concurrent Verify/Bench runs on the
    // same sfDir can't race each other's scaffolding; still deleted on
    // entry so repeated invocations WITHIN a JVM start fresh.
    val dir = new Path(graft.core.RunScratch.dir(s"graft_$name", sfDir))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    dir.toString
  }

  /** K2 round-trip: merge two overlapping keyed batches; final state =
    * batch2 rows + batch1 rows whose key batch2 didn't touch. */
  def mergeRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_name", "p_retailprice")
    val batch1 = part.filter(col("p_partkey") % 3 =!= 0).withColumn("src", lit(1))
    val batch2 = part.filter(col("p_partkey") % 2 === 0).withColumn("src", lit(2))
    val sink = new ParquetSink(spark, scratch(spark, sfDir, "k_merge") + "/t")
    sink.mergeByKey(batch1, Seq("p_partkey"))
    sink.mergeByKey(batch2, Seq("p_partkey"))
    sink.read()
  }

  /** S3/C5 round-trip: lay a week of events out as
    * `{bucket}/ev/YYYY/MM/DD.parquet` (slice d holds `event_id % 7 = d-1`),
    * then day-range-scan days 2-4 — asserting the path enumeration reads
    * exactly the in-window files. */
  def dayRangeRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = scratch(spark, sfDir, "s3_range")
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    (1 to 7).foreach { d =>
      ev.filter(col("event_id") % 7 === (d - 1))
        .write.mode("overwrite").parquet(f"$bucket/ev/2026/01/$d%02d.parquet")
    }
    Tables.dayRangeScan(spark, bucket, "ev",
      LocalDate.of(2026, 1, 2), LocalDate.of(2026, 1, 4))
  }

  /** K3 round-trip: pre-seed stale rows, Replace (must drop them), then
    * Append; final state = the two post-replace batches only. */
  def replaceAppendRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_name", "p_retailprice")
    val stale = part.filter(col("p_partkey") % 5 === 0).withColumn("yr", lit(1999))
    val b2023 = part.filter(col("p_partkey") % 3 === 0).withColumn("yr", lit(2023))
    val b2024 = part.filter(col("p_partkey") % 3 === 1).withColumn("yr", lit(2024))
    val sink = new ParquetSink(spark, scratch(spark, sfDir, "k_replace") + "/t")
    sink.write(stale, WriteMode.Append)
    sink.write(b2023, WriteMode.Replace)
    sink.write(b2024, WriteMode.Append)
    sink.read()
  }

  /** Zipf-skewed shuffle-join fixture: ~90% of lineitem rows land on skew
    * key 1, the rest spread over keys 2-99; the dim side carries keys
    * 1-99 so the hot key SURVIVES the inner join. Both variants force a
    * sort-merge join (`merge` hint — no broadcast escape hatch at fixture
    * scale), so the bench pair isolates exactly the effect salting
    * removes: one reducer owning the whole hot key. AQE's skew split
    * stays out of the picture here because fixture partitions are far
    * below `skewedPartitionThresholdInBytes`; at cluster scale both
    * mitigations apply and salting still wins when the skew is known
    * up front (no materialize-then-replan round trip). */
  private def skewSides(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    // ×16 deterministic replica explode: the hot key must own enough rows
    // (~8.6M at sf0.1) for one reducer's sort to dominate wall clock even
    // on a COLD single-shot run (the driver's bench) — unamplified,
    // scan+shuffle+codegen costs mask the hot partition entirely.
    val big = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        expr("CASE WHEN l_orderkey % 10 < 9 THEN 1 ELSE 1 + l_suppkey % 99 END").as("k"),
        col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      .withColumn("rep", explode(expr("sequence(1, 16)")))
    val dim = spark.read.parquet(s"$sfDir/part.parquet")
      .filter(col("p_partkey") < 100)
      .select(col("p_partkey").as("k"), col("p_name"))
      .hint("merge")
    (big, dim)
  }

  private def skewAgg(joined: DataFrame): DataFrame =
    joined.groupBy("k")
      .agg(count(lit(1)).cast("bigint").as("n_rows"),
        sum("l_quantity").cast("double").as("sum_qty"))

  /** The skewed join WITHOUT mitigation — the bench baseline whose hot
    * key serializes one reducer. */
  def skewedJoinPlain(spark: SparkSession, sfDir: String): DataFrame = {
    val (big, dim) = skewSides(spark, sfDir)
    skewAgg(big.join(dim, Seq("k")))
  }

  /** The same join through [[SkewJoin.saltedJoin]] (salt on the
    * high-cardinality (l_orderkey, l_linenumber) so duplicate rows don't
    * share a salt) — same rows out, hot key scattered across 32 salts. */
  def skewedJoinSalted(spark: SparkSession, sfDir: String): DataFrame = {
    val (big, dim) = skewSides(spark, sfDir)
    skewAgg(graft.core.SkewJoin.saltedJoin(big, dim, Seq("k"),
      saltFactor = 32, saltOn = Seq("l_orderkey", "l_linenumber", "rep")))
  }

  /** K3+ round-trip for the partition-scoped sink: write yr=2023 and
    * yr=2024, then re-Replace ONLY 2024 with a different slice. The final
    * state proves dynamic partition overwrite semantics — 2023 survives a
    * 2024-only re-run, and the second 2024 batch fully supersedes the
    * first (no replace-on-first-written ordering anywhere). */
  def partitionReplaceRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_name", "p_retailprice")
    val b2023 = part.filter(col("p_partkey") % 3 === 0).withColumn("yr", lit(2023))
    val b2024a = part.filter(col("p_partkey") % 3 === 1).withColumn("yr", lit(2024))
    val b2024b = part.filter(col("p_partkey") % 7 === 2).withColumn("yr", lit(2024))
    val sink = new PartitionedParquetSink(
      spark, scratch(spark, sfDir, "k_partreplace") + "/t", "yr")
    sink.write(b2023, WriteMode.Replace)
    sink.write(b2024a, WriteMode.Replace)
    sink.write(b2024b, WriteMode.Replace)
    sink.read()
  }

  /** Batch twin of the streaming windowed aggregation (see
    * [[EventStream.windowedRevenueBatch]]): identical `window()` bucketing,
    * oracle-checked against DuckDB `time_bucket`. The measure is floored
    * per-row before summing — like every float measure in the fixtures — so
    * the double aggregate is exact and order-independent in both engines. */
  def windowAggBatch(spark: SparkSession, sfDir: String): DataFrame =
    EventStream.windowedRevenueBatch(
      Tables.events(spark, sfDir)
        .withColumn("value", expr("cast(floor(value) as double)")))

  /** Batch twin of the streaming ingest dedup (see
    * [[DocStream.dedupBatchTwin]]): first-arriving copy per content
    * fingerprint, with doc_id as arrival order. */
  def streamDedupBatch(spark: SparkSession, sfDir: String): DataFrame =
    DocStream.dedupBatchTwin(spark.read.parquet(s"$sfDir/documents.parquet"))

  /** Batch twin of the streaming LSH near-dup detector (the
    * `flatMapGroupsWithState` path, [[DocStream.lshNearDupStream]]) — same
    * bucket-local candidates, same signature-agreement estimate, so the
    * streaming output is spec-checked against this exact frame and this
    * frame is oracle-checked against DuckDB. */
  def streamNearDupBatch(spark: SparkSession, sfDir: String): DataFrame =
    DocStream.lshNearDupEstBatchTwin(spark.read.parquet(s"$sfDir/documents.parquet"))

  /** Batch twin of the streaming cluster maintenance
    * ([[DocStream.clusterMaintain]]): component labels of the est-Jaccard
    * pair graph. The streaming store is spec-checked equal to this frame
    * under scripted batch splits (DocStreamSpec), and this frame is
    * oracle-checked against the TRUE components (recursive closure) in
    * DuckDB — the st_window/st_drift convention on the cluster axis. */
  def streamClustersBatch(spark: SparkSession, sfDir: String): DataFrame =
    DocStream.clusterMaintainBatchTwin(spark.read.parquet(s"$sfDir/documents.parquet"))

  /** Batch twin of the streaming triangle-count maintenance
    * ([[DocStream.triangleMaintain]]): exact per-node counts over the
    * est-Jaccard pair graph. The streaming store is spec-pinned equal to
    * this frame after EVERY batch prefix (DocStreamSpec — exactness, not
    * just final-state equality), and this frame is oracle-checked against
    * the same degree-oriented triangle chain in DuckDB — the st_clusters
    * convention on the density axis. */
  def streamTrianglesBatch(spark: SparkSession, sfDir: String): DataFrame =
    DocStream.triangleMaintainBatchTwin(spark.read.parquet(s"$sfDir/documents.parquet"))

  /** The STREAMING ingest path itself as a correctness row — not a batch
    * twin: the documents corpus is replayed through a real MemoryStream →
    * [[DocStream.ingestToStore]] query in scripted micro-batches, and what
    * the oracle checks is the FINAL STORE CONTENTS after the stream stops.
    *
    * Batch scripting is what makes the run deterministic: micro-batch i
    * carries every dedup key's i-th copy (row_number by doc_id within the
    * (fingerprint, fingerprint2) pair), so no batch contains a
    * within-batch duplicate — the one place where
    * `dropDuplicatesWithinWatermark` would keep an arbitrary row. The
    * first-copy batch arrives first, so the stream's first-arrival-wins
    * contract coincides with min-doc_id-wins, which the DuckDB twin can
    * compute statically. All rows share one event time, so the watermark
    * never declares anything late. The driver-side collect is the test
    * harness feeding the stream (`MemoryStream.addData` takes local rows,
    * exactly as the streaming specs do), not operator logic — the
    * admission path under test runs fully distributed. */
  def streamIngestStore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = scratch(spark, sfDir, "st_ingest_store")
    // Deterministic quarter of the corpus: every micro-batch pays fixed
    // streaming overhead (state-store commits × 32 partitions, checkpoint
    // writes, a crash-safe store rewrite), so the full corpus made this
    // the bench's most expensive row (~20 s at sf0.1) while proving
    // nothing more IN KIND than a quarter does — the scripted dup-rank
    // batches, watermark eviction, and full replay rejection below are
    // corpus-size-independent behaviors. Oracle carries the same gate.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") % 4 === 0)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("fingerprint", "fingerprint2").orderBy("doc_id")
    val all = DocStream.withFingerprint(docs)
      .select(col("doc_id"), col("text"), row_number().over(win).as("rk"))
      .collect()
    val byRank = all.groupBy(_.getInt(2)).toSeq.sortBy(_._1)
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val tLate = java.sql.Timestamp.valueOf("2026-01-01 12:00:00")
    val sink = new ParquetSink(spark, s"$root/store")
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    // The dedup state is partitioned by spark.sql.shuffle.partitions AT
    // QUERY START and every micro-batch commits every state partition
    // (delta files + snapshot bookkeeping), so at the session's 32 the
    // scripted ~5-batch run spent its time on 160 state commits of a few
    // hundred rows each — not on data. 4 partitions is plenty for the
    // row's corpus and is a per-query setting (restored immediately), not
    // a semantic change: at real scale the state sizing follows the real
    // ingest rate, exactly as a production streaming job would size it.
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    // The conf is captured into each micro-batch's plan as it runs, so it
    // stays pinned for the stream's whole life and is restored whatever
    // happens — everything after this row runs at the session's 32.
    try {
      val q = DocStream.ingestToStore(
        mem.toDF().toDF("doc_id", "ts", "text"), sink, s"$root/ckpt")
      try {
        byRank.foreach { case (_, rows) =>
          mem.addData(rows.toSeq.map(r => (r.getLong(0), t0, r.getString(1))))
          q.processAllAvailable()
        }
        // Past-horizon replay — the scenario only the STORE can defend
        // against. First a watermark advancer 2h ahead (itself a duplicate,
        // dropped in flight, admits nothing) evicts the t0-keyed dedup
        // state; then EVERY document re-arrives with a new doc_id and
        // whitespace-mutated text (same fingerprint). The streaming state is
        // gone, so each replay reaches the sink's anti-join — which must
        // reject all of them, or the oracle sees foreign doc_ids.
        mem.addData(Seq((9000000L, tLate, all.head.getString(1))))
        q.processAllAvailable()
        mem.addData(all.toSeq.map(r => (r.getLong(0) + 1000000L, tLate, " " + r.getString(1) + " ")))
        q.processAllAvailable()
      } finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    sink.read().select("doc_id", "fingerprint")
  }

  /** L83 as a real oracle row — the SNAPSHOT twin of [[streamIngestStore]]:
    * the corpus replays through [[DocStream.ingestToSnapshots]] in scripted
    * micro-batches and what the oracle checks is the final VERSION LINEAGE
    * (every version's full contents, version numbers included) — i.e. not
    * just where the store ended up but the exact history the stream
    * committed getting there.
    *
    * Scripting: rows rank per FINGERPRINT (the admission key) by doc_id.
    * The rank-1 rows (each fingerprint's first arrival) feed in three
    * deterministic slices by `(doc_id/4) % 3` — one fingerprint belongs to
    * exactly one slice, so the run commits exactly v1 ⊂ v2 ⊂ v3 and slice
    * membership is statically computable by the DuckDB twin. Everything
    * after must commit NOTHING: per-rank duplicate batches (admission
    * anti-join hits), then a watermark advance plus a whitespace-mutated
    * full replay past the horizon (streaming state evicted, so rejection
    * must come from the HEAD anti-join — and an empty admission must not
    * burn a version). A wrong version count, a version containing a
    * replayed doc_id, or churn versions from empty batches all surface as
    * oracle row mismatches. Same quarter-corpus gate and state-partition
    * sizing rationale as `st_ingest_store`. */
  def streamIngestSnapshots(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = scratch(spark, sfDir, "st_snapshot_lineage")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") % 4 === 0)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("fingerprint").orderBy("doc_id")
    val all = DocStream.withFingerprint(docs)
      .select(col("doc_id"), col("text"), row_number().over(win).as("rk"))
      .collect()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val tLate = java.sql.Timestamp.valueOf("2026-01-01 12:00:00")
    val store = new graft.sink.SnapshotStore(spark, s"$root/snaps")
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = DocStream.ingestToSnapshots(
        mem.toDF().toDF("doc_id", "ts", "text"), store, s"$root/ckpt")
      try {
        (0 until 3).foreach { slice =>
          val rows = all.filter(r => r.getInt(2) == 1 && (r.getLong(0) / 4) % 3 == slice)
          mem.addData(rows.toSeq.map(r => (r.getLong(0), t0, r.getString(1))))
          q.processAllAvailable()
        }
        val maxRk = all.map(_.getInt(2)).max
        (2 to maxRk).foreach { rk =>
          val rows = all.filter(_.getInt(2) == rk)
          mem.addData(rows.toSeq.map(r => (r.getLong(0), t0, r.getString(1))))
          q.processAllAvailable()
        }
        mem.addData(Seq((9000000L, tLate, all.head.getString(1))))
        q.processAllAvailable()
        mem.addData(all.toSeq.map(r => (r.getLong(0) + 1000000L, tLate, " " + r.getString(1) + " ")))
        q.processAllAvailable()
      } finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    store.versions
      .map(v => store.read(v).select(lit(v).as("version"), col("doc_id"), col("fingerprint")))
      .reduce(_ unionByName _)
  }

  /** L48's stream-static enrichment as a real oracle row — the last
    * MemoryStream-spec-only family member promoted to the hash-compared
    * gate (its stream-stream sibling `st_joined` was promoted in round
    * 10). [[EventStream.enrich]] left-joins each micro-batch against a
    * broadcast static dimension: no watermark, no stream state at all —
    * every event appears in exactly one batch and is enriched (or
    * null-padded) there, so the stream's COMPLETE output across any
    * slicing equals the batch left join the DuckDB twin states directly
    * (slices here are `event_id % 3`, deliberately NOT time-ordered —
    * enrichment is order-independent and the row should pin that).
    * Same quarter-corpus gate (user_id % 4 = 1) and 4-partition state
    * sizing as the other streaming rows; the dim drops every third
    * customer so the left join's null-preserving branch is exercised,
    * not just the happy path. The collect is slice scripting; the
    * enrich itself runs as a real streaming query per micro-batch. */
  def streamEnriched(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = scratch(spark, sfDir, "st_enrich")
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id") % 4 === 1)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey").as("user_id"), col("c_name"), col("c_nationkey"))
    val mem = MemoryStream[(Long, java.time.LocalDateTime, Long, String, Double)]
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val enriched = EventStream.enrich(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
        dim, "user_id")
      val q = enriched.writeStream.format("memory").queryName("graft_st_enrich")
        .option("checkpointLocation", s"$root/ckpt").outputMode("append").start()
      try {
        (0 until 3).foreach { slice =>
          mem.addData(ev.filter(_._1 % 3 == slice).toSeq)
          q.processAllAvailable()
        }
      } finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    spark.table("graft_st_enrich")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("c_name"), col("c_nationkey"))
  }

  /** L48's watermarked stream-stream join as a real oracle row — the last
    * MemoryStream-only streaming family member promoted to the hash-
    * compared gate. [[EventStream.streamStreamJoin]] (view × purchase per
    * user, purchase within 6 h of the view) replays a deterministic
    * quarter of the event fixture through two MemoryStreams in three
    * ts-ordered micro-batch slices, so the stream's COMPLETE output is
    * exactly the batch interval join the DuckDB twin states directly.
    *
    * Why nothing can be lost or duplicated: slices partition the events
    * in event-time order, so no arriving row is ever behind the
    * watermark (never late-dropped), and a left row's state is evicted
    * only once the watermark passes `l_ts + delay` — by which point every
    * right row inside its window (all ≤ `l_ts + delay` < watermark) has
    * either arrived in an earlier slice or would itself be late, which
    * ts-ordering rules out. Inner-join append emits each match in the
    * first batch where both sides are present, exactly once. Same
    * quarter-corpus gate and 4-partition state sizing rationale as
    * `st_ingest_store`; the collect is scripting, not operator logic —
    * the join itself runs as a real streaming query with state store and
    * checkpoints. */
  def streamJoined(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = scratch(spark, sfDir, "st_joined")
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id") % 4 === 0 && col("event_type").isin("view", "purchase"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val slices = {
      val per = math.max(1, (ev.length + 2) / 3)
      ev.grouped(per).toSeq
    }
    val lMem = MemoryStream[(Long, java.time.LocalDateTime, Long, String, Double)]
    val rMem = MemoryStream[(Long, java.time.LocalDateTime, Long, String, Double)]
    def df(m: MemoryStream[(Long, java.time.LocalDateTime, Long, String, Double)]) =
      m.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    // r15 optimization: no-data micro-batches exist to evict state and
    // emit watermark-gated OUTER-side results while input is idle — an
    // INNER-append join emits only on data, so each scripted slice was
    // paying a second, output-empty micro-batch (4 partitions × 4 join
    // state stores committed again) purely for earlier state cleanup.
    // Admission is unchanged (a data batch's watermark derives from the
    // PREVIOUS data batch either way), so the output is row-identical —
    // oracle re-verified; state merely lives until the next data batch,
    // which for this bounded replay is the next slice. Per-query setting,
    // restored in the finally below; the library operator keeps the
    // default (production idle streams may want idle-time cleanup).
    val prevNoData = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      val joined = EventStream.streamStreamJoin(df(lMem), df(rMem),
        maxDelaySeconds = 21600)
      val q = joined.writeStream.format("memory").queryName("graft_st_joined")
        .option("checkpointLocation", s"$root/ckpt").outputMode("append").start()
      try {
        slices.foreach { s =>
          lMem.addData(s.filter(_._4 == "view").toSeq)
          rMem.addData(s.filter(_._4 == "purchase").toSeq)
          q.processAllAvailable()
        }
      } finally q.stop()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
    }
    // UTC-pinned session makes the TZ→NTZ cast value-preserving; emit NTZ
    // so the parquet dump hash-matches DuckDB's plain TIMESTAMP.
    spark.table("graft_st_joined")
      .select(col("user_id"), col("l_id"), col("r_id"),
        col("l_ts").cast("timestamp_ntz").as("l_ts"),
        col("r_ts").cast("timestamp_ntz").as("r_ts"),
        col("l_value"), col("r_value"))
  }

  /** Bucketed co-located join round-trip: bucket lineitem and orders on
    * their join key at write time, then join + aggregate the catalog
    * tables. The join runs with NO exchange on either side (asserted in
    * the plan-shape test); the oracle checks the values against a plain
    * join of the raw fixtures. */
  def bucketedJoinRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val base = scratch(spark, sfDir, "k_bucket")
    Layouts.writeBucketedTable(
      spark.read.parquet(s"$sfDir/lineitem.parquet").select("l_orderkey", "l_quantity"),
      "graft_li_bkt", s"$base/li", "l_orderkey", 8)
    Layouts.writeBucketedTable(
      spark.read.parquet(s"$sfDir/orders.parquet").select("o_orderkey", "o_custkey"),
      "graft_ord_bkt", s"$base/ord", "o_orderkey", 8)
    bucketedJoinAgg(spark)
  }

  /** The join+agg over the bucketed catalog tables (split out so tests can
    * assert the exchange-free plan shape on exactly the shipped query). */
  def bucketedJoinAgg(spark: SparkSession): DataFrame =
    spark.table("graft_li_bkt")
      .join(spark.table("graft_ord_bkt"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum("l_quantity").cast("double").as("sum_qty"))

  /** Hive-partitioned write + partition-pruned read round-trip: events land
    * day-partitioned, the read filters on the partition column — the scan
    * shows `PartitionFilters` and never opens out-of-range directories
    * (asserted in the plan-shape test). Catalog-native twin of the
    * reference's path-enumeration pruning (S3/C5). */
  def partitionPruneRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val base = scratch(spark, sfDir, "s_partprune")
    Layouts.writePartitioned(
      Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("value"),
          dayofmonth(col("ts")).as("dd")),
      s"$base/ev", "dd")
    spark.read.parquet(s"$base/ev").filter(col("dd").between(10, 12))
      .select("event_id", "user_id", "value", "dd")
  }

  /** Salted-join round-trip: lineitem keyed on an artificially hot key
    * (l_suppkey % 10 — every row lands on 10 keys), dim replicated per
    * salt. Values must equal the plain join exactly (the oracle is the
    * UNsalted formulation); the aggregate keeps the dump small. */
  def saltedJoinRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    // NULL keys every 97th row: an equi-join (salted or not) must drop them
    // identically in both engines.
    val big = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"),
        expr("case when l_orderkey % 97 = 0 then cast(null as bigint) else l_suppkey % 10 end").as("k"),
        col("l_quantity"))
    val dim = spark.read.parquet(s"$sfDir/region.parquet")
      .select(col("r_regionkey").as("k"), col("r_name"))
    graft.core.SkewJoin.saltedJoin(big, dim, Seq("k"), saltFactor = 16)
      .groupBy("k", "r_name")
      .agg(count(lit(1)).as("n_rows"), sum("l_quantity").cast("double").as("sum_qty"))
  }

  /** As-of join: each event is enriched with the latest "snapshot" (every
    * 31st event, with a synthetic strictly-unique timestamp) at or before
    * its event time, per key group. The oracle is DuckDB's NATIVE
    * `ASOF LEFT JOIN` — an independent engine running an independent
    * algorithm over the same semantics, cross-checking the union-window
    * implementation in [[graft.core.AsofJoin]]. */
  def asofRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val left = ev.selectExpr(
      "event_id", "cast(user_id % 50 as bigint) as k", "ts as evt_ts")
    // Deliberate NULL coverage: every 7th snapshot has a NULL payload value
    // (must NOT leak an older snapshot's id), and keys 40-49 have no
    // snapshots at all (must NULL-extend) — the NULL paths DuckDB's native
    // ASOF JOIN then cross-checks independently.
    val right = ev.where("event_id % 31 = 0 and user_id % 50 < 40").selectExpr(
      "cast(user_id % 50 as bigint) as k",
      "TIMESTAMP_NTZ'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, event_id) as snap_ts",
      "case when event_id % 7 = 0 then cast(null as bigint) else event_id end as snap_id")
    graft.core.AsofJoin.asofBackward(left, right, Seq("k"), "evt_ts", "snap_ts",
      Seq("snap_id", "snap_ts"))
  }

  /** Forward as-of round-trip (earliest snapshot at-or-AFTER event time —
    * the "next scheduled change" join): same fixture as j_asof, opposite
    * direction; DuckDB's native ASOF with a `<=` condition is the
    * independent cross-check. */
  def asofForwardRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val left = ev.selectExpr(
      "event_id", "cast(user_id % 50 as bigint) as k", "ts as evt_ts")
    val right = ev.where("event_id % 31 = 0 and user_id % 50 < 40").selectExpr(
      "cast(user_id % 50 as bigint) as k",
      "TIMESTAMP_NTZ'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, event_id) as snap_ts",
      "case when event_id % 7 = 0 then cast(null as bigint) else event_id end as snap_id")
    graft.core.AsofJoin.asofForward(left, right, Seq("k"), "evt_ts", "snap_ts",
      Seq("snap_id", "snap_ts"))
  }

  /** Tolerance variant of the as-of round-trip: snapshots older than 7
    * days at event time are rejected (NULL-extended) — events in the
    * first week keep their match, later ones null out, so both outcomes
    * are exercised. Oracle = DuckDB's native ASOF LEFT JOIN with the
    * identical staleness CASE. */
  def asofToleranceRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val left = ev.selectExpr(
      "event_id", "cast(user_id % 50 as bigint) as k", "ts as evt_ts")
    val right = ev.where("event_id % 31 = 0 and user_id % 50 < 40").selectExpr(
      "cast(user_id % 50 as bigint) as k",
      "TIMESTAMP_NTZ'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, event_id) as snap_ts",
      "case when event_id % 7 = 0 then cast(null as bigint) else event_id end as snap_id")
    graft.core.AsofJoin.asofBackwardTolerance(left, right, Seq("k"), "evt_ts", "snap_ts",
      Seq("snap_id", "snap_ts"), toleranceSeconds = 604800L)
  }

  /** Range-join round-trip: events against derived per-key "maintenance
    * windows" (every 41st event opens a 1-5 hour window). The bucketized
    * equi-join must equal the plain inequality join the DuckDB oracle
    * runs. */
  def rangeJoinRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val points = ev.selectExpr(
      "event_id", "cast(user_id % 20 as bigint) as k", "ts as evt_ts")
    // Deliberate edge coverage: every 3rd window is DEGENERATE (end <=
    // start — must match nothing, not explode a descending bucket range)
    // and every 5th has a NULL key (equi-join semantics: matches nothing).
    val windows = ev.where("event_id % 41 = 0").selectExpr(
      "case when event_id % 205 = 0 then cast(null as bigint) else cast(user_id % 20 as bigint) end as k",
      "event_id as win_id",
      "date_trunc('hour', ts) as win_start",
      "case when event_id % 123 = 0 then date_trunc('hour', ts) " +
        "else date_trunc('hour', ts) + make_interval(0, 0, 0, 0, cast(1 + event_id % 5 as int)) end as win_end")
    graft.core.RangeJoin.pointInInterval(
      points, windows, "evt_ts", "win_start", "win_end",
      bucketSeconds = 3600L, keys = Seq("k"))
  }

  /** Interval-overlap join round-trip: event-derived segments × windows,
    * same edge coverage as j_range (degenerate right intervals — which
    * overlap NOTHING under nonempty-intersection semantics even when they
    * sit inside a left interval — and NULL keys). The bucketized
    * exactly-once equi-join must equal the oracle's plain
    * `greatest(starts) < least(ends)` inequality join. */
  def overlapJoinRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val segs = ev.where("event_id % 37 = 0").selectExpr(
      "event_id as a_id", "cast(user_id % 10 as bigint) as k",
      "date_trunc('hour', ts) as a_start",
      "date_trunc('hour', ts) + make_interval(0, 0, 0, 0, cast(1 + event_id % 3 as int)) as a_end")
    val wins = ev.where("event_id % 41 = 0").selectExpr(
      "case when event_id % 205 = 0 then cast(null as bigint) else cast(user_id % 10 as bigint) end as k",
      "event_id as b_id",
      "date_trunc('hour', ts) as b_start",
      "case when event_id % 123 = 0 then date_trunc('hour', ts) " +
        "else date_trunc('hour', ts) + make_interval(0, 0, 0, 0, cast(1 + event_id % 5 as int)) end as b_end")
    graft.core.RangeJoin.intervalOverlap(
      segs, wins, "a_start", "a_end", "b_start", "b_end",
      bucketSeconds = 3600L, keys = Seq("k"))
  }

  /** Band join round-trip: suppliers × customers of the SAME nation whose
    * account balances differ by at most $200 (exact integer cents — a
    * float band edge would be engine-dependent at the ulp). The bucketized
    * equi-join must equal the oracle's plain `|Δ| <= eps` inequality join;
    * negative balances (TPC-H acctbal goes to -999.99) exercise the
    * negative-bucket floor math. */
  def bandJoinRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet").selectExpr(
      "s_suppkey", "cast(s_nationkey as bigint) as k",
      "cast(floor(s_acctbal * 100) as bigint) as s_cents")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet").selectExpr(
      "c_custkey", "cast(c_nationkey as bigint) as k",
      "cast(floor(c_acctbal * 100) as bigint) as c_cents")
    graft.core.RangeJoin.bandJoin(sup, cust, "s_cents", "c_cents",
      eps = 20000L, keys = Seq("k"))
  }

  /** Rolling window-frame stats over the event feed (the bounded
    * rowsBetween frame family: moving sum/count of the last 5 events per
    * user + inter-arrival gap). */
  def rollingRoundTrip(spark: SparkSession, sfDir: String): DataFrame =
    EventStream.rollingStats(Tables.events(spark, sfDir))

  /** Batch twin of the stateful sessionization (gaps-and-islands): floored
    * measure like st_window so the float sum is exact in both engines. */
  def sessionsBatch(spark: SparkSession, sfDir: String): DataFrame =
    EventStream.sessionizeBatch(
      Tables.events(spark, sfDir)
        .withColumn("value", expr("cast(floor(value) as double)")))

  /** Small-file compaction round-trip: fragment events into 64 tiny files
    * (the state per-batch streaming sinks leave behind), compact into
    * range-clustered files of <= 2500 rows on event_id, return the
    * compacted store. The oracle pins content preservation (compaction
    * must be a pure layout change); the layout spec pins the file count
    * and the disjoint per-file key ranges that make footer min/max stats
    * prune reads afterwards. */
  def compactRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val base = scratch(spark, sfDir, "k_compact")
    Tables.events(spark, sfDir).select("event_id", "user_id", "value")
      .repartition(64).write.mode("overwrite").parquet(s"$base/frag")
    Layouts.compact(spark, s"$base/frag", s"$base/opt", Seq("event_id"), 2500L)
    spark.read.parquet(s"$base/opt")
  }

  /** Z-order round-trip: lineitem clustered on (l_orderkey, l_partkey),
    * stored with the Morton key, read back. The oracle recomputes the
    * in-plan min-max scaling and all 32 interleave terms — the key math
    * is hash-checked end to end; the data-skipping payoff (small per-file
    * rectangles in BOTH dimensions) is pinned by the layout spec. */
  def zorderRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val base = scratch(spark, sfDir, "s_zorder")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    Layouts.zorderCluster(li, s"$base/z", "l_orderkey", "l_partkey", 8192L)
    spark.read.parquet(s"$base/z")
  }

  /** CDC round-trip: seed the store from part, then apply one change feed
    * carrying two sequence generations of mixed updates and deletes —
    * keys updated then deleted, deleted then re-upserted, updated twice —
    * so the per-key latest-wins collapse, the delete path, and the upsert
    * path are all load-bearing in the final state the oracle recomputes. */
  def cdcRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_name", "p_retailprice")
    val k = col("p_partkey")
    def gen(pred: org.apache.spark.sql.Column, op: String, seq: Int,
            bump: Double): DataFrame =
      part.filter(pred)
        .withColumn("p_retailprice", col("p_retailprice") + bump)
        .withColumn("op", lit(op)).withColumn("seq", lit(seq.toLong))
    val changes =
      gen(k % 4 === 0, "U", 1, 1.0)
        .unionByName(gen(k % 5 === 0 && k % 4 =!= 0, "D", 1, 0.0))
        .unionByName(gen(k % 10 === 0, "U", 2, 2.0))
        .unionByName(gen(k % 4 === 0 && k % 7 === 0 && k % 10 =!= 0, "D", 2, 0.0))
    val sink = new ParquetSink(spark, scratch(spark, sfDir, "k_cdc") + "/t")
    sink.write(part, WriteMode.Replace)
    sink.applyCdc(changes, Seq("p_partkey"))
    sink.read()
  }

  /** Versioned-CDC round-trip: the SAME change feed as [[cdcRoundTrip]],
    * but delivered as out-of-order batches with a replay — generation 2
    * first, generation 1 (stale) second, generation 2 again — through the
    * tombstone-keeping versioned apply. Convergence claim: the final live
    * state equals k_cdc's (same oracle SQL), i.e. application is
    * commutative over batch order and idempotent under replay. The
    * resurrect case is load-bearing: keys deleted at seq 2 receive a
    * stale seq-1 update afterwards and must stay deleted — exactly what
    * the naive per-batch apply gets wrong. */
  def cdcReplayRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val part = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_name", "p_retailprice")
    val k = col("p_partkey")
    def gen(pred: org.apache.spark.sql.Column, op: String, seq: Int,
            bump: Double): DataFrame =
      part.filter(pred)
        .withColumn("p_retailprice", col("p_retailprice") + bump)
        .withColumn("op", lit(op)).withColumn("seq", lit(seq.toLong))
    val seed = gen(lit(true), "U", 0, 0.0)
    val gen2 = gen(k % 10 === 0, "U", 2, 2.0)
      .unionByName(gen(k % 4 === 0 && k % 7 === 0 && k % 10 =!= 0, "D", 2, 0.0))
    val gen1 = gen(k % 4 === 0, "U", 1, 1.0)
      .unionByName(gen(k % 5 === 0 && k % 4 =!= 0, "D", 1, 0.0))
    val sink = new ParquetSink(spark, scratch(spark, sfDir, "k_cdc_replay") + "/t")
    Seq(seed, gen2, gen1, gen2).foreach(b => sink.applyCdcVersioned(b, Seq("p_partkey")))
    sink.read().filter(col("op") =!= "D").drop("op", "seq")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k_cdc" -> (cdcRoundTrip _),
    "k_cdc_replay" -> (cdcReplayRoundTrip _),
    "s_zorder" -> (zorderRoundTrip _),
    "k_compact" -> (compactRoundTrip _),
    "st_sessions" -> (sessionsBatch _),
    "j_range" -> (rangeJoinRoundTrip _),
    "j_overlap" -> (overlapJoinRoundTrip _),
    "j_band" -> (bandJoinRoundTrip _),
    "w_rolling" -> (rollingRoundTrip _),
    // Behavioral near-dup with engineered ground truth: every 10th user's
    // stream replays under a shifted id minus its event_id%13 events (a
    // near-identical twin, Jaccard ~0.8-1.0); the random base population
    // sits far below the 0.5 threshold (measured: 453 candidate pairs,
    // only the twins pass). Without the injection the row would be
    // vacuously green on an all-random fixture — same policy as t_scrub's
    // PII injection and d_bloom_incr's replays.
    "x_seqsim" -> ((s: SparkSession, d: String) => {
      val ev = Tables.events(s, d)
      val twins = ev.filter(col("user_id") % 10 === 0 && col("event_id") % 13 =!= 0)
        .withColumn("user_id", col("user_id") + lit(100000L))
      EventStream.sequenceNearDup(ev.unionByName(twins))
    }),
    "s_analyze" -> ((s: SparkSession, d: String) => graft.sources.TableStats.analyze(
      s.read.parquet(s"$d/lineitem.parquet"),
      Seq("l_orderkey", "l_quantity", "l_returnflag"))),
    // Equi-width histogram over integer cents — the distribution stat the
    // min/max/NDV family can't give a cost model (uniform vs skewed range
    // selectivity).
    "s_hist" -> ((s: SparkSession, d: String) => graft.sources.TableStats.histogram(
      s.read.parquet(s"$d/lineitem.parquet")
        .selectExpr("cast(floor(l_extendedprice * 100) as bigint) as cents"),
      "cents", nBuckets = 16)),
    // Histogram with bounds from STORED stats (histogramFromStats — the
    // single-pass stats-as-data form): ANALYZE runs over a deliberately
    // stale snapshot (quantities 10..30 only, as if the table grew since),
    // the full table buckets against those bounds, and the out-of-range
    // mass surfaces as overflow buckets (< 0 and >= nBuckets) instead of
    // silently folding into the edge bars.
    "s_hist_stats" -> ((s: SparkSession, d: String) => {
      val li = s.read.parquet(s"$d/lineitem.parquet")
      val stats = graft.sources.TableStats.analyze(
        li.filter(col("l_quantity").between(10, 30)), Seq("l_quantity"))
      graft.sources.TableStats.histogramFromStats(li, "l_quantity", stats, nBuckets = 8)
    }),
    // Equi-depth histogram over price cents (~every value distinct — the
    // high-NDV shape where equi-width bars flatten into noise but ~N/8
    // per-bucket counts stay informative).
    "s_hist_depth" -> ((s: SparkSession, d: String) => graft.sources.TableStats.equiDepthHistogram(
      s.read.parquet(s"$d/lineitem.parquet")
        .selectExpr("cast(floor(l_extendedprice * 100) as bigint) as cents"),
      "cents", nBuckets = 8)),
    // Stored cuts applied to drifted data: cuts train on the sub-30000.00
    // price snapshot (as if the table has since grown upward), then the
    // full table re-buckets against them - the missing upper range piles
    // into the last bucket, turning distribution drift into depth
    // imbalance (and nothing lands in -1: the training min is the
    // global min here).
    "s_depth_drift" -> ((s: SparkSession, d: String) => {
      val cents = s.read.parquet(s"$d/lineitem.parquet")
        .selectExpr("cast(floor(l_extendedprice * 100) as bigint) as cents")
      val cuts = graft.sources.TableStats.equiDepthHistogram(
        cents.filter(col("cents") < 3000000L), "cents", 8)
      graft.sources.TableStats.equiDepthFromCuts(cents, "cents", cuts)
    }),
    // Join-size estimation from STORED stats only (analyze + heavyKeys
    // per side; the estimator touches neither table). Both join keys are
    // engineered two-sided-skew (one ~90%/~80% heavy key) so the classic
    // uniform estimate is ~70x low while the sketch-corrected one lands
    // within a few percent of the exact audit - the number a cost-based
    // optimizer would actually get from this module's stats.
    "s_join_est" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      val a = s.read.parquet(s"$d/lineitem.parquet")
        .selectExpr("CASE WHEN l_orderkey % 10 < 9 THEN 1L ELSE 1L + l_suppkey % 99 END AS k")
      val b = s.read.parquet(s"$d/orders.parquet")
        .selectExpr("CASE WHEN o_orderkey % 5 < 4 THEN 1L ELSE 1L + o_custkey % 49 END AS k")
      val ts = graft.sources.TableStats
      val est = ts.joinSizeEstimate(
        ts.analyze(a, Seq("k")), ts.heavyKeys(a, "k"),
        ts.analyze(b, Seq("k")), ts.heavyKeys(b, "k"), "k", "k")
      // exact audit WITHOUT materializing the join: sum of per-key
      // frequency products over the two count frames.
      val exact = a.groupBy("k").agg(count(lit(1)).as("fa"))
        .join(b.groupBy("k").agg(count(lit(1)).as("fb")), "k")
        .agg(coalesce(sum(col("fa") * col("fb")), lit(0L)).as("exact_rows"))
      est.crossJoin(broadcast(exact))
    }),
    // Range-predicate selectivity from STORED stats only (analyze +
    // equi-depth histogram; the estimator touches neither table) — the
    // missing half of the optimizer loop beside s_join_est. The column is
    // engineered two-regime (90% of rows in [0, 999], 10% spread over
    // [1e6, 2e6)) so the min/max-only uniform estimate is >1000x low on
    // the hot range while the per-bucket interpolation lands within the
    // partial-edge-bucket error bound.
    "s_sel_est" -> ((s: SparkSession, d: String) => {
      val ts = graft.sources.TableStats
      val v = s.read.parquet(s"$d/lineitem.parquet")
        .selectExpr("CASE WHEN l_orderkey % 10 < 9 THEN l_partkey % 1000 " +
          "ELSE 1000000L + (l_partkey * 7919L) % 1000000L END AS v")
      val stats = ts.analyze(v, Seq("v"))
      val hist = ts.equiDepthHistogram(v, "v", nBuckets = 8)
      val est = ts.selectivityEstimate(stats, hist, "v", 200L, 799L)
      // exact audit: one conditional count over the column.
      val exact = v.agg(
        coalesce(sum(when(col("v").between(200L, 799L), 1L)), lit(0L))
          .cast("bigint").as("exact_rows"))
      est.crossJoin(broadcast(exact))
    }),
    // Join-strategy choice from stored stats — the optimizer loop closing
    // into a DECISION: three engineered scenarios (broadcast-sized dim,
    // uniform big-big, two-sided skew) run through the same stats chain
    // s_join_est proves, and the cascade picks broadcast / shuffle_smj /
    // salted_smj with a computed salt factor. The DuckDB twin reproduces
    // decision, build side, and salt factor bit-for-bit (the decision
    // compares the ROUNDED per-key estimate; thresholds are literals in
    // both dialects). AutoJoinSpec separately proves the decisions
    // EXECUTE correctly (plan shapes + result equality).
    "s_plan_choice" -> ((s: SparkSession, d: String) => {
      val ts = graft.sources.TableStats
      val cs = graft.core.CacheScope
      // Stats construction is SHARED across the three scenarios the way a
      // real ANALYZE pass would be: each table's scenario-key projections
      // are computed side by side and analyzed in ONE scan (analyze's
      // k-columns-one-pass contract), and the narrow key frames are
      // persisted so the per-column heavyKeys passes re-read memory, not
      // parquet. Unshared, the row cost ~8 table scans PER scenario
      // (measured 10-16 s at sf0.1 vs ~2 s shared); the estimator math
      // and its oracle are unchanged — only where the scans land differs.
      // Fact sides scoped to the deterministic %2=0 half: the row's cost
      // is the stats passes (analyze + per-column Misra-Gries + exact
      // verify over each scenario key), and halving the scanned rows
      // changes no decision — the skew structure rides l_orderkey % 10,
      // independent of the halving, and the thresholds below clear both
      // halved table sizes at sf0.01 and sf0.1. Production pays these
      // passes once per ingest (stats are standing artifacts; EstServe
      // measures the serving form at ~2 s flat across SF).
      val li = cs.persisted(s.read.parquet(s"$d/lineitem.parquet")
        .filter(col("l_orderkey") % 2 === 0).selectExpr(
        "CAST(l_orderkey AS BIGINT) AS k_uni",
        "CASE WHEN l_orderkey % 10 < 9 THEN 1L ELSE 1L + l_suppkey % 99 END AS k_skew"))
      val ord = cs.persisted(s.read.parquet(s"$d/orders.parquet")
        .filter(col("o_orderkey") % 2 === 0).selectExpr(
        "CAST(o_custkey AS BIGINT) AS k_dim",
        "CAST(o_orderkey AS BIGINT) AS k_uni",
        "CASE WHEN o_orderkey % 5 < 4 THEN 1L ELSE 1L + o_custkey % 49 END AS k_skew"))
      val cust = cs.persisted(s.read.parquet(s"$d/customer.parquet")
        .selectExpr("CAST(c_custkey AS BIGINT) AS k_dim"))
      val liStats = cs.persisted(ts.analyze(li, Seq("k_uni", "k_skew")))
      val ordStats = cs.persisted(ts.analyze(ord, Seq("k_dim", "k_uni", "k_skew")))
      val custStats = cs.persisted(ts.analyze(cust, Seq("k_dim")))
      // Heavy keys batched like the analyzes (r12): one sketch + one
      // verify pass PER TABLE over all its scenario keys (heavyKeysMulti)
      // instead of one per (table, key) — 12 jobs → 6. Per-column slices
      // are exactly heavyKeys' frames (HeavyKeysMultiSpec pins it), so
      // the estimator math and its oracle are unchanged.
      val liHeavy = cs.persisted(ts.heavyKeysMulti(li, Seq("k_uni", "k_skew")))
      val ordHeavy = cs.persisted(ts.heavyKeysMulti(ord, Seq("k_dim", "k_uni", "k_skew")))
      val custHeavy = cs.persisted(ts.heavyKeysMulti(cust, Seq("k_dim")))
      def hk(multi: DataFrame, c: String): DataFrame =
        multi.filter(col("column") === c).select("key", "n_occ")
      def choose(name: String, aStats: DataFrame, aHeavy: DataFrame,
                 bStats: DataFrame, bHeavy: DataFrame, k: String,
                 bl: Long, budget: Long): DataFrame =
        ts.joinStrategyChoice(
            aStats, hk(aHeavy, k), bStats, hk(bHeavy, k),
            k, k, bl, budget)
          .withColumn("scenario", lit(name))
          .select("scenario", "decision", "build_side", "salt_factor",
            "max_key_est", "est_rows", "est_uniform", "n_a", "n_b")
      choose("dim", ordStats, ordHeavy, custStats, custHeavy, "k_dim", bl = 30000L, budget = 1000000L)
        .unionByName(choose("uniform", liStats, liHeavy, ordStats, ordHeavy, "k_uni", bl = 5000L, budget = 1000000L))
        .unionByName(choose("skew", liStats, liHeavy, ordStats, ordHeavy, "k_skew", bl = 100L, budget = 1000000L))
    }),
    // Incremental stats maintenance: partial stats per split, folded with
    // mergeStats — the oracle is s_analyze's own SQL over the WHOLE table,
    // which proves merged ≡ direct (KMV merge is a pure set function).
    "s_analyze_merge" -> ((s: SparkSession, d: String) => {
      import graft.sources.TableStats
      val li = s.read.parquet(s"$d/lineitem.parquet")
      val cols = Seq("l_orderkey", "l_quantity", "l_returnflag")
      TableStats.mergeStats(
        Seq(li.filter(col("l_orderkey") % 10 < 8),
            li.filter(col("l_orderkey") % 10 >= 8))
          .map(TableStats.analyzePartial(_, cols)),
        cols)
    }),
    "k_snapshot" -> ((s: SparkSession, d: String) => {
      import graft.sink.SnapshotStore
      val dir = scratch(s, d, "snapshot")
      val st = new SnapshotStore(s, dir)
      val cust = s.read.parquet(s"$d/customer.parquet")
        .selectExpr("c_custkey", "c_acctbal")
      st.commit(cust.where("c_custkey % 2 = 0"))
      st.commitMerge(
        cust.where("c_custkey % 3 = 0").selectExpr("c_custkey", "c_acctbal * 2 AS c_acctbal"),
        Seq("c_custkey"))
      // Time travel: BOTH versions remain readable after the merge; the
      // per-version aggregate proves v1 was not mutated by v2's commit.
      // Integer cents keep the sum order-independent.
      st.versions.map { v =>
        st.read(v).selectExpr(s"CAST($v AS BIGINT) AS version",
          "c_custkey", "CAST(floor(c_acctbal * 100) AS BIGINT) AS cents")
          .groupBy("version")
          .agg(count(lit(1)).as("n_rows"), sum("cents").as("sum_cents"))
      }.reduce(_ unionByName _)
    }),
    // The audit half of time travel: what did v2's merge DO to v1 —
    // inserts (new keys), updates (doubled balances), old/new side by
    // side. Same two commits as k_snapshot, then the keyed diff.
    "k_snapshot_diff" -> ((s: SparkSession, d: String) => {
      import graft.sink.SnapshotStore
      val dir = scratch(s, d, "snapshot_diff")
      val st = new SnapshotStore(s, dir)
      val cust = s.read.parquet(s"$d/customer.parquet")
        .selectExpr("c_custkey", "c_acctbal")
      st.commit(cust.where("c_custkey % 2 = 0"))
      st.commitMerge(
        cust.where("c_custkey % 3 = 0").selectExpr("c_custkey", "c_acctbal * 2 AS c_acctbal"),
        Seq("c_custkey"))
      st.diff(1L, 2L, Seq("c_custkey"))
        .selectExpr("change", "c_custkey",
          "CAST(floor(c_acctbal_old * 100) AS BIGINT) AS cents_old",
          "CAST(floor(c_acctbal_new * 100) AS BIGINT) AS cents_new")
    }),
    "s_checks" -> ((s: SparkSession, d: String) => {
      import graft.sources.Checks
      val li = s.read.parquet(s"$d/lineitem.parquet")
      val ord = s.read.parquet(s"$d/orders.parquet")
      val cust = s.read.parquet(s"$d/customer.parquet")
      Checks.unique(ord, "orders_pk_unique", "o_orderkey")
        .union(Checks.references(li, "l_orderkey", ord, "o_orderkey", "lineitem_fk_orders"))
        .union(Checks.satisfies(li, "l_quantity BETWEEN 1 AND 50", "lineitem_qty_range"))
        .union(Checks.notNull(cust, "c_name", "customer_name_notnull"))
    }),
    "j_asof" -> (asofRoundTrip _),
    "j_asof_tol" -> (asofToleranceRoundTrip _),
    "j_asof_fwd" -> (asofForwardRoundTrip _),
    "j_salted" -> (saltedJoinRoundTrip _),
    "j_skew_plain" -> (skewedJoinPlain _),
    "j_skew_salted" -> (skewedJoinSalted _),
    "k_bucket" -> (bucketedJoinRoundTrip _),
    "s_partprune" -> (partitionPruneRoundTrip _),
    "k_merge" -> (mergeRoundTrip _),
    "k_replace" -> (replaceAppendRoundTrip _),
    "k_partreplace" -> (partitionReplaceRoundTrip _),
    "s3_dayrange" -> (dayRangeRoundTrip _),
    "st_window" -> (windowAggBatch _),
    // Streaming drift monitor's batch twin (the st_window convention):
    // equi-depth cuts train on the sub-50.00 value baseline, every
    // event's cents re-buckets against them per 1-day event-time window
    // - the s_depth_drift diagnostic as a windowed signal; the streaming
    // form is spec-checked equal on the full window set (EventStreamSpec).
    "st_drift" -> ((s: SparkSession, d: String) => {
      val ev = Tables.events(s, d)
      val cuts = graft.sources.TableStats.equiDepthHistogram(
        ev.selectExpr("cast(floor(value * 100) as bigint) as cents")
          .filter(col("cents") <= 5000), "cents", 8)
      EventStream.bucketDriftBatch(ev, cuts)
    }),
    // The drift monitor's ALERTING summary: per-window population
    // stability index against the cut-training baseline — clamped
    // integer-ppm fractions, the DetMath deterministic log kernel (the
    // engine's own ln is 1-ulp unstable cross-engine on exactly these
    // inputs), fixed ascending-bucket fold; the streaming form is
    // spec-checked equal on the full window set (EventStreamSpec).
    "st_drift_psi" -> ((s: SparkSession, d: String) => {
      val ev = Tables.events(s, d)
      val baseline = ev.selectExpr("cast(floor(value * 100) as bigint) as cents")
        .filter(col("cents") <= 5000)
      val cuts = graft.sources.TableStats.equiDepthHistogram(baseline, "cents", 8)
      EventStream.bucketDriftPsiBatch(ev, cuts, baseline)
    }),
    "st_dedup" -> (streamDedupBatch _),
    "st_neardup" -> (streamNearDupBatch _),
    "st_clusters" -> (streamClustersBatch _),
    "st_triangles" -> (streamTrianglesBatch _),
    "st_ingest_store" -> (streamIngestStore _),
    "st_snapshot_lineage" -> (streamIngestSnapshots _),
    "st_joined" -> (streamJoined _),
    "st_enrich" -> (streamEnriched _))

  /** DuckDB twin of [[graft.sources.TableStats.kmvMix]] — the quadratic
    * short-string spread in front of the KMV estimator; same constants,
    * same mod-P staging (largest intermediate `(P−1)·A1 ≈ 2.66e18`,
    * inside int64 for both engines — see kmvMix's bound note). */
  private def duckKmvMix(h: String): String =
    s"((($h) * ($h) % ${graft.llmdata.TextPrimitives.P}) * 2654435769 + ($h) * 40503) % ${graft.llmdata.TextPrimitives.P}"

  /** One s_plan_choice scenario as a prefixed CTE chain + final SELECT —
    * the s_join_est stats twin (KMV NDV, Misra-Gries-gated heavy keys,
    * frequency-split estimate) extended with the per-key MAXIMUM and the
    * decision cascade of [[graft.sources.TableStats.joinStrategyChoice]].
    * Prefixing lets three scenarios share one top-level WITH. */
  private def planChoiceScenarioSql(p: String, name: String,
                                    aSql: String, bSql: String,
                                    bl: Long, budget: Long): (String, String) = {
    import graft.llmdata.TextPrimitives
    def ndvSql(src: String) =
      s"""(SELECT round(CASE WHEN len(l) < 32 THEN CAST(len(l) AS DOUBLE)
         |              ELSE 31.0 * ${TextPrimitives.P} / l[32] END, 6)
         | FROM (SELECT list_sort(list(DISTINCT ${duckKmvMix("h")})) AS l
         |       FROM (SELECT ${TextPrimitives.duckPolyHash("CAST(k AS VARCHAR)")} AS h FROM $src)))"""
        .stripMargin.replace("\n", "")
    val ctes =
      s"""${p}a AS ($aSql),
         |${p}b AS ($bSql),
         |${p}sa AS (SELECT CAST((SELECT count(*) FROM ${p}a) AS BIGINT) AS n_a, ${ndvSql(s"${p}a")} AS ndv_a),
         |${p}sb AS (SELECT CAST((SELECT count(*) FROM ${p}b) AS BIGINT) AS n_b, ${ndvSql(s"${p}b")} AS ndv_b),
         |${p}ha AS (SELECT CAST(k AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS n_occ FROM ${p}a
         |           GROUP BY 1 HAVING count(*) * 64 > (SELECT count(*) FROM ${p}a)),
         |${p}hb AS (SELECT CAST(k AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS n_occ FROM ${p}b
         |           GROUP BY 1 HAVING count(*) * 64 > (SELECT count(*) FROM ${p}b)),
         |${p}ga AS (SELECT CAST(coalesce(sum(n_occ), 0) AS DOUBLE) AS hrows_a, CAST(count(*) AS DOUBLE) AS hkeys_a FROM ${p}ha),
         |${p}gb AS (SELECT CAST(coalesce(sum(n_occ), 0) AS DOUBLE) AS hrows_b, CAST(count(*) AS DOUBLE) AS hkeys_b FROM ${p}hb),
         |${p}m0 AS (SELECT CAST(n_a AS DOUBLE) - hrows_a AS rest_a, greatest(1.0, ndv_a - hkeys_a) AS restndv_a,
         |             CAST(n_b AS DOUBLE) - hrows_b AS rest_b, greatest(1.0, ndv_b - hkeys_b) AS restndv_b,
         |             n_a, n_b, ndv_a, ndv_b
         |           FROM ${p}sa, ${p}sb, ${p}ga, ${p}gb),
         |${p}hj AS (SELECT coalesce(sum(CAST(ha.n_occ AS DOUBLE) * CAST(hb.n_occ AS DOUBLE)), 0.0) AS both_p,
         |             CAST(coalesce(sum(CASE WHEN hb.key IS NULL THEN ha.n_occ END), 0) AS DOUBLE) AS aonly,
         |             CAST(coalesce(sum(CASE WHEN ha.key IS NULL THEN hb.n_occ END), 0) AS DOUBLE) AS bonly,
         |             coalesce(max(CASE
         |               WHEN ha.key IS NOT NULL AND hb.key IS NOT NULL THEN CAST(ha.n_occ AS DOUBLE) * CAST(hb.n_occ AS DOUBLE)
         |               WHEN ha.key IS NOT NULL THEN CAST(ha.n_occ AS DOUBLE) * (m.rest_b / m.restndv_b)
         |               ELSE CAST(hb.n_occ AS DOUBLE) * (m.rest_a / m.restndv_a) END), 0.0) AS hmax
         |           FROM ${p}ha ha FULL JOIN ${p}hb hb ON ha.key = hb.key CROSS JOIN ${p}m0 m),
         |${p}f AS (SELECT round(greatest(hj.hmax, (m.rest_a / m.restndv_a) * (m.rest_b / m.restndv_b)), 2) AS max_key_est,
         |            round(hj.both_p + hj.aonly * (m.rest_b / m.restndv_b) + hj.bonly * (m.rest_a / m.restndv_a)
         |              + m.rest_a * m.rest_b / greatest(m.restndv_a, m.restndv_b), 2) AS est_rows,
         |            round(CAST(m.n_a AS DOUBLE) * CAST(m.n_b AS DOUBLE) / greatest(m.ndv_a, m.ndv_b), 2) AS est_uniform,
         |            m.n_a, m.n_b
         |          FROM ${p}m0 m, ${p}hj hj),
         |${p}g AS (SELECT *, CASE WHEN least(n_a, n_b) <= $bl THEN 'broadcast'
         |                         WHEN max_key_est > $budget THEN 'salted_smj'
         |                         ELSE 'shuffle_smj' END AS decision
         |          FROM ${p}f)""".stripMargin
    val sel =
      s"""SELECT '$name' AS scenario, decision,
         |  CASE WHEN decision <> 'broadcast' THEN 'none'
         |       WHEN n_b <= n_a THEN 'b' ELSE 'a' END AS build_side,
         |  CASE WHEN decision = 'salted_smj'
         |       THEN least(CAST(64 AS BIGINT), CAST(ceil(max_key_est / $budget.0) AS BIGINT))
         |       ELSE CAST(1 AS BIGINT) END AS salt_factor,
         |  max_key_est, est_rows, est_uniform, n_a, n_b
         |FROM ${p}g""".stripMargin
    (ctes, sel)
  }

  /** DuckDB twin of one [[graft.sources.TableStats.analyze]] output row:
    * same null convention (min/max/NDV over the non-null population), the
    * KMV estimate with v_kmv's exact formula over the shared polynomial
    * hash of the string-cast value, post-mixed by [[duckKmvMix]]. */
  private def analyzeColSql(c: String): String = {
    import graft.llmdata.TextPrimitives
    s"""SELECT '$c' AS "column",
       |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows,
       |  (SELECT CAST(count(*) - count($c) AS BIGINT) FROM lineitem) AS n_nulls,
       |  (SELECT CAST(min($c) AS VARCHAR) FROM lineitem) AS min_value,
       |  (SELECT CAST(max($c) AS VARCHAR) FROM lineitem) AS max_value,
       |  (SELECT round(CASE WHEN len(l) < 32 THEN CAST(len(l) AS DOUBLE)
       |                     ELSE 31.0 * ${TextPrimitives.P} / l[32] END, 6)
       |   FROM (SELECT list_sort(list(DISTINCT ${duckKmvMix("h")})) AS l
       |         FROM (SELECT ${TextPrimitives.duckPolyHash(s"CAST($c AS VARCHAR)")} AS h
       |               FROM lineitem WHERE $c IS NOT NULL))) AS ndv_est""".stripMargin
  }

  /** One oracle for both skew variants: salting must not change a single
    * output row, only the shuffle shape. l_quantity is integer-valued, so
    * the double sums are exact and order-independent. */
  private val skewOracleSql =
    """SELECT k, CAST(count(*) * 16 AS BIGINT) AS n_rows, CAST(SUM(l_quantity) * 16 AS DOUBLE) AS sum_qty
      |FROM (SELECT CASE WHEN l_orderkey % 10 < 9 THEN 1 ELSE 1 + l_suppkey % 99 END AS k, l_quantity FROM lineitem) b
      |JOIN (SELECT p_partkey AS k FROM part WHERE p_partkey < 100) d USING (k)
      |GROUP BY 1""".stripMargin

  /** Final CDC state shared by `k_cdc` (one ordered feed) and
    * `k_cdc_replay` (same feed, out-of-order batches + replay through the
    * versioned apply): %10 keys carry the seq-2 upsert (+2, even if
    * deleted at seq 1); remaining %4 keys carry the seq-1 update (+1)
    * unless the seq-2 delete (%4 & %7, not %10) removed them;
    * %5-not-%4-not-%10 keys were deleted at seq 1; everything else is the
    * untouched seed row. One oracle for both = the convergence claim. */
  private val cdcFinalStateSql =
    """SELECT p_partkey, p_name,
      |  CASE WHEN p_partkey % 10 = 0 THEN p_retailprice + 2
      |       WHEN p_partkey % 4 = 0 THEN p_retailprice + 1
      |       ELSE p_retailprice END AS p_retailprice
      |FROM part
      |WHERE NOT (p_partkey % 5 = 0 AND p_partkey % 4 != 0 AND p_partkey % 10 != 0)
      |  AND NOT (p_partkey % 4 = 0 AND p_partkey % 7 = 0 AND p_partkey % 10 != 0)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "k_cdc" -> cdcFinalStateSql,
    "k_cdc_replay" -> cdcFinalStateSql,
    "s_zorder" ->
      s"""WITH mm AS (SELECT min(l_orderkey) AS x0, max(l_orderkey) AS x1,
         |                   min(l_partkey) AS y0, max(l_partkey) AS y1 FROM lineitem),
         |n AS (SELECT l_orderkey, l_partkey, l_quantity,
         |  ${Layouts.scale16DuckSql("l_orderkey", "x0", "x1")} AS nx,
         |  ${Layouts.scale16DuckSql("l_partkey", "y0", "y1")} AS ny
         |FROM lineitem, mm)
         |SELECT l_orderkey, l_partkey, l_quantity,
         |  ${Layouts.zorderDuckSql("nx", "ny")} AS zkey
         |FROM n""".stripMargin,
    "k_compact" ->
      "SELECT event_id, user_id, value FROM events",
    "st_sessions" ->
      s"""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
        |                  CAST(floor(value) AS DOUBLE) AS value FROM events),
        |l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM e),
        |n AS (SELECT *, CASE WHEN prev_ts IS NULL
        |                       OR epoch_us(ts) - epoch_us(prev_ts) > ${EventStream.SessionGapMs} * 1000 THEN 1 ELSE 0 END AS new_sess FROM l),
        |s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id FROM n)
        |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
        |       min(ts) AS session_start, max(ts) AS session_end,
        |       CAST(count(*) AS BIGINT) AS n_events, SUM(value) AS total
        |FROM s GROUP BY 1, 2""".stripMargin,
    "j_range" ->
      """WITH p AS (SELECT event_id, CAST(user_id % 20 AS BIGINT) AS k, CAST(ts AS TIMESTAMP) AS evt_ts FROM events),
        |w AS (SELECT CASE WHEN event_id % 205 = 0 THEN CAST(NULL AS BIGINT) ELSE CAST(user_id % 20 AS BIGINT) END AS k,
        |             event_id AS win_id,
        |             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS win_start,
        |             CASE WHEN event_id % 123 = 0 THEN date_trunc('hour', CAST(ts AS TIMESTAMP))
        |                  ELSE date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL (1 + event_id % 5) HOUR END AS win_end
        |      FROM events WHERE event_id % 41 = 0)
        |SELECT p.event_id, p.k, p.evt_ts, w.win_id, w.win_start, w.win_end
        |FROM p JOIN w ON p.k = w.k AND p.evt_ts >= w.win_start AND p.evt_ts < w.win_end""".stripMargin,
    "s_analyze" -> Seq("l_orderkey", "l_quantity", "l_returnflag")
      .map(analyzeColSql).mkString("\nUNION ALL\n"),
    // Deliberately the SAME oracle as s_analyze: the merged partials must
    // reproduce a direct single-pass ANALYZE of the whole table exactly.
    "s_analyze_merge" -> Seq("l_orderkey", "l_quantity", "l_returnflag")
      .map(analyzeColSql).mkString("\nUNION ALL\n"),
    "k_snapshot" ->
      """WITH v1 AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 2 = 0),
        |m AS (SELECT c_custkey, c_acctbal * 2 AS c_acctbal FROM customer WHERE c_custkey % 3 = 0),
        |v2 AS (SELECT * FROM v1 WHERE c_custkey NOT IN (SELECT c_custkey FROM m)
        |       UNION ALL SELECT * FROM m)
        |SELECT CAST(1 AS BIGINT) AS version, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_cents FROM v1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
        |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) FROM v2""".stripMargin,
    "k_snapshot_diff" ->
      """WITH v1 AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 2 = 0),
        |m AS (SELECT c_custkey, c_acctbal * 2 AS c_acctbal FROM customer WHERE c_custkey % 3 = 0),
        |v2 AS (SELECT * FROM v1 WHERE c_custkey NOT IN (SELECT c_custkey FROM m)
        |       UNION ALL SELECT * FROM m),
        |d AS (SELECT coalesce(a.c_custkey, b.c_custkey) AS c_custkey,
        |        a.c_acctbal AS old_b, b.c_acctbal AS new_b,
        |        CASE WHEN a.c_custkey IS NULL THEN 'insert'
        |             WHEN b.c_custkey IS NULL THEN 'delete'
        |             WHEN a.c_acctbal IS DISTINCT FROM b.c_acctbal THEN 'update'
        |             ELSE 'same' END AS change
        |      FROM v1 a FULL OUTER JOIN v2 b ON a.c_custkey = b.c_custkey)
        |SELECT change, c_custkey,
        |  CAST(floor(old_b * 100) AS BIGINT) AS cents_old,
        |  CAST(floor(new_b * 100) AS BIGINT) AS cents_new
        |FROM d WHERE change <> 'same'""".stripMargin,
    "s_checks" ->
      """SELECT 'orders_pk_unique' AS "check",
        |  CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS BIGINT) AS observed,
        |  CASE WHEN (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) = 0 THEN 1 ELSE 0 END AS passed
        |UNION ALL
        |SELECT 'lineitem_fk_orders',
        |  CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
        |  CASE WHEN (SELECT count(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) = 0 THEN 1 ELSE 0 END
        |UNION ALL
        |SELECT 'lineitem_qty_range',
        |  CAST((SELECT count(*) FROM lineitem WHERE NOT coalesce(l_quantity BETWEEN 1 AND 50, false)) AS BIGINT),
        |  CASE WHEN (SELECT count(*) FROM lineitem WHERE NOT coalesce(l_quantity BETWEEN 1 AND 50, false)) = 0 THEN 1 ELSE 0 END
        |UNION ALL
        |SELECT 'customer_name_notnull',
        |  CAST((SELECT count(*) - count(c_name) FROM customer) AS BIGINT),
        |  CASE WHEN (SELECT count(*) - count(c_name) FROM customer) = 0 THEN 1 ELSE 0 END""".stripMargin,
    "x_seqsim" -> {
      import graft.llmdata.TextPrimitives.{duckWords, duckShingles, duckPolyHashArray}
      s"""WITH ev2 AS (
        |  SELECT event_id, ts, user_id, event_type, value FROM events
        |  UNION ALL
        |  SELECT event_id, ts, user_id + 100000, event_type, value FROM events
        |  WHERE user_id % 10 = 0 AND event_id % 13 != 0),
        |tok AS (SELECT user_id, ts, event_id,
        |          coalesce(event_type, '') || '_' || CAST(CAST(floor(coalesce(value, 0.0) * 10) AS BIGINT) % 100 AS VARCHAR) AS t
        |        FROM ev2),
        |seq AS (SELECT user_id AS doc_id, array_to_string(list(t ORDER BY ts, event_id), ' ') AS text
        |        FROM tok GROUP BY 1),
        |w AS (SELECT doc_id, text, ${duckWords("text")} AS words FROM seq),
        |sh AS (SELECT doc_id, ${duckShingles("words", "text", 3)} AS s FROM w),
        |posting AS (SELECT doc_id, unnest(${duckPolyHashArray("s")}) AS shingle FROM sh),
        |sizes AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n_sh FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS common
        |  FROM posting a JOIN posting b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
        |FROM pairs JOIN sizes sa ON pairs.id_a = sa.doc_id JOIN sizes sb ON pairs.id_b = sb.doc_id
        |WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.5""".stripMargin
    },
    "s_hist" ->
      """WITH v AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
        |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |st AS (SELECT min(v) AS lo, max(v) AS hi FROM v),
        |b AS (SELECT v, lo, (hi - lo) // 16 + 1 AS w FROM v, st),
        |g AS (SELECT (v - lo) // w AS bucket, lo, w, CAST(count(*) AS BIGINT) AS n_rows,
        |        min(v) AS seen_min, max(v) AS seen_max
        |      FROM b GROUP BY 1, 2, 3)
        |SELECT bucket, lo + bucket * w AS bucket_lo, lo + (bucket + 1) * w - 1 AS bucket_hi,
        |  n_rows, seen_min, seen_max
        |FROM g""".stripMargin,
    // Overflow buckets are NEGATIVE here (values below the stale lo), and
    // DuckDB's `//` truncates toward zero on negatives (-8//3 = -2) where
    // the histogram defines floor — so the numerator is canonicalized to
    // an exact multiple of w (subtract the always-nonnegative remainder
    // ((d % w) + w) % w) before dividing, the same formula the Spark side
    // uses; on an exact multiple truncation and floor agree by identity.
    "s_hist_stats" ->
      """WITH st AS (SELECT CAST(min(l_quantity) AS BIGINT) AS lo, CAST(max(l_quantity) AS BIGINT) AS hi
        |            FROM lineitem WHERE l_quantity BETWEEN 10 AND 30),
        |v AS (SELECT CAST(l_quantity AS BIGINT) AS v FROM lineitem WHERE l_quantity IS NOT NULL),
        |b AS (SELECT v, lo, (hi - lo) // 8 + 1 AS w FROM v, st),
        |g AS (SELECT (v - lo - (((v - lo) % w + w) % w)) // w AS bucket, lo, w,
        |        CAST(count(*) AS BIGINT) AS n_rows,
        |        min(v) AS seen_min, max(v) AS seen_max
        |      FROM b GROUP BY 1, 2, 3)
        |SELECT bucket, lo + bucket * w AS bucket_lo, lo + (bucket + 1) * w - 1 AS bucket_hi,
        |  n_rows, seen_min, seen_max
        |FROM g""".stripMargin,
    "s_join_est" -> {
      import graft.llmdata.TextPrimitives
      def ndvSql(src: String) =
        s"""(SELECT round(CASE WHEN len(l) < 32 THEN CAST(len(l) AS DOUBLE)
           |              ELSE 31.0 * ${TextPrimitives.P} / l[32] END, 6)
           | FROM (SELECT list_sort(list(DISTINCT ${duckKmvMix("h")})) AS l
           |       FROM (SELECT ${TextPrimitives.duckPolyHash("CAST(k AS VARCHAR)")} AS h FROM $src)))"""
          .stripMargin.replace("\n", "")
      s"""WITH a AS (SELECT CASE WHEN l_orderkey % 10 < 9 THEN 1 ELSE 1 + l_suppkey % 99 END AS k FROM lineitem),
         |b AS (SELECT CASE WHEN o_orderkey % 5 < 4 THEN 1 ELSE 1 + o_custkey % 49 END AS k FROM orders),
         |sa AS (SELECT CAST((SELECT count(*) FROM a) AS DOUBLE) AS n_a, ${ndvSql("a")} AS ndv_a),
         |sb AS (SELECT CAST((SELECT count(*) FROM b) AS DOUBLE) AS n_b, ${ndvSql("b")} AS ndv_b),
         |ha AS (SELECT CAST(k AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS n_occ FROM a
         |       GROUP BY 1 HAVING count(*) * 64 > (SELECT count(*) FROM a)),
         |hb AS (SELECT CAST(k AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS n_occ FROM b
         |       GROUP BY 1 HAVING count(*) * 64 > (SELECT count(*) FROM b)),
         |ga AS (SELECT CAST(coalesce(sum(n_occ), 0) AS DOUBLE) AS hrows_a, CAST(count(*) AS DOUBLE) AS hkeys_a FROM ha),
         |gb AS (SELECT CAST(coalesce(sum(n_occ), 0) AS DOUBLE) AS hrows_b, CAST(count(*) AS DOUBLE) AS hkeys_b FROM hb),
         |hj AS (SELECT coalesce(sum(CAST(ha.n_occ AS DOUBLE) * CAST(hb.n_occ AS DOUBLE)), 0.0) AS both_p,
         |         CAST(coalesce(sum(CASE WHEN hb.key IS NULL THEN ha.n_occ END), 0) AS DOUBLE) AS aonly,
         |         CAST(coalesce(sum(CASE WHEN ha.key IS NULL THEN hb.n_occ END), 0) AS DOUBLE) AS bonly
         |       FROM ha FULL JOIN hb ON ha.key = hb.key),
         |m AS (SELECT n_a - hrows_a AS rest_a, greatest(1.0, ndv_a - hkeys_a) AS restndv_a,
         |        n_b - hrows_b AS rest_b, greatest(1.0, ndv_b - hkeys_b) AS restndv_b,
         |        n_a, ndv_a, n_b, ndv_b, both_p, aonly, bonly
         |      FROM sa, sb, ga, gb, hj),
         |x AS (SELECT CAST(coalesce(sum(fa * fb), 0) AS BIGINT) AS exact_rows FROM
         |        (SELECT k, count(*) AS fa FROM a GROUP BY 1) ja
         |        JOIN (SELECT k, count(*) AS fb FROM b GROUP BY 1) jb USING (k))
         |SELECT round(both_p + aonly * (rest_b / restndv_b) + bonly * (rest_a / restndv_a)
         |         + rest_a * rest_b / greatest(restndv_a, restndv_b), 2) AS est_rows,
         |  round(n_a * n_b / greatest(ndv_a, ndv_b), 2) AS est_uniform,
         |  exact_rows
         |FROM m, x""".stripMargin
    },
    "s_depth_drift" ->
      """WITH v0 AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
        |            FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |tv AS (SELECT v FROM v0 WHERE v < 3000000),
        |g AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM tv GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tv),
        |c AS (SELECT v, cnt,
        |        COALESCE(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |      FROM g),
        |cuts AS (SELECT min(v) AS lo FROM (SELECT (cb * 8) // n AS bucket, v FROM c, t) GROUP BY bucket),
        |ca AS (SELECT list_sort(list(lo)) AS cl FROM cuts),
        |b AS (SELECT CAST(len(list_filter(ca.cl, c -> c <= v)) - 1 AS BIGINT) AS bucket, v FROM v0, ca)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows, min(v) AS seen_min, max(v) AS seen_max
        |FROM b GROUP BY 1""".stripMargin,
    "s_hist_depth" ->
      """WITH v AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
        |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |g AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |c AS (SELECT v, cnt,
        |        COALESCE(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |      FROM g),
        |b AS (SELECT CAST((cb * 8) // n AS BIGINT) AS bucket, v, cnt FROM c, t)
        |SELECT bucket, min(v) AS lo, max(v) AS hi, CAST(sum(cnt) AS BIGINT) AS n_rows
        |FROM b GROUP BY 1""".stripMargin,
    // Twin of TableStats.selectivityEstimate over the same stored-stats
    // chain: the equi-depth CTEs are s_hist_depth's, the per-bucket
    // interpolation and the uniform estimate use the identical pinned
    // integer division order, and the exact audit is a direct count —
    // the estimate is reproduced bit-for-bit, not approximately.
    "s_sel_est" ->
      """WITH v AS (SELECT CASE WHEN l_orderkey % 10 < 9 THEN l_partkey % 1000
        |                  ELSE 1000000 + (l_partkey * 7919) % 1000000 END AS v
        |           FROM lineitem),
        |g AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |c AS (SELECT v, cnt,
        |        COALESCE(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |      FROM g),
        |b AS (SELECT CAST((cb * 8) // n AS BIGINT) AS bucket, v, cnt FROM c, t),
        |h AS (SELECT bucket, min(v) AS lo, max(v) AS hi, CAST(sum(cnt) AS BIGINT) AS n_rows
        |      FROM b GROUP BY 1),
        |e AS (SELECT CAST(coalesce(sum((n_rows * greatest(0, least(799, hi) - greatest(200, lo) + 1))
        |                   // (hi - lo + 1)), 0) AS BIGINT) AS est_rows FROM h),
        |u AS (SELECT CAST((count(v) * greatest(0, least(799, max(v)) - greatest(200, min(v)) + 1))
        |             // (max(v) - min(v) + 1) AS BIGINT) AS est_uniform FROM v),
        |x AS (SELECT CAST(coalesce(sum(CASE WHEN v BETWEEN 200 AND 799 THEN 1 END), 0) AS BIGINT) AS exact_rows FROM v)
        |SELECT est_rows, est_uniform, exact_rows FROM e, u, x""".stripMargin,
    // Three scenarios through the joinStrategyChoice twin, one top-level
    // WITH (prefixed CTE chains), UNION ALL of the three decision rows.
    "s_plan_choice" -> {
      val (c1, s1) = planChoiceScenarioSql("d_", "dim",
        "SELECT CAST(o_custkey AS BIGINT) AS k FROM orders WHERE o_orderkey % 2 = 0",
        "SELECT CAST(c_custkey AS BIGINT) AS k FROM customer",
        bl = 30000L, budget = 1000000L)
      val (c2, s2) = planChoiceScenarioSql("u_", "uniform",
        "SELECT CAST(l_orderkey AS BIGINT) AS k FROM lineitem WHERE l_orderkey % 2 = 0",
        "SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders WHERE o_orderkey % 2 = 0",
        bl = 5000L, budget = 1000000L)
      val (c3, s3) = planChoiceScenarioSql("k_", "skew",
        "SELECT CASE WHEN l_orderkey % 10 < 9 THEN 1 ELSE 1 + l_suppkey % 99 END AS k FROM lineitem WHERE l_orderkey % 2 = 0",
        "SELECT CASE WHEN o_orderkey % 5 < 4 THEN 1 ELSE 1 + o_custkey % 49 END AS k FROM orders WHERE o_orderkey % 2 = 0",
        bl = 100L, budget = 1000000L)
      s"WITH $c1,\n$c2,\n$c3\n$s1\nUNION ALL\n$s2\nUNION ALL\n$s3"
    },
    "j_band" ->
      """WITH s AS (SELECT s_suppkey, CAST(s_nationkey AS BIGINT) AS k,
        |             CAST(floor(s_acctbal * 100) AS BIGINT) AS s_cents FROM supplier),
        |c AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS k,
        |             CAST(floor(c_acctbal * 100) AS BIGINT) AS c_cents FROM customer)
        |SELECT s.s_suppkey, s.k, s.s_cents, c.c_custkey, c.c_cents
        |FROM s JOIN c ON s.k = c.k AND abs(s.s_cents - c.c_cents) <= 20000""".stripMargin,
    "w_rolling" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |             CAST(floor(value * 100) AS BIGINT) AS cents FROM events)
        |SELECT event_id, user_id, ts,
        |  CAST(sum(cents) OVER f AS BIGINT) AS roll_sum_cents,
        |  CAST(count(*) OVER f AS BIGINT) AS roll_n,
        |  epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        |FROM e
        |WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin,
    "j_overlap" ->
      """WITH a AS (SELECT event_id AS a_id, CAST(user_id % 10 AS BIGINT) AS k,
        |             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS a_start,
        |             date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL (1 + event_id % 3) HOUR AS a_end
        |      FROM events WHERE event_id % 37 = 0),
        |b AS (SELECT CASE WHEN event_id % 205 = 0 THEN CAST(NULL AS BIGINT) ELSE CAST(user_id % 10 AS BIGINT) END AS k,
        |             event_id AS b_id,
        |             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS b_start,
        |             CASE WHEN event_id % 123 = 0 THEN date_trunc('hour', CAST(ts AS TIMESTAMP))
        |                  ELSE date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL (1 + event_id % 5) HOUR END AS b_end
        |      FROM events WHERE event_id % 41 = 0)
        |SELECT a.a_id, a.k, a.a_start, a.a_end, b.b_id, b.b_start, b.b_end
        |FROM a JOIN b ON a.k = b.k AND greatest(a.a_start, b.b_start) < least(a.a_end, b.b_end)""".stripMargin,
    "j_asof" ->
      """WITH l AS (SELECT event_id, CAST(user_id % 50 AS BIGINT) AS k, CAST(ts AS TIMESTAMP) AS evt_ts FROM events),
        |r AS (SELECT CAST(user_id % 50 AS BIGINT) AS k,
        |             TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (event_id) SECOND AS snap_ts,
        |             CASE WHEN event_id % 7 = 0 THEN CAST(NULL AS BIGINT) ELSE event_id END AS snap_id
        |      FROM events WHERE event_id % 31 = 0 AND user_id % 50 < 40)
        |SELECT l.event_id, l.k, l.evt_ts, r.snap_id, r.snap_ts
        |FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.evt_ts >= r.snap_ts""".stripMargin,
    "j_asof_fwd" ->
      """WITH l AS (SELECT event_id, CAST(user_id % 50 AS BIGINT) AS k, CAST(ts AS TIMESTAMP) AS evt_ts FROM events),
        |r AS (SELECT CAST(user_id % 50 AS BIGINT) AS k,
        |             TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (event_id) SECOND AS snap_ts,
        |             CASE WHEN event_id % 7 = 0 THEN CAST(NULL AS BIGINT) ELSE event_id END AS snap_id
        |      FROM events WHERE event_id % 31 = 0 AND user_id % 50 < 40)
        |SELECT l.event_id, l.k, l.evt_ts, r.snap_id, r.snap_ts
        |FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.evt_ts <= r.snap_ts""".stripMargin,
    "j_asof_tol" ->
      """WITH l AS (SELECT event_id, CAST(user_id % 50 AS BIGINT) AS k, CAST(ts AS TIMESTAMP) AS evt_ts FROM events),
        |r AS (SELECT CAST(user_id % 50 AS BIGINT) AS k,
        |             TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (event_id) SECOND AS snap_ts,
        |             CASE WHEN event_id % 7 = 0 THEN CAST(NULL AS BIGINT) ELSE event_id END AS snap_id
        |      FROM events WHERE event_id % 31 = 0 AND user_id % 50 < 40)
        |SELECT l.event_id, l.k, l.evt_ts,
        |  CASE WHEN epoch(l.evt_ts - r.snap_ts) <= 604800 THEN r.snap_id END AS snap_id,
        |  CASE WHEN epoch(l.evt_ts - r.snap_ts) <= 604800 THEN r.snap_ts END AS snap_ts
        |FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.evt_ts >= r.snap_ts""".stripMargin,
    "j_salted" ->
      """SELECT k, r_name, CAST(count(*) AS BIGINT) AS n_rows, CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
        |FROM (SELECT CASE WHEN l_orderkey % 97 = 0 THEN CAST(NULL AS BIGINT) ELSE l_suppkey % 10 END AS k, l_quantity FROM lineitem) b
        |JOIN (SELECT r_regionkey AS k, r_name FROM region) d USING (k)
        |GROUP BY 1, 2""".stripMargin,
    "j_skew_plain" -> skewOracleSql,
    "j_skew_salted" -> skewOracleSql,
    "k_bucket" ->
      """SELECT o_custkey, CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,
    "s_partprune" ->
      """SELECT event_id, user_id, value, CAST(day(CAST(ts AS TIMESTAMP)) AS INT) AS dd
        |FROM events
        |WHERE day(CAST(ts AS TIMESTAMP)) BETWEEN 10 AND 12""".stripMargin,
    "k_merge" ->
      """SELECT p_partkey, p_name, p_retailprice, 2 AS src FROM part WHERE p_partkey % 2 = 0
        |UNION ALL
        |SELECT p_partkey, p_name, p_retailprice, 1 AS src FROM part WHERE p_partkey % 3 != 0 AND p_partkey % 2 != 0""".stripMargin,
    "k_replace" ->
      """SELECT p_partkey, p_name, p_retailprice, 2023 AS yr FROM part WHERE p_partkey % 3 = 0
        |UNION ALL
        |SELECT p_partkey, p_name, p_retailprice, 2024 AS yr FROM part WHERE p_partkey % 3 = 1""".stripMargin,
    "k_partreplace" ->
      """SELECT p_partkey, p_name, p_retailprice, 2023 AS yr FROM part WHERE p_partkey % 3 = 0
        |UNION ALL
        |SELECT p_partkey, p_name, p_retailprice, 2024 AS yr FROM part WHERE p_partkey % 7 = 2""".stripMargin,
    "s3_dayrange" ->
      "SELECT event_id, user_id, value FROM events WHERE event_id % 7 IN (1, 2, 3)",
    "st_window" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, CAST(floor(value) AS DOUBLE) AS value FROM events)
        |SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
        |       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS win_end,
        |       event_type, CAST(count(*) AS BIGINT) AS n_events, SUM(value) AS revenue
        |FROM e GROUP BY 1, 2, 3""".stripMargin,
    "st_drift" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, CAST(floor(value * 100) AS BIGINT) AS v FROM events),
        |tv AS (SELECT v FROM e WHERE v <= 5000),
        |g AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM tv GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tv),
        |c AS (SELECT v, cnt,
        |        COALESCE(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |      FROM g),
        |cuts AS (SELECT min(v) AS lo FROM (SELECT (cb * 8) // n AS bucket, v FROM c, t) GROUP BY bucket),
        |ca AS (SELECT list_sort(list(lo)) AS cl FROM cuts),
        |b AS (SELECT time_bucket(INTERVAL '1 day', e.ts) AS win_start,
        |        CAST(len(list_filter(ca.cl, c -> c <= v)) - 1 AS BIGINT) AS bucket
        |      FROM e, ca WHERE v IS NOT NULL)
        |SELECT win_start, win_start + INTERVAL '1 day' AS win_end, bucket,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM b GROUP BY 1, 2, 3""".stripMargin,
    // PSI twin: same cut CTEs as st_drift, then clamped integer-ppm
    // fractions on both sides (baseline = the training set, window = all
    // bucketed rows), the DetMath deterministic log (floor-log2 via
    // binary digit count + exact 2^m scaling + the shared atanh series —
    // NOT the engine ln, which is 1-ulp unstable vs the JVM), and a
    // fixed ascending-bucket left fold via list_reduce. Every arithmetic
    // step mirrors the Spark projection op for op, so the doubles hash
    // bit-for-bit.
    "st_drift_psi" -> {
      import graft.functions.DetMath
      val ln2 = DetMath.Ln2Literal
      s"""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, CAST(floor(value * 100) AS BIGINT) AS v FROM events),
         |tv AS (SELECT v FROM e WHERE v <= 5000),
         |g AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM tv GROUP BY 1),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tv),
         |c AS (SELECT v, cnt,
         |        COALESCE(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |      FROM g),
         |cuts AS (SELECT min(v) AS lo FROM (SELECT (cb * 8) // n AS bucket, v FROM c, t) GROUP BY bucket),
         |ca AS (SELECT list_sort(list(lo)) AS cl FROM cuts),
         |dom AS (SELECT CAST(unnest(range(-1, 8)) AS BIGINT) AS bucket),
         |bb AS (SELECT CAST(len(list_filter(ca.cl, c -> c <= v)) - 1 AS BIGINT) AS bucket FROM tv, ca),
         |eb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cnt FROM bb GROUP BY 1),
         |ebt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bb),
         |ep AS (SELECT d.bucket,
         |         greatest(CAST(1 AS BIGINT), (COALESCE(eb.cnt, 0) * 1000000) // ebt.n) AS eppm
         |       FROM dom d LEFT JOIN eb USING (bucket), ebt),
         |wb AS (SELECT time_bucket(INTERVAL '1 day', e.ts) AS win_start,
         |         CAST(len(list_filter(ca.cl, c -> c <= v)) - 1 AS BIGINT) AS bucket
         |       FROM e, ca WHERE v IS NOT NULL),
         |wt AS (SELECT win_start, CAST(count(*) AS BIGINT) AS n_rows FROM wb GROUP BY 1),
         |wc AS (SELECT win_start, bucket, CAST(count(*) AS BIGINT) AS cnt FROM wb GROUP BY 1, 2),
         |ap AS (SELECT wt.win_start, d.bucket,
         |         greatest(CAST(1 AS BIGINT), (COALESCE(wc.cnt, 0) * 1000000) // wt.n_rows) AS appm,
         |         ep.eppm
         |       FROM wt CROSS JOIN dom d
         |       LEFT JOIN wc ON wc.win_start = wt.win_start AND wc.bucket = d.bucket
         |       JOIN ep ON ep.bucket = d.bucket),
         |l1 AS (SELECT win_start, bucket, appm, eppm,
         |         ${DetMath.floorLog2Sql("appm")} AS ma,
         |         ${DetMath.floorLog2Sql("eppm")} AS me FROM ap),
         |l2 AS (SELECT *, CAST(appm AS DOUBLE) / CAST((CAST(1 AS BIGINT) << ma) AS DOUBLE) AS fa,
         |               CAST(eppm AS DOUBLE) / CAST((CAST(1 AS BIGINT) << me) AS DOUBLE) AS fe FROM l1),
         |l3 AS (SELECT *, ((fa - CAST(1 AS DOUBLE)) / (fa + CAST(1 AS DOUBLE))) AS ya,
         |               ((fe - CAST(1 AS DOUBLE)) / (fe + CAST(1 AS DOUBLE))) AS ye FROM l2),
         |l4 AS (SELECT *, ${DetMath.seriesSql("ya")} AS sa, ${DetMath.seriesSql("ye")} AS se FROM l3),
         |l5 AS (SELECT win_start, bucket,
         |         (CAST(appm - eppm AS DOUBLE) / CAST(1000000 AS DOUBLE))
         |           * (${DetMath.lnFromPartsSql("ma", "sa")} - ${DetMath.lnFromPartsSql("me", "se")}) AS term
         |       FROM l4),
         |psi AS (SELECT win_start,
         |          list_reduce(list_prepend(CAST(0 AS DOUBLE), list(term ORDER BY bucket)),
         |                      (s, v) -> s + v) AS psi
         |        FROM l5 GROUP BY win_start)
         |SELECT p.win_start, p.win_start + INTERVAL '1 day' AS win_end, wt.n_rows, p.psi
         |FROM psi p JOIN wt USING (win_start)""".stripMargin
    },
    "st_dedup" -> {
      import graft.llmdata.TextPrimitives.{duckPolyHashArray, duckWords, P}
      import graft.streaming.DocStream.{Fp2Mult, Fp2Mod}
      s"""WITH w AS (SELECT doc_id, ${duckPolyHashArray(duckWords("text"))} AS th FROM documents),
         |fp AS (SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), th), (h, c) -> (h * 37 + c) % $P) AS fingerprint,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), th), (h, c) -> (h * $Fp2Mult + c) % $Fp2Mod) AS fingerprint2
         |FROM w)
         |SELECT min(doc_id) AS doc_id, fingerprint, fingerprint2, CAST(count(*) AS BIGINT) AS n_copies
         |FROM fp GROUP BY fingerprint, fingerprint2""".stripMargin
    },
    "st_joined" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        |           FROM events WHERE user_id % 4 = 0),
        |l AS (SELECT * FROM e WHERE event_type = 'view'),
        |r AS (SELECT * FROM e WHERE event_type = 'purchase')
        |SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
        |       l.ts AS l_ts, r.ts AS r_ts, l.value AS l_value, r.value AS r_value
        |FROM l JOIN r ON l.user_id = r.user_id
        |  AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 21600 SECONDS""".stripMargin,
    // Stream-static enrichment's complete output ≡ the batch left join:
    // no watermark, no stream state — each event is enriched (or
    // null-padded) in exactly the one micro-batch it arrives in.
    "st_enrich" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value
        |           FROM events WHERE user_id % 4 = 1),
        |d AS (SELECT c_custkey AS user_id, c_name, c_nationkey FROM customer
        |      WHERE c_custkey % 3 != 0)
        |SELECT e.event_id, e.user_id, e.event_type, e.value, d.c_name, d.c_nationkey
        |FROM e LEFT JOIN d USING (user_id)""".stripMargin,
    "st_ingest_store" -> {
      import graft.llmdata.TextPrimitives.{duckPolyHashArray, duckWords, P}
      // The store merges on `fingerprint` alone (fingerprint2 exists only
      // to widen the IN-FLIGHT dedup key), so the final state is one row
      // per distinct fingerprint, first arrival = min doc_id under the
      // scripted rank-ordered batches.
      s"""WITH w AS (SELECT doc_id, ${duckPolyHashArray(duckWords("text"))} AS th FROM documents
         |           WHERE doc_id % 4 = 0),
         |fp AS (SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), th), (h, c) -> (h * 37 + c) % $P) AS fingerprint
         |FROM w)
         |SELECT min(doc_id) AS doc_id, fingerprint FROM fp GROUP BY fingerprint""".stripMargin
    },
    "st_snapshot_lineage" -> {
      import graft.llmdata.TextPrimitives.{duckPolyHashArray, duckWords, P}
      // The lineage is static under the scripted slices: version v holds
      // every fingerprint whose FIRST copy (min doc_id) lands in slice
      // (doc_id/4) % 3 < v. Exactly versions 1..3 may exist — an extra
      // churn version or a replayed doc_id would emit unmatched rows.
      s"""WITH w AS (SELECT doc_id, ${duckPolyHashArray(duckWords("text"))} AS th FROM documents
         |           WHERE doc_id % 4 = 0),
         |fp AS (SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), th), (h, c) -> (h * 37 + c) % $P) AS fingerprint
         |FROM w),
         |firsts AS (SELECT min(doc_id) AS doc_id, fingerprint FROM fp GROUP BY fingerprint)
         |SELECT CAST(v.version AS BIGINT) AS version, f.doc_id, f.fingerprint
         |FROM firsts f JOIN (VALUES (1), (2), (3)) v(version)
         |  ON ((f.doc_id // 4) % 3) < v.version""".stripMargin
    },
    "st_neardup" -> {
      import graft.llmdata.DocDedup
      import graft.llmdata.TextPrimitives.{duckPolyHashArray, duckShingles, duckWords}
      val sigLen = DocDedup.MinHashAB.length
      val bandKey = s"array_to_string(list_slice(sig, band * ${DocDedup.RowsPerBand} + 1, band * ${DocDedup.RowsPerBand} + ${DocDedup.RowsPerBand}), '_')"
      // Same candidate CTEs as the d_minhash oracle; the verify step is the
      // signature-agreement ESTIMATE (what streaming state can compute),
      // not the exact shingle Jaccard. n/sigLen is binary-exact, so the
      // double compares hash-stable.
      s"""WITH w AS (SELECT doc_id, text, ${duckWords("text")} AS words FROM documents),
         |sh AS (SELECT doc_id, ${duckShingles("words", "text", 3)} AS s FROM w),
         |sig AS (SELECT doc_id, ${DocDedup.duckSignature(duckPolyHashArray("s"))} AS sig FROM sh),
         |bands AS (SELECT doc_id, band, $bandKey AS band_key
         |          FROM sig, (SELECT unnest(range(0, ${DocDedup.Bands})) AS band)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |est AS (
         |  SELECT id_a, id_b,
         |    CAST(list_sum(list_transform(range(1, ${sigLen + 1}),
         |      i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / $sigLen AS est_jaccard
         |  FROM cand JOIN sig sa ON cand.id_a = sa.doc_id JOIN sig sb ON cand.id_b = sb.doc_id)
         |SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5""".stripMargin
    },
    "st_triangles" -> {
      import graft.llmdata.DocDedup
      import graft.llmdata.TextPrimitives.{duckPolyHashArray, duckShingles, duckWords}
      val sigLen = DocDedup.MinHashAB.length
      val bandKey = s"array_to_string(list_slice(sig, band * ${DocDedup.RowsPerBand} + 1, band * ${DocDedup.RowsPerBand} + ${DocDedup.RowsPerBand}), '_')"
      // st_neardup's est-Jaccard pair chain, then the SAME degree-oriented
      // triangle CTEs as the x_triangles family (Corpus.triangleChainCtes —
      // one SQL source of truth for the orientation algorithm): the batch
      // twin's counts, and with them the streaming count store
      // (spec-pinned equal after every batch prefix), land on exact
      // integer triangle counts of the streamed pair graph.
      s"""WITH w AS (SELECT doc_id, text, ${duckWords("text")} AS words FROM documents),
         |sh AS (SELECT doc_id, ${duckShingles("words", "text", 3)} AS s FROM w),
         |sig AS (SELECT doc_id, ${DocDedup.duckSignature(duckPolyHashArray("s"))} AS sig FROM sh),
         |bands AS (SELECT doc_id, band, $bandKey AS band_key
         |          FROM sig, (SELECT unnest(range(0, ${DocDedup.Bands})) AS band)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |est AS (
         |  SELECT id_a, id_b,
         |    CAST(list_sum(list_transform(range(1, ${sigLen + 1}),
         |      i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / $sigLen AS est_jaccard
         |  FROM cand JOIN sig sa ON cand.id_a = sa.doc_id JOIN sig sb ON cand.id_b = sb.doc_id),
         |pairs AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
         |tund AS MATERIALIZED (SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
         |        FROM pairs WHERE id_a != id_b),
         |${Corpus.triangleChainCtes("tund")}
         |SELECT d.node AS doc_id, CAST(coalesce(n.n_triangles, 0) AS BIGINT) AS n_triangles
         |FROM tdeg d LEFT JOIN tn n ON d.node = n.doc_id""".stripMargin
    },
    "st_clusters" -> {
      import graft.llmdata.DocDedup
      import graft.llmdata.TextPrimitives.{duckPolyHashArray, duckShingles, duckWords}
      val sigLen = DocDedup.MinHashAB.length
      val bandKey = s"array_to_string(list_slice(sig, band * ${DocDedup.RowsPerBand} + 1, band * ${DocDedup.RowsPerBand} + ${DocDedup.RowsPerBand}), '_')"
      // st_neardup's pair chain, then the TRUE component labeling
      // (recursive reachability closure, min reachable id) — the batch
      // twin's star contraction must land on the mathematical answer, and
      // with it the streaming store (spec-pinned equal to the twin).
      s"""WITH RECURSIVE w AS (SELECT doc_id, text, ${duckWords("text")} AS words FROM documents),
         |sh AS (SELECT doc_id, ${duckShingles("words", "text", 3)} AS s FROM w),
         |sig AS (SELECT doc_id, ${DocDedup.duckSignature(duckPolyHashArray("s"))} AS sig FROM sh),
         |bands AS (SELECT doc_id, band, $bandKey AS band_key
         |          FROM sig, (SELECT unnest(range(0, ${DocDedup.Bands})) AS band)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |est AS (
         |  SELECT id_a, id_b,
         |    CAST(list_sum(list_transform(range(1, ${sigLen + 1}),
         |      i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / $sigLen AS est_jaccard
         |  FROM cand JOIN sig sa ON cand.id_a = sa.doc_id JOIN sig sb ON cand.id_b = sb.doc_id),
         |pairs AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
         |ccedges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |            UNION SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM ccedges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN ccedges e ON r.dst = e.src)
         |SELECT src AS doc_id, least(src, min(dst)) AS cluster
         |FROM reach GROUP BY src""".stripMargin
    })
}
