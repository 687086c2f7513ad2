package graft.streaming

import graft.TestSpark
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("windowed revenue aggregates by tumbling window and type") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.windowedRevenue(df)
      .writeStream.format("memory").queryName("win_rev")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(
        (1L, ts(1), 1L, "buy", 10.0),
        (2L, ts(4), 2L, "buy", 5.0),
        (3L, ts(12), 1L, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_rev").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3), r.getDouble(4))).toSet
      assert(rows == Set(
        ("2026-01-01 10:00:00.0", "buy", 2L, 15.0),
        ("2026-01-01 10:10:00.0", "view", 1L, 1.0)))
    } finally q.stop()
  }

  test("batch sessionization splits on gaps and agrees with the streaming state machine") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      (1L, ts(0), 1L, "a", 1.0), (2L, ts(10), 1L, "a", 2.0),  // session 1 (gap 10m)
      (3L, ts(45), 1L, "a", 4.0),                             // session 2 (gap 35m > 30m)
      (4L, ts(5), 2L, "b", 8.0))                              // other user
    val batch = EventStream.sessionizeBatch(
        events.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).toString, r.getLong(4), r.getDouble(5))).toSet
    assert(batch == Set(
      (1L, "2026-01-01 10:00:00.0", 2L, 3.0),
      (1L, "2026-01-01 10:45:00.0", 1L, 4.0),
      (2L, "2026-01-01 10:05:00.0", 1L, 8.0)))
    // the streaming state machine produces the same closed sessions
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = EventStream.sessionize(spark,
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("batch_vs_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      // push the watermark far ahead so every session times out and closes
      mem.addData((9L, Timestamp.valueOf("2026-01-02 00:00:00"), 99L, "x", 0.0))
      q.processAllAvailable()
      mem.addData((10L, Timestamp.valueOf("2026-01-03 00:00:00"), 99L, "x", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("batch_vs_stream").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(3), r.getDouble(4)))
        .filter(_._1 != 99L).toSet
      assert(streamed == batch, s"stream=$streamed batch=$batch")
    } finally q.stop()
  }

  test("late-but-in-watermark event extends the session start backwards") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.sessionize(spark, df, watermark = "2 hours")
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, ts(50), 1L, "buy", 1.0)) // 10:50
      q.processAllAvailable()
      // late event 25 min EARLIER — within gap of the session interval, so
      // it must merge and pull session_start back (not report start=10:50)
      mem.addData((2L, ts(25), 1L, "buy", 2.0)) // 10:25
      q.processAllAvailable()
      // advance watermark far past the gap so the session closes
      mem.addData((9L, Timestamp.valueOf("2026-01-01 16:00:00"), 2L, "view", 0.0))
      q.processAllAvailable()
      mem.addData((10L, Timestamp.valueOf("2026-01-01 17:00:00"), 2L, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("late_sessions").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(3), r.getDouble(4))).toSet
      assert(rows.contains((1L, "2026-01-01 10:25:00.0", 2L, 3.0)), s"got $rows")
    } finally q.stop()
  }

  test("sessionization closes a session after the gap and counts its events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.sessionize(spark, df)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 5 min apart (one session), then silence
      mem.addData((1L, ts(0), 1L, "buy", 1.0), (2L, ts(5), 1L, "buy", 2.0))
      q.processAllAvailable()
      // advance watermark far past the session gap so the timeout fires
      mem.addData((9L, Timestamp.valueOf("2026-01-01 12:00:00"), 2L, "view", 0.0))
      q.processAllAvailable()
      mem.addData((10L, Timestamp.valueOf("2026-01-01 13:00:00"), 2L, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSet
      assert(rows.contains((1L, 2L, 3.0)), s"got $rows")
    } finally q.stop()
  }

  test("stream-static enrichment joins the dim per micro-batch, keeps unmatched events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val q = EventStream.enrich(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"), dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((10L, ts(0), 1L, "buy", 5.0), (11L, ts(1), 9L, "buy", 7.0))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => r.getLong(1) -> Option(r.getAs[String]("tier"))).toMap
      assert(rows == Map(10L -> Some("gold"), 11L -> None))
    } finally q.stop()
  }

  test("stream-stream join pairs events within the delay window, drops outside it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lm = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val rm = MemoryStream[(Long, Timestamp, Long, String, Double)]
    def df(m: MemoryStream[(Long, Timestamp, Long, String, Double)]) =
      m.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.streamStreamJoin(df(lm), df(rm), maxDelaySeconds = 600)
      .writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append()).start()
    try {
      lm.addData((1L, ts(0), 1L, "order", 10.0), (2L, ts(0), 2L, "order", 20.0))
      rm.addData(
        (100L, ts(5), 1L, "payment", 10.0),   // within 10 min of order 1
        (101L, ts(20), 2L, "payment", 20.0),  // 20 min after order 2 -> outside
        (102L, ts(8), 3L, "payment", 30.0))   // no matching order
      q.processAllAvailable()
      val pairs = spark.table("ss_join").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(pairs == Set((1L, 100L)), s"got $pairs")
    } finally q.stop()
  }

  test("file source starts cleanly on an empty feed directory (cold-start order)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_empty").toString
    // No files yet — the schema sniff must fall back, not fail the stream.
    val src = EventStream.fileSource(spark, s"$dir/*")
    assert(src.isStreaming)
    assert(src.schema.fieldNames.contains("ts"))
  }

  test("file source end to end: declared-schema parquet stream matches the batch twin") {
    import org.apache.spark.sql.functions._
    // Lay the events fixture out as 3 separate parquet files (whatever raw
    // ts layout the generator shipped — fileSource sniffs it), as a
    // micro-batch file feed would arrive.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_files").toString
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("value", expr("cast(floor(value) as double)"))
    (0 until 3).foreach { i =>
      raw.filter(col("event_id") % 3 === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/batch_$i.parquet")
    }
    val q = EventStream.windowedRevenue(EventStream.fileSource(spark, s"$dir/*"), "1 hour")
      .writeStream.format("memory").queryName("file_win_rev")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      // win_start is TIMESTAMP on the stream side (watermark needs TZ) and
      // TIMESTAMP_NTZ on the batch twin — cast both to string in Spark
      // (UTC session) so the comparison is type-agnostic.
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .selectExpr("cast(win_start as string)", "event_type", "n_events", "revenue")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val streamed = rows(spark.table("file_win_rev"))
      // Batch twin over the identical files with the identical ts
      // normalization (long-nanos feeds convert, NTZ feeds pass through);
      // values floored on both sides so the double sums are exact and
      // order-independent.
      val batchIn = spark.read.parquet(s"$dir/*")
      val batchNorm =
        if (batchIn.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          batchIn.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
        else batchIn
      val batch = rows(EventStream.windowedRevenueBatch(batchNorm))
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("sequenceNearDup: replayed user found, independent users below threshold") {
    import spark.implicits._
    // user 1 and its replay (user 11, one event dropped) are near-dups;
    // user 2's sequence differs everywhere.
    def ev(uid: Long, ids: Seq[Long], types: Seq[String], vals: Seq[Double]) =
      ids.indices.map(i => (uid * 1000 + ids(i), ts(ids(i).toInt), uid, types(i), vals(i)))
    val types1 = Seq("a", "b", "a", "c", "b", "a", "c", "a")
    val vals1 = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)
    val events = (
      ev(1L, 1L to 8L, types1, vals1) ++
      ev(11L, 1L to 7L, types1.take(7), vals1.take(7)) ++ // replay minus the tail
      ev(2L, 1L to 8L, Seq("c", "c", "b", "b", "a", "b", "c", "c"),
        Seq(9.0, 8.0, 7.0, 6.0, 5.0, 4.0, 3.0, 2.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val pairs = EventStream.sequenceNearDup(events)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 11L)))
  }

  test("rolling frame stats: window sum/count over the last N rows plus arrival gap") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(0), 1L, "a", 1.0),
      (2L, ts(1), 1L, "a", 2.0),
      (3L, ts(2), 1L, "a", 4.0),
      (4L, ts(3), 1L, "a", 8.0),
      (5L, ts(0), 2L, "b", 100.0)) // other user — frames never cross users
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStream.rollingStats(events, frame = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        Option(r.get(5)).map(_.asInstanceOf[Long])))
      .toSet
    assert(out == Set(
      (1L, 100L, 1L, None),              // first event: frame = itself, no gap
      (2L, 300L, 2L, Some(60000000L)),   // 100 + 200 cents, 1 min gap
      (3L, 700L, 3L, Some(60000000L)),   // 100 + 200 + 400
      (4L, 1400L, 3L, Some(60000000L)),  // frame of 3 slides: 200 + 400 + 800
      (5L, 10000L, 1L, None)))           // user 2 isolated
  }

  test("streaming drift monitor equals its batch twin (st_drift) on the full window set") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // real corpus quarter-slice, the registered row's cut-training rule
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.01")
      .filter(col("user_id") % 4 === 0)
    val cuts = graft.sources.TableStats.equiDepthHistogram(
      ev.selectExpr("cast(floor(value * 100) as bigint) as cents")
        .filter(col("cents") <= 5000), "cents", 8)
    val twin = EventStream.bucketDriftBatch(ev, cuts).collect()
      .map(r => (r.getAs[Any](0).toString.replace('T', ' ').take(16), r.getLong(2), r.getLong(3))).toSet
    assert(twin.nonEmpty)
    // drifted mass visible IN EVERY WINDOW: the value mass above the
    // stale training range piles into the top bucket, so each window's
    // top-bucket count must dwarf that window's typical trained-range
    // bucket (median of the others) — a flat non-drifting distribution,
    // or a bucketing regression collapsing everything into one bucket,
    // fails this.
    twin.groupBy(_._1).foreach { case (win, rs) =>
      val top = rs.filter(_._2 == rs.map(_._2).max).map(_._3).sum
      val others = rs.filter(_._2 != rs.map(_._2).max).map(_._3).toSeq.sorted
      assert(others.nonEmpty && top > 2 * others(others.size / 2),
        s"window $win: top-bucket mass $top not dominant over median ${others}")
    }
    val rows = ev.select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val mem = MemoryStream[(Long, java.time.LocalDateTime, Long, String, Double)]
    val q = EventStream.bucketDrift(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"), cuts)
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { s =>
        mem.addData(s.toSeq)
        q.processAllAvailable()
      }
      // win_start is TZ on the stream side (watermark) and NTZ on the
      // twin — string-compare in the UTC-pinned session.
      val streamed = spark.table("drift_stream").collect()
        .map(r => (r.getAs[Any](0).toString.replace('T', ' ').take(16), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == twin)
    } finally q.stop()
  }

  test("streaming PSI summary equals its batch twin (st_drift_psi) bit for bit on the full window set") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.01")
      .filter(col("user_id") % 4 === 0)
    val baseline = ev.selectExpr("cast(floor(value * 100) as bigint) as cents")
      .filter(col("cents") <= 5000)
    val cuts = graft.sources.TableStats.equiDepthHistogram(baseline, "cents", 8)
    val twin = EventStream.bucketDriftPsiBatch(ev, cuts, baseline).collect()
      .map(r => (r.getAs[Any](0).toString.replace('T', ' ').take(16), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    assert(twin.nonEmpty)
    // The fixture's drifted mass (values above the stale training range)
    // must register: every window's PSI is large by monitoring standards
    // (the usual "investigate" bar is 0.2) and finite.
    EventStream.bucketDriftPsiBatch(ev, cuts, baseline).collect().foreach { r =>
      val psi = r.getDouble(3)
      assert(!psi.isNaN && !psi.isInfinite, s"PSI not finite: $psi")
      assert(psi > 0.2, f"window ${r.get(0)} PSI $psi%.3f below the drifted fixture's floor")
    }
    val rows = ev.select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val mem = MemoryStream[(Long, java.time.LocalDateTime, Long, String, Double)]
    val q = EventStream.bucketDriftPsi(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"), cuts, baseline)
      .writeStream.format("memory").queryName("psi_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { s =>
        mem.addData(s.toSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("psi_stream").collect()
        .map(r => (r.getAs[Any](0).toString.replace('T', ' ').take(16), r.getLong(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
      assert(streamed == twin,
        "streaming PSI diverged from the batch twin (bit-level double compare)")
    } finally q.stop()
  }
}
