package graft.core

import graft.TestSpark
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("bucketized range join equals the plain inequality join") {
    val points = (0 until 200).map { i =>
      (i.toLong, i % 3, t(f"2026-01-01 ${i % 24}%02d:${i % 60}%02d:00"))
    }.toDF("pid", "k", "ts")
    val intervals = Seq(
      (100L, 0, t("2026-01-01 03:00:00"), t("2026-01-01 07:30:00")),
      (101L, 0, t("2026-01-01 06:00:00"), t("2026-01-01 06:05:00")), // overlapping
      (102L, 1, t("2026-01-01 00:00:00"), t("2026-01-02 00:00:00")), // whole day
      (103L, 2, t("2026-01-05 00:00:00"), t("2026-01-06 00:00:00"))) // no points
      .toDF("win_id", "k", "s", "e")
    val fast = RangeJoin.pointInInterval(points, intervals, "ts", "s", "e",
        bucketSeconds = 3600L, keys = Seq("k"))
      .select("pid", "win_id")
    val plain = points.join(intervals, Seq("k"))
      .filter(col("ts") >= col("s") && col("ts") < col("e"))
      .select("pid", "win_id")
    assert(fast.count() == plain.count())
    assert(fast.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(fast).count() == 0)
  }

  test("degenerate intervals (end <= start) match nothing and do not error") {
    val points = Seq((1L, t("2026-01-01 05:00:00"))).toDF("pid", "ts")
    val intervals = Seq(
      (9L, t("2026-01-01 05:00:00"), t("2026-01-01 05:00:00")),  // empty
      (10L, t("2026-01-01 08:00:00"), t("2026-01-01 01:00:00"))) // inverted
      .toDF("win_id", "s", "e")
    assert(RangeJoin.pointInInterval(points, intervals, "ts", "s", "e", 3600L).count() == 0)
  }

  test("half-open semantics: end boundary excluded, start included") {
    val points = Seq((1L, t("2026-01-01 05:00:00")), (2L, t("2026-01-01 06:00:00")))
      .toDF("pid", "ts")
    val intervals = Seq((9L, t("2026-01-01 05:00:00"), t("2026-01-01 06:00:00")))
      .toDF("win_id", "s", "e")
    val out = RangeJoin.pointInInterval(points, intervals, "ts", "s", "e", 3600L)
      .select("pid").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("interval overlap equals the plain nonempty-intersection join, exactly once") {
    // Long spans force pairs to share MANY buckets — the exactly-once
    // predicate (not a distinct) must still emit each pair a single time.
    val left = (0 until 60).map { i =>
      (i.toLong, i % 2, t(f"2026-01-01 ${i % 20}%02d:00:00"),
        t(f"2026-01-0${1 + i % 3} ${(i * 7) % 24}%02d:30:00"))
    }.filter { case (_, _, s, e) => e.after(s) }.toDF("a_id", "k", "a_s", "a_e")
    val right = (0 until 40).map { i =>
      (100L + i, i % 2, t(f"2026-01-0${1 + i % 2} ${(i * 5) % 24}%02d:15:00"),
        t(f"2026-01-0${1 + i % 2} ${(i * 5) % 24}%02d:${15 + i % 45}%02d:00"))
    }.filter { case (_, _, s, e) => e.after(s) }.toDF("b_id", "k", "b_s", "b_e")
    val fast = RangeJoin.intervalOverlap(left, right, "a_s", "a_e", "b_s", "b_e",
        bucketSeconds = 3600L, keys = Seq("k"))
      .select("a_id", "b_id")
    val plain = left.join(right, Seq("k"))
      .filter(greatest(col("a_s"), col("b_s")) < least(col("a_e"), col("b_e")))
      .select("a_id", "b_id")
    assert(plain.count() > 0, "fixture must produce overlaps")
    assert(fast.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(fast).count() == 0)
  }

  test("interval overlap: empty intervals overlap nothing, even inside another interval") {
    val left = Seq((1L, t("2026-01-01 00:00:00"), t("2026-01-01 10:00:00")))
      .toDF("a_id", "a_s", "a_e")
    val right = Seq(
      (9L, t("2026-01-01 05:00:00"), t("2026-01-01 05:00:00")),  // empty, inside left
      (10L, t("2026-01-01 09:59:59"), t("2026-01-01 10:00:01")), // straddles left's end
      (11L, t("2026-01-01 10:00:00"), t("2026-01-01 11:00:00"))) // touches at boundary only
      .toDF("b_id", "b_s", "b_e")
    val out = RangeJoin.intervalOverlap(left, right, "a_s", "a_e", "b_s", "b_e", 3600L)
      .select("b_id").as[Long].collect().toSet
    // 9: empty set overlaps nothing; 11: [10:00, 11:00) ∩ [0:00, 10:00) = ∅
    assert(out == Set(10L))
  }

  test("band join equals the plain |Δ| <= eps inequality join, negatives included") {
    // Values straddle zero and bucket edges; keys isolate partitions.
    val left = (0 until 120).map(i => (i.toLong, i % 3, (i * 37L) - 2000L))
      .toDF("lid", "k", "lv")
    val right = (0 until 90).map(i => (500L + i, i % 3, (i * 53L) - 2500L))
      .toDF("rid", "k", "rv")
    val eps = 100L
    val fast = RangeJoin.bandJoin(left, right, "lv", "rv", eps, keys = Seq("k"))
      .select("lid", "rid")
    val plain = left.join(right, Seq("k"))
      .filter(abs(col("lv") - col("rv")) <= eps)
      .select("lid", "rid")
    assert(plain.count() > 0, "fixture must produce band matches")
    assert(fast.count() == plain.count(), "each pair must be emitted exactly once")
    assert(fast.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(fast).count() == 0)
  }

  test("band join: exact at epoch-nanos magnitude (past double precision)") {
    // ~1.7e18 is far beyond 2^53: a double-division bucket would round and
    // misplace rows near bucket edges, silently dropping in-band pairs.
    val base = 1700000000000000000L
    val left = (0 until 400).map(i => (i.toLong, base + i * 251L)).toDF("lid", "lv")
    val right = (0 until 400).map(i => (1000L + i, base + i * 257L)).toDF("rid", "rv")
    val eps = 500L
    val fast = RangeJoin.bandJoin(left, right, "lv", "rv", eps).select("lid", "rid")
    val plain = left.crossJoin(right)
      .filter(abs(col("lv") - col("rv")) <= eps).select("lid", "rid")
    assert(plain.count() > 0)
    assert(fast.count() == plain.count())
    assert(fast.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(fast).count() == 0)
  }

  test("band join: eps boundary included, different keys never match") {
    val left = Seq((1L, 0, 0L), (2L, 0, -300L)).toDF("lid", "k", "lv")
    val right = Seq(
      (10L, 0, 100L),   // exactly eps from lid=1 — included
      (11L, 0, 101L),   // one past eps — excluded
      (12L, 1, 0L),     // value match, wrong key — excluded
      (13L, 0, -250L))  // within eps of lid=2 (negative side)
      .toDF("rid", "k", "rv")
    val out = RangeJoin.bandJoin(left, right, "lv", "rv", eps = 100L, keys = Seq("k"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 13L)))
  }
}
