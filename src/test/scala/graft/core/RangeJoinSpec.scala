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
}
