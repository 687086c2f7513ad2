package graft.core

import graft.TestSpark
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val left = Seq(
    (1L, "a", t("2026-01-01 10:00:00")),
    (2L, "a", t("2026-01-01 12:00:00")),
    (3L, "a", t("2026-01-01 09:00:00")), // before any snapshot
    (4L, "b", t("2026-01-01 12:00:00"))) // key with no snapshots
    .toDF("id", "k", "ts")

  private val right = Seq(
    ("a", t("2026-01-01 10:00:00"), 100L), // same instant as left id=1
    ("a", t("2026-01-01 11:30:00"), 200L))
    .toDF("k", "snap_ts", "snap_id")

  test("backward as-of: latest snapshot at-or-before, NULL when none") {
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "ts", "snap_ts",
      Seq("snap_id", "snap_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out == Map(
      1L -> Some(100L), // same-instant snapshot visible (>= semantics)
      2L -> Some(200L),
      3L -> None,
      4L -> None))
  }

  test("tolerance: stale matches NULL-extend whole-row, fresh ones survive") {
    // id=1 matches at 0s staleness, id=2 at 30min — a 10-minute tolerance
    // keeps 1 and rejects 2 (BOTH payload columns null together)
    val out = AsofJoin.asofBackwardTolerance(left, right, Seq("k"), "ts", "snap_ts",
        Seq("snap_id", "snap_ts"), toleranceSeconds = 600L)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4))))).toMap
    assert(out(1L) == ((Some(100L), Some(t("2026-01-01 10:00:00")))))
    assert(out(2L) == ((None, None)), "stale snapshot must reject whole-row")
    assert(out(3L) == ((None, None)) && out(4L) == ((None, None)))
    // a large tolerance degrades to plain backward as-of
    val wide = AsofJoin.asofBackwardTolerance(left, right, Seq("k"), "ts", "snap_ts",
        Seq("snap_id"), toleranceSeconds = 86400L)
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(wide == Map(1L -> Some(100L), 2L -> Some(200L), 3L -> None, 4L -> None))
  }

  test("forward as-of: earliest snapshot at-or-after") {
    val out = AsofJoin.asofForward(left, right, Seq("k"), "ts", "snap_ts",
      Seq("snap_id", "snap_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out == Map(
      1L -> Some(100L),
      2L -> None,      // nothing after 12:00
      3L -> Some(100L),
      4L -> None))
  }

  test("a NULL-payload snapshot yields NULL, never an older snapshot's value") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // snapshots: ts=10:00 snap=100; ts=11:00 snap=NULL (the latest)
    val snaps = right.withColumn("snap_id",
      when(col("snap_ts") === t("2026-01-01 11:30:00"), lit(null).cast("long"))
        .otherwise(col("snap_id")))
    val out = AsofJoin.asofBackward(left, snaps, Seq("k"), "ts", "snap_ts",
      Seq("snap_id", "snap_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    // left id=2 (12:00): latest snapshot is the 11:30 one whose snap_id is
    // NULL — must NOT leak 100 from 10:00
    assert(out(2L) == None)
    assert(out(1L) == Some(100L))
  }

  test("multi-column payload never mixes rows; NULL right timestamps never match") {
    import spark.implicits._
    val snaps = Seq(
      ("a", Some(t("2026-01-01 10:00:00")), Some(100L), "v1"),
      ("a", Some(t("2026-01-01 11:00:00")), None, "v2"),      // latest: NULL id, v2
      ("a", Option.empty[Timestamp], Some(999L), "ghost"))    // NULL ts: excluded
      .toDF("k", "snap_ts", "snap_id", "tag")
    val out = AsofJoin.asofBackward(
      Seq((1L, "a", t("2026-01-01 12:00:00")), (2L, "b", t("2026-01-01 12:00:00")))
        .toDF("id", "k", "ts"),
      snaps, Seq("k"), "ts", "snap_ts", Seq("snap_id", "tag"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.getString(4))))).toMap
    // whole latest snapshot (NULL, v2) — not the torn mix (100, v2)
    assert(out(1L) == ((None, Some("v2"))))
    // key b has only the NULL-ts ghost -> no match at all
    assert(out(2L) == ((None, None)))
  }

  test("NULL left timestamps and NULL keys never match, in both directions") {
    import spark.implicits._
    val l = Seq(
      (1L, Option("a"), Option(t("2026-01-01 12:00:00"))),
      (2L, Option("a"), Option.empty[Timestamp]),   // NULL ts
      (3L, Option.empty[String], Option(t("2026-01-01 12:00:00")))) // NULL key
      .toDF("id", "k", "ts")
    val r = Seq(
      (Option("a"), t("2026-01-01 10:00:00"), 100L),
      (Option.empty[String], t("2026-01-01 09:00:00"), 666L)) // NULL-key snapshot: inert
      .toDF("k", "snap_ts", "snap_id")
    def ids(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(x => x.getLong(0) -> Option(x.get(3)).map(_.asInstanceOf[Long])).toMap
    val back = ids(AsofJoin.asofBackward(l, r, Seq("k"), "ts", "snap_ts", Seq("snap_id", "snap_ts")))
    assert(back == Map(1L -> Some(100L), 2L -> None, 3L -> None))
    val fwd = ids(AsofJoin.asofForward(l, r, Seq("k"), "ts", "snap_ts", Seq("snap_id", "snap_ts")))
    assert(fwd == Map(1L -> None, 2L -> None, 3L -> None))
  }

  test("output keeps every left row exactly once and all left columns") {
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "ts", "snap_ts", Seq("snap_id"))
    assert(out.count() == left.count())
    assert(out.columns.toSeq == Seq("id", "k", "ts", "snap_id"))
  }
}
