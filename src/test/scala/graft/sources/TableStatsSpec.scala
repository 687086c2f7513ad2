package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class TableStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("analyze: rows, nulls, min/max, exact NDV below the sketch width") {
    val in = Seq(
      (1L, Option("a"), 1.5),
      (2L, None, -2.0),
      (3L, Option("b"), 1.5),
      (4L, Option("a"), 9.0))
      .toDF("id", "s", "x")
    val out = TableStats.analyze(in, Seq("id", "s", "x")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4), r.getDouble(5))))
      .toMap
    assert(out("id") == ((4L, 0L, "1", "4", 4.0)))
    // min/max/NDV describe the NON-NULL population; nulls counted apart
    assert(out("s") == ((4L, 1L, "a", "b", 2.0)))
    assert(out("x") == ((4L, 0L, "-2.0", "9.0", 3.0)))
  }

  test("analyze: KMV estimate tracks cardinality (error ~ 1/sqrt(k))") {
    val in = (1L to 20000L).map(i => Tuple1(i * 2654435761L % 1000000007L))
      .toDF("v")
    // k=256 -> ~6% expected relative error; assert a 3-sigma-ish bound
    val wide = TableStats.analyze(in, Seq("v"), kmvK = 256).collect()(0).getDouble(5)
    assert(math.abs(wide - 20000.0) / 20000.0 < 0.20, s"k=256 estimate $wide")
    // the default k=32 sketch (stderr ~18%) stays in the right decade
    val deflt = TableStats.analyze(in, Seq("v")).collect()(0).getDouble(5)
    assert(deflt > 10000 && deflt < 40000, s"k=32 estimate $deflt")
  }

  test("mergeStats of split partials is identical to a direct analyze") {
    val in = (1L to 5000L).map { i =>
      (i, if (i % 11 == 0) None else Option(s"v${i % 700}"), (i % 97).toDouble / 2)
    }.toDF("id", "s", "x")
    val cols = Seq("id", "s", "x")
    val direct = TableStats.analyze(in, cols).collect().map(_.toSeq).toSet
    val parts = Seq(
      in.filter($"id" % 3 === 0), in.filter($"id" % 3 === 1), in.filter($"id" % 3 === 2))
      .map(TableStats.analyzePartial(_, cols))
    val merged = TableStats.mergeStats(parts, cols).collect().map(_.toSeq).toSet
    // KMV is a pure set function: the merged sketch state equals the
    // direct pass's, so even the NDV estimate matches bit-for-bit.
    assert(merged == direct)
  }

  test("mergeStats: typed min/max merge (string-cast merge would order '9' > '10')") {
    val a = Seq(Tuple1(9L)).toDF("v")
    val b = Seq(Tuple1(10L)).toDF("v")
    val merged = TableStats.mergeStats(
      Seq(TableStats.analyzePartial(a, Seq("v")), TableStats.analyzePartial(b, Seq("v"))),
      Seq("v")).collect()(0)
    assert(merged.getString(3) == "9" && merged.getString(4) == "10")
  }

  test("mergeStats: a part with an all-null column folds cleanly") {
    val a = Seq((1L, Option("x")), (2L, Option("y"))).toDF("id", "s")
    val b = Seq((3L, Option.empty[String])).toDF("id", "s")
    val out = TableStats.mergeStats(
      Seq(TableStats.analyzePartial(a, Seq("s")), TableStats.analyzePartial(b, Seq("s"))),
      Seq("s")).collect()(0)
    assert(out.getLong(1) == 3L && out.getLong(2) == 1L)
    assert(out.getString(3) == "x" && out.getString(4) == "y")
    assert(out.getDouble(5) == 2.0)
  }

  test("analyze rejects unknown columns loudly") {
    val in = Seq((1, 2)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      TableStats.analyze(in, Seq("a", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("histogram: exact integer buckets, negatives, nulls excluded") {
    // lo = -10, hi = 9 → w = 19 div 4 + 1 = 5; buckets [-10,-6] [-5,-1] [0,4] [5,9]
    val in = (Seq(-10L, -6L, -5L, 0L, 4L, 5L, 9L).map(Option(_)) :+ None)
      .toDF("v")
    val out = TableStats.histogram(in, "v", nBuckets = 4).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    assert(out(0L) == ((-10L, -6L, 2L, -10L, -6L)))
    assert(out(1L) == ((-5L, -1L, 1L, -5L, -5L)))
    assert(out(2L) == ((0L, 4L, 2L, 0L, 4L)))
    assert(out(3L) == ((5L, 9L, 2L, 5L, 9L)))
    assert(out.values.map(_._3).sum == 7L, "null row excluded, others all counted")
  }

  test("histogram: constant column lands in one bucket; loHi hint matches in-plan stats") {
    val const = Seq(42L, 42L, 42L).toDF("v")
    val c = TableStats.histogram(const, "v", nBuckets = 8).collect()
    assert(c.length == 1 && c.head.getLong(0) == 0L && c.head.getLong(3) == 3L)
    // stats-driven knob path: same buckets without scanning for min/max
    val in = Seq(-10L, -6L, -5L, 0L, 4L, 5L, 9L).toDF("v")
    val scanned = TableStats.histogram(in, "v", 4).collect().map(_.toSeq).toSet
    val hinted = TableStats.histogram(in, "v", 4, loHi = Some((-10L, 9L)))
      .collect().map(_.toSeq).toSet
    assert(scanned == hinted)
  }

  test("histogram: stale loHi hint surfaces out-of-range values as overflow buckets") {
    // hint covers [0, 9] (w = 9 div 3 + 1 = 4, buckets 0..2 span 0..11);
    // data has -2 and 13: -2 must land in bucket -1 (floor division —
    // truncation would fold it into bucket 0) and 13 in bucket 3.
    val in = Seq(-2L, 1L, 13L).toDF("v")
    val out = TableStats.histogram(in, "v", nBuckets = 3, loHi = Some((0L, 9L)))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(-1L -> 1L, 0L -> 1L, 3L -> 1L))
  }
}
