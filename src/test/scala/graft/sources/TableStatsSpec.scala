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
}
