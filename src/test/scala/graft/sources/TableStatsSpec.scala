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

  test("analyze rejects unknown columns loudly") {
    val in = Seq((1, 2)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      TableStats.analyze(in, Seq("a", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
