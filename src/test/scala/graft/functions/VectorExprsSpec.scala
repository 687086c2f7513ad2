package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("array_dot: mismatched lengths yield NULL like the lambda form, not a partial sum") {
    VectorExprs.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0), Seq(3.0, 4.0)),   // 11.0
      (2L, Seq(1.0, 2.0, 5.0), Seq(3.0, 4.0))) // ragged -> NULL
      .toDF("id", "a", "b")
    val fast = df.select($"id", expr("array_dot(a, b)").as("d")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val lambda = df.select($"id",
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (s, v) -> s + v)").as("d"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fast == lambda)
    assert(fast(1L) == Some(11.0) && fast(2L) == None)
  }

  test("poly_hash_array: null elements map to null elements, non-null arrays stay primitive") {
    VectorExprs.register(spark)
    import spark.implicits._
    val df = Seq(Tuple1(Seq(Some("ab"), None, Some("c"))))
      .toDF("w")
    val out = df.select(expr("poly_hash_array(w)").as("h")).head().getSeq[Any](0)
    assert(out(1) == null)
    assert(out(0) != null && out(2) != null)
  }

  test("registered functions reject wrong arity with a clear message") {
    VectorExprs.register(spark)
    val e = intercept[Exception](spark.sql("SELECT array_dot(array(1.0))").collect())
    assert(e.getMessage.contains("array_dot expects 2"), e.getMessage)
  }
}
