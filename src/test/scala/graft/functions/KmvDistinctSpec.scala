package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("below-k groups are exact, duplicates ignored") {
    val kmv = udaf(new KmvDistinct(8))
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("h")
    val out = df.agg(kmv(col("h"))).head().getDouble(0)
    assert(out == 3.0)
  }

  test("estimate is within 30% on a large uniform-ish group") {
    val kmv = udaf(new KmvDistinct(64))
    val n = 5000
    // deterministic pseudo-uniform hashes on [0, P)
    val hashes = (1 to n).map(i => (i.toLong * 2654435761L) % HashKernels.P).toDF("h")
    val est = hashes.agg(kmv(col("h"))).head().getDouble(0)
    assert(math.abs(est - n) / n < 0.3, s"estimate $est for $n distinct")
  }

  test("result is independent of partitioning (merge is order-insensitive)") {
    val kmv = udaf(new KmvDistinct(16))
    val df = (1 to 1000).map(i => (i % 7, (i.toLong * 97003L) % HashKernels.P)).toDF("g", "h")
    val one = df.repartition(1).groupBy("g").agg(kmv(col("h")).as("e"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val many = df.repartition(13).groupBy("g").agg(kmv(col("h")).as("e"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(one == many)
  }
}
