package graft.core

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of [[GraphMetrics.triangleCounts]]: hand-counted triangles on
  * canonical shapes, exactly-once counting under duplicate/reversed input
  * pairs (the near-dup convention tolerance), explicit zeros for
  * triangle-free nodes, and partitioning invariance. */
class GraphMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairsDf(ps: Seq[(Long, Long)]): DataFrame =
    ps.toDF("id_a", "id_b")

  private def countsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("single triangle: every corner counts once") {
    val r = countsOf(GraphMetrics.triangleCounts(
      pairsDf(Seq((1L, 2L), (2L, 3L), (1L, 3L)))))
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("K4: each node sits in C(3,2) = 3 triangles") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val r = countsOf(GraphMetrics.triangleCounts(pairsDf(k4)))
    assert(r == (1L to 4L).map(_ -> 3L).toMap)
  }

  test("chain has no triangles but every node is emitted with 0") {
    val r = countsOf(GraphMetrics.triangleCounts(
      pairsDf(Seq((1L, 2L), (2L, 3L), (3L, 4L)))))
    assert(r == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("triangle + pendant: pendant node reads 0") {
    val r = countsOf(GraphMetrics.triangleCounts(
      pairsDf(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))))
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("duplicate, reversed, and self-loop pairs do not change counts") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L), (2L, 2L))
    val r = countsOf(GraphMetrics.triangleCounts(pairsDf(messy)))
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("counts are partitioning-invariant") {
    val ps = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L), (6L, 7L))
    val base = countsOf(GraphMetrics.triangleCounts(pairsDf(ps)))
    val shuffled = countsOf(GraphMetrics.triangleCounts(pairsDf(ps).repartition(5)))
    assert(base == shuffled && base(3L) == 2L && base(6L) == 0L)
  }
}
