package graft.core

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the stored triangle-count lifecycle
  * ([[TriangleIndex]]): build/append/serve lands bit-identical to a full
  * recount, appends fold the STORE (not a replay), replayed batches are
  * content no-ops, and the two-frame commit keeps `counts ==
  * triangleCounts(edges)` through every version. */
class TriangleIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairsDf(ps: Seq[(Long, Long)]): DataFrame =
    ps.toDF("id_a", "id_b")

  private def countsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_tri_idx_spec").toString

  // Old graph: triangle {1,2,3} + pendant (3,4) + wedge 6-5-7; batch
  // exercises every merge leg (one-new-edge close, old-wedge close, all-new
  // triangle) — the incrementalTriangles fixture, driven through a STORE.
  private val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L), (5L, 7L))
  private val batch = Seq((1L, 4L), (6L, 7L), (10L, 11L), (11L, 12L), (10L, 12L))

  test("build + append + serve equals a full recount, version by version") {
    val root = freshRoot()
    assert(TriangleIndex.latestVersion(spark, root).isEmpty)
    TriangleIndex.build(pairsDf(base), root)
    assert(TriangleIndex.latestVersion(spark, root).contains(1))
    assert(countsOf(TriangleIndex.counts(spark, root)) ==
      countsOf(GraphMetrics.triangleCounts(pairsDf(base))))
    TriangleIndex.append(pairsDf(batch), root)
    assert(TriangleIndex.latestVersion(spark, root).contains(2))
    assert(countsOf(TriangleIndex.counts(spark, root)) ==
      countsOf(GraphMetrics.triangleCounts(pairsDf(base ++ batch))))
    // The stored invariant itself: counts == triangleCounts(stored edges).
    val storedEdges = TriangleIndex.edges(spark, root)
      .select(org.apache.spark.sql.functions.col("u").as("id_a"),
        org.apache.spark.sql.functions.col("v").as("id_b"))
    assert(countsOf(TriangleIndex.counts(spark, root)) ==
      countsOf(GraphMetrics.triangleCounts(storedEdges)))
  }

  test("a replayed batch is a content no-op (at-least-once absorption)") {
    val root = freshRoot()
    TriangleIndex.build(pairsDf(base), root)
    TriangleIndex.append(pairsDf(batch), root)
    val before = countsOf(TriangleIndex.counts(spark, root))
    val edgesBefore = TriangleIndex.edges(spark, root).count()
    TriangleIndex.append(pairsDf(batch), root) // full replay
    assert(countsOf(TriangleIndex.counts(spark, root)) == before)
    assert(TriangleIndex.edges(spark, root).count() == edgesBefore)
  }

  test("store after ANY batch decomposition equals the one-shot recount") {
    // Exactness under arbitrary batching: three different splits of the
    // same pair set — including one that delivers a triangle one edge per
    // batch — all land on the identical recount.
    val all = base ++ batch
    val expect = countsOf(GraphMetrics.triangleCounts(pairsDf(all)))
    val splits = Seq(
      Seq(all),
      Seq(base, batch),
      Seq(all.take(3), all.slice(3, 7), all.drop(7)))
    splits.foreach { split =>
      val root = freshRoot()
      TriangleIndex.build(pairsDf(split.head), root)
      split.tail.foreach(b => TriangleIndex.append(pairsDf(b), root))
      assert(countsOf(TriangleIndex.counts(spark, root)) == expect,
        s"split of sizes ${split.map(_.size)} diverged from the recount")
    }
  }

  test("append before build fails loudly") {
    val e = intercept[IllegalStateException] {
      TriangleIndex.append(pairsDf(batch), freshRoot())
    }
    assert(e.getMessage.contains("no committed version"))
  }
}
