package graft.core

import graft.TestSpark
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the custom joins: each must equal its naive
  * (quadratic) formulation on randomized inputs — keys with and without
  * matches, boundary timestamps, duplicate points, empty sides. Fixed
  * seeds; one Spark round-trip per property. */
class JoinPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def ts(epochMin: Long): Timestamp = new Timestamp(epochMin * 60000L)

  test("asofBackward equals the naive argmax formulation on random data") {
    val leftGen = for {
      k <- Gen.choose(0, 4); m <- Gen.choose(0L, 5000L)
    } yield (k, m)
    val rightGen = for {
      k <- Gen.choose(0, 4); m <- Gen.choose(0L, 5000L)
    } yield (k, m)
    val left = sample(leftGen, 300, 1L).distinct.zipWithIndex
      .map { case ((k, m), i) => (i.toLong, k, ts(m)) }.toDF("id", "k", "ts")
    // right unique per (k, ts) by construction (distinct pairs)
    val right = sample(rightGen, 120, 99L).distinct.zipWithIndex
      .map { case ((k, m), i) => (k, ts(m), i.toLong) }.toDF("k", "snap_ts", "snap_id")

    val fast = AsofJoin.asofBackward(left, right, Seq("k"), "ts", "snap_ts", Seq("snap_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap

    val naiveRows = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("l.ts") >= col("r.snap_ts"), "left")
      .groupBy(col("l.id"))
      .agg(max_by(col("r.snap_id"), col("r.snap_ts")).as("snap_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap

    assert(fast == naiveRows)
  }

  test("pointInInterval equals the naive inequality join on random intervals") {
    val ptGen = for { k <- Gen.choose(0, 3); m <- Gen.choose(0L, 3000L) } yield (k, m)
    val ivGen = for {
      k <- Gen.choose(0, 3); s <- Gen.choose(0L, 3000L); len <- Gen.choose(0L, 400L)
    } yield (k, s, s + len)
    val points = sample(ptGen, 250, 7L).zipWithIndex
      .map { case ((k, m), i) => (i.toLong, k, ts(m)) }.toDF("pid", "k", "ts")
    val intervals = sample(ivGen, 60, 13L).zipWithIndex
      .map { case ((k, s, e), i) => (i.toLong, k, ts(s), ts(e)) }
      .toDF("win_id", "k", "s", "e")

    // deliberately mismatched bucket size (17 min) vs interval spans
    val fast = RangeJoin.pointInInterval(points, intervals, "ts", "s", "e",
        bucketSeconds = 17L * 60, keys = Seq("k"))
      .select("pid", "win_id")
    val naive = points.join(intervals, Seq("k"))
      .filter(col("ts") >= col("s") && col("ts") < col("e"))
      .select("pid", "win_id")
    assert(fast.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(fast).count() == 0)
    assert(fast.count() == naive.count())
  }

  test("saltedJoin equals the plain join for every salt factor on random data") {
    val big = sample(Gen.choose(0, 9), 400, 21L).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val dim = (0 to 6).map(k => (k, s"name$k")).toDF("k", "name")
    val plain = big.join(dim, Seq("k")).select("id", "name")
    Seq(1, 2, 16).foreach { f =>
      val salted = SkewJoin.saltedJoin(big, dim, Seq("k"), f).select("id", "name")
      assert(salted.exceptAll(plain).count() == 0, s"saltFactor=$f")
      assert(plain.exceptAll(salted).count() == 0, s"saltFactor=$f")
    }
  }
}
