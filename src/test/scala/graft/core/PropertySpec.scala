package graft.core

import graft.TestSpark
import graft.functions.HashKernels
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks (SURVEY.md §5 item 2): algebraic invariants over
  * ScalaCheck generators, driven with a fixed seed so failures reproduce.
  * Spark-facing properties batch all generated cases into ONE round-trip
  * per property (collect once), not one job per case.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val messy: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf(" ", "  ", "\t"),
    Gen.oneOf("á", "ç", "Ž", "ü", "Ô", "ẞ"),
    Gen.oneOf(".", "/", "-"))).map(_.mkString)

  test("stripNormalize is idempotent for arbitrary messy strings") {
    val inputs = sample(messy, 150).distinct
    val once = inputs.toDF("x")
      .select(Normalize.stripNormalize(col("x")).as("y"))
      .collect().map(_.getString(0)).toSeq
    val twice = once.toDF("y")
      .select(Normalize.stripNormalize(col("y")).as("z"))
      .collect().map(_.getString(0)).toSeq
    assert(once == twice)
  }

  test("cnpjNormalize of non-empty alnum-bearing input is always 15 alphanumerics") {
    val inputs = sample(messy, 150).filter(_.exists(_.isLetterOrDigit)).distinct
    val out = inputs.toDF("x")
      .select(Normalize.cnpjNormalize(col("x")).as("y"))
      .collect().map(_.getString(0))
    assert(out.forall(s => s.length == 15 && s.matches("[0-9a-zA-Z]{15}")),
      out.filterNot(_.length == 15).take(3).toSeq.toString)
  }

  test("top1PerKey returns exactly one row per key, the max under the order") {
    val rows = sample(Gen.zip(Gen.choose(0, 5), Gen.choose(0, 100), Gen.choose(0, 100)), 120)
    val out = rows.toDF("k", "v", "t")
      .transform(Dedup.top1PerKey(_, Seq("k"), Seq(col("v").desc, col("t").desc)))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    val expect = rows.groupBy(_._1).map { case (_, g) => g.maxBy(r => (r._2, r._3)) }.toSet
    assert(out.toSet == expect)
    assert(out.length == rows.map(_._1).distinct.length)
  }

  test("polyHash kernel equals the reference fold for arbitrary unicode strings") {
    sample(Gen.identifier, 200).foreach { w =>
      var h = 0L
      w.codePoints().forEach(cp => h = (h * 31 + cp) % HashKernels.P)
      assert(HashKernels.polyHash(UTF8String.fromString(w)) == h, s"for '$w'")
    }
  }

  test("hyperplane signature kernel equals the plane-weight reference fold") {
    val vecGen = Gen.listOfN(64, Gen.chooseNum(-1.0, 1.0))
    val vecs = sample(vecGen, 60)
    vecs.foreach { v =>
      val sig = HashKernels.hyperplaneSig(new GenericArrayData(v.toArray), 32)
      (0 until 32).foreach { p =>
        val dot = v.iterator.zipWithIndex
          .foldLeft(0.0) { case (s, (x, d)) => s + x * HashKernels.planeWeight(p, d) }
        assert(((sig >> p) & 1L) == (if (dot >= 0) 1L else 0L),
          s"plane $p disagrees for $v")
      }
      // non-64-dim vectors sign out as 0 (pinned contract)
      assert(HashKernels.hyperplaneSig(new GenericArrayData(v.take(10).toArray), 32) == 0L)
    }
  }

  test("int8 quantizer clamps to [-127, 127] and fixes round-trip values") {
    val vals = sample(Gen.chooseNum(-3.0f, 3.0f), 200) ++
      Seq(Float.MaxValue, -Float.MaxValue, 0.0f, 1.0f, -1.0f)
    val quantized = Seq(vals).toDF("embedding")
      .selectExpr(graft.llmdata.Similarity.QuantizeSql + " AS q")
      .head().getSeq[Double](0)
    quantized.zip(vals).foreach { case (q, x) =>
      assert(q >= -127.0 && q <= 127.0, s"$x -> $q out of range")
      assert(q == math.rint(q), s"$x -> $q not integral")
      // HALF_UP (away from zero), matching Spark's round() — math.round
      // would differ on negative exact halves
      val clamped = math.max(-127.0, math.min(127.0, x.toDouble * 127))
      val expected = BigDecimal(clamped)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(q == expected, s"$x -> $q, expected $expected")
    }
  }

  test("minhash signature is order-invariant and monotone under union") {
    val sets = sample(Gen.nonEmptyListOf(Gen.choose(0L, HashKernels.P - 1)), 50)
    sets.foreach { hs =>
      val a = HashKernels.minhashSigs(new GenericArrayData(hs.toArray))
      val b = HashKernels.minhashSigs(new GenericArrayData(hs.reverse.toArray))
      assert(a.toSeq == b.toSeq) // set semantics: order-free
      val union = HashKernels.minhashSigs(
        new GenericArrayData((hs ++ hs.map(h => (h + 7) % HashKernels.P)).toArray))
      assert(union.toSeq.zip(a.toSeq).forall { case (u, s) => u <= s }) // min can only drop
    }
  }
}
