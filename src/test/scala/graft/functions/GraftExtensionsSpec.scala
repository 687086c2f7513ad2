package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The extensions hook is exercised session-free: tests build each injected
  * function via its registered builder and eval the expression directly.
  * (An in-JVM `withExtensions` integration test is impossible here — the
  * suite JVM shares one SparkContext, and `getOrCreate` ignores extensions
  * once any session exists.) The same builder list backs
  * `VectorExprs.register`, which the full query suite runs end-to-end. */
class GraftExtensionsSpec extends AnyFunSuite {

  private def builder(name: String) =
    GraftExtensions.functions.find(_._1.funcName == name).get._3

  private def arr(dt: org.apache.spark.sql.types.DataType, vs: Any*) =
    Literal.create(ArrayData.toArrayData(vs.toArray), ArrayType(dt))

  test("extension builders cover all seven custom functions") {
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ==
      Seq("array_dot", "hyperplane_sig", "hyperplane_sig_at", "minhash_sigs",
        "poly_hash_array", "rp_project", "simhash32"))
  }

  test("rp_project equals the lambda aggregate form it replaced, bit for bit") {
    // e_0: plane p's projection is exactly planeWeight(p, 0); a generic
    // vector must match a direct fold in the same dim order.
    val v = (1 to 64).map(d => d * 0.125 - 4.0)
    val e = builder("rp_project")(Seq(arr(DoubleType, v: _*), Literal(4)))
    val out = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
    (0 until 4).foreach { p =>
      var s = 0.0
      (0 until 64).foreach(d => s += v(d) * HashKernels.planeWeight(p, d))
      assert(out(p) == s, s"plane $p")
    }
    // non-64-dim input surfaces as NULL, never a prefix projection
    assert(builder("rp_project")(Seq(arr(DoubleType, 1.0, 2.0), Literal(4))).eval() == null)
  }

  test("hyperplane_sig builder matches the plane-weight kernel sign pattern") {
    // v = e_0 (1 in dim 0): bit p of the signature is sign(planeWeight(p, 0)).
    val e = builder("hyperplane_sig")(Seq(
      arr(DoubleType, 1.0 +: Seq.fill(63)(0.0): _*), Literal(8)))
    val sig = e.eval().asInstanceOf[Long]
    (0 until 8).foreach { p =>
      assert(((sig >> p) & 1L) == (if (HashKernels.planeWeight(p, 0) >= 0) 1L else 0L))
    }
  }

  test("hyperplane_sig signs non-64-dim vectors out as 0, like the literal-plane form it replaced") {
    val short = builder("hyperplane_sig")(Seq(arr(DoubleType, 1.0, 2.0), Literal(8)))
    assert(short.eval() == 0L)
    val long129 = builder("hyperplane_sig")(Seq(
      arr(DoubleType, Seq.fill(129)(1.0): _*), Literal(8)))
    assert(long129.eval() == 0L)
  }

  test("array_dot builder evals the codegen expression's semantics") {
    val e = builder("array_dot")(Seq(arr(DoubleType, 1.0, 2.0), arr(DoubleType, 3.0, 4.0)))
    assert(e.eval() == 11.0)
  }

  test("simhash32 builder: single hash is its own fingerprint") {
    val e = builder("simhash32")(Seq(arr(LongType, 5L)))
    assert(e.eval() == 5L)
  }

  test("poly_hash_array builder matches the polynomial hash kernel") {
    val e = builder("poly_hash_array")(Seq(arr(StringType, UTF8String.fromString("ab"))))
    val expected = HashKernels.polyHash(UTF8String.fromString("ab"))
    assert(e.eval().asInstanceOf[ArrayData].toLongArray.toSeq == Seq(expected))
    assert(expected == (97L * 31 + 98) % HashKernels.P)
  }

  test("minhash_sigs builder returns the 16-slot signature") {
    val e = builder("minhash_sigs")(Seq(arr(LongType, 7L)))
    val sigs = e.eval().asInstanceOf[ArrayData].toLongArray.toSeq
    val expected = HashKernels.MinHashA.zip(HashKernels.MinHashB)
      .map { case (a, b) => (a * 7L + b) % HashKernels.P }.toSeq
    assert(sigs == expected)
  }
}
