package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scale-fixture decorrelation families the sf100 extension
  * relies on: every replica transform must be a BIJECTION and no two
  * replicas may share one (a repeat gives some replica a byte-identical
  * twin, degenerating every dedup/ANN candidate structure the rehearsal
  * exists to measure), while the replicas already baked into the
  * committed sf1/sf10 sets must be byte-stable. */
class GenScaleAlphabetSpec extends AnyFunSuite {

  test("all 1248 alphabets are distinct bijections of a-z") {
    val all = (0 until 1248).map(GenScale.alphabet)
    all.foreach(s => assert(s.sorted == "abcdefghijklmnopqrstuvwxyz", s"not a bijection: $s"))
    assert(all.distinct.size == 1248,
      "a repeated alphabet means g^k collided with an affine map — shrink the guard")
  }

  test("alphabets 0-311 match the r8 affine family (committed sf1/sf10 byte-stability)") {
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val coprimes = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    (0 until 312).foreach { r =>
      val a = coprimes((r / 26) % coprimes.length)
      val expected = (0 until 26).map(i => lower((a * i + r) % 26)).mkString
      assert(GenScale.alphabet(r) == expected, s"replica $r alphabet drifted")
    }
  }

  test("Walsh flip row 1 equals the r8 parity mask; rows 0-63 are distinct and halve the domain") {
    def row(flipGen: Int): Seq[Boolean] =
      (0 until 64).map(i => Integer.bitCount(flipGen & (i + 1)) % 2 == 1)
    // r8 mask: flip iff (flipGen * (i+1)) % 2 == 1, used only at flipGen=1
    assert(row(1) == (0 until 64).map(i => (i + 1) % 2 == 1),
      "row 1 must reproduce the committed sf10 flip pattern exactly")
    val rows = (0 until 64).map(row)
    assert(rows.distinct.size == 64)
    // every non-identity row flips exactly half the positions — the
    // orthogonality that keeps cross-replica cosines decorrelated
    rows.drop(1).foreach(r => assert(r.count(identity) == 32))
  }

  test("event content-decorrelation is token-distinct for all 1248 replicas (the observable, not the knobs)") {
    // x_seqsim observes a replica's transform ONLY through
    // (type rotation, floor(value'·10) mod 100 per value) — pinning knob
    // distinctness is not enough: a shift-only family is token-identical
    // at Δr = 100 regardless of the shift modulus (caught in review after
    // the first, shift-only fix shipped). Pin the observable instead:
    // the token signature over a probe grid spanning the fixture's value
    // range must be unique per replica.
    def signature(r: Int): (Int, Seq[Long]) = {
      val digits = (0 until 64).map { j =>
        val v = j * 8.77 // 0 .. ~553, the events fixture's value range
        val vt = if (r == 0) v else v * (1.0 + r / 1024.0) + (r % 971) / 10.0
        (math.floor(vt * 10).toLong % 100 + 100) % 100
      }
      (r % 5, digits)
    }
    val sigs = (0 until 1248).map(signature)
    assert(sigs.distinct.size == 1248,
      "two replicas share a full token signature — behavioral clones are back")
    assert(signature(0) == ((0, (0 until 64).map(j =>
      (math.floor(j * 8.77 * 10).toLong % 100 + 100) % 100))),
      "replica 0 must stay the identity transform")
  }
}
