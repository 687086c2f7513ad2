package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted inner join equals plain inner join") {
    val big = (1 to 500).map(i => (i.toLong, i % 3, s"p$i")).toDF("id", "k", "payload")
    val dim = Seq((0, "zero"), (1, "one"), (2, "two"), (9, "nine")).toDF("k", "name")
    val plain = big.join(dim, Seq("k")).select("id", "k", "payload", "name")
    val salted = SkewJoin.saltedJoin(big, dim, Seq("k"), saltFactor = 7)
      .select("id", "k", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted left join preserves unmatched rows exactly once") {
    val big = Seq((1L, 5, "a"), (2L, 0, "b")).toDF("id", "k", "payload")
    val dim = Seq((0, "zero")).toDF("k", "name")
    val out = SkewJoin.saltedJoin(big, dim, Seq("k"), saltFactor = 4, joinType = "left")
      .collect().map(r => (r.getLong(1), Option(r.getString(3)))).toSet
    assert(out == Set((1L, None), (2L, Some("zero"))))
  }

  test("salt column name avoids collisions and is dropped") {
    val big = Seq((1, "x")).toDF("k", "__graft_salt0")
    val dim = Seq((1, "d")).toDF("k", "name")
    val out = SkewJoin.saltedJoin(big, dim, Seq("k"), saltFactor = 2)
    assert(out.columns.toSet == Set("k", "__graft_salt0", "name"))
    assert(out.count() == 1)
  }

  test("salted join is deterministic across runs (no rand())") {
    val big = (1 to 100).map(i => (i.toLong, i % 2)).toDF("id", "k")
    val dim = Seq((0, "a"), (1, "b")).toDF("k", "name")
    val r1 = SkewJoin.saltedJoin(big, dim, Seq("k"), 8).orderBy("id").collect().toSeq
    val r2 = SkewJoin.saltedJoin(big, dim, Seq("k"), 8).orderBy("id").collect().toSeq
    assert(r1 == r2)
  }
}
