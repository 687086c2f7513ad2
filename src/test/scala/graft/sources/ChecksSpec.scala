package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap

  test("each check counts its violations; passed = zero observed") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq((1L, 10.0), (1L, 200.0), (9L, 20.0), (2L, -1.0))
      .toDF("fk", "x")
    val dup = Seq(1L, 1L, 2L).toDF("k")
    val withNulls = Seq(Option("a"), None, None).toDF("s")
    val out = asMap(
      Checks.unique(dup, "k_unique", "k")
        .union(Checks.references(child, "fk", parent, "pk", "fk_parent"))
        .union(Checks.satisfies(child, "x BETWEEN 0 AND 100", "x_range"))
        .union(Checks.notNull(withNulls, "s", "s_notnull")))
    assert(out("k_unique") == ((1L, 0)))   // 3 rows, 2 distinct
    assert(out("fk_parent") == ((1L, 0)))  // fk=9 orphan
    assert(out("x_range") == ((2L, 0)))    // 200.0 and -1.0
    assert(out("s_notnull") == ((2L, 0)))
    // and a clean frame passes
    val ok = asMap(Checks.unique(parent, "pk_unique", "pk")
      .union(Checks.satisfies(parent, "pk > 0", "pk_pos")))
    assert(ok("pk_unique") == ((0L, 1)) && ok("pk_pos") == ((0L, 1)))
  }

  test("null child keys and null predicate results count as violations") {
    val parent = Seq(1L).toDF("pk")
    val child = Seq(Option(1L), None).toDF("fk")
    assert(asMap(Checks.references(child, "fk", parent, "pk", "fk"))("fk")._1 == 1L)
    val df = Seq(Option(5.0), None).toDF("x")
    // NULL BETWEEN ... is NULL -> coalesce(false) -> violation
    assert(asMap(Checks.satisfies(df, "x BETWEEN 0 AND 10", "r"))("r")._1 == 1L)
  }
}
