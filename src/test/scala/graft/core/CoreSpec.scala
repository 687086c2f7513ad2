package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class CoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("applyDefaults makes the custom functions callable from raw SQL") {
    // MIGRATION.md option B promises a pinned session can use the
    // expressions in plain spark.sql, not only via the operators
    assert(spark.sql("SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head().getDouble(0) == 11.0)
    assert(spark.sql("SELECT hyperplane_sig(array(1.0D), 8)").head().getLong(0) == 0L)
    assert(spark.sql("SELECT simhash32(array(CAST(5 AS BIGINT)))").head().getLong(0) == 5L)
  }

  test("top1PerKey keeps exactly the argmax row, deterministically on ties") {
    val df = Seq(
      ("k1", 1, "a"), ("k1", 3, "b"), ("k1", 3, "a"),
      ("k2", 7, "z")).toDF("k", "v", "p")
    val out = Dedup.top1PerKey(df, Seq("k"), Seq(col("v").desc, col("p").asc))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(out == Set(("k1", 3, "a"), ("k2", 7, "z")))
  }

  test("top1PerKey does not clobber a pre-existing __graft_rn column") {
    val df = Seq(("k", 1, 99L), ("k", 2, 98L)).toDF("k", "v", "__graft_rn")
    val out = Dedup.top1PerKey(df, Seq("k"), Seq(col("v").desc))
    assert(out.columns.toSeq == Seq("k", "v", "__graft_rn"))
    assert(out.head().getLong(2) == 98L)
  }

  test("castDecimalDouble converts every decimal column and leaves others") {
    val df = Seq((1L, BigDecimal("12.34"), "s")).toDF("id", "d", "s")
    val out = SchemaCasts.castDecimalDouble(df)
    assert(out.schema("d").dataType == DoubleType)
    assert(out.schema("id").dataType == LongType)
    assert(out.head().getDouble(1) == 12.34)
  }

  test("fillFloatNulls zeroes only float/double nulls") {
    val df = Seq((1L, Some(1.5), Some("x")), (2L, None, None))
      .toDF("id", "d", "s")
    val out = SchemaCasts.fillFloatNulls(df).orderBy("id").collect()
    assert(out(1).getDouble(1) == 0.0)
    assert(out(1).isNullAt(2)) // strings untouched
  }

  test("exactSum is exact and order-independent for monetary values") {
    val vals = Seq(0.1, 0.2, 0.3, 1e10, -1e10, 0.4)
    val a = vals.toDF("v").repartition(7).agg(SchemaCasts.exactSum(col("v"))).head().getDouble(0)
    val b = vals.reverse.toDF("v").repartition(3).agg(SchemaCasts.exactSum(col("v"))).head().getDouble(0)
    assert(a == b)
    assert(a == 1.0)
  }

  test("session pins are effective after applyDefaults") {
    GraftSession.Pins.foreach { case (k, v) =>
      assert(spark.conf.get(k) == v, s"pin $k")
    }
    // non-ANSI /0 -> NULL (all numeric types) is what the pro-rata
    // expression relies on (utils_ressarcimento.py:250-254)
    assert(Seq(1.0).toDF("x").select(col("x") / lit(0.0)).head().isNullAt(0))
    assert(Seq(1).toDF("x").select(col("x") / lit(0)).head().isNullAt(0))
  }

  test("scaleProfile: 100 TB / 1000-executor shape yields spill-safe sizing") {
    val conf = GraftSession.scaleProfile(
      totalInputBytes = 100L << 40,      // 100 TB
      executors = 1000, coresPerExecutor = 8,
      executorMemoryBytes = 32L << 30)   // 32 GiB
    val split = conf("spark.sql.files.maxPartitionBytes").toLong
    val parts = conf("spark.sql.shuffle.partitions").toLong
    assert(split <= (256L << 20))                       // never above 256 MB
    assert(split * 4 * 8 <= (32L << 30))                // 4 tasks/core fit memory
    assert(parts >= 2L * 1000 * 8)                    // at least two waves
    assert(parts * split >= (100L << 40))               // covers the input
    assert(conf("spark.sql.adaptive.skewJoin.enabled") == "true")
    // degenerate tiny cluster still sane
    val small = GraftSession.scaleProfile(1L << 30, 1, 4, 4L << 30)
    assert(small("spark.sql.shuffle.partitions").toLong >= 8)
    assert(small("spark.sql.files.maxPartitionBytes").toLong >= (16L << 20))
  }
}
