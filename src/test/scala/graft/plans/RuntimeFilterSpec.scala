package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pins Spark's runtime bloom-filter join pruning (InjectRuntimeFilter,
  * on by default since 3.4) on the engine's fact⋈selective-dim shape: a
  * bloom filter built from the dim side's join keys is pushed into the
  * fact side, so fact rows that cannot match are dropped BEFORE the join
  * shuffle — a semi-join reduction the engine gets for free whenever the
  * dim is filtered but too big (or too late) to broadcast.
  *
  * The default activation thresholds are sized for production (creation
  * side ≤ 10 MB, application-side scan ≥ 10 GB) — i.e. on a 100 TB fact
  * table this fires with NO configuration; the test lowers the
  * application-side floor because the fixture scan is tiny. What the spec
  * pins is the mechanics: the plan must contain the creation-side
  * `bloom_filter_agg` and the fact-side `might_contain` filter, and the
  * filtered join must return exactly the rows of the unfiltered one.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom filter into the fact side of a shuffle join") {
    // Isolated session: the threshold overrides must not leak into the
    // shared test session's plans.
    val spark = graft.core.GraftSession.applyDefaults(TestSpark.spark.newSession())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val part = spark.read.parquet(s"$sfDir/part.parquet").filter("p_retailprice < 950")
    val joined = li.join(part, li("l_partkey") === part("p_partkey"))
      .groupBy("p_brand").count()
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("bloom_filter_agg"),
      s"no bloom filter built on the dim side:\n$optimized")
    assert(optimized.contains("might_contain"),
      s"fact side not pre-filtered with might_contain:\n$optimized")
    // Value-neutral: the runtime filter only prunes non-matching rows.
    val expected = {
      val s2 = graft.core.GraftSession.applyDefaults(TestSpark.spark.newSession())
      val li2 = s2.read.parquet(s"$sfDir/lineitem.parquet")
      val p2 = s2.read.parquet(s"$sfDir/part.parquet").filter("p_retailprice < 950")
      li2.join(p2, li2("l_partkey") === p2("p_partkey")).groupBy("p_brand").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
