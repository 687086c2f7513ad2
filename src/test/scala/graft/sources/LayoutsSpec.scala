package graft.sources

import graft.TestSpark
import graft.registry.InfraOps
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guarantees of the physical layouts (graft.sink.Layouts):
  * value correctness is covered by the k_bucket / s_partprune oracle rows;
  * these tests pin the SCALE property — the plan shape itself. */
class LayoutsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("bucketed co-located join plans with zero exchanges before the join") {
    InfraOps.bucketedJoinRoundTrip(spark, sfDir).count()
    // Force the sort-merge path (the fixture dims are broadcast-sized at
    // sf0.001; at fact-fact scale SMJ is what bucketing is for).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // executedPlan (post-EnsureRequirements — sparkPlan has no exchanges
      // inserted yet, so asserting on it would be vacuous)
      val join = spark.table("graft_li_bkt")
        .join(spark.table("graft_ord_bkt"),
          spark.table("graft_li_bkt")("l_orderkey") === spark.table("graft_ord_bkt")("o_orderkey"))
      val plan = join.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      // the aggregate on a non-bucket key still shuffles (expected): exactly 1
      val aggPlan = InfraOps.bucketedJoinAgg(spark).queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(aggPlan).size == 1, aggPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partition-pruned scan carries PartitionFilters and reads only in-range days") {
    val df = InfraOps.partitionPruneRoundTrip(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    // pruning is real: the pruned scan reads fewer partitions than exist
    val all = spark.read.parquet(
      df.queryExecution.analyzed.collectLeaves().head
        .asInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]
        .relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
        .location.rootPaths.head.toString)
    assert(df.select("dd").distinct().count() == 3)
    assert(all.select("dd").distinct().count() > 3)
  }
}
