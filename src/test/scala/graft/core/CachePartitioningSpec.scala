package graft.core

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ENSURE_REQUIREMENTS, ShuffleExchangeLike}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Spark behavior every co-partitioned cache in the library
  * relies on (the seed/pivot caches in Similarity, the pagerank and
  * triangle edge caches in GraphRank/GraphMetrics, clusterLabels'
  * propagation edges): a frame repartitioned by a key and THEN persisted
  * keeps that outputPartitioning, so a later equi-join on the same key
  * plans NO exchange above the cached scan — only the other side moves.
  * Counted by walking the FINAL adaptive plan for ENSURE_REQUIREMENTS
  * shuffles (the ones the join inserts; the cache's own
  * REPARTITION_BY_COL does not count). If a Spark upgrade ever stops
  * honoring cached partitioning, this fails loudly instead of silently
  * doubling every round's shuffle volume across half the library. */
class CachePartitioningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** ENSURE_REQUIREMENTS shuffles in the final executed plan, descending
    * through adaptive wrappers and query stages (but not into cached
    * relations — a cache's build shuffle is not a join exchange). */
  private def ensureShuffles(p: SparkPlan): Int = {
    val self = p match {
      case e: ShuffleExchangeLike if e.shuffleOrigin == ENSURE_REQUIREMENTS => 1
      case _ => 0
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self + kids.map(ensureShuffles).sum
  }

  private def joinShuffles(cached: DataFrame): Int = {
    cached.count()
    val other = spark.range(500).select(col("id").as("k"), lit(1L).as("q"))
    val joined = cached.join(other, "k")
    joined.collect()
    val n = ensureShuffles(joined.queryExecution.executedPlan)
    cached.unpersist(blocking = false)
    n
  }

  test("key-repartitioned persisted frame saves its join-side exchange vs an unpartitioned cache") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val base = spark.range(10000)
        .select(col("id").as("k"), (col("id") * 2).as("payload"))
      val partitioned = joinShuffles(base.repartition(col("k")).persist())
      val plain = joinShuffles(base.persist())
      assert(partitioned == 1,
        s"co-partitioned cache should leave ONE join exchange (the other side's), saw $partitioned")
      assert(plain == 2,
        s"unpartitioned cache should shuffle both sides, saw $plain")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
