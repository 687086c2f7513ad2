package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored-count lifecycle for the triangle family — the production path
  * [[GraphMetrics.mergeTriangleCounts]] documents but that no caller drove
  * from a real store until this index (the `e_knn_incr` / `e_ivf_index`
  * idiom on the density axis): BUILD counts once, STORE them next to the
  * canonical edge set, APPEND batches by folding only the batch-bounded
  * delta (the old graph's O(m^1.5) wedge enumeration never re-runs), and
  * SERVE per-node counts straight off the store.
  *
  * The store is VERSIONED (immutable `v<N>/` directories, each holding
  * `edges/` and `counts/` parquet), for two reasons that matter more here
  * than in the single-frame sinks:
  *
  *  1. '''Atomic two-frame commits.''' The maintained invariant is
  *     `counts == triangleCounts(edges)` — counts and edges must advance
  *     TOGETHER or exactness dies: a crash window that persisted new
  *     counts but not their edges would double-count the batch on replay
  *     (the replayed pairs would pass the store anti-join again), and the
  *     reverse window would silently drop its delta. Two independent
  *     [[graft.sink.ParquetSink]] swaps cannot close that window; one
  *     stage-both-then-rename publish can (a directory rename is the same
  *     atomicity primitive ParquetSink's own swap relies on).
  *  2. '''Idempotent replay without coordination.''' Streaming
  *     `foreachBatch` delivery is at-least-once. A batch replayed after a
  *     crash-before-publish recomputes from the same base version and
  *     publishes the version it was going to; one replayed after
  *     crash-after-publish finds its edges already stored, admits an empty
  *     delta, and commits a duplicate-content version — content-safe and
  *     visible in the lineage, the same documented caveat as
  *     [[graft.sink.SnapshotStore]]'s ingest path.
  *
  * Per-commit write volume is store-sized (node-sized counts + edge set),
  * the same per-refresh cost profile as every keyed merge in the library
  * (ParquetSink.mergeByKey rewrites the store too); version retention /
  * compaction is caller policy, exactly as with SnapshotStore. Reads of
  * the CURRENT version never conflict with the staging write because
  * versions are immutable — no checkpoint-before-overwrite discipline
  * needed anywhere in the lifecycle.
  */
object TriangleIndex {

  private def canon(pairs: DataFrame): DataFrame = pairs
    .select(least(col("id_a"), col("id_b")).as("u"),
      greatest(col("id_a"), col("id_b")).as("v"))
    .filter(col("u") =!= col("v"))
    .distinct()

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val VersionDir = """v(\d+)""".r

  /** Highest committed version under `root`, if any (staging dirs and
    * foreign files are ignored — only fully-published `v<N>` counts). */
  def latestVersion(spark: SparkSession, root: String): Option[Int] = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (!f.exists(p)) None
    else f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case VersionDir(n) => n.toInt }
      .sorted.lastOption
  }

  /** Stage `edges` + `counts` under `_stage_<next>`, publish via ONE
    * atomic rename to `v<next>`. A replay that finds `v<next>` already
    * published (crash after rename, before the caller's checkpoint)
    * discards its staging copy — the published content is identical by
    * the exactness argument, so dropping the duplicate is safe. */
  private def commit(spark: SparkSession, root: String,
                     edges: DataFrame, counts: DataFrame): Int = {
    val f = fs(spark, root)
    val next = latestVersion(spark, root).getOrElse(0) + 1
    val stage = new Path(s"$root/_stage_$next")
    if (f.exists(stage)) f.delete(stage, true)
    edges.write.parquet(s"$stage/edges")
    counts.write.parquet(s"$stage/counts")
    val dest = new Path(s"$root/v$next")
    if (f.exists(dest)) { f.delete(stage, true); return next }
    if (!f.rename(stage, dest))
      throw new java.io.IOException(
        s"triangle index commit: failed to publish $stage to $dest")
    next
  }

  private def requireLatest(spark: SparkSession, root: String): Int =
    latestVersion(spark, root).getOrElse(
      throw new IllegalStateException(
        s"triangle index at $root has no committed version — build() first"))

  /** Canonical (u, v) edges of the stored graph at its latest version. */
  def edges(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/v${requireLatest(spark, root)}/edges")
      .select("u", "v")

  /** Per-node (doc_id, n_triangles) at the latest version — the SERVE
    * surface; equal to `GraphMetrics.triangleCounts` over [[edges]] by
    * the build/append invariant (oracle-checked end to end by
    * `x_triangles_idx`). */
  def counts(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/v${requireLatest(spark, root)}/counts")
      .select("doc_id", "n_triangles")

  /** BUILD: count the full graph once (the one time the O(m^1.5) wedge
    * enumeration runs over everything) and commit v1. Overwrites nothing —
    * an existing index gains a fresh version whose counts are a full
    * recount (the rebuild-cadence escape hatch, caller policy). */
  def build(pairs: DataFrame, root: String): Int = {
    val spark = pairs.sparkSession
    CacheScope.scoped {
      val u = canon(pairs).localCheckpoint()
      val c = GraphMetrics.triangleCounts(
        u.select(col("u").as("id_a"), col("v").as("id_b"))).localCheckpoint()
      commit(spark, root, u, c)
    }
  }

  /** APPEND: fold `newPairs` into the stored counts via
    * [[GraphMetrics.mergeTriangleCounts]] — wedge work proportional to
    * the batch, exact by the unique-pivot decomposition — and commit the
    * grown (edges, counts) pair atomically. Duplicate and already-stored
    * pairs are absorbed by the canonical-key anti-join, so replayed
    * batches are no-ops in content. An EMPTY admitted delta still
    * commits (counts unchanged) so the caller's at-least-once bookkeeping
    * stays simple; idle-stream version churn is the streaming caller's
    * concern ([[graft.streaming.DocStream.triangleMaintain]] skips empty
    * batches for exactly that reason). */
  def append(newPairs: DataFrame, root: String): Int = {
    val spark = newPairs.sparkSession
    val v = requireLatest(spark, root)
    CacheScope.scoped {
      val oldU = spark.read.parquet(s"$root/v$v/edges").select("u", "v")
      val stored = spark.read.parquet(s"$root/v$v/counts")
        .select("doc_id", "n_triangles")
      val admitted = canon(newPairs)
        .join(oldU, Seq("u", "v"), "left_anti").localCheckpoint()
      val merged = GraphMetrics.mergeTriangleCounts(stored, oldU,
        admitted.select(col("u").as("id_a"), col("v").as("id_b")))
        .localCheckpoint()
      commit(spark, root, oldU.unionByName(admitted), merged)
    }
  }
}
