package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned snapshot store with time travel on plain parquet — the
  * SEMANTICS half of what a table format (Iceberg/Delta) provides:
  * immutable numbered snapshots, atomic publish, reads pinned to a
  * version, merge-as-new-version, and snapshot expiry. (The PERFORMANCE
  * half — manifests, column stats, file skipping — is covered elsewhere
  * by [[Layouts.compact]], [[Layouts.zorderCluster]] and
  * [[graft.sources.TableStats]]; the runtime jar for a real catalog
  * binding can't exist in this environment, so the testable behaviors
  * live here, shaped for an Iceberg-backed drop-in.)
  *
  * Layout: `root/v{N}/` parquet directories. A commit writes to a temp
  * dir and publishes with ONE directory rename — readers either see the
  * fully-written `v{N}` or nothing; a crash before the rename leaves only
  * the temp dir, which the next commit clears. Unlike the mutable
  * [[ParquetSink]] there is no swap dance: a merge reads the PREVIOUS
  * version's files and writes a NEW directory, so the plan never replaces
  * what it is reading. Single writer assumed (as all sinks here); version
  * discovery is one directory listing.
  */
final class SnapshotStore(spark: SparkSession, root: String) {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val VDir = "v(\\d+)".r

  /** Committed versions, ascending. One listStatus — metadata cost is
    * independent of data size. */
  def versions: Seq[Long] = {
    val r = new Path(root)
    if (!fs.exists(r)) Seq.empty
    else fs.listStatus(r).toSeq.flatMap { s =>
      s.getPath.getName match {
        case VDir(n) if s.isDirectory => Some(n.toLong)
        case _ => None
      }
    }.sorted
  }

  def latestVersion: Option[Long] = versions.lastOption

  /** Time travel: read snapshot `version` exactly as committed. Expired
    * or never-written versions fail loudly (a silent empty frame would
    * let downstream logic mistake history loss for an empty table). */
  def read(version: Long): DataFrame = {
    val have = versions
    require(have.contains(version),
      s"snapshot v$version does not exist under $root (have: ${have.mkString(", ")})")
    spark.read.parquet(new Path(root, s"v$version").toString)
  }

  def readLatest(): DataFrame = latestVersion match {
    case Some(v) => read(v)
    case None    => throw new IllegalStateException(s"no snapshots under $root")
  }

  /** Commit `df` as the next version; returns the version number.
    * Publish = one atomic directory rename of the fully-written temp.
    * Atomicity caveat (same contract as the sinks' crash-safe swap):
    * this holds only on filesystems with atomic directory rename —
    * HDFS and local FS. On object stores (S3A), "rename" is copy+delete,
    * so a concurrent reader could observe a partially-published v{N};
    * there, front the store with a manifest/catalog commit instead. */
  def commit(df: DataFrame): Long = {
    val next = latestVersion.getOrElse(0L) + 1
    val tmp = new Path(root, "__graft_snap_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    val dest = new Path(root, s"v$next")
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"snapshot publish failed: $tmp -> $dest")
    next
  }

  /** Upsert against the latest snapshot, committed as a NEW version —
    * MERGE with history: every merge stays readable at its version. */
  def commitMerge(incoming: DataFrame, keys: Seq[String]): Long = {
    SinkChecks.requireUniqueKeys(incoming, keys, root)
    latestVersion match {
      case None    => commit(incoming)
      case Some(v) =>
        commit(read(v).join(incoming, keys, "left_anti").unionByName(incoming))
    }
  }

  /** Partition-scoped MERGE with history: commit a NEW version in which
    * every partition (distinct `partCol` value) present in `incoming` is
    * replaced wholesale by incoming's rows, all other partitions carried
    * over unchanged. This is the snapshot twin of
    * [[PartitionedParquetSink]]'s dynamic partition overwrite — the same
    * replace-the-partition contract, plus time travel to every previous
    * refresh. The carry-over side anti-joins the previous head on the
    * distinct partition values (one row per partition, broadcastable), so
    * the incremental plan cost over a plain [[commit]] is a broadcast
    * anti-join — not a second full scan. Null-safe on the partition
    * column (like [[commitDeletePartition]]): incoming rows with a NULL
    * partition REPLACE the head's NULL partition rather than duplicating
    * beside it. */
  def commitReplacePartitions(incoming: DataFrame, partCol: String): Long =
    latestVersion match {
      case None    => commit(incoming)
      case Some(v) =>
        val prev = read(v)
        val parts = broadcast(incoming.select(col(partCol).as("__graft_part")).distinct())
        commit(prev.join(parts, prev(partCol) <=> col("__graft_part"), "left_anti")
          .unionByName(incoming))
    }

  /** Partition delete with history: commit a NEW version without
    * `value`'s rows — the delete-then-still-time-travelable twin of
    * [[PartitionedParquetSink.deletePartition]]. Null-safe comparison,
    * so a NULL partition value deletes the NULL partition. Returns None
    * (and commits nothing) when the store has no versions yet: there is
    * no history to preserve and an empty v1 would pin a schema-less
    * marker as the table's origin. */
  def commitDeletePartition(partCol: String, value: Any): Option[Long] =
    latestVersion.map { v =>
      commit(read(v).filter(!(col(partCol) <=> lit(value))))
    }

  /** History-preserving undo: republish `toVersion`'s content as a NEW
    * head version (never deletes or rewrites — the bad head stays
    * readable for forensics, exactly how table formats roll back). */
  def rollback(toVersion: Long): Long = commit(read(toVersion))

  /** Drop all but the last `keepLast` versions; returns what was expired.
    * Time travel to an expired version then fails loudly in [[read]]. */
  def expire(keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the latest snapshot")
    val drop = versions.dropRight(keepLast)
    drop.foreach(v => fs.delete(new Path(root, s"v$v"), true))
    drop
  }

  /** Keyed diff between two versions — the audit half of time travel
    * (table formats call this table_changes/CDF): every key classified as
    * `insert` (only in `v2`), `delete` (only in `v1`), or `update` (in
    * both, payload differs; null-safe comparison so null payload fields
    * never mis-classify), with the old and new payload columns side by
    * side. Unchanged keys are excluded. Diffing `(v2, v1)` reverses the
    * classification, so one operator answers both "what did this commit
    * do" and "what would rolling it back do".
    *
    * Shape: one full-outer shuffle join on the keys — both sides
    * partition by the diff key, the classification and payload flattening
    * are narrow projections; nothing about the diff grows faster than the
    * changed-row count. */
  def diff(v1: Long, v2: Long, keys: Seq[String]): DataFrame = {
    val a = read(v1)
    val b = read(v2)
    // Schema compare includes TYPES, not just names: a column whose type
    // drifted between versions (e.g. int widened to bigint by a writer
    // change) would otherwise flow into the payload structs and classify
    // every key as `update` — a schema problem masquerading as data churn.
    def shape(df: DataFrame) =
      df.schema.fields.map(f => (f.name.toLowerCase, f.dataType)).sortBy(_._1)
    require(shape(a).sameElements(shape(b)),
      s"version schemas differ: v$v1 ${a.schema.simpleString} vs v$v2 ${b.schema.simpleString}")
    // Key names resolve CASE-INSENSITIVELY, matching Spark's own column
    // resolution: an exact-match filter here would let a caller-cased key
    // (`DOC_ID` vs stored `doc_id`) silently land in the payload struct —
    // self-joined on nothing and struct-compared against itself, flipping
    // the classification. Unknown keys fail loudly for the same reason.
    val resolvedKeys = keys.map { k =>
      a.columns.find(_.equalsIgnoreCase(k)).getOrElse(throw new IllegalArgumentException(
        s"diff key `$k` not in snapshot schema (${a.columns.mkString(",")})"))
    }
    val keySet = resolvedKeys.map(_.toLowerCase).toSet
    val nonKey = a.columns.filterNot(c => keySet.contains(c.toLowerCase)).toSeq
    val l = a.select(resolvedKeys.map(col) :+ struct(nonKey.map(col): _*).as("__l"): _*)
    val r = b.select(resolvedKeys.map(col) :+ struct(nonKey.map(col): _*).as("__r"): _*)
    val olds = nonKey.map(c => col("__l").getField(c).as(s"${c}_old"))
    val news = nonKey.map(c => col("__r").getField(c).as(s"${c}_new"))
    l.join(r, resolvedKeys, "full_outer")
      .withColumn("change",
        when(col("__l").isNull, lit("insert"))
          .when(col("__r").isNull, lit("delete"))
          .when(!(col("__l") <=> col("__r")), lit("update"))
          .otherwise(lit("same")))
      .filter(col("change") =!= "same")
      .select(col("change") +: resolvedKeys.map(col) ++: (olds ++ news): _*)
  }
}
