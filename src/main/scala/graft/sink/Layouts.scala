package graft.sink

import org.apache.spark.sql.DataFrame

/** Physical-layout writers — the two techniques that remove whole shuffle
  * stages at 100 TB and that a plain directory-of-parquet layout can't
  * express:
  *
  *  - **Bucketing** ([[writeBucketedTable]]): rows are hash-distributed
  *    into a fixed number of buckets on the join/agg key at WRITE time.
  *    Two tables bucketed the same way join with NO exchange on either
  *    side — the per-join shuffle of the biggest fact tables is paid once,
  *    at ingest, instead of on every query. (`spark.table` only: bucket
  *    metadata lives in the catalog, not the files.)
  *  - **Hive partitioning** ([[writePartitioned]]): low-cardinality keys
  *    (day, tenant, source) become directory levels; a filter on them
  *    becomes `PartitionFilters` in the scan and out-of-range files are
  *    never opened — the catalog-native generalization of the reference's
  *    hand-rolled `{bucket}/{sys}/YYYY/MM/DD.parquet` path enumeration
  *    (`utils_superdesconto.py:62-66`, our `Tables.dayRangeScan`).
  *
  * Both are exercised end-to-end by CORRECTNESS rows (`k_bucket`,
  * `s_partprune`) and plan-shape tests (no `Exchange` under the bucketed
  * join; `PartitionFilters` present on the pruned scan).
  */
object Layouts {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table registered
    * under `tableName` with files at `path`. Same bucket count + column on
    * both sides of a join ⇒ exchange-free sort-merge join. */
  def writeBucketedTable(df: DataFrame, tableName: String, path: String,
                         bucketCol: String, nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Write `df` Hive-partitioned by `partitionCols` (directory levels;
    * values are encoded in paths and pruned before file listing I/O). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(path)

  /** Z-order (Morton) key over two integer columns, each min-max scaled to
    * 16 bits IN-PLAN (no driver action: the 1-row min/max aggregate is
    * broadcast back). Interleaving the bits makes rows that are close in
    * BOTH dimensions close in zkey order, so a zkey-clustered layout gives
    * every file a small min/max rectangle in both columns — parquet footer
    * stats then prune file reads for predicates on EITHER dimension, where
    * a single-key sort can only ever skip on its one key. The multi-dim
    * clustering pass of Delta/Iceberg OPTIMIZE ZORDER, on plain parquet.
    *
    * Exact integer math only (`* 65535 div range`) — the scaling and the
    * 32 shift-mask terms reproduce bit-identically in any engine, so the
    * key itself is oracle-checkable. */
  def zorderSparkSql(nx: String, ny: String): String =
    (0 until 16).map { i =>
      s"shiftleft(shiftright($nx, $i) & 1, ${2 * i}) + shiftleft(shiftright($ny, $i) & 1, ${2 * i + 1})"
    }.mkString(" + ")

  /** DuckDB twin of [[zorderSparkSql]] (operator spellings differ; the
    * arithmetic is identical). */
  def zorderDuckSql(nx: String, ny: String): String =
    (0 until 16).map { i =>
      s"((($nx >> $i) & 1) << ${2 * i}) + ((($ny >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Min-max scale `c` to [0, 65535] with exact integer arithmetic, given
    * broadcast bound columns `lo`/`hi`. */
  private def scale16(c: String, lo: String, hi: String): String =
    s"(($c - $lo) * 65535L) div greatest($hi - $lo, 1L)"

  /** Write `df` z-order-clustered on integer columns (c1, c2): compute the
    * Morton key, range-partition and sort on it, emit size-capped files
    * (each covering a compact rectangle in (c1, c2) space), with `zkey`
    * stored alongside the data. One metadata-cheap count sizes the job,
    * like [[compact]]. */
  def zorderCluster(df: DataFrame, path: String, c1: String, c2: String,
                    targetRowsPerFile: Long): Unit = {
    import org.apache.spark.sql.functions._
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    val mm = broadcast(df.agg(
      min(col(c1)).as("__x0"), max(col(c1)).as("__x1"),
      min(col(c2)).as("__y0"), max(col(c2)).as("__y1")))
    df.crossJoin(mm)
      .withColumn("__nx", expr(scale16(c1, "__x0", "__x1")))
      .withColumn("__ny", expr(scale16(c2, "__y0", "__y1")))
      .withColumn("zkey", expr(zorderSparkSql("__nx", "__ny")))
      .drop("__x0", "__x1", "__y0", "__y1", "__nx", "__ny")
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.option("maxRecordsPerFile", targetRowsPerFile)
      .mode("overwrite").parquet(path)
  }

  /** The oracle-side scaling twin of [[scale16]] (DuckDB `//` floor
    * division — exact on the non-negative scaled values, like `div`). */
  def scale16DuckSql(c: String, lo: String, hi: String): String =
    s"(($c - $lo) * 65535) // greatest($hi - $lo, 1)"

  /** Compact a fragmented parquet store: rewrite `inputPath` into
    * `outputPath` as range-clustered files of at most `targetRowsPerFile`
    * rows each, globally ordered on `sortCols`. The maintenance operation
    * every long-lived 100 TB store needs — streaming ingest and per-batch
    * merges accrete small files until task scheduling and footer I/O
    * dominate scan time (the OPTIMIZE of Delta/Iceberg, expressed on plain
    * parquet).
    *
    * Mechanics: one metadata-cheap `count()` sizes the job (the single
    * driver action a maintenance pass owns — parquet answers it from
    * footers), then `repartitionByRange` + `sortWithinPartitions` lays
    * rows out so each output file covers a disjoint `sortCols` range —
    * compaction doubles as a clustering pass, so min/max footer stats
    * prune file reads on the sort key afterwards. `maxRecordsPerFile`
    * caps stragglers if range sampling under-splits a hot range.
    *
    * Returns the planned file count (callers log it; the write itself is
    * the effect). */
  def compact(spark: org.apache.spark.sql.SparkSession, inputPath: String,
              outputPath: String, sortCols: Seq[String],
              targetRowsPerFile: Long): Int = {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(inputPath)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    df.repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.option("maxRecordsPerFile", targetRowsPerFile)
      .mode("overwrite").parquet(outputPath)
    nFiles
  }
}
