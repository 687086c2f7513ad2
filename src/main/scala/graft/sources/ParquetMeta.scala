package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Metadata-cost table sizing: EXACT row counts from parquet footers,
  * without scanning a single data page. This is what feeds the
  * size-adaptive knob ladders ([[graft.llmdata.Similarity.dupBanding]] /
  * `semDedupCells`) for corpus-shaped inputs: "persist the corpus, count
  * it, then choose knobs" is free at bench scale but at 100 TB it is a
  * full extra materialization before any candidate work — footer reads
  * cost one round-trip per FILE (thousands of footers ≪ one data scan;
  * a cluster would fan the listing out, and a catalog/manifest would
  * answer from stats — [[TableStats.analyze]] persists exactly those
  * stats-as-data for tables this engine wrote).
  *
  * Footer counts are EXACT (parquet row counts are required metadata),
  * so knob ladders derive IDENTICAL knobs from this path and from
  * `count()` — spec-pinned in StatsKnobsSpec — and the DuckDB twins'
  * `count(*)` (itself a footer read in DuckDB) stays in lockstep. Only
  * valid for a RAW table path: any filter/transform between read and
  * knob choice changes N, and the caller must count the filtered frame
  * instead. */
object ParquetMeta {

  /** Sum of footer row counts under `path` (a parquet file or directory
    * tree). Fails loudly on an empty/missing path — a silent 0 would
    * feed the smallest knob rung to a corpus that simply wasn't where
    * the caller pointed. */
  def footerRows(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    require(fs.exists(root), s"no parquet at $path")
    val it = fs.listFiles(root, true)
    var total = 0L
    var nFiles = 0
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".parquet") && !name.startsWith("_") && !name.startsWith(".")) {
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
        try { total += r.getRecordCount; nFiles += 1 }
        finally r.close()
      }
    }
    require(nFiles > 0, s"no parquet files under $path — refusing a silent N=0")
    total
  }
}
