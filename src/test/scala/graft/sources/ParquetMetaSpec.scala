package graft.sources

import graft.TestSpark
import graft.llmdata.Similarity
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Pins the stats-driven knob path: parquet footer row counts are EXACT
  * and therefore interchangeable with a corpus `count()` for the
  * size-adaptive banding/cell ladders — knob choice without a scan. */
class ParquetMetaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("footerRows equals the scan count on the real fixtures (single- and multi-table)") {
    for (t <- Seq("embeddings", "documents", "lineitem")) {
      val path = s"/root/testdata/sf0.001/$t.parquet"
      assert(ParquetMeta.footerRows(spark, path) == spark.read.parquet(path).count(),
        s"footer/scan count mismatch for $t")
    }
  }

  test("footerRows sums across a multi-file directory") {
    val dir = Files.createTempDirectory("graft_meta_spec").toString
    (1 to 100).toDF("x").repartition(4).write.parquet(s"$dir/t.parquet")
    assert(ParquetMeta.footerRows(spark, s"$dir/t.parquet") == 100L)
  }

  test("footerRows fails loudly on a missing or fileless path") {
    intercept[IllegalArgumentException](ParquetMeta.footerRows(spark, "/does/not/exist"))
    val empty = Files.createTempDirectory("graft_meta_empty").toString
    intercept[IllegalArgumentException](ParquetMeta.footerRows(spark, empty))
  }

  test("knob ladders pick identical knobs from the footer path and the count() path") {
    val path = "/root/testdata/sf0.001/embeddings.parquet"
    val byFooter = ParquetMeta.footerRows(spark, path)
    val byScan = spark.read.parquet(path).count()
    assert(Similarity.dupBanding(byFooter) == Similarity.dupBanding(byScan))
    assert(Similarity.centeredDupBanding(byFooter) == Similarity.centeredDupBanding(byScan))
    assert(Similarity.semDedupCells(byFooter) == Similarity.semDedupCells(byScan))
  }

  test("operators produce the same result with nHint as with the internal count") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = ParquetMeta.footerRows(spark, "/root/testdata/sf0.001/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(Similarity.lshNearDupPairs(embs, nHint = n).select("id_a", "id_b")) ==
      pairs(Similarity.lshNearDupPairs(embs).select("id_a", "id_b")))
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(cells(Similarity.semDedup(embs, nHint = n)) == cells(Similarity.semDedup(embs)))
  }
}
