package graft.sink

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for [[Layouts.compact]] — content preservation is the CORRECTNESS
  * row's job (`k_compact`); these pin the LAYOUT claims: file count, the
  * per-file row cap, and the disjoint per-file key ranges that let parquet
  * footer min/max stats prune reads on the sort key after compaction. */
class CompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compact: file count, row cap, and disjoint per-file key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_spec").toString
    (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(16).write.mode("overwrite").parquet(s"$dir/frag")
    assert(new java.io.File(s"$dir/frag").listFiles().count(_.getName.endsWith(".parquet")) == 16)

    val planned = Layouts.compact(spark, s"$dir/frag", s"$dir/opt", Seq("k"), 250L)
    assert(planned == 4)
    val files = new java.io.File(s"$dir/opt").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 4, s"expected 4 compacted files, got $files")

    // per-file: row cap respected, key ranges pairwise disjoint (the
    // property footer-stat pruning depends on)
    val perFile = spark.read.parquet(s"$dir/opt")
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"), min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(perFile.map(_._1).sum == 1000L)
    assert(perFile.forall(_._1 <= 250L), s"row cap violated: ${perFile.mkString(",")}")
    val ranges = perFile.map(t => (t._2, t._3)).sortBy(_._1).toSeq
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping file ranges: ${ranges.mkString(",")}")
      case _ => ()
    }
  }

  /** In-JVM reference Morton interleave — pins the generated SQL terms. */
  private def mortonRef(nx: Long, ny: Long): Long =
    (0 until 16).map(i => (((nx >> i) & 1L) << (2 * i)) | (((ny >> i) & 1L) << (2 * i + 1))).sum

  test("zorderCluster: key matches the reference interleave; files cover small rectangles in BOTH dims") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_spec").toString
    // 64x64 grid: every (x, y) pair once -> 4096 rows, both dims uniform
    val grid = spark.range(4096)
      .selectExpr("id % 64 as x", "id div 64 as y")
    Layouts.zorderCluster(grid, s"$dir/z", "x", "y", 256L)

    val z = spark.read.parquet(s"$dir/z")
    // key math: scaling maps 0..63 -> 0..65535 via *65535 div 63; check
    // every row against the in-JVM reference
    val bad = z.collect().filterNot { r =>
      val (x, y) = (r.getAs[Long]("x"), r.getAs[Long]("y"))
      r.getAs[Long]("zkey") == mortonRef(x * 65535L / 63L, y * 65535L / 63L)
    }
    assert(bad.isEmpty, s"zkey mismatch on ${bad.length} rows, e.g. ${bad.headOption}")

    def avgSpans(path: String): (Double, Double) = {
      val s = spark.read.parquet(path)
        .groupBy(input_file_name()).agg(
          (max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      (s.map(_._1).sum.toDouble / s.length, s.map(_._2).sum.toDouble / s.length)
    }
    // baseline: linear sort on x — perfect on x, but every file spans the
    // whole y domain
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.option("maxRecordsPerFile", 256L).mode("overwrite").parquet(s"$dir/linear")
    val (_, linY) = avgSpans(s"$dir/linear")
    val (zX, zY) = avgSpans(s"$dir/z")
    assert(linY > 60.0, s"linear baseline should span y fully, got $linY")
    // 16 files over a 64x64 grid in z-order = 16x16 tiles: both spans ~16
    assert(zY <= linY / 2, s"z-order y-span $zY not better than linear $linY")
    assert(zX < 32.0 && zY < 32.0, s"z-order rectangles too wide: x=$zX y=$zY")
  }
}
