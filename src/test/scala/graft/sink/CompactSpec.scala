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
}
