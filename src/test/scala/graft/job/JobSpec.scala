package graft.job

import graft.TestSpark
import graft.sink.{ParquetSink, WriteMode}
import java.nio.file.Files
import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite

class JobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- Runner period math (reference etl_job.py:89-95,121-125) ----------

  test("period: first of month normally, previous month in the first 5 days") {
    assert(Runner.period(LocalDate.of(2026, 8, 12)) ==
      Runner.Period(LocalDate.of(2026, 8, 1), LocalDate.of(2026, 8, 12)))
    assert(Runner.period(LocalDate.of(2026, 8, 5)) ==
      Runner.Period(LocalDate.of(2026, 7, 1), LocalDate.of(2026, 8, 5)))
    // year boundary
    assert(Runner.period(LocalDate.of(2026, 1, 3)) ==
      Runner.Period(LocalDate.of(2025, 12, 1), LocalDate.of(2026, 1, 3)))
  }

  test("ressarcimento gate and year loop") {
    assert(Runner.ressarcimentoDue(LocalDate.of(2026, 8, 5)))
    assert(!Runner.ressarcimentoDue(LocalDate.of(2026, 8, 6)))
    assert(Runner.ressarcimentoYears(LocalDate.of(2026, 8, 1)) == (2023 to 2026))
  }

  test("dayRangePaths enumerates inclusive day windows with zero padding") {
    import graft.sources.Tables
    val paths = Tables.dayRangePaths("b", "sys", LocalDate.of(2026, 1, 30), LocalDate.of(2026, 2, 2))
    assert(paths == Seq(
      "b/sys/2026/01/30.parquet", "b/sys/2026/01/31.parquet",
      "b/sys/2026/02/01.parquet", "b/sys/2026/02/02.parquet"))
    // degenerate windows
    assert(Tables.dayRangePaths("b", "s", LocalDate.of(2026, 3, 3), LocalDate.of(2026, 3, 3)).size == 1)
    assert(Tables.dayRangePaths("b", "s", LocalDate.of(2026, 3, 4), LocalDate.of(2026, 3, 3)).isEmpty)
  }

  // ---- ParquetSink (K2/K3/K4, reference etl_job.py:78-85,104-110) -------

  private def freshPath(): String =
    Files.createTempDirectory("graft_sink").resolve("t").toString

  test("mergeByKey inserts then upserts; second identical merge is idempotent") {
    val path = freshPath()
    val sink = new ParquetSink(spark, path)
    val day1 = Seq(("e1", 10.0), ("e2", 20.0)).toDF("etiqueta", "v")
    assert(sink.mergeByKey(day1, Seq("etiqueta")) == 2L)
    // overlapping second batch: e2 updated, e3 inserted
    val day2 = Seq(("e2", 25.0), ("e3", 30.0)).toDF("etiqueta", "v")
    sink.mergeByKey(day2, Seq("etiqueta"))
    val got = sink.read().collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("e1" -> 10.0, "e2" -> 25.0, "e3" -> 30.0))
    // idempotence
    sink.mergeByKey(day2, Seq("etiqueta"))
    assert(sink.read().count() == 3L)
  }

  test("write replace then append accumulates") {
    val path = freshPath()
    val sink = new ParquetSink(spark, path)
    assert(sink.write(Seq((2023, 1.0)).toDF("ano", "v"), WriteMode.Replace) == 1L)
    assert(sink.write(Seq((2024, 2.0)).toDF("ano", "v"), WriteMode.Append) == 1L)
    assert(sink.read().count() == 2L)
    assert(sink.write(Seq((2023, 9.0)).toDF("ano", "v"), WriteMode.Replace) == 1L)
    assert(sink.read().count() == 1L)
  }

  // ---- PartitionedParquetSink (K6: partition-scoped replace) -------------

  test("partitioned sink: Replace touches only its own partitions; deletePartition; guards") {
    val sink = new graft.sink.PartitionedParquetSink(spark, freshPath(), "ano")
    sink.write(Seq((2023, 1.0), (2024, 2.0)).toDF("ano", "v"), WriteMode.Replace)
    // re-Replace ONLY 2024 — 2023 must survive
    assert(sink.write(Seq((2024, 9.0)).toDF("ano", "v"), WriteMode.Replace) == 1L)
    val got = sink.read().collect().map(r => r.getAs[Int]("ano") -> r.getDouble(0)).toMap
    assert(got == Map(2023 -> 1.0, 2024 -> 9.0))
    // deletePartition: true when it existed, false when it didn't
    assert(sink.deletePartition(2023))
    assert(!sink.deletePartition(2023))
    assert(sink.read().collect().map(_.getAs[Int]("ano")).toSeq == Seq(2024))
    // missing partition column is rejected loudly, not written wrong
    intercept[IllegalArgumentException] {
      sink.write(Seq((1, 1.0)).toDF("x", "v"), WriteMode.Append)
    }
  }

  // deletePartition behavior (incl. escaped directory names) lives in the
  // sink contract suite: graft.sink.PartitionedParquetSinkContractSpec.

  test("runRessarcimento rejects a partition-scoped sink (replace-then-append miswiring)") {
    // Against dynamic partition overwrite, the first written year's Replace
    // would touch only its own partition and later years would APPEND onto
    // their previous rows — silent monthly duplication. The guard fires
    // before any source is read.
    val sink = new graft.sink.PartitionedParquetSink(spark, freshPath(), "ano")
    val e = intercept[IllegalArgumentException] {
      Runner.runRessarcimento(spark, Map.empty, sink, LocalDate.of(2026, 8, 3))
    }
    assert(e.getMessage.contains("runRessarcimentoPartitioned"))
  }

  test("runRessarcimentoPartitioned default is due-gated past day 5") {
    // The gate fires before any source is read, so an empty config proves
    // the early return (a config access would throw NoSuchElementException).
    val sink = new graft.sink.PartitionedParquetSink(spark, freshPath(), "ano")
    assert(Runner.runRessarcimentoPartitioned(
      spark, Map.empty, sink, LocalDate.of(2026, 8, 12)).isEmpty)
  }

  test("partitioned sink merge is partition-local and counts rows written") {
    val sink = new graft.sink.PartitionedParquetSink(spark, freshPath(), "ano")
    sink.write(Seq((2023, "a", 1.0), (2023, "b", 2.0), (2024, "c", 3.0))
      .toDF("ano", "k", "v"), WriteMode.Replace)
    // merge touches only ano=2023: "b" updated, "d" inserted; written =
    // kept(1) + incoming(2) = 3 (the trait's rows-written contract)
    val written = sink.mergeByKey(
      Seq((2023, "b", 20.0), (2023, "d", 40.0)).toDF("ano", "k", "v"), Seq("ano", "k"))
    assert(written == 3L)
    val got = sink.read().collect()
      .map(r => (r.getAs[Int]("ano"), r.getString(0)) -> r.getDouble(1)).toMap
    assert(got == Map((2023, "a") -> 1.0, (2023, "b") -> 20.0,
      (2023, "d") -> 40.0, (2024, "c") -> 3.0))
  }
}
