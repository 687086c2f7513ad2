package graft.sources

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Tables.events]]' physical-type contract: the two layouts the
  * generator has actually shipped normalize to µs NTZ; anything else —
  * notably tz-aware TIMESTAMP, whose NTZ cast is session-timezone-
  * dependent — fails loudly instead of silently shifting event times. */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeEvents(df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("graft_tables_spec").toString
    df.write.parquet(s"$dir/events.parquet")
    dir
  }

  test("nanos-as-long ts converts to µs TIMESTAMP_NTZ (floor division)") {
    // 1 µs + 999 ns: the ns tail must floor away, matching pyarrow/DuckDB
    val dir = writeEvents(Seq((1L, 1999L)).toDF("event_id", "ts"))
    val out = Tables.events(spark, dir)
    assert(out.schema("ts").dataType == TimestampNTZType)
    assert(out.select(expr("cast(ts as string)")).as[String].head == "1970-01-01 00:00:00.000001")
  }

  test("TIMESTAMP_NTZ ts passes through untouched") {
    val dir = writeEvents(
      Seq((1L, "2026-01-01 10:00:00")).toDF("event_id", "ts")
        .withColumn("ts", col("ts").cast(TimestampNTZType)))
    val out = Tables.events(spark, dir)
    assert(out.schema("ts").dataType == TimestampNTZType)
    assert(out.select(expr("cast(ts as string)")).as[String].head == "2026-01-01 10:00:00")
  }

  test("any other ts type fails loudly instead of a timezone-dependent cast") {
    val dir = writeEvents(
      Seq((1L, "2026-01-01 10:00:00")).toDF("event_id", "ts")
        .withColumn("ts", col("ts").cast(TimestampType)))
    val err = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(err.getMessage.contains("timezone"))
    // the refused layout really was the tz-aware one, not a long
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType != LongType)
  }
}
