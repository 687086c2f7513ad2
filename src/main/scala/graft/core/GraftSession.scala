package graft.core

import org.apache.spark.sql.SparkSession

/** Session-level semantic pins the engine depends on (SURVEY.md §4).
  *
  * Applied defensively at query-construction time too, because the driver
  * may hand us a session we didn't build. All four are runtime-settable.
  */
object GraftSession {
  def applyDefaults(spark: SparkSession): SparkSession = {
    def trySet(k: String, v: String): Unit =
      try spark.conf.set(k, v) catch { case _: Throwable => () }
    // Reference semantics are non-ANSI (x/0 -> NULL feeds a coalesce
    // fallback, utils_ressarcimento.py:250-254). Spark 4 defaults ANSI on.
    trySet("spark.sql.ansi.enabled", "false")
    // testdata events.parquet uses TIMESTAMP(NANOS), which Spark rejects
    // unless read as long (we convert to timestamp_ntz in Tables.events).
    trySet("spark.sql.legacy.parquet.nanosAsLong", "true")
    // TimestampNTZ reproducibility (SURVEY.md §4 pin 4).
    trySet("spark.sql.session.timeZone", "UTC")
    spark
  }
}
