package graft.core

import org.apache.spark.sql.SparkSession

/** Session-level semantic pins the engine depends on (SURVEY.md §4).
  *
  * Applied defensively at query-construction time too, because the driver
  * may hand us a session we didn't build. All three are runtime-settable.
  */
object GraftSession {
  /** The three semantic pins and their required values. */
  val Pins: Seq[(String, String)] = Seq(
    // Reference semantics are non-ANSI (x/0 -> NULL feeds a coalesce
    // fallback, utils_ressarcimento.py:250-254). Spark 4 defaults ANSI on.
    "spark.sql.ansi.enabled" -> "false",
    // testdata events.parquet uses TIMESTAMP(NANOS), which Spark rejects
    // unless read as long (we convert to timestamp_ntz in Tables.events).
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // TimestampNTZ reproducibility (SURVEY.md §4 pin 4).
    "spark.sql.session.timeZone" -> "UTC")

  def applyDefaults(spark: SparkSession): SparkSession = {
    Pins.foreach { case (k, v) =>
      try spark.conf.set(k, v)
      catch {
        // Non-settable conf (AnalysisException in practice): surface it —
        // a silently missing pin shifts timestamps or breaks events reads
        // with an unrelated error much later.
        case e: Exception =>
          System.err.println(s"[graft] failed to pin $k=$v: ${e.getMessage}")
      }
    }
    // Verify effective values; a wrong pin is a correctness bug, not a
    // preference, so fail loudly at session setup rather than mid-query.
    val wrong = Pins.filter { case (k, v) => spark.conf.getOption(k).exists(_ != v) }
    require(wrong.isEmpty,
      s"graft session pins not effective: ${wrong.map { case (k, v) => s"$k!=$v" }.mkString(", ")}")
    spark
  }
}
