package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-introspection-driven rewrites (C4 / P7 / P8 of SURVEY.md §2).
  *
  * The reference iterates `df.schema` to drive bulk casts and null-fills
  * (`etl_job.py:15-25`, `utils_ressarcimento.py:272-278`). Both are a single
  * `withColumns(Map)` — one projection node, fully codegen'd, no extra
  * shuffle or pass over the data.
  */
object SchemaCasts {

  /** C4: cast every Decimal column to Double, plus the named columns to
    * TimestampNTZ (reference `cast_decimal_double`, `etl_job.py:15-25`). */
  def castDecimalDouble(df: DataFrame, timestampCols: String*): DataFrame = {
    val decimals: Map[String, Column] = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[DecimalType] =>
        f.name -> col(f.name).cast(DoubleType)
    }.toMap
    val timestamps = timestampCols.map(c => c -> col(c).cast(TimestampNTZType)).toMap
    df.withColumns(decimals ++ timestamps)
  }

  /** P8: null-fill every Double/Float column with 0
    * (reference `utils_ressarcimento.py:272-278`). */
  def fillFloatNulls(df: DataFrame): DataFrame = {
    val fills: Map[String, Column] = df.schema.fields.collect {
      case f if f.dataType == DoubleType || f.dataType == FloatType =>
        f.name -> coalesce(col(f.name), lit(0))
    }.toMap
    df.withColumns(fills)
  }

  /** Exact, order-independent sum of a floating-point measure: accumulate in
    * DECIMAL(38,12) (exact, associative) and surface as Double. A raw
    * `sum(double)` depends on partition/merge order, which breaks
    * reproducibility across runs, cluster sizes, and engines; at 1000
    * executors the reduction order is never the same twice. Costs one extra
    * cast inside the (still hash-based, partial+final) aggregate.
    *
    * Trade-offs (documented, not hidden): inputs are rounded to 12
    * fractional digits (HALF_UP) before accumulating, and the integer part
    * caps at 1e26 before overflow-to-null — both far beyond any monetary
    * measure. This is an opt-in alternative to the reference's raw
    * `sum(double)` (`utils_ressarcimento.py:125,183`): the registered
    * pipeline queries keep raw sums for reference parity (the fixture
    * measures are integer-valued, so both forms agree there); use this when
    * run-to-run byte-stability matters more than the last float ulp.
    */
  def exactSum(c: Column): Column = sum(c.cast(DecimalType(38, 12))).cast(DoubleType)
}
