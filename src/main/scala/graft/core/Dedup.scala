package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-one-row-per-key (D1/D2/D3 of SURVEY.md §2.6).
  *
  * The reference uses two idioms:
  *  - `dropDuplicates(keys)` — keep an *arbitrary* row
  *    (`utils_ressarcimento.py:49`, `utils_superdesconto.py:113,124`);
  *  - `orderBy(ts.desc).dropDuplicates(keys)` — *intended* "latest per key",
  *    but Spark does not guarantee order is preserved through the dedup
  *    exchange (`utils_ressarcimento.py:54-55,145-146`).
  *
  * Both are implemented here as the reference's own correct idiom
  * (`utils_superdesconto.py:91-97`): `row_number()` over an explicit,
  * *total* order, filtered to 1. A total order (caller supplies enough
  * tie-breakers) makes results deterministic across runs, partition counts
  * and engines — a requirement at 1000-executor scale where dropDuplicates'
  * "whichever row the shuffle saw first" differs on every run.
  *
  * Cost is identical to `dropDuplicates`: one hash-partition shuffle on the
  * keys; the per-partition sort replaces the hash-dedup probe.
  */
object Dedup {

  /** Keep the first row per `keys` under `order` (must be a total order on
    * rows sharing a key, or at minimum all selected payload columns must be
    * functionally determined by the ordered prefix). */
  def top1PerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    // Fresh helper name: an input that already has __graft_rn must not be
    // silently overwritten and dropped.
    val rn = Iterator.from(0).map(i => if (i == 0) "__graft_rn" else s"__graft_rn$i")
      .find(n => !df.columns.contains(n)).get
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }
}
