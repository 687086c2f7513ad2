package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Text/key normalization primitives (composite operators C1-C3 of SURVEY.md §2.10).
  *
  * Semantics derived from the reference's normalization helpers
  * (`utils_ressarcimento.py:7-18`, `utils_superdesconto.py:58-59`):
  *
  *  - `stripNormalize`: trim → accent-fold → collapse runs of spaces → upper.
  *    Both accent tables are exactly 49 chars (verified byte-level against
  *    the reference `utils_ressarcimento.py:9-10`): every accented char maps
  *    1:1 to its ASCII fold, `Ž`→`Z` included — no char is deleted.
  *  - `cnpjNormalize`: trim → strip non-alphanumerics → left-pad to 15 '0'.
  *  - `etiqueta`: trim → left-pad to 30 '0' (lpad also truncates longer
  *    input, in both Spark and ANSI SQL) → cast string.
  *
  * All are pure `Column` functions built from codegen'd Catalyst expressions
  * (no UDFs), so they stay inside whole-stage codegen and are pushdown- and
  * scale-friendly.
  */
object Normalize {
  /** 49-char source/replacement pair, byte-identical to the reference
    * (`utils_ressarcimento.py:9-10`); `Ž` maps to `Z`. */
  val AccentFrom = "ãäöüẞáäčçďéěíĺľňóôŕšťúůýžÄÖÜẞÁÄČÇĎÉĚÍĹĽŇÓÔŔŠŤÚŮÝŽ"
  val AccentTo = "aaousaaccdeeillnoorstuuyzAOUSAACCDEEILLNOORSTUUYZ"

  /** C1: trim → accent-fold → collapse multi-space → upper. */
  def stripNormalize(c: Column): Column =
    upper(regexp_replace(translate(trim(c), AccentFrom, AccentTo), " +", " "))

  def stripNormalize(name: String): Column = stripNormalize(col(name))

  /** C2: CNPJ (tax id) canonical form — strip punctuation, pad to 15. */
  def cnpjNormalize(c: Column): Column =
    lpad(regexp_replace(trim(c), "[^0-9a-zA-Z]", ""), 15, "0")

  def cnpjNormalize(name: String): Column = cnpjNormalize(col(name))

  /** C3: coupon label canonical form — pad to 30 chars. */
  def etiqueta(c: Column): Column =
    lpad(trim(c), 30, "0").cast(StringType)

  def etiqueta(name: String): Column = etiqueta(col(name))
}
