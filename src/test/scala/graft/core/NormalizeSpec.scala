package graft.core

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def strip1(s: String): String =
    Seq(s).toDF("x").select(Normalize.stripNormalize(col("x")).as("y")).head().getString(0)

  test("stripNormalize folds accents, collapses spaces, trims, uppercases") {
    assert(strip1("  Žélia  çôrp  ümlaut ") == "ZELIA CORP UMLAUT")
    assert(strip1("áçaí") == "ACAI")
    assert(strip1("no-accents  here") == "NO-ACCENTS HERE")
  }

  test("accent tables are aligned 1:1 (49 chars each, Z included)") {
    assert(Normalize.AccentFrom.length == Normalize.AccentTo.length)
    assert(strip1("Ž") == "Z") // translate maps, does not delete
  }

  test("stripNormalize is idempotent on its own output") {
    val once = strip1("  Pródutô  çom  espaços  ")
    assert(strip1(once) == once)
  }

  private def cnpj1(s: String): String =
    Seq(s).toDF("x").select(Normalize.cnpjNormalize(col("x")).as("y")).head().getString(0)

  test("cnpjNormalize strips punctuation and pads to 15") {
    assert(cnpj1(" 12.345.678/0001-95 ") == "012345678000195")
    assert(cnpj1("12.345.678/0001-95").length == 15)
    assert(cnpj1("1") == "0" * 14 + "1")
  }

  test("cnpjNormalize truncates input longer than 15 (lpad semantics)") {
    assert(cnpj1("1234567890123456789") == "123456789012345")
  }

  private def etq1(s: String): String =
    Seq(s).toDF("x").select(Normalize.etiqueta(col("x")).as("y")).head().getString(0)

  test("etiqueta pads to 30 and truncates longer input") {
    assert(etq1(" 42 ") == "0" * 28 + "42")
    assert(etq1("9" * 35) == "9" * 30)
  }
}
