package graft.llmdata

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[CorpusOps.sourceQuantileNorm]] — the histogram-join cume_dist must
  * match the window-function definition row for row (the window form is
  * the SPEC; the histogram shape exists so no source ever sorts on a
  * single executor). */
class QnormSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("histogram-join qnorm equals the cume_dist window definition") {
    val out = CorpusOps.sourceQuantileNorm(docs)
    val ref = out.select("doc_id", "source", "quality_score")
      .withColumn("qnorm_ref",
        round(cume_dist().over(
          Window.partitionBy("source").orderBy("quality_score")), 6))
    val joined = out.join(ref, Seq("doc_id", "source", "quality_score"))
    assert(joined.count() == out.count())
    assert(joined.filter(col("qnorm") =!= col("qnorm_ref")).count() == 0L)
  }

  test("qnorm is uniform-ready: in (0,1], per-source max is 1, ties share") {
    val out = CorpusOps.sourceQuantileNorm(docs).cache()
    assert(out.filter(col("qnorm") <= 0.0 || col("qnorm") > 1.0).count() == 0L)
    val perSourceMax = out.groupBy("source").agg(max("qnorm").as("m"))
    assert(perSourceMax.filter(col("m") =!= 1.0).count() == 0L)
    // equal (source, score) ⇒ equal qnorm: one histogram row per tie group
    val tieGroups = out.groupBy("source", "quality_score")
      .agg(countDistinct("qnorm").as("k"))
    assert(tieGroups.filter(col("k") > 1).count() == 0L)
    out.unpersist()
  }

  test("two-regime fixture: the raw global gate starves the terse source, the qnorm gate keeps both") {
    import spark.implicits._
    // Terse source: 1..10 plain tokens, no stopwords/punctuation →
    // scores 0.30625..0.3625. Verbose source: 30..57 tokens, ≥ half
    // stopwords → scores ≥ 0.7875. Every verbose score exceeds every
    // terse score — the regime split a corpus-wide raw cutoff cannot see.
    val terse = (1 to 10).map(n =>
      (n.toLong, "terse", Seq.fill(n)("zylka").mkString(" ")))
    val verbose = (1 to 10).map { i =>
      val n = 27 + 3 * i
      (100L + i, "verbose",
        Seq.tabulate(n)(j => if (j % 2 == 0) "the" else "zylka").mkString(" "))
    }
    val docs2 = (terse ++ verbose).toDF("doc_id", "source", "text")
    // Raw gate at q=0.7: the corpus-wide cutoff lands inside the verbose
    // regime, so the terse source keeps NOTHING.
    val raw = CorpusOps.autoQualityFilter(docs2, q = 0.7)
      .join(docs2.select("doc_id", "source"), "doc_id")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(raw.getOrElse("terse", 0L) == 0L, s"raw gate should starve terse: $raw")
    assert(raw("verbose") == 7L, s"raw gate keeps the corpus-wide top 30%+boundary: $raw")
    // qnorm gate at the SAME q: top 30% of EVERY source (scores are
    // distinct, so cume_dist is i/10 — qnorm >= 0.7 keeps 4 per source).
    val norm = CorpusOps.normQualityFilter(docs2, q = 0.7)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(norm == Map("terse" -> 4L, "verbose" -> 4L),
      s"qnorm gate must keep proportional survivors per source: $norm")
  }

  test("qnorm is monotone in score within every source") {
    val out = CorpusOps.sourceQuantileNorm(docs)
    val w = Window.partitionBy("source").orderBy("quality_score")
    val viol = out
      .withColumn("prev_q", lag("qnorm", 1).over(w))
      .withColumn("prev_s", lag("quality_score", 1).over(w))
      .filter(col("prev_q").isNotNull &&
        ((col("quality_score") > col("prev_s") && col("qnorm") <= col("prev_q")) ||
          col("qnorm") < col("prev_q")))
    assert(viol.count() == 0L)
  }
}
