package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generator for SCALE REHEARSALS (`runMain graft.tools.GenScale [out]`):
  * a 10× fixture set derived from sf0.1 as ten key-shifted replicas,
  * written under tmp/sf1 by default (the real testdata tree is read-only
  * for this repo). Feeds the sf0.1-vs-sf1 scaling-exponent table in
  * SCALING.md — re-run it whenever a new operator's scale behavior needs
  * an empirical check instead of a plan audit.
  *
  * Replicas must not be byte-copies or every dedup/ANN operator would see
  * a corpus where EVERYTHING has 10 identical twins — candidate
  * structures (minhash bands, LSH buckets, IVF cells) would degenerate
  * and the measured scaling exponent would be an artifact. Decorrelation,
  * deterministically per replica r:
  *   - every FK/PK family shifts by r*1e8 (referential integrity holds
  *     within a replica, never across);
  *   - documents text is Caesar-shifted by r (token structure, lengths,
  *     and within-replica duplicate structure preserved exactly; zero
  *     shared shingles across replicas);
  *   - embeddings rotate circularly by r components (norms and
  *     within-replica geometry exact; cross-replica cosine decorrelated).
  * nation/region stay as-is (dimension lookups, like a real 10× corpus).
  */
object GenScale {
  // Per-key-family replica offsets, sized to clear each family's sf0.1 key
  // range — NOT one giant constant: several fixture definitions turn keys
  // into temporal offsets (e.g. fornecedor's `TIMESTAMP '2023-01-01' +
  // s_suppkey DAYS`), so a 1e8-shifted suppkey becomes ~9e8 days and the
  // microsecond timestamp math overflows long. Keys only need to be
  // disjoint across replicas, so each family shifts by roughly 10× its
  // own max key instead.
  val OrderOff = 100000000L // o_orderkey ≈ 6e5 max; *2 in debito stays < 2e9
  val CustOff  = 1000000L   // c_custkey ≈ 1.5e4 max
  val PartOff  = 1000000L   // p_partkey ≈ 2e4 max
  val SuppOff  = 10000L     // s_suppkey ≈ 1e3 max; as DAYS stays < 300 years
  val IdOff    = 100000000L // doc_id / vec_id / event_id / user_id: no temporal use
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.GraftSession.applyDefaults(spark)
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val out = args.headOption.getOrElse("/root/repo/tmp/sf1")
    val lower = "abcdefghijklmnopqrstuvwxyz"
    def caesar(c: org.apache.spark.sql.Column, r: Int) = {
      val lo = lower.drop(r % 26) + lower.take(r % 26)
      translate(translate(c, lower, lo), lower.toUpperCase, lo.toUpperCase)
    }
    def bump(df: DataFrame, cols: Map[String, Long], r: Int): DataFrame =
      cols.foldLeft(df) { case (d, (c, off)) => d.withColumn(c, col(c) + lit(r * off)) }
    def gen(name: String)(tx: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      (0 until 10).map(r => tx(base, r)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[gen] $name done")
    }
    gen("customer")((d, r) => bump(d, Map("c_custkey" -> CustOff), r))
    gen("orders")((d, r) => bump(d, Map("o_orderkey" -> OrderOff, "o_custkey" -> CustOff), r))
    gen("lineitem")((d, r) => bump(d,
      Map("l_orderkey" -> OrderOff, "l_partkey" -> PartOff, "l_suppkey" -> SuppOff), r))
    gen("part")((d, r) => bump(d, Map("p_partkey" -> PartOff), r))
    gen("supplier")((d, r) => bump(d, Map("s_suppkey" -> SuppOff), r))
    gen("events")((d, r) => bump(d, Map("event_id" -> IdOff, "user_id" -> IdOff), r))
    gen("documents")((d, r) =>
      bump(d, Map("doc_id" -> IdOff), r).withColumn("text", caesar(col("text"), r)))
    gen("embeddings")((d, r) => bump(d, Map("vec_id" -> IdOff), r).withColumn("embedding",
      if (r == 0) col("embedding")
      else expr(s"concat(slice(embedding, ${r + 1}, size(embedding) - $r), slice(embedding, 1, $r))")))
    Seq("nation", "region").foreach { n =>
      spark.read.parquet(s"$src/$n.parquet").write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
    spark.stop()
  }
}
