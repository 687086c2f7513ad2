package graft.streaming

import graft.llmdata.TextPrimitives
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest for a document corpus: continuous exact dedup at crawl
  * time, so duplicates are dropped before they ever land in the corpus
  * store (vs. the batch [[graft.llmdata.DocDedup]] passes that clean an
  * already-landed corpus).
  *
  * The dedup key is the order-sensitive polynomial content fingerprint
  * (same math as [[graft.llmdata.TextAnalysis.fingerprint]], shared via
  * [[withFingerprint]]) rather than the raw text: the state store then
  * keys on a fixed-width BIGINT instead of arbitrary-length documents —
  * at 100 TB/day that is the difference between a state store of hashes
  * and one holding the corpus itself.
  *
  * State is bounded by `dropDuplicatesWithinWatermark`: a fingerprint is
  * remembered only until the watermark passes its event time + the
  * watermark delay, so state size ≈ ingest rate × watermark horizon.
  * (Exactly-once *forever* dedup needs a keyed external store — that is
  * the [[graft.sink.ParquetSink.mergeByKey]] path, Iceberg MERGE in
  * production.)
  */
object DocStream {

  /** Adds the BIGINT content fingerprint column (rolling polynomial hash
    * over token hashes — order-sensitive, whitespace-insensitive). Works on
    * batch and streaming frames alike; pure per-row projection. Delegates
    * to the canonical tokenizer + hash ([[TextPrimitives.tokens]],
    * [[graft.llmdata.TextAnalysis.fingerprintOf]]) so the streaming dedup
    * key can never drift from the batch fingerprint or its oracle. */
  /** Second-fingerprint parameters — an independent multiplier/modulus so
    * pairing (fingerprint, fingerprint2) gives a ~2^60 joint key space: a
    * single mod-1e9+7 key would birthday-collide within a large watermark
    * horizon (~37k docs for 50% odds) and silently DROP distinct documents
    * as duplicates. */
  val Fp2Mult = 131L
  val Fp2Mod = 1000000009L

  def withFingerprint(docs: DataFrame): DataFrame = {
    graft.functions.VectorExprs.register(docs.sparkSession)
    docs
      .withColumn("__w", TextPrimitives.tokens(col("text")))
      .withColumn("__th", TextPrimitives.sparkPolyHashArray("__w"))
      .withColumn("fingerprint", graft.llmdata.TextAnalysis.fingerprintOf("__th"))
      .withColumn("fingerprint2",
        graft.llmdata.TextAnalysis.fingerprintOf("__th", Fp2Mult, Fp2Mod))
      .drop("__w", "__th")
  }

  /** Streaming exact dedup: emit only the first-arriving copy of each
    * fingerprint within the watermark horizon. Input schema:
    * (doc_id BIGINT, ts TIMESTAMP, text STRING) as a streaming frame. */
  def dedupedIngest(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    withFingerprint(docs)
      .withColumn("ts_tz", col("ts").cast("timestamp"))
      .withWatermark("ts_tz", watermark)
      .dropDuplicatesWithinWatermark("fingerprint", "fingerprint2")
      .select(col("doc_id"), col("ts"), col("text"), col("fingerprint"))

  /** Batch twin of [[dedupedIngest]] over a bounded corpus where `doc_id`
    * is the arrival order: keep the first-arriving copy per fingerprint
    * (min doc_id — since only the id survives, the aggregate form needs one
    * corpus scan and one partial+final shuffle, vs two scans for a window
    * argmax joined with counts), plus how many copies it absorbed.
    * Oracle-checked (`st_dedup`). */
  def dedupBatchTwin(docs: DataFrame): DataFrame =
    withFingerprint(docs)
      .groupBy("fingerprint", "fingerprint2")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "fingerprint", "fingerprint2", "n_copies")
}
