package graft.llmdata

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns plus typed
  * metadata, with decode/feature-extraction running batch-wise inside
  * `mapPartitions` (the Scala analogue of `mapInPandas` — one iterator per
  * partition, so a real codec could amortize library init per batch and
  * stream row groups without materializing the partition).
  *
  * The actual image/audio decode is STUBBED — no codec libraries exist in
  * this environment — behind [[FakeCodec]], a deterministic stand-in that
  * derives metadata purely from the bytes. Everything around it (schema,
  * encoders, partitioning, batch iteration) is the real distributed
  * plumbing a production decode would use; swapping [[FakeCodec.decode]]
  * for a JNI/javacv call is the only change needed.
  */
object Multimodal {

  /** Typed output row of the decode stage. */
  final case class MediaMeta(
    doc_id: Long,
    media_type: String,
    byte_len: Long,
    width: Long,
    height: Long,
    channels: Long,
    checksum: Long)

  /** STUB codec: deterministic metadata from raw bytes only (no real
    * decode). width/height fake a parsed header; checksum fakes a pixel
    * digest (Knuth multiplicative hash of the length — matches the DuckDB
    * oracle, which sees the same bytes). */
  object FakeCodec {
    def decode(docId: Long, mediaType: String, payload: Array[Byte]): MediaMeta = {
      val n = payload.length.toLong
      MediaMeta(
        doc_id = docId,
        media_type = mediaType,
        byte_len = n,
        width = 1L + n % 640L,
        height = 1L + (n * 7L) % 480L,
        channels = 3L,
        checksum = (n * 2654435761L) % 4294967296L)
    }
  }

  /** Attach a synthetic binary payload to each document (UTF-8 bytes of the
    * text stand in for image bytes; real corpora carry the bytes in the
    * parquet directly). Kept as a column expression so the payload never
    * round-trips through the driver. */
  def withPayload(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      lit("image/fake").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Decode stage: batch iteration per partition with a typed Encoder.
    * Narrow (no shuffle); scales linearly with input splits. */
  def decodeMeta(spark: SparkSession, documents: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(documents)
      .select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // One iterator per partition: a real codec would init here once.
        batch.map { case (id, mt, bytes) => FakeCodec.decode(id, mt, bytes) }
      }
  }

  /** Typed row of the resize stage: payload replaced by the (fake)
    * re-encoded bytes plus the new dimensions. */
  final case class ResizedMedia(
    doc_id: Long,
    media_type: String,
    width: Long,
    height: Long,
    byte_len: Long)

  /** STUB resize: "re-encode" to a bounded box by truncating the payload
    * proportionally — the real batch shape (binary in → binary out, new
    * metadata) with a placeholder codec. Output payload length is
    * deterministic: ceil(len * min(1, maxSide/max(w,h))). */
  def resize(spark: SparkSession, documents: DataFrame, maxSide: Long = 64L): Dataset[ResizedMedia] = {
    import spark.implicits._
    withPayload(documents)
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, mt, bytes) =>
          val m = FakeCodec.decode(id, mt, bytes)
          val side = math.max(m.width, m.height)
          val scale = if (side <= maxSide) 1.0 else maxSide.toDouble / side
          val newLen = math.ceil(bytes.length * scale).toLong
          ResizedMedia(id, mt,
            math.max(1L, math.round(m.width * scale)),
            math.max(1L, math.round(m.height * scale)),
            newLen)
        }
      }
  }

  /** STUB feature extraction: an 8-dim deterministic "embedding" of the
    * payload (polynomial byte-window hashes scaled to [0,1)) — the schema
    * and batch shape a real vision encoder would produce, feeding directly
    * into [[Similarity]] operators. */
  def featurize(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    withPayload(documents)
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, _, bytes) =>
          val feat = Array.tabulate(8) { j =>
            var h = 0L
            var i = j
            while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 8 }
            h.toDouble / 1000000007.0
          }
          (id, feat)
        }
      }
      .toDF("doc_id", "feature")
  }

  /** Frame-sampling plumbing: explode a fake per-media frame index (every
    * Nth "frame" by byte offset) — the batch shape video pipelines need
    * (media row → many frame rows), again without a real decoder. */
  def sampleFrames(spark: SparkSession, documents: DataFrame, every: Int = 64): DataFrame = {
    decodeMeta(spark, documents).toDF()
      .withColumn("frame_off",
        explode(expr(s"sequence(0, greatest(CAST(byte_len AS INT) - 1, 0), $every)")))
      .select(col("doc_id"), col("frame_off"),
        ((col("frame_off") * lit(31L) + col("checksum")) % lit(4294967296L)).as("frame_sig"))
  }
}
