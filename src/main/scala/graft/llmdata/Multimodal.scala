package graft.llmdata

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns plus typed
  * metadata, with decode/feature-extraction running batch-wise inside
  * `mapPartitions` (the Scala analogue of `mapInPandas` — one iterator per
  * partition, so a real codec could amortize library init per batch and
  * stream row groups without materializing the partition).
  *
  * Decode runs behind the [[Multimodal.MediaCodec]] seam. [[Multimodal.ImageIoCodec]]
  * is a REAL image decoder (the JDK's built-in `javax.imageio` —
  * PNG/JPEG/GIF/BMP header parse, no external libraries); [[Multimodal.FakeCodec]]
  * is a deterministic stand-in for media the container can't decode
  * (audio/video, the synthetic text fixtures) and for the DuckDB oracle
  * rows, which must be reproducible from bytes alone. Everything around
  * the seam (schema, encoders, partitioning, batch iteration) is the same
  * distributed plumbing either way; a JNI/javacv video codec slots in as a
  * third [[Multimodal.MediaCodec]].
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

  /** The decode seam: one media row in, typed metadata out. Implementations
    * must be serializable objects (they ride into `mapPartitions` closures)
    * and deterministic per byte-payload. */
  trait MediaCodec extends Serializable {
    def decode(docId: Long, mediaType: String, payload: Array[Byte]): MediaMeta
  }

  /** STUB codec: deterministic metadata from raw bytes only (no real
    * decode). width/height fake a parsed header; checksum fakes a pixel
    * digest (Knuth multiplicative hash of the length — matches the DuckDB
    * oracle, which sees the same bytes). */
  object FakeCodec extends MediaCodec {
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

  /** REAL image codec on the JDK's bundled ImageIO readers: true
    * width/height/bands from the image HEADER (`getWidth` on a reader
    * parses metadata only — a 50 MB JPEG costs a header read, not a raster
    * allocation), format-corrected media type, and a CRC32 of the payload
    * as the checksum. Payloads no reader claims (corrupt bytes, audio, the
    * synthetic text fixtures) FALL BACK to [[FakeCodec]] rather than fail
    * the batch — at corpus scale undecodable rows are data, not errors;
    * callers that need to quarantine them filter on the media_type that
    * stays un-corrected. */
  object ImageIoCodec extends MediaCodec {
    def decode(docId: Long, mediaType: String, payload: Array[Byte]): MediaMeta = {
      // MemoryCacheImageInputStream directly — NOT ImageIO
      // .createImageInputStream, which under the default useCache=true
      // returns a FileCacheImageInputStream that spools every payload to an
      // executor-local temp file: at corpus scale that is a full disk write
      // per row for bytes that are already in memory.
      val in: javax.imageio.stream.ImageInputStream =
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) FakeCodec.decode(docId, mediaType, payload)
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            val bands = {
              val types = r.getImageTypes(0)
              if (types.hasNext) types.next().getNumBands.toLong else 3L
            }
            val crc = new java.util.zip.CRC32
            crc.update(payload)
            MediaMeta(
              doc_id = docId,
              media_type = "image/" + r.getFormatName.toLowerCase(java.util.Locale.ROOT),
              byte_len = payload.length.toLong,
              width = r.getWidth(0).toLong,
              height = r.getHeight(0).toLong,
              channels = bands,
              checksum = crc.getValue)
          } finally r.dispose()
        }
      } catch {
        // A reader that matched the magic bytes but chokes mid-header
        // (truncated/corrupt file) is still data, not a job failure.
        case _: java.io.IOException | _: RuntimeException =>
          FakeCodec.decode(docId, mediaType, payload)
      } finally if (in != null) in.close()
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

  /** Decode stage over an arbitrary (doc_id, media_type, payload) frame:
    * batch iteration per partition with a typed Encoder. Narrow (no
    * shuffle); scales linearly with input splits. The codec is the seam —
    * [[ImageIoCodec]] for real image bytes, [[FakeCodec]] for the
    * deterministic oracle fixtures. */
  def decodeMetaFrom(spark: SparkSession, media: DataFrame,
                     codec: MediaCodec): Dataset[MediaMeta] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // One iterator per partition: a stateful codec would init here once.
        batch.map { case (id, mt, bytes) => codec.decode(id, mt, bytes) }
      }
  }

  /** The registered/oracle form: synthetic text payloads through the
    * deterministic stub codec (the oracle recomputes the same metadata in
    * SQL from the same bytes — a real decoder is not SQL-reproducible). */
  def decodeMeta(spark: SparkSession, documents: DataFrame): Dataset[MediaMeta] =
    decodeMetaFrom(spark, withPayload(documents), FakeCodec)

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
  /** Feature width for a corpus of n media items. 8 dims up to 2^21 items
    * (every oracle scale and both committed decades — results unchanged),
    * 16 past that: the sf100 rehearsal showed 8-dim features SATURATE
    * angularly at millions of items — the fraction of chance pairs within
    * the near-dup family's cos ≥ 0.99 cone scales ~(sin 8°)^(d−1), so at
    * d=8 it is ~1e-6 and N²·1e-6 turns quadratic past ~1e6 docs no matter
    * how wide the banding gets. d=16 pushes the cone fraction to ~1e-13,
    * sub-linear in N² through ~1e9 items. Integer step, mirrored (as a
    * documented constant-8 resolution) in the `m_embed_neardup_lsh` twin,
    * which only ever runs at oracle scales below the boundary. */
  def featurizeDims(n: Long): Int = if (n > (1L << 21)) 16 else 8

  def featurize(spark: SparkSession, documents: DataFrame,
                dims: Int = 8): DataFrame = {
    import spark.implicits._
    withPayload(documents)
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, _, bytes) =>
          val feat = Array.tabulate(dims) { j =>
            var h = 0L
            var i = j
            while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += dims }
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
