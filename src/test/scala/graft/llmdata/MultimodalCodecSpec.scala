package graft.llmdata

import graft.TestSpark
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

/** The real half of the codec seam: ImageIoCodec must return TRUE
  * dimensions for genuine image bytes (synthesized in-memory with the same
  * JDK encoder — real PNG/JPEG files, no fixtures on disk), fall back to
  * the deterministic stub for undecodable payloads, and run through the
  * same distributed decode stage the oracle-checked stub uses.
  */
class MultimodalCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def imageBytes(format: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, rgb)))
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"JDK lacks a $format writer")
    out.toByteArray
  }

  test("ImageIoCodec reads true dims, bands, and format from real PNG/JPEG headers") {
    val png = imageBytes("png", 17, 23, 0x336699)
    val jpg = imageBytes("jpg", 40, 8, 0x884422)
    val pm = Multimodal.ImageIoCodec.decode(1L, "application/octet-stream", png)
    assert(pm.width == 17L && pm.height == 23L)
    assert(pm.media_type == "image/png")
    assert(pm.channels == 3L)
    assert(pm.byte_len == png.length.toLong)
    val expectedCrc = { val c = new java.util.zip.CRC32; c.update(png); c.getValue }
    assert(pm.checksum == expectedCrc, "checksum must be the payload CRC32")
    val jm = Multimodal.ImageIoCodec.decode(2L, "x", jpg)
    assert(jm.width == 40L && jm.height == 8L)
    assert(jm.media_type.startsWith("image/jp"))
  }

  test("undecodable payloads fall back to the stub instead of failing the batch") {
    val junk = "definitely not an image".getBytes("UTF-8")
    val got = Multimodal.ImageIoCodec.decode(7L, "image/fake", junk)
    assert(got == Multimodal.FakeCodec.decode(7L, "image/fake", junk))
    // truncated real header: magic bytes match, decode chokes — still data
    val png = imageBytes("png", 17, 23, 0x336699)
    val truncated = png.take(12)
    val t = Multimodal.ImageIoCodec.decode(8L, "image/fake", truncated)
    assert(t.doc_id == 8L && t.byte_len == 12L)
  }

  test("decodeMetaFrom runs the real codec distributed over a binary column") {
    val rows = Seq(
      (1L, "application/octet-stream", imageBytes("png", 5, 9, 0xffffff)),
      (2L, "application/octet-stream", imageBytes("png", 31, 2, 0x000000)),
      (3L, "text/plain", "plain text payload".getBytes("UTF-8")))
    val media = rows.toDF("doc_id", "media_type", "payload").repartition(2)
    val got = Multimodal.decodeMetaFrom(spark, media, Multimodal.ImageIoCodec)
      .collect().map(m => m.doc_id -> m).toMap
    assert(got(1L).width == 5L && got(1L).height == 9L && got(1L).media_type == "image/png")
    assert(got(2L).width == 31L && got(2L).height == 2L)
    assert(got(3L) == Multimodal.FakeCodec.decode(3L, "text/plain", rows(2)._3))
  }

  test("featurizeDims: 8 at every oracle/decade scale, 16 past 2^21 docs") {
    // every scale an oracle or committed measurement runs at stays 8-dim
    Seq(500L, 5000L, 50000L, 500000L, 1L << 21).foreach(n =>
      assert(Multimodal.featurizeDims(n) == 8, s"n=$n"))
    // the sf100 boundary: 8-dim features saturate angularly — see scaladoc
    Seq((1L << 21) + 1, 5000000L, 1000000000L).foreach(n =>
      assert(Multimodal.featurizeDims(n) == 16, s"n=$n"))
  }

  test("featurize at 16 dims: wider stride, same per-dim hash family, dup-preserving") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (2L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (3L, "completely different content here")).toDF("doc_id", "text")
    val f = Multimodal.featurize(spark, docs, dims = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(f(1L).size == 16)
    // identical payloads featurize identically at any width
    assert(f(1L) == f(2L))
    assert(f(1L) != f(3L))
  }

  test("m_meta's registered form still rides the deterministic stub (oracle contract)") {
    val docs = Seq((1L, "en", "abc")).toDF("doc_id", "lang", "text")
    val m = Multimodal.decodeMeta(spark, docs).collect().head
    assert(m == Multimodal.FakeCodec.decode(1L, "image/fake", "abc".getBytes("UTF-8")))
  }
}
