package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The kernel plane of the multimodal layer (fakes are not oracle
  * material — the SQL-expressible plumbing is oracle-checked as
  * `multimodal_meta`): schema contract, partition-batched execution,
  * determinism, shape invariants. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("media table: kinds, payloads, metadata invariants") {
    val media = Multimodal.mediaTable(spark, Dir).cache()
    val rows = media.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(m => Set("image", "audio", "video")(m.kind)))
    assert(rows.forall(m => m.payload.nonEmpty))
    assert(rows.filter(_.kind == "audio").forall(_.sample_rate == 16000))
    assert(rows.filter(_.kind == "image").forall(_.duration_ms == 0))
  }

  test("decode stage: size-correct pixel buffers, deterministic across runs") {
    val media = Multimodal.mediaTable(spark, Dir)
    val d1 = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeImages(media.repartition(7)).collect().sortBy(_.media_id)
    assert(d1.nonEmpty)
    assert(d1.forall(d => d.pixels.length == d.width * d.height * d.channels))
    // the synthesized text-byte payloads have no JVM codec: all of them
    // must take the QUARANTINED fake path (1-channel)
    assert(d1.forall(_.channels == 1))
    // partitioning must not change results (kernel is per-row pure)
    assert(d1.map(_.media_id).toSeq == d2.map(_.media_id).toSeq)
    assert(d1.zip(d2).forall { case (a, b) => a.pixels.toSeq == b.pixels.toSeq })
  }

  // ------------------------------------------------------------------
  // REAL decode path (javax.imageio) — golden fixtures
  // ------------------------------------------------------------------

  /** Golden 2×2 image, row-major top-down RGB:
    * (255,0,0) (0,255,0) / (0,0,255) (255,255,255). */
  private val GoldenRgb: Seq[Byte] = Seq(
    255, 0, 0, 0, 255, 0,
    0, 0, 255, 255, 255, 255).map(_.toByte)

  /** The same image as a HAND-CRAFTED 24-bit BMP (bottom-up, BGR,
    * 4-byte-padded rows) — a true golden fixture, not a round-trip
    * through the library under test. */
  private val GoldenBmp: Array[Byte] = {
    def le4(v: Int) = Seq(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xFF).toByte)
    def le2(v: Int) = Seq(v, v >> 8).map(x => (x & 0xFF).toByte)
    (Seq('B'.toByte, 'M'.toByte) ++ le4(70) ++ le4(0) ++ le4(54) ++ // file header
      le4(40) ++ le4(2) ++ le4(2) ++ le2(1) ++ le2(24) ++           // info header
      le4(0) ++ le4(16) ++ le4(2835) ++ le4(2835) ++ le4(0) ++ le4(0) ++
      // bottom row first, BGR + 2 pad bytes per row
      Seq(255, 0, 0, 255, 255, 255, 0, 0).map(_.toByte) ++   // (0,0,255) (255,255,255)
      Seq(0, 0, 255, 0, 255, 0, 0, 0).map(_.toByte)          // (255,0,0) (0,255,0)
    ).toArray
  }

  private def mediaOf(id: Long, payload: Array[Byte]): Multimodal.Media =
    Multimodal.Media(id, "image", payload, width = 9, height = 9,
      sample_rate = 0, duration_ms = 0)

  test("REAL decode: a hand-crafted golden BMP decodes to the exact sRGB bytes") {
    import spark.implicits._
    val out = Multimodal.decodeImages(spark.createDataset(
      Seq(mediaOf(1L, GoldenBmp)))).collect()
    assert(out.length == 1)
    val d = out.head
    // decoded dimensions come from the PAYLOAD, not the metadata hint
    assert((d.width, d.height, d.channels) == (2, 2, 3))
    assert(d.pixels.toSeq == GoldenRgb)
  }

  test("REAL decode: a lossless PNG of the golden image recovers the same bytes") {
    import spark.implicits._
    // PNG is lossless, so an independently-encoded PNG of the golden
    // raster must decode to the identical sRGB array
    val im = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    im.setRGB(0, 0, 0xFF0000); im.setRGB(1, 0, 0x00FF00)
    im.setRGB(0, 1, 0x0000FF); im.setRGB(1, 1, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val out = Multimodal.decodeImages(spark.createDataset(
      Seq(mediaOf(2L, bos.toByteArray)))).collect()
    assert(out.length == 1 && out.head.channels == 3)
    assert(out.head.pixels.toSeq == GoldenRgb)
  }

  test("REAL decode: mixed batch routes per payload — codec'd real, codec-less fake") {
    import spark.implicits._
    val mixed = spark.createDataset(Seq(
      mediaOf(1L, GoldenBmp),
      mediaOf(2L, "not an image at all".getBytes("UTF-8"))))
    val out = Multimodal.decodeImages(mixed).collect().sortBy(_.media_id)
    assert(out.map(_.channels).toSeq == Seq(3, 1))
    assert(out(1).pixels.length == 9 * 9) // fake: metadata-sized, 1-channel
  }

  test("resize plan: aspect-preserving, never upscales, pixels pruned") {
    val resized = Multimodal.resizePlan(
      Multimodal.decodeImages(Multimodal.mediaTable(spark, Dir)), maxSide = 128)
    assert(!resized.columns.contains("pixels"))
    val rows = resized.collect()
    assert(rows.forall(r => r.getAs[Int]("out_w") <= 128 && r.getAs[Int]("out_h") <= 128))
    assert(rows.forall(r => r.getAs[Int]("out_w") <= r.getAs[Int]("width")))
  }

  test("frame sampling: k evenly spaced offsets within duration") {
    val fr = Multimodal.frameOffsets(Multimodal.mediaTable(spark, Dir), k = 4).collect()
    assert(fr.nonEmpty)
    fr.foreach { r =>
      val offs = r.getAs[scala.collection.Seq[Long]]("frame_offsets_ms").toSeq
      val dur = r.getAs[Long]("duration_ms")
      assert(offs.length == 4)
      assert(offs.head == 0L && offs.forall(o => o >= 0 && o < math.max(dur, 1)))
      assert(offs == offs.sorted)
    }
  }

  test("feature extraction: fixed dim, unit norm, all kinds") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, Dir)).collect()
    assert(feats.forall(_.embedding.length == 64))
    assert(feats.forall { f =>
      val n = math.sqrt(f.embedding.map(x => x.toDouble * x).sum)
      math.abs(n - 1.0) < 1e-3
    })
    assert(feats.map(_.kind).toSet == Set("image", "audio", "video"))
  }
}
