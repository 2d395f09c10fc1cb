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

  // ------------------------------------------------------------------
  // REAL audio decode path (javax.sound.sampled) — golden fixtures
  // ------------------------------------------------------------------

  /** Golden PCM: 4 frames of 16-bit stereo, channel-interleaved —
    * chosen to exercise sign, extremes, and byte order. */
  private val GoldenPcm: Seq[Short] = Seq[Short](
    0, -1, 32767, -32768, 256, -257, 12345, -12345)

  /** The same samples as a HAND-CRAFTED RIFF/WAVE file (PCM16 LE,
    * 2 channels, 8000 Hz) — a true golden fixture, not a round-trip
    * through the library under test. */
  private val GoldenWav: Array[Byte] = {
    def le4(v: Int) = Seq(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xFF).toByte)
    def le2(v: Int) = Seq(v, v >> 8).map(x => (x & 0xFF).toByte)
    val data = GoldenPcm.flatMap(s => le2(s & 0xFFFF))
    ("RIFF".getBytes("US-ASCII").toSeq ++ le4(36 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le4(16) ++
      le2(1) ++ le2(2) ++ le4(8000) ++ le4(8000 * 2 * 2) ++ // PCM, stereo, byte rate
      le2(4) ++ le2(16) ++                                  // block align, bits
      "data".getBytes("US-ASCII") ++ le4(data.length) ++ data).toArray
  }

  private def audioOf(id: Long, payload: Array[Byte]): Multimodal.Media =
    Multimodal.Media(id, "audio", payload, width = 0, height = 0,
      sample_rate = 16000, duration_ms = 50)

  test("REAL audio decode: a hand-crafted golden WAV decodes to the exact PCM16 samples") {
    import spark.implicits._
    val out = Multimodal.decodeAudio(spark.createDataset(
      Seq(audioOf(1L, GoldenWav)))).collect()
    assert(out.length == 1)
    val d = out.head
    // decoded format comes from the PAYLOAD header, not the metadata hint
    assert((d.sample_rate, d.channels, d.n_frames) == (8000, 2, 4L))
    assert(d.pcm.toSeq == GoldenPcm)
  }

  test("REAL audio decode: an independently AudioSystem-encoded WAV recovers the same samples") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // PCM is lossless: encoding the golden samples through the JDK's
    // writer (big-endian this time, so the endianness branch is hit)
    // must decode back to the identical interleaved array
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 2, 4, 8000f, /*bigEndian=*/ true)
    val raw = GoldenPcm.flatMap(s =>
      Seq(((s >> 8) & 0xFF).toByte, (s & 0xFF).toByte)).toArray
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, 4), AudioFileFormat.Type.AIFF, bos)
    val out = Multimodal.decodeAudio(spark.createDataset(
      Seq(audioOf(2L, bos.toByteArray)))).collect()
    assert(out.length == 1 && out.head.channels == 2)
    assert(out.head.pcm.toSeq == GoldenPcm)
  }

  test("REAL audio decode: mixed batch routes per payload — readable real, codec-less fake") {
    import spark.implicits._
    val mixed = spark.createDataset(Seq(
      audioOf(1L, GoldenWav),
      audioOf(2L, "not audio at all".getBytes("UTF-8"))))
    val out = Multimodal.decodeAudio(mixed).collect().sortBy(_.media_id)
    assert(out.map(_.sample_rate).toSeq == Seq(8000, 16000)) // payload vs metadata
    // fake: metadata-sized mono (duration_ms * rate / 1000 frames)
    assert(out(1).channels == 1 && out(1).n_frames == 800L)
    assert(out(1).pcm.length == 800)
  }

  test("audio decode stage: deterministic across partitionings on the harness corpus") {
    val media = Multimodal.mediaTable(spark, Dir)
    val d1 = Multimodal.decodeAudio(media).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeAudio(media.repartition(7)).collect().sortBy(_.media_id)
    assert(d1.nonEmpty)
    // text-byte payloads have no JVM audio reader: all take the fake,
    // whose size contract is the metadata duration
    assert(d1.forall(d => d.pcm.length == d.n_frames * d.channels))
    assert(d1.map(_.media_id).toSeq == d2.map(_.media_id).toSeq)
    assert(d1.zip(d2).forall { case (a, b) => a.pcm.toSeq == b.pcm.toSeq })
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
