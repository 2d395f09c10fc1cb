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
    assert(d1.forall(d => d.pixels.length == d.width * d.height))
    // partitioning must not change results (kernel is per-row pure)
    assert(d1.map(_.media_id).toSeq == d2.map(_.media_id).toSeq)
    assert(d1.zip(d2).forall { case (a, b) => a.pixels.toSeq == b.pixels.toSeq })
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
