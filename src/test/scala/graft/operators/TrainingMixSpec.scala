package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Invariants of the training-mix passes that the oracle hash can't
  * state directly: packing is gapless within a shard, offsets respect
  * the chunk contract, and resampling keeps the rarest language whole.
  */
class TrainingMixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  test("sequence_pack: offsets in range, per-shard token stream is gapless") {
    val rows = TrainingMix.sequencePack(spark, Dir)
      .select("doc_id", "shard", "n_tokens", "seq_in_shard", "tok_offset")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, seq, off) =>
      assert(seq >= 0 && off >= 0 && off < 256)
    }
    // within a shard, each doc's global start = previous doc's start + its
    // tokens (concat-then-chunk leaves no gaps and no overlaps)
    rows.groupBy(_._2).values.foreach { docs =>
      val inOrder = docs.sortBy(_._1)
      inOrder.zip(inOrder.scanLeft(0L) { case (acc, (_, _, n, _, _)) => acc + n })
        .foreach { case ((_, _, _, seq, off), expectedStart) =>
          assert(seq == expectedStart / 256 && off == expectedStart % 256)
        }
    }
  }

  test("global_row_index: bucket is an integer LONG bounded by IndexBuckets") {
    val docs = graft.Tables.documents(spark, Dir).select("doc_id", "lang")
    val bucketed = TrainingMix.rangeBucketed(docs)
    // true division would make this a DOUBLE with ~one distinct value
    // per doc — the offsets relation (and its global prefix-sum window)
    // must stay IndexBuckets-sized, not corpus-sized
    assert(bucketed.schema("bucket").dataType ==
      org.apache.spark.sql.types.LongType)
    val distinctBuckets = bucketed.select("bucket").distinct().count()
    assert(distinctBuckets <= TrainingMix.IndexBuckets,
      s"$distinctBuckets buckets > IndexBuckets=${TrainingMix.IndexBuckets}")
    assert(distinctBuckets > 1, "harness data must exercise multi-bucket offsets")
    val Seq(lo, hi) = bucketed.agg(min(col("bucket")), max(col("bucket")))
      .collect().head.toSeq.map(_.asInstanceOf[Long])
    assert(lo >= 0 && hi < TrainingMix.IndexBuckets)
  }

  test("temperature_resample: rarest language keeps everything, head is downsampled") {
    val docs = graft.Tables.documents(spark, Dir)
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rarest = counts.minBy { case (l, n) => (n, l) }._1
    val kept = TrainingMix.temperatureResample(spark, Dir)
      .groupBy("lang").agg(count(lit(1)).as("n"), first("threshold").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(kept(rarest)._2 == 1000L, "rarest language threshold must be 1000 per mille")
    assert(kept(rarest)._1 == counts(rarest), "rarest language must keep every doc")
    counts.foreach { case (l, n) =>
      // every language's keep count is bounded by its per-mille threshold
      // (hash coin is uniform, not exact — only the upper bound is certain)
      assert(kept.get(l).forall(_._1 <= n))
    }
  }

  test("split_contamination: planted leak yields the golden positive rows") {
    import spark.implicits._
    // ids 1..300 under the split hash coin: eval docs are exactly
    // {53 (val), 59 (val), 211 (test), 274 (val)}; only 274 is even →
    // marked with the leak phrase, alongside 6 marked train docs
    // (ids % 50 == 0 in the train split). Every doc's own words are
    // globally unique, so the ONLY cross-split sharing is the marker's
    // 6 interior 5-grams: golden expectation (274, 'val', 6), and the
    // three unmarked eval docs exercise the negative path (no row).
    val docs = (1 to 300).map { id =>
      (id.toLong, (0 until 12).map(j => s"w${id}x$j").mkString(" "))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-leak").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = TrainingMix.splitContamination(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(got == List((274L, "val", 6L)), s"got $got")
  }

  test("dsir_select: keep flag is the mean threshold, scores are bounded, " +
    "and the target language scores above the rest") {
    val rows = TrainingMix.dsirSelect(spark, Dir)
      .select("doc_id", "lang", "importance", "gram_mean", "keep")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    val gramMean = rows.head._4
    rows.foreach { case (id, _, imp, gm, keep) =>
      assert(gm == gramMean, s"gram_mean must be a corpus constant (doc $id)")
      // ratio numerator ≤ denominator (target ⊆ raw) keeps every
      // per-gram ratio — and so the per-doc mean — within the scale
      assert(imp >= 0L && imp <= 1000000L, s"doc $id importance $imp out of range")
      assert(keep == (imp >= gm), s"doc $id keep flag diverges from threshold")
    }
    // the method must actually discriminate: target-language docs score
    // higher ON AVERAGE than the rest (per-doc overlap is expected —
    // formulaic non-target docs can share hashed buckets)
    val (en, rest) = rows.partition(_._2 == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    val enMean = en.map(_._3).sum.toDouble / en.size
    val restMean = rest.map(_._3).sum.toDouble / rest.size
    assert(enMean > restMean,
      f"target-domain mean $enMean%.0f must exceed non-target $restMean%.0f")
    // and both classes must appear on the keep side's complement too —
    // a selector that keeps everything (or nothing) is degenerate
    assert(rows.exists(_._5) && rows.exists(!_._5))
  }
}
