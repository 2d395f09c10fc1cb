package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Batching mechanics the oracle hash states only implicitly: the whole
  * report is brute-force recomputed from raw documents (lane hashing
  * included, via the same md5-prefix h60 definition), batches respect
  * the bucket's length band and the fixed doc count (only a lane's
  * last batch runs short), and the pad bill is the exact
  * n_docs·max − Σ identity. */
class LengthBucketSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"
  private val BucketTokens = 64L
  private val MaxBucket = 15L
  private val BatchDocs = 16L
  private val BatchShards = 8L

  /** Driver-side twin of Dedup.h60 (md5 hex prefix as a 60-bit int). */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("report equals the brute-force batching of raw documents") {
    val docs = spark.read.parquet(s"$Dir/documents.parquet")
      .selectExpr("doc_id", "size(split(text, ' ')) AS n_tokens").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val expected = docs
      .map { case (id, n) =>
        (math.min(n / BucketTokens, MaxBucket),
          math.floorMod(h60(s"bshard:$id"), BatchShards), id, n)
      }
      .groupBy(d => (d._1, d._2)).toSeq.flatMap { case ((bucket, shard), lane) =>
        lane.sortBy(_._3).zipWithIndex
          .groupBy(_._2 / BatchDocs).map { case (batch, members) =>
            val ns = members.map(_._1._4)
            (bucket, shard, batch.toLong, ns.length.toLong, ns.max,
              ns.length * ns.max - ns.sum)
          }
      }.toSet
    val got = SparkEntry.queries("length_bucket_batches")(spark, Dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got.nonEmpty)
    assert(got == expected,
      s"report diverges from brute-force batching:\n only-got ${(got diff expected).take(3)}" +
        s"\n only-exp ${(expected diff got).take(3)}")
  }

  test("batches are full except lane tails, and stay inside their length band") {
    val rows = SparkEntry.queries("length_bucket_batches")(spark, Dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (bucket, shard, batch, nDocs, seqLen, pad) =>
      assert(nDocs >= 1 && nDocs <= BatchDocs, s"($bucket,$shard,$batch): $nDocs docs")
      assert(pad >= 0 && pad <= nDocs * seqLen, s"($bucket,$shard,$batch): pad $pad")
      // the batch's max length sits inside its bucket's band (the cap
      // bucket is unbounded above by design)
      assert(seqLen >= bucket * BucketTokens,
        s"($bucket,$shard,$batch): seq_len $seqLen below band")
      if (bucket < MaxBucket)
        assert(seqLen < (bucket + 1) * BucketTokens,
          s"($bucket,$shard,$batch): seq_len $seqLen above band")
      // a batch pads at most (BucketTokens-1) per doc inside a band —
      // the efficiency guarantee bucketing exists for
      if (bucket < MaxBucket)
        assert(pad <= nDocs * (BucketTokens - 1),
          s"($bucket,$shard,$batch): pad $pad breaks the band bound")
    }
    // only the LAST batch of a lane may run short
    rows.groupBy(r => (r._1, r._2)).foreach { case ((bucket, shard), lane) =>
      val sorted = lane.sortBy(_._3)
      sorted.init.foreach { case (_, _, batch, nDocs, _, _) =>
        assert(nDocs == BatchDocs,
          s"($bucket,$shard,$batch): non-tail batch has $nDocs docs")
      }
    }
  }
}
