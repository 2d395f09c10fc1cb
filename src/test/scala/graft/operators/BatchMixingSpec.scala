package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** X97 — the batch-composition diversity histogram. Brute-force
  * recount from raw documents (lane hashing via the md5-prefix h60
  * twin): batches reform exactly as X66 forms them, per-batch distinct
  * sources counted directly, and the whole histogram compared. Plus
  * the accounting identities: histogram rows partition the batch set,
  * n_sources never exceeds the batch's doc count, and every permille
  * follows the n/total law. */
class BatchMixingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"
  private val BucketTokens = 64L
  private val MaxBucket = 15L
  private val BatchDocs = 16L
  private val BatchShards = 8L

  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("histogram equals the brute-force batch recount") {
    val docs = spark.read.parquet(s"$Dir/documents.parquet")
      .selectExpr("doc_id", "source", "size(split(text, ' ')) AS n_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong))
    val batches = docs
      .map { case (id, src, n) =>
        (math.min(n / BucketTokens, MaxBucket),
          math.floorMod(h60(s"bshard:$id"), BatchShards), id, src) }
      .groupBy(d => (d._1, d._2)).toSeq.flatMap { case (_, lane) =>
        lane.sortBy(_._3).grouped(BatchDocs.toInt).map { members =>
          (members.length.toLong, members.map(_._4).distinct.length.toLong)
        }
      }
    val total = batches.length.toLong
    val expected = batches.groupBy(_._2).toSeq.map { case (nSrc, bs) =>
      (nSrc, bs.length.toLong, bs.count(_._1 == BatchDocs).toLong,
        bs.length * 1000 / total)
    }.sortBy(_._1)
    val got = SparkEntry.queries("batch_mixing_report")(spark, Dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty)
    assert(got == expected, s"histogram diverges:\n got $got\n exp $expected")
    assert(got.map(_._2).sum == total, "rows must partition the batch set")
    got.foreach { case (nSrc, nB, nFull, pm) =>
      assert(nSrc >= 1 && nSrc <= BatchDocs, s"n_sources $nSrc out of range")
      assert(nFull <= nB, s"full-batch count exceeds row count at $nSrc")
      assert(pm == nB * 1000 / total, s"permille law broke at $nSrc")
    }
  }
}
