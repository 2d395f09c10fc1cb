package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** X96 — the three-policy padding bill. The whole report is brute-force
  * recomputed from raw documents (lane hashing via the md5-prefix h60
  * twin), and the policy ordering the operator exists to demonstrate is
  * asserted: concat packing wastes less than one sequence TOTAL,
  * bucketed batching never beats concat but always beats pad-to-max
  * (on any corpus whose lengths vary), and every util_permille follows
  * the tok/(tok+pad) law. */
class PackEfficiencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"
  private val BucketTokens = 64L
  private val MaxBucket = 15L
  private val BatchDocs = 16L
  private val BatchShards = 8L
  private val SeqLen = 256L

  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def report(): Map[String, (Long, Long, Long, Long)] =
    SparkEntry.queries("pack_efficiency_report")(spark, Dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("all three policies equal the brute-force bill from raw documents") {
    val docs = spark.read.parquet(s"$Dir/documents.parquet")
      .selectExpr("doc_id", "size(split(text, ' ')) AS n_tokens").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val n = docs.length.toLong
    val tok = docs.map(_._2).sum
    val gmax = docs.map(_._2).max
    val bucketPad = docs
      .map { case (id, nt) =>
        (math.min(nt / BucketTokens, MaxBucket),
          math.floorMod(h60(s"bshard:$id"), BatchShards), id, nt) }
      .groupBy(d => (d._1, d._2)).toSeq.flatMap { case (_, lane) =>
        lane.sortBy(_._3).grouped(BatchDocs.toInt).map { members =>
          val ns = members.map(_._4)
          ns.length * ns.max - ns.sum
        }
      }.sum
    val concatSeqs = (tok + SeqLen - 1) / SeqLen
    val got = report()
    assert(got.keySet == Set("bucket_batch", "concat_pack", "pad_to_max"))
    assert(got("pad_to_max") ==
      (n, tok, n * gmax - tok, tok * 1000 / (n * gmax)), s"pad_to_max: $got")
    assert(got("bucket_batch") ==
      (n, tok, bucketPad, tok * 1000 / (tok + bucketPad)), s"bucket_batch: $got")
    assert(got("concat_pack") ==
      (concatSeqs, tok, concatSeqs * SeqLen - tok,
        tok * 1000 / (concatSeqs * SeqLen)), s"concat_pack: $got")
  }

  test("the policy ordering the report exists to demonstrate") {
    val got = report()
    val (concat, bucket, naive) =
      (got("concat_pack"), got("bucket_batch"), got("pad_to_max"))
    // concat packing's TOTAL waste is bounded by one sequence — the
    // scale argument: it does not grow with the corpus
    assert(concat._3 < SeqLen, s"concat pad ${concat._3} ≥ one sequence")
    // bucketing pays at least concat's bill, naive pays at least
    // bucketing's (equality only on degenerate equal-length corpora)
    assert(concat._3 <= bucket._3 && bucket._3 <= naive._3,
      s"policy ordering broke: $got")
    // util follows the tok/(tok+pad) law on every row
    got.values.foreach { case (_, tot, pad, util) =>
      assert(util == tot * 1000 / (tot + pad), s"util law broke: $got") }
  }
}
