package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Brute-force JVM oracle for mmr_rerank: the full pipeline (quantize →
  * relevance pool → greedy MMR) recomputed with plain Scala arrays and
  * compared exactly, plus the property the operator exists for — the
  * MMR selection's intra-set redundancy is no higher than the pure
  * relevance top-k's. */
class MmrRerankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private val Pool = 20
  private val K = 8
  private val Lp = 700L
  private val NumQ = 10

  private def quantized(): Map[Long, Array[Long]] =
    spark.read.parquet(s"$Dir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[Float](1)
          .map(x => math.floor(x.toDouble * 1000).toLong).toArray
      }.toMap

  private def dot(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  /** The expected (q_id, rank, vec_id) rows: relevance top-Pool by
    * (dot DESC, id), then the greedy with ties to the smaller id. */
  private def bruteForce(): Set[(Long, Long, Long)] = {
    val emb = quantized()
    (0L until NumQ).flatMap { q =>
      val qe = emb(q)
      val pool = emb.toSeq.filter(_._1 != q)
        .map { case (id, e) => (id, dot(qe, e), e) }
        .sortBy { case (id, s, _) => (-s, id) }.take(Pool)
      val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Array[Long])]
      (1 to K).map { rank =>
        val pick = pool.filterNot(c => selected.exists(_._1 == c._1))
          .map { case (id, simq, e) =>
            val pen = if (selected.isEmpty) 0L
              else selected.map(s => dot(e, s._3)).max
            (id, Lp * simq - (1000 - Lp) * pen, simq, e)
          }
          .minBy { case (id, score, _, _) => (-score, id) }
        selected += ((pick._1, pick._3, pick._4))
        (q, rank.toLong, pick._1)
      }
    }.toSet
  }

  test("mmr_rerank equals the brute-force greedy (pool, ties, order)") {
    val got = SparkEntry.queries("mmr_rerank")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = bruteForce()
    assert(got.size == NumQ * K)
    assert(got == expected,
      s"diff: ${(got diff expected).take(4)} / ${(expected diff got).take(4)}")
  }

  test("MMR diversifies: corpus-level redundancy below pure top-k, and the rerank is not a no-op") {
    // Per-QUERY mean pairwise similarity is NOT guaranteed lower (the
    // greedy penalizes the MAX term, traded against relevance at λ —
    // one sf0.001 query measurably inverts the mean), so the pinned
    // property is the aggregate the operator is run for: summed over
    // the query set, the MMR selections carry less intra-set
    // similarity than the relevance top-k, and differ from it
    // somewhere (the rerank does something).
    val emb = quantized()
    val got = SparkEntry.queries("mmr_rerank")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    def redundancy(ids: Seq[Long]): Long =
      ids.combinations(2).map { case Seq(a, b) => dot(emb(a), emb(b)) }.sum
    val topk = (0L until NumQ).map { q =>
      val qe = emb(q)
      q -> emb.toSeq.filter(_._1 != q)
        .map { case (id, e) => (id, dot(qe, e)) }
        .sortBy { case (id, s) => (-s, id) }.take(K).map(_._1)
    }.toMap
    val mmrTotal = (0L until NumQ).map(q => redundancy(got(q))).sum
    val topkTotal = (0L until NumQ).map(q => redundancy(topk(q))).sum
    assert(mmrTotal < topkTotal,
      s"MMR total redundancy $mmrTotal not below top-k's $topkTotal")
    assert((0L until NumQ).exists(q => got(q).toSet != topk(q).toSet),
      "MMR selected exactly the top-k everywhere — the rerank is a no-op")
  }
}
