package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Laws for the r17 embedding-side mining pair beyond the oracle hash:
  * hard negatives really are nearest-by-distance among DIFFERENT-label
  * vectors (brute-force Scala recomputation on the same quantization),
  * and the cluster-balanced sample respects its quota, draws only from
  * real cluster members, and covers every cluster the assignment
  * produces. */
class SemanticMiningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private def quantized(): Map[Long, (Long, Array[Long])] =
    graft.Tables.embeddings(spark, Dir)
      .select("vec_id", "label", "embedding").collect()
      .map { r =>
        val q = r.getSeq[Float](2).map(x =>
          math.floor(x.toDouble * 1e6).toLong + 1000000L).toArray
        r.getLong(0) -> (r.getInt(1).toLong, q)
      }.toMap

  test("hard negatives equal the brute-force different-label top-k") {
    val vecs = quantized()
    def d(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val want = vecs.keys.filter(_ < 10L).toSeq.sorted.flatMap { qid =>
      val (qLabel, qq) = vecs(qid)
      vecs.toSeq
        .filter { case (vid, (l, _)) => vid != qid && l != qLabel }
        .map { case (vid, (_, cq)) => (d(qq, cq), vid) }
        .sorted.take(Semantic.HardNegK).zipWithIndex
        .map { case ((dist, vid), i) => (qid, (i + 1).toLong, vid, dist) }
    }
    val got = SparkEntry.queries("hard_negative_mine")(spark, Dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty)
    assert(got == want, "mined negatives diverge from brute force")
    // and the defining property, independently of ranking: no negative
    // shares its anchor's label
    got.foreach { case (qid, _, vid, _) =>
      assert(vecs(vid)._1 != vecs(qid)._1, s"negative $vid shares label with anchor $qid")
    }
  }

  test("knn label eval equals brute force; packed ids stay order-isomorphic") {
    val vecs = quantized()
    // the id-packing trick (vec_id·16 + label) is order-isomorphic to
    // vec_id ONLY while labels fit 4 bits — assert the data contract
    vecs.values.foreach { case (l, _) => assert(l >= 0 && l < 16) }
    def d(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val want = vecs.keys.filter(_ < 10L).toSeq.sorted.map { qid =>
      val (qLabel, qq) = vecs(qid)
      val top = vecs.toSeq.filter(_._1 != qid)
        .map { case (vid, (l, cq)) => (d(qq, cq), vid, l) }
        .sortBy(t => (t._1, t._2)).take(Semantic.KnnK)
      val votes = top.groupBy(_._3).view.mapValues(_.size).toSeq
      val pred = votes.maxBy { case (l, n) => (n, -l) }._1
      (qid, qLabel, pred, qLabel == pred)
    }
    val got = SparkEntry.queries("knn_label_eval")(spark, Dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == want, "kNN vote diverges from brute force")
  }

  test("decontam drops exactly the injected leaks on random embeddings") {
    val rows = SparkEntry.queries("embedding_decontam")(spark, Dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    val dropped = rows.filter(!_._3).map(_._1).toSet
    // the injected leaks: re-keyed copies of even-id eval vectors —
    // each matches its source exactly (cos = 1 > τ); random vectors
    // never reach τ = 0.9, so the drop set is exactly the leak set
    val wantDropped = (0L until Semantic.EvalN).filter(_ % 2 == 0)
      .map(_ + Dedup.ReKeyA).toSet
    assert(dropped == wantDropped,
      s"drop set diverges: extra=${dropped -- wantDropped} missing=${wantDropped -- dropped}")
    rows.foreach { case (_, n, keep) => assert(keep == (n == 0L)) }
  }

  test("cluster sample: quota respected, members real, every cluster covered") {
    val assignRows = SparkEntry.queries("kmeans_assign")(spark, Dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap // vec_id -> cluster
    val got = SparkEntry.queries("cluster_balanced_sample")(spark, Dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    val byCluster = got.groupBy(_._1)
    // every cluster that has members appears, and vice versa
    assert(byCluster.keySet == assignRows.values.toSet)
    byCluster.foreach { case (c, rows) =>
      val members = assignRows.filter(_._2 == c).keySet
      assert(rows.length <= Semantic.ClusterQuota, s"cluster $c exceeds quota")
      assert(rows.length == math.min(Semantic.ClusterQuota, members.size),
        s"cluster $c under-fills its quota")
      rows.foreach { case (_, rank, vid, nTotal) =>
        assert(members.contains(vid), s"pick $vid is not a member of cluster $c")
        assert(nTotal == members.size.toLong, s"n_total wrong for cluster $c")
        assert(rank >= 1 && rank <= Semantic.ClusterQuota)
      }
      // ranks are 1..n contiguous
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length.toLong).toSeq)
    }
  }
}
