package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, Tables, TestSpark}

/** Laws for the r20 corpus-audit family (percentile_rank_norm /
  * k_anonymity_audit / stopword_discovery / grouping_sets_report /
  * join_skew_diagnose) at sf0.001, brute-force recomputed driver-side.
  */
class CorpusAuditOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private lazy val docs: Seq[(Long, String, String, String, Long)] =
    Tables.documents(spark, Dir)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq

  test("percentile_rank_norm: exact strict-below rank, no corpus sort — matches brute force") {
    val rows = SparkEntry.queries("percentile_rank_norm")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.size == docs.size, "one row per document")
    val bySrc = docs.groupBy(_._4)
    rows.foreach { case (id, src, len, permille) =>
      val peers = bySrc(src).map(_._5)
      val below = peers.count(_ < len).toLong
      val expect = if (peers.size <= 1) 0L else below * 1000 / (peers.size - 1)
      assert(permille == expect, s"doc $id in $src")
    }
  }

  test("k_anonymity_audit: partition of the corpus, k=5 verdict exact") {
    val rows = SparkEntry.queries("k_anonymity_audit")(spark, Dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(rows.map(_._4).sum == docs.size, "group sizes partition the corpus")
    assert(rows.map(r => (r._1, r._2, r._3)).distinct.size == rows.size)
    val brute = docs.groupBy(d => (d._3, d._4, d._5 / 100)).view
      .mapValues(_.size.toLong).toMap
    rows.foreach { case (lang, src, bucket, n, safe) =>
      assert(n == brute((lang, src, bucket)))
      assert(safe == (n >= 5L))
    }
  }

  test("stopword_discovery: every emitted term clears the min-share gate in EVERY source") {
    val rows = SparkEntry.queries("stopword_discovery")(spark, Dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.nonEmpty, "the word-soup corpus must surface common terms")
    val srcDocs = docs.groupBy(_._4)
    val dfOf: ((String, String)) => Long = { case (src, term) =>
      srcDocs(src).count(_._2.split(" ").contains(term)).toLong
    }
    rows.foreach { case (term, minShare, dfTotal) =>
      // .toSeq: Map.keys is a runtime Set, whose map() DEDUPES equal
      // per-source df values before the sum
      val srcs = srcDocs.keys.toSeq
      val shares = srcs.map(s => dfOf((s, term)) * 1000 / srcDocs(s).size)
      assert(shares.min == minShare, s"term $term min share")
      assert(minShare >= 300L)
      assert(dfTotal == srcs.map(s => dfOf((s, term))).sum)
    }
    // completeness: no qualifying term missing
    val vocab = docs.flatMap(_._2.split(" ").distinct).distinct
    val expected = vocab.filter { t =>
      srcDocs.values.forall(ds => ds.count(_._2.split(" ").contains(t)).toLong * 1000 / ds.size >= 300)
    }.toSet
    assert(rows.map(_._1).toSet == expected)
  }

  test("grouping_sets_report: marginals re-add to the base cells, gid disambiguates") {
    val rows = SparkEntry.queries("grouping_sets_report")(spark, Dir).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2)),
        r.getLong(3), r.getLong(4))).toSeq
    val base = rows.filter(_._1 == 0L)
    val byLang = rows.filter(_._1 == 1L)
    val bySrc = rows.filter(_._1 == 2L)
    val grand = rows.filter(_._1 == 3L)
    assert(rows.map(_._1).toSet == Set(0L, 1L, 2L, 3L))
    assert(grand.size == 1 && grand.head._4 == docs.size)
    assert(base.map(_._4).sum == docs.size)
    byLang.foreach { case (_, Some(l), None, n, chars) =>
      assert(n == base.filter(_._2.contains(l)).map(_._4).sum)
      assert(chars == base.filter(_._2.contains(l)).map(_._5).sum)
    case r => fail(s"gid=1 row with wrong key shape: $r")
    }
    bySrc.foreach { case (_, None, Some(s), n, _) =>
      assert(n == base.filter(_._3.contains(s)).map(_._4).sum)
    case r => fail(s"gid=2 row with wrong key shape: $r")
    }
  }

  test("join_skew_diagnose: the true 20 heaviest keys, shares and salt sizing exact") {
    val rows = SparkEntry.queries("join_skew_diagnose")(spark, Dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.size == 20)
    // brute-force df over distinct (doc, term)
    val df = docs.flatMap(d => d._2.split(" ").distinct.map(t => (t, d._1)))
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val total = df.values.sum
    val top = df.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
    assert(rows.map(r => (r._1, r._2)) == top)
    rows.foreach { case (_, n, share, buckets) =>
      assert(share == n * 1000 / total)
      assert(buckets == (n + 1023) / 1024)
    }
    // output order: heaviest first (the report's contract)
    assert(rows.map(_._2) == rows.map(_._2).sortBy(-_))
  }
}
