package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Brute-force JVM oracles for the r17 mining quartet
  * (parallel_pair_mine, quality_dup_lift, pref_pair_mine,
  * topic_lexicon_assign): each query's output is recomputed from the
  * raw parquet with plain Scala collections — independent of BOTH
  * engines — and compared exactly, plus the structural invariants the
  * scaladocs claim (injected-pair containment, contingency identities,
  * tie determinism).
  */
class MiningOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  /** JVM twin of Dedup.h60: first 15 hex chars of md5, parsed base-16
    * (60 bits, non-negative). */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }
  private def score(text: String): Long =
    text.split(" ", -1).map(t => Featurize.weight((h60(t) % 16).toInt)).sum

  private def docs() = spark.read.parquet(s"$Dir/documents.parquet")
    .select("doc_id", "text", "lang", "source").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  private val Rot = Map("de" -> "en", "en" -> "es", "es" -> "fr",
    "fr" -> "zh", "zh" -> "de")

  test("parallel_pair_mine: cross-lang only, injected candidates contained, langs attributed exactly") {
    val got = SparkEntry.queries("parallel_pair_mine")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.nonEmpty)
    // lang map over the near-dup corpus: originals keep lang, the
    // ReKeyA band rotates it
    val langOf = docs().flatMap { case (id, _, lang, _) =>
      Seq(id -> lang, (id + Dedup.ReKeyA) -> Rot(lang))
    }.toMap
    got.foreach { case (a, b, la, lb) =>
      assert(la != lb, s"same-lang pair ($a, $b) survived the filter")
      assert(langOf(a) == la && langOf(b) == lb,
        s"pair ($a, $b): lang attribution ($la, $lb) != (${langOf(a)}, ${langOf(b)})")
    }
    // every original→copy LSH candidate is cross-lang by construction
    // and must appear
    val candidates = SparkEntry.queries("minhash_lsh_candidates")(spark, Dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val injected = candidates.filter { case (a, b) => b - a == Dedup.ReKeyA }
    val gotPairs = got.map { case (a, b, _, _) => (a, b) }.toSet
    assert(injected.nonEmpty, "testdata lost its injected near-dup candidates")
    injected.foreach { p =>
      assert(gotPairs.contains(p), s"injected candidate $p missing from mined pairs")
    }
  }

  test("quality_dup_lift equals the brute-force contingency; identities hold") {
    val labels = SparkEntry.queries("near_dup_cluster")(spark, Dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the near-dup corpus: originals + first-word-dropped ReKeyA copies
    val nd = docs().flatMap { case (id, text, _, _) =>
      Seq(id -> text, (id + Dedup.ReKeyA) -> text.substring(text.indexOf(' ') + 1))
    }
    val cells = nd.groupBy { case (id, text) =>
      (labels(id) != id, score(text) >= 0)
    }.map { case (k, v) => k -> v.size.toLong }
    val classTotals = cells.groupBy(_._1._1)
      .map { case (sh, m) => sh -> m.values.sum }
    val expected = cells.map { case ((sh, keep), n) =>
      (sh, keep, n, n * 1000L / classTotals(sh))
    }.toSet
    val got = SparkEntry.queries("quality_dup_lift")(spark, Dir).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == expected,
      s"contingency diverges:\n got ${got.toSet}\n exp $expected")
    assert(got.map(_._3).sum == 2L * docs().length,
      "cells must partition the doubled corpus")
    // per-class permille sums: exact 1000 less at most 1 floor loss/cell
    got.groupBy(_._1).foreach { case (sh, rows) =>
      val s = rows.map(_._4).sum
      assert(s >= 1000 - rows.length && s <= 1000, s"class $sh permille sum $s")
    }
  }

  test("pref_pair_mine equals the brute-force stratum argmax/argmin with tie rules") {
    val expected = docs().groupBy { case (_, _, lang, source) => (source, lang) }
      .flatMap { case ((source, lang), ds) =>
        val scored = ds.map { case (id, text, _, _) => (id, score(text)) }
        val (cid, cs) = scored.minBy { case (id, s) => (-s, id) }
        val (rid, rs) = scored.minBy { case (id, s) => (s, id) }
        val margin = cs - rs
        if (margin > 0)
          Some((source, lang, cid, rid, margin, ds.length.toLong))
        else None
      }.toSet
    val got = SparkEntry.queries("pref_pair_mine")(spark, Dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got.nonEmpty)
    assert(got == expected, s"pref pairs diverge:\n got $got\n exp $expected")
    got.foreach { case (_, _, cid, rid, margin, _) =>
      assert(cid != rid && margin > 0)
    }
  }

  test("topic_lexicon_assign equals the brute-force lexicon argmax") {
    val lex = Seq(
      "relational" -> Set("table", "row", "column", "join", "key", "query"),
      "streaming" -> Set("stream", "batch", "window", "group"),
      "perf" -> Set("fast", "slow", "big", "small"),
      "storage" -> Set("scan", "sort", "hash", "merge"))
    val expected = docs().map { case (id, text, _, _) =>
      val toks = text.split(" ", -1)
      val cs = lex.map { case (_, ws) => toks.count(ws).toLong }
      val hits = cs.max
      val topic = if (hits == 0) "none"
      else lex(cs.indexWhere(_ == hits))._1 // first max wins = CASE order
      (id, topic, hits, cs.sum * 1000L / toks.length)
    }.toSet
    val got = SparkEntry.queries("topic_lexicon_assign")(spark, Dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected,
      s"topic assignment diverges (first mismatch: ${(got -- expected).take(3)})")
    // the synthetic vocabulary covers all four lexicons — each topic
    // should win somewhere, or the operator is degenerate on testdata
    assert(got.map(_._2).intersect(lex.map(_._1).toSet).size == 4)
  }
}
