package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Winnowing's defining guarantee (Schleimer et al. 2003, Thm. in §4):
  * two documents sharing a substring of at least k+w−1 tokens share at
  * least one fingerprint. Exercised through the REGISTERED query over
  * a synthetic documents.parquet (planted shared runs), so the law
  * covers the exact spelling the oracle checks, not a test-local
  * re-derivation. */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val K = 4
  private val W = 4 // must mirror TextAnalysis.WinnowK/W

  test("a planted k+w-1-token shared run yields a shared fingerprint; short docs none") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    def tok() = "t" + rng.nextInt(5000)
    // 30 pairs: doc 2i has random tokens, doc 2i+1 embeds a 7-token run
    // copied from doc 2i at a random offset
    val docs = (0 until 30).flatMap { i =>
      val a = Vector.fill(20 + rng.nextInt(30))(tok())
      val start = rng.nextInt(a.size - (K + W - 1))
      val shared = a.slice(start, start + K + W - 1)
      val bPre = Vector.fill(5 + rng.nextInt(10))(tok())
      val bPost = Vector.fill(5 + rng.nextInt(10))(tok())
      Seq((2L * i, a.mkString(" ")), (2L * i + 1, (bPre ++ shared ++ bPost).mkString(" ")))
    } :+ (999L, "only six tokens in this doc") // 6 < k+w-1: no fingerprints
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fps = SparkEntry.queries("winnow_fingerprints")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0 until 30).foreach { i =>
      val a = fps.getOrElse(2L * i, Set.empty)
      val b = fps.getOrElse(2L * i + 1, Set.empty)
      assert(a.nonEmpty && b.nonEmpty, s"pair $i: both docs must fingerprint")
      assert((a intersect b).nonEmpty,
        s"pair $i: shared ${K + W - 1}-token run must share a fingerprint")
    }
    assert(!fps.contains(999L), "a doc shorter than k+w-1 tokens has no fingerprints")
  }
}
