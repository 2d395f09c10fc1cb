package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** X86 — weighted without-replacement sampling (sequential Poisson).
  * The whole sample is re-derived brute-force in the driver from the
  * raw parquet (independent md5 path, scala.math ordering, no Spark
  * expressions), and two laws are pinned: the sample must actually be
  * size-biased (mean sampled n_chars above the corpus mean — otherwise
  * the weight did nothing and the op is just reservoir_sample), and
  * the bounded-heap aggregation must be partitioning-invariant.
  */
class WeightedSampleSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  private def brute(): Seq[(String, Long, Long, Long)] = {
    val docs = graft.Tables.documents(spark, Dir)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter(_._3 > 0)
    docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.map { case (_, id, w) =>
        val u = h60(s"wor:$id") % (1L << 30) + 1
        (u * 1000000L / w, id)
      }.sorted.take(24).zipWithIndex.map { case ((pri, id), i) =>
        (src, i + 1L, id, pri)
      }
    }.sortBy(t => (t._1, t._2))
  }

  test("sample equals the brute-force priority order, and is size-biased") {
    val got = SparkEntry.queries("weighted_sample_wor")(spark, Dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val exp = brute()
    assert(got == exp, s"first diff: ${got.zip(exp).find(p => p._1 != p._2)}")

    val byDoc = graft.Tables.documents(spark, Dir)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val corpusMean = byDoc.values.sum.toDouble / byDoc.size
    val sampleMean = got.map(t => byDoc(t._3)).sum.toDouble / got.size
    assert(sampleMean > corpusMean,
      s"weighted sample must skew long: sample $sampleMean vs corpus $corpusMean")
  }

  test("bounded-heap sampling is partitioning-invariant") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, Dir)
      .select("source", "doc_id", "n_chars")
    val base = Curation.weightedSampleWorCore(docs)
      .collect().map(_.toString).toSeq
    for (p <- Seq(1, 7, 63)) {
      val got = Curation.weightedSampleWorCore(
        docs.repartition(p, col("doc_id")))
        .collect().map(_.toString).toSeq
      assert(got == base, s"partitioning $p changed the sample")
    }
    // every sf* source holds > K docs, so each returns exactly K rows
    val perSrc = base.map(_.split(",").head).groupBy(identity).view.mapValues(_.size)
    perSrc.foreach { case (s, n) => assert(n == 24, s"source $s returned $n") }
  }
}
