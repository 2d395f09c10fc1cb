package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Laws for the retrieval scorers that the DuckDB oracle alone can't
  * state: BM25's structural properties on a controlled corpus.
  */
class IndexingSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bpe_encode token counts sit between merged-everything and character count") {
    // every merge can only FUSE adjacent symbols: per doc,
    // n_words <= n_tokens <= n_chars-without-spaces, with strict
    // compression somewhere in the corpus (6 learned rules must fire)
    val enc = graft.SparkEntry.queries("bpe_encode")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bounds = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nw"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("nc"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(enc.keySet == bounds.keySet)
    enc.foreach { case (id, nt) =>
      val (nw, nc) = bounds(id)
      assert(nt >= nw && nt <= nc, s"doc $id: tokens $nt outside [$nw, $nc]")
    }
    assert(enc.exists { case (id, nt) => nt < bounds(id)._2 },
      "the learned merges must compress at least one document")
  }

  test("bpe_fertility is the exact per-language rollup of the encode pass") {
    val enc = graft.SparkEntry.queries("bpe_encode")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val langOf = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("nw"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val fert = graft.SparkEntry.queries("bpe_fertility")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(fert.keySet == langOf.values.map(_._1).toSet, "every language reports")
    fert.foreach { case (lang, (nDocs, nWords, nTokens, milli)) =>
      val docs = langOf.filter(_._2._1 == lang)
      assert(nDocs == docs.size, s"$lang: doc count")
      assert(nWords == docs.values.map(_._2).sum, s"$lang: word rollup")
      // keysIterator, NOT .keys.map: Map#keys is a Set, and mapping it
      // through enc would collapse equal token counts before the sum
      assert(nTokens == docs.keysIterator.map(enc).sum, s"$lang: token rollup")
      assert(milli == nTokens * 1000L / nWords, s"$lang: fertility law")
      // fusing can only shorten: fertility stays within [1, chars/word]
      assert(milli >= 1000L, s"$lang: fertility below one token per word")
    }
  }

  test("bm25_topk emits exactly ranks 1..k per doc, scores weakly decreasing") {
    val rows = Indexing.bm25Topk(spark, dir)
      .select("doc_id", "rank", "score").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq === (1L to byRank.length).toSeq, s"doc=$doc")
      val scores = byRank.map(_.getLong(2)).toSeq
      assert(scores === scores.sorted.reverse, s"doc=$doc scores not monotone: $scores")
      assert(scores.forall(_ >= 0), s"doc=$doc negative score")
    }
  }

  test("bm25 length normalization: same tf scores lower in a longer doc") {
    import spark.implicits._
    // two docs, both containing 'rare' once; doc 2 is 4x longer. The
    // registered query reads from parquet, so exercise the scoring
    // formula through a temp view with the same SQL shape.
    val docs = Seq(
      (1L, "rare alpha beta gamma"),
      (2L, "rare " + Seq.fill(15)("filler").mkString(" "))).toDF("doc_id", "text")
    docs.createOrReplaceTempView("bm25_docs")
    val out = spark.sql(
      s"""WITH tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM (
         |    SELECT doc_id, explode(split(text, ' ')) AS term FROM bm25_docs)
         |  GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |dl AS (SELECT doc_id, size(split(text, ' ')) AS dl FROM bm25_docs),
         |g AS (SELECT count(*) AS n,
         |             (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS tdl FROM bm25_docs)
         |SELECT tf.doc_id,
         |       CAST((CAST((n * ${Indexing.IdfScale}) div df AS DECIMAL(38,0)) * tf * 20 * tdl)
         |        div (CAST(8 AS DECIMAL(38,0)) * tf * tdl + CAST(3 AS DECIMAL(38,0)) * tdl
         |             + CAST(9 AS DECIMAL(38,0)) * dl * n) AS BIGINT) AS score
         |FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN g
         |WHERE term = 'rare'""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) > out(2L),
      s"short doc should outscore long doc at equal tf: $out")
  }
}
