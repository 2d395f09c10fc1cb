package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup.{h60, h60Duck}

/** Training-data curation operators over `documents`: benchmark
  * contamination detection and deterministic stratified sampling — the
  * two passes that sit between dedup/quality-filtering and the final
  * training mix in a large-scale data pipeline.
  */
object Curation {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------------
  // 1. benchmark_contamination — test-set n-gram overlap detection
  // ---------------------------------------------------------------------

  private val ContamN = 5 // n-gram width; real pipelines run 8–13-grams

  /** Word n-grams of width [[ContamN]], distinct per doc. */
  private def ngrams(df: DataFrame): DataFrame =
    df.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= ContamN)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"transform(sequence(0, size(words) - $ContamN), " +
          s"i -> concat_ws(' ', ${(0 until ContamN).map(j => s"words[i + $j]").mkString(", ")}))")))
        .as("ng"))
  private def ngramsSql(rel: String): String =
    s"""(SELECT doc_id, unnest(list_distinct(
       |   list_transform(range(1, len(words) - ${ContamN - 2}),
       |     i -> ${(0 until ContamN).map(j => s"words[i + $j]").mkString(" || ' ' || ")}))) AS ng
       | FROM (SELECT doc_id, string_split(text, ' ') AS words FROM $rel)
       | WHERE len(words) >= $ContamN)""".stripMargin

  /** Benchmark contamination: flag corpus docs sharing any word
    * [[ContamN]]-gram with the benchmark set (stand-in: every 20th doc
    * — in production, the held-out eval suites), with the count of
    * distinct shared n-grams as the contamination score. The sf* docs
    * are unique, so the corpus includes a synthesized LEAK — re-crawled
    * copies of benchmark docs with the first word dropped (new id) —
    * the way test-set text actually shows up in a crawl; this keeps
    * the positive path provably exercised, same practice as the dedup
    * operators' re-crawl unions.
    *
    * Scale shape: the benchmark n-gram relation is SMALL by nature
    * (eval suites are fixed-size while the corpus grows), so the inner
    * join hashes the corpus stream against it — the planner broadcasts
    * from stats rather than a forced hint, and the count is a map-side-
    * combinable hash aggregate. The corpus side streams once; nothing
    * is ever corpus×corpus.
    */
  val benchmarkContamination: Q = (spark, dir) => {
    val d = Tables.documents(spark, dir).select("doc_id", "text")
    val benchDocs = d.filter(col("doc_id") % 20 === 0)
    val bench = ngrams(benchDocs).select(col("ng")).distinct()
    val leaked = benchDocs.select((col("doc_id") + 100000).as("doc_id"),
      expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val corpus = ngrams(d.filter(col("doc_id") % 20 =!= 0).unionByName(leaked))
    corpus.join(bench, "ng")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }
  val benchmarkContaminationSql: String =
    s"""WITH bench AS (
       |  SELECT DISTINCT ng FROM ${ngramsSql("(SELECT * FROM documents WHERE doc_id % 20 = 0)")}),
       |corpus AS (
       |  SELECT doc_id, ng FROM ${ngramsSql(
      """(SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 0
        |   UNION ALL
        |   SELECT doc_id + 100000 AS doc_id, substr(text, strpos(text, ' ') + 1) AS text
        |   FROM documents WHERE doc_id % 20 = 0)""".stripMargin)})
       |SELECT doc_id, count(*) AS n_shared
       |FROM corpus JOIN bench USING (ng)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // 2. stratified_sample — deterministic per-stratum downsampling
  // ---------------------------------------------------------------------

  /** per-mille keep rates by language; unlisted strata use the default.
    * The mix weights a training-data recipe assigns per source/lang. */
  private val RatePerMille: Seq[(String, Int)] =
    Seq("en" -> 500, "de" -> 300, "fr" -> 250)
  private val DefaultPerMille = 100

  /** Stratified sampling: keep each doc iff
    * `h60(lang || ':' || doc_id) mod 1000 < rate(lang)` — a
    * content-keyed hash coin, so the sample is reproducible across
    * runs, engines, and partitionings (`rand()` is none of those), and
    * joins of independently-sampled tables stay consistent. Pure
    * projection+filter: no shuffle, fully pushed down, and the sample
    * decision parallelizes row-wise at any scale. Emits the bucket so
    * the oracle check pins the arithmetic, not just the membership.
    */
  val stratifiedSample: Q = (spark, dir) => {
    val rate = RatePerMille.foldLeft(lit(DefaultPerMille)) {
      case (acc, (lang, r)) => when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    Tables.documents(spark, dir)
      .withColumn("bucket", pmod(h60(concat(col("lang"), lit(":"), col("doc_id"))), lit(1000)))
      .withColumn("rate", rate)
      .filter(col("bucket") < col("rate"))
      .select(col("doc_id"), col("lang"), col("bucket").cast("long").as("bucket"),
        col("rate").cast("long").as("rate"))
      .orderBy("doc_id")
  }
  val stratifiedSampleSql: String = {
    val rateSql = RatePerMille.foldRight(DefaultPerMille.toString) {
      case ((lang, r), acc) => s"CASE WHEN lang = '$lang' THEN $r ELSE $acc END"
    }
    s"""SELECT doc_id, lang, bucket, rate FROM (
       |  SELECT doc_id, lang,
       |         ${h60Duck("lang || ':' || CAST(doc_id AS VARCHAR)")} % 1000 AS bucket,
       |         $rateSql AS rate
       |  FROM documents)
       |WHERE bucket < rate ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "benchmark_contamination" -> benchmarkContamination,
    "stratified_sample" -> stratifiedSample,
  )
  val oracles: Map[String, String] = Map(
    "benchmark_contamination" -> benchmarkContaminationSql,
    "stratified_sample" -> stratifiedSampleSql,
  )
}
