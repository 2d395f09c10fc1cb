package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** X89 — the explicitly salted skew join. Two pins:
  *  1. result identity: the salted spelling must return exactly the
  *     plain unsalted join's rows (the salt is a physical rewrite, not
  *     a semantic one);
  *  2. the salt actually spreads the hot key: with the corpus's
  *     highest-df term, the salted left relation must carry all
  *     [[Indexing.SaltBuckets]] distinct sub-keys, so a shuffle
  *     hash-partitions that term's postings across S partitions by
  *     construction (what the unsalted join cannot do for a single key).
  */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"

  test("salted join result is identical to the unsalted join") {
    val got = SparkEntry.queries("salted_skew_join")(spark, Dir)
      .collect().map(_.toString).sorted.toSeq
    val docs = graft.Tables.documents(spark, Dir)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val plain = tf.join(df, "term").crossJoin(n)
      .withColumn("idf_m", expr(s"(n * ${Indexing.SaltIdfScale}) div df"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("tf").as("tok_mass"),
        sum(expr("tf * idf_m")).as("idf_mass"))
      .withColumn("specificity_permille", expr("idf_mass div tok_mass"))
      .select("doc_id", "n_terms", "tok_mass", "idf_mass", "specificity_permille")
      .collect().map(_.toString).sorted.toSeq
    assert(got == plain, "salting changed the join result")
  }

  test("the hottest term's postings spread across all salt buckets") {
    val docs = graft.Tables.documents(spark, Dir)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val hot = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term")).limit(1)
      .collect().head
    val hotTerm = hot.getString(0)
    assert(hot.getLong(1) >= 100, s"testdata lost its stopword skew: $hot")
    val spread = tf.filter(col("term") === hotTerm)
      .withColumn("salt", pmod(
        Dedup.h60(concat(lit("salt:"), col("doc_id"))),
        lit(Indexing.SaltBuckets)))
      .select("salt").distinct().count()
    assert(spread == Indexing.SaltBuckets,
      s"hot term '$hotTerm' landed in only $spread of ${Indexing.SaltBuckets} buckets")
  }
}
