package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** X83 — the lang-ID confusion matrix. The report must be the full
  * label × class lattice whose marginals are accounting identities, and
  * its cells must agree with an independent recount over the doc-level
  * `lang_id_ngram` listing (the two queries share the scoring core;
  * this checks the rollup didn't drop or double-count anything).
  */
class LangConfusionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.01"

  test("full lattice, marginal identities, cells match a doc-level recount") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("lang_id_confusion")(spark, Dir).collect()
    assert(rows.length == 25, "5 labels x 5 classes")
    val nDocs = graft.Tables.documents(spark, Dir).count()
    assert(rows.map(_.getLong(2)).sum == nDocs, "cells partition the corpus")
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val total = rs.map(_.getLong(2)).sum
      assert(rs.forall(_.getLong(3) == total), s"n_true marginal for $lang")
      rs.foreach(r => assert(
        r.getLong(5) == r.getLong(2) * 1000 / total, "permille identity"))
    }
    rows.groupBy(_.getString(1)).foreach { case (pred, rs) =>
      val total = rs.map(_.getLong(2)).sum
      assert(rs.forall(_.getLong(4) == total), s"n_pred marginal for $pred")
    }
    val recount = SparkEntry.queries("lang_id_ngram")(spark, Dir)
      .select(col("doc_id"), col("pred_lang"))
      .join(graft.Tables.documents(spark, Dir).select("doc_id", "lang"), "doc_id")
      .groupBy("lang", "pred_lang").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == recount.getOrElse(k, 0L), s"cell $k recount")
    }
    assert(rows.exists(r => r.getString(0) != r.getString(1) && r.getLong(2) > 0),
      "off-diagonal mass must exist (marker stand-ins misfire on purpose)")
  }
}
