package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Funnel mechanics the oracle hash states only implicitly: the stages
  * only ever narrow (n0 ≥ n1 ≥ n2 ≥ n3 per cell), the domain gate is
  * all-or-nothing per source, stage 1 agrees with the standalone
  * source_quality_gate query cell-for-cell, and the composition
  * actually exercises every stage (each inequality is strict
  * somewhere on the harness corpus — a funnel that never narrows at a
  * stage isn't testing that stage). */
class MixPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private def funnel: Array[(String, String, Long, Long, Long, Long, Long)] =
    SparkEntry.queries("mix_pipeline")(spark, Dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))

  test("stages only narrow, and each stage bites somewhere") {
    val rows = funnel
    assert(rows.nonEmpty)
    rows.foreach { case (src, lang, n0, n1, n2, n3, tok3) =>
      assert(n0 >= n1 && n1 >= n2 && n2 >= n3,
        s"($src,$lang): funnel widened: $n0 >= $n1 >= $n2 >= $n3 violated")
      assert(n3 >= 0 && (tok3 == 0) == (n3 == 0 || tok3 == 0),
        s"($src,$lang): token mass without docs")
      if (n3 > 0) assert(tok3 >= n3, s"($src,$lang): selected docs imply tokens")
    }
    // every stage must bite somewhere on the harness corpus
    assert(rows.exists(r => r._3 > r._4), "domain gate never dropped anything")
    assert(rows.exists(r => r._4 > r._5), "token budget never dropped anything")
    assert(rows.exists(r => r._5 > r._6), "dsir selection never dropped anything")
    assert(rows.exists(_._6 > 0), "nothing survived the pipeline")
  }

  test("the domain gate is all-or-nothing per source and matches the standalone query") {
    val rows = funnel
    // all-or-nothing: within a source, either every cell keeps all its
    // docs at stage 1 or every cell keeps none
    rows.groupBy(_._1).foreach { case (src, cells) =>
      val kinds = cells.map(c => c._4 == c._3 || c._4 == 0L)
      assert(kinds.forall(identity),
        s"$src: stage-1 must keep all or none per cell: ${cells.toSeq}")
      val survived = cells.map(c => c._4 > 0).distinct
      assert(survived.length == 1, s"$src: gate split a source across cells")
    }
    // stage 1 ≡ the standalone source_quality_gate, cell by cell
    val gateCells = SparkEntry.queries("source_quality_gate")(spark, Dir)
      .join(spark.read.parquet(s"$Dir/documents.parquet").select("doc_id", "lang"),
        "doc_id")
      .groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { case (src, lang, _, n1, _, _, _) =>
      assert(gateCells.getOrElse((src, lang), 0L) == n1,
        s"($src,$lang): stage-1 count $n1 diverges from source_quality_gate")
    }
  }

  test("gate seam keeps NULL-source rows identically in both spellings (r20 ADVICE)") {
    // the window spelling groups nulls into their own partition; the
    // join spelling must match it with a null-safe join — a plain inner
    // join would drop the null-key rows and silently fork the variants
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("lang", StringType), StructField("n_chars", LongType),
      StructField("n_tok", LongType)))
    val rows = Seq(
      Row(1L, "a", "en", 10L, 3L), Row(2L, "a", "en", 500L, 90L),
      Row(3L, null, "en", 10L, 3L), Row(4L, null, "en", 500L, 90L))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    def verdicts(ws: Boolean): Map[Long, Boolean] =
      TrainingMix.gateStage(d, ws).select("doc_id", "g1").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val win = verdicts(ws = true)
    val join = verdicts(ws = false)
    assert(win.keySet == Set(1L, 2L, 3L, 4L),
      s"window spelling lost rows: ${win.keySet}")
    assert(join == win, s"join spelling diverged on null source: $join vs $win")
  }

  test("seam confs reject non-boolean values with a pointed message (r20 ADVICE)") {
    spark.conf.set("graft.mix.persist", "1")
    try {
      val e = intercept[IllegalArgumentException] {
        SparkEntry.queries("mix_pipeline")(spark, Dir)
      }
      assert(e.getMessage.contains("graft.mix.persist"),
        s"error message must name the conf key: ${e.getMessage}")
    } finally {
      spark.conf.unset("graft.mix.persist")
      ()
    }
  }

  test("measurement seams are pure spellings: all four (winstats, persist) variants agree") {
    // graft.mix.winstats (r20 window-stats vs r16 join-stats) and
    // graft.mix.persist (stage materialization on/off) exist ONLY for
    // interleaved measurement — every combination must produce the
    // byte-identical funnel, or the seam has rotted into a semantics
    // fork
    val adopted = funnel.sortBy(r => (r._1, r._2)).toSeq
    try {
      for (ws <- Seq("true", "false"); p <- Seq("true", "false")) {
        spark.conf.set("graft.mix.winstats", ws)
        spark.conf.set("graft.mix.persist", p)
        spark.catalog.clearCache()
        val got = funnel.sortBy(r => (r._1, r._2)).toSeq
        assert(got == adopted, s"seam (winstats=$ws, persist=$p) diverged")
      }
    } finally {
      spark.conf.unset("graft.mix.winstats")
      spark.conf.unset("graft.mix.persist")
      spark.catalog.clearCache()
      ()
    }
  }
}
