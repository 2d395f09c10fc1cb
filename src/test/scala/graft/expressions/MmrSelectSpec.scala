package graft.expressions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Kernel-level properties for `graft_mmr` on random candidate pools
  * (the query-path spec, MmrRerankSpec, covers the composed pipeline;
  * this pins the kernel alone): exact equality with a brute-force
  * greedy that recomputes max-sim from scratch each step (the kernel
  * maintains it incrementally — a divergence means the incremental
  * fold is wrong), output-size/distinctness invariants, the
  * first-pick-is-pure-relevance law, and the λ = 1000 degenerate case
  * (no penalty → selection ≡ relevance order with id ties). */
class MmrSelectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def brute(cands: Seq[(Long, Long, Array[Long])], k: Int, lp: Long): Seq[Long] = {
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    (1 to math.min(k, cands.size)).foreach { _ =>
      val pick = cands.filterNot(c => out.contains(c._1)).minBy { case (id, simq, e) =>
        val pen = if (sel.isEmpty) 0L
          else sel.map(s => e.zip(s._2).map { case (x, y) => x * y }.sum).max
        (-(lp * simq - (1000 - lp) * pen), id)
      }
      sel += ((pick._1, pick._3)); out += pick._1
    }
    out.toSeq
  }

  private def run(cands: Seq[(Long, Long, Array[Long])], k: Int, lp: Long): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "g INT, id BIGINT, simq BIGINT, emb ARRAY<BIGINT>")
    spark.createDataFrame(
      cands.map { case (id, s, e) => Row(1, id, s, e.toSeq) }.asJava, schema)
      .groupBy("g")
      .agg(collect_list(struct(col("id"), col("simq"), col("emb"))).as("cands"))
      .select(expr(s"graft_mmr(cands, $k, $lp)").as("sel"))
      .collect().head.getSeq[Long](0).toSeq
  }

  test("kernel equals the from-scratch brute-force greedy on random pools") {
    val rng = new scala.util.Random(1063)
    (1 to 10).foreach { trial =>
      val m = 2 + rng.nextInt(18)
      val dim = 1 + rng.nextInt(8)
      val k = 1 + rng.nextInt(10)
      val lp = 1 + rng.nextInt(1000)
      val cands = (0 until m).map { i =>
        (i.toLong * 7, rng.between(-500L, 500L),
          Array.fill(dim)(rng.between(-50L, 50L)))
      }
      val got = run(cands, k, lp)
      val exp = brute(cands, k, lp)
      assert(got == exp, s"trial $trial (m=$m k=$k lp=$lp): $got != $exp")
      assert(got.size == math.min(k, m) && got.distinct == got)
    }
  }

  test("first pick is pure relevance; lambda=1000 degenerates to relevance order") {
    val rng = new scala.util.Random(7)
    val cands = (0 until 12).map { i =>
      (i.toLong, rng.between(-100L, 100L), Array.fill(4)(rng.between(-9L, 9L)))
    }
    val byRel = cands.sortBy { case (id, s, _) => (-s, id) }.map(_._1)
    assert(run(cands, 5, 700).head == byRel.head, "step 1 must be argmax relevance")
    assert(run(cands, 5, 1000) == byRel.take(5),
      "lambda=1000 (no penalty) must reproduce the relevance ranking")
  }

  test("duplicate scores tie to the smaller id at every step") {
    // identical vectors and scores: the only order left is id
    val e = Array(1L, 2L, 3L)
    val cands = Seq((30L, 10L, e), (10L, 10L, e), (20L, 10L, e))
    assert(run(cands, 3, 500) == Seq(10L, 20L, 30L))
  }

  test("bad literals fail at ANALYSIS time: k < 1 and out-of-range lambda") {
    val e = Array(1L, 2L)
    val cands = Seq((1L, 5L, e))
    for ((k, lp) <- Seq((0, 500L), (-3, 500L), (2, 0L), (2, 1001L))) {
      val ex = intercept[Exception](run(cands, k, lp))
      assert(ex.getMessage.contains("graft_mmr"),
        s"(k=$k, lp=$lp) expected the analysis-time validation message, got: ${ex.getMessage}")
    }
  }
}
