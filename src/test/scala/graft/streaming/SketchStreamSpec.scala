package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Streaming count-min: the same `cmsCells → groupBy(i,pos).count`
  * relation that backs the batch `cms_heavy_hitters` query, run as a
  * Structured Streaming aggregation. The claim under test is the one
  * that matters for an unbounded token stream: SKETCH STATE IS BOUNDED
  * at depth·width cells no matter how long the stream runs (an exact
  * per-term count grows with vocabulary), while estimates stay
  * overestimate-only and accumulate across batches.
  */
class SketchStreamSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("streaming CMS: bounded state, cross-batch accumulation, overestimate-only") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[String]
    val sketch = Sketches.cmsCells(in.toDF().toDF("term"))
      .groupBy("i", "pos").agg(count(lit(1)).as("cnt"))
    val q = sketch.writeStream
      .format("memory").queryName("cms_stream").outputMode("complete").start()
    try {
      val batch1 = Seq.fill(40)("alpha") ++ Seq.fill(15)("beta") ++
        (1 to 30).map(i => s"tail$i")
      val batch2 = Seq.fill(25)("alpha") ++ Seq.fill(5)("gamma")
      in.addData(batch1: _*)
      q.processAllAvailable()
      val rows1 = spark.table("cms_stream").collect()
      // bounded state: never more cells than the sketch has counters
      assert(rows1.length <= Sketches.CmsDepth * Sketches.CmsWidth)
      def estimate(term: String, rows: Array[org.apache.spark.sql.Row]): Long = {
        val cells = Sketches.cmsCells(Seq(term).toDF("term"))
          .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
        rows.filter(r => cells.contains((r.getInt(0), r.getLong(1))))
          .map(_.getLong(2)).min
      }
      assert(estimate("alpha", rows1) >= 40L)
      in.addData(batch2: _*)
      q.processAllAvailable()
      val rows2 = spark.table("cms_stream").collect()
      assert(rows2.length <= Sketches.CmsDepth * Sketches.CmsWidth)
      // accumulation: batch-2 stream state covers both batches
      assert(estimate("alpha", rows2) >= 65L)
      assert(estimate("gamma", rows2) >= 5L)
      // overestimate-only vs the true stream counts
      val exact = (batch1 ++ batch2).groupBy(identity).view.mapValues(_.size.toLong)
      for ((term, n) <- exact) assert(estimate(term, rows2) >= n, term)
    } finally q.stop()
  }
}
