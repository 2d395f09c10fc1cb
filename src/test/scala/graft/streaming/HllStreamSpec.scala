package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Sketches

/** Streaming HyperLogLog: the same `hllRegisters` relation that backs
  * the batch `hll_distinct` query, run as a Structured Streaming
  * aggregation. Claims under test: register state is bounded at
  * groups·m rows forever; the `max` register merge accumulates across
  * batches exactly as across partitions (same associativity the batch
  * spec proves in Scala); and re-observing already-seen keys never
  * moves the estimate (idempotence — the property that makes HLL safe
  * under at-least-once delivery).
  */
class HllStreamSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("streaming HLL: bounded state, cross-batch merge, duplicate-idempotent") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val regs = Sketches.hllRegisters(in.toDF().toDF("grp", "key"))
    val q = regs.writeStream
      .format("memory").queryName("hll_stream").outputMode("complete").start()
    try {
      def registers(): Map[String, Map[Long, Int]] =
        spark.table("hll_stream").collect()
          .groupBy(_.getString(0))
          .view.mapValues(_.map(r => r.getLong(1) -> r.getInt(2)).toMap).toMap
      val batch1 = (1 to 300).map(i => ("g1", s"key$i")) ++ (1 to 40).map(i => ("g2", s"k$i"))
      in.addData(batch1: _*)
      q.processAllAvailable()
      val r1 = registers()
      assert(spark.table("hll_stream").count() <= 2L * Sketches.HllM)
      val est1 = Sketches.hllEstimate(r1("g1"))
      assert(est1 > 150 && est1 < 600, s"g1 estimate off: $est1 (true 300)")
      // batch 2: new keys for g1 plus a full REPLAY of batch 1
      in.addData(((301 to 600).map(i => ("g1", s"key$i")) ++ batch1): _*)
      q.processAllAvailable()
      val r2 = registers()
      // registers only ever grow, and state stays bounded
      for ((g, m1) <- r1; (b, v) <- m1) assert(r2(g)(b) >= v, s"$g/$b regressed")
      assert(spark.table("hll_stream").count() <= 2L * Sketches.HllM)
      // g2 saw only replayed duplicates → its registers are EXACTLY batch-1's
      assert(r2("g2") === r1("g2"), "duplicate replay must not move registers")
      val est2 = Sketches.hllEstimate(r2("g1"))
      assert(est2 >= est1, "estimate must be monotone under union")
    } finally q.stop()
  }
}
