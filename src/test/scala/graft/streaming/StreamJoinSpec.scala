package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Stream–stream interval join semantics: in-window pairs emit,
  * out-of-window pairs don't, and results match the batch formulation
  * ([[graft.operators.TemporalJoins]] range join) on the same data —
  * the batch/stream equivalence the engine promises everywhere else. */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  test("interval join: trailing-window matches only, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = Streams.streamIntervalJoin(
      purchases.toDS().toDF("l_user", "l_ts"),
      clicks.toDS().toDF("r_user", "r_ts"),
      key = "user", windowSecs = 300) // 5-minute trailing window
    val q = joined.select(col("l_user"), col("l_ts"), col("r_ts"))
      .writeStream.format("memory").queryName("sj").outputMode("append").start()
    try {
      // batch 1: clicks at minute 1 and 20 for user 7; purchase at minute 4
      clicks.addData((7L, ts(1)), (7L, ts(20)))
      purchases.addData((7L, ts(4)))
      q.processAllAvailable()
      // batch 2: purchase at minute 21 (click@20 in window, click@1 not);
      // user 8's purchase has no clicks at all
      purchases.addData((7L, ts(21)), (8L, ts(21)))
      q.processAllAvailable()

      val got = spark.table("sj")
        .select(col("l_user"), col("l_ts").cast("long"), col("r_ts").cast("long"))
        .as[(Long, Long, Long)].collect().toSet
      // inner interval join: (purchase@4 ⋈ click@1), (purchase@21 ⋈ click@20)
      assert(got == Set((7L, 240L, 60L), (7L, 1260L, 1200L)))
    } finally q.stop()
  }

  test("streaming result == batch interval join on the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = for (u <- 1L to 5L; m <- Seq(0, 3, 7, 11, 16)) yield (u, ts(m.toInt + u.toInt))
    val purch = rows.filter(_._1 % 2 == 1)
    val clk = rows
    val batch = purch.toDF("l_user", "l_ts")
      .join(clk.toDF("r_user", "r_ts"),
        expr("l_user = r_user AND r_ts >= l_ts - INTERVAL 300 SECONDS AND r_ts <= l_ts"))
      .select("l_user", "l_ts", "r_ts").as[(Long, Timestamp, Timestamp)].collect().toSet

    val pIn = MemoryStream[(Long, Timestamp)]
    val cIn = MemoryStream[(Long, Timestamp)]
    // watermark must cover the full event span here: the second batch
    // re-delivers EARLIER event times (per-user interleave), and a
    // 10-minute watermark would correctly late-drop them — the
    // equivalence claim is for in-watermark data
    val joined = Streams.streamIntervalJoin(
      pIn.toDS().toDF("l_user", "l_ts"), cIn.toDS().toDF("r_user", "r_ts"),
      key = "user", windowSecs = 300, watermarkDelay = "1 hour")
    val q = joined.select("l_user", "l_ts", "r_ts")
      .writeStream.format("memory").queryName("sj2").outputMode("append").start()
    try {
      cIn.addData(clk.take(10)); pIn.addData(purch.take(5)); q.processAllAvailable()
      cIn.addData(clk.drop(10)); pIn.addData(purch.drop(5)); q.processAllAvailable()
      val got = spark.table("sj2").as[(Long, Timestamp, Timestamp)].collect().toSet
      assert(got == batch, s"stream/batch divergence: ${got.diff(batch)} vs ${batch.diff(got)}")
    } finally q.stop()
  }
}
