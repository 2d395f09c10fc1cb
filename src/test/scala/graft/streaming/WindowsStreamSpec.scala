package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming twin of the windowed aggregations: the SAME window()
  * expression over a stream with a watermark — late data within the
  * watermark still lands; windows finalize when the watermark passes. */
class WindowsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("tumbling window agg over a watermarked stream, late row within watermark counted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val agg = in.toDS().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("n"))
    val q = agg.writeStream.format("memory").queryName("winout")
      .outputMode("update").start()
    try {
      def t(m: Int) = new Timestamp(3600L * 1000 * 24 + m * 60000L) // day 2 + m minutes
      in.addData((t(5), 1.0), (t(10), 1.0), (t(65), 1.0))
      q.processAllAvailable()
      // late row for window 0 arrives while watermark (65-10=55min) still admits... it doesn't (5 < 55)?
      // watermark is 55min: window [0,60) is not yet finalized (60 > 55), so a
      // late row at minute 30 must still be counted.
      in.addData((t(30), 1.0))
      q.processAllAvailable()
      val rows = spark.table("winout")
        .groupBy("w_start").agg(max("n").as("n"))
        .as[(Timestamp, Long)].collect().toMap
      assert(rows(t(0)) == 3L) // 5, 10, late 30
      assert(rows(new Timestamp(3600L * 1000 * 25)) == 1L) // minute 65
    } finally q.stop()
  }
}
