package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** The streaming daily histogram (complete-mode state) read through
  * the batch MAD extraction must equal batch `anomaly_mad` for any
  * micro-batch split. */
class AnomalyStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private type Row = (String, Timestamp, Long, Long, Long, Boolean)

  private def batchRows: Set[Row] =
    SparkEntry.queries("anomaly_mad")(spark, Dir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet

  private def corpus: Seq[VolObs] =
    graft.Tables.events(spark, Dir).selectExpr("event_type", "ts").collect()
      .map(r => VolObs(r.getString(0), r.getTimestamp(1))).toSeq

  private def run(batches: Seq[Seq[VolObs]]): Set[Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[VolObs]
    val name = s"vol_${System.nanoTime()}"
    val q = AnomalyStream.daily(in.toDS()).writeStream
      .outputMode("complete").format("memory").queryName(name).start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      // snapshot the (bounded, types × days) histogram before the MAD
      // extraction: madOfDaily self-joins its input, and a memory-sink
      // relation joined with itself trips Spark's conflicting-reference
      // resolution; a monitoring reader snapshots its baseline anyway
      val t = spark.table(name)
      val hist = spark.createDataFrame(
        spark.sparkContext.parallelize(t.collect().toSeq), t.schema)
      AnomalyStream.flags(hist).collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5))).toSet
    } finally q.stop()
  }

  test("single batch equals batch anomaly_mad") {
    assert(batchRows.nonEmpty && run(Seq(corpus)) == batchRows)
  }

  test("any shuffled split converges to the batch flags") {
    val rng = new scala.util.Random(11)
    val parts = rng.shuffle(corpus).grouped(corpus.length / 3 + 1).toSeq
    assert(run(parts) == batchRows)
  }
}
