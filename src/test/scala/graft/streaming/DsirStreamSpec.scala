package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** The frozen-model streaming scorer must reproduce the batch
  * selector exactly: a doc's (importance, keep) depends only on the
  * doc and the trained model, so replaying the training corpus through
  * micro-batches — in any split — yields the batch query's rows
  * bit-for-bit. That is the deployment contract (train once, score the
  * crawl as it arrives) and the parity is by shared scoring code. */
class DsirStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Dir = "/root/testdata/sf0.001"

  private def key(r: Row): (Long, String, Long, Long, Long, Boolean) =
    (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getBoolean(5))

  test("replaying the corpus through micro-batches equals the batch selector") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, Dir)
      .select("doc_id", "lang", "text").collect()
      .map(r => IncomingDoc(r.getLong(0), r.getString(1), r.getString(2)))
    // batches split by doc_id — arrival order must not matter
    val batches = Seq(
      docs.filter(_.doc_id % 3 == 0).toSeq,
      docs.filter(_.doc_id % 3 == 1).toSeq,
      docs.filter(_.doc_id % 3 == 2).toSeq)
    val in = MemoryStream[IncomingDoc]
    val outs = scala.collection.mutable.ArrayBuffer.empty[Array[Row]]
    val q = DsirStream.start(in.toDS(), Dir, "dsir-parity") {
      (scored, _) => outs.synchronized { outs += scored.collect() }
    }
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val streamed = outs.flatten.map(key).toSet
    val batch = SparkEntry.queries("dsir_select")(spark, Dir)
      .collect().map(key).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream/batch divergence: ${(streamed diff batch).take(3)} vs " +
        s"${(batch diff streamed).take(3)}")
    // micro-batches partition the doc space: no doc scored twice
    val ids = outs.flatten.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "a doc was scored in two batches")
  }
}
