package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.ChatMessage

/** MemoryStream golden runs for the streaming layer (the reference's
  * stateful behaviors: scrapers/chat.py:158-171 diffing, FIFO dedup).
  * Not oracle-checkable (batch DuckDB harness) — covered here instead. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def msg(id: String, ts: Long, content: String, deleted: Boolean = false) =
    ChatMessage("global", id, new Timestamp(ts), "e.png", "u", content, 0, deleted, None)

  test("A4 lastValueDiff: emit-on-change, deletion stamping, carry-forward") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[ChatMessage]
    val q = Streams.lastValueDiff(in.toDS())
      .writeStream.format("memory").queryName("a4out").outputMode(OutputMode.Update()).start()
    try {
      // batch 1: two fresh messages -> both emitted
      in.addData(msg("1", 1000, "hello"), msg("2", 2000, "world"))
      q.processAllAvailable()
      assert(spark.table("a4out").count() == 2)

      // batch 2: msg 1 unchanged (re-scrape), msg 2 edited -> only 2 emitted
      in.addData(msg("1", 1000, "hello"), msg("2", 2000, "world!"))
      q.processAllAvailable()
      val afterB2 = spark.table("a4out").as[ChatMessage].collect()
      assert(afterB2.length == 3)
      assert(afterB2.count(_.id == "2") == 2)

      // batch 3: msg 1 deleted -> emitted with deletedTs stamped
      in.addData(msg("1", 1000, "hello", deleted = true))
      q.processAllAvailable()
      val deletedRow = spark.table("a4out").as[ChatMessage].collect()
        .find(m => m.id == "1" && m.deleted).get
      assert(deletedRow.deletedTs.contains(new Timestamp(1000)))

      // batch 4: deleted msg re-scraped with same content -> deletedTs
      // carried forward means no change -> nothing new emitted
      val before = spark.table("a4out").count()
      in.addData(msg("1", 1000, "hello", deleted = true))
      q.processAllAvailable()
      assert(spark.table("a4out").count() == before)
    } finally q.stop()
  }

  test("A5 boundedDedup: duplicates within watermark collapse to first") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[ChatMessage]
    val q = Streams.boundedDedup(in.toDS())
      .writeStream.format("memory").queryName("a5out").outputMode(OutputMode.Append()).start()
    try {
      in.addData(msg("1", 1000, "a"), msg("1", 1000, "a"), msg("2", 2000, "b"))
      q.processAllAvailable()
      in.addData(msg("1", 1000, "a"), msg("3", 3000, "c"))
      q.processAllAvailable()
      val ids = spark.table("a5out").as[ChatMessage].collect().map(_.id).sorted
      assert(ids.toSeq == Seq("1", "2", "3"))
    } finally q.stop()
  }

  test("S1 isolated: a poison batch is skipped, the query keeps running") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Int]
    var processed = Vector.empty[Int]
    val q = Streams.pollingQuery(in.toDS(), intervalMs = 10, name = "s1poll") {
      (df, _) =>
        val vals = df.as[Int].collect()
        if (vals.contains(13)) throw new RuntimeException("poison")
        processed ++= vals
    }
    try {
      in.addData(1, 2); q.processAllAvailable()
      in.addData(13); q.processAllAvailable() // fails, isolated
      in.addData(3); q.processAllAvailable()
      assert(processed.sorted == Vector(1, 2, 3))
      assert(q.isActive)
    } finally q.stop()
  }

  test("S7/S8/S9 MergeSink: insert-ignore, update, upsert semantics") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mergesink").toString + "/state"

    // S7 insert-ignore: second insert of key 1 does not clobber
    MergeSink.merge(Seq((1, "a"), (2, "b")).toDF("k", "v"), Seq("k"), dir, MergeSink.InsertIgnore)
    MergeSink.merge(Seq((1, "CLOBBER"), (3, "c")).toDF("k", "v"), Seq("k"), dir, MergeSink.InsertIgnore)
    val s1 = spark.read.parquet(dir).as[(Int, String)].collect().toMap
    assert(s1 == Map(1 -> "a", 2 -> "b", 3 -> "c"))

    // S8 update-only: key 2 updated, unknown key 9 dropped
    MergeSink.merge(Seq((2, "B2"), (9, "x")).toDF("k", "v"), Seq("k"), dir, MergeSink.UpdateOnly)
    val s2 = spark.read.parquet(dir).as[(Int, String)].collect().toMap
    assert(s2 == Map(1 -> "a", 2 -> "B2", 3 -> "c"))

    // S9 upsert: key 3 updated AND key 4 inserted
    MergeSink.merge(Seq((3, "C2"), (4, "d")).toDF("k", "v"), Seq("k"), dir, MergeSink.Upsert)
    val s3 = spark.read.parquet(dir).as[(Int, String)].collect().toMap
    assert(s3 == Map(1 -> "a", 2 -> "B2", 3 -> "C2", 4 -> "d"))

    // replay idempotence: same upsert batch twice -> same state
    MergeSink.merge(Seq((3, "C2"), (4, "d")).toDF("k", "v"), Seq("k"), dir, MergeSink.Upsert)
    val s4 = spark.read.parquet(dir).as[(Int, String)].collect().toMap
    assert(s4 == s3)
  }
}
