package graft.streaming

import java.nio.file.Files
import java.time.Instant
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.Scans

/** Archive backfill through the LIVE pipeline: a directory of captured
  * pages streams in bounded micro-batches (`maxFilesPerTrigger`) under
  * `Trigger.AvailableNow`, drains through the same parse→diff→merge
  * path as live scraping, and the query STOPS when the backlog is
  * empty. The store must equal what the batch scan of the same archive
  * produces — backfill and live are one code path. */
class ArchiveBackfillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Now = Instant.parse("2022-04-17T23:59:59Z")

  private def fixture(name: String): String =
    new String(Files.readAllBytes(java.nio.file.Paths.get(
      s"/root/reference/test/scrapers/fixtures/$name.html")), "UTF-8")

  test("AvailableNow backfill: bounded batches, terminates, store == batch parse") {
    val archive = Files.createTempDirectory("backfill")
    Files.writeString(archive.resolve("help__1.html"), fixture("chat_help"))
    Files.writeString(archive.resolve("global__1.html"), fixture("chat_complex"))
    Files.writeString(archive.resolve("global__2.html"), fixture("chat_long"))
    val out = Files.createTempDirectory("backfillout").toString
    val msgStore = s"$out/messages"
    val docStore = s"$out/docs"

    val pages = Scans.streamArchive(spark, archive.toString, maxFilesPerTrigger = 1)
    val q = ChatPipeline.start(pages, Now, msgStore, docStore,
      trigger = Some(Trigger.AvailableNow()))
    try assert(q.awaitTermination(120000), "AvailableNow query must stop after draining")
    finally if (q.isActive) q.stop()

    // ≥3 micro-batches ran (one file per trigger)
    assert(q.recentProgress.length >= 3,
      s"expected one bounded batch per file, got ${q.recentProgress.length}")

    val streamed = spark.read.parquet(msgStore)
      .select("room", "id", "username", "content", "deleted")
      .collect().map(_.toSeq).toSet
    val batch = Scans.chatScan(Scans.readArchive(spark, archive.toString), Now)
      .toDF().select("room", "id", "username", "content", "deleted")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, "backfill store must equal the batch parse of the archive")
    assert(spark.read.parquet(docStore).count() == batch.size)
  }
}
