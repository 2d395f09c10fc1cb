package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.RawPage

/** End-to-end golden run of the composed chat pipeline over the
  * reference's own fixture pages: scrape → re-scrape-with-deletion →
  * both stores reflect the merged, deletion-stamped state. */
class ChatPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Now = Instant.parse("2022-04-17T23:59:59Z")

  private def fixture(name: String): String =
    new String(Files.readAllBytes(java.nio.file.Paths.get(
      s"/root/reference/test/scrapers/fixtures/$name.html")), "UTF-8")

  test("pages -> parse -> diff -> dual merge sinks, deletion stamped on re-scrape") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("chatpipe").toString
    val msgStore = s"$dir/messages"
    val docStore = s"$dir/docs"

    // the complex page, and a re-scrape of the same page with message
    // 5363775 marked deleted (redstripes + undelChat, as the site shows)
    val page1 = fixture("chat_complex")
    val page2 = page1
      .replace("""<div class="chat-txt  " ><span style="color:gray">08:28:15 PM</span>""",
        """<div class="chat-txt  redstripes" ><span style="color:gray">08:28:15 PM</span>""")
      .replace("javascript:delChat(5363775)", "javascript:undelChat(5363775)")
    assert(page2 != page1)

    val in = MemoryStream[RawPage]
    val q = ChatPipeline.start(in.toDS(), Now, msgStore, docStore, intervalMs = 10)
    try {
      in.addData(RawPage("global", page1, new Timestamp(0)))
      q.processAllAvailable()
      val afterFirst = spark.read.parquet(msgStore)
      assert(afterFirst.count() == 2) // both messages inserted

      in.addData(RawPage("global", page2, new Timestamp(0)))
      q.processAllAvailable()

      val msgs = spark.read.parquet(msgStore)
      assert(msgs.count() == 2) // merged, not appended
      val deleted = msgs.filter("id = '5363775'").collect().head
      assert(deleted.getAs[Boolean]("deleted"))
      assert(deleted.getAs[Timestamp]("deletedTs") != null) // A4 stamp survived the merge

      // doc store: flags dropped, mentions derived, same keys
      val docs = spark.read.parquet(docStore)
      assert(docs.count() == 2)
      assert(!docs.columns.contains("flags"))
      assert(docs.columns.contains("mentions"))
      val unchanged = docs.filter("id = '5363757'").collect().head
      assert(!unchanged.getAs[Boolean]("deleted"))
    } finally q.stop()
  }
}
