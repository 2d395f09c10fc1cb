package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.Mail

/** EventHub routing semantics ported from the reference
  * (events.py:17-25 hierarchical match; bots/base.py:50 dynamic
  * bot_dm.<cmd> dispatch). */
class TopicsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hierarchical match: parent listener receives child topics, not vice versa") {
    assert(Topics.matches("chat", "chat"))
    assert(Topics.matches("chat", "chat.global"))
    assert(!Topics.matches("chat.global", "chat"))
    assert(Topics.matches("chat.global", "chat.global"))
    assert(!Topics.matches("chat", "chatter")) // prefix must be a segment
  }

  test("route: one batch fans out to all matching listeners") {
    import spark.implicits._
    val batch = Seq(
      ("chat.global", "m1"), ("chat.help", "m2"), ("flags.global", "m3"),
      ("user_snapshot", "m4")).toDF("topic", "payload")
    var got = Map.empty[String, Seq[String]]
    Topics.route(batch, "topic", Seq(
      "chat" -> (df => got += "chat" -> df.select("payload").as[String].collect().toSeq.sorted),
      "chat.global" -> (df => got += "chat.global" -> df.select("payload").as[String].collect().toSeq),
      "flags" -> (df => got += "flags" -> df.select("payload").as[String].collect().toSeq),
      "dm" -> (df => got += "dm" -> df.select("payload").as[String].collect().toSeq)))
    assert(got("chat") == Seq("m1", "m2"))
    assert(got("chat.global") == Seq("m1"))
    assert(got("flags") == Seq("m3"))
    assert(got("dm") == Seq())
  }

  test("dm dispatch: bot_dm.<cmd> derived from the first line, lowered") {
    import spark.implicits._
    val mails = Seq(
      Mail(1, "alice", new Timestamp(0), "s", "FIREBASE abc123<br/>tail"),
      Mail(2, "bob", new Timestamp(0), "s", "ping"),
      Mail(3, "carol", new Timestamp(0), "s", "Claims x y")).toDS()
    val topics = Topics.dmTopics(mails)
      .select("id", "topic").as[(Long, String)].collect().toMap
    assert(topics == Map(1L -> "bot_dm.firebase", 2L -> "bot_dm.ping", 3L -> "bot_dm.claims"))
  }
}
