package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.Mail

/** Bot handler semantics ported from bots/ping.py + bots/firebase.py:
  * uid validation, update-else-insert, unknown-command drop. */
class BotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mail(id: Long, from: String, body: String) =
    Mail(id, from, new Timestamp(0), "s", body)

  test("firebase handler: valid uid updates, unknown user inserts, bad uid errors") {
    import spark.implicits._
    val uid28 = "a" * 28
    val users = Seq(("alice", Some("old-uid")), ("bob", None))
      .toDF("username", "firebase_uid")
    val mails = Seq(
      mail(1, "alice", s"FIREBASE $uid28"),   // update existing
      mail(2, "carol", s"firebase $uid28"),   // insert new user
      mail(3, "bob", "firebase tooshort")     // invalid -> error reply
    ).toDS().toDF()
    val (errors, state) = Bots.handleFirebase(mails, users)
    assert(errors.select("username").as[String].collect().toSeq == Seq("bob"))
    val got = state.as[(String, Option[String])].collect().toMap
    assert(got == Map("alice" -> Some(uid28), "bob" -> None, "carol" -> Some(uid28)))
  }

  test("dispatch: ping replies pong, unknown commands dropped, firebase errors routed") {
    import spark.implicits._
    val users = Seq(("bob", Option.empty[String])).toDF("username", "firebase_uid")
    val mails = Seq(
      mail(1, "alice", "ping"),
      mail(2, "bob", "firebase nope"),
      mail(3, "carol", "frobnicate all the things")).toDS()
    val replies = Bots.dispatch(mails, users)
      .select("username", "reply").as[(String, String)].collect().toSet
    assert(replies == Set(
      ("alice", "pong"),
      ("bob", "That doesn't look like a Firebase user ID")))
  }
}
