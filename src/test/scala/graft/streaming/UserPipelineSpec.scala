package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.UserSnapshot

/** CDC semantics ported from the reference's snapshot pipeline
  * (db/user.py:12-40, firestore/user.py:6-13): change suppression
  * ignores ts; (new, old) pairs propagate; claims emit only on real
  * claim changes. */
class UserPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def snap(id: Long, ts: Long, name: String, fh: Boolean = false, r: Boolean = false) =
    UserSnapshot(id, new Timestamp(ts), name, fh, r)

  test("cdcIngest: suppress unchanged, emit changed + new, argmax repeated scrapes") {
    import spark.implicits._
    val current = Seq(
      snap(1, 100, "alice", r = true), snap(2, 100, "bob"), snap(4, 100, "dave"))
      .toDF()
    val incoming = Seq(
      snap(1, 200, "alice", r = true),  // unchanged (ts differs only) -> suppressed
      snap(2, 150, "bob", fh = true),   // stale duplicate scrape
      snap(2, 200, "bob", fh = true),   // promoted -> emitted (argmax wins)
      snap(3, 200, "carol")             // brand new -> emitted
    ).toDS()
    val pairs = UserPipeline.cdcIngest(incoming, current)
    val got = pairs.select("userId", "new_isFarmhand", "old_isFarmhand")
      .as[(Long, Boolean, Option[Boolean])].collect().sortBy(_._1).toSeq
    assert(got == Seq((2L, true, Some(false)), (3L, false, None)))
  }

  test("changedClaims: role changes emit, claim-neutral changes don't") {
    import spark.implicits._
    val current = Seq(snap(1, 100, "alice"), snap(2, 100, "bob", fh = true)).toDF()
    val incoming = Seq(
      snap(1, 200, "alice", r = true), // gains ranger role -> claims change
      snap(2, 200, "bob", fh = true, r = true), // farmhand->ranger -> claims change
      snap(5, 200, "eve")              // new, roleless -> claims appear
    ).toDS()
    val claims = UserPipeline.changedClaims(UserPipeline.cdcIngest(incoming, current))
      .as[(Long, String, Option[String])].collect().sortBy(_._1).toSeq
    assert(claims == Seq(
      (1L, """{"username":"alice","role":"ranger"}""", Some("""{"username":"alice"}""")),
      (2L, """{"username":"bob","role":"ranger"}""", Some("""{"username":"bob","role":"farmhand"}""")),
      (5L, """{"username":"eve"}""", None)))
  }
}
