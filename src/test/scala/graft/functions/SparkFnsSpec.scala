package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The scalar layer exercised through Spark itself (codegen path), not
  * just pattern-level: mention extraction via `regexp_extract_all`,
  * command parsing, claims JSON. */
class SparkFnsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("F5 mentions via Spark regexp_extract_all matches the golden table") {
    val cases = Seq(
      ("@Hnr: hmmm perhaps", Seq("Hnr")),
      ("@caption oblivious: me ROPE", Seq("caption oblivious")),
      ("Can someone @ me please?", Seq()),
      ("Two embedded @one and later @two", Seq("one", "two")),
      ("Embedded and terminated @one: @two:", Seq("one", "two")),
      ("@coderanger: one at the start and @Ffff later", Seq("coderanger", "Ffff")))
    val got = cases.map(_._1).toDF("content")
      .select(Fns.mentions(col("content")).as("m"))
      .as[Seq[String]].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("F7/F8 command parsing: first line, lowered command, args (bots/base.py:37-44)") {
    val got = Seq("FIREBASE abc123 def<br/>ignored line", "ping", "Claims  x y")
      .toDF("body")
      .select(Fns.commandName(col("body")).as("cmd"), Fns.commandArgs(col("body")).as("args"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("firebase", "abc123 def"), ("ping", ""), ("claims", "x y")))
  }

  test("F16 claims JSON omits role key entirely when roleless (models/user.py:27-33)") {
    val got = Seq(("alice", Some("ranger")), ("bob", None))
      .toDF("username", "role")
      .select(Fns.claimsJson(col("username"), col("role")).as("claims"))
      .as[String].collect().toSeq
    assert(got == Seq("""{"username":"alice","role":"ranger"}""", """{"username":"bob"}"""))
  }

  test("F1/F2: message id + flag count extraction") {
    val got = Seq(("javascript:delChat(123)", "2 flags"),
        ("javascript:undelChat(9)", "1 flag"), ("nope", "x"))
      .toDF("href", "badge")
      .select(Fns.messageId(col("href")).as("id"), Fns.flagCount(col("badge")).as("n"))
      .as[(String, Int)].collect().toSeq
    assert(got == Seq(("123", 2), ("9", 1), ("", 0)))
  }
}
