package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Fns
import graft.sources.Mail

/** The DM-bot consumer layer (SURVEY §3.3; bots/base.py:36-67,
  * bots/ping.py:5-12, bots/firebase.py:8-31): mails → first-line command
  * parse (F7/F8) → `bot_dm.<cmd>` dispatch (Topics) → handlers.
  *
  * Handlers are batch relations: each produces a reply Dataset (the
  * reference POSTs replies over HTTP — S11, out of oracle scope; here
  * the reply relation IS the sink contract) and, for `firebase`, an
  * update-else-insert decision against the user store (A6 rowcount
  * branch + J4 get_or_create as one frame).
  */
object Bots {
  /** `ping` → `pong` reply to the sender (bots/ping.py:5-12). */
  def handlePing(mails: DataFrame): DataFrame =
    mails.select(col("id").as("reply_to_mail"), col("username"),
      lit("pong").as("reply"))

  /** `firebase <uid>` — link a firebase uid to the sending user
    * (bots/firebase.py:8-31): arg must look like a firebase uid
    * (len 28, F17) else an error reply; valid links become an
    * update-else-insert against the user store (update matched rows,
    * insert a new user when the update matched zero — A6's rowcount
    * branch expressed relationally via the left join). */
  def handleFirebase(mails: DataFrame, users: DataFrame): (DataFrame, DataFrame) = {
    val parsed = mails
      .withColumn("uid", Fns.commandArgs(col("content")))
      .withColumn("valid", Fns.isFirebaseUid(col("uid")))
    val errors = parsed.filter(!col("valid"))
      .select(col("id").as("reply_to_mail"), col("username"),
        lit("That doesn't look like a Firebase user ID").as("reply"))
    val links = parsed.filter(col("valid"))
      .select(col("username"), col("uid"))
    // update-else-insert: existing users take the new uid; unknown
    // usernames become new rows (db row_count==0 → insert branch)
    val updated = users.join(links, Seq("username"), "left")
      .select(col("username"),
        coalesce(col("uid"), col("firebase_uid")).as("firebase_uid"))
    val inserted = links.join(users.select("username"), Seq("username"), "left_anti")
      .select(col("username"), col("uid").as("firebase_uid"))
    (errors, updated.unionByName(inserted))
  }

  /** Full dispatch over one mail batch: parse topics, route to handlers,
    * collect replies. Unknown commands are dropped, like an EventHub
    * emit with no listener (events.py:19-25). */
  def dispatch(mails: Dataset[Mail], users: DataFrame): DataFrame = {
    val topical = Topics.dmTopics(mails).cache()
    try {
      val ping = handlePing(topical.filter(col("topic") === "bot_dm.ping"))
      val (fbErrors, _) = handleFirebase(
        topical.filter(col("topic") === "bot_dm.firebase"), users)
      ping.unionByName(fbErrors)
    } finally topical.unpersist()
  }
}
