package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Hierarchical topic routing — the reference's `EventHub` fan-out
  * (events.py:13-50): a listener on `chat` receives `chat` and every
  * `chat.<room>`; `bot_dm.<cmd>` dispatches dynamically on the parsed
  * command name (bots/base.py:50).
  *
  * Spark-idiomatic form: topics are a COLUMN, routing is a filter, and
  * the listener fan-out is N filtered consumers of one batch inside a
  * single `foreachBatch` (the reference gives no cross-listener ordering
  * guarantee — events.py:23 spawns a task per listener — so concurrent
  * filtered reads of the same cached batch are a faithful mapping).
  */
object Topics {
  /** `chat` matches `chat` and `chat.global`; `chat.global` matches only
    * itself (+ its own children). Mirrors events.py:17-25. */
  def matches(listener: String, topic: String): Boolean =
    topic == listener || topic.startsWith(listener + ".")

  /** Column form of [[matches]] for a topic column. */
  def matchesCol(listener: String, topic: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    topic === listener || topic.startsWith(listener + ".")

  /** Route one (micro-)batch to every registered listener whose pattern
    * matches — the `foreachBatch` switch. The batch is cached once so N
    * listeners cost one evaluation of the upstream plan. */
  def route(batch: DataFrame, topicCol: String,
      listeners: Seq[(String, DataFrame => Unit)]): Unit = {
    val cached = batch.cache()
    try listeners.foreach { case (pattern, handler) =>
      val slice = cached.filter(matchesCol(pattern, col(topicCol)))
      handler(slice)
    } finally cached.unpersist()
  }

  /** Dynamic DM-command dispatch (bots/base.py:36-57): derive
    * `bot_dm.<cmd>` topics from mail bodies via the command parser. */
  def dmTopics(mails: Dataset[graft.sources.Mail]): DataFrame =
    mails.toDF().withColumn("topic",
      concat(lit("bot_dm."), graft.functions.Fns.commandName(col("content"))))
}
