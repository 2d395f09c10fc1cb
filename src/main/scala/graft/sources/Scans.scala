package graft.sources

import java.time.Instant
import org.apache.spark.sql.{Dataset, SparkSession}

/** A fetched page: where it came from + raw bytes-as-string.
  * `room`/`key` is the scrape key (chat room, username, mail id). */
final case class RawPage(key: String, html: String, fetchedAt: java.sql.Timestamp)

/** Distributed form of the S2–S6 scans: `Dataset[RawPage] → flatMap(parse)`.
  *
  * The unit of parallelism is the PAGE (the reference's unit of work is
  * one HTTP response, scrapers/chat.py:124-157): parsing 100 TB of
  * archived pages distributes across partitions with zero shuffle — the
  * sequential logic inside one page (day-rollover state walk) is
  * intentionally per-page, exactly like the reference. Typed Datasets
  * keep the parsers unit-testable off-cluster.
  */
object Scans {
  def chatScan(pages: Dataset[RawPage], now: Instant): Dataset[ChatMessage] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap(p => HtmlParsers.parseChat(p.key, p.html, now))
  }

  def flagsScan(pages: Dataset[RawPage], now: Instant): Dataset[ChatMessage] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap(p => HtmlParsers.parseFlags(p.key, p.html, now))
  }

  def profileScan(pages: Dataset[RawPage], now: Instant): Dataset[UserSnapshot] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.map(p => HtmlParsers.parseProfile(p.key, p.html, now))
  }

  def onlineScan(pages: Dataset[RawPage]): Dataset[String] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap(p => HtmlParsers.parseOnline(p.html))
  }

  def mailboxScan(pages: Dataset[RawPage]): Dataset[MailboxRow] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap(p => HtmlParsers.parseMailbox(p.html))
  }

  def messageScan(pages: Dataset[RawPage], now: Instant): Dataset[Mail] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.map(p => HtmlParsers.parseMessage(p.key.toLong, p.html, now))
  }
}
