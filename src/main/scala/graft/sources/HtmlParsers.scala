package graft.sources

import java.net.URLDecoder
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import java.time._
import java.time.format.DateTimeFormatter
import java.util.Locale
import scala.util.matching.Regex

/** Strict parse failure — the reference fails fast on malformed pages
  * (scrapers/errors.py:1-2, raised 15× across its parsers). */
final class ParseError(msg: String) extends RuntimeException(msg)

/** Typed records produced by the page parsers (models/chat.py:10-19,
  * models/user.py:12-24, models/mailbox.py:7-12, scrapers/mailbox.py:76-78). */
final case class ChatMessage(
    room: String, id: String, ts: Timestamp, emblem: String, username: String,
    content: String, flags: Int, deleted: Boolean, deletedTs: Option[Timestamp])
final case class MailboxRow(id: Long, unread: Boolean)
final case class Mail(id: Long, username: String, ts: Timestamp, subject: String, content: String)
final case class UserSnapshot(userId: Long, ts: Timestamp, username: String,
    isFarmhand: Boolean, isRanger: Boolean)

/** The HTML scan layer (SURVEY §2.1 S2–S6): pure `String => Seq[T]`
  * parsers, regex-based (no DOM library in this environment — the pages
  * are regular enough; reference uses BeautifulSoup+lxml:
  * scrapers/chat.py:31-115, scrapers/user.py:22-70, scrapers/mailbox.py:25-96).
  *
  * Each parser is deterministic given (`html`, `now`) — `now` is an
  * explicit argument (the reference freezes it with freezegun in tests),
  * so the same functions serve batch tests and streaming sources.
  *
  * Content fields reproduce BeautifulSoup's `decode_contents
  * (formatter="html5")` serialization: attributes sorted by name,
  * double-quoted, void self-closing slashes dropped (`<br />` → `<br>`)
  * — see [[HtmlParsers.normalizeTags]] — then the reference's regex
  * normalizations (Forcepath, @-link) are applied on top
  * (scrapers/chat.py:72-74).
  */
object HtmlParsers {
  val ServerTz: ZoneId = ZoneId.of("America/Chicago") // utils/datetime.py:4
  private val TimeFmt = DateTimeFormatter.ofPattern("hh:mm:ss a", Locale.US)
  /** "%b %d, %I:%M:%S %p" — yearless; default year placeholder 2000
    * (leap year, so Feb 29 parses), overwritten by the caller. */
  private val YearlessFmt = new format.DateTimeFormatterBuilder()
    .appendPattern("MMM d, hh:mm:ss a")
    .parseDefaulting(temporal.ChronoField.YEAR, 2000)
    .toFormatter(Locale.US)

  /** Yearless server timestamp → current year, minus one year when that
    * lands in the future (W4 year-rollover repair; mailbox.py:45-52). */
  private def parseYearless(s: String, serverNow: ZonedDateTime): ZonedDateTime = {
    val ts = LocalDateTime.parse(s, YearlessFmt).atZone(ServerTz)
      .withYear(serverNow.getYear)
    if (ts.isAfter(serverNow)) ts.minusYears(1) else ts
  }

  // -------------------------------------------------------------------
  // BS4-html5-compatible serialization of embedded tags
  // -------------------------------------------------------------------

  private val TagPat: Regex =
    """<(\w+)((?:\s+[\w:.-]+(?:\s*=\s*(?:"[^"]*"|'[^']*'|[^\s>]+))?)*)\s*/?>""".r
  private val AttrPat: Regex =
    """([\w:.-]+)(?:\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+)))?""".r

  /** Normalize every opening tag the way BS4's html5 formatter
    * serializes them: attributes sorted by name, double-quoted,
    * no self-closing slash. Text and entities pass through untouched. */
  def normalizeTags(html: String): String =
    TagPat.replaceAllIn(html, m => {
      val name = m.group(1)
      val attrs = AttrPat.findAllMatchIn(Option(m.group(2)).getOrElse(""))
        .map { am =>
          val v = Seq(am.group(2), am.group(3), am.group(4)).find(_ != null).getOrElse("")
          (am.group(1), v)
        }.toSeq.sortBy(_._1)
      val rendered =
        if (attrs.isEmpty) s"<$name>"
        else attrs.map { case (k, v) => s"""$k="$v"""" }.mkString(s"<$name ", " ", ">")
      Regex.quoteReplacement(rendered)
    })

  // reference regexes, applied post-serialization (scrapers/chat.py:19-25)
  private val MessageIdPat = """javascript:(?:un)?delChat\((\d+)\)""".r
  private val ForcepathPat = """<strong>\w+path</strong>""".r
  private val AtLinkPat =
    ("""<a class="close-panel" href="profile.php\?user_name=[^">]+"""" +
      """ style="color:teal">(@[^">]+)</a>""").r

  private def normalizeContent(inner: String): String = {
    val serialized = Html5Entities.substitute(normalizeTags(inner))
    val forced = ForcepathPat.replaceAllIn(serialized, "<strong>Forcepath</strong>")
    AtLinkPat.replaceAllIn(forced, m => Regex.quoteReplacement(m.group(1) + ":"))
  }

  private def qsParam(url: String, key: String): Option[String] = {
    val qs = url.split("\\?", 2) match { case Array(_, q) => q; case _ => return None }
    qs.split("&").iterator.map(_.split("=", 2)).collectFirst {
      case Array(k, v) if k == key => URLDecoder.decode(v, UTF_8)
      case Array(k) if k == key => ""
    }
  }

  private def toTs(z: ZonedDateTime): Timestamp = Timestamp.from(z.toInstant)

  // -------------------------------------------------------------------
  // S2 html_scan_chat (scrapers/chat.py:31-83)
  // -------------------------------------------------------------------

  private val ChatBlockPat: Regex = """(?s)<div class="chat-txt([^"]*)"[^>]*>(.*?)(?=<div class="chat-txt|\z)""".r
  private val ChatTsPat: Regex = """<span style="color:gray">([^<]+)</span>""".r
  private val EmblemPat: Regex =
    """<div class="chip-media"><img src="([^"]+)" data-username="([^"]+)"""".r
  private val ChatContentPat: Regex =
    """(?s)<br\s*/?><span style="color:#222">(.*)</span>\s*</div>\s*\z""".r

  /** Parse a chat page into messages, repairing day rollovers: the page
    * shows only time-of-day; walking newest→oldest, a time greater than
    * the previous (repaired) row means the previous calendar day, and
    * rollovers cascade across days (scrapers/chat.py:36-51; golden
    * cascade test test/scrapers/test_chat.py:132-162). */
  def parseChat(room: String, html: String, now: Instant): Seq[ChatMessage] = {
    var lastTs = ZonedDateTime.ofInstant(now, ServerTz)
    ChatBlockPat.findAllMatchIn(html).map { blk =>
      val classes = blk.group(1)
      val body = blk.group(2)
      val tsStr = ChatTsPat.findFirstMatchIn(body)
        .getOrElse(throw new ParseError(s"Unable to find timestamp: $body")).group(1).trim
      val tod = LocalTime.parse(tsStr, TimeFmt)
      var ts = lastTs.withHour(tod.getHour).withMinute(tod.getMinute)
        .withSecond(tod.getSecond).withNano(0)
      if (ts.isAfter(lastTs)) ts = ts.minusDays(1) // day rollover
      lastTs = ts
      val id = MessageIdPat.findFirstMatchIn(body)
        .getOrElse(throw new ParseError(s"Unable to parse message ID: $body")).group(1)
      val em = EmblemPat.findFirstMatchIn(body)
        .getOrElse(throw new ParseError(s"Unable to find emblem: $body"))
      val rawContent = ChatContentPat.findFirstMatchIn(body)
        .getOrElse(throw new ParseError(s"Unable to find content span: $body")).group(1)
      ChatMessage(
        room = room, id = id, ts = toTs(ts),
        emblem = em.group(1).split("/").last,
        username = em.group(2),
        content = normalizeContent(rawContent),
        flags = 0,
        deleted = classes.contains("redstripes"),
        deletedTs = None)
    }.toSeq
  }

  // -------------------------------------------------------------------
  // S3 html_scan_flags (scrapers/chat.py:86-115)
  // -------------------------------------------------------------------

  private val LiPat: Regex = """(?s)<li>(.*?)</li>""".r
  private val ItemTitlePat: Regex = """(?s)<div class="item-title"[^>]*>(.*?)</div>""".r
  private val ItemAfterPat: Regex = """(?s)<div class="item-after"[^>]*>(.*?)</div>""".r
  private val FlagsCountPat: Regex = """^(\d+) flags?$""".r
  private val StripTagsPat: Regex = """<[^>]+>""".r

  /** The reference synthesizes flag-row IDs with CPython `hash(tuple)`
    * (scrapers/chat.py:109) — salted per process, not portable. We use
    * md5 over the joined parts (same information, deterministic
    * everywhere); documented deviation, same as P8 `synthetic_hash_id`. */
  private def synthId(parts: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(parts.mkString("|").getBytes(UTF_8)).map("%02x".format(_)).mkString
  }

  /** stripped_strings analog: text fragments between tags, trimmed,
    * empties dropped (bs4 Tag.stripped_strings). */
  private def strippedStrings(innerHtml: String): Seq[String] =
    StripTagsPat.split(innerHtml).iterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** Parse the staff flag log. Yearless "%b %d" timestamps take the
    * current year; the reference INTENDS to subtract a year when the
    * result is in the future but drops the corrected value on the floor
    * (scrapers/chat.py:100-105 — `ts.replace(...)` unassigned, a real
    * bug); we implement the intended semantics, like its mailbox twin
    * (scrapers/mailbox.py:45-52) does. */
  def parseFlags(room: String, html: String, now: Instant): Seq[ChatMessage] = {
    val serverNow = ZonedDateTime.ofInstant(now, ServerTz)
    LiPat.findAllMatchIn(html).flatMap { li =>
      val body = li.group(1)
      for {
        title <- ItemTitlePat.findFirstMatchIn(body).map(_.group(1))
        after <- ItemAfterPat.findFirstMatchIn(body).map(_.group(1))
      } yield {
        val parts = strippedStrings(title)
        if (parts.length < 3) throw new ParseError(s"Unable to parse flag title: $title")
        val ts = parseYearless(parts(0), serverNow)
        val flagsN = strippedStrings(after).headOption.flatMap {
          case FlagsCountPat(n) => Some(n.toInt); case _ => None
        }.getOrElse(0)
        ChatMessage(room = room, id = synthId(parts), ts = toTs(ts), emblem = "",
          username = parts(1), content = parts(2).drop(2), flags = flagsN,
          deleted = false, deletedTs = None)
      }
    }.toSeq
  }

  // -------------------------------------------------------------------
  // S4 html_scan_profile (scrapers/user.py:22-62)
  // -------------------------------------------------------------------

  private val FriendsLinkPat: Regex = """href="members\.php\?type=friended&id=(\d+)"""".r
  private val CardPat = "class=\"card\""
  private val AdminImgPat: Regex = """<img src=['"]/img/items/admin\.png['"]""".r
  private val StrongPat: Regex = """<strong>([^<]*)</strong>""".r

  /** Parse a profile page into a user snapshot: numeric user id from the
    * friends link, staff role from the admin badge in the FIRST card. */
  def parseProfile(username: String, html: String, now: Instant): UserSnapshot = {
    val userId = FriendsLinkPat.findFirstMatchIn(html)
      .getOrElse(throw new ParseError("Unable to find friends link")).group(1).toLong
    // role badge search scoped to the first .card element (user.py:24-27)
    val firstCard = html.indexOf(CardPat)
    val role: Option[String] =
      if (firstCard < 0) None
      else {
        val nextCard = html.indexOf(CardPat, firstCard + CardPat.length)
        val region = html.substring(firstCard, if (nextCard < 0) html.length else nextCard)
        AdminImgPat.findFirstMatchIn(region).map { am =>
          val tail = region.substring(am.end)
          val roleStr = StrongPat.findFirstMatchIn(tail)
            .getOrElse(throw new ParseError("No role strong found")).group(1).trim
          roleStr match {
            case "Farm Hand" => "farmhand"
            case "Ranger" | "Admin" => "ranger"
            case other => throw new ParseError(s"Unknown role string: '$other'")
          }
        }
      }
    UserSnapshot(userId = userId, ts = Timestamp.from(now), username = username,
      isFarmhand = role.contains("farmhand"), isRanger = role.contains("ranger"))
  }

  // -------------------------------------------------------------------
  // S5 html_scan_online (scrapers/user.py:65-70)
  // -------------------------------------------------------------------

  private val ProfileHrefPat: Regex = """<a href="(profile\.php\?[^"]*)"""".r

  /** Yield usernames from profile links, in document order. */
  def parseOnline(html: String): Seq[String] =
    ProfileHrefPat.findAllMatchIn(html).flatMap(m => qsParam(m.group(1), "user_name")).toSeq

  // -------------------------------------------------------------------
  // S6 html_scan_mailbox (scrapers/mailbox.py:25-96)
  // -------------------------------------------------------------------

  private val InboxStart = "id=\"inbox\""
  private val MailRowPat: Regex =
    """(?s)<a href="message\.php\?id=(\d+)"[^>]*class="item-link[^"]*">(.*?)</a>""".r
  private val TitleStylePat: Regex = """<div class="item-title" style="([^"]*)"""".r

  /** Parse the inbox listing into (id, unread) rows. */
  def parseMailbox(html: String): Seq[MailboxRow] = {
    val start = html.indexOf(InboxStart)
    if (start < 0) throw new ParseError("Unable to find inbox")
    val endTab = html.indexOf("id=\"sent\"", start)
    val inbox = html.substring(start, if (endTab < 0) html.length else endTab)
    MailRowPat.findAllMatchIn(inbox).map { m =>
      val unread = TitleStylePat.findFirstMatchIn(m.group(2))
        .exists(_.group(1).contains("bold"))
      MailboxRow(id = m.group(1).toLong, unread = unread)
    }.toSeq
  }

  private val CardHeaderPat: Regex = """(?s)<div class="card-header">(.*?)</div>""".r
  private val CardInnerPat: Regex = """(?s)<div class="card-content-inner">(.*?)</div>\s*(?=</div>|<div)""".r
  private val MailProfilePat: Regex = """<a href="(profile\.php\?[^"]*)">[^<]*</a>([^<]*)""".r
  private val MailTsPat: Regex = """on (.+? [AP]M)(\s|$)""".r

  /** Parse a single mail page (scrapers/mailbox.py:25-60): subject from
    * the card header, body from the first card inner (html5-serialized),
    * sender + yearless timestamp from the meta inner (year-rollover
    * repaired, W4). */
  def parseMessage(id: Long, html: String, now: Instant): Mail = {
    val subject = CardHeaderPat.findFirstMatchIn(html)
      .getOrElse(throw new ParseError("Unable to find title element")).group(1).trim
    val inners = CardInnerPat.findAllMatchIn(html).map(_.group(1)).toSeq
    if (inners.length < 2) throw new ParseError(s"Wrong number of card inners: ${inners.length}")
    val meta = inners(1)
    val prof = MailProfilePat.findFirstMatchIn(meta)
      .getOrElse(throw new ParseError("Unable to find profile link"))
    val username = qsParam(prof.group(1), "user_name")
      .getOrElse(throw new ParseError("No user_name in profile link"))
    val tsStr = MailTsPat.findFirstMatchIn(prof.group(2))
      .getOrElse(throw new ParseError(s"Unable to parse timestamp: ${prof.group(2)}")).group(1)
    val ts = parseYearless(tsStr, ZonedDateTime.ofInstant(now, ServerTz))
    Mail(id = id, username = username, ts = toTs(ts), subject = subject,
      content = normalizeContent(inners.head))
  }
}
