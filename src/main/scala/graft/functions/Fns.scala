package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library (SURVEY.md §2.7 F1-F17), faithful to the
  * reference's compiled regexes and datetime conventions. Every function
  * is a composition of built-in (codegen'd) expressions — no UDFs.
  *
  * The raw patterns are the *spec* of the reference's behavior:
  *   - MessageIdPat / FlagsPat      scrapers/chat.py:19-20
  *   - ForcepathPat / AtLinkPat     scrapers/chat.py:21-25
  *   - MentionPat                   firestore/chat.py:13
  *   - FriendsLinkPat / ProfilePat  scrapers/user.py:16-17
  */
object Fns {
  // F1: message ID out of the delete-link href.
  val MessageIdPat = """^javascript:(?:un)?delChat\((\d+)\)$"""
  def messageId(href: Column): Column = regexp_extract(href, MessageIdPat, 1)

  // F2: flag count out of the "<n> flags" badge.
  val FlagsPat = """^(\d+) flags?$"""
  def flagCount(s: Column): Column = {
    val m = regexp_extract(s, FlagsPat, 1)
    when(m === "", lit(0)).otherwise(m.cast("int"))
  }

  // F3: content normalization — any "<strong>xxxpath</strong>" → Forcepath.
  val ForcepathPat = """<strong>\w+path</strong>"""
  def normalizeForcepath(c: Column): Column =
    regexp_replace(c, ForcepathPat, "<strong>Forcepath</strong>")

  // F4: profile-link anchors rewritten to "@name:" text.
  val AtLinkPat =
    """<a class="close-panel" href="profile.php\?user_name=[^">]+" style="color:teal">(@[^">]+)</a>"""
  def rewriteAtLinks(c: Column): Column = regexp_replace(c, AtLinkPat, "$1:")

  /** F5: mention extraction — the reference's exact pattern, including the
    * bounded lazy quantifier + lookahead (Java regex handles both; RE2 does
    * not, so the DuckDB-oracle query uses a simplified pattern and this one
    * is covered by the ported 11-case golden table in MentionSpec).
    */
  val MentionPat = """@([^:\s]+(?:[^:]{0,29}?[^:\s](?=:))?)"""
  def mentions(c: Column): Column = regexp_extract_all(c, lit(MentionPat), lit(1))

  // F6: link-shape matchers.
  val FriendsLinkPat = """^members.php\?type=friended&id=(\d+)$"""
  val ProfileLinkPat = """^profile.php\?"""
  def friendsLinkUserId(href: Column): Column = {
    // regexp_extract yields '' on no-match; ANSI cast('' as long) throws,
    // so null it first (the reference returns None on no-match too).
    val m = regexp_extract(href, FriendsLinkPat, 1)
    when(m === "", lit(null)).otherwise(m).cast("long")
  }

  // F7: <br> → newline, take first line; split-once command parsing.
  val BrPat = """<br\s*/?>"""
  def firstLine(c: Column): Column =
    split(regexp_replace(c, BrPat, "\n"), "\n").getItem(0)
  def commandName(c: Column): Column =
    lower(regexp_extract(firstLine(c), """^(\S+)""", 1)) // bots/base.py:44 lowercases
  def commandArgs(c: Column): Column =
    regexp_extract(firstLine(c), """^\S+\s+(.*)$""", 1)

  // F9: drop a 2-char prefix (parts[2][2:], scrapers/chat.py:113).
  def dropPrefix2(c: Column): Column = substring(c, 3, Int.MaxValue)

  // F10: composite map key "{ts}|{username}" (firestore/chat.py:51).
  def compositeKey(cols: Column*): Column = concat_ws("|", cols: _*)

  // F11+F12: parse the server's "%b %d, %I:%M:%S %p" (no year) in
  // America/Chicago and normalize to UTC; year supplied by the caller
  // (the reference uses the current year then W4-repairs).
  def parseServerTs(s: Column, year: Column): Column =
    to_utc_timestamp(
      to_timestamp(concat(year, lit(" "), s), "yyyy MMM dd, hh:mm:ss a"),
      "America/Chicago")

  // F16: custom-claims JSON with conditional keys (models/user.py:27-33):
  // role key is omitted entirely when there is no role.
  def claimsJson(username: Column, role: Column): Column =
    concat(lit("""{"username":""""), username, lit("\""),
      when(role.isNotNull, concat(lit(""","role":""""), role, lit("\""))).otherwise(lit("")),
      lit("}"))

  // F17: fixed-length sanity check (bots/firebase.py:12).
  def isFirebaseUid(c: Column): Column = length(c) === 28
}
