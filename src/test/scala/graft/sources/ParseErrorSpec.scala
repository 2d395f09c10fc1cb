package graft.sources

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite

/** The error channel: parsers are strict/fail-fast like the reference
  * (scrapers/errors.py; ParseError raised 15× across its parsers) —
  * malformed pages throw with a diagnostic, they do not yield rows. */
class ParseErrorSpec extends AnyFunSuite {
  private val Now = Instant.parse("2022-04-17T23:59:59Z")

  test("chat block without a timestamp span fails") {
    val e = intercept[ParseError] {
      HtmlParsers.parseChat("r", """<div class="chat-txt ">no ts here</div>""", Now)
    }
    assert(e.getMessage.contains("timestamp"))
  }

  test("chat block without a delChat link fails") {
    val e = intercept[ParseError] {
      HtmlParsers.parseChat("r",
        """<div class="chat-txt "><span style="color:gray">01:02:03 PM</span>rest</div>""", Now)
    }
    assert(e.getMessage.contains("message ID"))
  }

  test("profile without a friends link fails") {
    val e = intercept[ParseError] {
      HtmlParsers.parseProfile("u", "<html>nope</html>", Now)
    }
    assert(e.getMessage.contains("friends link"))
  }

  test("profile with admin badge but unknown role string fails") {
    val html =
      """<a href="members.php?type=friended&id=7">f</a>
        |<div class="card"><img src='/img/items/admin.png'><strong>Emperor</strong></div>"""
        .stripMargin
    val e = intercept[ParseError] { HtmlParsers.parseProfile("u", html, Now) }
    assert(e.getMessage.contains("Unknown role"))
  }

  test("mailbox page without an inbox fails") {
    val e = intercept[ParseError] { HtmlParsers.parseMailbox("<html></html>") }
    assert(e.getMessage.contains("inbox"))
  }

  test("mail page with wrong card structure fails") {
    val e = intercept[ParseError] {
      HtmlParsers.parseMessage(1, """<div class="card-header">s</div>""", Now)
    }
    assert(e.getMessage.contains("card inners"))
  }

  test("valid role strings map like the reference (user.py:35-39)") {
    def page(role: String) =
      s"""<a href="members.php?type=friended&id=7">f</a>
         |<div class="card"><img src='/img/items/admin.png'><strong>$role</strong></div>"""
        .stripMargin
    assert(HtmlParsers.parseProfile("u", page("Farm Hand"), Now).isFarmhand)
    assert(HtmlParsers.parseProfile("u", page("Ranger"), Now).isRanger)
    assert(HtmlParsers.parseProfile("u", page("Admin"), Now).isRanger) // Admin → ranger
  }
}
