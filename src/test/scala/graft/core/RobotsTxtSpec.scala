package graft.core

import org.scalatest.funsuite.AnyFunSuite

class RobotsTxtSpec extends AnyFunSuite {

  private val body =
    """# site robots
      |User-agent: graftbot
      |Disallow: /private
      |
      |User-agent: *
      |Disallow: /p1
      |Allow: /p13
      |Crawl-delay: 5
      |
      |User-agent: *
      |Disallow: /*4$
      |""".stripMargin

  test("parse: group selection — exact agent beats *, * groups merge") {
    val star = RobotsTxt.parse(body, "*")
    assert(star == IndexedSeq((false, "/p1"), (true, "/p13"), (false, "/*4$")),
      star.toString)
    // exact (case-insensitive) agent match selects ONLY its group
    val bot = RobotsTxt.parse(body, "GraftBot")
    assert(bot == IndexedSeq((false, "/private")), bot.toString)
    // an agent with no group of its own falls back to the * groups
    assert(RobotsTxt.parse(body, "otherbot") == star)
  }

  test("parse: comments, empty disallow, dangling rules, unknown fields") {
    // empty Disallow value = explicit allow-all -> NO rule
    assert(RobotsTxt.parse("User-agent: *\nDisallow:\n", "*").isEmpty)
    // a rule before any group header is dangling -> ignored
    assert(RobotsTxt.parse("Disallow: /x\nUser-agent: *\nDisallow: /y\n", "*")
      == IndexedSeq((false, "/y")))
    // comment-only and malformed lines are skipped; an unknown field
    // ends a user-agent run, so the NEXT user-agent starts a new group
    val two = RobotsTxt.parse(
      "User-agent: a\nSitemap: http://x/s.xml\nUser-agent: b\nDisallow: /b\n",
      "b")
    assert(two == IndexedSeq((false, "/b")))
    assert(RobotsTxt.parse(
      "User-agent: a\nSitemap: http://x/s.xml\nUser-agent: b\nDisallow: /b\n",
      "a").isEmpty, "group a's header run ended before the rules")
    // consecutive user-agent lines share one group
    val shared = RobotsTxt.parse(
      "User-agent: a\nUser-agent: b\nDisallow: /ab\n", "a")
    assert(shared == IndexedSeq((false, "/ab")))
  }

  test("matches: raw prefix, * wildcard, $ anchor") {
    assert(RobotsTxt.matches("/p1", "/p1"))
    assert(RobotsTxt.matches("/p13", "/p1"), "REP prefixes are octet-level")
    assert(RobotsTxt.matches("/p1/x", "/p1"))
    assert(!RobotsTxt.matches("/q/p1", "/p1"), "match is start-anchored")
    assert(RobotsTxt.matches("/a/b/file.pdf", "/*.pdf"))
    assert(RobotsTxt.matches("/a/b/file.pdf", "/*.pdf$"))
    assert(!RobotsTxt.matches("/a/file.pdf/x", "/*.pdf$"), "$ anchors the end")
    assert(RobotsTxt.matches("/a/file.pdf/x", "/*.pdf"), "unanchored * still hits")
    assert(RobotsTxt.matches("/p4", "/*4$"))
    assert(!RobotsTxt.matches("/p4/", "/*4$"))
    assert(RobotsTxt.matches("/x?page=4", "/*4$"), "query rides the target")
    // '*' may match empty; multiple stars backtrack
    assert(RobotsTxt.matches("/ab", "/*a*b"))
    assert(!RobotsTxt.matches("/ba", "/*a*b$"))
  }

  test("matches: pathological many-star patterns stay linear (untrusted input)") {
    // robots.txt is third-party input evaluated once per page of the
    // host: a backtracking matcher is O(n^stars) on this shape and
    // wedges an executor; the two-pointer matcher must answer instantly
    val pat = "/" + ("*a" * 24) + "b$"
    val target = "/" + ("a" * 600)
    val t0 = System.nanoTime()
    assert(!RobotsTxt.matches(target, pat))
    assert(RobotsTxt.matches(target + "b", pat))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 1000, s"pathological pattern took ${ms}ms — not linear")
  }

  test("disallowed: longest pattern wins, Allow wins ties, no match allows") {
    val rules = Seq((false, "/p1"), (true, "/p13"))
    assert(RobotsTxt.disallowed("/p1", rules))
    assert(RobotsTxt.disallowed("/p10", rules))
    assert(!RobotsTxt.disallowed("/p13", rules), "longer Allow overrides")
    assert(!RobotsTxt.disallowed("/p13/x", rules))
    assert(!RobotsTxt.disallowed("/other", rules))
    assert(!RobotsTxt.disallowed("/p1", Nil), "no rules = allowed")
    // exact tie: Allow wins, in either order
    assert(!RobotsTxt.disallowed("/t", Seq((false, "/t"), (true, "/t"))))
    assert(!RobotsTxt.disallowed("/t", Seq((true, "/t"), (false, "/t"))))
  }
}
