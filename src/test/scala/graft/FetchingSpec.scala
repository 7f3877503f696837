package graft

import graft.domain.Policy
import graft.ingest.Fetching
import graft.ingest.Fetching._

/** S7 — governed-fetcher decision functions: robots.txt allow/deny
  * (RFC 9309 longest-match semantics), token-bucket rate admission,
  * captcha sniff, and the composed gate. Reference behavior:
  * `services/api/src/connectors/fetcher.ts:11-92`. */
class FetchingSpec extends SparkSpec {

  private val fixtureRobots =
    """# site robots fixture
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/press/
      |Disallow: /search
      |Disallow: /*.pdf$
      |
      |User-agent: graftbot
      |Disallow: /graft-only/
      |
      |User-agent: banned-bot
      |Disallow: /
      |Sitemap: https://example.org/sitemap.xml
      |""".stripMargin

  private val robots = parseRobots(fixtureRobots)

  test("robots: parse groups and per-agent selection") {
    assert(robots.groups.length === 3)
    // wildcard group applies to unknown agents
    assert(!robots.isAllowed("somebot/1.0", "/private/x"))
    assert(robots.isAllowed("somebot/1.0", "/public/x"))
    // specific group REPLACES the wildcard group (RFC 9309): graftbot
    // gets only its own rules, so /private is allowed for it
    assert(!robots.isAllowed("graftbot/2.1", "/graft-only/page"))
    assert(robots.isAllowed("graftbot/2.1", "/private/x"))
    // fully banned agent
    assert(!robots.isAllowed("banned-bot", "/anything"))
  }

  test("robots: longest-match precedence, Allow wins ties, $ anchor, *") {
    // Allow /private/press/ is longer than Disallow /private/
    assert(robots.isAllowed("somebot", "/private/press/release-1"))
    assert(!robots.isAllowed("somebot", "/private/other"))
    // $-anchored wildcard: blocks .pdf urls only at end-of-path
    assert(!robots.isAllowed("somebot", "/docs/file.pdf"))
    assert(robots.isAllowed("somebot", "/docs/file.pdf.html"))
    // prefix match without anchor
    assert(!robots.isAllowed("somebot", "/search?q=x"))
    // robots.txt itself always allowed
    assert(robots.isAllowed("banned-bot", "/robots.txt"))
  }

  test("robots: empty/absent files allow everything; junk lines ignored") {
    assert(parseRobots("").isAllowed("any", "/x"))
    assert(parseRobots("not a robots file\n<<<>>>").isAllowed("any", "/x"))
    // empty Disallow value matches nothing (allow-all idiom)
    val allowAll = parseRobots("User-agent: *\nDisallow:")
    assert(allowAll.isAllowed("any", "/deep/path"))
  }

  test("token bucket: burst then sustained rps, deterministic waits") {
    val rps = 2.0; val burst = 3
    var st = TokenBucket.start(nowMs = 0L, burst)
    // the burst is admitted back-to-back at t=0
    val burstOut = (1 to 3).map { _ =>
      val (ok, next, wait) = TokenBucket.admit(st, 0L, rps, burst)
      st = next; (ok, wait)
    }
    assert(burstOut.forall { case (ok, w) => ok && w == 0L })
    // 4th request at t=0 is denied with the exact accrual wait (500ms at 2 rps)
    val (ok4, st4, wait4) = TokenBucket.admit(st, 0L, rps, burst)
    assert(!ok4 && wait4 === 500L)
    st = st4
    // after the advertised wait it is admitted
    val (ok5, st5, _) = TokenBucket.admit(st, wait4, rps, burst)
    assert(ok5)
    st = st5
    // long idle refills to the cap, never beyond
    val (_, st6, _) = TokenBucket.admit(st, 1000000L, rps, burst)
    assert(st6.tokens === burst - 1.0)
  }

  test("captcha sniff matches the reference's three markers") {
    assert(looksLikeCaptcha("<html>Please solve this CAPTCHA</html>"))
    assert(looksLikeCaptcha("<h1>Access Denied</h1>"))
    assert(looksLikeCaptcha("bot detection in progress"))
    assert(!looksLikeCaptcha("<html>ordinary regulation text</html>"))
  }

  test("composed gate honors the policy's enforcement flags") {
    val policy = Policy.referencePolicy
    assert(decide(policy, Some(robots), "somebot", "/private/x")
      === Blocked("robots.txt disallows /private/x"))
    assert(decide(policy, Some(robots), "somebot", "/public/x") === Allowed)
    assert(decide(policy, Some(robots), "somebot", "/public/x",
      body = Some("captcha here")).isInstanceOf[Blocked])
    // flags off → everything passes
    val lax = policy.copy(robotsEnforced = false, denyOnCaptcha = false)
    assert(decide(lax, Some(robots), "somebot", "/private/x",
      body = Some("captcha")) === Allowed)
    // robots unavailable (fetch failed) → allowed, like the reference
    assert(decide(policy, None, "somebot", "/private/x") === Allowed)
  }

  test("robotsAdmitted filters a candidates DataFrame distributedly") {
    import spark.implicits._
    val cands = Seq(
      ("https://example.org/private/page", "t1"),
      ("https://www.example.org/private/press/ok", "t2"),
      ("https://example.org/public/page", "t3"),
      ("https://other.org/anything", "t4"), // no robots known → allowed
      ("not a url", "t5"))
      .toDF("url", "title")
    val got = Fetching.robotsAdmitted(cands, Policy.referencePolicy,
      Map("example.org" -> fixtureRobots), "somebot")
      .select("title").as[String].collect().toSet
    assert(got === Set("t2", "t3", "t4"))
    // enforcement off passes everything through untouched
    val lax = Policy.referencePolicy.copy(robotsEnforced = false)
    assert(Fetching.robotsAdmitted(cands, lax, Map.empty, "somebot")
      .count() === 5)
  }
}
