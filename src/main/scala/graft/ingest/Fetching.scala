package graft.ingest

import org.apache.spark.sql.DataFrame

import graft.domain.Policy.TrustPolicy

/** S7 — the governed fetcher's DECISION functions (reference:
  * `services/api/src/connectors/fetcher.ts:11-92`), implemented as
  * deterministic, network-free pure functions: the fetch loop itself
  * (HTTP, retries) stays outside the relational core, but everything
  * that decides WHETHER a fetch may happen — robots.txt allow/deny,
  * per-domain rate admission, captcha/anti-bot denial — is pure logic
  * and is implemented and tested here. A real fetcher (or a test)
  * threads state through these functions; nothing here touches the
  * network or a clock.
  */
object Fetching {

  // ---- robots.txt (fetcher.ts:67-88, RFC 9309 semantics) ----

  /** One parsed robots.txt rule: `allow` is the Allow/Disallow kind,
    * `pattern` supports `*` (any chars) and a trailing `$` anchor. */
  final case class RobotsRule(allow: Boolean, pattern: String)

  /** A user-agent group: the agent product tokens it applies to
    * (lowercased; `*` = wildcard group) and its rules in file order. */
  final case class RobotsGroup(agents: Seq[String], rules: Seq[RobotsRule])

  final case class Robots(groups: Seq[RobotsGroup]) {

    /** RFC 9309 group selection: the group whose user-agent token is
      * the LONGEST case-insensitive prefix of `userAgent` wins; the
      * `*` group is the fallback. */
    private def groupFor(userAgent: String): Option[RobotsGroup] = {
      val ua = userAgent.toLowerCase
      val specific = groups.flatMap { g =>
        g.agents.filter(a => a != "*" && ua.startsWith(a))
          .map(a => (a.length, g))
      }
      if (specific.nonEmpty) Some(specific.maxBy(_._1)._2)
      else groups.find(_.agents.contains("*"))
    }

    /** RFC 9309 rule matching: the longest (by octet length) matching
      * pattern decides; Allow wins a length tie; no match → allowed;
      * `/robots.txt` itself is always allowed. */
    def isAllowed(userAgent: String, path: String): Boolean = {
      if (path == "/robots.txt") return true
      val p = if (path.isEmpty) "/" else path
      groupFor(userAgent) match {
        case None => true
        case Some(g) =>
          val matching = g.rules.filter(r =>
            r.pattern.nonEmpty && patternMatches(r.pattern, p))
          if (matching.isEmpty) true
          else {
            val best = matching.map(r => (r.pattern.length, r.allow))
            val maxLen = best.map(_._1).max
            best.filter(_._1 == maxLen).exists(_._2) // Allow wins ties
          }
      }
    }
  }

  /** `*` = any char run, trailing `$` = end anchor, everything else
    * literal; patterns match path prefixes unless `$`-anchored. */
  private[ingest] def patternMatches(pattern: String, path: String): Boolean = {
    val (body, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true)
      else (pattern, false)
    val regex = body.split("\\*", -1).map(java.util.regex.Pattern.quote)
      .mkString(".*")
    val full = if (anchored) regex + "$" else regex + ".*"
    java.util.regex.Pattern.compile("^" + full).matcher(path).find()
  }

  /** Parse robots.txt text: `field: value` lines, `#` comments,
    * case-insensitive field names; consecutive `User-agent` lines
    * open a group whose rules run until the next group starts. Lines
    * that parse as neither are ignored (RFC 9309 §2.2.2). */
  def parseRobots(text: String): Robots = {
    final case class St(groups: Vector[RobotsGroup],
        agents: Vector[String], rules: Vector[RobotsRule], inAgents: Boolean)
    def flush(st: St): Vector[RobotsGroup] =
      if (st.agents.nonEmpty) st.groups :+ RobotsGroup(st.agents, st.rules)
      else st.groups
    val fin = text.split("\n").foldLeft(St(Vector.empty, Vector.empty,
      Vector.empty, inAgents = false)) { (st, raw) =>
      val line = raw.takeWhile(_ != '#').trim
      line.split(":", 2) match {
        case Array(f, v) =>
          val field = f.trim.toLowerCase
          val value = v.trim
          field match {
            case "user-agent" =>
              if (st.inAgents) St(st.groups, st.agents :+ value.toLowerCase,
                st.rules, inAgents = true)
              else St(flush(st), Vector(value.toLowerCase), Vector.empty,
                inAgents = true)
            case "allow" =>
              St(st.groups, st.agents,
                st.rules :+ RobotsRule(allow = true, value), inAgents = false)
            case "disallow" =>
              St(st.groups, st.agents,
                st.rules :+ RobotsRule(allow = false, value), inAgents = false)
            case _ => st.copy(inAgents = false) // crawl-delay/sitemap/unknown
          }
        case _ => st
      }
    }
    Robots(flush(fin))
  }

  // ---- per-domain rate admission (fetcher.ts:57-65) ----
  // The reference sleeps to the domain's next-allowed instant
  // (fixed-interval, 1/rps). This generalizes it to the token bucket
  // the policy fields describe (perDomainRps + burst): bursts up to
  // `burst` are admitted immediately, sustained throughput converges
  // to `rps`. Pure state-in/state-out — the caller owns time.

  /** Bucket state for one domain: available tokens and the instant
    * they were measured. `TokenBucket.start` gives a full bucket. */
  final case class BucketState(tokens: Double, asOfMs: Long)

  object TokenBucket {
    def start(nowMs: Long, burst: Int): BucketState =
      BucketState(math.max(1, burst).toDouble, nowMs)

    /** Admit one request if a whole token is available after refill.
      * Returns the decision, the next state, and — when denied — the
      * wait until a token accrues (what a fetch loop would sleep). */
    def admit(st: BucketState, nowMs: Long, rps: Double, burst: Int)
        : (Boolean, BucketState, Long) = {
      val cap = math.max(1, burst).toDouble
      val elapsed = math.max(0L, nowMs - st.asOfMs)
      val tokens = math.min(cap, st.tokens + elapsed / 1000.0 * rps)
      if (tokens >= 1.0) (true, BucketState(tokens - 1.0, nowMs), 0L)
      else {
        val waitMs = math.ceil((1.0 - tokens) / rps * 1000.0).toLong
        (false, BucketState(tokens, nowMs), waitMs)
      }
    }
  }

  // ---- captcha / anti-bot sniff (fetcher.ts:90-93) ----

  /** The reference's heuristic, verbatim semantics: any of the three
    * markers anywhere in the (lowercased) page body. */
  def looksLikeCaptcha(html: String): Boolean = {
    val lower = html.toLowerCase
    lower.contains("captcha") || lower.contains("access denied") ||
      lower.contains("bot detection")
  }

  // ---- the composed gate ----

  sealed trait Decision
  case object Allowed extends Decision
  final case class Blocked(reason: String) extends Decision

  /** The fetch-or-not decision the reference makes across
    * `fetchHtml`/`enforceRobots`/`looksLikeCaptcha`, as one pure
    * function of policy + parsed robots + (optionally) a fetched
    * body. Rate admission is separate ([[TokenBucket.admit]])
    * because it alone threads state. */
  def decide(policy: TrustPolicy, robots: Option[Robots],
      userAgent: String, path: String,
      body: Option[String] = None): Decision = {
    if (policy.robotsEnforced &&
        !robots.forall(_.isAllowed(userAgent, path)))
      Blocked(s"robots.txt disallows $path")
    else if (policy.denyOnCaptcha && body.exists(looksLikeCaptcha))
      Blocked("captcha or anti-bot detected")
    else Allowed
  }

  /** Dataflow wrapper: filter a candidates DataFrame to urls the
    * robots policies admit. Parsed robots are driver-parsed once per
    * domain and shipped in the closure (robots files are control
    * plane: O(domains), not O(rows)); the filter itself runs
    * distributed. */
  def robotsAdmitted(candidates: DataFrame, policy: TrustPolicy,
      robotsByDomain: Map[String, String], userAgent: String): DataFrame = {
    if (!policy.robotsEnforced) return candidates
    val parsed = robotsByDomain.map { case (d, txt) => d -> parseRobots(txt) }
    val spark = candidates.sparkSession
    val bc = spark.sparkContext.broadcast(parsed)
    val urlIdx = candidates.schema.fieldIndex("url")
    candidates.filter { row: org.apache.spark.sql.Row =>
      val url = row.getString(urlIdx)
      val uri = try new java.net.URI(url) catch { case _: Exception => null }
      uri != null && {
        val host = Option(uri.getHost).getOrElse("").stripPrefix("www.")
        val path = Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/") +
          Option(uri.getRawQuery).map("?" + _).getOrElse("")
        bc.value.get(host).forall(_.isAllowed(userAgent, path))
      }
    }
  }
}
