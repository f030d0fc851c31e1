package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt evaluation (RFC 9309, "Robots Exclusion Protocol") — the
  * politeness component of the crawl front end: which of a domain's URLs a
  * crawler may fetch. Implements the RFC's semantics precisely:
  *
  *  - groups are runs of `User-agent:` lines followed by rules; a crawler
  *    obeys the group whose agent token is the LONGEST case-insensitive
  *    prefix-token match of its product name, falling back to the `*`
  *    group (RFC 9309 §2.2.1);
  *  - `Allow:` / `Disallow:` patterns match path prefixes with `*`
  *    (any octets) and `$` (end anchor) wildcards (§2.2.3);
  *  - the rule with the MOST OCTETS in its pattern wins; at equal length
  *    Allow wins (§2.2.2); no matching rule — or no applicable group, or
  *    an empty Disallow — means allowed.
  *
  * Scale shape: evaluation is a per-row compiled kernel
  * ([[graft.functions.RobotsAllowedExpr]]) over (robots text, path) pairs
  * — a crawl partition typically carries few DISTINCT robots bodies (one
  * per domain), so the kernel memoizes parsed rule lists per robots text
  * (capped), making the parse ~O(distinct domains) per partition. The
  * robots table joins to pages by registrable domain BEFORE this
  * projection (a broadcast join — the robots side is domains, not pages).
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  /** Parse robots.txt into (agent tokens → rules) groups and select the
    * rules the given agent must obey (most-specific agent group, `*`
    * fallback, no group → Nil = everything allowed).
    */
  def rulesFor(txt: String, agent: String): Seq[Rule] = {
    val a = agent.toLowerCase
    // (agents, rules) groups: User-agent lines start a new group unless the
    // previous line was also a User-agent line (multi-agent groups)
    val groups = scala.collection.mutable.ArrayBuffer.empty[(List[String], scala.collection.mutable.ArrayBuffer[Rule])]
    var inAgents = false
    for (raw <- txt.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents || groups.isEmpty)
              groups += ((List(value.toLowerCase), scala.collection.mutable.ArrayBuffer.empty[Rule]))
            else {
              val (as, rs) = groups.last
              groups(groups.length - 1) = ((value.toLowerCase :: as, rs))
            }
            inAgents = true
          case "allow" | "disallow" =>
            inAgents = false
            // an empty Disallow means "allow everything" — representable
            // as no rule at all (it can never be the longest match)
            if (value.nonEmpty && groups.nonEmpty)
              groups.last._2 += Rule(field == "allow", value)
          case _ => inAgents = false // Sitemap, Crawl-delay, unknown fields
        }
      }
    }
    // most specific agent match (RFC 9309 §2.2.1, the major-crawler
    // convention): the group token must be a case-insensitive prefix of
    // the product name (exact match included), longest token wins; '*'
    // matches anything with specificity -1. ALL groups at the winning
    // specificity merge (the RFC: matching groups' rules MUST be combined
    // — CMS plugins routinely emit several same-token groups)
    def specificity(agents: List[String]): Int =
      agents.iterator.map { tok =>
        if (tok == "*") -1
        else if (a.startsWith(tok)) tok.length
        else -2
      }.max
    val bestLen = if (groups.isEmpty) -2
      else groups.iterator.map(g => specificity(g._1)).max
    if (bestLen == -2) Nil
    else groups.iterator.filter(g => specificity(g._1) == bestLen)
      .flatMap(_._2).toSeq
  }

  /** RFC 9309 pattern match: literal prefix with `*` = any octets and a
    * trailing `$` anchoring the end of the path. Translated once per
    * distinct pattern to an anchored regex (quoted literals joined by
    * `.*`) — backtracking gives the correct greedy `*`/`$` interaction —
    * and memoized (bounded: patterns are robots-file text, not data).
    */
  private val patternCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  private val PatternCacheCap = 1 << 16

  def matches(pattern: String, path: String): Boolean = {
    var p = patternCache.get(pattern)
    if (p == null) {
      val anchored = pattern.endsWith("$")
      val body = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
      val rx = body.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*") +
        (if (anchored) "$" else "")
      p = java.util.regex.Pattern.compile(rx)
      if (patternCache.size < PatternCacheCap) patternCache.put(pattern, p)
    }
    p.matcher(path).lookingAt()
  }

  /** Longest-match decision over a group's rules (§2.2.2): most pattern
    * octets wins, Allow wins ties, no match ⇒ allowed.
    */
  def isAllowed(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    for (r <- rules if matches(r.pattern, path)) {
      val len = r.pattern.length
      if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
        bestLen = len; bestAllow = r.allow
      }
    }
    bestAllow
  }

  def allowedColumn(robotsTxt: Column, path: Column, agent: String): Column =
    graft.functions.textkernel.robots_allowed(robotsTxt, path, agent)

  /** Filter a (page) frame to the rows the agent may crawl; `robotsCol`
    * carries the domain's robots.txt body (joined upstream by registrable
    * domain, broadcast — the robots side is domain-sized).
    */
  def filterAllowed(docs: DataFrame, robotsCol: String, pathCol: String,
                    agent: String): DataFrame =
    docs.filter(allowedColumn(col(robotsCol), col(pathCol), agent))
}
