package graft.core

/** robots.txt (REP, RFC 9309) parsing and path matching — the SITE-level
  * crawl opt-out, the companion of the page-level robots meta
  * ([[HtmlText.metaRobots]]). Pure JVM kernel: the Catalyst expressions
  * ([[org.apache.spark.sql.graft.RobotsRules]] /
  * [[org.apache.spark.sql.graft.RobotsDisallowed]]) and the Python
  * oracle mirror both re-state exactly these rules.
  *
  * Implemented subset, stated:
  *  - Lines are `field: value` with `#` comments stripped; unknown
  *    fields (crawl-delay, sitemap, ...) are ignored but still END a
  *    user-agent header run, per the grammar.
  *  - Groups: consecutive `User-agent` lines form one group header;
  *    `Allow`/`Disallow` lines after it belong to the group. Rules from
  *    ALL groups naming the crawling agent merge (RFC 9309 §2.2.1);
  *    agent matching is an exact case-insensitive product-token match,
  *    falling back to the `*` groups — the longest-prefix product-token
  *    refinement is out of scope for a generic pipeline crawler, which
  *    matches either its own name or `*`.
  *  - An empty `Disallow:` value is the explicit allow-all — it
  *    produces NO rule.
  *  - Patterns match path-and-query (`/path?query`) from the first
  *    character, case-SENSITIVELY (REP paths are case-sensitive); `*`
  *    matches any octet sequence; a trailing `$` anchors the match at
  *    the end. Percent-encoding normalization is out of scope (both
  *    sides are matched as given), stated.
  *  - Verdict: among matching rules, the LONGEST raw pattern wins
  *    (octet count, metacharacters included — the deterministic
  *    reading of RFC 9309 §2.2.2's "most specific"); on a tie, Allow
  *    wins. No matching rule means allowed.
  */
object RobotsTxt {

  /** Parse a robots.txt body and select the rule list for `agent`:
    * `(allow, pattern)` pairs, document order. */
  def parse(body: String, agent: String): IndexedSeq[(Boolean, String)] = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    final class Group {
      val agents = scala.collection.mutable.ArrayBuffer.empty[String]
      val rules = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    }
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var cur: Group = null
    var inAgentRun = false
    body.split("\n", -1).foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      if (line.nonEmpty) {
        val ci = line.indexOf(':')
        if (ci > 0) {
          val field = line.substring(0, ci).trim
            .toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(ci + 1).trim
          field match {
            case "user-agent" =>
              if (!inAgentRun) { cur = new Group; groups += cur }
              cur.agents += value.toLowerCase(java.util.Locale.ROOT)
              inAgentRun = true
            case "allow" | "disallow" =>
              inAgentRun = false
              // rules before any group header are dangling per the
              // grammar — ignored, like other malformed lines
              if (cur != null && value.nonEmpty)
                cur.rules += ((field == "allow", value))
            case _ => inAgentRun = false
          }
        }
      }
    }
    val exact = groups.filter(_.agents.contains(agentLc))
    val chosen = if (exact.nonEmpty) exact
                 else groups.filter(_.agents.contains("*"))
    chosen.iterator.flatMap(_.rules).toIndexedSeq
  }

  /** Does `pattern` (with `*` wildcards, optional trailing `$` anchor)
    * match `target` from its first character? The standard two-pointer
    * glob matcher with a single most-recent-star backtrack point —
    * O(|target|·|pattern|) WORST case, linear in practice, and never
    * exponential: robots.txt patterns are third-party input in a crawl
    * pipeline, evaluated once per page of the host, so a pathological
    * many-star rule (slash, then a long alternation of stars and
    * literals, then `$`) must not be able to wedge an executor (the
    * naive per-star backtracking matcher is exactly that DoS). The
    * unanchored (prefix) case reduces to a full match of `pattern + *`,
    * which keeps one proven algorithm for both cases. */
  def matches(target: String, pattern: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val body = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val pat = if (anchored) body else body + "*"
    var s = 0
    var p = 0
    var starP = -1
    var starS = 0
    while (s < target.length) {
      if (p < pat.length && pat.charAt(p) == '*') {
        starP = p; starS = s; p += 1
      } else if (p < pat.length && pat.charAt(p) == target.charAt(s)) {
        s += 1; p += 1
      } else if (starP >= 0) {
        starS += 1; s = starS; p = starP + 1
      } else return false
    }
    while (p < pat.length && pat.charAt(p) == '*') p += 1
    p == pat.length
  }

  /** The REP verdict for one path-and-query target against a rule list:
    * longest matching raw pattern wins, Allow wins ties, no match means
    * allowed. Order-independent by construction. */
  def disallowed(target: String, rules: Iterable[(Boolean, String)]): Boolean = {
    var bestLen = -1
    var bestAllow = false
    rules.foreach { case (allow, pat) =>
      if (matches(target, pat)) {
        val l = pat.length
        if (l > bestLen) { bestLen = l; bestAllow = allow }
        else if (l == bestLen && allow) bestAllow = true
      }
    }
    bestLen >= 0 && !bestAllow
  }
}
