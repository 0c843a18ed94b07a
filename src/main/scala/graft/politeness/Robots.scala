package graft.politeness

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.RobotsRule

/** Robots.txt gate (SURVEY.md §2 #25; reference `ROBOTSTXT_OBEY = True`,
  * settings.py:22).
  *
  * Rules live in a small side table `(host, pathPrefix, allow)` joined 1:1
  * against the frontier (north_rule: "robots.txt rules as a broadcast side
  * table" — the join IS broadcast whenever the table is actually small,
  * chosen by AQE rather than forced; see [[allowed]]). RFC 9309 semantics:
  * longest-matching rule wins, Allow wins length ties (§2.2.2 "least
  * restrictive"), `*` matches any character sequence and a trailing `$`
  * anchors at path end (§2.2.3), groups may list several User-agent lines
  * (§2.2.1), `#` starts a comment; no matching rule ⇒ allowed; a host with
  * no rules at all ⇒ allowed.
  *
  * DELIBERATE DEVIATION from the reference stack: Scrapy 1.8's default
  * parser applies rules with its own precedence quirks. This engine uses
  * the RFC 9309 longest-match rule — an intentional upgrade, because
  * order-dependent verdicts make the gate's result depend on rule-file
  * serialization rather than on the rules themselves. The two differ only
  * for overlapping Allow/Disallow prefixes where the shorter rule appears
  * first; the reference's own targets publish no such overlapping rules.
  */
object Robots {

  /** Parse one robots.txt body (groups matching User-agent `*` — the
    * reference crawls with Scrapy's default UA) into rules. A group may
    * list several consecutive `User-agent:` lines that all share the
    * group's rules (RFC 9309 §2.2.1); `#` starts a comment anywhere on a
    * line (§2.2).
    */
  def parse(host: String, body: String): Seq[RobotsRule] = {
    var inStar = false
    var collectingUAs = false
    val rules = Seq.newBuilder[RobotsRule]
    body.linesIterator
      .map { l => val h = l.indexOf('#'); (if (h < 0) l else l.substring(0, h)).trim }
      .filter(_.nonEmpty)
      .foreach { line =>
        val lower = line.toLowerCase
        if (lower.startsWith("user-agent:")) {
          // consecutive UA lines open ONE group; any of them being '*'
          // makes the group's rules ours (an overwrite here dropped rules
          // of groups listing '*' anywhere but last)
          if (!collectingUAs) { inStar = false; collectingUAs = true }
          if (line.substring(11).trim == "*") inStar = true
        } else {
          collectingUAs = false
          if (inStar && lower.startsWith("disallow:")) {
            val p = line.substring(9).trim
            if (p.nonEmpty) rules += RobotsRule(host, p, allow = false)
          } else if (inStar && lower.startsWith("allow:")) {
            val p = line.substring(6).trim
            if (p.nonEmpty) rules += RobotsRule(host, p, allow = true)
          }
        }
      }
    rules.result()
  }

  /** Sitemap URLs declared in a robots.txt body, in file order. `Sitemap:`
    * lines are GROUP-INDEPENDENT (sitemaps.org protocol: unlike
    * allow/disallow they apply regardless of any User-agent group), so
    * they are collected from anywhere in the file; the key is
    * case-insensitive and `#` comments strip first, like every other line.
    * This is the discovery half of robots handling — the extracted URLs
    * feed [[graft.plan.Sitemaps.parseEntries]] and from there the
    * frontier.
    */
  def sitemapUrls(body: String): Seq[String] =
    body.linesIterator
      .map { l => val h = l.indexOf('#'); (if (h < 0) l else l.substring(0, h)).trim }
      .filter(_.nonEmpty)
      .filter(_.toLowerCase.startsWith("sitemap:"))
      // first whitespace-delimited token: a URL never contains spaces, and
      // this keeps the scalar bit-identical to the Column dual's regex
      .map(_.substring(8).trim.takeWhile(!_.isWhitespace))
      .filter(_.nonEmpty)
      .toSeq

  /** (host, sitemap_pos, sitemap_url) rows from the /robots.txt pages of
    * the page table — the DataFrame dual of [[sitemapUrls]], as a pure
    * codegen'd regexp over the body (one multiline extract-all +
    * posexplode; no UDF). SitemapExtractSpec pins column ≡ scalar on the
    * hostile bodies. Host derivation shares [[graft.urls.UrlCols.hostCol]]
    * with the frontier, same as [[rulesFromPages]].
    */
  def sitemapsFromPages(pages: DataFrame): DataFrame = {
    // per line: optional leading blanks, case-insensitive 'sitemap', blanks
    // around ':', then the URL = everything up to whitespace or a comment.
    // [^\S\r\n] = horizontal whitespace only — \s would let the key match
    // across line breaks
    val lineRe = "(?im)^[^\\S\\r\\n]*sitemap:[^\\S\\r\\n]*([^\\s#]+)"
    pages
      .filter(col("url").rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+/robots\\.txt$"))
      .select(
        graft.urls.UrlCols.hostCol(col("url")).as("host"),
        posexplode(regexp_extract_all(col("text"), lit(lineRe), lit(1)))
          .as(Seq("sitemap_pos", "sitemap_url")))
      .filter(col("sitemap_url") =!= "")
  }

  /** Robots path pattern → anchored Java regex: `*` matches any sequence,
    * a trailing `$` anchors at path end, every other character is literal
    * (RFC 9309 §2.2.3).
    */
  private[politeness] def patternToRegex(p: String): String = {
    val endAnchor = p.endsWith("$")
    val body = if (endAnchor) p.dropRight(1) else p
    val sb = new StringBuilder("^")
    body.foreach {
      case '*' => sb.append(".*"): Unit
      case c if "\\^$.|?+()[]{}".indexOf(c) >= 0 => sb.append('\\').append(c): Unit
      case c => sb.append(c): Unit
    }
    if (endAnchor) sb.append('$')
    sb.toString
  }

  /** Path component of a URL (no query/fragment), "/" if empty. */
  def pathCol(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val afterScheme = regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val path = regexp_extract(afterScheme, "^[^/?#]*(/[^?#]*)?", 1)
    when(path === "", "/").otherwise(path)
  }

  /** Keep frontier rows whose (host, path) is allowed.
    *
    * The rules are first collapsed to ONE row per host, so the join is
    * 1:1 — the frontier is never multiplied. Two arrays per host: plain
    * prefix rules matched with `startswith` (the overwhelming majority —
    * stays fully codegen), and wildcard rules (`*`/`$`) matched by a
    * pre-compiled-at-rule-time regex; the per-row regex cost is paid ONLY
    * on rows of hosts that actually publish wildcard rules. The verdict is
    * a scalar `aggregate`: longest match wins, Allow wins length ties
    * (RFC 9309 §2.2.2 — a `>`-only comparator would leave equal-length
    * Allow/Disallow ties to collect_list order, i.e. nondeterministic).
    *
    * Deliberately NOT hinted broadcast (same reasoning as the host-state
    * join in Scheduler): the rules table grows with distinct hosts crawled —
    * kilobytes for a focused crawl, multi-GB at 10^8 web hosts where a
    * forced broadcast is an OOM. AQE still picks a broadcast join whenever
    * the table is actually small, and degrades to a shuffle on host
    * otherwise.
    */
  def allowed(frontier: DataFrame, rules: DataFrame): DataFrame = {
    val rxUdf = udf((p: String) => patternToRegex(p))
    val isWild = col("pathPrefix").contains("*") || col("pathPrefix").contains("$")
    // collect_list skips the nulls the unmatched when() branches produce
    val perHost = rules
      .groupBy(col("host").as("__rhost"))
      .agg(
        collect_list(when(!isWild,
          struct(col("pathPrefix").as("p"), col("allow").as("a")))).as("__rules"),
        collect_list(when(isWild,
          struct(rxUdf(col("pathPrefix")).as("rx"),
            length(col("pathPrefix")).as("len"), col("allow").as("a")))).as("__wrules"))
    // rules match against path + query (RFC 9309 §2.2.2 matches the path
    // and optional query — '/*?sessionid=' style rules exist in the wild);
    // fragment stays excluded
    val withPath = frontier.withColumn("__path",
      concat(pathCol(col("url")), regexp_extract(col("url"), "^[^#?]*(\\?[^#]*)", 1)))
    val joined = withPath.join(perHost, col("host") === col("__rhost"), "left")
    // (len, a) beats acc on longer match, or equal-length Allow over Disallow
    def better(acc: Column, len: Column, a: Column): Column =
      when(len > acc.getField("len") ||
          (len === acc.getField("len") && a && !acc.getField("a")),
        struct(len.as("len"), a.as("a"))).otherwise(acc)
    val plainBest = aggregate(
      filter(col("__rules"), r => startswith(col("__path"), r.getField("p"))),
      struct(lit(-1).as("len"), lit(true).as("a")),
      (acc, r) => better(acc, length(r.getField("p")), r.getField("a")))
    val verdict = aggregate(
      col("__wrules"),
      plainBest,
      (acc, r) => when(regexp_like(col("__path"), r.getField("rx")),
        better(acc, r.getField("len"), r.getField("a"))).otherwise(acc)).getField("a")
    joined
      .withColumn("__verdict", when(col("__rules").isNull, lit(true)).otherwise(verdict))
      .filter(col("__verdict"))
      .drop("__rhost", "__rules", "__wrules", "__path", "__verdict")
  }

  /** Rules table from robots.txt pages stored in the page table itself —
    * the offline dual of Scrapy fetching `/robots.txt` per host before
    * crawling it (settings.py:22). Rows whose URL path is exactly
    * /robots.txt are parsed (User-agent: * section) into (host,
    * pathPrefix, allow) rules.
    */
  def rulesFromPages(pages: DataFrame): DataFrame = {
    import pages.sparkSession.implicits._
    val parseUdf = udf((host: String, body: String) =>
      parse(host, if (body == null) "" else body)
        .map(r => (r.pathPrefix, r.allow)))
    // host derived via the SAME expression the frontier uses (UrlCols.hostCol
    // incl. the URI-hostile-host UDF fallback): bare parse_url would yield
    // host=NULL for e.g. underscore hosts, whose disallow rules would then
    // never match any frontier row — the gate failing open for exactly the
    // hosts the fallback exists for.
    pages
      .filter(col("url").rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+/robots\\.txt$"))
      .select(graft.urls.UrlCols.hostCol(col("url")).as("host"), col("text"))
      .select(col("host"), explode(parseUdf(col("host"), col("text"))).as("r"))
      .select(col("host"), col("r._1").as("pathPrefix"), col("r._2").as("allow"))
  }

  /** Offsite filter (SURVEY.md §2 #28): drop URLs whose host is not the
    * allowed domain or a subdomain of it (Scrapy OffsiteMiddleware).
    */
  def onSite(frontier: DataFrame, allowedDomains: Seq[String]): DataFrame = {
    val cond = allowedDomains
      .map(d => col("host") === d || endswith(col("host"), lit("." + d)))
      .reduce(_ || _)
    frontier.filter(cond)
  }
}
