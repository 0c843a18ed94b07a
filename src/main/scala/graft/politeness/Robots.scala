package graft.politeness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.RobotsRule

/** Robots.txt gate (SURVEY.md §2 #25; reference `ROBOTSTXT_OBEY = True`,
  * settings.py:22).
  *
  * Rules live in a small side table `(host, pathPrefix, allow)` that is
  * broadcast-joined against the frontier (north_rule: "robots.txt rules as
  * a broadcast side table"). Standard robots-exclusion semantics:
  * longest-matching prefix wins; no matching rule ⇒ allowed; a host with no
  * rules at all ⇒ allowed.
  *
  * DELIBERATE DEVIATION from the reference stack: Scrapy 1.8's
  * `urllib.robotparser` applies rules in file order, first match wins. This
  * engine uses Google-style longest-matching-prefix semantics instead (the
  * modern REP draft, RFC 9309 §2.2.2) — an intentional upgrade, because
  * order-dependent verdicts make the gate's result depend on rule-file
  * serialization rather than on the rules themselves. The two differ only
  * for overlapping Allow/Disallow prefixes where the shorter rule appears
  * first; the reference's own targets publish no such overlapping rules.
  */
object Robots {

  /** Parse one robots.txt body (User-agent: * section only — the reference
    * crawls with Scrapy's default UA matching `*`) into rules.
    */
  def parse(host: String, body: String): Seq[RobotsRule] = {
    var inStar = false
    val rules = Seq.newBuilder[RobotsRule]
    body.linesIterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
      val lower = line.toLowerCase
      if (lower.startsWith("user-agent:")) {
        inStar = line.substring(11).trim == "*"
      } else if (inStar && lower.startsWith("disallow:")) {
        val p = line.substring(9).trim
        if (p.nonEmpty) rules += RobotsRule(host, p, allow = false)
      } else if (inStar && lower.startsWith("allow:")) {
        val p = line.substring(6).trim
        if (p.nonEmpty) rules += RobotsRule(host, p, allow = true)
      }
    }
    rules.result()
  }

  /** Path component of a URL (no query/fragment), "/" if empty. */
  def pathCol(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val afterScheme = regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val path = regexp_extract(afterScheme, "^[^/?#]*(/[^?#]*)?", 1)
    when(path === "", "/").otherwise(path)
  }

  /** Keep frontier rows whose (host, path) is allowed.
    *
    * The rules are first collapsed to ONE row per host carrying an
    * `array<struct<p,a>>`, so the broadcast join is 1:1 — the frontier is
    * never multiplied and never shuffled. Longest-matching-prefix is then a
    * scalar `aggregate` over that (small) array, fully codegen-friendly.
    */
  def allowed(frontier: DataFrame, rules: DataFrame): DataFrame = {
    val perHost = rules
      .groupBy(col("host").as("__rhost"))
      .agg(collect_list(struct(col("pathPrefix").as("p"), col("allow").as("a"))).as("__rules"))
    val withPath = frontier.withColumn("__path", pathCol(col("url")))
    val joined = withPath.join(broadcast(perHost), col("host") === col("__rhost"), "left")
    // verdict: among rules whose prefix matches the path, take the longest;
    // no rules for the host / no matching rule ⇒ allowed
    val matching = filter(col("__rules"), r => startswith(col("__path"), r.getField("p")))
    val verdict = aggregate(
      matching,
      struct(lit(-1).as("len"), lit(true).as("a")),
      (acc, r) =>
        when(length(r.getField("p")) > acc.getField("len"),
          struct(length(r.getField("p")).as("len"), r.getField("a").as("a")))
          .otherwise(acc)).getField("a")
    joined
      .withColumn("__verdict", when(col("__rules").isNull, lit(true)).otherwise(verdict))
      .filter(col("__verdict"))
      .drop("__rhost", "__rules", "__path", "__verdict")
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
