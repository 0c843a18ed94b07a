package graft

import org.apache.spark.sql.functions._

import graft.plan.Dims
import graft.politeness.Robots
import graft.synth.Synth

/** Dimension maintenance + robots-from-pages (SURVEY.md §2 #5-6, #10-11, #25). */
class DimsSpec extends SparkSpec {
  import spark.implicits._

  test("provider seed: ids 1..n in registry order") {
    val out = Dims.seedProviders(spark, Seq("Mastercard", "Visa"))
      .as[(Int, String)].collect().toSeq
    assert(out === Seq((1, "Mastercard"), (2, "Visa")))
  }

  test("currency upsert: insert-if-absent, existing rows win") {
    val existing = Seq(("GBP", "Pound Sterling")).toDF("alpha_code", "name")
    val fresh = Seq(("GBP", "DIFFERENT NAME"), ("USD", "US Dollar"), ("USD", "dup"))
      .toDF("alpha_code", "name")
    val out = Dims.upsertCurrencies(existing, fresh)
      .as[(String, String)].collect().toMap
    assert(out.size === 2)
    assert(out("GBP") === "Pound Sterling") // IntegrityError-swallow parity
    assert(out("USD") === "US Dollar")
  }

  test("currencies from provider dimension pages (MC json + Visa html)") {
    val mcPage = Seq(Synth.mcCurrencyPage(Seq("GBP", "USD"))).toDF("text")
    val mc = Dims.currenciesFromPage(mcPage, "Mastercard")
      .as[(String, String)].collect().toMap
    assert(mc === Map("GBP" -> "Currency GBP", "USD" -> "Currency USD"))
    val visaPage = Seq(Synth.visaCurrencyPage(Seq("GBP", "USD"))).toDF("text")
    val visa = Dims.currenciesFromPage(visaPage, "Visa")
      .as[(String, String)].collect().toMap
    // option text "Currency GBP (GBP)" → [:-6].upper() = "CURRENCY GBP"
    assert(visa === Map("GBP" -> "CURRENCY GBP", "USD" -> "CURRENCY USD"))
  }

  test("robots rules parsed from /robots.txt rows in the page table") {
    val body = "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
    val pages = Seq(
      ("https://a.com/robots.txt", body),
      ("https://a.com/robots.txt.html", "User-agent: *\nDisallow: /\n"), // not a robots url
      ("https://b.com/page", "irrelevant")).toDF("url", "text")
    val rules = Robots.rulesFromPages(pages)
      .as[(String, String, Boolean)].collect().toSet
    assert(rules === Set(
      ("a.com", "/private/", false),
      ("a.com", "/private/ok", true)))
  }

  test("robots rules from URI-hostile hosts gate frontier rows (host-derivation parity)") {
    // parse_url returns NULL for underscore hosts; rule hosts and frontier
    // hosts must both fall back to Urls.hostOf or the gate fails open
    val pages = Seq(
      ("https://under_score.example/robots.txt", "User-agent: *\nDisallow: /\n"))
      .toDF("url", "text")
    val rules = Robots.rulesFromPages(pages)
    assert(rules.as[(String, String, Boolean)].collect().toSet ===
      Set(("under_score.example", "/", false)))
    val frontier = Seq("https://under_score.example/page1", "https://ok.example/page2")
      .toDF("url")
      .withColumn("host", graft.urls.UrlCols.hostCol(col("url")))
    val allowed = Robots.allowed(frontier, rules).select("url").as[String].collect().toSeq
    assert(allowed === Seq("https://ok.example/page2"))
  }
}
