package graft.synth

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DateFns

/** Deterministic synthetic fixtures (SURVEY.md §7.1, FIXTURES.md §3).
  *
  * The reference crawls live provider endpoints; this sandbox is zero-egress,
  * so "the web" is a deterministic page table with the BASELINE.json
  * `input_hint` schema (url, warc_ts, html, text, lang). Bodies are shaped
  * exactly like what the reference parsers consume (MCSpider.py:74-80 JSON,
  * VisaSpider.py:29-30 HTML) and every value derives from xxhash64 of the
  * seed key — regenerable bit-identically at any scale, fully distributed
  * (no driver-side loops).
  */
object Synth {

  /** Deterministic rate in [1.000000, 9.999999] with 6 decimals. */
  def rateFor(cardC: Column, transC: Column, date: Column, provider: Column): Column =
    round(
      (pmod(xxhash64(cardC, transC, date, provider), lit(9000000L)) + 1000000L) / 1e6, 6)

  /** ~2% of MC pages are error pages (errorCode 114), exercising the
    * drop-on-error path (MCSpider.py:75-78).
    */
  def mcIsErrorFor(cardC: Column, transC: Column, date: Column): Column =
    pmod(xxhash64(cardC, transC, date, lit("mc_err")), lit(50L)) === 0L

  private def warcTs(url: Column): Column =
    timestamp_seconds(lit(800000000L) + pmod(xxhash64(url), lit(86400L * 365)))

  /** Mastercard page rows from a seed frame (card_c, trans_c, date, seq).
    * URL built with the byte-exact matrix-param builder; text is the JSON
    * the reference's parse() consumes.
    */
  def mcPages(seeds: DataFrame): DataFrame = {
    val d = date_format(col("date"), "yyyy-MM-dd")
    // the SAME builder expression the crawl frontier uses — the fetch step
    // is an equi-join on url, so an independent copy here would turn any
    // future builder tweak into a silent 100% fetch miss instead of a diff
    val url = graft.provider.Mastercard.urlFor(col("card_c"), col("trans_c"), col("date"))
    val rate = rateFor(col("card_c"), col("trans_c"), col("date"), lit("Mastercard"))
    val okBody = concat(
      lit("""{"data": {"conversionRate": """), rate.cast("string"),
      lit(""", "fxDate": """"), d,
      lit("""", "transCurr": """"), col("trans_c"),
      lit("""", "crdhldBillCurr": """"), col("card_c"),
      lit(""""}}"""))
    val errBody =
      lit("""{"data": {"errorCode": "114", "errorMessage": "Not Found , Conversion rate is not available for this currency pair."}}""")
    val text = when(mcIsErrorFor(col("card_c"), col("trans_c"), col("date")), errBody).otherwise(okBody)
    seeds.select(
      url.as("url"),
      warcTs(url).as("warc_ts"),
      encode(text, "UTF-8").as("html"),
      text.as("text"),
      lit("en").as("lang"))
  }

  /** Visa page rows. URL reproduces the `exchangedate=None` + trailing
    * `date=` urlencode quirk (VisaSpider.py:32-34,45-51); ~each 7th rate is
    * ≥1000 and carries a thousands comma, exercising the comma-strip
    * (VisaSpider.py:57-60); ~2% of pages miss the result node entirely,
    * exercising the null path (VisaSpider.py:61-62).
    */
  def visaPages(seeds: DataFrame): DataFrame = {
    // shared builder — see mcPages
    val url = graft.provider.Visa.urlFor(col("card_c"), col("trans_c"), col("date"))
    val baseRate = rateFor(col("card_c"), col("trans_c"), col("date"), lit("Visa"))
    val big = pmod(xxhash64(col("card_c"), col("trans_c"), col("date"), lit("visa_big")), lit(7L)) === 0L
    // format_number inserts thousands separators: 1,234.567890
    val rateText = when(big, format_number(baseRate * 1000, 6)).otherwise(format_number(baseRate, 6))
    val missing = pmod(xxhash64(col("card_c"), col("trans_c"), col("date"), lit("visa_miss")), lit(50L)) === 0L
    val okBody = concat(
      lit("""<html><body><p class="currency-convertion-result h2"><strong>"""),
      rateText, lit(" "), col("trans_c"),
      lit("""</strong> = 1 """), col("card_c"), lit("""</p></body></html>"""))
    val missBody = lit("""<html><body><p class="error">No rate available</p></body></html>""")
    val text = when(missing, missBody).otherwise(okBody)
    seeds.select(
      url.as("url"),
      warcTs(url).as("warc_ts"),
      encode(text, "UTF-8").as("html"),
      text.as("text"),
      lit("en").as("lang"))
  }

  /** The full synthetic web for a seed frame: MC + Visa pages. */
  def pages(seeds: DataFrame): DataFrame = mcPages(seeds).unionAll(visaPages(seeds))

  /** MC settlement-currencies dimension page (FIXTURES.md: trailing-space
    * name exercises the .strip(), MCSpider.py:94).
    */
  def mcCurrencyPage(currs: Seq[String]): String = {
    val entries = currs.map(c => s"""{"alphaCd":"$c","currNam":"Currency $c "}""").mkString(",")
    s"""{"data":{"currencies":[$entries]}}"""
  }

  /** Visa calculator page options (non-3-char value filtered out,
    * VisaSpider.py:77-79; text ends with " (XXX)" stripped via [:-6]).
    */
  def visaCurrencyPage(currs: Seq[String]): String = {
    val opts = currs.map(c => s"""<option value="$c">Currency $c ($c)</option>""").mkString
    s"""<html><body><select id="fromCurr"><option value="">Select</option>$opts</select></body></html>"""
  }
}
