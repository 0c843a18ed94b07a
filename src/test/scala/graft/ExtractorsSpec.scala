package graft

import org.apache.spark.sql.functions.col

import graft.extract.Extractors

/** Extraction parity against recorded fixture bodies (FIXTURES.md §3;
  * reference MCSpider.py:71-86, VisaSpider.py:54-69). The per-row invariant
  * is byte-identical extracted text per url (BASELINE.json input_hint).
  */
class ExtractorsSpec extends SparkSpec {
  import spark.implicits._

  test("MC JSON: conversionRate extracted; error pages flagged") {
    val ok = """{"data": {"conversionRate": 1.234567, "fxDate": "1995-09-07", "transCurr": "USD", "crdhldBillCurr": "GBP"}}"""
    val err = """{"data": {"errorCode": "114", "errorMessage": "Not Found , Conversion rate is not available for this currency pair."}}"""
    val df = Seq(ok, err).toDF("text")
      .select(
        Extractors.mcRate(col("text")).as("rate"),
        Extractors.mcIsError(col("text")).as("isErr"))
    val rows = df.as[(Option[Double], Boolean)].collect()
    assert(rows(0) === (Some(1.234567), false))
    assert(rows(1) === (None, true))
  }

  test("Visa HTML: first token, commas stripped, null when node absent — byte-identical") {
    val big = """<html><body><p class="currency-convertion-result h2"><strong>1,234.567890 US Dollar</strong> = 1 Pound Sterling</p></body></html>"""
    val small = """<p class="currency-convertion-result h2"><strong>0.654654 USD</strong> = 1 GBP</p>"""
    val missing = """<html><body><p class="error">No rate</p></body></html>"""
    val df = Seq(big, small, missing).toDF("text")
      .select(Extractors.visaRateText(col("text")).as("r"))
    val rows = df.as[Option[String]].collect()
    assert(rows(0) === Some("1234.567890")) // split()[0] + replace(',','')
    assert(rows(1) === Some("0.654654"))
    assert(rows(2) === None) // AttributeError → None path
  }

  test("MC currency dimension page: alphaCd → stripped currNam") {
    val page = """{"data":{"currencies":[{"alphaCd":"GBP","currNam":"Pound Sterling "},{"alphaCd":"USD","currNam":"US Dollar"}]}}"""
    val out = Seq(page).toDF("text")
      .select(Extractors.mcCurrencies(col("text")).as("c"))
      .selectExpr("explode(c) as e").select("e.alpha_code", "e.name")
      .as[(String, String)].collect().toSet
    assert(out === Set(("GBP", "Pound Sterling"), ("USD", "US Dollar")))
  }

  test("Visa currency options: 3-char values only, text[:-6].upper()") {
    val page = """<html><select id="fromCurr"><option value="">Select</option>""" +
      """<option value="GBP">Pound Sterling (GBP)</option>""" +
      """<option value="USD">us dollar (USD)</option></select></html>"""
    val out = Seq(page).toDF("text")
      .select(Extractors.visaCurrencies(col("text")).as("c"))
      .selectExpr("explode(c) as e").select("e.alpha_code", "e.name")
      .as[(String, String)].collect().toSet
    assert(out === Set(("GBP", "POUND STERLING"), ("USD", "US DOLLAR")))
  }
}
