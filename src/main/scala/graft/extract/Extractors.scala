package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Page-body extractors (SURVEY.md §2 #37-39) as pure Column expressions —
  * codegen-friendly, no UDFs in the hot path.
  *
  * Per-row invariant (BASELINE.json input_hint): byte-identical extracted
  * text per url versus the reference parsers.
  */
object Extractors {

  /** Mastercard JSON extraction (reference MCSpider.py:74-80).
    *
    * `get_json_object` over the page `text`; a response whose `data`
    * carries `errorCode` yields a null rate and true [[mcIsError]] — such
    * rows are dropped (not stored), matching MCSpider.py:75-78.
    */
  def mcRate(text: Column): Column =
    get_json_object(text, "$.data.conversionRate").cast("double")

  def mcErrorCode(text: Column): Column =
    get_json_object(text, "$.data.errorCode")

  def mcIsError(text: Column): Column = mcErrorCode(text).isNotNull

  /** Currency-dimension extraction from the MC settlement-currencies JSON
    * (MCSpider.py:94-95): alphaCd → trimmed currNam.
    */
  def mcCurrencies(text: Column): Column =
    transform(
      from_json(text, lit("STRUCT<data: STRUCT<currencies: ARRAY<STRUCT<alphaCd: STRING, currNam: STRING>>>>"))
        .getField("data").getField("currencies"),
      e => struct(e.getField("alphaCd").as("alpha_code"), trim(e.getField("currNam")).as("name")))

  /** Visa HTML extraction (reference VisaSpider.py:29-30,54-62).
    *
    * XPath `//p[@class="currency-convertion-result h2"]/strong[1]/text()`
    * → first whitespace token → commas stripped; null when the node is
    * absent (the reference catches AttributeError and stores None).
    *
    * The regex fixes the class attribute byte-for-byte (as the XPath
    * `@class=` equality does) and takes the first <strong> child's text.
    * NOTE: the rate stays a STRING here — the reference never casts it
    * (VisaSpider.py:57-60), the DB driver does; callers cast at the sink.
    */
  private val VisaStrongRe =
    """<p class="currency-convertion-result h2"[^>]*>\s*<strong[^>]*>([^<]*)</strong>"""

  def visaRateText(text: Column): Column = {
    val raw = regexp_extract(text, VisaStrongRe, 1)
    // .split()[0]: first whitespace-delimited token (Python str.split() with
    // no args splits on any whitespace run and ignores leading whitespace).
    val firstTok = element_at(split(trim(raw), "\\s+"), 1)
    val cleaned = regexp_replace(firstTok, ",", "")
    // absent node → regexp_extract returns "" → null (reference stores None)
    nullif(cleaned, lit(""))
  }

  def visaRate(text: Column): Column = visaRateText(text).cast("double")

  /** Visa currency-dimension extraction (VisaSpider.py:77-79): each
    * `<option value="XXX">Name (XXX)</option>` with a 3-char value becomes
    * alpha_code=value, name=text[:-6].upper() (strips " (XXX)").
    */
  def visaCurrencies(text: Column): Column = {
    val opts = regexp_extract_all(
      text, lit("""<option value="([^"]*)">([^<]*)</option>"""), lit(0))
    val parsed = transform(
      opts,
      o => struct(
        regexp_extract(o, """value="([^"]*)"""", 1).as("alpha_code"),
        // anchored on the closing quote+'>' — a bare `>([^<]*)<` would
        // match from a '>' INSIDE the value attribute and garble the name
        regexp_extract(o, """">([^<]*)<""", 1).as("opt_text")))
    val threeChar = filter(parsed, s => length(s.getField("alpha_code")) === 3)
    transform(
      threeChar,
      s => struct(
        s.getField("alpha_code").as("alpha_code"),
        upper(s.getField("opt_text").substr(lit(1), length(s.getField("opt_text")) - 6)).as("name")))
  }
}
