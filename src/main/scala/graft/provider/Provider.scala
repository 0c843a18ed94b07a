package graft.provider

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.extract.Extractors

/** The provider extension point — the Spark dual of the reference's spider
  * auto-discovery registry (src/db/client.py:44-46: every Spider subclass in
  * scrapy_app/spiders becomes a provider row; its `url()` builder and
  * `parse()` extractor define the provider's behavior).
  *
  * Everything provider-specific in the crawl loop routes through this trait:
  * URL construction, rate extraction, error detection, currency-dimension
  * extraction. Adding a provider = implementing these four Columns and
  * passing `registry :+ theNewOne` to [[graft.crawl.CrawlJob.run]] — the
  * crawl loop itself never changes (ProviderSpec proves it with a toy
  * provider defined entirely in the test).
  *
  * All members are pure Column expressions (codegen-friendly, no hot-path
  * UDFs) evaluated per-row inside the one-pass extraction select.
  */
trait Provider extends Serializable {

  /** Registry name; also the `provider` column value on frontier rows. */
  def name: String

  /** Byte-exact request URL from seed columns (SURVEY.md §2 #35-36). */
  def urlFor(cardC: Column, transC: Column, date: Column): Column

  /** Rate from the fetched page text; null = parse miss (stored as null for
    * providers that store misses, e.g. Visa — VisaSpider.py:61-62).
    */
  def extractRate(text: Column): Column

  /** Error-page predicate: true rows are DROPPED, not stored
    * (MCSpider.py:75-78). Default: provider has no error pages.
    */
  def isError(text: Column): Column = lit(false)

  /** Currency-dimension extraction from the provider's dimension page:
    * array<struct<alpha_code, name>> (SURVEY.md §2 #5-6).
    */
  def currencies(text: Column): Column

  /** Request headers for a seed row, as a map<string,string> column carried
    * on the frontier (the dual of scrapy.Request(headers=...) — reference
    * MCSpider.py:67-68 sends `{'referer': support_url}`). The offline
    * fetch-join doesn't consume them, but a provider whose extraction or
    * downstream bookkeeping depends on request headers can now express
    * them, and a live downloader would read them off the row. Default: no
    * headers (the Visa spider sends none, VisaSpider.py:52).
    */
  def headersFor(cardC: Column, transC: Column, date: Column): Column =
    map().cast("map<string,string>")
}

/** Mastercard (reference MCSpider.py): matrix-param URL, JSON body. */
object Mastercard extends Provider {
  val name = "Mastercard"

  def urlFor(cardC: Column, transC: Column, date: Column): Column =
    concat(
      lit("https://www.mastercard.co.uk/settlement/currencyrate/fxDate="),
      date_format(date, "yyyy-MM-dd"),
      lit(";transCurr="), transC,
      lit(";crdhldBillCurr="), cardC,
      lit(";bankFee=0.0;transAmt=1/conversion-rate"))

  def extractRate(text: Column): Column = Extractors.mcRate(text)

  override def isError(text: Column): Column = Extractors.mcIsError(text)

  def currencies(text: Column): Column = Extractors.mcCurrencies(text)

  /** `headers={'referer': support_url}` on every rate request
    * (MCSpider.py:25,67-68).
    */
  override def headersFor(cardC: Column, transC: Column, date: Column): Column =
    map(lit("referer"),
      lit("https://www.mastercard.co.uk/en-gb/consumers/get-support/convert-currency.html"))
}

/** Visa (reference VisaSpider.py): urlencoded URL incl. the
  * `exchangedate=None` quirk, HTML body, parse misses stored as null.
  */
object Visa extends Provider {
  val name = "Visa"

  def urlFor(cardC: Column, transC: Column, date: Column): Column =
    concat(
      lit("https://www.visa.co.uk/support/consumer/travel-support/exchange-rate-calculator.html"),
      lit("?amount=1&fee=0.0&exchangedate=None&fromCurr="), cardC,
      lit("&toCurr="), transC,
      lit("&submitButton=Calculate+exchange+rate&date="),
      regexp_replace(date_format(date, "MM/dd/yyyy"), "/", "%2F"))

  def extractRate(text: Column): Column = Extractors.visaRate(text)

  def currencies(text: Column): Column = Extractors.visaCurrencies(text)
}

object Providers {

  /** Default registry; ids are 1-based registry positions, matching the
    * reference's provider seeding order (client.py:86-88).
    */
  val registry: Seq[Provider] = Seq(Mastercard, Visa)

  def byName(name: String, providers: Seq[Provider] = registry): Provider =
    providers.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"unknown provider: $name (registered: ${providers.map(_.name).mkString(", ")})"))

  /** provider-name column → 1-based registry id (the providers dim join key).
    * A when-chain over the (tiny, constant) registry — never a join.
    */
  def idCol(provider: Column, providers: Seq[Provider] = registry): Column =
    route(provider, providers)(p => lit(providers.indexOf(p) + 1))

  /** Fold a per-provider Column over the registry, routed by the `provider`
    * column — the one-pass extraction pattern (each provider's expression
    * evaluates only on its own rows; unregistered names yield null).
    */
  def route(provider: Column, providers: Seq[Provider])(f: Provider => Column): Column = {
    require(providers.nonEmpty, "empty provider registry")
    providers.tail.foldLeft(when(provider === providers.head.name, f(providers.head))) {
      (acc, p) => acc.when(provider === p.name, f(p))
    }
  }
}
