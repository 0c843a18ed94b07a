package graft

import java.sql.Date

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.crawl.CrawlJob
import graft.model.PolitenessConfig
import graft.provider.{Provider, Providers}

/** The provider extension point (VERDICT r02 #4; reference spider
  * auto-discovery, client.py:44-46): a THIRD provider is defined entirely
  * in this spec and crawled end-to-end — CrawlJob/Dims are never touched.
  */
class ProviderSpec extends SparkSpec {
  import spark.implicits._

  /** Toy provider: JSON pages at toy.example, error pages marked inline. */
  private object Toy extends Provider {
    val name = "Toy"
    def urlFor(cardC: Column, transC: Column, date: Column): Column =
      concat(lit("https://toy.example/rate/"), cardC, lit("/"), transC,
        lit("?d="), date_format(date, "yyyy-MM-dd"))
    def extractRate(text: Column): Column =
      get_json_object(text, "$.rate").cast("double")
    override def isError(text: Column): Column =
      get_json_object(text, "$.err").isNotNull
    def currencies(text: Column): Column =
      transform(split(text, ","), c => struct(c.as("alpha_code"), c.as("name")))
  }

  private val registry3 = Providers.registry :+ Toy

  private def seeds = Seq(
    ("GBP", "USD", Date.valueOf("1995-09-10"), 0L),
    ("USD", "GBP", Date.valueOf("1995-09-10"), 1L),
    ("EUR", "USD", Date.valueOf("1995-09-09"), 2L))
    .toDF("card_c", "trans_c", "date", "seq")

  test("registry ids are 1-based positions; unknown names fail loudly") {
    assert(Providers.byName("Toy", registry3) eq Toy)
    intercept[IllegalArgumentException](Providers.byName("Nope", registry3))
    val ids = seeds.withColumn("provider", lit("Toy"))
      .select(Providers.idCol(col("provider"), registry3)).distinct().as[Int].collect()
    assert(ids.toSeq === Seq(3))
  }

  test("toy provider crawls end-to-end without touching CrawlJob") {
    val frontier = CrawlJob.expandSeeds(seeds, "Toy", registry3)
    // URL bytes come from the spec's own builder
    val urls = frontier.select("url").as[String].collect().sorted
    assert(urls.head === "https://toy.example/rate/EUR/USD?d=1995-09-09")
    // synthetic toy pages: seed 1 is an error page, others carry a rate
    val pages = frontier.select(
      col("url"),
      to_timestamp(lit("1995-09-10 00:00:00")).as("warc_ts"),
      when(col("seq") === 1L, lit("""{"err":"boom"}"""))
        .otherwise(concat(lit("""{"rate":"""), col("seq") + 1.5, lit("}"))).as("text"))
      .withColumn("html", encode(col("text"), "UTF-8"))
      .withColumn("lang", lit("en"))
    val robots = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("host STRING, pathPrefix STRING, allow BOOLEAN"))
    val ckpt = java.nio.file.Files.createTempDirectory("toy-crawl").toString
    val (rates, seen, _) = CrawlJob.run(
      spark, frontier, pages, robots, ckpt,
      PolitenessConfig(), roundSec = 10.0, maxRounds = 10, providers = registry3)
    // error page dropped, 2 rates stored with the toy registry id 3
    val got = rates.select("card_code", "trans_code", "provider_id", "rate")
      .as[(String, String, Int, Double)].collect().toSet
    assert(got === Set(("GBP", "USD", 3, 1.5), ("EUR", "USD", 3, 3.5)))
    assert(seen.count() === 3) // all three URLs fetched (error page is seen)
  }

  test("existing Mastercard/Visa behavior routes identically through the registry") {
    // byte-exactness: registry urlFor == the pure Urls builders (q11/q12 contract)
    val mc = CrawlJob.expandSeeds(seeds, "Mastercard", registry3)
      .select("card_c", "trans_c", "date", "url")
      .as[(String, String, Date, String)].collect()
    mc.foreach { case (c, t, d, u) =>
      assert(u === graft.urls.Urls.mcUrl(c, t, d.toLocalDate))
    }
    val visa = CrawlJob.expandSeeds(seeds, "Visa", registry3)
      .select("card_c", "trans_c", "date", "url")
      .as[(String, String, Date, String)].collect()
    visa.foreach { case (c, t, d, u) =>
      assert(u === graft.urls.Urls.visaUrl(c, t, d.toLocalDate))
    }
  }

  test("request headers ride the frontier row: MC referer parity, Visa none") {
    // MCSpider.py:25,67-68: headers={'referer': support_url} on every request
    val mcHeaders = CrawlJob.expandSeeds(seeds, "Mastercard")
      .select(col("headers")).as[Map[String, String]].collect()
    assert(mcHeaders.length === 3)
    mcHeaders.foreach(h => assert(h === Map(
      "referer" -> "https://www.mastercard.co.uk/en-gb/consumers/get-support/convert-currency.html")))
    // the Visa spider sends no headers (VisaSpider.py:52)
    val visaHeaders = CrawlJob.expandSeeds(seeds, "Visa")
      .select(col("headers")).as[Map[String, String]].collect()
    visaHeaders.foreach(h => assert(h === Map.empty[String, String]))
    // a provider override flows through; the column survives a retry round
    // trip (carryCols includes it whenever the frontier carries it)
    object Headed extends Provider {
      val name = "Headed"
      def urlFor(c: Column, t: Column, d: Column): Column = lit("https://h.example/x")
      def extractRate(text: Column): Column = lit(1.0)
      def currencies(text: Column): Column =
        transform(split(text, ","), c => struct(c.as("alpha_code"), c.as("name")))
      override def headersFor(c: Column, t: Column, d: Column): Column =
        map(lit("x-card"), c)
    }
    val hh = CrawlJob.expandSeeds(seeds.limit(1), "Headed", Providers.registry :+ Headed)
      .select(col("headers")).as[Map[String, String]].head()
    assert(hh === Map("x-card" -> "GBP"))
  }

  test("currenciesFromPage routes through the registry for custom providers") {
    val pages = Seq("AAA,BBB,AAA").toDF("text")
    val out = graft.plan.Dims.currenciesFromPage(pages, "Toy", registry3)
      .as[(String, String)].collect().toSet
    assert(out === Set(("AAA", "AAA"), ("BBB", "BBB")))
  }
}
