package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** Web-scale bench workload (BASELINE.md protocol): a synthetic frontier of
  * `nUrls` URLs spread over `nHosts` hosts with a deliberate hot host
  * holding `hotPermille`/1000 of all URLs (the reference's workload is 100%
  * one host, MCSpider.py:21 — skew is the norm, not the exception), plus
  * matching MC-JSON-shaped pages. Everything derives from `spark.range`,
  * fully distributed and bit-deterministic at any scale.
  */
object BenchWorkload {


  /** Frontier rows ready for CrawlJob.run. Unique (card, trans, date) keys
    * per URL so the rates unique-constraint upsert stays meaningful.
    */
  def frontier(spark: SparkSession, nUrls: Long, nHosts: Int, hotPermille: Int): DataFrame = {
    val ids = spark.range(nUrls).toDF("id")
    val host = when(pmod(col("id"), lit(1000)) < hotPermille, lit("hot-0.example.com"))
      .otherwise(concat(lit("host-"), pmod(xxhash64(col("id")), lit(nHosts.toLong)), lit(".example.com")))
    ids
      .withColumn("url", concat(lit("https://"), host, lit("/rates/page-"), col("id")))
      .withColumn("canonUrl", graft.expr.Native.canonicalize(col("url")))
      .withColumn("urlHash", xxhash64(col("canonUrl")))
      .withColumn("host", host)
      .withColumn("card_c", concat(lit("C"), col("id").cast("string")))
      .withColumn("trans_c", lit("USD"))
      .withColumn("date", date_add(lit(java.sql.Date.valueOf("1995-01-01")), pmod(col("id"), lit(365)).cast("int")))
      .withColumn("provider", lit("Mastercard"))
      .withColumn("priority", lit(0))
      .withColumn("seq", col("id"))
      .withColumn("retries", lit(0))
      .select("url", "canonUrl", "urlHash", "host", "card_c", "trans_c", "date", "provider", "priority", "seq", "retries")
  }

  /** Synthetic document corpus for the dedup scaling bench: `nDocs` docs of
    * 40 hashed tokens each, with `dupPermille`/1000 of the corpus belonging
    * to planted EXACT-duplicate families of 3 (consecutive id triples share
    * one text) — the families are what minhash banding must pair and the
    * component resolution must collapse. Non-family docs draw tokens from
    * their own id, so no cross pairs exist; every stage's work (shingle →
    * signature → band explode → bucket join → closure) scales in nDocs
    * while the pair/cluster volume scales in dupPermille. Pure column
    * expressions over spark.range — distributed, bit-deterministic at any
    * scale.
    */
  def docs(spark: SparkSession, nDocs: Long, dupPermille: Int): DataFrame = {
    val ids = spark.range(nDocs).toDF("doc_id")
    val famBase = (col("doc_id") - pmod(col("doc_id"), lit(3L)))
    val isDup = pmod(xxhash64(famBase, lit("dupfam")), lit(1000L)) < dupPermille
    val seed = when(isDup, famBase).otherwise(col("doc_id"))
    ids
      .withColumn("text",
        concat_ws(" ", transform(sequence(lit(0), lit(39)),
          j => concat(lit("w"), pmod(xxhash64(seed, j, lit("tok")), lit(100000L))))))
  }

  /** MC-JSON pages for every frontier URL (same body shape the extractor
    * consumes; ~2% deterministic error pages).
    *
    * Bodies carry ~2 KB of deterministic filler — Common-Crawl page payloads
    * are KBs, not the 60-byte minimum the extractor needs, and a bench whose
    * rows are tiny measures stage-scheduling latency instead of the
    * fetch+extract work that dominates at 100 TB.
    */
  def pages(frontier: DataFrame): DataFrame = {
    val rate = Synth.rateFor(col("card_c"), col("trans_c"), col("date"), lit("Mastercard"))
    val filler = repeat(
      concat(lit(" lorem"), pmod(xxhash64(col("url"), lit("filler")), lit(100000L)).cast("string")),
      160) // ≈ 1.9 KB, varies per URL
    val okBody = concat(
      lit("""{"data": {"conversionRate": """), rate.cast("string"),
      lit(""", "noise": """"), filler, lit(""""}}"""))
    val errBody = concat(
      lit("""{"data": {"errorCode": "114", "errorMessage": "Not Found", "noise": """"),
      filler, lit(""""}}"""))
    val text = when(Synth.mcIsErrorFor(col("card_c"), col("trans_c"), col("date")), errBody).otherwise(okBody)
    frontier.select(
      col("url"),
      timestamp_seconds(lit(800000000L) + pmod(xxhash64(col("url")), lit(86400L))).as("warc_ts"),
      encode(text, "UTF-8").as("html"),
      text.as("text"),
      lit("en").as("lang"))
  }
}
