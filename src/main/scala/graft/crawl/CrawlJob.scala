package graft.crawl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.checkpoint.SnapshotStore
import graft.dedup.UrlSeen
import graft.extract.Extractors
import graft.model.{HostState, PolitenessConfig}
import graft.politeness.{Robots, Scheduler}
import graft.urls.Urls

/** The crawl lifecycle (SURVEY.md §3.2 Spark equivalent): resumable
  * micro-batch rounds of
  *
  *   dedup (bloom + exact anti-join) → robots gate → per-host politeness
  *   schedule → fetch-join against the page table → extract → append
  *   rates/seen → atomic snapshot commit
  *
  * replacing Scrapy's reactor loop (dupefilter → robots → scheduler →
  * downloader → parse → pipeline). Every round commits one snapshot via
  * [[SnapshotStore]]; `run` resumes mid-crawl from the last committed round
  * and a resumed run is bit-equivalent to an uninterrupted one.
  */
object CrawlJob {

  val MastercardId = 1
  val VisaId = 2

  /** xxhash64 over the canonical URL — the dedup key (north_rule). */
  private val canonicalUdf = udf((u: String) => Urls.canonicalize(u))
  private val hostUdf = udf((u: String) => Urls.hostOf(u))

  /** Expand seed combos (card_c, trans_c, date, seq) into frontier rows for
    * one provider, building the byte-exact provider URL (SURVEY.md §2#35-36)
    * as pure column expressions.
    */
  def expandSeeds(seeds: DataFrame, provider: String): DataFrame = {
    val url = provider match {
      case "Mastercard" =>
        concat(
          lit("https://www.mastercard.co.uk/settlement/currencyrate/fxDate="),
          date_format(col("date"), "yyyy-MM-dd"),
          lit(";transCurr="), col("trans_c"),
          lit(";crdhldBillCurr="), col("card_c"),
          lit(";bankFee=0.0;transAmt=1/conversion-rate"))
      case "Visa" =>
        concat(
          lit("https://www.visa.co.uk/support/consumer/travel-support/exchange-rate-calculator.html"),
          lit("?amount=1&fee=0.0&exchangedate=None&fromCurr="), col("card_c"),
          lit("&toCurr="), col("trans_c"),
          lit("&submitButton=Calculate+exchange+rate&date="),
          regexp_replace(date_format(col("date"), "MM/dd/yyyy"), "/", "%2F"))
      case other => throw new IllegalArgumentException(s"unknown provider: $other")
    }
    seeds
      .withColumn("url", url)
      .withColumn("urlHash", xxhash64(canonicalUdf(col("url"))))
      .withColumn("host", hostUdf(col("url")))
      .withColumn("provider", lit(provider))
      .withColumn("priority", lit(0))
      .withColumn("retries", lit(0))
      .select("url", "urlHash", "host", "card_c", "trans_c", "date", "provider", "priority", "seq", "retries")
  }

  private def emptyFrontier(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "url STRING, urlHash BIGINT, host STRING, card_c STRING, trans_c STRING, " +
        "date DATE, provider STRING, priority INT, seq BIGINT, retries INT"))

  final case class RoundResult(
      scheduled: Long,
      dedupDropped: Long,
      robotsDropped: Long,
      errorDropped: Long,
      ratesAppended: Long)

  /** Run (or resume) a crawl.
    *
    * @param frontier0  initial frontier (ignored when resuming)
    * @param pages      the page table (BASELINE.json input_hint shape)
    * @param robots     rules table (host, pathPrefix, allow)
    * @param checkpointDir SnapshotStore root
    * @param roundSec   simulated wall-clock seconds per round (drives the
    *                   token-bucket budget)
    * @return (rates, seen, metrics) DataFrames of the final snapshot
    */
  def run(
      spark: SparkSession,
      frontier0: DataFrame,
      pages: DataFrame,
      robots: DataFrame,
      checkpointDir: String,
      cfg: PolitenessConfig = PolitenessConfig(),
      roundSec: Double = 10.0,
      maxRounds: Int = 1000): (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val store = new SnapshotStore(checkpointDir)

    // ---- load or init state ------------------------------------------------
    val resume = store.readCurrent()
    var round = resume.map(_._1).getOrElse(0)
    def load(man: Map[String, String], t: String): DataFrame = spark.read.parquet(man(t))
    var (frontier, seen, rates, hostStates, metrics) = resume match {
      case Some((_, man)) =>
        (load(man, "frontier"), load(man, "seen"), load(man, "rates"),
          load(man, "hostStates").as[HostState], load(man, "metrics"))
      case None =>
        val f0 = UrlSeen.dedupWithinBatch(frontier0)
        (f0,
          spark.emptyDataset[(Long, String)].toDF("urlHash", "url"),
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType.fromDDL(
              "card_code STRING, trans_code STRING, date DATE, provider_id INT, rate DOUBLE")),
          spark.emptyDataset[HostState],
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType.fromDDL(
              "round INT, host STRING, scheduled BIGINT, dedupDropped BIGINT, robotsDropped BIGINT, errorDropped BIGINT, ratesAppended BIGINT")))
    }

    val providerId =
      when(col("provider") === "Mastercard", MastercardId).otherwise(VisaId)

    // ---- rounds ------------------------------------------------------------
    var frontierCount = frontier.count()
    while (frontierCount > 0 && round < maxRounds) {
      round += 1

      // 1. dedup against the seen set (bloom prune + exact anti-join)
      val fresh = UrlSeen.filterNewBloom(spark, frontier, seen, expectedItems = math.max(frontierCount, 1000L))
      // 2. robots gate
      val allowedF = Robots.allowed(fresh, robots)
      // 3. per-host politeness schedule
      val sched = Scheduler.scheduleRound(allowedF, hostStates.toDF, cfg, roundSec)
        .cache()

      // 4. "fetch": equi-join against the page table on url — the offline,
      //    deterministic stand-in for the downloader (SURVEY.md §2#19)
      val fetched = sched.join(pages.select(col("url"), col("text")), Seq("url"), "left").cache()

      // 5. extract per provider; MC error pages are dropped (not stored),
      //    Visa parse misses store a null rate (reference parity)
      val mcRows = fetched
        .filter(col("provider") === "Mastercard" && col("text").isNotNull)
        .filter(!Extractors.mcIsError(col("text")))
        .withColumn("rate", Extractors.mcRate(col("text")))
      val visaRows = fetched
        .filter(col("provider") === "Visa" && col("text").isNotNull)
        .withColumn("rate", Extractors.visaRate(col("text")))
      val parsed = mcRows.unionAll(visaRows)
        .select(
          col("card_c").as("card_code"),
          col("trans_c").as("trans_code"),
          col("date"),
          providerId.as("provider_id"),
          col("rate"))

      // 6. append rates honoring the unique constraint (orm.py:33-34):
      //    set-difference upsert, same as the currency-dim insert-if-absent
      val newRates = parsed.join(
        rates.select("card_code", "trans_code", "date", "provider_id"),
        Seq("card_code", "trans_code", "date", "provider_id"), "left_anti")
      val rates1 = rates.unionAll(newRates)

      // 7. seen += scheduled canonical urls; frontier -= scheduled ∪ dropped
      val seen1 = seen.unionAll(
        sched.select(col("urlHash"), canonicalUdf(col("url")).as("url")))
      val frontier1 = allowedF.join(sched.select("urlHash", "url"), Seq("urlHash", "url"), "left_anti")

      // 8. host throttle state + per-round metrics (north_rule lineage)
      val hostStates1 = Scheduler.updateHostStates(sched, hostStates, cfg, round, roundSec)
      val mcErrDropped = fetched
        .filter(col("provider") === "Mastercard" && col("text").isNotNull)
        .filter(Extractors.mcIsError(col("text")))
        .groupBy("host").agg(count(lit(1)).as("errorDropped"))
      val perHost = sched.groupBy("host").agg(count(lit(1)).as("scheduled"))
        .join(mcErrDropped, Seq("host"), "left")
        .select(
          lit(round).as("round"), col("host"), col("scheduled"),
          lit(0L).as("dedupDropped"), lit(0L).as("robotsDropped"),
          coalesce(col("errorDropped"), lit(0L)).as("errorDropped"),
          lit(0L).as("ratesAppended"))
      val metrics1 = metrics.unionAll(perHost)

      // 9. atomic snapshot commit — write data, then swap manifest
      def persist(name: String, df: DataFrame): (String, String) = {
        val p = store.dataPath(name, round)
        df.write.mode("overwrite").parquet(p)
        name -> p
      }
      val manifest = Map(
        persist("frontier", frontier1),
        persist("seen", seen1),
        persist("rates", rates1),
        persist("hostStates", hostStates1.toDF),
        persist("metrics", metrics1))
      store.commit(round, manifest)

      // reload from the committed snapshot: truncates lineage so plans don't
      // grow unboundedly across rounds (the iterative-algorithm idiom)
      frontier = spark.read.parquet(manifest("frontier"))
      seen = spark.read.parquet(manifest("seen"))
      rates = spark.read.parquet(manifest("rates"))
      hostStates = spark.read.parquet(manifest("hostStates")).as[HostState]
      metrics = spark.read.parquet(manifest("metrics"))
      sched.unpersist()
      fetched.unpersist()
      frontierCount = frontier.count()
    }
    (rates, seen, metrics)
  }
}
