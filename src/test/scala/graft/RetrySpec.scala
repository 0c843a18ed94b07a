package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.crawl.CrawlJob
import graft.model.PolitenessConfig
import graft.plan.Frontier
import graft.synth.Synth

/** Retry middleware semantics (SURVEY.md §2 #30, Scrapy defaults): a fetch
  * miss re-enters the frontier at priority-1 with retries+1, bypasses the
  * dupefilter, and is dropped for good after maxRetries attempts.
  */
class RetrySpec extends SparkSpec {
  import spark.implicits._

  test("fetch misses retried twice then dropped; hits stored once") {
    val currs = Frontier.currencyDim(spark, Seq("GBP", "USD", "EUR"))
    val seeds = Frontier.candidates(currs, java.time.LocalDate.of(1995, 9, 10), 1) // 6 seeds
    val frontier = CrawlJob.expandSeeds(seeds, "Mastercard")
    // pages exist only for 4 of the 6 URLs: drop the EUR-card seeds
    val pages = Synth.mcPages(seeds.filter(col("card_c") =!= "EUR"))
    val robots = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("host STRING, pathPrefix STRING, allow BOOLEAN"))
    val dir = Files.createTempDirectory("retry").toString
    val (rates, seen, _) = CrawlJob.run(spark, frontier, pages, robots, dir, PolitenessConfig())

    // crawl terminates (misses dropped after 2 retries), all hits stored
    val errs = seeds.filter(col("card_c") =!= "EUR")
      .select(Synth.mcIsErrorFor(col("card_c"), col("trans_c"), col("date"))).as[Boolean]
      .collect().count(identity)
    assert(rates.count() === 4 - errs)
    assert(rates.filter(col("card_code") === "EUR").count() === 0)
    // the 2 missing URLs were scheduled 3 times each (1 try + 2 retries):
    // seen rows 4 + 3·2 = 10, distinct urls 6 (rows differ by round — the
    // round number rides on each seen row as data)
    assert(seen.count() === 10)
    assert(seen.select("urlHash", "url").distinct().count() === 6)
    // exactly 3 rounds happened
    assert(new graft.checkpoint.SnapshotStore(dir).currentVersion() === Some(3))
  }
}
