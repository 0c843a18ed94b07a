package graft

import java.sql.Date
import java.time.LocalDate

import graft.plan.Frontier

/** Parity port of the reference's golden test
  * (tests/test_db_client.py:85-108): inserting TEST_ROWS and planning
  * `missing("Mastercard", end=1995-09-10, num_days=8, currs={GBP,USD})`
  * must yield exactly 7 combos. Plus seed-ordering and shard-parity tests
  * (client.py:106-111,144-146).
  */
class FrontierSpec extends SparkSpec {
  import spark.implicits._

  private val testDate = LocalDate.of(1995, 9, 10)

  /** The reference TEST_ROWS fixture (tests/test_db_client.py:12-30). */
  private def ratesFixture = Seq(
    ("GBP", "USD", "1995-09-03", 1, 1.0), ("GBP", "USD", "1995-09-04", 1, 2.0),
    ("GBP", "USD", "1995-09-05", 1, 3.0), ("GBP", "USD", "1995-09-06", 1, 4.0),
    ("GBP", "USD", "1995-09-07", 2, 5.0), ("GBP", "USD", "1995-09-08", 2, 6.0),
    ("GBP", "USD", "1995-09-09", 2, 7.0), ("GBP", "USD", "1995-09-10", 1, 0.654654),
    ("USD", "GBP", "1995-09-03", 1, 7.0), ("USD", "GBP", "1995-09-04", 1, 6.0),
    ("USD", "GBP", "1995-09-05", 1, 5.0), ("USD", "GBP", "1995-09-06", 1, 4.0),
    ("USD", "GBP", "1995-09-07", 2, 3.0), ("USD", "GBP", "1995-09-08", 2, 2.0),
    ("USD", "GBP", "1995-09-09", 2, 1.0))
    .map { case (c, t, d, p, r) => (c, t, Date.valueOf(d), p, r) }
    .toDF("card_code", "trans_code", "date", "provider_id", "rate")

  private def providers = Seq((1, "Mastercard"), (2, "Visa")).toDF("id", "name")

  test("golden missing anti-join: exactly the reference's 7 tuples") {
    val currs = Frontier.currencyDim(spark, Seq("GBP", "USD"))
    val cands = Frontier.candidates(currs, testDate, 8)
    val out = Frontier.missing(cands, ratesFixture, providers, "Mastercard", testDate, 8, Seq("GBP", "USD"))
      .select("card_c", "trans_c", "date")
      .as[(String, String, Date)].collect().map { case (c, t, d) => (c, t, d.toString) }.toSet
    val expected = Set(
      ("GBP", "USD", "1995-09-07"), ("GBP", "USD", "1995-09-08"), ("GBP", "USD", "1995-09-09"),
      ("USD", "GBP", "1995-09-10"), ("USD", "GBP", "1995-09-07"), ("USD", "GBP", "1995-09-08"),
      ("USD", "GBP", "1995-09-09"))
    assert(out === expected)
  }

  test("candidates reproduce itertools.product order: pairs outer, dates descending") {
    val currs = Frontier.currencyDim(spark, Seq("GBP", "USD", "EUR"))
    val cands = Frontier.candidates(currs, testDate, 3)
      .orderBy("seq")
      .select("card_c", "trans_c", "date")
      .as[(String, String, Date)].collect().map { case (c, t, d) => (c, t, d.toString) }
    // reference order: for x in currs, for y in currs (x!=y), dates desc from end
    val dates = Seq("1995-09-10", "1995-09-09", "1995-09-08")
    val currsSeq = Seq("GBP", "USD", "EUR")
    val expected = for {
      x <- currsSeq; y <- currsSeq if x != y; d <- dates
    } yield (x, y, d)
    assert(cands.toSeq === expected)
    // seq values are dense 0..n-1
    val seqs = Frontier.candidates(currs, testDate, 3).select("seq").as[Long].collect().sorted
    assert(seqs.toSeq === (0L until 18L))
  }

  test("round-robin shard assignment matches i % file_count over seed order") {
    val currs = Frontier.currencyDim(spark, Seq("GBP", "USD"))
    val cands = Frontier.candidates(currs, testDate, 8)
    val missing = Frontier.missing(cands, ratesFixture, providers, "Mastercard", testDate, 8, Seq("GBP", "USD"))
    val sharded = Frontier.withShard(missing, 3, partitions = 4)
      .orderBy("seq").select("card_c", "trans_c", "shard")
      .as[(String, String, Int)].collect()
    // 7 missing rows in seed order → shards 0,1,2,0,1,2,0
    assert(sharded.map(_._3).toSeq === Seq(0, 1, 2, 0, 1, 2, 0))
  }

  test("shard write→read round-trip: headerless dd/MM/yyyy dialect") {
    val currs = Frontier.currencyDim(spark, Seq("GBP", "USD"))
    val cands = Frontier.candidates(currs, testDate, 8)
    val missing = Frontier.missing(cands, ratesFixture, providers, "Mastercard", testDate, 8, Seq("GBP", "USD"))
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Frontier.writeShards(missing, 3, dir)
    val back = Frontier.readShards(spark, s"$dir/shard=*")
      .as[(String, String, Date)].collect().map { case (c, t, d) => (c, t, d.toString) }.toSet
    val expected = missing.select("card_c", "trans_c", "date")
      .as[(String, String, Date)].collect().map { case (c, t, d) => (c, t, d.toString) }.toSet
    assert(back === expected)
    // raw file bytes match the reference row format
    val firstFile = new java.io.File(s"$dir/shard=0").listFiles()
      .filter(_.getName.endsWith(".csv")).head
    val lines = java.nio.file.Files.readAllLines(firstFile.toPath)
    assert(lines.get(0).matches("""[A-Z]{3},[A-Z]{3},\d{2}/\d{2}/\d{4}"""), lines.get(0))
  }

  test("missingWithDefaults mirrors the reference defaults (client.py:92-104)") {
    import graft.synth.Synth
    // currs default: MC settlement-currencies dimension page, page order
    val dimPages = Seq(Synth.mcCurrencyPage(Seq("GBP", "USD"))).toDF("text")
    // end default: crawl date of `now` under the US/Eastern 2pm cutoff —
    // 1995-09-11 17:00 UTC = 13:00 ET, before 2pm => crawl date 1995-09-10
    val now = java.time.Instant.parse("1995-09-11T17:00:00Z")
    val out = Frontier.missingWithDefaults(
      spark, ratesFixture, providers, "Mastercard", dimPages, now, numDays = 8)
      .select("card_c", "trans_c", "date")
      .as[(String, String, Date)].collect().map { case (c, t, d) => (c, t, d.toString) }.toSet
    val expected = Set(
      ("GBP", "USD", "1995-09-07"), ("GBP", "USD", "1995-09-08"), ("GBP", "USD", "1995-09-09"),
      ("USD", "GBP", "1995-09-10"), ("USD", "GBP", "1995-09-07"), ("USD", "GBP", "1995-09-08"),
      ("USD", "GBP", "1995-09-09"))
    assert(out === expected)
    // num_days defaults to 363: 2 ordered pairs x 363 dates minus the 9
    // provider-1 fixture rows inside the window
    val dflt = Frontier.missingWithDefaults(
      spark, ratesFixture, providers, "Mastercard", dimPages, now)
    assert(dflt.count() === 2 * 363 - 9)
    // explicit overrides win, as in the reference signature
    val explicitCurrs = Frontier.missingWithDefaults(
      spark, ratesFixture, providers, "Mastercard", dimPages, now,
      numDays = 8, currs = Some(Seq("GBP", "EUR")))
      .select("card_c").distinct().as[String].collect().toSet
    assert(explicitCurrs === Set("GBP", "EUR"))
  }

  test("availCurrencies preserves page order with first-occurrence dedup") {
    val pages = Seq(graft.synth.Synth.visaCurrencyPage(Seq("USD", "GBP", "USD", "AUD")))
      .toDF("text")
    assert(graft.plan.Dims.availCurrencies(pages, "Visa") === Seq("USD", "GBP", "AUD"))
  }

  test("availCurrencies refuses multiple dimension pages (page order undefined)") {
    val pages = Seq(
      graft.synth.Synth.visaCurrencyPage(Seq("USD", "GBP")),
      graft.synth.Synth.visaCurrencyPage(Seq("EUR"))).toDF("text")
    val e = intercept[IllegalArgumentException] {
      graft.plan.Dims.availCurrencies(pages, "Visa")
    }
    assert(e.getMessage.contains("one dimension page"))
  }

  test("withGlobalRank: dense, stable ranks on a post-shuffle input") {
    // The regression mode this guards: a bucket id derived from
    // spark_partition_id() after repartitionByRange differs between the
    // offsets action and the consuming plan (RangePartitioner's sampling is
    // seeded per RDD id), silently duplicating/skipping ranks — reproduced
    // at exactly this size before the value-pure bucket fix. seq is dense
    // 0..4999 here, so a correct global rank must equal seq on every row,
    // and an independent second build must agree exactly.
    val left = (0 until 5000).map(i => (i.toLong, i % 7)).toDF("seq", "k")
    val right = (0 until 7).map(k => (k, s"g$k")).toDF("k", "g")
    val shuffled = left.hint("merge").join(right, "k")
    val a = Frontier.withGlobalRank(shuffled, "seq", "r", partitions = 8)
      .select("seq", "r").as[(Long, Long)].collect()
    assert(a.length === 5000)
    assert(a.forall { case (s, r) => s == r })
    val b = Frontier.withGlobalRank(shuffled, "seq", "r", partitions = 8)
      .select("seq", "r").as[(Long, Long)].collect().toMap
    assert(a.forall { case (s, r) => b(s) == r })
  }

  test("withGlobalRank: duplicate-heavy order column still ranks densely and in order") {
    // 50k rows over 23 distinct values: a distinct-VALUE boundary sample
    // would be nearly empty here (and frequency-blind), funneling all rows
    // into one bucket; the frequency-weighted quantile boundaries must
    // still produce dense 0..n-1 ranks that respect the value order
    val df = (0 until 50000).map(i => (i % 23).toLong).toDF("v")
    val ranked = Frontier.withGlobalRank(df, "v", "r", partitions = 8)
      .select("v", "r").as[(Long, Long)].collect()
    assert(ranked.map(_._2).sorted.toSeq === (0L until 50000L))
    val byV = ranked.groupBy(_._1).map { case (v, ps) => v -> ps.map(_._2) }
    (0L until 22L).foreach { v => assert(byV(v).max < byV(v + 1).min) }
  }

  test("withShard leaks no cached RDDs across repeated calls") {
    val currs = Frontier.currencyDim(spark, Seq("GBP", "USD"))
    val cands = Frontier.candidates(currs, testDate, 8)
    val missing = Frontier.missing(cands, ratesFixture, providers, "Mastercard", testDate, 8, Seq("GBP", "USD"))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    (1 to 5).foreach { _ =>
      assert(Frontier.withShard(missing, 3, partitions = 4).count() === 7)
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"cached RDDs leaked by withShard: $leaked")
  }

  test("rates_from_csv dialect: header row + MM/dd/yyyy dates") {
    val dir = java.nio.file.Files.createTempDirectory("ratescsv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/r.csv"),
      "card_code,trans_code,date,rate\nGBP,USD,09/07/1995,1.5\nUSD,GBP,12/31/1995,2.5\n")
    val out = Frontier.ratesFromCsv(spark, dir, providerId = 1)
      .as[(String, String, Date, Int, Double)].collect().toSet
    assert(out === Set(
      ("GBP", "USD", Date.valueOf("1995-09-07"), 1, 1.5),
      ("USD", "GBP", Date.valueOf("1995-12-31"), 1, 2.5)))
  }

  test("per-file commit ingest: resumable, idempotent, one commit per CSV") {
    def csv(dir: String, name: String, rows: String): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/$name"),
        "card_code,trans_code,date,rate\n" + rows)
    val dir = java.nio.file.Files.createTempDirectory("percsv").toString
    val ckpt = java.nio.file.Files.createTempDirectory("percsv-ckpt").toString
    val store = new graft.checkpoint.SnapshotStore(ckpt)
    csv(dir, "a.csv", "GBP,USD,09/07/1995,1.5\n")
    csv(dir, "b.csv", "USD,GBP,09/08/1995,2.5\nEUR,USD,09/09/1995,3.5\n")
    // first run: 2 files → 2 commits, 3 rows
    assert(Frontier.ratesFromCsvPerFile(spark, dir, 1, store).count() === 3)
    assert(store.currentVersion() === Some(2))
    // idempotent: nothing new → no new commits, same rows
    assert(Frontier.ratesFromCsvPerFile(spark, dir, 1, store).count() === 3)
    assert(store.currentVersion() === Some(2))
    // a crash-resume with one MORE file ingests exactly that file
    csv(dir, "c.csv", "CHF,USD,09/10/1995,4.5\n")
    val out = Frontier.ratesFromCsvPerFile(spark, dir, 1, store)
    assert(out.count() === 4)
    assert(store.currentVersion() === Some(3))
    assert(out.filter(org.apache.spark.sql.functions.col("card_code") === "CHF").count() === 1)
  }
}
