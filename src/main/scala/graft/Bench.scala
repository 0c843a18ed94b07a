package graft

import org.apache.spark.sql.SparkSession

/** Per-round bench main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR plus one crawl-throughput run, prints ONE JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed JVM warmup (codegen compiler, shuffle machinery, task
    // scheduling paths) so the first timed query measures the engine, not
    // JIT/class-loading — touches NO benchmark data
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    spark.range(1000).toDF("id").groupBy((org.apache.spark.sql.functions.col("id") % 7))
      .count().collect()
    // failures are NOT swallowed: the query is timed as -1, the exception is
    // recorded in an "errors" map, printed to stderr, and the run exits
    // nonzero after emitting the JSON line — a broken query must fail the bench.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // SPARK_GRAFT_BENCH_ONLY=q47,q48 times just the named queries (prefix
    // match) and skips the crawl — for pinning NEW queries without a full
    // run; the driver's per-round bench never sets it.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only match {
      case Some(pfx) => SparkEntry.queries.toSeq.filter { case (n, _) => pfx.exists(n.startsWith) }
      case None => SparkEntry.queries.toSeq
    }
    val results = selected.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        // materialize through the noop sink, NOT count(): under count()
        // Catalyst prunes every column the row count doesn't need, so a
        // projection-only query (URL builders, simhash, quality scores…)
        // times a near-empty scan instead of the kernel it exists to
        // benchmark. The noop sink evaluates every output row fully and
        // writes nothing.
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
          System.err.println(s"[bench] QUERY FAILED: $name"); e.printStackTrace()
          name -> -1.0
      }
    }
    // crawl throughput: 120k-URL synthetic frontier, full rounds (the
    // BASELINE.json headline metric; ScalingBench measures N vs 4N)
    val (crawlUrls, crawlSec) = if (only.isDefined) (0L, -1.0) else {
      val nUrls = sys.env.getOrElse("SPARK_GRAFT_BENCH_CRAWL_URLS", "120000").toLong
      val frontier = synth.BenchWorkload.frontier(spark, nUrls, 512, 100)
      val pages = synth.BenchWorkload.pages(frontier)
      val robots = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("host STRING, pathPrefix STRING, allow BOOLEAN"))
      val ckpt = java.nio.file.Files.createTempDirectory("graft-bench").toString
      val t0 = System.nanoTime()
      val (_, seen, _) = graft.crawl.CrawlJob.run(
        spark, frontier, pages, robots, ckpt,
        model.PolitenessConfig(maxGlobal = Int.MaxValue, maxPerHost = 20000),
        roundSec = 10000.0, maxRounds = 100)
      val n = seen.count()
      val sec = (System.nanoTime() - t0) / 1e9
      (n, sec)
    }
    val all =
      if (only.isDefined) results
      else results :+ (s"crawl_${crawlUrls}_urls" -> crawlSec)
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = all.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // full JSON string escape incl. control chars — exception messages carry
    // newlines, which would break the one-line JSON contract exactly when a
    // failure needs reporting
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val errJson = errors
      .map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = all.map(_._2).filter(_ >= 0).sum
    val urlsPerSec = (crawlUrls / crawlSec).round
    // regression gate vs the pinned best-of baselines (flag, not fail —
    // see QueryBaseline scaladoc for why a hard exit would be flaky here).
    // A disarmed or partially-blind gate must SAY so: silently-empty pins
    // (SF mismatch, moved testdata) or orphaned pins (a key that no longer
    // appears — e.g. the crawl metric's key embeds the crawled-URL count
    // and renames itself exactly when the crawl drops URLs) would
    // otherwise read as "no regressions".
    val pinFile = java.nio.file.Paths.get("BENCH/QUERY_BASELINE.json")
    val pins = QueryBaseline.load(pinFile, sfDir)
    if (java.nio.file.Files.exists(pinFile) && pins.isEmpty)
      System.err.println(s"[bench] WARNING: regression gate DISARMED — $pinFile has no pins for sf dir '$sfDir'")
    val orphaned =
      if (only.isDefined) Seq.empty // subset run: unselected pins aren't orphans
      else (pins.keySet -- all.map(_._1).toSet).toSeq.sorted
    orphaned.foreach(k => System.err.println(
      s"[bench] WARNING: pinned query '$k' produced no timing this run (renamed or removed?) — its regression check did not happen"))
    val regs = QueryBaseline.regressions(all, pins)
    regs.foreach { case (n, t, p) =>
      System.err.println(String.format(java.util.Locale.ROOT,
        "[bench] REGRESSION: %s took %.2fs > 2x pinned %.2fs", n, Double.box(t), Double.box(p)))
    }
    val regJson = regs
      .map { case (n, t, p) => "\"" + n + "\":{\"sec\":" + fmt(t) + ",\"pinned\":" + fmt(p) + "}" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$errJson,"regressions":$regJson,"crawl_urls_per_sec":$urlsPerSec,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
