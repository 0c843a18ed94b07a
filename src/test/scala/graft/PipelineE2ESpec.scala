package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.crawl.CrawlJob
import graft.dedup.DocDedup
import graft.model.PolitenessConfig
import graft.pipeline.Corpus
import graft.synth.BenchWorkload

/** ONE engine, ONE pipeline: crawl a synthetic web (frontier → dedup →
  * schedule → fetch-join), EXTRACT text from the fetched HTML bytes
  * (`TextFns.htmlToText`, the WET step, asserted byte-exact against the
  * served bodies), and run the composed cleanup + near-dup dedup over the
  * extracted corpus — the end-to-end shape a pretraining data pipeline
  * actually has, with no hand-off between a "crawler", an "extractor" and
  * a "dedup job".
  */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  test("crawl -> fetched corpus -> cleanWithNearDup drops the planted exact and near dups") {
    val frontier = BenchWorkload.frontier(spark, 200, 8, 100)
    val pages0 = BenchWorkload.pages(frontier)
    // plant content-level duplication ACROSS distinct URLs (the crawl's URL
    // dedup cannot see it — that is the point of the second dedup stage):
    // page-7 serves page-3's body verbatim; page-11 serves it with one
    // appended token (a near-dup, invisible to exact hashing)
    val body3 = pages0.filter(col("url").endsWith("/rates/page-3"))
      .select("text").as[String].head()
    // pages serve HTML (binary, as a Common-Crawl page table does): the
    // body text wrapped in markup whose comment/script/tags all strip to
    // NOTHING, so extraction must recover the body exactly
    val pages = pages0.withColumn("text",
      when(col("url").endsWith("/rates/page-7"), lit(body3))
        .when(col("url").endsWith("/rates/page-11"), lit(body3 + " extraword"))
        .otherwise(col("text")))
      .withColumn("html", encode(concat(
        lit("<html><body><!-- hdr --><script>var a = 1 < 2;</script><p>"),
        col("text"), lit("</p></body></html>")), "UTF-8"))
    val robots = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("host STRING, pathPrefix STRING, allow BOOLEAN"))
    val ckpt = Files.createTempDirectory("pipeline-e2e").toString
    val (_, seen, _) = CrawlJob.run(
      spark, frontier, pages, robots, ckpt,
      PolitenessConfig(maxGlobal = Int.MaxValue, maxPerHost = Int.MaxValue),
      roundSec = 1e9, maxRounds = 5)
    assert(seen.count() === 200L, "the crawl must fetch the whole frontier")

    // the fetched corpus: urlHash is the doc id (64-bit, stable); text is
    // EXTRACTED from the fetched html (binary → UTF-8 → htmlToText), the
    // WET step in its place in the pipeline — and it must round-trip the
    // body byte-exactly, because every markup element strips to nothing
    val fetched = seen.join(pages.select("url", "html", "text"), Seq("url"))
      .select(col("urlHash").as("doc_id"),
        graft.functions.TextFns.htmlToText(col("html").cast("string")).as("extracted"),
        col("text").as("body"))
    assert(fetched.filter(col("extracted") =!= col("body")).count() === 0L,
      "extraction must recover every page body exactly")
    val corpus = fetched.select(col("doc_id"), col("extracted").as("text"))
    // JSON bodies are not English prose — the row-local filters are opened
    // up (they are parameters) so this test exercises the DEDUP stages;
    // q38/q39 gate the filter chain itself on the documents table
    val out = Corpus.cleanWithNearDup(
      corpus,
      Seq(DocDedup.minhashPairs(corpus, threshold = 0.6)),
      keepLang = "und", minTokens = 1, maxTokens = 1000000, minQuality = 0.0)

    val reasons = out.groupBy("reason").count().as[(String, Long)].collect().toMap
    assert(reasons.getOrElse("duplicate", 0L) === 1L,
      s"exactly one exact-dup drop (page-7's body): $reasons")
    assert(reasons.getOrElse("near_duplicate", 0L) === 1L,
      s"exactly one near-dup drop (page-11's body): $reasons")
    assert(reasons.getOrElse("kept", 0L) === 198L, s"got $reasons")
    // the three planted docs form ONE cluster; its surviving member is the
    // minimum doc id among kept members (hash order — assert structurally)
    val planted = out.filter(col("reason").isin("duplicate", "near_duplicate") || col("keep"))
      .filter(col("cluster_id").isin(
        out.filter(!col("keep")).select("cluster_id").as[Long].collect().toSeq: _*))
    val cluster = planted.select("id", "cluster_id", "reason", "keep")
      .as[(Long, Long, String, Boolean)].collect()
    assert(cluster.length === 3, s"planted cluster: ${cluster.toSeq}")
    assert(cluster.count(_._4) === 1, "one survivor in the planted cluster")
    assert(cluster.filter(_._4).head._1 === cluster.map(r =>
      (r._1, r._3)).filter(_._2 != "duplicate").map(_._1).min,
      "survivor is the min id among members passing the exact-dup stage")
  }
}
