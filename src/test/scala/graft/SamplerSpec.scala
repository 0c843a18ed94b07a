package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Sampler

/** Deterministic stratified sampling: exact reproducibility, allowlist
  * semantics, weight-0/1 edges, and fraction accuracy at scale.
  */
class SamplerSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")

  test("same input, same salt -> byte-identical sample; different salt -> different sample") {
    val docs = corpus(2000)
    val w = Map("en" -> 0.5, "de" -> 0.25)
    val a = Sampler.stratifiedSample(docs, w).select("doc_id").as[Long].collect().sorted
    val b = Sampler.stratifiedSample(docs, w).select("doc_id").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq, "identical runs must select the identical sample")
    val c = Sampler.stratifiedSample(docs, w, salt = "other")
      .select("doc_id").as[Long].collect().sorted
    assert(c.toSeq !== a.toSeq, "a different salt must draw a different sample")
  }

  test("unlisted strata are dropped; weight 1 keeps all; weight 0 keeps none") {
    val docs = corpus(200)
    val out = Sampler.stratifiedSample(docs, Map("en" -> 1.0))
      .select("lang").distinct().as[String].collect()
    assert(out.toSeq === Seq("en"), "de is not in the mixture -> dropped")
    assert(Sampler.stratifiedSample(docs, Map("en" -> 1.0)).count() === 100L)
    assert(Sampler.stratifiedSample(docs, Map("en" -> 0.0)).count() === 0L)
  }

  test("sampled fraction tracks the weight per stratum") {
    val docs = corpus(20000)
    val out = Sampler.stratifiedSample(docs, Map("en" -> 0.5, "de" -> 0.1))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // 10000 docs per stratum; binomial sd ~50 (en) / ~30 (de): 5 sd bands
    assert(math.abs(out("en") - 5000L) < 250, s"en: ${out("en")}")
    assert(math.abs(out("de") - 1000L) < 150, s"de: ${out("de")}")
  }
}
