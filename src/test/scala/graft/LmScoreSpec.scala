package graft

import org.apache.spark.sql.functions._

import graft.pipeline.LmScore

/** CCNet-style bigram LM scoring: the add-one-smoothed model and every
  * smoothing branch pinned against hand-computed closed forms, plus the
  * train/score decomposition and the head-vs-gibberish ordering property
  * the operator exists to provide.
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  // Reference corpus: "a b a" and "b a". BOS-augmented pairs:
  //   ('',a) ('',b) (a,b) (b,a) (b,a)  =>  c2: (''a)=1 (''b)=1 (ab)=1 (ba)=2
  //   cp: ''=2, a=1, b=2 ; V = |{a,b}| = 2
  private def refDocs = Seq((0L, "a b a"), (1L, "b a")).toDF("doc_id", "text")

  private def xentOf(text: String): (Long, Double) = {
    val out = LmScore.crossEntropy(Seq((9L, text)).toDF("doc_id", "text"), refDocs)
      .select("n_tokens", "xent").head()
    (out.getLong(0), out.getDouble(1))
  }

  private def r4(d: Double) = math.rint(d * 1e4) / 1e4

  test("all four smoothing branches match the closed form") {
    // seen prefix + seen word: ('',a)->ln(2/4), (a,b)->ln(2/3)
    assert(xentOf("a b") === (2L, r4(-(math.log(2.0 / 4) + math.log(2.0 / 3)) / 2)))
    // seen prefix + unseen word: ('',c) -> ln(1/(2+2))
    assert(xentOf("c") === (1L, r4(math.log(4.0))))
    // unseen prefix (uniform 1/V) after an OOV: (c,c) -> ln(1/2)
    assert(xentOf("c c") === (2L, r4((math.log(4.0) + math.log(2.0)) / 2)))
    // unseen prefix + seen word smooths identically: (c,a) -> ln(1/2)
    assert(xentOf("c a") === (2L, r4((math.log(4.0) + math.log(2.0)) / 2)))
  }

  test("empty and whitespace-only docs score (0, 0.0) by contract") {
    assert(xentOf("") === (0L, 0.0))
    assert(xentOf("  \t ") === (0L, 0.0))
  }

  test("scoring is case-insensitive (tokens lowered on both sides)") {
    assert(xentOf("A B") === xentOf("a b"))
  }

  test("trainCounts emits the slim exact model; scoreWith(model) == crossEntropy") {
    val model = LmScore.trainCounts(refDocs)
    val counts = model.as[(String, String, Long)].collect()
      .map { case (p, w, c) => (p, w) -> c }.toMap
    assert(model.columns.toSeq === Seq("p", "w", "c2"))
    assert(counts === Map(("", "a") -> 1L, ("", "b") -> 1L, ("a", "b") -> 1L, ("b", "a") -> 2L))
    val docs = Seq((1L, "a b"), (2L, "c c"), (3L, "")).toDF("doc_id", "text")
    val viaModel = LmScore.scoreWith(docs, model).orderBy("id").collect().toSeq
    val composed = LmScore.crossEntropy(docs, refDocs).orderBy("id").collect().toSeq
    assert(viaModel === composed)
  }

  test("in-distribution text scores lower cross-entropy than gibberish") {
    val ref = (0 until 200).map(i => (i.toLong, "the cat sat on the mat")).toDF("doc_id", "text")
    val docs = Seq((1L, "the cat sat"), (2L, "qq zz pp rr")).toDF("doc_id", "text")
    val m = LmScore.crossEntropy(docs, ref).select("id", "xent")
      .as[(Long, Double)].collect().toMap
    assert(m(1L) < m(2L), s"head text must beat gibberish: $m")
  }

  // ------------------------------------------- CCNet head/middle/tail

  private def buckets(rows: Seq[(Long, String, Double)]): Map[Long, (Long, String)] =
    LmScore.perplexityBuckets(rows.toDF("id", "lang", "xent"))
      .select("id", "bucket", "bucket_label")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("perplexityBuckets: six distinct scores split exactly into thirds") {
    val b = buckets((1 to 6).map(i => (i.toLong, "en", i.toDouble)))
    assert(b === Map(
      1L -> (0L, "head"), 2L -> (0L, "head"),
      3L -> (1L, "middle"), 4L -> (1L, "middle"),
      5L -> (2L, "tail"), 6L -> (2L, "tail")))
  }

  test("perplexityBuckets: ties share a bucket and never straddle a boundary") {
    // three tied minima (n/3 = 2 would split them under ntile): r = 0 for
    // all three => all head; 4.0 has r = 3 => (3*3) DIV 6 = 1 middle
    val b = buckets(Seq(
      (1L, "en", 1.0), (2L, "en", 1.0), (3L, "en", 1.0),
      (4L, "en", 4.0), (5L, "en", 5.0), (6L, "en", 6.0)))
    assert(b(1L) === ((0L, "head")) && b(2L) === b(1L) && b(3L) === b(1L))
    assert(b(4L) === ((1L, "middle")))
    assert(b(5L) === ((2L, "tail")) && b(6L) === ((2L, "tail")))
  }

  test("perplexityBuckets: languages bucket independently; singleton is head") {
    val b = buckets(Seq(
      (1L, "en", 9.0), (2L, "en", 10.0), (3L, "en", 11.0),
      (4L, "de", 1.0)))
    // en: one per band despite all scores exceeding de's
    assert(b(1L)._2 === "head" && b(2L)._2 === "middle" && b(3L)._2 === "tail")
    assert(b(4L) === ((0L, "head"))) // n = 1 => r = 0 => bucket 0
  }

  test("perplexityBuckets composes with crossEntropy: empty doc heads its language") {
    val ref = (0 until 50).map(i => (i.toLong, "a b a")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b", "en"), (2L, "zz qq", "en"), (3L, "", "en"))
      .toDF("doc_id", "text", "lang")
    val scored = LmScore.crossEntropy(docs, ref)
      .join(docs.selectExpr("CAST(doc_id AS LONG) AS id", "lang"), Seq("id"))
    val out = LmScore.perplexityBuckets(scored)
      .select("id", "bucket_label").as[(Long, String)].collect().toMap
    assert(out(3L) === "head")  // xent 0.0 is the minimum
    assert(out(2L) === "tail")  // OOV gibberish is the maximum
  }
}
