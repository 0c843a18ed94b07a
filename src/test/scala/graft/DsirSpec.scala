package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.pipeline.{Dsir, QualityClassifier}

/** DSIR importance weights and the hashed-linear quality classifier: every
  * number re-derived by an INDEPENDENT plain-Scala model (MessageDigest
  * md5 + Map counts — no Spark expressions), plus the contracts the
  * operators promise (empty-doc zeros, model/composition equivalence,
  * target-likeness ordering, multiplicity, the ≥-threshold boundary).
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  // ---- independent reimplementation (MessageDigest, not Spark md5) ----
  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  private def bucket(f: String, b: Int): Long =
    java.lang.Long.parseLong(md5hex(f).take(15), 16) % b

  private def feats(text: String): Seq[String] = {
    val tk = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    tk ++ tk.zip(tk.drop(1)).map { case (p, w) => s"$p $w" }
  }

  private def counts(texts: Seq[String], b: Int): Map[Long, Long] =
    texts.flatMap(feats).map(bucket(_, b)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }

  private def expectedLogw(text: String, tgt: Seq[String], raw: Seq[String], b: Int): (Long, Double) = {
    val (ct, cr) = (counts(tgt, b), counts(raw, b))
    val (nt, nr) = (ct.values.sum, cr.values.sum)
    val fs = feats(text).map(bucket(_, b))
    if (fs.isEmpty) (0L, 0.0)
    else {
      val s = fs.map { f =>
        math.log((ct.getOrElse(f, 0L) + 1).toDouble / (nt + b)) -
          math.log((cr.getOrElse(f, 0L) + 1).toDouble / (nr + b))
      }.sum
      (fs.size.toLong, math.rint(s * 1e4) / 1e4)
    }
  }

  private val tgtTexts = Seq("table scan join", "table scan filter", "sort merge join")
  private val rawTexts = Seq("table scan join", "zz1 zz2 zz3 zz4", "table zz1 scan", "")

  private def tgtDf = tgtTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  private def rawDf = rawTexts.zipWithIndex.map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")

  test("importance weights match the independent MessageDigest model exactly") {
    val out = Dsir.importanceWeights(rawDf, tgtDf, buckets = B)
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    val exp = rawTexts.zipWithIndex.map { case (t, i) =>
      val (n, w) = expectedLogw(t, tgtTexts, rawTexts, B)
      (100L + i, n, w)
    }
    assert(out === exp)
  }

  test("empty docs carry (0, 0.0) and n_feats is unigrams + bigrams") {
    val out = Dsir.importanceWeights(rawDf, tgtDf, buckets = B)
      .orderBy("id").as[(Long, Long, Double)].collect()
    assert(out(3) === ((103L, 0L, 0.0)))
    assert(out(0)._2 === 5L) // 3 unigrams + 2 bigrams
  }

  test("in-target text outweighs OOV gibberish (the selection ordering)") {
    val out = Dsir.importanceWeights(rawDf, tgtDf, buckets = B)
      .orderBy("id").as[(Long, Long, Double)].collect()
    assert(out(0)._3 > out(1)._3) // verbatim target doc vs all-OOV doc
  }

  test("weightsWith(trained models) == the importanceWeights composition") {
    val tm = Dsir.trainCounts(tgtDf, B)
    val rm = Dsir.trainCounts(rawDf, B)
    val viaModels = Dsir.weightsWith(rawDf, tm, rm, B)
      .orderBy("id").collect().toSeq
    val composed = Dsir.importanceWeights(rawDf, tgtDf, buckets = B)
      .orderBy("id").collect().toSeq
    assert(viaModels === composed)
  }

  test("trainCounts total equals the corpus feature count") {
    val total = Dsir.trainCounts(tgtDf, B).as[(Long, Long)].collect().map(_._2).sum
    assert(total === tgtTexts.map(feats(_).size.toLong).sum)
  }

  // ------------------------------------------------- quality classifier

  private def weightOf(b: Long, seed: String = "graft"): Double =
    (java.lang.Long.parseLong(md5hex(s"w:$seed:$b").take(15), 16) % 2001 - 1000) / 1000.0

  private def expectedScore(text: String): (Long, Double) = {
    val fs = feats(text).map(bucket(_, B))
    val avg = if (fs.isEmpty) 0.0 else fs.map(weightOf(_)).sum / fs.size
    (fs.size.toLong, math.rint(1.0 / (1.0 + math.exp(-avg)) * 1e4) / 1e4)
  }

  test("classifier scores match the independent MessageDigest model exactly") {
    val docs = rawDf
    val out = QualityClassifier.scoreWith(docs,
        QualityClassifier.hashModel(spark, B), B)
      .orderBy("id").as[(Long, Long, Double, Boolean)].collect().toSeq
    val exp = rawTexts.zipWithIndex.map { case (t, i) =>
      val (n, s) = expectedScore(t)
      (100L + i, n, s, s >= 0.5)
    }
    assert(out === exp)
  }

  test("empty doc scores sigmoid(bias) and the keep threshold is ≥") {
    val out = QualityClassifier.scoreWith(
        Seq((1L, "")).toDF("doc_id", "text"),
        QualityClassifier.hashModel(spark, B), B)
      .as[(Long, Long, Double, Boolean)].head()
    assert(out === ((1L, 0L, 0.5, true))) // sigmoid(0) = 0.5, ≥ keeps
    val biased = QualityClassifier.scoreWith(
        Seq((1L, "")).toDF("doc_id", "text"),
        QualityClassifier.hashModel(spark, B), B, bias = -2.0)
      .as[(Long, Long, Double, Boolean)].head()
    assert(biased._3 === math.rint(1.0 / (1.0 + math.exp(2.0)) * 1e4) / 1e4)
    assert(!biased._4)
  }

  test("feature multiplicity weighs repeated buckets in the average") {
    val out = QualityClassifier.scoreWith(
        Seq((1L, "table scan table scan")).toDF("doc_id", "text"),
        QualityClassifier.hashModel(spark, B), B)
      .as[(Long, Long, Double, Boolean)].head()
    val fs = feats("table scan table scan").map(bucket(_, B))
    assert(out._2 === 7L) // 4 unigrams + 3 bigrams
    val avg = fs.map(weightOf(_)).sum / fs.size
    assert(out._3 === math.rint(1.0 / (1.0 + math.exp(-avg)) * 1e4) / 1e4)
  }
}
