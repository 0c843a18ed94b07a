package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the CCNet/LLaMA-style step that scores
  * every document with a linear classifier over hashed bag-of-ngram
  * features (the fastText architecture: average the per-feature weights,
  * squash through a sigmoid, keep what scores above a threshold). The
  * APPLY path is what runs at corpus scale and what q57 gates
  * cross-engine; the model itself is an input table of (bucket, weight)
  * rows — train it wherever you like (fastText, MLlib logistic
  * regression over the same [[Dsir.featureBuckets]] features) and feed it
  * in, the [[graft.functions.TextFns]] pluggable-language-profile
  * precedent.
  *
  * Scoring contract (exact, so a DuckDB oracle can recompute it):
  * features are the [[Dsir]] unigram+bigram md5-bucket stream; with
  * W = Σ_f weight(bucket(f)) over a doc's features (missing buckets
  * weigh 0) and n = feature count,
  *   score = round(1 / (1 + exp(−(bias + W/n))), 4)    [n = 0 ⇒ W/n := 0]
  *   keep  = score ≥ 0.5
  */
object QualityClassifier {

  /** Score `docs` under a (bucket, weight) linear model.
    *
    * Scale shape: one projection + explode into the slim (id, bucket)
    * stream; the model is ≤ B rows — AQE broadcasts the equi-join; the
    * per-doc reduction is a keyed agg with map-side partial combine, then
    * a row-local sigmoid. No window, no driver data path, no shuffle of
    * anything fat.
    */
  def scoreWith(
      docs: DataFrame,
      model: DataFrame,
      buckets: Int,
      bias: Double = 0.0,
      threshold: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val ids = docs.select(col(idCol).cast("long").as("id"))
    val scored = Dsir.featureBuckets(docs, buckets, idCol, textCol)
      .join(model.select(col("bucket"), col("weight").as("__w")),
        Seq("bucket"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("__w"), lit(0.0))).as("__sw"))
    ids.join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(lit(bias) + coalesce(col("__sw") / col("n_feats"), lit(0.0))))), 4)
          .as("score"))
      .withColumn("keep", col("score") >= threshold)
  }

  /** Deterministic hash-derived stand-in model for tests and the q57 gate
    * (no trained classifier ships in this container — honestly labeled,
    * the langId default-profiles precedent): weight(b) = (h % 2001 −
    * 1000) / 1000 ∈ [−1, 1] with h the 60-bit md5 prefix of
    * "w:<seed>:<b>" — the [[Sampler]] hash shape, exactly recomputable in
    * any engine. Generated distributively from a range (no driver loop).
    */
  def hashModel(spark: org.apache.spark.sql.SparkSession,
      buckets: Int, seed: String = "graft"): DataFrame =
    spark.range(0, buckets).toDF("bucket")
      .select(col("bucket"),
        ((conv(substring(md5(concat(lit(s"w:$seed:"), col("bucket").cast("string"))
          .cast("binary")), 1, 15), 16, 10).cast("long") % 2001 - 1000)
          .cast("double") / 1000.0).as("weight"))
}
