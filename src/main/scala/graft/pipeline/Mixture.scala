package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-mixture epoch planning — given the measured per-source token
  * inventory and a target mixture (the LLaMA/Pile data-recipe table:
  * "web 67%, code 4.5%, …"), compute what each source must contribute to
  * a token budget: its token share, the number of EPOCHS of the source
  * that share implies (> 1 ⇒ the source repeats; the famous "books ×2.24"
  * rows), and the per-doc sampling rate for the sub-1-epoch sources.
  * Allowlist semantics match [[Sampler.stratifiedSample]]: sources absent
  * from the mixture are planned at weight 0, explicitly visible with a
  * `planned = false` flag rather than silently dropped.
  *
  * Scale shape: one partial-aggregable groupBy over the corpus (the token
  * count rides the same scan every other corpus statistic uses), then
  * row-local arithmetic over the source-sized aggregate. The weights ride
  * a broadcast dim exactly like the sampler's.
  */
object Mixture {

  /** @param docs    (`srcCol`, `tokCol`) — one row per doc
    * @param weights target mixture shares; need not sum to 1 (normalized)
    * @param budget  total token budget for the mixed corpus
    * @return per source: n_docs, n_tokens, weight (normalized, round 6),
    *         target_tokens (budget·weight, floor), epochs (target/n_tokens,
    *         round 6), sample_rate (min(1, epochs), round 6), planned
    */
  def plan(
      docs: DataFrame,
      weights: Map[String, Double],
      budget: Long,
      srcCol: String = "source",
      tokCol: String = "n_tokens"): DataFrame = {
    require(weights.values.forall(_ >= 0), "mixture weights must be >= 0")
    val wSum = weights.values.sum
    require(wSum > 0, "mixture must have positive total weight")
    val spark = docs.sparkSession
    val wDf = weightsDf(spark, weights, wSum, srcCol)
    val inv = docs.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokCol)).cast("long").as("n_tokens"))
    val epochs = col("target_tokens").cast("double") / col("n_tokens").cast("double")
    inv
      .join(broadcast(wDf), Seq(srcCol), "left")
      .withColumn("planned", col("__w").isNotNull)
      .withColumn("weight", round(coalesce(col("__w"), lit(0.0)), 6))
      .withColumn("target_tokens",
        floor(lit(budget.toDouble) * coalesce(col("__w"), lit(0.0))).cast("long"))
      .withColumn("epochs",
        when(col("n_tokens") > 0, round(epochs, 6)).otherwise(lit(0.0)))
      .withColumn("sample_rate",
        when(col("n_tokens") > 0, round(least(lit(1.0), epochs), 6)).otherwise(lit(0.0)))
      .drop("__w")
  }

  private def weightsDf(
      spark: SparkSession, weights: Map[String, Double], wSum: Double,
      srcCol: String): DataFrame = {
    import spark.implicits._
    weights.toSeq.sortBy(_._1).map { case (s, w) => (s, w / wSum) }
      .toDF(srcCol, "__w")
  }
}
