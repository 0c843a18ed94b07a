package graft.politeness

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Freshness-driven recrawl scheduling — given each URL's observed change
  * history, estimate its Poisson change rate and bucket it into a revisit
  * tier (the Cho & Garcia-Molina uniform/proportional revisit model, the
  * standard incremental-crawl policy). The reference spider crawls each
  * date×currency URL exactly once (historical rates never change,
  * CardRates `crawl.py` enumerates a closed archive); a live web frontier
  * must instead decide WHEN to come back, making the change-rate estimate
  * a frontier-priority input alongside politeness.
  *
  * Scale shape: one groupBy over the observation log keyed by URL — the
  * same shuffle key the seen-set and politeness state already use, so the
  * estimate co-partitions with the frontier state it feeds. Everything
  * after the aggregate is per-row arithmetic (codegen'd); no windows, no
  * second shuffle, no driver state.
  */
object Recrawl {

  /** Change-rate estimates + revisit tiers from an observation log.
    *
    * @param observations one row per observed change: (`urlCol`, `tsCol`)
    * @return per URL: n_obs, hours_span (rounded 4), lambda_per_hour
    *         (rounded 6; (n_obs-1)/span — n_obs-1 inter-arrival intervals
    *         estimate the rate, and singletons get rate 0 = "never seen
    *         changing"), revisit_tier ∈ hot/warm/cold/frozen by decade of
    *         the rate. The rounding makes the doubles a deterministic
    *         function of the integer inputs in any IEEE-754 engine — the
    *         division's ulp sits 10+ orders below the rounding grain.
    */
  def schedule(
      observations: DataFrame,
      urlCol: String = "url_id",
      tsCol: String = "ts"): DataFrame = {
    val agg = observations
      .groupBy(col(urlCol))
      .agg(
        count(lit(1)).as("n_obs"),
        min(unix_timestamp(col(tsCol))).as("first_s"),
        max(unix_timestamp(col(tsCol))).as("last_s"))
    val spanH = (col("last_s") - col("first_s")).cast("double") / lit(3600.0)
    // floor the span at one hour: a burst of changes inside a single hour
    // is "at least this hot", not an infinite rate
    val lambda = when(col("n_obs") <= 1, lit(0.0))
      .otherwise((col("n_obs") - 1).cast("double") / greatest(spanH, lit(1.0)))
    agg
      .withColumn("hours_span", round(spanH, 4))
      .withColumn("lambda_per_hour", round(lambda, 6))
      .withColumn(
        "revisit_tier",
        when(col("lambda_per_hour") >= 0.1, "hot")
          .when(col("lambda_per_hour") >= 0.01, "warm")
          .when(col("lambda_per_hour") > 0.0, "cold")
          .otherwise("frozen"))
      .drop("first_s", "last_s")
  }
}
