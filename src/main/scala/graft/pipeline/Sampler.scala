package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic, hash-based sampling for training-data mixing — the
  * DoReMi/Pile-style step that downsamples each domain/language stratum to
  * its mixture weight. Nothing random: membership is a pure function of
  * (doc id, salt), so reruns, retries, resumed jobs and different cluster
  * sizes all select the SAME sample — the property `rand()`-based sampling
  * loses the moment a task retries.
  */
object Sampler {

  /** Keep each row of `docs` iff its stratum's weight admits it.
    *
    * Mechanics: a 60-bit uniform key — the first 15 hex chars of
    * `md5(id ":" salt)` — reduced mod `denom` and compared against
    * `round(weight * denom)`. 15 hex digits fit a SIGNED 64-bit integer in
    * every engine (no unsigned/sign-wrap games), which is what makes the
    * q52 oracle able to recompute membership EXACTLY in DuckDB; the
    * ≤ denom/2^60 modulo bias is beneath observability. A stratum absent
    * from `weights` is weight 0 — dropped (a mixture is an explicit
    * allowlist; the inner broadcast join enforces it).
    *
    * Scale shape: weights are a tiny broadcast dim; membership is a
    * row-local codegen'd filter — no shuffle, no state, trivially
    * 100 TB-safe. Changing `salt` draws an independent sample (held-out
    * splits); the same salt across tables yields CONSISTENT sampling
    * (a doc and its derived rows survive together if they share ids).
    */
  def stratifiedSample(
      docs: DataFrame,
      weights: Map[String, Double],
      strataCol: String = "lang",
      idCol: String = "doc_id",
      salt: String = "graft",
      denom: Int = 10000): DataFrame = {
    require(denom > 0, "denom must be positive")
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      "weights must be in [0, 1]")
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq
      .map { case (s, w) => (s, math.round(w * denom)) }
      .toDF("__stratum", "__thr")
    val u = conv(
      substring(md5(concat(col(idCol).cast("string"), lit(":" + salt)).cast("binary")), 1, 15),
      16, 10).cast("long") % denom
    docs
      .join(broadcast(wdf), docs(strataCol) === wdf("__stratum"))
      .filter(u < col("__thr"))
      .drop("__stratum", "__thr")
  }
}
