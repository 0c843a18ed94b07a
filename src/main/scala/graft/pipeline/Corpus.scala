package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Composed corpus-cleanup pipeline — the C4/Gopher-style filter chain a
  * pretraining data pipeline runs as ONE job, not four: token-count
  * bounds → language filter → quality band checks → exact-duplicate
  * removal, emitting every doc with a keep verdict and the FIRST failing
  * reason (the observability a production filter needs — what fraction
  * dropped, and why — without a second pass).
  */
object Corpus {

  /** Clean a corpus in one composed pass.
    *
    * Reason precedence is part of the contract (a doc failing several
    * filters reports the earliest): `too_short`, `too_long`, `wrong_lang`,
    * `low_quality`, `duplicate`, else `kept`. Dedup runs LAST and only
    * among docs that pass every row-local filter — dropping a filtered doc
    * must not change which duplicate survives, and the duplicate-group
    * survivor is the minimum id among PASSING members (if a group's
    * min-id doc fails a filter, the next passing copy survives).
    *
    * Scale shape: the per-row kernels (token count, language ID, quality
    * score, md5 identity) run in one projection pass; the only shuffle is
    * the dedup window keyed on the 128-bit content hash, and the text
    * column is projected away BEFORE it — only slim
    * (id, verdict-ingredient) rows move.
    *
    * @return (id, n_tokens, pred_lang, quality, reason, keep) for EVERY
    *         input doc; filtering on keep yields the cleaned corpus
    */
  def clean(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      keepLang: String = "en",
      minTokens: Int = 5,
      maxTokens: Int = 50000,
      minQuality: Double = 0.75): DataFrame = {
    // tokenize ONCE through projection boundaries: the token array is
    // consumed by the count, the 4-profile language scorer and the quality
    // bands — and Catalyst CSE does not deduplicate trees referenced from
    // lambda bodies (the repo's documented trap), so inline tokens(text)
    // in each consumer would re-split every row ~10x (measured 1.7x on
    // the whole q38 verdict kernel: 4.5 -> 2.6 s at sf0.1)
    val toked = docs.select(
      col(idCol).cast("long").as("id"),
      col(textCol).as("__text"),
      TextFns.tokens(col(textCol)).as("__tk"))
    val lowered = toked.select(
      col("id"), col("__text"), col("__tk"),
      transform(col("__tk"), lower _).as("__ltk"))
    // __ltk serves BOTH the language scorer and the quality stopword band
    val slim = lowered
      .select(
        col("id"),
        size(col("__tk")).as("n_tokens"),
        TextFns.langIdFromTokens(col("__ltk")).as("pred_lang"),
        TextFns.qualityScoreFromTokens(col("__text"), col("__tk"), col("__ltk")).as("quality"),
        // md5/128-bit identity — same reasoning as DocDedup.exact: a
        // 64-bit key silently merges distinct docs at 10^10 scale
        md5(col("__text").cast("binary")).as("__h"))
      .withColumn("__r0",
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("n_tokens") > maxTokens, "too_long")
          .when(col("pred_lang") =!= keepLang, "wrong_lang")
          .when(col("quality") < minQuality, "low_quality"))
    // passing docs first (false < true), then min id: rank 1 is the
    // surviving copy; a passing doc ranked behind it is the duplicate
    val w = Window.partitionBy("__h").orderBy(col("__r0").isNotNull, col("id"))
    slim
      .withColumn("__rn", row_number().over(w))
      .select(
        col("id"), col("n_tokens"), col("pred_lang"), col("quality"),
        coalesce(col("__r0"), when(col("__rn") > 1, "duplicate"), lit("kept"))
          .as("reason"))
      .withColumn("keep", col("reason") === "kept")
  }
}
