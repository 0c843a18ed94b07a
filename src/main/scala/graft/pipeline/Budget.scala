package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quality-ranked corpus selection under a token budget — the data-selection
  * step of a pretraining run: rank every document by a quality score and
  * keep the best ones until the token budget is spent. Verdict-not-filter
  * (house style): every row comes back with its would-be start offset and a
  * `kept` flag, so drops are auditable and the same frame feeds both the
  * kept corpus and the drop report.
  *
  * Scale shape (the [[LmScore.perplexityBuckets]] histogram pattern): the
  * only GLOBAL ordered structure is built over the per-score HISTOGRAM
  * (one row per distinct score — bounded by score-grid distinctness, e.g.
  * a round(6) score has ≤10^6+1 values — never over the corpus), prefixed
  * with one bounded window and broadcast back. Within one score value the
  * id-ordered cumsum runs per-score-PARTITION; the documented bound is the
  * largest tie group (a quality score that assigns one identical value to
  * a data-sized fraction of the corpus needs a finer score, same contract
  * as `withValueBuckets`' hot-value note). No corpus-sized collect, no
  * single-partition corpus window.
  */
object Budget {

  /** @param docs    (`idCol`, `tokCol`, `scoreCol`) — one row per doc
    * @param budget  total token budget ≥ 0
    * @return input columns + start_tok (tokens consumed by all
    *         strictly-better-ranked docs; rank = score desc, id asc) +
    *         kept (start_tok + own tokens ≤ budget). Deterministic: the
    *         rank is a total order, so reruns select the identical set.
    */
  def selectUnderTokenBudget(
      docs: DataFrame,
      budget: Long,
      idCol: String = "id",
      tokCol: String = "n_tokens",
      scoreCol: String = "score"): DataFrame = {
    // materialize the input ONCE (r07, the perplexityBuckets move): it has
    // two structural consumers (histogram + final join), and a caller's
    // lambda-bearing score/token chain (e.g. q65's tokenCount) defeats
    // exchange-reuse canonicalization, so a lazily-shared input executed
    // per consumer. Slim rows (id, tokens, score) by contract.
    val d0 = docs.localCheckpoint(eager = false)
    // per-score histogram → tokens owned by strictly BETTER scores
    val hist = d0.groupBy(col(scoreCol))
      .agg(sum(col(tokCol)).cast("long").as("__grp"))
    val better = Window.orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = hist
      .withColumn("__before", sum(col("__grp")).over(better) - col("__grp"))
      .select(col(scoreCol), col("__before"))
    // id-ordered cumsum WITHIN the tie group only
    val withinGrp = Window.partitionBy(col(scoreCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d0
      .join(broadcast(offsets), Seq(scoreCol))
      .withColumn("start_tok",
        col("__before")
          + sum(col(tokCol)).over(withinGrp).cast("long") - col(tokCol))
      .withColumn("kept", col("start_tok") + col(tokCol) <= budget)
      .drop("__before")
  }
}
