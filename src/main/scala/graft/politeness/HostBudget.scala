package graft.politeness

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-host crawl-budget apportionment — split a global round budget
  * across hosts in proportion to their frontier backlog, exactly and
  * deterministically, via the largest-remainder (Hamilton) method: every
  * host gets floor(budget·backlog/total), and the leftover seats go to
  * the largest fractional remainders. Pure 64-bit integer arithmetic —
  * no floating point anywhere — so any two engines agree bit-for-bit.
  *
  * The reference's analogue is Scrapy's static per-domain cap
  * (CONCURRENT_REQUESTS_PER_DOMAIN, settings.py) — a constant, not an
  * allocation; at 10^10-URL scale the round budget is the scarce resource
  * and backlog-proportional apportionment is what keeps one hot host
  * (the mastercard.com of the north star) from starving the tail.
  *
  * Scale shape: the input is the per-host AGGREGATE (one row per host —
  * millions of rows at web scale, not billions), so the two global
  * windows (remainder rank, base-sum) run over the small post-shuffle
  * table; the frontier itself is never windowed. Ordering is total
  * (remainder desc, host asc) so ties break deterministically.
  */
object HostBudget {

  /** @param backlog one row per host: (`hostCol`, `cntCol`), cnt > 0
    * @param budget  total URLs this round may spend, ≥ 0
    * @return per host: cnt, alloc — with sum(alloc) == min(budget-ish,
    *         exactly budget when total > 0) and |alloc − exact quota| < 1
    *         (the Hamilton guarantee)
    */
  def apportion(
      backlog: DataFrame,
      budget: Long,
      hostCol: String = "host",
      cntCol: String = "cnt"): DataFrame = {
    val total = Window.partitionBy()
    val byRemainder = Window.orderBy(col("__rem").desc, col(hostCol).asc)
    backlog
      .withColumn("__total", sum(col(cntCol)).over(total))
      .withColumn("__base", expr(s"($budget * $cntCol) div __total"))
      .withColumn("__rem", expr(s"($budget * $cntCol) % __total"))
      .withColumn("__leftover", lit(budget) - sum(col("__base")).over(total))
      .withColumn("__rank", row_number().over(byRemainder))
      .withColumn(
        "alloc",
        col("__base") + when(col("__rank") <= col("__leftover"), 1L).otherwise(0L))
      .select(col(hostCol), col(cntCol), col("alloc"))
  }
}
