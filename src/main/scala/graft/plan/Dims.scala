package graft.plan

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimension-table maintenance (SURVEY.md §2 #10-11).
  *
  * The reference seeds providers from the spider registry (client.py:85-89)
  * and upserts currency codes one-by-one, swallowing IntegrityError
  * (client.py:173-181) — an insert-if-absent. Here both are set-difference
  * appends: `new left_anti existing` then union — one shuffle-free
  * broadcast anti-join instead of a round-trip per row.
  */
object Dims {

  /** Provider dim rows: ids 1..n in registry order (client.py:86-88). */
  def seedProviders(spark: SparkSession, names: Seq[String]): DataFrame = {
    import spark.implicits._
    names.zipWithIndex.map { case (n, i) => (i + 1, n) }.toDF("id", "name")
  }

  /** Insert-if-absent on alpha_code: the reference's IntegrityError-swallow
    * semantics — existing rows win, new codes append.
    */
  def upsertCurrencies(existing: DataFrame, fresh: DataFrame): DataFrame = {
    val newRows = fresh
      .dropDuplicates("alpha_code")
      .join(broadcast(existing.select("alpha_code")), Seq("alpha_code"), "left_anti")
    existing.unionByName(newRows)
  }

  /** Currency dimension from a provider's dimension page in the page table:
    * MC settlement-currencies JSON or the Visa calculator options HTML
    * (SURVEY.md §2 #5-6).
    */
  def currenciesFromPage(
      pages: DataFrame,
      provider: String,
      providers: Seq[graft.provider.Provider] = graft.provider.Providers.registry): DataFrame = {
    val p = graft.provider.Providers.byName(provider, providers)
    pages.select(explode(p.currencies(col("text"))).as("c"))
      .select(col("c.alpha_code").as("alpha_code"), col("c.name").as("name"))
      .dropDuplicates("alpha_code")
  }

  /** The provider's available currency codes in PAGE ORDER — the dual of
    * `fetch_avail_currs()` (client.py:98-104, MCSpider.py:91-95): the
    * reference builds a dict whose insertion order is the page's option
    * order, but `missing()` then wraps the keys in `set()` (client.py:104),
    * so the reference's itertools.product enumeration order is
    * SET-ITERATION order — unspecified. The missing-combo SET is order-
    * independent either way; deterministic page order is this engine's
    * refinement (stable across runs), not a reference-matching requirement.
    * First occurrence wins for duplicated codes. Collected to the driver —
    * a currency dimension is a few hundred rows by nature.
    *
    * Requires AT MOST ONE page row: "page order" is only defined for one
    * page — posexplode restarts pos at 0 per row, so two pages (a stale
    * fetch beside a fresh one) would interleave codes by first-occurrence
    * position with cross-page ties broken arbitrarily, silently diverging
    * from the reference's enumeration order. Callers with several candidate
    * rows must select the authoritative page first.
    */
  def availCurrencies(
      pages: DataFrame,
      provider: String,
      providers: Seq[graft.provider.Provider] = graft.provider.Providers.registry): Seq[String] = {
    val p = graft.provider.Providers.byName(provider, providers)
    val nPages = pages.limit(2).count()
    require(nPages != 0,
      s"availCurrencies: no dimension page row for provider $provider — an empty " +
        "currency list would silently plan ZERO crawl work where the reference's " +
        "fetch_avail_currs() fails loudly on a missing page")
    require(nPages == 1,
      s"availCurrencies needs exactly one dimension page row to define page order; " +
        s"got several for provider $provider — pre-select the authoritative page")
    pages.select(posexplode(p.currencies(col("text"))).as(Seq("pos", "c")))
      .select(col("pos"), col("c.alpha_code").as("code"))
      .groupBy("code").agg(min("pos").as("pos"))
      .orderBy("pos")
      .select("code")
      .collect().map(_.getString(0)).toSeq
  }
}
