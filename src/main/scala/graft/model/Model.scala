package graft.model

import java.sql.{Date, Timestamp}

/** Core typed data model (SURVEY.md §1.4).
  *
  * Mirrors the reference's entities (reference: src/db/orm.py:10-58,
  * src/cardRatesUpdater/items.py:10-21) re-expressed as Spark `Dataset[T]`
  * row types, plus the generalized crawl-frontier rows from
  * BASELINE.json's `input_hint` page-table shape.
  */

/** One Common-Crawl-style page (BASELINE.json input_hint):
  * (url, warc_ts, html, text, lang). `html` is the raw body bytes; `text`
  * is what extractors run on.
  */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** A crawl seed combo — reference `UpdaterItem` minus the rate
  * (items.py:16-20): card currency, transaction currency, date.
  */
final case class SeedCombo(card_c: String, trans_c: String, date: Date)

/** A frontier entry: a seed expanded to a fetch task.
  *
  * `seq` is the row's position in seed order — the reference's effective
  * crawl order is sequential seed-file order (SURVEY.md §2#29), so ordering
  * is carried as data, never as shuffle order. `priority` mirrors Scrapy's
  * request priority (default 0); retries re-enter at priority-1.
  */
final case class FrontierEntry(
    url: String,
    canonUrl: String,
    urlHash: Long,
    host: String,
    card_c: String,
    trans_c: String,
    date: Date,
    provider: String,
    priority: Int,
    seq: Long,
    retries: Int)

/** A stored rate observation (reference `Rate` table, orm.py:31-58).
  * Unique on (card_code, trans_code, date, provider_id); rate nullable
  * (Visa writes null on parse failure, VisaSpider.py:61-62).
  */
final case class RateRow(
    card_code: String,
    trans_code: String,
    date: Date,
    provider_id: Int,
    rate: Option[Double])

/** Provider dimension (orm.py:10-18). */
final case class ProviderRow(id: Int, name: String)

/** Currency dimension (orm.py:21-28). */
final case class CurrencyRow(alpha_code: String, name: String)

/** URL-seen set entry: xxhash64 of the canonical URL plus the URL itself
  * (hash prunes via Bloom; the URL makes the set exact — SURVEY.md §2#24).
  */
final case class SeenEntry(urlHash: Long, url: String)

/** One robots.txt rule: longest-prefix-match wins per (host, path), as in
  * the standard robots exclusion protocol Scrapy applies when
  * ROBOTSTXT_OBEY=True (reference settings.py:22).
  */
final case class RobotsRule(host: String, pathPrefix: String, allow: Boolean)

/** Politeness configuration mirroring reference settings.py:25-27,96-98. */
final case class PolitenessConfig(
    maxGlobal: Int = 50,
    maxPerHost: Int = 50,
    startDelaySec: Double = 2.0,
    targetConcurrency: Double = 16.0)

/** Per-host token-bucket state checkpointed between crawl rounds:
  * adaptive delay (AutoThrottle AIMD), accumulated simulated clock, and
  * a running fetched count for metrics.
  */
final case class HostState(
    host: String,
    delaySec: Double,
    clockSec: Double,
    fetched: Long)

/** Per-round, per-partition lineage + metrics row (north_rule: per-partition
  * lineage and fetch/dedup metrics).
  */
final case class CrawlMetrics(
    round: Int,
    partitionId: Int,
    host: String,
    scheduled: Long,
    fetched: Long,
    dedupDropped: Long,
    robotsDropped: Long,
    errorDropped: Long)
