package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured Streaming surface (SURVEY.md §1.4 streaming note).
  *
  * The crawl loop itself runs as resumable micro-batch rounds over
  * snapshot tables (CrawlJob) — that is what the north rule's
  * "Structured-Streaming-style checkpointing" asks for. This module covers
  * the genuinely streaming shapes a production deployment adds around it:
  *
  *  - frontier ingest: `readStream` over arriving seed-CSV shards →
  *    canonicalize/key → append (the streaming edge of the planner)
  *  - fetch-event analytics: watermarked tumbling-window aggregates
  *  - per-host politeness sessions: `flatMapGroupsWithState` keeping the
  *    token-bucket state keyed by host — the streaming dual of
  *    Scheduler.updateHostStates
  *
  * Everything here is transformation-only (unbound to a sink) so tests can
  * drive it with MemoryStream and production can bind kafka/files.
  */
object Streams {

  /** Streaming frontier ingest: seed rows arriving as headerless CSV text
    * (card_c,trans_c,date dd/MM/yyyy — the reference crawl-input dialect)
    * → typed, keyed frontier rows. Input may be `spark.readStream.csv(dir)`.
    */
  def ingestSeeds(raw: DataFrame): DataFrame = {
    raw.select(
      col("card_c"), col("trans_c"),
      to_date(col("date"), "dd/MM/yyyy").as("date"))
  }

  /** Streaming URL-seen dedup — the streaming dual of the batch dupefilter
    * (SURVEY.md §2#24): keyed `dropDuplicatesWithinWatermark` over the
    * canonical-URL hash, so state stays bounded by the watermark horizon.
    * Division of labor at 10^10 URLs: this stage exactly dedups the
    * IN-FLIGHT window of an arriving frontier stream; the batch loop's
    * incremental partitioned blooms remain the unbounded-horizon store the
    * stream's survivors are checked against on entry.
    *
    * Input must carry (ts TIMESTAMP, urlHash BIGINT, canonUrl STRING, …);
    * keying includes the canonical URL so a 64-bit hash collision can never
    * drop a genuinely-new URL — same exactness contract as the batch path.
    */
  def dedupUrls(frontier: DataFrame, watermark: String = "1 hour"): DataFrame =
    frontier
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("urlHash", "canonUrl")

  /** Watermarked tumbling-window fetch metrics: events(ts, host, fetched,
    * bytes) → per-window per-host counts. Late data beyond the watermark is
    * dropped — at 10^10 URLs the state store must stay bounded.
    */
  def fetchMetricsByWindow(events: DataFrame, window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("host"))
      .agg(count(lit(1)).as("fetches"), sum("bytes").as("bytes"))
      .select(col("window.start").as("window_start"), col("host"), col("fetches"), col("bytes"))

  // ------------------------------------------------ stateful host sessions

  final case class FetchEvent(host: String, ts: Timestamp, latencyMs: Long)
  final case class HostSession(
      host: String,
      fetches: Long,
      delaySec: Double,
      lastTs: Timestamp,
      closed: Boolean)

  /** Per-host politeness state as a streaming stateful operator: AutoThrottle
    * AIMD delay update per event; with `idleMs > 0` the session closes after
    * that long without traffic (processing-time timeout — note this keeps
    * the micro-batch engine ticking to evaluate timeouts). The streaming
    * dual of the batch Scheduler.updateHostStates — same formula, same
    * semantics (reference settings.py:96-98).
    */
  def hostSessions(
      events: Dataset[FetchEvent],
      targetConcurrency: Double = 16.0,
      startDelaySec: Double = 2.0,
      idleMs: Long = 0L): Dataset[HostSession] = {
    import events.sparkSession.implicits._
    val timeoutKind =
      if (idleMs > 0) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append, timeoutKind)(
        (host: String, batch: Iterator[FetchEvent], state: GroupState[HostSession]) => {
          if (state.hasTimedOut) {
            val closed = state.get.copy(closed = true)
            state.remove()
            Iterator(closed)
          } else {
            val prior = state.getOption.getOrElse(
              HostSession(host, 0L, startDelaySec, new Timestamp(0L), closed = false))
            val updated = batch.foldLeft(prior) { (s, e) =>
              val targetDelay = (e.latencyMs / 1000.0) / targetConcurrency
              s.copy(
                fetches = s.fetches + 1,
                delaySec = (s.delaySec + targetDelay) / 2.0,
                lastTs = if (e.ts.after(s.lastTs)) e.ts else s.lastTs)
            }
            state.update(updated)
            if (idleMs > 0) state.setTimeoutDuration(idleMs)
            Iterator(updated)
          }
        })
  }
}
