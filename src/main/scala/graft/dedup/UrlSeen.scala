package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** URL-seen dedup (SURVEY.md §2 #24) — the Spark re-expression of Scrapy
  * 1.8's RFPDupeFilter (active in the reference: no dont_filter anywhere,
  * settings.py:74).
  *
  * Keys are xxhash64 over the canonical URL. A Bloom filter *prunes* the
  * probe side cheaply; an exact `left_anti` join against the seen-set table
  * *confirms* — the final URL-seen set must be exact to match the reference
  * (no false drops, ever: Bloom false positives only cost a join probe).
  *
  * Scale notes (10^10 URLs): the seen table lives hash-partitioned by
  * `pmod(urlHash, P)` so the anti-join is a co-partitioned shuffle on a
  * 64-bit key (no wide rows move); the Bloom is built distributedly via
  * `DataFrameStatFunctions.bloomFilter` (treeAggregate under the hood) and
  * broadcast once per round. At 10^10 keys a single driver Bloom at 1% fpp
  * is ~12 GB — too big — so [[filterNewBloom]] takes `expectedItems`/`fpp`
  * per *partition-group* and is applied per hash-partition range by the
  * caller when the seen set outgrows a single filter.
  */
object UrlSeen {

  /** First-occurrence within-batch dedup: among rows sharing a canonical
    * URL keep the lowest `seq` (Scrapy drops later duplicates; order is
    * data, SURVEY.md §2#29). Window by URL — parallel per key, no
    * global sort.
    */
  def dedupWithinBatch(batch: DataFrame, urlCol: String = "url", seqCol: String = "seq"): DataFrame = {
    val w = Window.partitionBy(col(urlCol)).orderBy(col(seqCol))
    batch.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact cross-round dedup: candidates not present in the seen set.
    * Joins on the 64-bit hash first (narrow shuffle), confirms on the URL
    * itself so a hash collision can never drop a genuinely-new URL.
    */
  def filterNewExact(candidates: DataFrame, seen: DataFrame): DataFrame =
    candidates.join(
      seen.select(col("urlHash").as("__sh"), col("url").as("__su")),
      candidates("urlHash") === col("__sh") && candidates("url") === col("__su"),
      "left_anti")

  /** Bloom-pruned dedup: broadcast Bloom over the seen hashes drops the
    * vast majority of already-seen candidates *before* the shuffle; the
    * survivors (new URLs + Bloom false positives) go through the exact
    * anti-join. Returns (newRows, bloomPrunedCount approximation source).
    */
  def filterNewBloom(
      spark: SparkSession,
      candidates: DataFrame,
      seen: DataFrame,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    if (seen.isEmpty) candidates
    else {
      val bloom: BloomFilter = seen.stat.bloomFilter("urlHash", math.max(expectedItems, 1000L), fpp)
      val bc = spark.sparkContext.broadcast(bloom)
      val mightContain = udf((h: Long) => bc.value.mightContainLong(h))
      val (maybeSeen, definitelyNew) =
        (candidates.filter(mightContain(col("urlHash"))), candidates.filter(!mightContain(col("urlHash"))))
      definitelyNew.unionAll(filterNewExact(maybeSeen, seen))
    }
  }
}
