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
    * data, SURVEY.md §2#29). Window by canonical URL — parallel per key,
    * no global sort. Dedup identity is ALWAYS the canonical form: raw
    * variants (fragment, case, query-param order) are the same request.
    */
  def dedupWithinBatch(batch: DataFrame, urlCol: String = "canonUrl", seqCol: String = "seq"): DataFrame = {
    val w = Window.partitionBy(col(urlCol)).orderBy(col(seqCol))
    batch.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact cross-round dedup: candidates not present in the seen set.
    * Joins on the 64-bit hash first (narrow shuffle), confirms on the
    * CANONICAL URL so a hash collision can never drop a genuinely-new URL —
    * and a raw-form variant of a seen URL can never sneak back in (the seen
    * table stores canonical URLs).
    */
  def filterNewExact(candidates: DataFrame, seen: DataFrame): DataFrame =
    candidates.join(
      seen.select(col("urlHash").as("__sh"), col("url").as("__su")),
      candidates("urlHash") === col("__sh") && candidates("canonUrl") === col("__su"),
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

  // ------------------------------------------------- partitioned Bloom

  /** The 10^10-scale path (north_rule "partitioned Bloom"): one Bloom per
    * hash partition `pmod(urlHash, parts)`, stored as files under `dir` —
    * a single filter over 10^10 keys at 1% fpp is ~12 GB (undriverable,
    * unbroadcastable); P per-partition filters are each executor-loadable.
    *
    * Build: `groupByKey(pm).mapGroups` (typed Dataset API) — each task
    * builds and writes its partition's filter to shared storage (local FS
    * here; HDFS/object store on a cluster).
    */
  def buildPartitionedBlooms(
      seen: DataFrame,
      dir: String,
      parts: Int,
      expectedItemsPerPart: Long = 1000000L,
      fpp: Double = 0.01): Unit = {
    import seen.sparkSession.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    seen
      .select(col("urlHash"), pmod(col("urlHash"), lit(parts.toLong)).as("pm"))
      .as[(Long, Long)]
      .groupByKey(_._2)
      .mapGroups { (pm, rows) =>
        val bf = BloomFilter.create(expectedItemsPerPart, fpp)
        var n = 0L
        rows.foreach { r => bf.putLong(r._1); n += 1 }
        val out = new java.io.FileOutputStream(f"$dir/bloom-$pm%05d.bin")
        try bf.writeTo(out) finally out.close()
        (pm, n)
      }
      .count(): Unit
  }

  /** Bloom-prune candidates against the partitioned filters, then confirm
    * with the exact anti-join. Each task lazily loads only the filters for
    * the `pm` values it actually holds (a handful per task).
    */
  def filterNewPartitionedBloom(
      candidates: DataFrame,
      seen: DataFrame,
      dir: String,
      parts: Int): DataFrame = {
    val probe = new PartitionedBloomProbe(dir)
    val mightContain = udf((pm: Long, h: Long) => probe(pm, h))
    val maybeSeen = candidates.filter(
      mightContain(pmod(col("urlHash"), lit(parts.toLong)), col("urlHash")))
    val definitelyNew = candidates.filter(
      !mightContain(pmod(col("urlHash"), lit(parts.toLong)), col("urlHash")))
    definitelyNew.unionAll(filterNewExact(maybeSeen, seen))
  }
}

/** Serializable probe: caches loaded per-partition Blooms per executor JVM
  * (keyed by dir+pm). A missing filter file means the partition holds no
  * seen keys yet → nothing can be contained.
  */
class PartitionedBloomProbe(dir: String) extends ((Long, Long) => Boolean) with Serializable {
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, Option[BloomFilter]]()
  def apply(pm: Long, urlHash: Long): Boolean = {
    val bf = cache.computeIfAbsent(pm, { p =>
      val f = new java.io.File(f"$dir/bloom-$p%05d.bin")
      if (!f.exists()) None
      else {
        val in = new java.io.FileInputStream(f)
        try Some(BloomFilter.readFrom(in)) finally in.close()
      }
    })
    bf.exists(_.mightContainLong(urlHash))
  }
}
