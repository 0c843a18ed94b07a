package graft.plan

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.time.LocalDate

/** Frontier planning: seed expansion + "missing combos" anti-join + shard
  * sink (SURVEY.md §2 #9, #14-16, #20-21; reference src/db/client.py:92-150).
  *
  * The reference materializes the already-crawled set in driver memory and
  * probes it from a Python generator (client.py:114-123) — i.e. a broadcast
  * hash anti-join. Here the whole plan is declarative: crossJoin → filter →
  * left_anti, so Catalyst picks broadcast vs shuffled anti-join from stats
  * and AQE can re-plan at runtime; nothing is collected to the driver.
  */
object Frontier {

  /** The candidate combo grid `currs × currs × dates(desc)` with `x != y`
    * (client.py:106-111), carrying an explicit `seq` column that equals the
    * reference's `itertools.product` emission index (rightmost-fastest:
    * for each ordered (card, trans) pair, all dates descending from `end`).
    *
    * Ordering is data, not shuffle order — `seq` survives any repartition.
    * `currs` arrives as a DataFrame of (curr STRING, idx LONG) with idx the
    * iteration order; the pair index is computed distributedly so the grid
    * never touches the driver (10^10-scale safe).
    */
  def candidates(currs: DataFrame, end: LocalDate, numDays: Int): DataFrame = {
    val n = currs.count() // tiny dim table; one cheap job for the pair-index arithmetic
    val a = currs.select(col("curr").as("card_c"), col("idx").as("ia"))
    val b = currs.select(col("curr").as("trans_c"), col("idx").as("ib"))
    // product(currs, currs) minus the diagonal, with the *filtered* pair
    // position: pairs removed before (ia, ib) = ia (+1 if ib > ia).
    val pairs = a.crossJoin(b)
      .filter(col("card_c") =!= col("trans_c"))
      .withColumn(
        "pair_idx",
        col("ia") * n + col("ib") - col("ia") - when(col("ib") > col("ia"), 1).otherwise(0))
    val dates = explode(sequence(lit(0), lit(numDays - 1))).as("date_idx")
    pairs
      .select(col("card_c"), col("trans_c"), col("pair_idx"), dates)
      .withColumn("date", date_sub(lit(java.sql.Date.valueOf(end)), col("date_idx")))
      .withColumn("seq", col("pair_idx") * numDays + col("date_idx"))
      .select("card_c", "trans_c", "date", "seq")
  }

  /** Helper: a currency list (driver-side, tiny) → indexed dim DataFrame. */
  def currencyDim(spark: SparkSession, currs: Seq[String]): DataFrame = {
    import spark.implicits._
    currs.zipWithIndex.map { case (c, i) => (c, i.toLong) }.toDF("curr", "idx")
  }

  /** The `missing` planner (client.py:92-123): candidate grid anti-joined
    * against rates already stored for this provider in the window.
    *
    * All predicates (provider equality, date range, currency membership) are
    * applied on the build side *before* the join so they push down to the
    * rates scan (parquet row-group pruning); the provider name→id lookup is
    * a broadcast join against the 2-row providers dim rather than the
    * reference's correlated subquery (pipelines.py:17-21).
    */
  def missing(
      candidates: DataFrame,
      rates: DataFrame,
      providers: DataFrame,
      provider: String,
      end: LocalDate,
      numDays: Int,
      currs: Seq[String]): DataFrame = {
    val start = end.minusDays(numDays - 1L)
    val existing = rates
      .join(broadcast(providers.filter(col("name") === provider)), rates("provider_id") === providers("id"))
      .filter(
        col("date") <= lit(java.sql.Date.valueOf(end)) &&
        col("date") >= lit(java.sql.Date.valueOf(start)) &&
        col("card_code").isin(currs: _*) &&
        col("trans_code").isin(currs: _*))
      .select(
        col("card_code").as("card_c"),
        col("trans_code").as("trans_c"),
        col("date"))
    candidates.join(existing, Seq("card_c", "trans_c", "date"), "left_anti")
  }

  /** The `missing` planner with the REFERENCE'S DEFAULTS (client.py:92-104):
    * `num_days` defaults to 363, `end` to `current_date()` (the US/Eastern
    * 2pm-cutoff crawl date of `now`), and the currency set to the provider's
    * live `fetch_avail_currs()` — here the currency-dimension page rows in
    * `dimPages`, in page order. Explicit arguments override, as in the
    * reference signature.
    */
  def missingWithDefaults(
      spark: SparkSession,
      rates: DataFrame,
      providers: DataFrame,
      provider: String,
      dimPages: DataFrame,
      now: java.time.Instant,
      numDays: Int = 363,
      end: Option[LocalDate] = None,
      currs: Option[Seq[String]] = None): DataFrame = {
    val endDate = end.getOrElse(graft.functions.DateFns.currentCrawlDate(now))
    val currList = currs.getOrElse(graft.plan.Dims.availCurrencies(dimPages, provider))
    val cands = candidates(currencyDim(spark, currList), endDate, numDays)
    missing(cands, rates, providers, provider, endDate, numDays, currList)
  }

  /** Exact, scalable global rank 0..n-1 by `orderCol` (no single-partition
    * window): bucket rows into value-derived ranges of the order column,
    * count rows per bucket, broadcast the cumulative offsets, then rank =
    * per-bucket row_number + offset. Every stage is parallel. `orderCol`
    * must be an atomic, literal-expressible type (numeric, string,
    * date/timestamp — every rank key in this library).
    */
  def withGlobalRank(df: DataFrame, orderCol: String, rankCol: String, partitions: Int): DataFrame = {
    val withPid = withValueBuckets(df, orderCol, partitions)
    val counts = withPid.groupBy("__pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts
      .scanLeft((0, 0L)) { case ((_, acc), (pid, c)) => (pid, acc + c) }
      .sliding(2).collect { case Array((_, off), (pid, _)) => pid -> off }.toSeq
    // P offset rows ride a broadcast join, not an O(P) when-chain (Catalyst
    // expression depth would become the scale limit)
    import df.sparkSession.implicits._
    val offsetsDf = offsets.toDF("__opid", "__off")
    val w = Window.partitionBy("__pid").orderBy(orderCol)
    withPid
      .join(broadcast(offsetsDf), col("__pid") === col("__opid"), "left")
      .withColumn(rankCol,
        row_number().over(w).cast("long") - 1 + coalesce(col("__off"), lit(0L)))
      .drop("__pid", "__opid", "__off")
  }

  /** Exact, scalable global EXCLUSIVE prefix sum of `valueCol` (cast to
    * long) in `orderCol` order — `outCol` = sum of all earlier rows'
    * values, 0 for the first row. Same machinery as [[withGlobalRank]]
    * (value-pure buckets → per-bucket sums → broadcast offsets →
    * per-bucket window), every stage parallel; same contract: `orderCol`
    * values must be unique (ties share a bucket and have no defined
    * order). The training-data consumer is [[graft.pipeline.Corpus]]'s
    * sequence packing — a single-partition `Window.orderBy` cumsum would
    * funnel the whole corpus through one task.
    */
  def withGlobalPrefixSum(
      df: DataFrame, orderCol: String, valueCol: String, outCol: String,
      partitions: Int): DataFrame = {
    val withPid = withValueBuckets(df, orderCol, partitions)
    val sums = withPid.groupBy("__pid")
      .agg(coalesce(sum(col(valueCol).cast("long")), lit(0L)).as("__s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = sums
      .scanLeft((0, 0L)) { case ((_, acc), (pid, s)) => (pid, acc + s) }
      .sliding(2).collect { case Array((_, off), (pid, _)) => pid -> off }.toSeq
    import df.sparkSession.implicits._
    val offsetsDf = offsets.toDF("__opid", "__off")
    val w = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPid
      .join(broadcast(offsetsDf), col("__pid") === col("__opid"), "left")
      .withColumn(outCol,
        sum(col(valueCol).cast("long")).over(w) - col(valueCol).cast("long")
          + coalesce(col("__off"), lit(0L)))
      .drop("__pid", "__opid", "__off")
  }

  private[graft] def withValueBuckets(df: DataFrame, orderCol: String, partitions: Int): DataFrame = {
    // The range-bucket id is a PURE FUNCTION OF THE ORDER VALUE — boundaries
    // are collected once from a deterministic hash-sample and baked in as
    // literals — NOT spark_partition_id() after repartitionByRange. That
    // shape was silently WRONG: the counts action and the returned plan each
    // execute their own range exchange (AQE does not reliably dedup them),
    // and RangePartitioner's reservoir sampling is seeded per RDD id, so two
    // executions pick different boundaries EVEN ON IDENTICAL INPUT — stale
    // offsets, ranks duplicated/skipped (reproduced at 5000 rows, local[4]).
    // Value-pure bucket ids are immune to re-execution, task retry,
    // speculative duplicates, and AQE re-planning, and need no cache or
    // checkpoint to pin (nothing persisted — nothing to leak).
    // Boundaries are ROW-frequency-weighted quantiles (percentile_approx),
    // not equal steps through the distinct-value list: a duplicate-heavy
    // order column (10^9 rows over 365 dates) has almost no distinct values
    // to sample, and value-stepped boundaries would ignore that one value
    // can hold most of the rows — either way funneling the input into one
    // bucket. Boundary QUALITY only affects balance, never correctness
    // (offsets are counted against the actual buckets), so the approximate,
    // order-sensitive sketch is fine here — the literals are frozen once.
    // Inherent limit, documented: all rows of ONE value share a bucket
    // (ties have no defined rank order); rank by a finer key if a single
    // hot value dominates. Cost: one slim quantile pass + one counts pass
    // before the consumer's own execution.
    val fracs = (1 until partitions).map(_.toDouble / partitions)
    val percentileTypes: PartialFunction[org.apache.spark.sql.types.DataType, Unit] = {
      case _: org.apache.spark.sql.types.NumericType => ()
      case org.apache.spark.sql.types.DateType => ()
      case org.apache.spark.sql.types.TimestampType => ()
      case org.apache.spark.sql.types.TimestampNTZType => ()
    }
    val bnds: Seq[Any] =
      if (fracs.isEmpty) Seq.empty[Any] // partitions <= 1: one bucket, rank serial
      else if (percentileTypes.isDefinedAt(df.schema(orderCol).dataType)) {
        val row = df.select(percentile_approx(
          col(orderCol), lit(fracs.toArray), lit(10000)).as("q")).head()
        if (row.isNullAt(0)) Seq.empty[Any]
        else row.getSeq[Any](0).filter(_ != null).distinct
      } else {
        // non-percentile types (e.g. strings): step through a deterministic
        // value hash-sample — coarser on duplicate-heavy columns, and one
        // extra count() pass to size the sampling modulus
        val n = df.count()
        if (n == 0L) Seq.empty[Any]
        else {
          val k = math.max(1L, n / math.max(partitions.toLong * 128L, 1024L))
          val sampled = df
            .select(col(orderCol)).filter(pmod(xxhash64(col(orderCol)), lit(k)) === 0)
            .distinct().orderBy(orderCol)
            .collect().map(_.get(0))
          if (sampled.isEmpty) Seq.empty[Any]
          else {
            val step = sampled.length.toDouble / partitions
            (1 until partitions).map(i => sampled((i * step).toInt)).distinct
          }
        }
      }
    // bucket = how many boundaries sort at-or-below the value; the literal
    // array is `partitions`-sized (bounded), evaluated in codegen per row
    val pidExpr = if (bnds.isEmpty) lit(0)
      else size(filter(array(bnds.map(lit(_)): _*), b => b <= col(orderCol)))
    df.withColumn("__pid", pidExpr)
  }

  /** Round-robin shard assignment with exact reference parity
    * (client.py:144-146: output row i goes to shard `i % fileCount`, where
    * i is the position in the *missing result* stream in seed order).
    */
  def withShard(missing: DataFrame, fileCount: Int, partitions: Int = 32): DataFrame =
    withGlobalRank(missing, "seq", "__rank", partitions)
      .withColumn("shard", pmod(col("__rank"), lit(fileCount.toLong)).cast("int"))
      .drop("__rank")

  /** Write the frontier shards as headerless CSVs, date formatted
    * `dd/MM/yyyy` (settings.py:110) — the reference's crawl-input dialect.
    */
  def writeShards(missing: DataFrame, fileCount: Int, outPath: String): Unit =
    withShard(missing, fileCount)
      .orderBy("shard", "seq")
      .select(
        col("shard"),
        col("card_c"),
        col("trans_c"),
        date_format(col("date"), "dd/MM/yyyy").as("date"))
      .write
      .mode("overwrite")
      .partitionBy("shard")
      .option("header", "false")
      .csv(outPath)

  /** Frontier shard scan (SURVEY.md §2#1; MCSpider.py:54-56): headerless
    * `card_c,trans_c,date` CSV rows, date `dd/MM/yyyy`. `seq` is recovered
    * from shard structure when reading a [[writeShards]] layout is not
    * possible (plain files): row order within a file is preserved only
    * per-partition, so callers needing exact order should read one shard
    * at a time (as each reference spider instance does).
    */
  def readShards(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema("card_c STRING, trans_c STRING, date_text STRING")
      .csv(path)
      .select(
        col("card_c"), col("trans_c"),
        to_date(col("date_text"), "dd/MM/yyyy").as("date"))

  /** Bulk rates ingest with the reference's PER-FILE commit semantics
    * (client.py:152-171: `session.commit()` once per input CSV, so a crash
    * mid-ingest keeps every completed file and none of the in-flight one).
    * Each file becomes one atomic [[graft.checkpoint.SnapshotStore]] commit
    * whose manifest also records the ingested file names — re-running after
    * a crash (or on an extended directory) ingests exactly the not-yet-
    * committed files, idempotently. Returns the full rates table.
    */
  def ratesFromCsvPerFile(
      spark: SparkSession,
      inDir: String,
      providerId: Int,
      store: graft.checkpoint.SnapshotStore): DataFrame = {
    import scala.jdk.CollectionConverters._
    // Files.list holds a directory handle until closed — materialize the
    // listing inside Using so repeated ingest calls can't leak handles
    val files = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(inDir))) { stream =>
      stream.iterator.asScala
        .filter(_.getFileName.toString.endsWith(".csv"))
        .toSeq.sortBy(_.getFileName.toString)
    }
    val resume = store.readCurrent()
    var version = resume.map(_._1).getOrElse(0)
    var ratesPaths = resume.flatMap(_._2.get("rates"))
      .map(_.split(";").toIndexedSeq.filter(_.nonEmpty)).getOrElse(Nil)
    var done = resume.flatMap(_._2.get("ingestedFiles"))
      .map(_.split(";").filter(_.nonEmpty).toSet).getOrElse(Set.empty[String])
    files.filterNot(f => done(f.getFileName.toString)).foreach { f =>
      version += 1
      val p = store.dataPath("rates", version)
      ratesFromCsv(spark, f.toString, providerId).write.mode("overwrite").parquet(p)
      ratesPaths = ratesPaths :+ p
      done = done + f.getFileName.toString
      store.commit(version, Map(
        "rates" -> ratesPaths.mkString(";"),
        "ingestedFiles" -> done.toSeq.sorted.mkString(";")))
    }
    if (ratesPaths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "card_code STRING, trans_code STRING, date DATE, provider_id INT, rate DOUBLE"))
    else spark.read.parquet(ratesPaths: _*)
  }

  /** Bulk rates ingest (client.py:152-171): header CSV, dates `MM/dd/yyyy`
    * — deliberately a *different* dialect from the frontier shards
    * (SURVEY.md §2#2).
    */
  def ratesFromCsv(spark: SparkSession, inPath: String, providerId: Int): DataFrame =
    spark.read
      .option("header", "true")
      .schema("card_code STRING, trans_code STRING, date STRING, rate DOUBLE")
      .csv(inPath)
      .select(
        col("card_code"),
        col("trans_code"),
        to_date(col("date"), "MM/dd/yyyy").as("date"),
        lit(providerId).as("provider_id"),
        col("rate"))
}
