package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Page-table storage layout (BASELINE.json input_hint: an Iceberg-style
  * table of Common-Crawl pages).
  *
  * At 100 TB the fetch join's dominant cost is shuffling page bodies.
  * Storing the table BUCKETED BY url removes that exchange entirely: the
  * bucketed scan already satisfies the join's hash-clustered distribution,
  * so only the (slim) frontier side shuffles — per-round cost becomes
  * O(frontier), not O(pages touched + shuffle of their bodies).
  *
  * Spark bucketing needs a catalog table (in-session here; Hive/Iceberg
  * catalog on a cluster — Iceberg's `bucket(N, url)` partition transform is
  * the exact production analogue of this layout).
  */
object PageStore {

  /** Write pages bucketed by url. One file per bucket per task; for strict
    * per-bucket sort guarantees write with one task per bucket upstream
    * (`repartition(buckets, col("url"))`).
    */
  def writeBucketed(pages: DataFrame, tableName: String, buckets: Int): Unit = {
    val spark = pages.sparkSession
    // a fresh in-memory catalog can't "overwrite" a table whose location
    // survives from a previous session — drop both the entry and the files
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    // Spark stores managed-table directories LOWERCASED; building the path
    // from tableName verbatim would miss the real directory for any
    // mixed-case name and saveAsTable would then fail on the stale
    // location. (Simple table names only — qualified names live under
    // <db>.db/<table> and take the catalog path instead.)
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      tableName.toLowerCase)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(loc)
    }
    pages
      .repartition(buckets, org.apache.spark.sql.functions.col("url"))
      .write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, "url")
      .sortBy("url")
      .saveAsTable(tableName)
  }

  def read(spark: SparkSession, tableName: String): DataFrame = spark.table(tableName)
}
