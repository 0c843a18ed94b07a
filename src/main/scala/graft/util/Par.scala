package graft.util

import org.apache.spark.sql.DataFrame

object Par {

  /** Ensure an expensive per-row kernel runs with at least
    * defaultParallelism partitions: a tiny input (few parquet splits) would
    * otherwise execute the map at scan parallelism. At real scale the scan
    * already yields >= defaultParallelism splits and this is a no-op — no
    * shuffle is ever added for large inputs.
    */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
