package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Machine-capability probe #2: shuffle-bound work (2 KB string rows through
  * one exchange + aggregation) — measures the box's scaling ceiling for the
  * byte-moving workload class the crawl pipeline belongs to, as CpuProbe
  * does for pure compute.
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8")
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROWS", "2000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_BENCH_TMPDIR", "/tmp"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = spark.range(0, n, 1, cpus.toInt * 4)
      .select(
        pmod(xxhash64(col("id")), lit(100000L)).as("k"),
        repeat(concat(lit("x"), pmod(xxhash64(col("id"), lit(1)), lit(1000000L)).cast("string")), 256).as("payload"))
    val r = df.groupBy("k").agg(sum(length(col("payload"))).as("bytes"), count(lit(1)).as("n"))
      .agg(sum("bytes"), sum("n")).collect()(0)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[shuffleprobe] local[$cpus]: $n rows (${r.getLong(0) / 1e9}%.1f GB) in $sec%.1f s = ${n / sec / 1000}%.1f k rows/s")
    spark.stop()
  }
}
