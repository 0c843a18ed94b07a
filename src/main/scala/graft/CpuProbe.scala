package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Machine-capability probe: pure-CPU Spark job (no shuffle, no IO) at a
  * given parallelism — separates what the box can scale from what the
  * crawl pipeline scales.
  */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8")
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "2000000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val r = spark.range(0, n, 1, cpus.toInt * 4)
      .select(sum(pmod(xxhash64(col("id"), col("id") + 1, col("id") + 2), lit(1000L)))).collect()(0)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[cpuprobe] local[$cpus]: $n hashes in $sec%.1f s = ${n / sec / 1e6}%.1f M/s (${r.getLong(0)})")
    spark.stop()
  }
}
