package graft

import org.apache.spark.sql.SparkSession

/** Manual end-to-end smoke: runs the flagship crawl slice exactly as the
  * driver does (rows > 0 on the final rates table) and prints a sample.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rates = SparkEntry.entry(spark)
    val n = rates.count()
    println(s"[smoke] entry rates rows = $n")
    rates.orderBy("provider_id", "card_code", "trans_code", "date").show(10, truncate = false)
    require(n > 0, "entry returned no rows")
    println("[smoke] OK")
    spark.stop()
  }
}
