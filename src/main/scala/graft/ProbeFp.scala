package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-isolation probe for the fingerprint pair pipeline
  * (guide §1.4 noop isolation). Not part of any contract.
  */
object ProbeFp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val off = 1L << 40
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val edited = docs.filter(col("doc_id") < 3).select(
      (col("doc_id") + off).as("doc_id"),
      concat(col("text"), lit(" qz1 qz2 qz3 qz4 qz5 qz6 qz7 qz8")).as("text"))
    val all = docs.unionByName(edited)

    val base = time("base localCheckpoint (winnow kernel)") {
      graft.util.Par.spread(all).select(
        col("doc_id").as("id"),
        graft.functions.TextFns.fingerprint(col("text"), 9, 16, "poly").as("fp"))
        .localCheckpoint()
    }
    val buckets = base.select(col("id"), explode(col("fp")).as("h"))
    time("buckets noop") {
      buckets.write.format("noop").mode("overwrite").save()
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("h").orderBy("id")
    val capped = buckets.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 1000).drop("__rn")
    time("capped noop") {
      capped.write.format("noop").mode("overwrite").save()
    }
    val grouped = capped.groupBy("h")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    time("grouped noop") {
      grouped.write.format("noop").mode("overwrite").save()
    }
    val pairsRaw = grouped
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
    val nRaw = time("pairsRaw count")(pairsRaw.count())
    println(s"[probe] raw pair rows: $nRaw")
    val pairs = pairsRaw.dropDuplicates("id_a", "id_b")
    val nPairs = time("pairs dedup count")(pairs.count())
    println(s"[probe] distinct pairs: $nPairs")
    val attached = graft.dedup.DocDedup.attachPairSides(pairs, base, "fp")
    time("attach noop") {
      attached.write.format("noop").mode("overwrite").save()
    }
    val shared = attached
      .withColumn("n_shared", size(array_intersect(col("fp_a"), col("fp_b"))))
      .filter(col("n_shared") >= 3)
      .select("id_a", "id_b", "n_shared")
    time("full n_shared noop") {
      shared.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
