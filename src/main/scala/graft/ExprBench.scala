package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** UDF-vs-native-Expression A/B micro-bench for the hot per-row kernels
  * (`graft.expr.Native`). One fresh JVM per invocation (same protocol as
  * the scaling benches); each side materializes through the noop sink.
  * Usage: `runMain graft.ExprBench [nUrls]`.
  */
object ExprBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(8000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic URLs with the messiness canonicalize exists
    // for: mixed-case scheme+host, default port, fragment, unsorted query
    val urls = spark.range(n).select(
      concat(
        lit("HTTP://Host"), pmod(col("id"), lit(513L)), lit(".Example.com:80/p/"),
        col("id"), lit("?b="), pmod(col("id"), lit(7L)),
        lit("&a="), pmod(col("id"), lit(11L)), lit("#frag")).as("url"))
      .repartition(cpus.toInt)
    val docs = synth.BenchWorkload.docs(spark, math.min(n / 8, 1000000L), 100)
      .select(filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "").as("toks"))
      .repartition(cpus.toInt)

    def time(label: String)(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[exprbench] $label%-28s $sec%7.2f s")
      sec
    }
    // warm both paths (codegen compile, classloading) outside the timing
    time("warm/native")(urls.limit(100000).select(graft.expr.Native.canonicalize(col("url"))))
    time("warm/udf")(urls.limit(100000).select(graft.urls.UrlCols.canonicalUdf(col("url"))))

    val cu = time("canonicalize/udf")(urls.select(graft.urls.UrlCols.canonicalUdf(col("url"))))
    val cn = time("canonicalize/native")(urls.select(graft.expr.Native.canonicalize(col("url"))))
    val su = time("simhash/udf")(docs.select(graft.dedup.DocDedup.simhashUdf(col("toks"))))
    val sn = time("simhash/native")(docs.select(graft.expr.Native.simhash64(col("toks"))))
    val fu = time("scrapyfp/udf")(urls.select(
      graft.urls.UrlCols.scrapyFingerprintOfCanonicalUdf(col("url"))))
    val fn = time("scrapyfp/native")(urls.select(graft.expr.Native.scrapyFpOfCanonical(col("url"))))
    val texts = synth.BenchWorkload.docs(spark, math.min(n / 8, 1000000L), 100)
      .select(col("text")).repartition(cpus.toInt)
    val wu = time("winnow/udf")(texts.select(
      graft.functions.TextFns.fingerprintUdf(col("text"), lit(9), lit(16), lit("poly"))))
    val wn = time("winnow/native")(texts.select(
      graft.expr.Native.winnowFingerprint(col("text"), 9, 16, "poly")))
    // NFC over the realistic mix: mostly already-NFC ASCII (the fast
    // path) with a decomposed suffix planted on every 5th row
    val nfcIn = synth.BenchWorkload.docs(spark, math.min(n / 8, 1000000L), 100)
      .select(when(pmod(col("doc_id"), lit(5L)) === 0L,
        concat(col("text"), lit(" café"))).otherwise(col("text")).as("text"))
      .repartition(cpus.toInt)
    val nu = time("nfc/udf")(nfcIn.select(graft.functions.TextFns.nfcNormalizeUdf(col("text"))))
    val nn = time("nfc/native")(nfcIn.select(graft.expr.Native.nfcNormalize(col("text"))))
    println(f"""{"metric":"expr_ab","urls":$n,"canon_udf":$cu%.2f,"canon_native":$cn%.2f,"simhash_udf":$su%.2f,"simhash_native":$sn%.2f,"scrapyfp_udf":$fu%.2f,"scrapyfp_native":$fn%.2f,"winnow_udf":$wu%.2f,"winnow_native":$wn%.2f,"nfc_udf":$nu%.2f,"nfc_native":$nn%.2f}""")
    spark.stop()
  }
}
